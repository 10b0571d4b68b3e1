"""Large-graph PGO scale benchmark (VERDICT r4 item 4).

The reference solves full-sequence pose graphs — every frame a vertex —
with Ceres SPARSE_NORMAL_CHOLESKY (/root/reference/pose-graph/pgo.cpp:
82-95); KITTI-00 is 4,541 poses. This benchmark builds a synthetic
KITTI-shaped graph at that scale (VO chain edges between consecutive
frames, keyframe-keyframe local links, loop-closure links between
revisits), applies realistic odometry drift to the initial estimate,
and times the full `pgo()` entry point — which routes through the exact
chain marginalization (pgo/reduce.py) onto the dense-Cholesky MXU path —
cold and warm on the current backend.

Accuracy is checked two ways: ATE of the solved trajectory vs ground
truth (after SE(3) alignment), and the solved cost vs the initial cost.

Writes docs/PGO_SCALE.json. Usage:
    python tools/pgo_scale.py [--poses 4541] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from voldor_tpu.pgo.api import pgo  # noqa: E402


def _rodrigues(rv):
    """Pure-numpy SO(3) exp (harness-side; eager per-pose jnp ops
    round-trip through the axon tunnel at ~20 ms each — PLATFORM_NOTES)."""
    rv = np.asarray(rv, np.float64)
    th = np.linalg.norm(rv)
    if th < 1e-12:
        return np.eye(3)
    k = rv / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _rvec_of(R):
    """Pure-numpy SO(3) log."""
    R = np.asarray(R, np.float64)
    c = np.clip((np.trace(R) - 1) / 2, -1.0, 1.0)
    th = np.arccos(c)
    if th < 1e-9:
        return np.zeros(3)
    w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return th / (2 * np.sin(th)) * w


def make_kitti_like_graph(n_poses: int, kf_every: int = 15, seed: int = 7):
    """Ground-truth loop trajectory + noisy odometry initialization +
    measurement edges. Returns (gt_T (n,4,4) cam->world, init7 (n,7),
    edges_idx, edges_pose, edges_covar).

    Trajectory: a closed circuit traversed twice (so every pose on lap 2
    revisits lap 1 — loop-closure edges exist at matching stations), with
    gentle elevation change. Edge measurement convention matches the SLAM
    layer (VERDICT wire format): an edge maps begin-frame points into
    end-frame coordinates; vertices are cam->world; scale entries are
    log-scale diffs.
    """
    rng = np.random.default_rng(seed)
    lap = n_poses // 2
    theta = np.linspace(0, 2 * np.pi, lap, endpoint=False)
    radius = 120.0
    xyz = np.stack(
        [radius * np.cos(theta), 2.0 * np.sin(3 * theta),
         radius * np.sin(theta)], 1)
    xyz = np.concatenate([xyz, xyz], 0)[:n_poses]

    # cam->world: z axis along the direction of travel
    gt_T = np.zeros((n_poses, 4, 4))
    for i in range(n_poses):
        fwd = xyz[(i + 1) % n_poses] - xyz[i]
        if np.linalg.norm(fwd) < 1e-9:
            fwd = xyz[(i + 2) % n_poses] - xyz[i]
        z = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        gt_T[i, :3, :3] = np.stack([x, y, z], 1)
        gt_T[i, :3, 3] = xyz[i]
        gt_T[i, 3, 3] = 1.0

    def rel(a, b):
        """Edge measurement a->b: T_b^w^-1 @ T_a^w (begin points -> end)."""
        return np.linalg.inv(gt_T[b]) @ gt_T[a]

    def noisy(T, sr, st):
        dT = np.eye(4)
        dT[:3, :3] = _rodrigues(rng.normal(0, sr, 3))
        dT[:3, 3] = rng.normal(0, st, 3)
        return dT @ T

    def pose7_of_edge(T, s=0.0):
        out = np.zeros(7, np.float32)
        out[:3] = _rvec_of(T[:3, :3])
        out[3:6] = T[:3, 3]
        out[6] = s
        return out

    edges_idx, edges_pose, edges_covar = [], [], []

    def add_edge(a, b, sr, st, info_scale):
        T = noisy(rel(a, b), sr, st)
        edges_idx.append((a, b))
        edges_pose.append(pose7_of_edge(T, rng.normal(0, 0.002)))
        edges_covar.append(np.eye(7, dtype=np.float32) / info_scale)

    # VO chain: consecutive frames (the degree-2 vertices chain_reduce
    # marginalizes away)
    for i in range(n_poses - 1):
        add_edge(i, i + 1, 0.001, 0.02, 100.0)
    # keyframe local links: kf_i -> kf_{i+1..i+3}
    kfs = list(range(0, n_poses, kf_every))
    for j, a in enumerate(kfs):
        for b in kfs[j + 1:j + 4]:
            if b - a > 1:
                add_edge(a, b, 0.002, 0.05, 25.0)
    # loop closures: lap-2 keyframes back to the matching lap-1 station
    n_lc = 0
    for a in kfs:
        if a >= lap and a - lap < lap:
            add_edge(a, a - lap, 0.002, 0.05, 25.0)
            n_lc += 1

    # Initialization: integrate the NOISY chain (odometry drift) — what
    # the SLAM front end would hand to the final global solve.
    init_T = np.zeros_like(gt_T)
    init_T[0] = gt_T[0]
    for i in range(n_poses - 1):
        # edge i->i+1 measurement m: p_{i+1} = m @ p_i  (point map), so
        # T_{i+1}^w = T_i^w @ m^-1
        m = np.eye(4)
        m[:3, :3] = _rodrigues(edges_pose[i][:3])
        m[:3, 3] = edges_pose[i][3:6]
        init_T[i + 1] = init_T[i] @ np.linalg.inv(m)

    init7 = np.zeros((n_poses, 7), np.float32)
    for i in range(n_poses):
        init7[i, :3] = _rvec_of(init_T[i, :3, :3])
        init7[i, 3:6] = init_T[i, :3, 3]

    return (gt_T, init_T, init7, np.asarray(edges_idx, np.int32),
            np.stack(edges_pose), np.stack(edges_covar), len(kfs), n_lc)


def ate_rmse(est_T, gt_T):
    """Umeyama-aligned (SE3, no scale) translation RMSE."""
    P, Q = est_T[:, :3, 3], gt_T[:, :3, 3]
    mp, mq = P.mean(0), Q.mean(0)
    U, _, Vt = np.linalg.svd((Q - mq).T @ (P - mp))
    S = np.eye(3)
    S[2, 2] = np.sign(np.linalg.det(U @ Vt))
    R = U @ S @ Vt
    t = mq - R @ mp
    return float(np.sqrt(np.mean(np.sum((P @ R.T + t - Q) ** 2, 1))))


def solved_to_T(sol7):
    n = sol7.shape[0]
    T = np.zeros((n, 4, 4))
    for i in range(n):
        T[i, :3, :3] = _rodrigues(sol7[i, :3])
        T[i, :3, 3] = sol7[i, 3:6]
        T[i, 3, 3] = 1.0
    return T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=4541)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--mode", choices=["6dof", "7dof"], default="7dof")
    args = ap.parse_args()

    (gt_T, init_T, init7, eidx, epose, ecov, n_kf,
     n_lc) = make_kitti_like_graph(args.poses)
    ate0 = ate_rmse(init_T, gt_T)
    print(f"# graph: {args.poses} poses, {eidx.shape[0]} edges "
          f"({n_kf} keyframes, {n_lc} LC), drift ATE {ate0:.2f} m",
          flush=True)

    seven = args.mode == "7dof"
    t0 = time.time()
    sol = pgo(init7, eidx, epose, ecov, optimize_7dof=seven, debug=True)
    cold_s = time.time() - t0
    ate1 = ate_rmse(solved_to_T(sol), gt_T)
    print(f"# cold solve {cold_s:.2f}s, ATE {ate0:.2f} -> {ate1:.3f} m",
          flush=True)

    warm = []
    for _ in range(args.trials):
        t0 = time.time()
        sol = pgo(init7, eidx, epose, ecov, optimize_7dof=seven)
        warm.append(time.time() - t0)
    warm_s = float(np.median(warm))
    print(f"# warm solves {['%.2f' % w for w in warm]} -> median {warm_s:.2f}s",
          flush=True)

    import jax

    out = {
        "backend": jax.default_backend(),
        "n_poses": args.poses,
        "n_edges": int(eidx.shape[0]),
        "n_keyframes": n_kf,
        "n_lc_edges": n_lc,
        "mode": args.mode,
        "cold_s": round(cold_s, 3),
        "warm_s_median": round(warm_s, 3),
        "warm_s_runs": [round(w, 3) for w in warm],
        "ate_before_m": round(ate0, 3),
        "ate_after_m": round(ate1, 4),
        "path": "chain_reduce (exact degree-2 marginalization) -> dense "
                "MXU Cholesky LM -> redistribute_chain",
        "reference": "pose-graph/pgo.cpp:82-95 SPARSE_NORMAL_CHOLESKY on "
                     "the full 4,541-pose KITTI-00 graph",
    }
    from voldor_tpu.utils.artifacts import stamp

    path = os.path.join(_REPO, "docs", "PGO_SCALE.json")
    with open(path, "w") as f:
        json.dump(stamp(out, config="tools/pgo_scale.py"), f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("n_poses", "n_edges", "cold_s", "warm_s_median",
                       "ate_before_m", "ate_after_m")}))
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
