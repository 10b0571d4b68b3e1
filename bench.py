"""Headline benchmark: KITTI-odometry-scale VO frames/sec on one chip.

Runs the full monocular VO pipeline (VOLDOR_SLAM.process_vo over a
24-frame synthetic sequence at the reference's KITTI half-resolution
613x185 compute grid, BASELINE.md) — covisibility-gated window stepping
with temporal/spatial keyframe depth priors, exactly as in production —
verifies Sim3-aligned ATE against ground truth, and reports the sustained
frame rate.

Baseline: the reference publishes no numbers (BASELINE.md); its README
claims real-time operation at the recommended 10 Hz KITTI input rate on an
unspecified CUDA GPU, so vs_baseline is measured against 10 frames/sec.

The remote-TPU backend's throughput fluctuates up to ~3.5x between
processes (a degraded-worker mode that is sticky for a process's lifetime;
docs/PLATFORM_NOTES.md). The measurement runs in N_RUNS child processes
and the MEDIAN run is reported; every run's fps is included under "runs"
so the worker lottery stays visible.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/10, "runs": [...]}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

N_RUNS = 3

BASELINE_FPS = 10.0  # reference README.md:160 recommended KITTI input rate
WINDOW = 5
H, W = 185, 613


def build_scene():
    import jax.numpy as jnp

    from voldor_tpu.ops import lie

    sys.path.insert(0, "tests")
    from synthetic import render_window

    K = np.array([[350.0, 0, W / 2], [0, 350.0, H / 2], [0, 0, 1]], np.float32)

    def n_(v):
        v = np.asarray(v, np.float64)
        return v / np.linalg.norm(v)

    planes = [
        (n_([0.1, 0.15, 1.0]), 8.0),
        (n_([-0.35, 0.1, 1.0]), 6.5),
        (n_([0.3, -0.25, 1.0]), 7.0),
    ]
    rng = np.random.default_rng(7)
    poses = np.zeros((WINDOW, 6), np.float32)
    for f in range(WINDOW):
        poses[f, :3] = rng.normal(0, 0.005, 3)
        poses[f, 3:6] = [0.1, 0.01, 0.35]

    def r2R(rv):
        return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))

    flows, depth0, _ = render_window(K, poses, planes, H, W, r2R)
    return flows, depth0, poses


def build_sequence(n_flows=24):
    """Longer synthetic sequence for the pipeline benchmark."""
    import jax.numpy as jnp

    from voldor_tpu.ops import lie

    sys.path.insert(0, "tests")
    from synthetic import render_window

    K = np.array([[350.0, 0, W / 2], [0, 350.0, H / 2], [0, 0, 1]], np.float32)

    def n_(v):
        v = np.asarray(v, np.float64)
        return v / np.linalg.norm(v)

    planes = [
        (n_([0.1, 0.15, 1.0]), 8.0),
        (n_([-0.35, 0.1, 1.0]), 6.5),
        (n_([0.3, -0.25, 1.0]), 7.0),
        (n_([0.5, 0.35, 1.0]), 7.5),
    ]
    rng = np.random.default_rng(7)
    poses = np.zeros((n_flows, 6), np.float32)
    for f in range(n_flows):
        poses[f, :3] = rng.normal(0, 0.004, 3)
        poses[f, 3:6] = [0.08, 0.01, 0.3]

    def r2R(rv):
        return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))

    flows, depth0, Ts = render_window(K, poses, planes, H, W, r2R)
    return flows, Ts


def build_slam_scene(n_flows=60):
    """Out-and-back textured sequence with a genuine revisit (frames 0 and
    N see the same view) — the full-SLAM workload: VO + keyframes + local
    falign links + loop-closure retrieval + PGO (voldor_slam.py:729-828)."""
    import jax.numpy as jnp

    from voldor_tpu.ops import lie

    sys.path.insert(0, "tests")
    from synthetic import plane_depth, render_window

    K = np.array([[350.0, 0, W / 2], [0, 350.0, H / 2], [0, 0, 1]], np.float32)

    def n_(v):
        v = np.asarray(v, np.float64)
        return v / np.linalg.norm(v)

    planes = [
        (n_([0.1, 0.15, 1.0]), 8.0),
        (n_([-0.35, 0.1, 1.0]), 6.5),
        (n_([0.3, -0.25, 1.0]), 7.0),
        (n_([0.5, 0.35, 1.0]), 7.5),
    ]
    rng = np.random.default_rng(11)
    half = n_flows // 2
    poses = np.zeros((n_flows, 6), np.float32)
    for f in range(n_flows):
        poses[f, :3] = rng.normal(0, 0.002, 3)
        sign = 1.0 if f < half else -1.0
        poses[f, 3:6] = [sign * 0.22, 0.01 * sign, 0.0]

    def r2R(rv):
        return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))

    flows, _, Ts = render_window(K, poses, planes, H, W, r2R)

    # textured images: a world-anchored procedural texture on the planes, so
    # a revisit reproduces the view (ORB features + retrieval work on it)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    rays = np.stack([xs, ys, np.ones_like(xs)], -1) @ np.linalg.inv(
        np.asarray(K, np.float64)
    ).T
    images_bgri, images_grayf = [], []
    for k in range(n_flows + 1):
        R, t = Ts[k][:3, :3], Ts[k][:3, 3]
        d = plane_depth(K, R, t, planes, H, W).astype(np.float64)
        Xc = rays * d[..., None]
        Xw = (Xc - t) @ R  # R^T (Xc - t), row-vector form
        # hard-edged blob pattern: thresholded sinusoids give strong corners
        # (ORB/FAST finds nothing on smooth gradients — measured 0 features
        # on the raw sinusoid mixture)
        t1 = np.sin(2.1 * Xw[..., 0]) * np.cos(1.7 * Xw[..., 1])
        t2 = np.sin(0.9 * Xw[..., 0] + 1.3 * Xw[..., 1] + 0.7 * Xw[..., 2])
        t3 = np.sin(3.7 * Xw[..., 0]) * np.sin(2.9 * Xw[..., 1])
        tex = 40.0 + 75.0 * (t1 > 0) + 60.0 * (t2 > 0.3) + 45.0 * (t3 > 0.2)
        g8 = np.clip(tex, 0, 255).astype(np.uint8)
        images_bgri.append(np.repeat(g8[..., None], 3, axis=-1))
        images_grayf.append(g8.astype(np.float32) / 255.0)
    return flows, images_bgri, images_grayf, Ts


def _make_slam_e2e(flows, images_bgri, images_grayf):
    from voldor_tpu.slam.system import VOLDOR_SLAM

    slam = VOLDOR_SLAM(mode="mono")
    slam.set_cam_params(350.0, 350.0, W / 2, H / 2)
    slam.flows = [flows[i] for i in range(flows.shape[0])]
    slam.N_FRAMES = flows.shape[0] + 1
    slam.h, slam.w = H, W
    slam.flow_loader_pt = flows.shape[0]
    slam.images_bgri = list(images_bgri)
    slam.images_grayf = list(images_grayf)
    slam.image_loader_pt = len(images_bgri)
    slam.enable_loop_closure()
    # short sequence: relax the (20-keyframe) revisit distance gate (the
    # return leg re-covers outbound views, so covisibility stepping yields
    # few return-leg keyframes)
    slam.lc_min_kf_distance = 3
    return slam


def _run_slam_once(flows, images_bgri, images_grayf):
    import threading

    slam = _make_slam_e2e(flows, images_bgri, images_grayf)
    t0 = time.perf_counter()
    vo = threading.Thread(target=slam.vo_thread, daemon=True)
    mp = threading.Thread(target=slam.mapping_thread, daemon=True)
    vo.start()
    mp.start()
    vo.join(timeout=600)
    mp.join(timeout=600)
    dt = time.perf_counter() - t0
    est = np.stack([f.Tcw for f in slam.frames])
    return slam, dt, est


def run_slam_e2e():
    """Full-SLAM benchmark (VERDICT r1 #5): mapping + links + LC + PGO."""
    import voldor_tpu  # noqa: F401
    from voldor_tpu.utils.evaluation import ate_rmse

    flows, images_bgri, images_grayf, Ts_true = build_slam_scene(60)

    # warmup pass compiles every executable (VO windows, falign, PGO)
    _run_slam_once(flows, images_bgri, images_grayf)
    slam, dt, est = _run_slam_once(flows, images_bgri, images_grayf)

    gt = np.linalg.inv(Ts_true)
    ate = ate_rmse(est.astype(np.float64), gt, with_scale=True)
    scene_extent = float(
        np.linalg.norm(gt[:, :3, 3] - gt[0, :3, 3], axis=1).max()
    )
    n_lc_edges = sum(1 for e in slam.edges if e.edge_type == "falign-lc")
    print(
        json.dumps(
            {
                "metric": "kitti_slam_e2e_frames_per_sec_per_chip",
                "value": round(int(slam.N_FRAMES) / dt, 3),
                "unit": "frames/s (613x185 mono SLAM: VO+links+LC+PGO)",
                "wall_s": round(dt, 3),
                "n_frames": int(slam.N_FRAMES),
                "n_keyframes": len(slam.kf_ids),
                "n_edges": len(slam.edges),
                "n_lc_edges": n_lc_edges,
                "ate_rmse": round(ate, 5),
                "scene_extent": round(scene_extent, 2),
                "accuracy_ok": bool(ate < 0.02 * scene_extent),
            }
        )
    )


def _make_slam(flows):
    from voldor_tpu.slam.system import VOLDOR_SLAM

    slam = VOLDOR_SLAM(mode="mono")
    slam.use_image_info = False
    # Engine defaults (anchored cost + hybrid sweep + obs collect) — the
    # fast path IS the default; accuracy gated below and in
    # docs/ACCURACY_AB.json.
    slam.voldor_user_config = ""
    slam.set_cam_params(350.0, 350.0, W / 2, H / 2)
    slam.flows = [flows[i] for i in range(flows.shape[0])]
    slam.N_FRAMES = flows.shape[0] + 1
    slam.h, slam.w = H, W
    slam.flow_loader_pt = flows.shape[0]
    return slam


def run_once():
    import voldor_tpu  # noqa: F401
    from voldor_tpu.utils.evaluation import ate_rmse

    flows, Ts_true = build_sequence(24)

    # warmup: run the FULL sequence once so every executable the timed run
    # needs is compiled (bootstrap window, 1-prior and 2-prior windows — a
    # partial warmup left an ~0.8s mid-sequence recompile in the timing)
    slam = _make_slam(flows)
    while slam.process_vo():
        pass

    # timed: the real VO pipeline (windows warm-started by temporal/spatial
    # keyframe depth priors — only the first window pays the bootstrap)
    slam = _make_slam(flows)
    t0 = time.perf_counter()
    while slam.process_vo():
        pass
    dt = time.perf_counter() - t0
    n_frames = int(slam.N_FRAMES)
    fps = n_frames / dt

    # accuracy: Sim3-aligned ATE against ground truth
    est = np.stack([f.Tcw for f in slam.frames])  # cam->world (see frame.py)
    gt = np.linalg.inv(Ts_true)  # (n_flows+1, 4, 4) cam->world
    ate = ate_rmse(est.astype(np.float64), gt, with_scale=True)
    scene_extent = float(
        np.linalg.norm(gt[:, :3, 3] - gt[0, :3, 3], axis=1).max()
    )
    ok = bool(ate < 0.02 * scene_extent)

    fps_out = fps if ok else 0.0
    print(
        json.dumps(
            {
                "metric": "kitti_vo_frames_per_sec_per_chip",
                "value": round(fps_out, 3),
                "unit": "frames/s (613x185 mono VO pipeline, window 5)",
                "vs_baseline": round(fps_out / BASELINE_FPS, 3),
                "pipeline_s": round(dt, 3),
                "n_frames": n_frames,
                "accuracy_ok": ok,
                "ate_rmse": round(ate, 5),
                "scene_extent": round(scene_extent, 2),
            }
        )
    )


def _last_json_line(text):
    for line in reversed(text.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return None


def main():
    child = os.environ.get("VOLDOR_BENCH_CHILD")
    if child == "slam":
        run_slam_e2e()
        return
    if child:
        run_once()
        return
    results = []
    env = dict(os.environ, VOLDOR_BENCH_CHILD="1")
    for _ in range(N_RUNS):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        r = _last_json_line(out.stdout)
        if r is not None:
            results.append(r)
    if not results:
        run_once()  # children failed (e.g. no subprocess allowed): run inline
        return
    results.sort(key=lambda r: r["value"])
    median = results[len(results) // 2]
    median["runs"] = [r["value"] for r in results]

    # full-SLAM end-to-end line (VERDICT r1 #5) — one child, folded into the
    # single output line as a nested record (driver contract: ONE json line)
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=dict(os.environ, VOLDOR_BENCH_CHILD="slam"),
            capture_output=True, text=True, timeout=1800,
        )
        slam_r = _last_json_line(out.stdout)
        if slam_r is not None:
            median["slam_e2e"] = slam_r
    except Exception:
        pass
    print(json.dumps(median))


if __name__ == "__main__":
    main()
