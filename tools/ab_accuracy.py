"""Accuracy A/B of TPU-specific knobs on clean vs degraded synthetic flow.

VERDICT r1 #4: every deviation from reference-exact defaults must carry
accuracy data. This tool runs the mono VO pipeline (and a stereo window)
on clean + Fisk-degraded sequences for each knob combination and writes
docs/ACCURACY_AB.json:

  knobs: pose_window_sweep (seq | hybrid), pose_sample_stride (1 | 2),
         depth_cost_mode (tracked | projected)

Metrics: Sim3 ATE / scene extent, KITTI-style t_rel over short segments,
final-frame rotation error (deg), translation-direction cosine.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

H, W = 72, 96
FX = FY = 80.0
CX, CY = W / 2, H / 2
N_FLOWS = 10


def _norm(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


PLANES = [
    (_norm([0.1, 0.15, 1.0]), 8.0),
    (_norm([-0.45, 0.1, 1.0]), 6.5),
    (_norm([0.3, -0.45, 1.0]), 7.0),
    (_norm([0.55, 0.35, 1.0]), 7.5),
    (_norm([-0.2, -0.5, 1.0]), 6.8),
]


def build(degraded: bool, seed: int = 7):
    import jax.numpy as jnp

    from voldor_tpu.ops import lie
    from synthetic import degrade_flows, render_window

    rng = np.random.default_rng(3)
    poses = np.zeros((N_FLOWS, 6), np.float32)
    for f in range(N_FLOWS):
        poses[f, :3] = rng.normal(0, 0.008, 3)
        poses[f, 3:6] = [0.35, 0.02, 0.18]
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)

    def r2R(rv):
        return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))

    flows, depth0, Ts = render_window(K, poses, PLANES, H, W, r2R)
    if degraded:
        # object motion must have a component inconsistent with every static
        # depth: motion parallel to the epipolar flow direction (+x here) is
        # absorbed by a wrong depth and is geometrically unrejectable (same
        # reasoning as tests/test_degraded.py MOVING_OBJECT) — so it moves
        # mostly in -y.
        flows = degrade_flows(
            flows, seed=seed, noise_scale=1.0, n_occlusions=4,
            moving_object=dict(x=18, y=20, w=26, h=22, motion=(0.5, -3.0)),
        )
    return flows, Ts


def run_pipeline(flows, Ts, user_cfg: str):
    from voldor_tpu.slam.system import VOLDOR_SLAM
    from voldor_tpu.utils.evaluation import (
        ate_rmse,
        kitti_rel_errors,
        umeyama_alignment,
    )

    slam = VOLDOR_SLAM(mode="mono")
    slam.use_image_info = False
    slam.voldor_user_config = (
        "--n_poses_to_sample 2048 --depth_rand_samples 6 " + user_cfg
    )
    slam.set_cam_params(FX, FY, CX, CY)
    slam.flows = [flows[i] for i in range(flows.shape[0])]
    slam.N_FRAMES = flows.shape[0] + 1
    slam.h, slam.w = H, W
    slam.flow_loader_pt = flows.shape[0]
    while slam.process_vo():
        pass

    est = np.stack([f.Tcw for f in slam.frames]).astype(np.float64)
    gt = np.linalg.inv(Ts)
    extent = float(np.linalg.norm(gt[:, :3, 3] - gt[0, :3, 3], axis=1).max())
    ate = ate_rmse(est, gt, with_scale=True)
    # mono gauge: put the estimated trajectory at metric scale before the
    # relative-error protocol (KITTI tooling does the same for mono runs)
    s, _, _ = umeyama_alignment(est[:, :3, 3], gt[:, :3, 3], with_scale=True)
    est_scaled = est.copy()
    est_scaled[:, :3, 3] *= s
    seg = max(extent * 0.4, 1e-6)
    t_rel, r_rel = kitti_rel_errors(est_scaled, gt, lengths=(seg,), step=2)
    R_err = est[-1][:3, :3] @ gt[-1][:3, :3].T
    ang = float(np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1))))
    return {
        "ate_over_extent": round(ate / extent, 5),
        "t_rel_pct": round(t_rel, 3),
        "r_rel_deg_per_unit": round(r_rel, 4),
        "rot_err_final_deg": round(ang, 4),
    }


def main():
    # VOLDOR_AB_BACKEND=cpu pins the local CPU backend (the axon plugin
    # overrides the JAX_PLATFORMS env var; only jax.config works — see
    # docs/PLATFORM_NOTES.md). Accuracy knob decisions are backend-
    # independent; use this when the remote-TPU tunnel is down.
    if os.environ.get("VOLDOR_AB_BACKEND") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import voldor_tpu  # noqa: F401

    # named configurations: the shipping default, the reference-exact
    # schedule/cost, and single-knob isolations.
    #
    # SCALE CAVEAT (the round-3 "seed-3 cliff" post-mortem): every row
    # except the *_shipped ones runs at a CPU-affordable compute scale
    # (2048 pose samples / 6 depth proposals, prepended by run_pipeline).
    # That scale is fine for RELATIVE knob comparisons but sits close to a
    # pose-sample-starvation cliff on contaminated windows: degraded seed
    # 101 measured 31.3% t_rel at 2048 samples vs 3.5% at the shipped 8192
    # (one window's meanshift locks a spurious mode when the inlier sample
    # pool is thin). Absolute accuracy claims about the defaults must read
    # the *_shipped rows, which override the harness scale back to the
    # config.py defaults (8192/10).
    combos = [
        # "default" IS the shipped config (config.py defaults: stride 1,
        # anchored cost, hybrid sweep, obs collect, convergence extension)
        # at the HARNESS compute scale (see caveat above)
        ("default_anch_hyb_obs", ""),
        # the shipped config at the SHIPPED compute scale — the accuracy
        # gate row (later flags win in the dialect parser)
        ("default_shipped",
         "--n_poses_to_sample 8192 --depth_rand_samples 10"),
        ("early_stop3_shipped",
         "--n_poses_to_sample 8192 --depth_rand_samples 10 "
         "--early_stop_min_iters 3"),
        # candidate perf defaults (docs/PERF_ABLATE.json at HEAD: 4096
        # poses -28 ms/solve, early-stop floor 2 -12 ms): gate on the
        # 8-seed degraded max t_rel before shipping either
        ("poses4096_shipped", "--n_poses_to_sample 4096 --depth_rand_samples 10"),
        ("early_stop2_shipped",
         "--n_poses_to_sample 8192 --depth_rand_samples 10 "
         "--early_stop_min_iters 2"),
        # both candidates together — what would actually ship
        ("perf_candidate_shipped",
         "--n_poses_to_sample 4096 --depth_rand_samples 10 "
         "--early_stop_min_iters 2"),
        ("reference_exact",
         "--pose_window_sweep seq --pose_collect_mode traced "
         "--depth_cost_mode projected --pose_sample_stride 1 "
         "--prior_sample_mode round"),
        ("stride2", "--pose_sample_stride 2"),
        ("no_converge_ext", "--max_iters_ext 0"),
        ("jacobi_warmstart", "--pose_window_sweep jacobi"),
        ("prior_round", "--prior_sample_mode round"),
        ("early_stop3", "--early_stop_min_iters 3"),
    ]

    # The degraded pipeline sits near a failure cliff: a SINGLE noise seed
    # is a lottery (observed: the same knob flipping between 10% and 118%
    # t_rel across harness revisions). Every degraded number is therefore
    # the MEDIAN over several noise seeds, with the per-seed values kept.
    # (8 seeds per VERDICT r3 #4 — the 5-seed sweep hid a 1-in-5 cliff.)
    DEGRADED_SEEDS = (7, 19, 101, 255, 1033, 2048, 4097, 9001)

    # VOLDOR_AB_ONLY=name1,name2 runs a focused subset (e.g. gating one
    # candidate knob) and MERGES into the existing artifact instead of
    # rewriting it — the full sweep stays the source of record.
    only = os.environ.get("VOLDOR_AB_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",")}
        combos = [c for c in combos if c[0] in keep]

    # Clean flow is deterministic, so clean rows vary the ENGINE sampling
    # seed instead (pose/depth proposal RNG) — the spread measures solver
    # sampling noise rather than degradation lottery.
    CLEAN_ENGINE_SEEDS = (233, 7, 1033)

    import jax

    out = {"_meta": {"backend": jax.default_backend(),
                     "grid": f"{H}x{W}", "n_flows": N_FLOWS}}
    for degraded in (False, True):
        for name, cfg in combos:
            # Every combo compiles its own solve executables; accumulated
            # LLVM JIT state exhausts vm.max_map_count (~65k) partway
            # through the sweep ("LLVM compilation error: Cannot allocate
            # memory" with 127 GB free). Bound it per combo, exactly like
            # tests/conftest.py does per module.
            from voldor_tpu.vo import engine as _eng

            _eng._SOLVE_FN_CACHE.clear()
            jax.clear_caches()
            key = f"{'degraded' if degraded else 'clean'}/{name}"
            seeds = DEGRADED_SEEDS if degraded else CLEAN_ENGINE_SEEDS
            per_seed = []
            for s in seeds:
                flows, Ts = build(degraded, seed=s)
                run_cfg = cfg if degraded else f"{cfg} --seed {s}"
                try:
                    per_seed.append(run_pipeline(flows, Ts, run_cfg))
                except Exception as e:  # record, keep sweeping
                    per_seed.append({"error": repr(e)})
            metrics = [r for r in per_seed if "error" not in r]
            if not metrics:
                out[key] = {"error": per_seed[0].get("error", "all failed")}
            else:
                med = {
                    k: round(float(np.median([m[k] for m in metrics])), 5)
                    for k in metrics[0]
                }
                med["n_seeds"] = len(metrics)
                med["per_seed_t_rel"] = [m["t_rel_pct"] for m in metrics]
                out[key] = med
            print(json.dumps({key: out[key]}), flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "ACCURACY_AB.json")
    from voldor_tpu.utils.artifacts import stamp

    if only and os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
        merged.pop("measured_at", None)
        merged.update({k: v for k, v in out.items() if k != "_meta"})
        out = merged
    with open(path, "w") as f:
        json.dump(stamp(out), f, indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
