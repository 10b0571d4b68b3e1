"""Marginal cost of each EM stage measured by ablating the FUSED solve.

Standalone stage timings mislead on this backend (XLA fuses aggressively
inside the full program), so the honest attribution is: time the fused
window solve with one knob turned off/down at a time.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 185, 613
WINDOW = 5
TRIALS = 5


def main():
    import jax
    import jax.numpy as jnp

    import voldor_tpu  # noqa: F401
    from voldor_tpu.config import VoldorConfig
    from voldor_tpu.ops import lie
    from voldor_tpu.vo.engine import _get_solve_fn
    from synthetic import render_window

    K = np.array([[350.0, 0, W / 2], [0, 350.0, H / 2], [0, 0, 1]], np.float32)

    def n_(v):
        v = np.asarray(v, np.float64)
        return v / np.linalg.norm(v)

    planes = [(n_([0.1, 0.15, 1.0]), 8.0), (n_([-0.35, 0.1, 1.0]), 6.5),
              (n_([0.3, -0.25, 1.0]), 7.0)]
    rng = np.random.default_rng(7)
    poses = np.zeros((WINDOW, 6), np.float32)
    for f in range(WINDOW):
        poses[f, :3] = rng.normal(0, 0.005, 3)
        poses[f, 3:6] = [0.1, 0.01, 0.35]

    def r2R(rv):
        return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))

    flows_np, depth0_np, _ = render_window(K, poses, planes, H, W, r2R)
    flows = jnp.asarray(flows_np)
    depth0 = jnp.asarray(depth0_np)
    zero_hw = jnp.zeros((0, H, W), jnp.float32)
    zero_p6 = jnp.zeros((0, 6), jnp.float32)

    def time_cfg(name, n_priors=0, **overrides):
        cfg = VoldorConfig(fx=350.0, fy=350.0, cx=W / 2, cy=H / 2,
                           basefocal=175.0)
        for k, v in overrides.items():
            setattr(cfg, k, v)
        fn = _get_solve_fn(cfg, False, n_priors > 0)
        if n_priors:
            priors = jnp.stack([depth0 * (1.0 + 0.02 * i)
                                for i in range(n_priors)])
            pconfs = jnp.ones((n_priors, H, W), jnp.float32)
            dpp = jnp.asarray(
                np.tile(np.asarray([0, 0, 0, 0.02, 0, -0.1], np.float32),
                        (n_priors, 1))
            )
        else:
            priors = pconfs = zero_hw
            dpp = zero_p6

        def run():
            st = fn(depth0, flows, jnp.ones((WINDOW, H, W), jnp.float32),
                    priors, pconfs,
                    jnp.ones((n_priors, H, W), jnp.float32) if n_priors
                    else zero_hw,
                    dpp,
                    jnp.zeros((WINDOW, 6), jnp.float32),
                    jnp.zeros((WINDOW, 6, 6), jnp.float32),
                    jnp.zeros(WINDOW, jnp.float32),
                    jnp.zeros(WINDOW, jnp.int32),
                    np.int32(WINDOW), np.uint32(11))
            return st["depth"]

        for _ in range(2):
            jax.block_until_ready(run())
        ts = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            jax.block_until_ready(run())
            ts.append(time.perf_counter() - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        print(json.dumps({"variant": name, "median_ms": round(med * 1e3, 1),
                          "runs_ms": [round(t * 1e3, 1) for t in ts]}),
              flush=True)
        return med

    base = time_cfg("baseline")
    # VOLDOR_ABLATE_FULL=1 re-runs the long historical list; the default
    # lane keeps the variants that still drive knob decisions at HEAD
    # (early-stop schedule, pose-pool size, collect stride, depth rounds).
    variants = [
        ("priors_2", dict(n_priors=2)),
        ("priors_1", dict(n_priors=1)),
        ("priors_2_round_mode", dict(n_priors=2, prior_sample_mode="round")),
        ("early_stop_off", dict(early_stop_min_iters=0)),
        ("early_stop_2", dict(early_stop_min_iters=2)),
        ("poses_4096", dict(n_poses_to_sample=4096)),
        ("poses_2048", dict(n_poses_to_sample=2048)),
        ("stride_2", dict(pose_sample_stride=2)),
        ("max_iters_3", dict(max_iters=3)),
        ("no_depth_update", dict(depth_rand_samples=0,
                                 depth_global_prop_step=0,
                                 depth_local_prop_width=0)),
        ("rg_off", dict(rg_refine=0)),
        ("sweep_seq", dict(pose_window_sweep="seq")),
    ]
    if os.environ.get("VOLDOR_ABLATE_FULL"):
        variants += [
            ("fb_smooth_off", dict(fb_smooth=0)),
            ("n_rand_0", dict(depth_rand_samples=0)),
            ("n_rand_4", dict(depth_rand_samples=4)),
            ("gstep_0", dict(depth_global_prop_step=0)),
            ("lwidth_8", dict(depth_local_prop_width=8)),
            ("lwidth_0", dict(depth_local_prop_width=0)),
            ("ms_iters_10", dict(meanshift_max_iters=10)),
            ("max_iters_1", dict(max_iters=1)),
            ("sweep_jacobi", dict(pose_window_sweep="jacobi")),
            ("sweep_hybrid_stride2", dict(pose_window_sweep="hybrid",
                                          pose_sample_stride=2)),
        ]
    out = {"baseline_ms": round(base * 1e3, 1)}
    for name, ov in variants:
        med = time_cfg(name, **ov)
        out[name] = {"ms": round(med * 1e3, 1),
                     "delta_ms": round((med - base) * 1e3, 1)}

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "PERF_ABLATE.json")
    with open(path, "w") as f:
        from voldor_tpu.utils.artifacts import stamp
        json.dump(stamp(out), f, indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
