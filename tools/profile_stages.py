"""Per-stage timing of the VO engine at KITTI half-res (613x185).

Times each stage of the EM solve separately on the current backend
(designed for the real TPU; run `python tools/profile_stages.py`), using
medians of several in-process trials per docs/PLATFORM_NOTES.md — never
trust a single run or cross-process comparisons.

Prints one JSON line per stage plus a summary table, and writes
docs/PERF_STAGES.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 185, 613
WINDOW = 5
TRIALS = 7
WARMUP = 2


def median_time(fn, *args, trials=TRIALS, warmup=WARMUP, **kwargs):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts


def main():
    import jax
    import jax.numpy as jnp

    import voldor_tpu  # noqa: F401
    from voldor_tpu.config import VoldorConfig
    from voldor_tpu.ops import lie, p3p
    from voldor_tpu.ops.meanshift import meanshift
    from voldor_tpu.ops.robust_gaussian import fit_robust_gaussian
    from voldor_tpu.vo import em
    from voldor_tpu.vo.engine import VoldorEngine, _depth_round, _get_solve_fn
    from voldor_tpu.vo.pose_step import (
        collect_p3p_instances,
        optimize_camera_pose,
        optimize_cameras_window,
    )
    from synthetic import render_window

    backend = jax.default_backend()
    print(f"# backend={backend} grid={W}x{H} window={WINDOW}", file=sys.stderr)

    # --- realistic scene (same family as bench.py) ---
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

    flows_np, depth0_np, _ = render_window(K, poses, planes, H, W, r2R)

    cfg = VoldorConfig(fx=350.0, fy=350.0, cx=W / 2, cy=H / 2, basefocal=175.0)
    eng = VoldorEngine(cfg).init(flows_np)
    eng.solve()  # realistic depth/rigidness/pose state + warm caches

    params = em.EmParams.from_config(cfg, has_disparity=False)
    depth = eng.depth
    flows = eng.flows
    rigidness = eng.rigidness
    poses6 = eng.poses6
    covars = eng.pose_covars
    Rs = jax.jit(lambda p: lie.so3_exp(p[:, :3]))(poses6)
    ts_arr = poses6[:, 3:6]

    results = {}

    def record(name, med, ts, note=""):
        results[name] = {"median_ms": round(med * 1e3, 3),
                         "runs_ms": [round(t * 1e3, 2) for t in ts],
                         "note": note}
        print(json.dumps({"stage": name, **results[name]}))

    # --- collect ---
    @partial(jax.jit, static_argnames=("stride",))
    def run_collect(depth, flows, rigidness, Rs, ts, stride):
        return collect_p3p_instances(
            depth, flows, rigidness, Rs, ts, jnp.int32(WINDOW - 1), params,
            rigidness_threshold=cfg.rigidness_threshold,
            rigidness_sum_threshold=cfg.rigidness_sum_threshold,
            sample_min_depth=cfg.pose_sample_min_depth,
            sample_max_depth=cfg.pose_sample_max_depth,
            max_trace_on_flow=cfg.max_trace_on_flow,
            sample_stride=stride,
        )

    for stride in (1, 2):
        med, ts = median_time(run_collect, depth, flows, rigidness, Rs, ts_arr,
                              stride=stride)
        record(f"collect_stride{stride}", med, ts, "per frame, last window frame")

    # --- P4P batch ---
    p2m, p3m, vm = jax.block_until_ready(
        run_collect(depth, flows, rigidness, Rs, ts_arr, stride=1))
    p2s = jnp.reshape(p2m, (-1, 2))
    p3s = jnp.reshape(p3m, (-1, 3))
    valid = jnp.reshape(vm, (-1,))
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run_p4p(p2s, p3s, valid, key):
        return p3p.solve_batch_p4p(
            p2s, p3s, valid, key, params.fx, params.fy, params.cx, params.cy,
            n_poses=cfg.n_poses_to_sample)

    med, ts = median_time(run_p4p, p2s, p3s, valid, key)
    record("p4p_8192", med, ts)

    # --- meanshift ---
    rvecs, tvecs, ok = jax.block_until_ready(run_p4p(p2s, p3s, valid, key))
    pool = jnp.concatenate([rvecs * cfg.meanshift_rvec_scale, tvecs], axis=-1)
    pool_valid = ok.astype(jnp.float32)

    @jax.jit
    def run_ms(pool, pool_valid, key):
        return meanshift(
            pool, pool_valid, cfg.meanshift_kernel_var,
            jnp.zeros(6, jnp.float32), jnp.bool_(False), key,
            epsilon=cfg.meanshift_epsilon,
            max_iters=cfg.meanshift_max_iters,
            max_init_trials=cfg.meanshift_max_init_trials,
            good_init_confidence=cfg.meanshift_good_init_confidence)

    med, ts = median_time(run_ms, pool, pool_valid, key)
    ms = jax.block_until_ready(run_ms(pool, pool_valid, key))
    record("meanshift", med, ts, f"iters={int(ms.iters)}")

    # --- robust gaussian ---
    s = cfg.rg_pose_scaling

    @jax.jit
    def run_rg(pool, pool_valid, mean):
        return fit_robust_gaussian(
            pool * s, pool_valid, mean * s,
            jnp.eye(6, dtype=jnp.float32) * (cfg.meanshift_kernel_var * s * s),
            trunc_sigma=cfg.rg_trunc_sigma,
            covar_reg_lambda=cfg.rg_covar_reg_lambda,
            epsilon=cfg.rg_epsilon, max_iters=cfg.rg_max_iters)

    med, ts = median_time(run_rg, pool, pool_valid, ms.mean)
    rg = jax.block_until_ready(run_rg(pool, pool_valid, ms.mean))
    record("robust_gaussian", med, ts, f"iters={int(rg.iters)}")

    # --- single pose step (no rg) ---
    med, ts = median_time(
        optimize_camera_pose, depth, flows, rigidness, poses6, covars,
        np.int32(WINDOW - 1), np.bool_(True), np.bool_(False), np.uint32(3),
        params, pose_sample_stride=cfg.pose_sample_stride,
        n_poses_to_sample=cfg.n_poses_to_sample,
        meanshift_max_iters=cfg.meanshift_max_iters,
        meanshift_max_init_trials=cfg.meanshift_max_init_trials,
        rg_max_iters=cfg.rg_max_iters,
        max_trace_on_flow=cfg.max_trace_on_flow)
    record("pose_step_1frame", med, ts, f"stride={cfg.pose_sample_stride}")

    # --- full camera window sweep ---
    dens = jnp.zeros(WINDOW, jnp.float32)
    counts = jnp.zeros(WINDOW, jnp.int32)
    med, ts = median_time(
        optimize_cameras_window, depth, flows, rigidness, poses6, covars,
        dens, counts, np.int32(WINDOW), np.bool_(True), np.bool_(False),
        np.uint32(3), params,
        pose_sample_stride=cfg.pose_sample_stride,
        n_poses_to_sample=cfg.n_poses_to_sample,
        meanshift_max_iters=cfg.meanshift_max_iters,
        meanshift_max_init_trials=cfg.meanshift_max_init_trials,
        rg_max_iters=cfg.rg_max_iters,
        max_trace_on_flow=cfg.max_trace_on_flow)
    record("cameras_window_5", med, ts)

    # --- depth round ---
    from voldor_tpu.vo.engine import _resolve_use_pallas

    zero_pr = jnp.zeros((0, H, W), jnp.float32)
    zero_p6 = jnp.zeros((0, 6), jnp.float32)
    med, ts = median_time(
        _depth_round, depth, flows, rigidness, poses6,
        zero_pr, zero_pr, zero_pr, zero_p6,
        np.int32(WINDOW), params, np.uint32(5),
        np.float32(cfg.fb_emm), np.float32(cfg.fb_no_change_prob),
        np.float32(cfg.depth_range_factor),
        n_rand=cfg.depth_rand_samples,
        gstep=cfg.depth_global_prop_step,
        lwidth=cfg.depth_local_prop_width,
        mode=cfg.depth_local_prop_mode,
        fb=bool(cfg.fb_smooth), rig_only=False, use_flows=True,
        use_priors=False, tracked=cfg.depth_cost_mode == "tracked",
        use_pallas=_resolve_use_pallas(cfg))
    record("depth_round", med, ts,
           f"pallas={_resolve_use_pallas(cfg)} mode={cfg.depth_local_prop_mode}")

    # --- full fused solve (bootstrap window) ---
    solve_fn = _get_solve_fn(cfg, False, False)
    zero_hw = jnp.zeros((0, H, W), jnp.float32)

    def run_solve():
        st = solve_fn(
            jnp.asarray(depth0_np), flows, jnp.ones((WINDOW, H, W), jnp.float32),
            zero_hw, zero_hw, zero_hw, zero_p6,
            jnp.zeros((WINDOW, 6), jnp.float32),
            jnp.zeros((WINDOW, 6, 6), jnp.float32),
            jnp.zeros(WINDOW, jnp.float32), jnp.zeros(WINDOW, jnp.int32),
            np.int32(WINDOW), np.uint32(11))
        return st["depth"]

    med, ts = median_time(run_solve)
    record("full_solve_window", med, ts, f"max_iters={cfg.max_iters}")

    # --- summary ---
    out = {"backend": backend, "grid": f"{W}x{H}", "window": WINDOW,
           "config": {"pose_sample_stride": cfg.pose_sample_stride,
                      "n_poses_to_sample": cfg.n_poses_to_sample,
                      "max_iters": cfg.max_iters},
           "stages": results}
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "PERF_STAGES.json")
    with open(path, "w") as f:
        from voldor_tpu.utils.artifacts import stamp
        json.dump(stamp(out), f, indent=1)
    print(f"# wrote {os.path.abspath(path)}", file=sys.stderr)


if __name__ == "__main__":
    main()
