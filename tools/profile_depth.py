"""Sub-stage timing of the depth round + dispatch-floor measurement."""

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


def median_time(fn, *args, trials=TRIALS, warmup=2, **kwargs):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    import voldor_tpu  # noqa: F401
    from voldor_tpu.config import VoldorConfig
    from voldor_tpu.ops import lie
    from voldor_tpu.vo import em
    from voldor_tpu.vo.engine import VoldorEngine, _resolve_use_pallas
    from synthetic import render_window

    out = {}

    def rec(name, med, note=""):
        out[name] = round(med * 1e3, 3)
        print(json.dumps({"stage": name, "median_ms": out[name], "note": note}))

    # --- dispatch floor: trivial jit on a tiny array ---
    tiny = jnp.zeros(8, jnp.float32)
    f_triv = jax.jit(lambda x: x + 1)
    rec("dispatch_floor_tiny", median_time(f_triv, tiny))

    big = jnp.zeros((WINDOW, H, W), jnp.float32)
    f_big = jax.jit(lambda x: x + 1)
    rec("dispatch_floor_bigbuf", median_time(f_big, big))

    # --- scene state ---
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

    flows_np, _, _ = render_window(K, poses, planes, H, W, r2R)
    cfg = VoldorConfig(fx=350.0, fy=350.0, cx=W / 2, cy=H / 2, basefocal=175.0)
    eng = VoldorEngine(cfg).init(flows_np)
    eng.solve()

    params = em.EmParams.from_config(cfg, False)
    depth, flows, rigidness, poses6 = eng.depth, eng.flows, eng.rigidness, eng.poses6
    active_n = np.int32(WINDOW)
    use_pallas = _resolve_use_pallas(cfg)
    print(f"# pallas={use_pallas}", file=sys.stderr)

    # --- fb_smooth ---
    fb = jax.jit(em.fb_smooth)
    rec("fb_smooth", median_time(fb, rigidness, np.float32(cfg.fb_emm),
                                 np.float32(cfg.fb_no_change_prob)))

    # --- precompute_obs_tracks ---
    tr = jax.jit(em.precompute_obs_tracks)
    rec("precompute_obs_tracks", median_time(tr, flows, active_n, params))
    track, tinb = jax.block_until_ready(tr(flows, active_n, params))

    # --- single cost eval (pallas batch of 1) ---
    Rs = jax.jit(lambda p: lie.so3_exp(p[:, :3]))(poses6)
    ts_arr = poses6[:, 3:6]
    if use_pallas:
        from voldor_tpu.ops.pallas_cost import cost_map_tracked_pallas, normalize_cost

        @jax.jit
        def cost1(d):
            cs, ws = cost_map_tracked_pallas(d[None], track, tinb, rigidness,
                                             Rs, ts_arr, active_n, params)
            return normalize_cost(cs, ws)

        rec("pallas_cost_batch1", median_time(cost1, depth))

        @jax.jit
        def cost8(d8):
            cs, ws = cost_map_tracked_pallas(d8, track, tinb, rigidness,
                                             Rs, ts_arr, active_n, params)
            return normalize_cost(cs, ws)

        d8 = jnp.broadcast_to(depth, (8, H, W))
        rec("pallas_cost_batch8", median_time(cost8, d8))

    # --- xla tracked cost single ---
    @jax.jit
    def cost_xla(d):
        return em.compute_cost_map_tracked(d, track, tinb, rigidness, Rs,
                                           ts_arr, None, active_n, params)

    rec("xla_cost_batch1", median_time(cost_xla, depth))

    # --- update_rigidness ---
    ur = jax.jit(em.update_rigidness)
    rec("update_rigidness", median_time(ur, depth, flows, Rs, ts_arr,
                                        active_n, params))

    # --- optimize_depth_batched (full PatchMatch round) ---
    if use_pallas:
        from voldor_tpu.ops.pallas_cost import cost_map_tracked_pallas, normalize_cost

        @partial(jax.jit, static_argnames=())
        def od(depth, key):
            def batch_cost_fn(cands):
                cs, ws = cost_map_tracked_pallas(cands, track, tinb, rigidness,
                                                 Rs, ts_arr, active_n, params)
                return normalize_cost(cs, ws)

            cost = batch_cost_fn(depth[None])[0]
            return em.optimize_depth_batched(
                depth, cost, batch_cost_fn, key,
                n_rand_samples=cfg.depth_rand_samples,
                global_prop_step=cfg.depth_global_prop_step,
                local_prop_width=cfg.depth_local_prop_width,
                range_factor=cfg.depth_range_factor)

        key = jax.random.PRNGKey(0)
        rec("optimize_depth_batched", median_time(od, depth, key),
            f"n_rand={cfg.depth_rand_samples} gstep={cfg.depth_global_prop_step} "
            f"lwidth={cfg.depth_local_prop_width}")

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "PERF_DEPTH.json")
    with open(path, "w") as f:
        from voldor_tpu.utils.artifacts import stamp
        json.dump(stamp(out), f, indent=1)


if __name__ == "__main__":
    main()
