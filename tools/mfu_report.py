"""MFU / roofline accounting for the hot programs (VERDICT r4 item 2).

Standalone stage timings (docs/PERF_STAGES.json) are poisoned by the
remote-TPU tunnel: every dispatch+readback costs ~20-30 ms, which is why
four very different pose-step stages all read "~30 ms" (the latency
floor, not compute). Here each stage is timed INSIDE one jitted
lax.fori_loop (a loop-carried data dependency defeats hoisting/CSE), so
s_per_iter is device time; FLOPs + bytes come from XLA's own
cost_analysis of the single-step program. Rows record achieved GFLOP/s,
GB/s, arithmetic intensity, and the roofline classification against the
chip peaks, answering whether the "19 fps VO floor" (docs/
PERF_BUDGET.md) is a hardware floor or a program-shape floor.

Writes docs/MFU.json. Run on the real TPU: python tools/mfu_report.py
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

# Public peak rates per chip (per-chip, not per-pod). bf16 MXU peak and
# HBM bandwidth; f32/VPU-bound programs cap far below the MXU number.
PEAKS = {
    # device_kind substring -> (bf16 TFLOP/s, HBM GB/s)
    "v5 lite": (394.0, 819.0),
    "v5e": (394.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v4": (275.0, 1228.0),
    "v6": (918.0, 1640.0),
}


def chip_peaks(device_kind: str):
    for k, v in PEAKS.items():
        if k in device_kind.lower():
            return v
    return (float("nan"), float("nan"))


def loop_time(make_body, init_state, n_lo=3, n_hi=8, trials=5):
    """Device seconds per stage iteration: run the stage n times inside
    ONE jitted fori_loop and diff two trip counts, cancelling the
    per-dispatch tunnel latency. make_body(i, state) -> state."""
    import jax

    @partial(jax.jit, static_argnames=("n",))
    def run(state, n):
        return jax.lax.fori_loop(0, n, make_body, state)

    def t(n):
        jax.block_until_ready(run(init_state, n))
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            jax.block_until_ready(run(init_state, n))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    return max((t(n_hi) - t(n_lo)) / (n_hi - n_lo), 1e-9)


def cost_of(fn, *args):
    """(flops, bytes) from XLA cost_analysis of the single-step program."""
    import jax

    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", float("nan"))), float(
            ca.get("bytes accessed", float("nan"))
        )
    except Exception as e:  # noqa: BLE001
        print(f"# cost_analysis failed: {e!r}", file=sys.stderr)
        return float("nan"), float("nan")


def row(name, s_per_iter, flops, bytes_, peak_tf, peak_gbs, note=""):
    gflops = flops / s_per_iter / 1e9
    gbs = bytes_ / s_per_iter / 1e9
    ai = flops / max(bytes_, 1.0)
    # roofline: attainable = min(MXU peak, AI * HBM bw)
    attain_gflops = min(peak_tf * 1e3, ai * peak_gbs)
    pct_roof = 100.0 * gflops / attain_gflops if attain_gflops > 0 else float("nan")
    pct_hbm = 100.0 * gbs / peak_gbs
    mfu = 100.0 * gflops / (peak_tf * 1e3)
    if pct_hbm > 50:
        cls = "HBM-bound"
    elif pct_roof > 50:
        cls = "compute-bound"
    else:
        cls = "latency/VPU-bound"
    r = {
        "s_per_iter": round(s_per_iter, 6),
        "flops": flops,
        "bytes": bytes_,
        "gflops_per_s": round(gflops, 2),
        "gb_per_s": round(gbs, 2),
        "arith_intensity": round(ai, 3),
        "mfu_pct_bf16": round(mfu, 3),
        "pct_hbm_peak": round(pct_hbm, 2),
        "pct_roofline": round(pct_roof, 2),
        "class": cls,
        "note": note,
    }
    print(json.dumps({"stage": name, **r}), flush=True)
    return r


def main():
    import jax
    import jax.numpy as jnp

    import voldor_tpu  # noqa: F401
    from voldor_tpu.config import VoldorConfig
    from voldor_tpu.ops import lie, p3p
    from voldor_tpu.vo import em
    from voldor_tpu.vo.engine import (VoldorEngine, _depth_round,
                                      _get_solve_fn, _resolve_use_pallas)
    from voldor_tpu.vo.pose_step import optimize_cameras_window
    from synthetic import render_window

    dev = jax.devices()[0]
    peak_tf, peak_gbs = chip_peaks(dev.device_kind)
    print(f"# device={dev.device_kind} peaks: {peak_tf} TF bf16, "
          f"{peak_gbs} GB/s HBM", file=sys.stderr)

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
    eng.solve()
    params = em.EmParams.from_config(cfg, has_disparity=False)
    depth, flows, rigidness = eng.depth, eng.flows, eng.rigidness
    poses6, covars = eng.poses6, eng.pose_covars
    del eng  # free engine-held device buffers before the timed loops

    results = {}
    zero_hw = jnp.zeros((0, H, W), jnp.float32)
    zero_p6 = jnp.zeros((0, 6), jnp.float32)

    # --- one EM depth round (the depth M-step) ---
    dr_kw = dict(
        n_rand=cfg.depth_rand_samples, gstep=cfg.depth_global_prop_step,
        lwidth=cfg.depth_local_prop_width, mode=cfg.depth_local_prop_mode,
        fb=bool(cfg.fb_smooth), rig_only=False, use_flows=True,
        use_priors=False, tracked=cfg.depth_cost_mode == "tracked",
        use_pallas=_resolve_use_pallas(cfg),
    )

    def dr_step(i, st):
        d, r = st
        out = _depth_round(
            d, flows, r, poses6, zero_hw, zero_hw, zero_hw, zero_p6,
            np.int32(WINDOW), params, jnp.uint32(5) + jnp.uint32(i),
            np.float32(cfg.fb_emm), np.float32(cfg.fb_no_change_prob),
            np.float32(cfg.depth_range_factor), **dr_kw,
        )
        return out[0], out[1]

    try:
        s = loop_time(dr_step, (depth, rigidness))
        f_, b_ = cost_of(lambda d, r: dr_step(0, (d, r)), depth, rigidness)
        results["em_depth_round"] = row("em_depth_round", s, f_, b_,
                                        peak_tf, peak_gbs,
                                        f"pallas={_resolve_use_pallas(cfg)}")
    except Exception as e:  # noqa: BLE001 — record and keep the other rows
        print(f"# em_depth_round failed: {e!r}", file=sys.stderr)
        results["em_depth_round"] = {"error": repr(e)}

    # --- pose window sweep (collect+P4P+meanshift+RG for all frames) ---
    dens = jnp.zeros(WINDOW, jnp.float32)
    counts = jnp.zeros(WINDOW, jnp.int32)
    pw_kw = dict(
        pose_sample_stride=cfg.pose_sample_stride,
        n_poses_to_sample=cfg.n_poses_to_sample,
        meanshift_max_iters=cfg.meanshift_max_iters,
        meanshift_max_init_trials=cfg.meanshift_max_init_trials,
        rg_max_iters=cfg.rg_max_iters,
        max_trace_on_flow=cfg.max_trace_on_flow,
    )

    def pw_step(i, st):
        p6, cv = st
        res = optimize_cameras_window(
            depth, flows, rigidness, p6, cv, dens, counts, np.int32(WINDOW),
            np.bool_(True), np.bool_(False), jnp.uint32(3) + jnp.uint32(i),
            params, **pw_kw,
        )
        return res.poses6, res.pose_covars

    try:
        s = loop_time(pw_step, (poses6, covars))
        f_, b_ = cost_of(lambda p, c: pw_step(0, (p, c)), poses6, covars)
        results["em_pose_window"] = row(
            "em_pose_window", s, f_, b_, peak_tf, peak_gbs,
            f"stride={cfg.pose_sample_stride} pool={cfg.n_poses_to_sample} "
            "(inner meanshift/RG while_loops: cost_analysis counts one trip)")
    except Exception as e:  # noqa: BLE001
        print(f"# em_pose_window failed: {e!r}", file=sys.stderr)
        results["em_pose_window"] = {"error": repr(e)}

    # --- falign: one batched LM step at the LC-16 workload ---
    from profile_falign import build_pairs
    from voldor_tpu.falign.residual import precompute_maps
    from voldor_tpu.falign.solver import _make_lm_step

    deps, wgts, imgs = build_pairs(16)
    P = 16

    def flat(a):
        return jnp.asarray(a.reshape(P * 2, H, W).astype(np.float32))

    maps_flat, bounds = precompute_maps(flat(deps), flat(wgts), flat(imgs),
                                        350.0, 350.0, W / 2, H / 2)
    maps_b = jax.tree_util.tree_map(
        lambda a: a.reshape(P, 2, *a.shape[1:]), maps_flat)
    intr = tuple(jnp.float32(v) for v in (350.0, 350.0, W / 2, H / 2))
    dim_mask = np.zeros((2, 9), np.float32)
    dim_mask[:, :7] = 1.0
    dim_mask[:, 7:9] = 1.0
    gauge_U = np.zeros((1, 18), np.float32)
    gauge_U[0, 6] = gauge_U[0, 15] = 1.0
    pairs2 = jnp.asarray([[0, 1], [1, 0]], jnp.int32)

    def fa_step(i, st):
        def one(lane_st, maps):
            body, _, _ = _make_lm_step(
                pairs2, maps, intr, jnp.float32(875.0), jnp.float32(10.0),
                True, 3, bounds, jnp.asarray(dim_mask), jnp.asarray(gauge_U), 2,
            )
            return body(lane_st)

        return jax.vmap(one)(st, maps_b)

    params_b = jnp.zeros((P, 2, 9), jnp.float32)
    fa_state = (params_b, jnp.full((P,), 1e-3, jnp.float32),
                jnp.full((P,), 1e6, jnp.float32),
                jnp.zeros((P, 18, 18), jnp.float32),
                jnp.zeros((P, 18), jnp.float32),
                jnp.zeros((P,), jnp.int32),
                jnp.zeros((P,), bool), jnp.zeros((P,), jnp.float32))
    try:
        s = loop_time(fa_step, fa_state)
        f_, b_ = cost_of(lambda st: fa_step(0, st), fa_state)
        results["falign_lm_step_p16"] = row("falign_lm_step_p16", s, f_, b_,
                                            peak_tf, peak_gbs,
                                            "photo, stride 3, 16 lanes x 2 dirs")
    except Exception as e:  # noqa: BLE001
        print(f"# falign_lm_step_p16 failed: {e!r}", file=sys.stderr)
        results["falign_lm_step_p16"] = {"error": repr(e)}

    # --- PGO: one dense-LM linearize+factorize at a 512-pose bucket ---
    from voldor_tpu.pgo.solver import (_edge_res_and_jacs, build_problem)
    from tests.test_pgo import _circle_graph, _rel_pose7

    n = 512
    gt = _circle_graph(n)
    e = [[i, i + 1] for i in range(n - 1)] + [[0, n - 1]]
    edges_idx = np.asarray(e, np.int32)
    edges_pose = np.stack([_rel_pose7(gt, i, j) for i, j in edges_idx])
    covar = np.tile((np.eye(7) * 1e-4).astype(np.float32), (len(e), 1, 1))
    prob, _, _ = build_problem(gt, None, edges_idx, edges_pose, covar, False)

    def pgo_step(i, st):
        prob2 = prob._replace(p=st)
        r, J_e, J_b = _edge_res_and_jacs(prob2)
        # dense normal equations + Cholesky — the per-iteration work of
        # pgo_solve_dense_jit at this bucket
        D = prob.p.shape[0] * 7
        oh_e = jax.nn.one_hot(prob.edges_idx[:, 0], prob.p.shape[0],
                              dtype=r.dtype)
        oh_b = jax.nn.one_hot(prob.edges_idx[:, 1], prob.p.shape[0],
                              dtype=r.dtype)
        He = jnp.einsum("ma,mb,mki,mkj->aibj", oh_e, oh_e, J_e, J_e)
        Hb = jnp.einsum("ma,mb,mki,mkj->aibj", oh_b, oh_b, J_b, J_b)
        Heb = jnp.einsum("ma,mb,mki,mkj->aibj", oh_e, oh_b, J_e, J_b)
        Hfull = (He + Hb + Heb + jnp.swapaxes(jnp.swapaxes(Heb, 0, 2), 1, 3)
                 ).reshape(D, D)
        g = (jnp.einsum("ma,mki,mk->ai", oh_e, J_e, r)
             + jnp.einsum("ma,mki,mk->ai", oh_b, J_b, r)).reshape(D)
        L = jnp.linalg.cholesky(Hfull + jnp.eye(D))
        step = jax.scipy.linalg.cho_solve((L, True), g)
        return st - 1e-9 * step.reshape(-1, 7)[:, :3]

    try:
        s = loop_time(pgo_step, prob.p, n_lo=2, n_hi=6, trials=3)
        f_, b_ = cost_of(lambda p0: pgo_step(0, p0), prob.p)
        results["pgo_dense_iter_512"] = row(
            "pgo_dense_iter_512", s, f_, b_, peak_tf, peak_gbs,
            "linearize+assemble+Cholesky at 512-pose bucket (3584 dofs)")
    except Exception as e:  # noqa: BLE001
        print(f"# pgo_dense_iter_512 failed: {e!r}", file=sys.stderr)
        results["pgo_dense_iter_512"] = {"error": repr(e)}

    # --- the fused full solve, for the headline denominator ---
    solve_fn = _get_solve_fn(cfg, False, False)

    def run_solve():
        st = solve_fn(
            jnp.asarray(depth0_np), flows, jnp.ones((WINDOW, H, W), jnp.float32),
            zero_hw, zero_hw, zero_hw, zero_p6,
            jnp.zeros((WINDOW, 6), jnp.float32),
            jnp.zeros((WINDOW, 6, 6), jnp.float32),
            jnp.zeros(WINDOW, jnp.float32), jnp.zeros(WINDOW, jnp.int32),
            np.int32(WINDOW), np.uint32(11))
        return st["depth"]

    jax.block_until_ready(run_solve())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(run_solve())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    # FLOPs: cost_analysis counts the while_loop body once; report it as a
    # lower bound with the caveat recorded.
    results["em_full_solve"] = {
        "s_total": round(med, 4),
        "note": ("whole-window fused solve, max_iters="
                 f"{cfg.max_iters}; while_loop FLOPs not attributable — "
                 "see per-stage rows for the roofline"),
    }
    print(json.dumps({"stage": "em_full_solve", **results["em_full_solve"]}),
          flush=True)

    out = {
        "device": dev.device_kind,
        "peak_bf16_tflops": peak_tf,
        "peak_hbm_gbs": peak_gbs,
        "grid": f"{W}x{H}",
        "method": ("s_per_iter from jitted fori_loop trip-count differencing "
                   "(cancels the ~20-30 ms tunnel dispatch latency that made "
                   "PERF_STAGES stages look uniformly ~30 ms); flops/bytes "
                   "from XLA cost_analysis of the single-step program"),
        "stages": results,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "MFU.json")
    with open(path, "w") as f:
        from voldor_tpu.utils.artifacts import stamp
        json.dump(stamp(out), f, indent=1)
    print(f"# wrote {os.path.abspath(path)}", file=sys.stderr)


if __name__ == "__main__":
    main()
