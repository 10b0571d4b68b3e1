"""Per-stage breakdown of ONE batched falign LM iteration on the TPU.

docs/PERF_FALIGN.json gives s_per_iter_batch ~0.157 for the 16-lane photo
batch; this tool splits that into its constituents so the optimization
target is measured, not guessed (VERDICT r4 asks for exactly this before
touching the falign hot path):

  resjacs    residual + 18-column Jacobians for both directed blocks
  normaleq   (18,18) JtJ + gradient accumulation
  cholsolve  damped Cholesky + triangular solves (vmapped tiny LAPACK —
             a known pathology class on this platform, PLATFORM_NOTES)
  trialcost  primal residual evaluation of the trial point
  fullstep   all of the above chained as one jitted step (fusion effects)

Each stage also records XLA's cost_analysis FLOPs so docs/MFU.json can
divide FLOPs by measured seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp

from profile_falign import build_pairs, H, W


def _time(fn, args, reps=7):
    out = fn(*args)
    jax.block_until_ready(out)
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best.append(time.perf_counter() - t0)
    return float(np.median(best))


def _flops(fn, args):
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", float("nan"))), float(
            ca.get("bytes accessed", float("nan"))
        )
    except Exception:
        return float("nan"), float("nan")


def main():
    from voldor_tpu.falign.residual import precompute_maps
    from voldor_tpu.falign.solver import (_joint_normal_eq,
                                          _pair_res_and_jacs)

    P, stride, use_photo = 16, 3, True
    deps, wgts, imgs = build_pairs(P)
    fx = fy = 350.0
    cx, cy = W / 2, H / 2
    vbf, crw = np.float32(175.0 * 5), np.float32(10.0)

    def flat(a):
        return jnp.asarray(a.reshape(P * 2, H, W).astype(np.float32))

    maps_flat, bounds = precompute_maps(flat(deps), flat(wgts), flat(imgs),
                                        fx, fy, cx, cy)
    maps_b = jax.tree_util.tree_map(
        lambda a: a.reshape(P, 2, *a.shape[1:]), maps_flat
    )
    intr = (jnp.float32(fx), jnp.float32(fy), jnp.float32(cx), jnp.float32(cy))
    dim_mask = np.zeros((2, 9), np.float32)
    dim_mask[:, :7] = 1.0
    dim_mask[:, 7:9] = 1.0
    dim_mask = jnp.asarray(dim_mask)
    pairs2 = jnp.asarray([[0, 1], [1, 0]], jnp.int32)
    params_b = jnp.zeros((P, 2, 9), jnp.float32)

    rj = partial(_pair_res_and_jacs, pairs=pairs2, intr=intr, vbf=vbf,
                 crw=crw, use_photo=use_photo, stride=stride, bounds=bounds,
                 dim_mask=dim_mask)

    @jax.jit
    def stage_resjacs(params_b, maps_b):
        return jax.vmap(lambda p, m: rj(p, maps=m))(params_b, maps_b)

    res_b, Jr_b, Jt_b = stage_resjacs(params_b, maps_b)
    jax.block_until_ready(res_b)

    @jax.jit
    def stage_normaleq(res_b, Jr_b, Jt_b):
        return jax.vmap(
            lambda r, a, b: _joint_normal_eq(r, a, b, pairs2, 2)
        )(res_b, Jr_b, Jt_b)

    H_b, g_b = stage_normaleq(res_b, Jr_b, Jt_b)
    jax.block_until_ready(H_b)

    @jax.jit
    def stage_cholsolve(H_b, g_b):
        lam = jnp.float32(1e-3)

        def one(Hm, g):
            diag = jnp.maximum(jnp.diag(Hm), 1e-8)
            damped = Hm + jnp.diag(lam * diag)
            L = jnp.linalg.cholesky(damped)
            Lsafe = jnp.where(jnp.all(jnp.isfinite(L)), L, jnp.eye(18))
            return jax.scipy.linalg.cho_solve((Lsafe, True), g)

        return jax.vmap(one)(H_b, g_b)

    from voldor_tpu.falign.residual import pair_residual_map

    def cost_of(params, maps):
        def one(pr, pt, ref, tar):
            r, _ = pair_residual_map(
                pr, pt, ref, tar, maps, *intr, vbf, crw, use_photo, stride,
                bounds,
            )
            return jnp.sum(r * r)

        return 0.5 * jnp.sum(jax.vmap(one)(
            params[pairs2[:, 0]], params[pairs2[:, 1]],
            pairs2[:, 0], pairs2[:, 1],
        ))

    @jax.jit
    def stage_trialcost(params_b, maps_b):
        return jax.vmap(cost_of)(params_b, maps_b)

    @jax.jit
    def stage_fullstep(params_b, maps_b):
        def one(params, maps):
            res, Jr, Jt = rj(params, maps=maps)
            Hm, g = _joint_normal_eq(res, Jr, Jt, pairs2, 2)
            diag = jnp.maximum(jnp.diag(Hm), 1e-8)
            damped = Hm + jnp.diag(jnp.float32(1e-3) * diag
                                   + (1.0 - dim_mask).reshape(-1))
            L = jnp.linalg.cholesky(damped)
            Lsafe = jnp.where(jnp.all(jnp.isfinite(L)), L, jnp.eye(18))
            step = jax.scipy.linalg.cho_solve((Lsafe, True), g)
            trial = params - step.reshape(2, 9) * dim_mask
            return trial, cost_of(trial, maps)

        return jax.vmap(one)(params_b, maps_b)

    rows = {}
    rows["resjacs"] = {"s": _time(stage_resjacs, (params_b, maps_b))}
    rows["normaleq"] = {"s": _time(stage_normaleq, (res_b, Jr_b, Jt_b))}
    rows["cholsolve"] = {"s": _time(stage_cholsolve, (H_b, g_b))}
    rows["trialcost"] = {"s": _time(stage_trialcost, (params_b, maps_b))}
    rows["fullstep"] = {"s": _time(stage_fullstep, (params_b, maps_b))}
    for name, fn, args in [
        ("resjacs", stage_resjacs, (params_b, maps_b)),
        ("normaleq", stage_normaleq, (res_b, Jr_b, Jt_b)),
        ("cholsolve", stage_cholsolve, (H_b, g_b)),
        ("trialcost", stage_trialcost, (params_b, maps_b)),
        ("fullstep", stage_fullstep, (params_b, maps_b)),
    ]:
        fl, by = _flops(fn, args)
        rows[name]["flops"] = fl
        rows[name]["bytes"] = by
        if np.isfinite(fl) and rows[name]["s"] > 0:
            rows[name]["gflops_per_s"] = round(fl / rows[name]["s"] / 1e9, 2)

    rec = {
        "config": {"P": P, "stride": stride, "photo": use_photo,
                   "grid": [H, W]},
        "stages": rows,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "PERF_FALIGN_BREAKDOWN.json")
    from voldor_tpu.utils.artifacts import stamp

    with open(path, "w") as f:
        json.dump(stamp(rec), f, indent=1)
    print(json.dumps(rec["stages"]), flush=True)


if __name__ == "__main__":
    main()
