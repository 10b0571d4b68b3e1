"""Pallas TPU kernel: fused multi-frame Fisk cost of candidate depth maps.

The PatchMatch inner loop evaluates 30+ candidate depth maps per round
against the observed-track cost (em.compute_cost_map_tracked). This kernel
fuses one whole evaluation batch: for each candidate and each row-tile, the
window's track/observation/rigidness planes stream HBM->VMEM once and the
entire N-frame chain (transform, project, Fisk NLL, weight normalization)
runs on the VPU without intermediate HBM traffic.

Measured on a v5e chip this kernel evaluates a 10-candidate batch at
KITTI scale in ~0.17ms where the XLA-fused equivalent takes ~32ms (~190x):
XLA materializes per-frame intermediates between scan steps, while here the
chain stays in registers/VMEM. Numerical parity with
compute_cost_map_tracked is tested in interpret mode.

Layout: grid (K, h/Th); per step the kernel sees
  depth tile (1, Th, w), track/obs/rig tiles (N, Th, w), poses (N, 12) and
  scalar params in SMEM; output cost tile (1, Th, w).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voldor_tpu.ops import fisk


def _cost_kernel(params_ref, poses_ref, depth_ref, tx_ref, ty_ref,
                 obx_ref, oby_ref, rig_ref, inb_ref, xs_ref, ys_ref,
                 *rest):
    # rest = ([pposes, ptgt, pwgt,] cost_ref, wsum_ref) — inputs precede
    # outputs in the pallas calling convention
    if len(rest) == 5:
        prior_refs = rest[:3]
        cost_ref, wsum_ref = rest[3:]
    else:
        prior_refs = ()
        cost_ref, wsum_ref = rest
    fx = params_ref[0]
    fy = params_ref[1]
    cx = params_ref[2]
    cy = params_ref[3]
    lam = params_ref[4]
    arf = params_ref[5]
    n_active = params_ref[6]

    depth = depth_ref[0]
    xs = xs_ref[0]
    ys = ys_ref[0]
    ox = ((xs - cx) / fx) * depth
    oy = ((ys - cy) / fy) * depth
    oz = depth

    N = tx_ref.shape[0]
    cost = jnp.zeros_like(depth)
    wsum = jnp.zeros_like(depth)

    # depth-prior arm (optimize_depth.cu:172-191), fused: frame-0 points
    # projected into each prior camera, Fisk disparity-space NLL against the
    # round-start sampled prior planes.
    if prior_refs:
        pposes_ref, ptgt_ref, pwgt_ref = prior_refs
        bf = params_ref[7]
        omega = params_ref[8]
        for d in range(ptgt_ref.shape[0]):
            r20 = pposes_ref[d, 6]
            r21 = pposes_ref[d, 7]
            r22 = pposes_ref[d, 8]
            t2 = pposes_ref[d, 11]
            nz = r20 * ox + r21 * oy + r22 * oz + t2
            tgt = ptgt_ref[d]
            wgt = pwgt_ref[d]
            use = (nz > 0) & (tgt > 0) & (wgt > 0)
            r = fisk.depth_rigidness(
                jnp.maximum(nz, 1e-12), jnp.maximum(tgt, 1e-12),
                bf, omega, arf,
            )
            cost = cost + jnp.where(use, -wgt * jnp.log(jnp.maximum(r, 1e-30)), 0.0)
            wsum = wsum + jnp.where(use, wgt, 0.0)

    for f in range(N):  # N is small and static: unrolled
        r0 = poses_ref[f, 0]
        r1 = poses_ref[f, 1]
        r2 = poses_ref[f, 2]
        r3 = poses_ref[f, 3]
        r4 = poses_ref[f, 4]
        r5 = poses_ref[f, 5]
        r6 = poses_ref[f, 6]
        r7 = poses_ref[f, 7]
        r8 = poses_ref[f, 8]
        t0 = poses_ref[f, 9]
        t1 = poses_ref[f, 10]
        t2 = poses_ref[f, 11]
        nx = r0 * ox + r1 * oy + r2 * oz + t0
        ny = r3 * ox + r4 * oy + r5 * oz + t1
        nz = r6 * ox + r7 * oy + r8 * oz + t2
        safe_nz = jnp.where(jnp.abs(nz) < 1e-12, 1e-12, nz)
        px2 = (fx * nx + cx * safe_nz) / safe_nz
        py2 = (fy * ny + cy * safe_nz) / safe_nz
        use = (inb_ref[f] > 0) & (nz > 0) & (jnp.float32(f) < n_active)
        r = fisk.rigidness_xy(
            px2 - tx_ref[f], py2 - ty_ref[f], obx_ref[f], oby_ref[f], lam, arf
        )
        rig = rig_ref[f]
        cost = cost + jnp.where(use, -rig * jnp.log(jnp.maximum(r, 1e-30)), 0.0)
        wsum = wsum + jnp.where(use, rig, 0.0)
        ox, oy, oz = nx, ny, nz

    cost_ref[0] = cost
    wsum_ref[0] = wsum


@partial(jax.jit, static_argnames=("tile_h", "interpret"))
def cost_map_tracked_pallas(
    candidates,  # (K, h, w) candidate depth maps
    track,  # (tx, ty, obx, oby) each (N, h, w)
    track_inb,  # (N, h, w) bool
    rigidness,  # (N, h, w)
    Rs,  # (N, 3, 3)
    ts,  # (N, 3)
    active_n,  # scalar
    p,  # EmParams
    prior_samples=None,  # None or (target (D,h,w), weight (D,h,w), dp_Rs, dp_ts)
    tile_h: int = 8,
    interpret: bool = False,
):
    """Raw (cost_sum, weight_sum) of the flow (+ fused prior) arm, (K, h, w).

    prior_samples: em.precompute_prior_samples output — the prior arm runs
    inside the kernel (it was an XLA vmap per candidate before, ~100ms per
    prior-fed window solve). The input width is padded to the 128-lane
    boundary internally.
    """
    tx, ty, obx, oby = track
    K, h, w = candidates.shape
    N = tx.shape[0]
    w_pad = (-w) % 128
    h_pad = (-h) % tile_h

    def padhw(a):
        if not (w_pad or h_pad):
            return a
        return jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, h_pad), (0, w_pad)])

    candidates = padhw(candidates)
    tx, ty, obx, oby = padhw(tx), padhw(ty), padhw(obx), padhw(oby)
    rigidness = padhw(rigidness)
    track_inb = padhw(track_inb)
    wp = w + w_pad
    hp = h + h_pad
    grid = (K, hp // tile_h)

    params = jnp.asarray(
        [p.fx, p.fy, p.cx, p.cy, p.lam, p.abs_resize_factor,
         jnp.float32(active_n), p.basefocal, p.omega],
        jnp.float32,
    )
    poses = jnp.concatenate(
        [Rs.reshape(N, 9), ts.reshape(N, 3)], axis=-1
    ).astype(jnp.float32)
    ys, xs = jnp.mgrid[0:hp, 0:wp]
    xs = xs.astype(jnp.float32)[None]
    ys = ys.astype(jnp.float32)[None]
    inb = track_inb.astype(jnp.float32)

    frame_spec = pl.BlockSpec(
        (N, tile_h, wp), lambda k, i: (0, i, 0), memory_space=pltpu.VMEM
    )
    cand_spec = pl.BlockSpec(
        (1, tile_h, wp), lambda k, i: (k, i, 0), memory_space=pltpu.VMEM
    )
    plane_spec = pl.BlockSpec(
        (1, tile_h, wp), lambda k, i: (0, i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # params
        pl.BlockSpec(memory_space=pltpu.SMEM),  # poses
        cand_spec,  # depth candidates
        frame_spec,  # tx
        frame_spec,  # ty
        frame_spec,  # obx
        frame_spec,  # oby
        frame_spec,  # rigidness
        frame_spec,  # inb
        plane_spec,  # xs
        plane_spec,  # ys
    ]
    operands = [params, poses, candidates, tx, ty, obx, oby, rigidness, inb,
                xs, ys]
    if prior_samples is not None and prior_samples[0].shape[0] > 0:
        ptgt, pwgt, dp_Rs, dp_ts = prior_samples
        D = ptgt.shape[0]
        pposes = jnp.concatenate(
            [dp_Rs.reshape(D, 9), dp_ts.reshape(D, 3)], axis=-1
        ).astype(jnp.float32)
        dprior_spec = pl.BlockSpec(
            (D, tile_h, wp), lambda k, i: (0, i, 0), memory_space=pltpu.VMEM
        )
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # prior poses
            dprior_spec,  # prior targets
            dprior_spec,  # prior weights
        ]
        operands += [pposes, padhw(ptgt), padhw(pwgt)]

    grid_spec = pl.GridSpec(grid=grid, in_specs=in_specs,
                            out_specs=(cand_spec, cand_spec))
    cost, wsum = pl.pallas_call(
        _cost_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((K, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((K, hp, wp), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*operands)
    return cost[:, :h, :w], wsum[:, :h, :w]


def normalize_cost(cost_sum, weight_sum):
    """Final per-pixel cost (optimize_depth.cu:194-197 semantics)."""
    cost = cost_sum / jnp.maximum(weight_sum, 1.1920929e-07)
    return jnp.where(weight_sum == 0, jnp.inf, cost)
