"""EM core of the VO engine: rigidness updates, Fisk cost maps, P3P
instance collection, and the PatchMatch-style depth update.

This module is the TPU-native replacement for the two hot CUDA kernels:
gpu-kernels/optimize_depth.cu (depth/rigidness engine) and
gpu-kernels/collect_p3p_instances.cu (pose-sample collection). Everything is
expressed over the full (h, w) grid with static shapes; the sliding window
is padded to a static N with an `active_n` scalar instead of the reference's
dynamic `n_flows` truncation.

Geometry conventions (matching the reference):
  * `depth` lives in the frame-0 camera of the window;
  * pose f (Rs[f], ts[f]) maps frame-f camera points to frame f+1
    (voldor/geometry.cpp:17-18);
  * flows[f] maps pixels of frame f to frame f+1;
  * depth-prior pose d maps frame-0 points into the prior's camera.

Depth propagation notes: the reference's "global" propagation with step > 1
never reads a value written in the same kernel (visited columns x in
{1, 1+step, ...} read x-1 which is never visited), so it is a parallel
gather-accept, not a serial chain. The 32-wide "local" serial chains are
reformulated as jump-flooding sweeps (offsets 1, 2, 4, ..., width/2):
same propagation reach, log(width) fully-parallel accept rounds instead of
`width` serial steps. An exact sequential mode is kept for parity testing
(cfg.depth_local_prop_mode = 'exact').
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from voldor_tpu.ops import fisk
from voldor_tpu.ops.fb_smooth import fb_smooth
from voldor_tpu.ops.image import bilinear_sample

MAXIMUM_DEPTH = 1e5  # optimize_depth.cu:15


class EmParams(NamedTuple):
    """Traced scalar hyperparameters of the EM cost (subset of VoldorConfig)."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    basefocal: jax.Array
    abs_resize_factor: jax.Array
    lam: jax.Array  # rigidness strictness lambda
    omega: jax.Array  # depth-prior strictness
    delta: jax.Array  # depth-prior weight
    disp_delta: jax.Array  # disparity-prior weight; <0 disables (voldor.cpp:266)

    @classmethod
    def from_config(cls, cfg, has_disparity: bool):
        # np scalars, NOT jnp: eagerly materializing device scalars costs a
        # full host->device round trip each (~70ms on the remote-TPU
        # platform); np scalars ship with the executable's arguments.
        import numpy as np

        return cls(
            fx=np.float32(cfg.fx),
            fy=np.float32(cfg.fy),
            cx=np.float32(cfg.cx),
            cy=np.float32(cfg.cy),
            basefocal=np.float32(cfg.basefocal),
            abs_resize_factor=np.float32(cfg.abs_resize_factor),
            lam=np.float32(cfg.lambda_),
            omega=np.float32(cfg.omega),
            delta=np.float32(cfg.delta),
            disp_delta=np.float32(cfg.disp_delta if has_disparity else -1.0),
        )


def _backproject(xs, ys, depth, p: EmParams):
    ox = ((xs - p.cx) / p.fx) * depth
    oy = ((ys - p.cy) / p.fy) * depth
    return ox, oy, depth


def _project(ox, oy, oz, p: EmParams):
    px = (p.fx * ox + p.cx * oz) / oz
    py = (p.fy * oy + p.cy * oz) / oz
    return px, py


def _pixel_grid(h, w, dtype=jnp.float32):
    ys, xs = jnp.mgrid[0:h, 0:w]
    return xs.astype(dtype), ys.astype(dtype)


def chain_flow_terms(depth, flows, Rs, ts, active_n, p: EmParams):
    """Walk a frame-0 point through the window (scan over frames).

    For each frame f returns the rigid flow (px2-px1, py2-py1), the observed
    flow sampled at the traced position, the in-bounds mask, and the traced
    position itself — the shared computation of update_rigidnesses
    (optimize_depth.cu:84-116) and compute_pixel_cost
    (optimize_depth.cu:140-169); the positions double as the 'anchored'
    cost/collect track planes.

    depth: (h, w); flows: (N, h, w, 2); Rs: (N, 3, 3); ts: (N, 3).
    Returns component arrays (rigid_x, rigid_y, obs_x, obs_y, inb, px1, py1:
    (N, h, w) each) — separate x/y planes keep the VPU lanes full (see
    fisk.rigidness_xy).
    """
    h, w = depth.shape
    xs, ys = _pixel_grid(h, w)
    ox, oy, oz = _backproject(xs, ys, depth, p)

    def step(carry, frame):
        ox, oy, oz, px1, py1 = carry
        R, t, flow, active = frame
        nx = R[0, 0] * ox + R[0, 1] * oy + R[0, 2] * oz + t[0]
        ny = R[1, 0] * ox + R[1, 1] * oy + R[1, 2] * oz + t[1]
        nz = R[2, 0] * ox + R[2, 1] * oy + R[2, 2] * oz + t[2]
        safe_nz = jnp.where(jnp.abs(nz) < 1e-12, 1e-12, nz)
        px2 = (p.fx * nx + p.cx * safe_nz) / safe_nz
        py2 = (p.fy * ny + p.cy * safe_nz) / safe_nz
        inb = (nz > 0) & (px1 >= 0) & (px1 < w) & (py1 >= 0) & (py1 < h) & active
        # skip the gather entirely for inactive (truncated/padded) frames
        obs = jax.lax.cond(
            active,
            lambda: bilinear_sample(flow, px1, py1),
            lambda: jnp.zeros(px1.shape + (2,), flow.dtype),
        )
        out = (px2 - px1, py2 - py1, obs[..., 0], obs[..., 1], inb, px1, py1)
        # Carry: traced position advances only when in-bounds
        # (optimize_depth.cu:107 updates px1 only in the valid branch).
        px1n = jnp.where(inb, px2, px1)
        py1n = jnp.where(inb, py2, py1)
        return (nx, ny, nz, px1n, py1n), out

    N = flows.shape[0]
    active = jnp.arange(N) < active_n
    _, outs = jax.lax.scan(
        step, (ox, oy, oz, xs, ys), (Rs, ts, flows, active)
    )
    return outs


def prior_terms(depth, priors, dp_Rs, dp_ts, p: EmParams):
    """Project frame-0 points into each depth-prior camera.

    Returns (oz (D, h, w), px (D, h, w), py (D, h, w), inb (D, h, w)) — the
    shared geometry of the prior arms of update_rigidnesses
    (optimize_depth.cu:119-135) and compute_pixel_cost (172-191).
    """
    h, w = depth.shape
    xs, ys = _pixel_grid(h, w)
    ox, oy, oz0 = _backproject(xs, ys, depth, p)

    def one(R, t):
        nx = R[0, 0] * ox + R[0, 1] * oy + R[0, 2] * oz0 + t[0]
        ny = R[1, 0] * ox + R[1, 1] * oy + R[1, 2] * oz0 + t[1]
        nz = R[2, 0] * ox + R[2, 1] * oy + R[2, 2] * oz0 + t[2]
        safe_nz = jnp.where(jnp.abs(nz) < 1e-12, 1e-12, nz)
        px = (p.fx * nx + p.cx * safe_nz) / safe_nz
        py = (p.fy * ny + p.cy * safe_nz) / safe_nz
        inb = (nz > 0) & (px >= 0) & (px < w) & (py >= 0) & (py < h)
        return nz, px, py, inb

    return jax.vmap(one)(dp_Rs, dp_ts)


def precompute_obs_tracks(flows, active_n, p: EmParams):
    """Depth-independent observed-flow track through the window.

    TPU-first redesign of the cost-evaluation inner loop: the reference
    re-traces sample positions per *candidate depth* (projected track,
    optimize_depth.cu:150-161), making every PatchMatch proposal a fresh
    h*w*N bilinear gather — the dominant cost on TPU. Instead we trace along
    the *observed* flow composition once per depth round: P_0 = grid,
    P_{f+1} = P_f + flows[f](P_f). At the optimum the projected and observed
    tracks coincide (that is what rigidness ~ 1 means), so the fixed point
    is unchanged; off-optimum candidates are scored against the observed
    track of the pixel, which is depth-independent — so every candidate
    evaluation becomes pure elementwise math.

    Returns ((track_x, track_y, obs_x, obs_y) each (N, h, w),
    track_inb (N, h, w)).
    """
    N, h, w = flows.shape[0], flows.shape[1], flows.shape[2]
    xs, ys = _pixel_grid(h, w)

    def step(carry, frame):
        px, py = carry
        flow, active = frame
        inb = (px >= 0) & (px < w) & (py >= 0) & (py < h) & active
        obs = jax.lax.cond(
            active,
            lambda: bilinear_sample(flow, px, py),
            lambda: jnp.zeros(px.shape + (2,), flow.dtype),
        )
        out = (px, py, obs[..., 0], obs[..., 1], inb)
        pxn = jnp.where(inb, px + obs[..., 0], px)
        pyn = jnp.where(inb, py + obs[..., 1], py)
        return (pxn, pyn), out

    active = jnp.arange(N) < active_n
    _, (tx, ty, ox_, oy_, inb) = jax.lax.scan(step, (xs, ys), (flows, active))
    return (tx, ty, ox_, oy_), inb


def compute_cost_map_tracked(
    depth,
    track,
    track_inb,
    rigidness,
    Rs,
    ts,
    prior_samples,
    active_n,
    p: EmParams,
):
    """Gather-free Fisk cost of a candidate depth map against precomputed
    observed tracks (see precompute_obs_tracks).

    prior_samples: None or (target (D,h,w), pconf (D,h,w), conf (D,h,w),
    weights handled by caller) from precompute_prior_samples.
    """
    h, w = depth.shape
    xs, ys = _pixel_grid(h, w)
    ox, oy, oz = _backproject(xs, ys, depth, p)
    cost = jnp.zeros((h, w), jnp.float32)
    wsum = jnp.zeros((h, w), jnp.float32)

    if track is not None:
        track_x, track_y, obs_x, obs_y = track
        N = track_x.shape[0]

        def step(carry, frame):
            ox, oy, oz, cost, wsum = carry
            R, t, tx, ty, obx, oby, inb, rig, active = frame
            nx = R[0, 0] * ox + R[0, 1] * oy + R[0, 2] * oz + t[0]
            ny = R[1, 0] * ox + R[1, 1] * oy + R[1, 2] * oz + t[1]
            nz = R[2, 0] * ox + R[2, 1] * oy + R[2, 2] * oz + t[2]
            safe_nz = jnp.where(jnp.abs(nz) < 1e-12, 1e-12, nz)
            px2 = (p.fx * nx + p.cx * safe_nz) / safe_nz
            py2 = (p.fy * ny + p.cy * safe_nz) / safe_nz
            # active gate: tracks may be precomputed for the pre-truncation
            # window (they depend only on flows), so inactive frames must be
            # masked here, not via track_inb.
            use = inb & (nz > 0) & active
            r = fisk.rigidness_xy(
                px2 - tx, py2 - ty, obx, oby, p.lam, p.abs_resize_factor
            )
            cost = cost + jnp.where(use, -rig * jnp.log(jnp.maximum(r, 1e-30)), 0.0)
            wsum = wsum + jnp.where(use, rig, 0.0)
            return (nx, ny, nz, cost, wsum), None

        (_, _, _, cost, wsum), _ = jax.lax.scan(
            step,
            (ox, oy, oz, cost, wsum),
            (Rs, ts, track_x, track_y, obs_x, obs_y, track_inb, rigidness,
             jnp.arange(N) < active_n),
        )

    if prior_samples is not None:
        pc, pw = prior_cost_sums(depth, prior_samples, p)
        cost = cost + pc
        wsum = wsum + pw

    cost = cost / jnp.maximum(wsum, 1.1920929e-07)
    return jnp.where(wsum == 0, jnp.inf, cost)


def prior_cost_sums(depth, prior_samples, p: EmParams):
    """Raw (cost_sum, weight_sum) of the depth-prior arm for one candidate
    (the candidate-dependent part of compute_cost_map_tracked's prior
    branch)."""
    target, weight, dp_Rs, dp_ts = prior_samples
    h, w = depth.shape
    xs, ys = _pixel_grid(h, w)
    ox, oy, oz = _backproject(xs, ys, depth, p)
    cost = jnp.zeros((h, w), jnp.float32)
    wsum = jnp.zeros((h, w), jnp.float32)

    def pstep(carry, frame):
        cost, wsum = carry
        R, t, tgt, wgt = frame
        nz = R[2, 0] * ox + R[2, 1] * oy + R[2, 2] * oz + t[2]
        use = (nz > 0) & (tgt > 0) & (wgt > 0)
        r = fisk.depth_rigidness(
            jnp.maximum(nz, 1e-12), jnp.maximum(tgt, 1e-12),
            p.basefocal, p.omega, p.abs_resize_factor,
        )
        cost = cost + jnp.where(use, -wgt * jnp.log(jnp.maximum(r, 1e-30)), 0.0)
        wsum = wsum + jnp.where(use, wgt, 0.0)
        return (cost, wsum), None

    (cost, wsum), _ = jax.lax.scan(
        pstep, (cost, wsum), (dp_Rs, dp_ts, target, weight)
    )
    return cost, wsum


def precompute_prior_samples(
    depth, priors, dp_pconfs, dp_confs, dp_Rs, dp_ts, p: EmParams
):
    """Sample prior depth/conf maps at the projections of the *current*
    depth (once per round) so candidate evaluations stay gather-free.

    Returns (target (D,h,w), weight (D,h,w), dp_Rs, dp_ts) for
    compute_cost_map_tracked.
    """
    oz, px, py, inb = prior_terms(depth, priors, dp_Rs, dp_ts, p)
    target = jax.vmap(bilinear_sample)(priors, px, py)
    # sample the premultiplied confidence product (one gather instead of
    # two; bilinear-of-product vs product-of-bilinears differs only at
    # confidence edges, well inside the model's tolerance)
    cw = jax.vmap(bilinear_sample)(dp_pconfs * dp_confs, px, py)
    D = priors.shape[0]
    slot_w = jnp.where(
        (p.disp_delta > 0) & (jnp.arange(D) == 0), p.disp_delta, p.delta
    )[:, None, None]
    weight = jnp.where(inb, cw * slot_w, 0.0)
    target = jnp.where(inb, target, 0.0)
    return target, weight, dp_Rs, dp_ts


def update_rigidness(depth, flows, Rs, ts, active_n, p: EmParams):
    """Recompute the per-frame rigidness maps (optimize_depth.cu:84-116)."""
    rx, ry, obx, oby, inb, _, _ = chain_flow_terms(depth, flows, Rs, ts, active_n, p)
    r = fisk.rigidness_xy(rx, ry, obx, oby, p.lam, p.abs_resize_factor)
    return jnp.where(inb, r, 0.0)


def update_rigidness_and_tracks(depth, flows, Rs, ts, active_n, p: EmParams):
    """Rigidness refresh + 'anchored' track planes from ONE chain trace.

    The anchored cost/collect mode scores the NEXT round's candidates
    against the observed flow sampled along the CURRENT depth's projected
    chain — the reference's per-candidate re-trace
    (optimize_depth.cu:150-161) frozen at the round boundary. Returns
    (rigidness, (track_x, track_y, obs_x, obs_y), track_inb) with the same
    plane layout precompute_obs_tracks produces, so every downstream
    consumer (XLA + Pallas cost, obs collect) is shared.
    """
    rx, ry, obx, oby, inb, px1, py1 = chain_flow_terms(
        depth, flows, Rs, ts, active_n, p
    )
    r = fisk.rigidness_xy(rx, ry, obx, oby, p.lam, p.abs_resize_factor)
    return jnp.where(inb, r, 0.0), (px1, py1, obx, oby), inb


def update_prior_confs(depth, priors, dp_confs, dp_Rs, dp_ts, p: EmParams):
    """Recompute depth-prior confidence maps (optimize_depth.cu:119-135).

    Keeps the previous confidence where the projected prior depth is invalid
    (<= 0) but the projection is in-bounds, exactly as the reference (which
    only assigns when target_depth > 0).
    """
    oz, px, py, inb = prior_terms(depth, priors, dp_Rs, dp_ts, p)
    target = jax.vmap(bilinear_sample)(priors, px, py)
    r = fisk.depth_rigidness(oz, jnp.maximum(target, 1e-12), p.basefocal, p.omega, p.abs_resize_factor)
    new = jnp.where(target > 0, r, dp_confs)
    return jnp.where(inb, new, 0.0)


def compute_cost_map(
    depth,
    flows,
    rigidness,
    Rs,
    ts,
    priors,
    dp_pconfs,
    dp_confs,
    dp_Rs,
    dp_ts,
    active_n,
    p: EmParams,
):
    """Per-pixel Fisk NLL of a candidate depth map (optimize_depth.cu:140-198).

    rigidness / dp confidence maps act as fixed weights at the *home* pixel
    (not the traced position). Pixels with zero total weight get +inf.
    """
    h, w = depth.shape
    cost = jnp.zeros((h, w), jnp.float32)
    wsum = jnp.zeros((h, w), jnp.float32)

    if flows is not None and flows.shape[0] > 0:
        rx, ry, obx, oby, inb, _, _ = chain_flow_terms(depth, flows, Rs, ts, active_n, p)
        r = fisk.rigidness_xy(rx, ry, obx, oby, p.lam, p.abs_resize_factor)
        c = -rigidness * jnp.log(jnp.maximum(r, 1e-30))
        cost = cost + jnp.sum(jnp.where(inb, c, 0.0), axis=0)
        wsum = wsum + jnp.sum(jnp.where(inb, rigidness, 0.0), axis=0)

    if priors is not None and priors.shape[0] > 0:
        oz, px, py, inb = prior_terms(depth, priors, dp_Rs, dp_ts, p)
        target = jax.vmap(bilinear_sample)(priors, px, py)
        pconf = jax.vmap(bilinear_sample)(dp_pconfs, px, py)
        conf = jax.vmap(bilinear_sample)(dp_confs, px, py)
        D = priors.shape[0]
        # disparity prior (slot 0 when disp_delta > 0) uses disp_delta weight
        # (optimize_depth.cu:184-189).
        slot_w = jnp.where(
            (p.disp_delta > 0) & (jnp.arange(D) == 0), p.disp_delta, p.delta
        )[:, None, None]
        weight = pconf * conf * slot_w
        r = fisk.depth_rigidness(
            oz, jnp.maximum(target, 1e-12), p.basefocal, p.omega, p.abs_resize_factor
        )
        use = inb & (target > 0)
        cost = cost + jnp.sum(
            jnp.where(use, -weight * jnp.log(jnp.maximum(r, 1e-30)), 0.0), axis=0
        )
        wsum = wsum + jnp.sum(jnp.where(use, weight, 0.0), axis=0)

    cost = cost / jnp.maximum(wsum, 1.1920929e-07)
    return jnp.where(wsum == 0, jnp.inf, cost)


# --------------------------------------------------------------------------
# Depth update (PatchMatch proposals)
# --------------------------------------------------------------------------


def _shift_depth(depth, dy, dx):
    """Candidate map: each pixel proposes the depth of its (dy, dx)-offset
    neighbor; out-of-range pixels propose their own depth (no-op).

    dy/dx are static Python ints, so the shift compiles to a pad + static
    slice (a gather formulation forced scatter/gather lowering on TPU)."""
    h, w = depth.shape
    pu, pd = max(-dy, 0), max(dy, 0)
    pl, pr = max(-dx, 0), max(dx, 0)
    padded = jnp.pad(depth, ((pu, pd), (pl, pr)), mode="edge")
    shifted = padded[pu + dy : pu + dy + h, pl + dx : pl + dx + w]
    ys = jnp.arange(h) + dy
    xs = jnp.arange(w) + dx
    valid = ((ys >= 0) & (ys < h))[:, None] & ((xs >= 0) & (xs < w))[None, :]
    return jnp.where(valid, shifted, depth), valid


def optimize_depth(
    depth,
    cost,
    flows,
    rigidness,
    Rs,
    ts,
    priors,
    dp_pconfs,
    dp_confs,
    dp_Rs,
    dp_ts,
    active_n,
    p: EmParams,
    key,
    *,
    n_rand_samples: int = 10,
    global_prop_step: int = 8,
    local_prop_width: int = 32,
    range_factor: float = 1.0,
    local_prop_mode: str = "jump",
    cost_fn=None,
):
    """One full depth-update round (optimize_depth.cu:471-491).

    Returns (depth, cost). `cost` must be the cost map of `depth` on entry
    (under the same cost function); the pair stays consistent throughout.
    `cost_fn(depth) -> cost map` overrides the default projected-track cost
    (pass a compute_cost_map_tracked closure for the gather-free fast path).
    """
    h, w = depth.shape

    if cost_fn is not None:
        cost_of = cost_fn
    else:

        def cost_of(candidate):
            return compute_cost_map(
                candidate, flows, rigidness, Rs, ts, priors, dp_pconfs,
                dp_confs, dp_Rs, dp_ts, active_n, p,
            )

    def accept(depth, cost, candidate, mask):
        cand_cost = cost_of(candidate)
        better = mask & (cand_cost < cost)
        return jnp.where(better, candidate, depth), jnp.where(better, cand_cost, cost)

    # --- random inverse-depth proposals (optimize_depth.cu:269-277).
    # The reference accepts sequentially; with a deterministic cost this is
    # argmin over {current, candidates}, evaluated as a fori_loop to bound
    # memory.
    if n_rand_samples > 0:
        keys = jax.random.split(key, n_rand_samples)

        def rand_round(i, dc):
            depth, cost = dc
            u = jax.random.uniform(keys[i], (h, w), jnp.float32)
            cand = 1.0 / (range_factor * u + 1.0 / MAXIMUM_DEPTH)
            return accept(depth, cost, cand, jnp.bool_(True))

        depth, cost = jax.lax.fori_loop(0, n_rand_samples, rand_round, (depth, cost))

    # --- global propagation (optimize_depth.cu:209-235): for step > 1 the
    # visited columns {1, 1+step, ...} read only unvisited neighbors, so each
    # direction is one parallel gather-accept over its visited set.
    if global_prop_step > 0:
        for (dy, dx, along_x, start_hi) in (
            (0, -1, True, False),  # L2R: visited x=1,1+step..., cand from x-1
            (1, 0, False, True),  # B2T: visited y=h-2,h-2-step..., cand from y+1
            (0, 1, True, True),  # R2L
            (-1, 0, False, False),  # T2B
        ):
            cand, valid = _shift_depth(depth, dy, dx)
            n = w if along_x else h
            idx = jnp.arange(n)
            if start_hi:
                visited = (n - 2 - idx) % global_prop_step == 0
                visited = visited & (idx <= n - 2)
            else:
                visited = (idx - 1) % global_prop_step == 0
                visited = visited & (idx >= 1)
            mask = visited[None, :] if along_x else visited[:, None]
            depth, cost = accept(depth, cost, cand, valid & mask)

    # --- local propagation: serial 32-wide chains -> jump-flooding sweeps.
    if local_prop_width > 0:
        if local_prop_mode == "jump":
            offsets = []
            o = 1
            while o < local_prop_width:
                offsets.append(o)
                o *= 2
            for (sy, sx) in ((0, -1), (1, 0), (0, 1), (-1, 0)):
                for o in offsets:
                    cand, valid = _shift_depth(depth, sy * o, sx * o)
                    depth, cost = accept(depth, cost, cand, valid)
        elif local_prop_mode == "exact":
            # Bit-faithful serial chains (for parity tests; slow on TPU).
            for (dy, dx) in ((0, -1), (1, 0), (0, 1), (-1, 0)):
                def chain_step(k, dc):
                    depth, cost = dc
                    n = w if dx != 0 else h
                    idx = jnp.arange(n)
                    if dx == -1:  # L2R within chunks
                        sel = (idx % local_prop_width) == (k % local_prop_width)
                        sel = sel & (idx >= 1)
                    elif dx == 1:  # R2L within chunks
                        sel = (idx % local_prop_width) == (
                            local_prop_width - 1 - (k % local_prop_width)
                        ) % local_prop_width
                        sel = sel & (idx <= n - 2)
                    elif dy == 1:  # B2T
                        sel = (idx % local_prop_width) == (
                            local_prop_width - 1 - (k % local_prop_width)
                        ) % local_prop_width
                        sel = sel & (idx <= n - 2)
                    else:  # T2B
                        sel = (idx % local_prop_width) == (k % local_prop_width)
                        sel = sel & (idx >= 1)
                    mask = sel[None, :] if dx != 0 else sel[:, None]
                    cand, valid = _shift_depth(depth, dy, dx)
                    return accept(depth, cost, cand, valid & mask)

                depth, cost = jax.lax.fori_loop(
                    1, local_prop_width, chain_step, (depth, cost)
                )
        else:
            raise ValueError(f"unknown local_prop_mode {local_prop_mode}")

    return depth, cost


def optimize_depth_batched(
    depth,
    cost,
    batch_cost_fn,
    key,
    *,
    n_rand_samples: int = 10,
    global_prop_step: int = 8,
    local_prop_width: int = 32,
    range_factor: float = 1.0,
):
    """Batched-proposal depth update (the Pallas fast path).

    Same proposal families as optimize_depth, but each phase evaluates its
    candidates in ONE batched cost call (`batch_cost_fn: (K, h, w) ->
    (K, h, w)` normalized costs) and the four propagation directions of a
    level accept jointly by per-pixel argmin — a further TPU-first
    reformulation of the reference's direction-sequential sweeps
    (optimize_depth.cu:480-491); accepts remain strictly non-increasing in
    cost.
    """
    h, w = depth.shape

    def accept_batch(depth, cost, cands, masks):
        costs = batch_cost_fn(cands)
        costs = jnp.where(masks, costs, jnp.inf)
        # gather-free best-of-K: min + one-hot select (take_along_axis
        # lowers to a dynamic gather on TPU; K is tiny so a masked sum is
        # pure VPU work).
        best_cost = jnp.min(costs, axis=0)
        k_best = jnp.argmin(costs, axis=0)
        onehot = jnp.arange(cands.shape[0])[:, None, None] == k_best[None]
        best_cand = jnp.sum(jnp.where(onehot, cands, 0.0), axis=0)
        better = best_cost < cost
        return (
            jnp.where(better, best_cand, depth),
            jnp.where(better, best_cost, cost),
        )

    if n_rand_samples > 0:
        u = jax.random.uniform(key, (n_rand_samples, h, w), jnp.float32)
        cands = 1.0 / (range_factor * u + 1.0 / MAXIMUM_DEPTH)
        depth, cost = accept_batch(
            depth, cost, cands, jnp.ones_like(cands, dtype=bool)
        )

    if global_prop_step > 0:
        cands, masks = [], []
        for (dy, dx, along_x, start_hi) in (
            (0, -1, True, False),
            (1, 0, False, True),
            (0, 1, True, True),
            (-1, 0, False, False),
        ):
            cand, valid = _shift_depth(depth, dy, dx)
            n = w if along_x else h
            idx = jnp.arange(n)
            if start_hi:
                visited = ((n - 2 - idx) % global_prop_step == 0) & (idx <= n - 2)
            else:
                visited = ((idx - 1) % global_prop_step == 0) & (idx >= 1)
            mask = visited[None, :] if along_x else visited[:, None]
            cands.append(cand)
            masks.append(valid & mask)
        depth, cost = accept_batch(depth, cost, jnp.stack(cands), jnp.stack(masks))

    o = 1
    while o < local_prop_width:
        cands, masks = [], []
        for (sy, sx) in ((0, -1), (1, 0), (0, 1), (-1, 0)):
            cand, valid = _shift_depth(depth, sy * o, sx * o)
            cands.append(cand)
            masks.append(valid)
        depth, cost = accept_batch(depth, cost, jnp.stack(cands), jnp.stack(masks))
        o *= 2

    return depth, cost
