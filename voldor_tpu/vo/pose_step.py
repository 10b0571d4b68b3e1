"""Camera-pose step: P3P instance collection + batched solve + mode fusion.

TPU-native replacement for optimize_camera_pose (voldor/geometry.cpp:5-265)
and collect_p3p_instances (gpu-kernels/collect_p3p_instances.cu:70-250).
The whole step — collection, 8192-way LambdaTwist batch, meanshift, robust
Gaussian covariance — runs as ONE jitted dispatch with static shapes;
the reference's host-side NaN compaction becomes masked sampling.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from voldor_tpu.ops import ap3p, lie, p3p
from voldor_tpu.parallel.hints import shard_hint
from voldor_tpu.ops.image import bilinear_sample
from voldor_tpu.ops.meanshift import meanshift
from voldor_tpu.ops.robust_gaussian import RobustGaussianResult, fit_robust_gaussian
from voldor_tpu.vo.em import EmParams, _backproject, _pixel_grid


class PoseStepResult(NamedTuple):
    poses6: jax.Array  # (N, 6): full window poses, row active_idx updated
    pose_covars: jax.Array  # (N, 6, 6): row active_idx updated
    pose_density: jax.Array  # meanshift confidence or rg inlier density
    pose_sample_count: jax.Array  # int32: usable P3P solutions in the pool
    n_points: jax.Array  # int32: collected correspondences
    ms_iters: jax.Array
    rg_iters: jax.Array
    success: jax.Array  # bool (geometry.cpp:84-87, 178-179, 256-263)


def collect_p3p_instances(
    depth,
    flows,
    rigidness,
    Rs,
    ts,
    active_idx,
    p: EmParams,
    *,
    rigidness_threshold,
    rigidness_sum_threshold,
    sample_min_depth,
    sample_max_depth,
    max_trace_on_flow: int,
    sample_stride: int = 1,
):
    """Per-pixel (p2, p3) correspondence maps + validity.

    p3 lives in frame (active_idx - 1)'s... more precisely in the frame the
    3D point reaches after active_idx transforms minus the traced tail; p2
    is the pixel position traced along observed flows into frame active_idx
    (collect_p3p_instances.cu:70-145).

    sample_stride > 1 collects on a strided pixel subgrid (TPU knob, no
    reference analog): the P3P stage only draws 4*n_poses random
    correspondences from this pool anyway, and the scattered bilinear flow
    gathers here scale with the number of trace positions — the dominant
    cost of the camera sweep on TPU. stride=1 is reference-exact.
    Returns (p2 (hs, ws, 2), p3 (hs, ws, 3), valid (hs, ws)).
    """
    N, h, w = rigidness.shape
    xs, ys = _pixel_grid(h, w)
    if sample_stride > 1:
        s = sample_stride
        xs, ys = xs[::s, ::s], ys[::s, ::s]
        depth = depth[::s, ::s]
        rigidness = rigidness[:, ::s, ::s]
    hs, ws = xs.shape

    ok = (depth >= sample_min_depth) & (
        (sample_max_depth <= 0) | (depth <= sample_max_depth)
    )
    rig_sum = jnp.sum(rigidness, axis=0)
    # Inert with default thresholds; kept for parity
    # (collect_p3p_instances.cu:88-90).
    ok = ok & ~((rig_sum < rigidness_sum_threshold) & (rigidness_sum_threshold > N + 1))

    # Backward trace: n_trace = #frames (from active_idx down) whose running
    # rigidness product stays above threshold, capped at max_trace_on_flow
    # (collect_p3p_instances.cu:92-103).
    lo = jnp.where(
        max_trace_on_flow > 0,
        jnp.maximum(0, active_idx - max_trace_on_flow + 1),
        0,
    )

    def trace_step(carry, i):
        prod, n_trace, alive = carry
        f = active_idx - i
        in_range = (f >= lo) & (f >= 0)
        r = jnp.take(rigidness, jnp.clip(f, 0, N - 1), axis=0)
        prod_new = prod * r
        good = (prod_new > rigidness_threshold) & in_range & alive
        return (
            jnp.where(good, prod_new, prod),
            n_trace + good.astype(jnp.int32),
            good,
        ), None

    init = (jnp.ones((hs, ws), jnp.float32), jnp.zeros((hs, ws), jnp.int32), jnp.ones((hs, ws), bool))
    (_, n_trace, _), _ = jax.lax.scan(trace_step, init, jnp.arange(N))
    ok = ok & (n_trace > 0)

    # Forward pass: transform p3 up to the trace start, then trace p2 along
    # observed flows (collect_p3p_instances.cu:106-133).
    trace_start = active_idx - n_trace + 1  # (h, w) int
    ox, oy, oz = _backproject(xs, ys, depth, p)

    def fwd_step(carry, i):
        ox, oy, oz, px, py, out_of_bounds = carry
        tracing = i >= trace_start
        # At the first traced frame, project p3 to initialize (px, py).
        first = i == trace_start
        safe_oz = jnp.where(jnp.abs(oz) < 1e-12, 1e-12, oz)
        prj_x = (p.fx * ox + p.cx * safe_oz) / safe_oz
        prj_y = (p.fy * oy + p.cy * safe_oz) / safe_oz
        px = jnp.where(first, prj_x, px)
        py = jnp.where(first, prj_y, py)

        inb = (px > 0) & (px < w) & (py > 0) & (py < h)
        # The flow gather is the expensive part of this scan; no pixel can
        # trace outside [lo, active_idx], so skip it at runtime there (the
        # masked-out gathers were still executing and dominated the camera
        # sweep's cost).
        gather_possible = (i >= lo) & (i <= active_idx)
        d2 = jax.lax.cond(
            gather_possible,
            lambda: bilinear_sample(flows[jnp.clip(i, 0, N - 1)], px, py),
            lambda: jnp.zeros((hs, ws, 2), flows.dtype),
        )
        do_trace = tracing & (i <= active_idx)
        out_of_bounds = out_of_bounds | (do_trace & ~inb)
        px = jnp.where(do_trace & inb, px + d2[..., 0], px)
        py = jnp.where(do_trace & inb, py + d2[..., 1], py)

        # Transform p3 to the next frame while i < active_idx.
        R = Rs[jnp.clip(i, 0, N - 1)]
        t = ts[jnp.clip(i, 0, N - 1)]
        nx = R[0, 0] * ox + R[0, 1] * oy + R[0, 2] * oz + t[0]
        ny = R[1, 0] * ox + R[1, 1] * oy + R[1, 2] * oz + t[1]
        nz = R[2, 0] * ox + R[2, 1] * oy + R[2, 2] * oz + t[2]
        adv = i < active_idx
        ox = jnp.where(adv, nx, ox)
        oy = jnp.where(adv, ny, oy)
        oz = jnp.where(adv, nz, oz)
        return (ox, oy, oz, px, py, out_of_bounds), None

    init = (ox, oy, oz, jnp.zeros_like(xs), jnp.zeros_like(ys), jnp.zeros((hs, ws), bool))
    (ox, oy, oz, px, py, oob), _ = jax.lax.scan(fwd_step, init, jnp.arange(N))

    ok = ok & ~oob & (oz > sample_min_depth) & (
        (sample_max_depth <= 0) | (oz < sample_max_depth)
    )
    p2 = jnp.stack([px, py], axis=-1)
    p3 = jnp.stack([ox, oy, oz], axis=-1)
    finite = jnp.all(jnp.isfinite(p2), -1) & jnp.all(jnp.isfinite(p3), -1)
    return p2, p3, ok & finite


def collect_p3p_instances_all(
    depth,
    flows,
    rigidness,
    Rs,
    ts,
    active_n,
    p: EmParams,
    *,
    rigidness_threshold,
    rigidness_sum_threshold,
    sample_min_depth,
    sample_max_depth,
    max_trace_on_flow: int,
    sample_stride: int = 1,
):
    """(p2, p3, valid) correspondence maps for EVERY window frame in ONE
    scan — the batched (Jacobi) counterpart of collect_p3p_instances.

    Key observation: the 3D chain for target frame i is the shared
    point-transform chain truncated at step i, and the backward flow trace
    for target i is one of at most `max_trace_on_flow` rolling trace buffers
    (a trace born at frame s serves every target i with
    trace_start(i) == s). One scan over frames therefore yields all N
    targets with ONE batched flow gather per frame instead of the
    sequential sweep's per-target chains (collect_p3p_instances.cu:70-145
    semantics, scheduled TPU-first).

    Returns (p2 (N, hs, ws, 2), p3 (N, hs, ws, 3), valid (N, hs, ws)).
    """
    N, h, w = rigidness.shape
    xs, ys = _pixel_grid(h, w)
    if sample_stride > 1:
        s = sample_stride
        xs, ys = xs[::s, ::s], ys[::s, ::s]
        depth = depth[::s, ::s]
        rigidness = rigidness[:, ::s, ::s]
    hs, ws = xs.shape
    M = max(int(max_trace_on_flow), 1) if max_trace_on_flow > 0 else N

    ok0 = (depth >= sample_min_depth) & (
        (sample_max_depth <= 0) | (depth <= sample_max_depth)
    )
    rig_sum = jnp.sum(rigidness, axis=0)
    ok0 = ok0 & ~(
        (rig_sum < rigidness_sum_threshold) & (rigidness_sum_threshold > N + 1)
    )

    ox0, oy0, oz0 = _backproject(xs, ys, depth, p)
    ages = jnp.arange(M)

    def step(carry, frame):
        ox, oy, oz, tpx, tpy, toob, prods = carry
        R, t, flow, rig, i = frame
        active = i < active_n

        # rigidness products over the last M frames ending at i
        # (collect_p3p_instances.cu:92-103: backward walk while prod > tau).
        prods = jnp.concatenate([rig[None], prods[:-1] * rig[None]], axis=0)

        # birth of a new trace: project the chain point (frame-i coords)
        safe_oz = jnp.where(jnp.abs(oz) < 1e-12, 1e-12, oz)
        prj_x = (p.fx * ox + p.cx * safe_oz) / safe_oz
        prj_y = (p.fy * oy + p.cy * safe_oz) / safe_oz
        tpx = jnp.concatenate([prj_x[None], tpx[:-1]], axis=0)
        tpy = jnp.concatenate([prj_y[None], tpy[:-1]], axis=0)
        toob = jnp.concatenate(
            [jnp.zeros((1, hs, ws), bool), toob[:-1]], axis=0
        )

        # advance every live trace along the observed flow (ONE batched
        # gather; bounds semantics identical to the sequential fwd_step).
        inb = (tpx > 0) & (tpx < w) & (tpy > 0) & (tpy < h)
        obs = jax.lax.cond(
            active,
            lambda: bilinear_sample(flow, tpx, tpy),
            lambda: jnp.zeros((M, hs, ws, 2), flow.dtype),
        )
        toob = toob | ~inb
        tpx = jnp.where(inb, tpx + obs[..., 0], tpx)
        tpy = jnp.where(inb, tpy + obs[..., 1], tpy)

        # emit target i: pick the trace buffer of age n_trace-1
        age_ok = (ages <= i)[:, None, None]
        alive = (prods > rigidness_threshold) & age_ok
        prefix = jnp.cumprod(alive.astype(jnp.int32), axis=0)
        n_trace = jnp.sum(prefix, axis=0)  # (hs, ws) in 0..M
        sel = jnp.clip(n_trace - 1, 0, M - 1)
        onehot = ages[:, None, None] == sel[None]
        p2x = jnp.sum(jnp.where(onehot, tpx, 0.0), axis=0)
        p2y = jnp.sum(jnp.where(onehot, tpy, 0.0), axis=0)
        oob = jnp.any(onehot & toob, axis=0)
        finite = (
            jnp.isfinite(p2x) & jnp.isfinite(p2y)
            & jnp.isfinite(ox) & jnp.isfinite(oy) & jnp.isfinite(oz)
        )
        valid = (
            ok0 & active & (n_trace > 0) & ~oob & finite
            & (oz > sample_min_depth)
            & ((sample_max_depth <= 0) | (oz < sample_max_depth))
        )
        out = (p2x, p2y, ox, oy, oz, valid)

        # advance the chain point to frame i+1 coords
        nx = R[0, 0] * ox + R[0, 1] * oy + R[0, 2] * oz + t[0]
        ny = R[1, 0] * ox + R[1, 1] * oy + R[1, 2] * oz + t[1]
        nz = R[2, 0] * ox + R[2, 1] * oy + R[2, 2] * oz + t[2]
        return (nx, ny, nz, tpx, tpy, toob, prods), out

    init = (
        ox0, oy0, oz0,
        jnp.zeros((M, hs, ws), jnp.float32),
        jnp.zeros((M, hs, ws), jnp.float32),
        jnp.zeros((M, hs, ws), bool),
        jnp.zeros((M, hs, ws), jnp.float32),
    )
    _, (p2x, p2y, p3x, p3y, p3z, valid) = jax.lax.scan(
        step, init, (Rs, ts, flows, rigidness, jnp.arange(N))
    )
    p2 = jnp.stack([p2x, p2y], axis=-1)
    p3 = jnp.stack([p3x, p3y, p3z], axis=-1)
    return p2, p3, valid


def collect_p3p_instances_obs(
    depth,
    obs_track,
    obs_tinb,
    rigidness,
    Rs,
    ts,
    active_n,
    p: EmParams,
    *,
    rigidness_threshold,
    rigidness_sum_threshold,
    sample_min_depth,
    sample_max_depth,
    max_trace_on_flow: int,
    sample_stride: int = 1,
):
    """All-frames (p2, p3, valid) from the PRECOMPUTED observed tracks —
    zero flow gathers in the camera sweep.

    TPU-first redesign of collect_p3p_instances (same spirit as the
    'tracked' depth cost, vo/em.py:precompute_obs_tracks): the reference
    traces p2 from a projection of the current 3D estimate at trace_start
    (collect_p3p_instances.cu:106-133); here p2(i) is the frame-0 pixel's
    position in frame i+1 along the *observed* flow composition, which is
    pose/depth independent and already hoisted once per solve. p3(i) stays
    the chained transform of the current depth (elementwise). At the EM
    fixed point the projected and observed traces coincide, so the
    correspondence set is the same; off-optimum both designs pair a current
    3D estimate with observed 2D evidence. Gates kept from the reference:
    home-depth range, rigidness-product trace length (<= max_trace_on_flow),
    in-bounds along the track (from frame 0 here — a superset of the
    reference's trace_start..i bound), chain-depth range, finiteness.

    obs_track: (tx, ty, obx, oby) each (N, h, w) at FULL resolution;
    obs_tinb: (N, h, w). Returns (p2 (N, hs, ws, 2), p3 (N, hs, ws, 3),
    valid (N, hs, ws)).
    """
    N, h, w = rigidness.shape
    tx, ty, obx, oby = obs_track
    xs, ys = _pixel_grid(h, w)
    if sample_stride > 1:
        s = sample_stride
        xs, ys = xs[::s, ::s], ys[::s, ::s]
        depth = depth[::s, ::s]
        rigidness = rigidness[:, ::s, ::s]
        tx, ty = tx[:, ::s, ::s], ty[:, ::s, ::s]
        obx, oby = obx[:, ::s, ::s], oby[:, ::s, ::s]
        obs_tinb = obs_tinb[:, ::s, ::s]
    hs, ws = xs.shape
    M = max(int(max_trace_on_flow), 1) if max_trace_on_flow > 0 else N

    ok0 = (depth >= sample_min_depth) & (
        (sample_max_depth <= 0) | (depth <= sample_max_depth)
    )
    rig_sum = jnp.sum(rigidness, axis=0)
    ok0 = ok0 & ~(
        (rig_sum < rigidness_sum_threshold) & (rigidness_sum_threshold > N + 1)
    )

    # p2(i): the track position advanced through frame i's observed flow.
    p2x = tx + obx
    p2y = ty + oby
    cum_inb = jnp.cumprod(obs_tinb.astype(jnp.int32), axis=0) > 0

    ox0, oy0, oz0 = _backproject(xs, ys, depth, p)
    ages = jnp.arange(M)

    def step(carry, frame):
        ox, oy, oz, prods, cum_rig_ok = carry
        R, t, rig, i = frame
        prods = jnp.concatenate([rig[None], prods[:-1] * rig[None]], axis=0)
        age_ok = (ages <= i)[:, None, None]
        alive = (prods > rigidness_threshold) & age_ok
        n_trace = jnp.sum(jnp.cumprod(alive.astype(jnp.int32), axis=0), axis=0)
        # Tracks are anchored at frame 0 (the traced collect re-anchors at
        # trace_start instead), so a pixel whose EARLY flow was corrupted
        # carries that corruption into every later target; require the
        # whole track to be rigid, not just the reference's trailing
        # max_trace window. Inert on EM iteration 1 (rigidness == 1); the
        # hybrid schedule uses the traced collect there.
        cum_rig_ok = cum_rig_ok & ((rig > rigidness_threshold) | (i >= active_n))
        valid = (
            ok0 & (i < active_n) & (n_trace > 0) & cum_rig_ok
            & (oz > sample_min_depth)
            & ((sample_max_depth <= 0) | (oz < sample_max_depth))
            & jnp.isfinite(ox) & jnp.isfinite(oy) & jnp.isfinite(oz)
        )
        out = (ox, oy, oz, valid)
        nx = R[0, 0] * ox + R[0, 1] * oy + R[0, 2] * oz + t[0]
        ny = R[1, 0] * ox + R[1, 1] * oy + R[1, 2] * oz + t[1]
        nz = R[2, 0] * ox + R[2, 1] * oy + R[2, 2] * oz + t[2]
        return (nx, ny, nz, prods, cum_rig_ok), out

    init = (
        ox0, oy0, oz0,
        jnp.zeros((M, hs, ws), jnp.float32),
        jnp.ones((hs, ws), bool),
    )
    _, (p3x, p3y, p3z, valid) = jax.lax.scan(
        step, init, (Rs, ts, rigidness, jnp.arange(N))
    )
    valid = valid & cum_inb & jnp.isfinite(p2x) & jnp.isfinite(p2y)
    p2 = jnp.stack([p2x, p2y], axis=-1)
    p3 = jnp.stack([p3x, p3y, p3z], axis=-1)
    return p2, p3, valid


def _get_batch_p4p(minimal_solver: str):
    """Minimal-solver registry (--lambdatwist 1/0, config.h:23;
    geometry.cpp:149-153 selects lambdatwist vs AP3P)."""
    if minimal_solver == "lambdatwist":
        return p3p.solve_batch_p4p
    if minimal_solver == "ap3p":
        return ap3p.solve_batch_p4p_ap3p
    raise ValueError(f"unknown minimal_solver {minimal_solver!r}")


def _pose_step_core(
    depth,
    flows,
    rigidness,
    poses6,
    pose_covars,
    active_idx,
    successive_pose,
    rg_refine,
    key,
    p: EmParams,
    *,
    rigidness_threshold=0.5,
    rigidness_sum_threshold=1.0,
    sample_min_depth=0.1,
    sample_max_depth=1000.0,
    max_trace_on_flow=3,
    pose_sample_stride=1,
    n_poses_to_sample=8192,
    meanshift_kernel_var=0.1,
    meanshift_rvec_scale=25.0,
    meanshift_epsilon=1e-5,
    meanshift_max_iters=100,
    meanshift_max_init_trials=20,
    meanshift_good_init_confidence=0.5,
    rg_trunc_sigma=3.0,
    rg_covar_reg_lambda=0.001,
    rg_pose_scaling=100.0,
    rg_epsilon=1e-5,
    rg_max_iters=100,
    minimal_solver="lambdatwist",
    collect_mode="traced",
    obs_track=None,
    obs_tinb=None,
) -> PoseStepResult:
    """One camera-pose step (geometry.cpp:5-265), fully fused on device.

    poses6: (N, 6) full window pose state (row active_idx is the pose being
    refined; it doubles as the meanshift warm start when successive_pose).
    pose_covars: (N, 6, 6). Both are returned with the active row updated so
    the whole pose state stays device-resident across the window sweep.
    """
    Rs = lie.so3_exp(poses6[:, :3])
    ts = poses6[:, 3:6]
    pose6_init = poses6[active_idx]

    k_sample, k_ms = jax.random.split(key)
    collect_kw = dict(
        rigidness_threshold=rigidness_threshold,
        rigidness_sum_threshold=rigidness_sum_threshold,
        sample_min_depth=sample_min_depth,
        sample_max_depth=sample_max_depth,
        max_trace_on_flow=max_trace_on_flow,
        sample_stride=pose_sample_stride,
    )
    if collect_mode == "obs" and obs_track is not None:
        # gather-free collect from the hoisted observed tracks; the chain
        # transform (all frames, elementwise) is recomputed against the
        # CURRENT poses, preserving the Gauss-Seidel semantics of the
        # sequential sweep. Rows != active_idx are computed and discarded
        # (N is tiny; the per-row work is pure VPU math).
        p2all, p3all, vall = collect_p3p_instances_obs(
            depth, obs_track, obs_tinb, rigidness, Rs, ts,
            active_idx + 1, p, **collect_kw,
        )
        p2map = jnp.take(p2all, active_idx, axis=0)
        p3map = jnp.take(p3all, active_idx, axis=0)
        validmap = jnp.take(vall, active_idx, axis=0)
    else:
        p2map, p3map, validmap = collect_p3p_instances(
            depth, flows, rigidness, Rs, ts, active_idx, p, **collect_kw,
        )
    h, w = depth.shape
    p2s = p2map.reshape(-1, 2)
    p3s = p3map.reshape(-1, 3)
    valid = validmap.reshape(-1)
    n_points = jnp.sum(valid.astype(jnp.int32))

    batch_p4p = _get_batch_p4p(minimal_solver)
    rvecs, tvecs, ok = batch_p4p(
        p2s, p3s, valid, k_sample, p.fx, p.fy, p.cx, p.cy, n_poses=n_poses_to_sample
    )
    # multi-chip: partition the hypothesis pool over the mesh's hyp axis —
    # each chip runs its slice of the 8192 P4P solves + meanshift kernel
    # evaluations; the reductions become psums (no-op single-chip)
    rvecs = shard_hint(rvecs, "hyp", None)
    tvecs = shard_hint(tvecs, "hyp", None)
    ok = shard_hint(ok, "hyp")
    pool = jnp.concatenate([rvecs * meanshift_rvec_scale, tvecs], axis=-1)
    pool_valid = ok.astype(jnp.float32)
    pose_sample_count = jnp.sum(ok.astype(jnp.int32))

    ms_init = jnp.concatenate(
        [pose6_init[:3] * meanshift_rvec_scale, pose6_init[3:6]]
    )
    ms = meanshift(
        pool,
        pool_valid,
        meanshift_kernel_var,
        ms_init,
        successive_pose,
        k_ms,
        epsilon=meanshift_epsilon,
        max_iters=meanshift_max_iters,
        max_init_trials=meanshift_max_init_trials,
        good_init_confidence=meanshift_good_init_confidence,
    )

    # Robust-Gaussian refinement in the conditioned space: pool and mean
    # pre-scaled by rg_pose_scaling (geometry.cpp:201-246). Skipped at
    # runtime via lax.cond when rg_refine is off (the default config only
    # refines on the last EM iteration, config.h:15).
    s = rg_pose_scaling
    covar0 = jnp.eye(6, dtype=jnp.float32) * (meanshift_kernel_var * s * s)

    def run_rg():
        return fit_robust_gaussian(
            pool * s,
            pool_valid,
            ms.mean * s,
            covar0,
            trunc_sigma=rg_trunc_sigma,
            covar_reg_lambda=rg_covar_reg_lambda,
            epsilon=rg_epsilon,
            max_iters=rg_max_iters,
        )

    def skip_rg():
        return RobustGaussianResult(
            mean=ms.mean * s,
            covar=covar0,
            density=ms.confidence,
            iters=jnp.int32(0),
            reliable=jnp.bool_(False),
        )

    rg = jax.lax.cond(rg_refine, run_rg, skip_rg)
    rg_ok = rg.reliable & rg_refine
    # Undo conditioning: covar by s^2, then rvec rows/cols by the meanshift
    # rvec scale (geometry.cpp:225-233).
    unscale = jnp.concatenate(
        [jnp.full((3,), 1.0 / meanshift_rvec_scale), jnp.ones((3,))]
    )
    covar = (rg.covar / (s * s)) * unscale[:, None] * unscale[None, :]
    covar = jnp.where(rg_ok, covar, jnp.zeros((6, 6), jnp.float32))

    mean_scaled = jnp.where(rg_refine, jnp.where(rg.reliable, rg.mean / s, ms.mean), ms.mean)
    pose6 = jnp.concatenate(
        [mean_scaled[:3] / meanshift_rvec_scale, mean_scaled[3:6]]
    )
    # On rg failure the reference keeps the meanshift mean but zero covar
    # (geometry.cpp:236-238) — handled above. Density: rg overwrites only
    # when reliable (fit_robust_gaussian.cu:251-253).
    density = jnp.where(rg_refine & rg.reliable, rg.density, ms.confidence)

    success = (
        (n_points >= 4)
        & (pose_sample_count > 0)
        & jnp.all(jnp.isfinite(pose6))
    )
    pose6 = jnp.where(success, pose6, pose6_init)
    poses6_out = poses6.at[active_idx].set(pose6)
    covars_out = pose_covars.at[active_idx].set(
        jnp.where(success, covar, pose_covars[active_idx])
    )
    return PoseStepResult(
        poses6=poses6_out,
        pose_covars=covars_out,
        pose_density=density,
        pose_sample_count=pose_sample_count,
        n_points=n_points,
        ms_iters=ms.iters,
        rg_iters=rg.iters,
        success=success,
    )


_POSE_HP_STATIC = (
    "n_poses_to_sample",
    "pose_sample_stride",
    "meanshift_max_iters",
    "meanshift_max_init_trials",
    "rg_max_iters",
    "max_trace_on_flow",
    "minimal_solver",
    "collect_mode",
)


@partial(jax.jit, static_argnames=_POSE_HP_STATIC)
def optimize_camera_pose(
    depth,
    flows,
    rigidness,
    poses6,
    pose_covars,
    active_idx,
    successive_pose,
    rg_refine,
    seed,
    p: EmParams,
    **hp,
) -> PoseStepResult:
    """Single-frame jitted wrapper over _pose_step_core (kept for tests and
    fine-grained callers; the engine uses optimize_cameras_window)."""
    return _pose_step_core(
        depth, flows, rigidness, poses6, pose_covars, active_idx,
        successive_pose, rg_refine, jax.random.PRNGKey(seed), p, **hp
    )


def _as_key(seed):
    """Accept a uint32 scalar seed, a typed PRNG key, or raw key data."""
    if hasattr(seed, "dtype"):
        if jnp.issubdtype(seed.dtype, jax.dtypes.prng_key):
            return seed
        if getattr(seed, "ndim", 0) == 1:  # raw uint32[2] key data
            return seed
    return jax.random.PRNGKey(seed)


class CameraWindowResult(NamedTuple):
    poses6: jax.Array  # (N, 6)
    pose_covars: jax.Array  # (N, 6, 6)
    pose_densities: jax.Array  # (N,) updated where a step ran
    pose_sample_counts: jax.Array  # (N,) int32
    rigidness_densities: jax.Array  # (N,)
    n_flows_new: jax.Array  # int32: window size after truncation
    truncated: jax.Array  # bool


def _cameras_window_core(
    depth,
    flows,
    rigidness,
    poses6,
    pose_covars,
    pose_densities,
    pose_sample_counts,
    n_flows,
    allow_trunc,
    rg_refine,
    seed,
    p: EmParams,
    trunc_rigidness_density=0.05,
    trunc_sample_density=0.001,
    collect_mode="traced",
    obs_track=None,
    obs_tinb=None,
    **hp,
) -> CameraWindowResult:
    """The full per-window camera sweep with the truncation policy
    (voldor.cpp:164-201) fused into ONE dispatch.

    The reference (and our first implementation) runs one host-synchronized
    call per frame; on the remote-TPU platform every host sync costs ~45ms,
    so the sequential frame loop, the rigidness-density gate, and the
    truncation decisions all live in a lax.fori_loop here. The host reads
    back one small result per EM iteration instead of 3 scalars per frame.
    """
    N = flows.shape[0]
    base_key = _as_key(seed)
    # (h*w)-flattened mean keeps the transfer of this array off the
    # pathologically slow multi-axis-reduce output path.
    rig_dens = jnp.mean(rigidness.reshape(N, -1), axis=1)

    def body(i, carry):
        poses6, covars, densities, counts, n_flows_cur, truncated = carry
        in_window = (i < n_flows_cur) & (~truncated)
        attempt = in_window & (
            (~allow_trunc) | (rig_dens[i] > trunc_rigidness_density)
        )

        def run_step(args):
            poses6, covars = args
            res = _pose_step_core(
                depth, flows, rigidness, poses6, covars, i,
                counts[i] != 0, rg_refine, jax.random.fold_in(base_key, i),
                p, collect_mode=collect_mode, obs_track=obs_track,
                obs_tinb=obs_tinb, **hp,
            )
            return res.poses6, res.pose_covars, res.pose_density, \
                res.pose_sample_count, res.success

        def skip_step(args):
            poses6, covars = args
            return poses6, covars, densities[i], counts[i], jnp.bool_(False)

        poses6_n, covars_n, dens_i, count_i, success = jax.lax.cond(
            attempt, run_step, skip_step, (poses6, covars)
        )
        poses6 = jnp.where(in_window, poses6_n, poses6)
        covars = jnp.where(in_window, covars_n, covars)
        densities = jnp.where(
            in_window & success, densities.at[i].set(dens_i), densities
        )
        counts = jnp.where(in_window & success, counts.at[i].set(count_i), counts)

        # truncation check (voldor.cpp:187-194): on failure OR (when
        # truncation is allowed) on low pose density of the stored value.
        trunc_now = in_window & (
            (~success) | (allow_trunc & (densities[i] < trunc_sample_density))
        )
        n_flows_cur = jnp.where(trunc_now, i, n_flows_cur)
        truncated = truncated | trunc_now
        return poses6, covars, densities, counts, n_flows_cur, truncated

    init = (
        poses6,
        pose_covars,
        pose_densities,
        pose_sample_counts,
        jnp.int32(n_flows),
        jnp.bool_(False),
    )
    # Unrolled over the (small, static) window: avoids fori_loop state
    # round-trips between steps and lets XLA schedule across frames.
    carry = init
    for i in range(N):
        carry = body(i, carry)
    poses6, covars, densities, counts, n_flows_new, truncated = carry
    return CameraWindowResult(
        poses6=poses6,
        pose_covars=covars,
        pose_densities=densities,
        pose_sample_counts=counts,
        rigidness_densities=rig_dens,
        n_flows_new=n_flows_new,
        truncated=truncated,
    )


def _cameras_window_jacobi_core(
    depth,
    flows,
    rigidness,
    poses6,
    pose_covars,
    pose_densities,
    pose_sample_counts,
    n_flows,
    allow_trunc,
    rg_refine,
    seed,
    p: EmParams,
    trunc_rigidness_density=0.05,
    trunc_sample_density=0.001,
    *,
    rigidness_threshold=0.5,
    rigidness_sum_threshold=1.0,
    sample_min_depth=0.1,
    sample_max_depth=1000.0,
    max_trace_on_flow=3,
    pose_sample_stride=1,
    n_poses_to_sample=8192,
    meanshift_kernel_var=0.1,
    meanshift_rvec_scale=25.0,
    meanshift_epsilon=1e-5,
    meanshift_max_iters=100,
    meanshift_max_init_trials=20,
    meanshift_good_init_confidence=0.5,
    rg_trunc_sigma=3.0,
    rg_covar_reg_lambda=0.001,
    rg_pose_scaling=100.0,
    rg_epsilon=1e-5,
    rg_max_iters=100,
    minimal_solver="lambdatwist",
    collect_mode="traced",
    obs_track=None,
    obs_tinb=None,
) -> CameraWindowResult:
    """Batched (Jacobi) camera sweep: every frame's pose step against the
    pre-sweep window poses.

    TPU-first alternative to the reference's Gauss-Seidel sweep
    (voldor.cpp:164-201): one all-frames collect scan, one N*8192 P4P
    batch, vmapped meanshift + robust-Gaussian. The truncation policy is
    applied post-hoc on the per-frame outcomes (first failing frame cuts
    the window, exactly the sequential rule). Intended for EM iterations
    >= 2 where the window poses only drift ('hybrid' schedule);
    iteration-1 semantics need the sequential sweep (frame i's chain
    genuinely requires frame i-1's fresh estimate).
    """
    N = flows.shape[0]
    base_key = _as_key(seed)
    rig_dens = jnp.mean(rigidness.reshape(N, -1), axis=1)

    Rs = lie.so3_exp(poses6[:, :3])
    ts = poses6[:, 3:6]
    collect_kw = dict(
        rigidness_threshold=rigidness_threshold,
        rigidness_sum_threshold=rigidness_sum_threshold,
        sample_min_depth=sample_min_depth,
        sample_max_depth=sample_max_depth,
        max_trace_on_flow=max_trace_on_flow,
        sample_stride=pose_sample_stride,
    )
    if collect_mode == "obs" and obs_track is not None:
        p2, p3, valid = collect_p3p_instances_obs(
            depth, obs_track, obs_tinb, rigidness, Rs, ts, n_flows, p,
            **collect_kw,
        )
    else:
        p2, p3, valid = collect_p3p_instances_all(
            depth, flows, rigidness, Rs, ts, n_flows, p, **collect_kw,
        )
    p2s = p2.reshape(N, -1, 2)
    p3s = p3.reshape(N, -1, 3)
    valid_flat = valid.reshape(N, -1)
    n_points = jnp.sum(valid_flat.astype(jnp.int32), axis=1)

    frame_keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
        jnp.arange(N)
    )
    sample_keys = jax.vmap(lambda k: jax.random.split(k)[0])(frame_keys)
    ms_keys = jax.vmap(lambda k: jax.random.split(k)[1])(frame_keys)

    batch_p4p = _get_batch_p4p(minimal_solver)

    def one_p4p(p2_i, p3_i, valid_i, key_i):
        return batch_p4p(
            p2_i, p3_i, valid_i, key_i, p.fx, p.fy, p.cx, p.cy,
            n_poses=n_poses_to_sample,
        )

    rvecs, tvecs, ok = jax.vmap(one_p4p)(p2s, p3s, valid_flat, sample_keys)
    rvecs = shard_hint(rvecs, None, "hyp", None)
    tvecs = shard_hint(tvecs, None, "hyp", None)
    ok = shard_hint(ok, None, "hyp")
    pool = jnp.concatenate([rvecs * meanshift_rvec_scale, tvecs], axis=-1)
    pool_valid = ok.astype(jnp.float32)
    pose_sample_count = jnp.sum(ok.astype(jnp.int32), axis=1)

    ms_init = jnp.concatenate(
        [poses6[:, :3] * meanshift_rvec_scale, poses6[:, 3:6]], axis=-1
    )
    successive = pose_sample_counts != 0

    def one_ms(pool_i, valid_i, init_i, succ_i, key_i):
        return meanshift(
            pool_i, valid_i, meanshift_kernel_var, init_i, succ_i, key_i,
            epsilon=meanshift_epsilon,
            max_iters=meanshift_max_iters,
            max_init_trials=meanshift_max_init_trials,
            good_init_confidence=meanshift_good_init_confidence,
        )

    ms = jax.vmap(one_ms)(pool, pool_valid, ms_init, successive, ms_keys)

    s = rg_pose_scaling
    covar0 = jnp.broadcast_to(
        jnp.eye(6, dtype=jnp.float32) * (meanshift_kernel_var * s * s),
        (N, 6, 6),
    )

    def run_rg():
        def one_rg(pool_i, valid_i, mean_i, covar_i):
            return fit_robust_gaussian(
                pool_i * s, valid_i, mean_i * s, covar_i,
                trunc_sigma=rg_trunc_sigma,
                covar_reg_lambda=rg_covar_reg_lambda,
                epsilon=rg_epsilon,
                max_iters=rg_max_iters,
            )

        return jax.vmap(one_rg)(pool, pool_valid, ms.mean, covar0)

    def skip_rg():
        return RobustGaussianResult(
            mean=ms.mean * s,
            covar=covar0,
            density=ms.confidence,
            iters=jnp.zeros(N, jnp.int32),
            reliable=jnp.zeros(N, bool),
        )

    rg = jax.lax.cond(rg_refine, run_rg, skip_rg)
    rg_ok = rg.reliable & rg_refine
    unscale = jnp.concatenate(
        [jnp.full((3,), 1.0 / meanshift_rvec_scale), jnp.ones((3,))]
    )
    covar = (rg.covar / (s * s)) * unscale[:, None] * unscale[None, :]
    covar = jnp.where(rg_ok[:, None, None], covar, jnp.zeros((6, 6), jnp.float32))
    mean_scaled = jnp.where(
        rg_refine,
        jnp.where(rg.reliable[:, None], rg.mean / s, ms.mean),
        ms.mean,
    )
    pose6_new = jnp.concatenate(
        [mean_scaled[:, :3] / meanshift_rvec_scale, mean_scaled[:, 3:6]],
        axis=-1,
    )
    density = jnp.where(rg_refine & rg.reliable, rg.density, ms.confidence)
    success = (
        (n_points >= 4)
        & (pose_sample_count > 0)
        & jnp.all(jnp.isfinite(pose6_new), axis=-1)
    )

    # truncation policy on the batched outcomes (voldor.cpp:187-194):
    # the first in-window frame that fails (skipped by the rigidness-density
    # gate, unsuccessful, or below sample density when truncation is
    # allowed) cuts the window there; frames up to AND including the cut
    # frame keep their pose updates when successful, later ones are dropped.
    idx = jnp.arange(N)
    in_win = idx < n_flows
    attempt = in_win & ((~allow_trunc) | (rig_dens > trunc_rigidness_density))
    dens_new = jnp.where(success & attempt, density, pose_densities)
    passes = attempt & success & ~(
        allow_trunc & (dens_new < trunc_sample_density)
    )
    fail = in_win & ~passes
    first_fail = jnp.min(jnp.where(fail, idx, N))
    n_flows_new = jnp.minimum(jnp.int32(n_flows), first_fail.astype(jnp.int32))
    truncated = n_flows_new < n_flows
    apply = in_win & (idx <= first_fail) & attempt & success

    poses6_out = jnp.where(apply[:, None], pose6_new, poses6)
    covars_out = jnp.where(apply[:, None, None], covar, pose_covars)
    densities_out = jnp.where(apply, density, pose_densities)
    counts_out = jnp.where(apply, pose_sample_count, pose_sample_counts)
    return CameraWindowResult(
        poses6=poses6_out,
        pose_covars=covars_out,
        pose_densities=densities_out,
        pose_sample_counts=counts_out,
        rigidness_densities=rig_dens,
        n_flows_new=n_flows_new,
        truncated=truncated,
    )


@partial(jax.jit, static_argnames=_POSE_HP_STATIC)
def optimize_cameras_window(*args, **kwargs) -> CameraWindowResult:
    return _cameras_window_core(*args, **kwargs)
