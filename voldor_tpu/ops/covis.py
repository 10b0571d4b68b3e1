"""Device-side covisibility scoring for the pipelined VO driver.

The SLAM layer's covisibility gate (slam_utils.eval_covisibility, mirroring
reference slam_py/slam_utils.py:18-53) decides how many frames of a solved
window to accept (vo_step) and whether the spatial keyframe must be
replaced. In the sequential driver those decisions run on HOST depth maps,
which serializes: solve -> full depth readback -> covis -> next window's
dispatch. Computing the same scores ON DEVICE as part of the solve's fetch
graph removes the depth readback from the dispatch critical path — the
host learns vo_step from a handful of scalars and can dispatch window i+1
while window i's dense outputs are still in flight (slam/system.py
pipelined path).

Semantics match eval_covisibility exactly (same strided grid, strict
in-bounds test, half-resolution coverage histogram, harmonic mean), with
masking done by zero-weighting instead of boolean indexing (XLA needs
static shapes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from voldor_tpu.ops import lie


def _chain_T(poses6, n_flows):
    """Cumulative window transforms: chain_i maps frame-0 coords into
    frame (i+1) coords, chain_i = T(pose_i) @ ... @ T(pose_0). Inactive
    frames (>= n_flows) repeat the last active transform (their scores are
    ignored by the caller)."""
    Rs = lie.so3_exp(poses6[:, :3])  # (N,3,3)
    ts = poses6[:, 3:6]

    def step(carry, x):
        Rc, tc = carry
        R, t, active = x
        Rn = jnp.where(active, R @ Rc, Rc)
        tn = jnp.where(active, R @ tc + t, tc)
        return (Rn, tn), (Rn, tn)

    N = poses6.shape[0]
    active = jnp.arange(N) < n_flows  # scalar per scan step
    (_, _), (Rc, tc) = jax.lax.scan(
        step, (jnp.eye(3, dtype=poses6.dtype), jnp.zeros(3, poses6.dtype)),
        (Rs, ts, active),
    )
    return Rc, tc  # (N,3,3), (N,3)


def _covis_one(depth_s, w_mask, rays, R, t, K, h, w, stride):
    """One covisibility score. depth_s: strided depth (hs, ws); w_mask:
    strided {0,1} weights; rays: (hs*ws, 3) K^-1 pixel rays."""
    pts = rays * depth_s.reshape(-1, 1)  # frame-0 camera points
    pts = pts @ R.T + t
    proj = pts @ K.T
    z = proj[:, 2]
    zpos = z > 0
    p = proj[:, :2] / jnp.where(zpos, z, 1.0)[:, None]
    inb = (p[:, 0] > 0) & (p[:, 0] < w) & (p[:, 1] > 0) & (p[:, 1] < h)
    wgt = w_mask * zpos * inb
    n_grid = depth_s.size
    visibility = jnp.sum(wgt) / n_grid

    # half-resolution coverage histogram (bins with any weighted hit).
    # np.histogram2d's closed right edge maps px == w into the last bin;
    # the strict in-bounds wgt already excludes it, so floor indexing with
    # a clip is exact.
    nbx, nby = w // (2 * stride), h // (2 * stride)
    bx = jnp.clip((p[:, 0] * nbx / w).astype(jnp.int32), 0, nbx - 1)
    by = jnp.clip((p[:, 1] * nby / h).astype(jnp.int32), 0, nby - 1)
    # coverage counts every z>0 masked projection (host path filters only
    # z (histogram range drops out-of-bounds in x/y implicitly... it does
    # NOT: histogram2d range=(0,w) keeps 0<=px<=w) — match exactly:
    wcov = (
        w_mask
        * zpos
        * ((p[:, 0] >= 0) & (p[:, 0] <= w) & (p[:, 1] >= 0) & (p[:, 1] <= h))
    )
    hist = jnp.zeros(nbx * nby, jnp.float32).at[by * nbx + bx].add(
        wcov.astype(jnp.float32)
    )
    coverage = jnp.sum(hist > 0) / (nbx * nby)
    return 2 * (visibility * coverage) / jnp.maximum(
        visibility + coverage, 1e-12
    )


def _rays(K, h, w, stride, dtype):
    ys = jnp.arange(0, h, stride, dtype=dtype)
    xs = jnp.arange(0, w, stride, dtype=dtype)
    X, Y = jnp.meshgrid(xs, ys)
    ones = jnp.ones_like(X)
    coords = jnp.stack([X, Y, ones], -1).reshape(-1, 3)
    return coords @ jnp.linalg.inv(K).T


@partial(jax.jit, static_argnames=("stride", "n_cap"))
def covis_window(depth, conf, poses6, n_flows, K, conf_thresh, stride=4,
                 n_cap=None):
    """(N,) covisibility of the window's frame-0 depth under each
    cumulative transform chain_i (i = 1..N reported at index i-1) — the
    device analog of the process_vo vo_step loop
    (slam/system.py: eval_covisibility over T_tmp chains). n_cap
    statically clamps the active chain length (window padding)."""
    if n_cap is not None:
        n_flows = jnp.minimum(n_flows, n_cap)
    h, w = depth.shape
    dtype = depth.dtype
    rays = _rays(K.astype(dtype), h, w, stride, dtype)
    depth_s = depth[::stride, ::stride]
    mask = (conf[::stride, ::stride] > conf_thresh).astype(dtype).reshape(-1)
    Rc, tc = _chain_T(poses6, n_flows)
    return jax.vmap(
        lambda R, t: _covis_one(depth_s, mask, rays, R, t, K.astype(dtype),
                                h, w, stride)
    )(Rc, tc)


@partial(jax.jit, static_argnames=("stride", "n_cap"))
def covis_keyframe(depth_kf, conf_kf, scale_kf, poses6, n_flows, M, K,
                   conf_thresh, stride=4, n_cap=None):
    """(N,) covisibility of a keyframe's scaled depth under
    T(s) = chain_s @ M for every candidate window step s = 1..N, where
    M = Twc_cur_before_window @ Tcw_keyframe (host 4x4 constant at
    dispatch time). Entry s-1 answers: if the window advances s frames,
    does the spatial keyframe still see the current view
    (slam/system.py spakf gate)?"""
    if n_cap is not None:
        n_flows = jnp.minimum(n_flows, n_cap)
    h, w = depth_kf.shape
    dtype = depth_kf.dtype
    rays = _rays(K.astype(dtype), h, w, stride, dtype)
    depth_s = depth_kf[::stride, ::stride] * scale_kf
    mask = (conf_kf[::stride, ::stride] > conf_thresh).astype(dtype)
    mask = mask.reshape(-1)
    Rc, tc = _chain_T(poses6, n_flows)
    RM, tM = M[:3, :3], M[:3, 3]
    return jax.vmap(
        lambda R, t: _covis_one(
            depth_s, mask, rays, R @ RM, R @ tM + t, K.astype(dtype),
            h, w, stride,
        )
    )(Rc, tc)
