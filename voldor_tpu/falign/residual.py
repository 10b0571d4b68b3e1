"""Frame-alignment residual: point-to-plane geometry + photometric term.

Value-parity with the CUDA residual (gpu-kernels/align_frame.cu:205-411):
per (ref, tar) pair and per ref pixel, lift the (depth-scaled) ref point to
world, drop it into the tar camera, and measure (a) the point-to-plane
distance between the tar surface and the point (weighted by a depth-based
confidence) and (b) an exposure-adjusted photometric difference, both
wrapped in a weighted sqrt-Cauchy robustifier.

The reference hand-derives ~150 lines of Jacobian chain rule
(align_frame.cu:306-379 incl. the rot_with_rvec d/drvec monster at 70-84);
here the Jacobian is jax.jacfwd through this function. Invalid pixels
(projections out of bounds / behind the camera) surface as a validity mask
instead of the reference's NaN residuals.

Per-frame parameter vector (9,): [rvec(3), tvec(3) (cam->world),
log depth scale, log color scale, color offset] (align_frame.cu:9,212-216).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from voldor_tpu.ops import lie
from voldor_tpu.ops.image import bilinear_sample_packed


class FrameMaps(NamedTuple):
    """Per-frame precomputed maps (align_frame_init_gpu, align_frame.cu:447-554).

    Maps are stored edge-padded to TPU-aligned dims (h -> multiple of 8,
    w -> multiple of 128): differentiating through bilinear gathers at
    certain unaligned sizes faults the TPU backend (185x613 reproducibly
    crashed the worker; padding either dim fixes it). logical_h/logical_w
    are returned separately by precompute_maps and passed as static args
    (they must be compile-time constants, not traced pytree leaves).

    The interpolated fields live CHANNEL-PACKED in one (N, hp, wp, 5)
    array — [depth, nx, ny, nz, image] — so the residual's tar-side
    sampling is ONE (2, 2, 5)-slice gather per query instead of three
    per-channel gathers (see ops.image.bilinear_sample_packed). weights is
    separate: it is only ever read on the ref side at stride (no gather).
    """

    packed: jax.Array  # (N, hp, wp, 5): depth, normal xyz, image
    weights: jax.Array  # (N, hp, wp)

    @property
    def depths(self):
        return self.packed[..., 0]

    @property
    def images(self):
        return self.packed[..., 4]

    @property
    def normals(self):
        return self.packed[..., 1:4]


def precompute_maps(depths, weights, images, fx, fy, cx, cy):
    """Normals from central differences of backprojected neighbours, flipped
    to point at the viewer (align_frame.cu:153-173).

    Returns (FrameMaps, (logical_h, logical_w))."""
    N, h, w = depths.shape
    logical_h, logical_w = int(h), int(w)
    h_pad = (-h) % 8
    w_pad = (-w) % 128
    if h_pad or w_pad:
        depths = jnp.pad(depths, ((0, 0), (0, h_pad), (0, w_pad)), mode="edge")
        if images is not None:
            images = jnp.pad(images, ((0, 0), (0, h_pad), (0, w_pad)), mode="edge")
        if weights is not None:
            weights = jnp.pad(weights, ((0, 0), (0, h_pad), (0, w_pad)), mode="edge")
        h, w = h + h_pad, w + w_pad
    ys, xs = jnp.mgrid[0:h, 0:w]
    xs = xs.astype(depths.dtype)
    ys = ys.astype(depths.dtype)

    def backproject(px, py, d):
        return jnp.stack(
            [((px - cx) / fx) * d, ((py - cy) / fy) * d, d], axis=-1
        )

    def clamped(a, dy, dx):
        ys_ = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
        xs_ = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
        return a[..., ys_[:, None], xs_[None, :]]

    def per_frame(depth):
        p3t = backproject(xs, ys - 1, clamped(depth, -1, 0))
        p3b = backproject(xs, ys + 1, clamped(depth, 1, 0))
        p3l = backproject(xs - 1, ys, clamped(depth, 0, -1))
        p3r = backproject(xs + 1, ys, clamped(depth, 0, 1))
        n = jnp.cross(p3t - p3b, p3l - p3r)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        ray = backproject(xs, ys, jnp.ones_like(depth))
        flip = jnp.sum(ray * n, axis=-1, keepdims=True) > 0
        return jnp.where(flip, -n, n)

    normals = jax.vmap(per_frame)(depths)
    if images is None:
        images = jnp.zeros_like(depths)
    if weights is None:
        weights = jnp.ones_like(depths)
    packed = jnp.concatenate(
        [depths[..., None], normals, images[..., None]], axis=-1
    )
    return FrameMaps(packed=packed, weights=weights), (logical_h, logical_w)


def pair_residual_map(
    params_ref,
    params_tar,
    ref_fid,
    tar_fid,
    maps: FrameMaps,
    fx,
    fy,
    cx,
    cy,
    vbf,
    crw,
    use_photo: bool,
    stride: int,
    bounds: tuple[int, int],
    apply_weights: bool = True,
):
    """Residual + validity over the strided ref pixel grid.

    Returns (residual (hs, ws): sqrt-Cauchy robustified, valid (hs, ws)).
    Residual semantics match compute_residual + apply_weighted_sqrt_cauchy
    (align_frame.cu:205-411): invalid pixels must be ignored by the caller.
    bounds: logical (h, w) of the unpadded maps.
    """
    h, w = bounds
    ys, xs = jnp.mgrid[0:h:stride, 0:w:stride]
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)

    rvec = params_ref[0:3]
    tvec = params_ref[3:6]
    d_scale_ref = params_ref[6]
    c_scale_ref = params_ref[7]
    c_offset_ref = params_ref[8]

    depth_ref = maps.depths[ref_fid][:h:stride, :w:stride]
    p2r_d = depth_ref * jnp.exp(d_scale_ref)
    p3r = jnp.stack(
        [((xs - cx) / fx) * p2r_d, ((ys - cy) / fy) * p2r_d, p2r_d], axis=-1
    )
    p3w = lie.rotate_rvec(p3r, rvec[None, None, :]) + tvec

    rvec0 = -params_tar[0:3]
    tvec0 = -lie.rotate_rvec(params_tar[3:6], rvec0)
    d_scale_tar = params_tar[6]
    c_scale_tar = params_tar[7]
    c_offset_tar = params_tar[8]

    p3t = lie.rotate_rvec(p3w, rvec0[None, None, :]) + tvec0
    zt = p3t[..., 2]
    safe_zt = jnp.where(jnp.abs(zt) < 1e-12, 1e-12, zt)
    p2t_x = (fx * p3t[..., 0]) / safe_zt + cx
    p2t_y = (fy * p3t[..., 1]) / safe_zt + cy
    valid = (p2t_x >= 0) & (p2t_x < w) & (p2t_y >= 0) & (p2t_y < h) & (zt >= 1.0)

    # ONE (2,2,5)-slice gather fetches depth+normal+image of the tar map at
    # every query (tools/microbench_gather.py: 4x over per-channel gathers).
    tar_samp = bilinear_sample_packed(maps.packed[tar_fid], p2t_x, p2t_y)
    p2t_d = tar_samp[..., 0] * jnp.exp(d_scale_tar)
    nvec = tar_samp[..., 1:4]

    p3t_ray = p3t * (p2t_d / safe_zt)[..., None]
    diff_geo = nvec * jnp.sum(nvec * (p3t_ray - p3t), axis=-1, keepdims=True)
    p3_geo = p3t + diff_geo
    z_geo = p3_geo[..., 2]
    safe_zgeo = jnp.where(jnp.abs(z_geo) < 1e-12, 1e-12, z_geo)
    geo_x = (fx * p3_geo[..., 0]) / safe_zgeo + cx
    geo_y = (fy * p3_geo[..., 1]) / safe_zgeo + cy
    valid = valid & (geo_x >= 0) & (geo_x < w) & (geo_y >= 0) & (geo_y < h)

    residual_depth = 0.5 * jnp.sum(diff_geo * diff_geo, axis=-1)
    drw = (vbf / (jnp.maximum(z_geo, 1.0) * jnp.maximum(zt, 1.0))) ** 2
    residual = drw * residual_depth

    if use_photo:
        c_ref = maps.images[ref_fid][:h:stride, :w:stride] + c_offset_ref
        c_tar = (tar_samp[..., 4] + c_offset_tar) * (
            jnp.exp(c_scale_ref) / jnp.exp(c_scale_tar)
        )
        residual = residual + crw * 0.5 * (c_ref - c_tar) ** 2

    weight = maps.weights[ref_fid][:h:stride, :w:stride] if apply_weights else 1.0
    r2 = weight * residual
    # sqrt-Cauchy robustifier (align_frame.cu:383-411): below eps the raw
    # value passes through.
    robust = jnp.sqrt(jnp.log(jnp.maximum(r2, 0.0) + 1.0))
    res = jnp.where(r2 > 1.1920929e-07, robust, r2)
    return jnp.where(valid, res, 0.0), valid
