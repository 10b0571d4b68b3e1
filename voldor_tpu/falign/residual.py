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
from voldor_tpu.ops.image import (bilinear_sample_packed,
                                  bilinear_sample_packed_grad)


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


def pair_residual_and_grads(
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
):
    """Residual + ANALYTIC per-point gradients w.r.t. both frames' 9-dim
    parameter vectors. Returns (res (hs, ws), Jr (hs, ws, 9), Jt (hs, ws, 9)).

    Same residual semantics as pair_residual_map; the Jacobian is the
    hand-derived chain rule instead of 18 forward-mode tangent replays.
    Structure: everything the residual reads downstream of the tar-camera
    point p_t is differentiated ONCE into a reverse-mode 3-vector
    h = d(res)/d(p_t) per point (including the bilinear-sample screen-space
    derivatives, the point-to-plane term, the depth reweight drw, the photo
    term, and the sqrt-Cauchy robustifier), then the 12 pose/scale columns
    chain through per-frame CONSTANT 3x3s:

        d(R(r)p)/dr = -[R p]x (R J_r(r))      (right Jacobian J_r, ops/lie)
        p_t = (R0 R) k D + R0 (t - u),  R0 = R(q)^T
        dres/dr = ((pw - t) x y)^T (R J_r),   y = R0^T h
        dres/dt = y;   dres/du = -y;   dres/dq = -(p_t x h)^T J_r(q)
        dres/ds_ref = h . (p_t - R0 (t - u))

    and the 6 scale/color columns are closed-form scalars. MFU.json
    measured the autodiff step HBM/traffic-bound (each of the 18 tangent
    replays re-walks the sampled maps); this evaluates the gather once and
    does ~10x fewer flops. The reference hand-derives the same chain in
    CUDA (align_frame.cu:306-379); this derivation is independent (reverse-
    mode, right-Jacobian form) and is verified against autodiff in
    tests/test_falign.py.
    """
    h, w = bounds
    ys, xs = jnp.mgrid[0:h:stride, 0:w:stride]
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    f32 = jnp.float32

    rvec, tvec = params_ref[0:3], params_ref[3:6]
    s_ref, c_ref_s, c_ref_o = params_ref[6], params_ref[7], params_ref[8]
    qvec, uvec = params_tar[0:3], params_tar[3:6]
    s_tar, c_tar_s, c_tar_o = params_tar[6], params_tar[7], params_tar[8]

    R = lie.so3_exp(rvec)
    A = R @ lie.so3_right_jacobian(rvec)
    R0 = lie.so3_exp(qvec).T
    Jr_q = lie.so3_right_jacobian(qvec)
    B = R0 @ R
    w0t = R0 @ (tvec - uvec)

    kx = (xs - cx) / fx
    ky = (ys - cy) / fy
    depth_ref = maps.depths[ref_fid][:h:stride, :w:stride]
    D = depth_ref * jnp.exp(s_ref)
    # pw - t = (R k) D;  p_t = (R0 R k) D + R0 (t - u)
    pw_t = (R[:, 0] * kx[..., None] + R[:, 1] * ky[..., None]
            + R[:, 2]) * D[..., None]
    pt = (B[:, 0] * kx[..., None] + B[:, 1] * ky[..., None]
          + B[:, 2]) * D[..., None] + w0t

    zt = pt[..., 2]
    safe_zt = jnp.where(jnp.abs(zt) < 1e-12, 1e-12, zt)
    inv_zt = 1.0 / safe_zt
    p2t_x = fx * pt[..., 0] * inv_zt + cx
    p2t_y = fy * pt[..., 1] * inv_zt + cy
    valid = (p2t_x >= 0) & (p2t_x < w) & (p2t_y >= 0) & (p2t_y < h) & (zt >= 1.0)

    samp, s_u, s_v = bilinear_sample_packed_grad(
        maps.packed[tar_fid], p2t_x, p2t_y
    )
    est = jnp.exp(s_tar)
    p2t_d = samp[..., 0] * est
    n = samp[..., 1:4]
    gam = p2t_d * inv_zt - 1.0
    npt = jnp.sum(n * pt, axis=-1)
    g = gam * npt  # n . (p3t_ray - p3t)
    nn = jnp.sum(n * n, axis=-1)
    res_d = 0.5 * g * g * nn
    z_geo = zt + g * n[..., 2]
    p3_geo = pt + n * g[..., None]
    safe_zgeo = jnp.where(jnp.abs(z_geo) < 1e-12, 1e-12, z_geo)
    geo_x = fx * p3_geo[..., 0] / safe_zgeo + cx
    geo_y = fy * p3_geo[..., 1] / safe_zgeo + cy
    valid = valid & (geo_x >= 0) & (geo_x < w) & (geo_y >= 0) & (geo_y < h)

    Zg = jnp.maximum(z_geo, 1.0)
    Zt = jnp.maximum(zt, 1.0)
    drw = (vbf / (Zg * Zt)) ** 2
    residual = drw * res_d
    if use_photo:
        E = jnp.exp(c_ref_s) / jnp.exp(c_tar_s)
        cref = maps.images[ref_fid][:h:stride, :w:stride] + c_ref_o
        star = samp[..., 4] + c_tar_o
        ph = cref - star * E
        residual = residual + crw * 0.5 * ph * ph

    weight = maps.weights[ref_fid][:h:stride, :w:stride]
    r2 = weight * residual
    robust = jnp.sqrt(jnp.log(jnp.maximum(r2, 0.0) + 1.0))
    res = jnp.where(r2 > 1.1920929e-07, robust, r2)
    res = jnp.where(valid, res, 0.0)

    # ---- reverse-mode by hand ------------------------------------------
    dres_dr2 = jnp.where(
        r2 > 1.1920929e-07,
        1.0 / (2.0 * jnp.maximum(robust, 1e-20) * (r2 + 1.0)),
        f32(1.0),
    )
    Wp = dres_dr2 * weight

    zeros = jnp.zeros_like(zt)
    au = jnp.stack([fx * inv_zt, zeros, -fx * pt[..., 0] * inv_zt * inv_zt],
                   axis=-1)
    av = jnp.stack([zeros, fy * inv_zt, -fy * pt[..., 1] * inv_zt * inv_zt],
                   axis=-1)
    ez = jnp.asarray([0.0, 0.0, 1.0], f32)

    sd_u, sd_v = s_u[..., 0], s_v[..., 0]
    n_u, n_v = s_u[..., 1:4], s_v[..., 1:4]

    dgam_pt = ((est * inv_zt)[..., None]
               * (sd_u[..., None] * au + sd_v[..., None] * av)
               - (p2t_d * inv_zt * inv_zt)[..., None] * ez)
    pt_nu = jnp.sum(pt * n_u, axis=-1)
    pt_nv = jnp.sum(pt * n_v, axis=-1)
    dnpt_pt = pt_nu[..., None] * au + pt_nv[..., None] * av + n
    dg_pt = gam[..., None] * dnpt_pt + npt[..., None] * dgam_pt
    n_nu = jnp.sum(n * n_u, axis=-1)
    n_nv = jnp.sum(n * n_v, axis=-1)
    dnn_pt = 2.0 * (n_nu[..., None] * au + n_nv[..., None] * av)
    dresd_pt = (g * nn)[..., None] * dg_pt + (0.5 * g * g)[..., None] * dnn_pt
    dzgeo_pt = (ez + n[..., 2:3] * dg_pt
                + g[..., None] * (n_u[..., 2:3] * au + n_v[..., 2:3] * av))
    gz = jnp.where(z_geo > 1.0, 1.0 / Zg, 0.0)
    tz = jnp.where(zt > 1.0, 1.0 / Zt, 0.0)
    ddrw_pt = (-2.0 * drw)[..., None] * (gz[..., None] * dzgeo_pt
                                         + tz[..., None] * ez)
    h_pt = drw[..., None] * dresd_pt + res_d[..., None] * ddrw_pt
    if use_photo:
        si_u, si_v = s_u[..., 4], s_v[..., 4]
        dph_pt = -E * (si_u[..., None] * au + si_v[..., None] * av)
        h_pt = h_pt + (crw * ph)[..., None] * dph_pt
    h_pt = Wp[..., None] * h_pt
    h_pt = jnp.where(valid[..., None], h_pt, 0.0)

    # pose/scale columns through per-frame constant 3x3s
    y3 = h_pt @ R0  # R0^T h
    Jc_r = jnp.cross(pw_t, y3) @ A
    Jc_sr = jnp.sum(h_pt * (pt - w0t), axis=-1)
    Jq = -(jnp.cross(pt, h_pt) @ Jr_q)

    # tar depth-scale column (direct, not via p_t)
    dgam_st = p2t_d * inv_zt
    dg_st = npt * dgam_st
    Jst = Wp * (drw * (g * nn * dg_st)
                + res_d * (-2.0 * drw * gz * (n[..., 2] * dg_st)))
    vmask = valid.astype(f32)
    Jst = Jst * vmask

    if use_photo:
        phv = Wp * crw * ph * vmask
        Jcr = phv * (-(star * E))
        Jor = phv
        Jct = phv * (star * E)
        Jot = phv * (-E)
    else:
        Jcr = Jor = Jct = Jot = zeros

    Jr_out = jnp.concatenate(
        [Jc_r, y3, Jc_sr[..., None], Jcr[..., None], Jor[..., None]], axis=-1
    )
    Jt_out = jnp.concatenate(
        [Jq, -y3, Jst[..., None], Jct[..., None], Jot[..., None]], axis=-1
    )
    return res, Jr_out, Jt_out
