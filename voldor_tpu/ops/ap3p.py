"""Batched AP3P minimal pose solver (Ke & Roumeliotis, CVPR 2017).

The reference's alternative P3P backend (``--lambdatwist 0``,
gpu-kernels/solve_batch_ap3p.cu:28-437): an algebraic solution that reduces
P3P to a quartic in cos(theta1') via two intermediate rotations, then
recovers R,t per real root and disambiguates with a 4th point. Re-derived
for TPU as branch-free vmapped JAX: the per-thread CUDA control flow
(root-count branches, early exits) becomes masked lane math — all 4 quartic
roots are always processed, invalid ones carry ``valid=False``.

The quartic is solved by Ferrari's closed form in complex64 followed by
Newton polishing (the reference polishes 2 rounds, solve_batch_ap3p.cu:86-99;
we run 3 for f32 headroom). Note the reference's resolvent-cubic branch
contains a double-sqrt transcription slip (solve_batch_ap3p.cu:57-60); this
implementation uses the correct single-sqrt form (w = ±sqrt(q3²-p3³) − q3).

Conventions match ops/p3p.py: solutions map world → camera,
x_cam = R x_world + t; pixel reprojection through (fx, fy, cx, cy).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from voldor_tpu.ops import lie

_POLISH_ITERS = 3


def _solve_quartic(a4, a3, a2, a1, a0):
    """All four (possibly complex-paired) roots of a4 x^4 + ... + a0.

    Ferrari's method on the depressed quartic; returns the real parts of the
    four roots (solve_batch_ap3p.cu:28-84 layout). Complex-paired roots come
    out as their real part and are rejected later by the |cos|<=1 gate and
    the reprojection vote.
    """
    a4 = jnp.where(jnp.abs(a4) < 1e-20, 1e-20, a4)
    a4_2 = a4 * a4
    a3_2 = a3 * a3
    a4_3 = a4_2 * a4
    a2a4 = a2 * a4

    p4 = (8.0 * a2a4 - 3.0 * a3_2) / (8.0 * a4_2)
    q4 = (a3_2 * a3 - 4.0 * a2a4 * a3 + 8.0 * a1 * a4_2) / (8.0 * a4_3)
    r4 = (
        256.0 * a0 * a4_3 - 3.0 * a3_2 * a3_2 - 64.0 * a1 * a3 * a4_2
        + 16.0 * a2a4 * a3_2
    ) / (256.0 * a4_3 * a4)

    p3 = (p4 * p4 / 12.0 + r4) / 3.0
    q3 = (72.0 * r4 * p4 - 2.0 * p4 * p4 * p4 - 27.0 * q4 * q4) / 432.0

    disc = (q3 * q3 - p3 * p3 * p3).astype(jnp.complex64)
    wroot = jnp.sqrt(disc)
    # pick the sign that avoids cancellation against -q3
    w = jnp.where(q3 >= 0, -wroot, wroot) - q3

    # real cube root when w is real, principal complex cbrt otherwise
    w_is_real = jnp.abs(jnp.imag(w)) < 1e-12
    wr = jnp.real(w)
    wr_safe = jnp.where(jnp.abs(wr) < 1e-20, 1e-20, wr)
    cbrt_r = jnp.cbrt(wr_safe)
    t_real = 2.0 * (cbrt_r + p3 / cbrt_r)
    w_c = w ** (1.0 / 3.0)
    t_cplx = 4.0 * jnp.real(w_c)
    t = jnp.where(w_is_real, t_real, t_cplx)

    sqrt_2m = jnp.sqrt((-2.0 * p4 / 3.0 + t).astype(jnp.complex64))
    B_4A = -a3 / (4.0 * a4)
    c1 = (4.0 * p4 / 3.0 + t).astype(jnp.complex64)
    sqrt_2m_safe = jnp.where(jnp.abs(sqrt_2m) < 1e-20, 1e-20, sqrt_2m)
    c2 = 2.0 * q4 / sqrt_2m_safe

    sqrt_2m_rh = jnp.real(sqrt_2m) * 0.5
    s1 = jnp.real(jnp.sqrt(-(c1 + c2))) * 0.5
    s2 = jnp.real(jnp.sqrt(-(c1 - c2))) * 0.5
    roots = jnp.stack(
        [
            B_4A + sqrt_2m_rh + s1,
            B_4A + sqrt_2m_rh - s1,
            B_4A - sqrt_2m_rh + s2,
            B_4A - sqrt_2m_rh - s2,
        ]
    )

    # Newton polish (solve_batch_ap3p.cu:86-99)
    def polish(r, _):
        err = (((a4 * r + a3) * r + a2) * r + a1) * r + a0
        der = ((4.0 * a4 * r + 3.0 * a3) * r + 2.0 * a2) * r + a1
        der = jnp.where(jnp.abs(der) < 1e-20, 1e-20, der)
        return r - err / der, None

    roots, _ = jax.lax.scan(polish, roots, None, length=_POLISH_ITERS)
    return roots


def _ap3p_poses(b1, b2, b3, w1, w2, w3):
    """Up to 4 (R, t) world→camera solutions from 3 bearing/point pairs.

    Mirrors computePoses (solve_batch_ap3p.cu:147-295) with masked lanes
    instead of the solution-compaction loop. Returns (Rs (4,3,3), ts (4,3),
    ok (4,))."""
    u0 = w1 - w2
    nu0 = jnp.linalg.norm(u0)
    k1 = u0 / jnp.maximum(nu0, 1e-20)

    k3 = jnp.cross(b1, b2)
    nk3 = jnp.linalg.norm(k3)
    k3 = k3 / jnp.maximum(nk3, 1e-20)
    tz = jnp.cross(b1, k3)

    v1 = jnp.cross(b1, b3)
    v2 = jnp.cross(b2, b3)
    u1 = w1 - w3

    u1k1 = jnp.dot(u1, k1)
    k3b3 = jnp.dot(k3, b3)
    f11 = k3b3
    f13 = jnp.dot(k3, v1)
    f15 = -u1k1 * f11

    nl = jnp.cross(u1, k1)
    delta = jnp.linalg.norm(nl)
    nl = nl / jnp.maximum(delta, 1e-20)
    f11 = f11 * delta
    f13 = f13 * delta

    u2k1 = u1k1 - nu0
    f21 = jnp.dot(tz, v2)
    f22 = nk3 * k3b3
    f23 = jnp.dot(k3, v2)
    f24 = u2k1 * f22
    f25 = -u2k1 * f21
    f21 = f21 * delta
    f22 = f22 * delta
    f23 = f23 * delta

    g1 = f13 * f22
    g2 = f13 * f25 - f15 * f23
    g3 = f11 * f23 - f13 * f21
    g4 = -f13 * f24
    g5 = f11 * f22
    g6 = f11 * f25 - f15 * f21
    g7 = -f15 * f24

    s = _solve_quartic(
        g5 * g5 + g1 * g1 + g3 * g3,
        2.0 * (g5 * g6 + g1 * g2 + g3 * g4),
        g6 * g6 + 2.0 * g5 * g7 + g2 * g2 + g4 * g4 - g1 * g1 - g3 * g3,
        2.0 * (g6 * g7 - g1 * g2 - g3 * g4),
        g7 * g7 - g2 * g2 - g4 * g4,
    )  # (4,) cos(theta1') candidates

    Ck1nl = jnp.stack([k1, nl, jnp.cross(k1, nl)], axis=1)  # columns
    Cb1k3tzT = jnp.stack([b1, k3, tz], axis=0)  # rows
    b3p = (delta / jnp.where(jnp.abs(k3b3) < 1e-20, 1e-20, k3b3)) * b3

    def one(ctheta1p):
        ok = jnp.abs(ctheta1p) <= 1.0
        st = jnp.sqrt(jnp.maximum(1.0 - ctheta1p * ctheta1p, 0.0))
        stheta1p = jnp.where(k3b3 > 0, st, -st)
        denom = (g5 * ctheta1p + g6) * ctheta1p + g7
        ntheta3 = stheta1p / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        ctheta3 = (g1 * ctheta1p + g2) * ntheta3
        stheta3 = (g3 * ctheta1p + g4) * ntheta3
        C13 = jnp.asarray(
            [
                [ctheta3, 0.0, -stheta3],
                [stheta1p * stheta3, ctheta1p, stheta1p * ctheta3],
                [ctheta1p * stheta3, -stheta1p, ctheta1p * ctheta3],
            ]
        )
        Rwk = Ck1nl @ C13 @ Cb1k3tzT
        R = Rwk.T  # world→camera (the CUDA code stores the transpose,
        # solve_batch_ap3p.cu:276-286)
        t = stheta1p * b3p - R @ w3
        ok = ok & jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t))
        return R, t, ok

    Rs, ts, oks = jax.vmap(one)(s)
    return Rs, ts, oks


def _ap3p_p4p_single(p2s, p3s, fx, fy, cx, cy):
    """Solve one 4-correspondence instance; disambiguate with the 4th point
    (solve_batch_ap3p.cu:352-376). Returns (rvec, tvec, valid)."""

    def bearing(uv):
        m = jnp.asarray([(uv[0] - cx) / fx, (uv[1] - cy) / fy, 1.0])
        return m / jnp.linalg.norm(m)

    b = jax.vmap(bearing)(p2s[:3])
    Rs, ts, oks = _ap3p_poses(b[0], b[1], b[2], p3s[0], p3s[1], p3s[2])

    x4 = p3s[3]
    proj = (Rs @ x4[:, None])[:, :, 0] + ts  # (4, 3)
    z = jnp.where(jnp.abs(proj[:, 2]) < 1e-12, 1e-12, proj[:, 2])
    du = cx + fx * proj[:, 0] / z - p2s[3, 0]
    dv = cy + fy * proj[:, 1] / z - p2s[3, 1]
    reproj = du * du + dv * dv
    reproj = jnp.where(oks, reproj, jnp.inf)
    best = jnp.argmin(reproj)
    R = Rs[best]
    t = ts[best]
    valid = jnp.any(oks) & jnp.isfinite(reproj[best])
    rvec = lie.so3_log(R)
    valid = valid & jnp.all(jnp.isfinite(rvec)) & jnp.all(jnp.isfinite(t))
    return rvec, t, valid


@partial(jax.jit, static_argnames=("n_poses",))
def solve_batch_p4p_ap3p(
    p2s: jax.Array,
    p3s: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    fx,
    fy,
    cx,
    cy,
    n_poses: int = 8192,
):
    """AP3P drop-in for p3p.solve_batch_p4p (same sampling + return contract:
    (rvecs (n_poses,3), tvecs (n_poses,3), ok (n_poses,)))."""
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    order = jnp.argsort(~valid)
    idx = jax.random.randint(key, (n_poses, 4), 0, n_valid)
    sel = order[idx]
    p2_sets = p2s[sel]
    p3_sets = p3s[sel]
    rvecs, tvecs, ok = jax.vmap(
        _ap3p_p4p_single, in_axes=(0, 0, None, None, None, None)
    )(p2_sets, p3_sets, fx, fy, cx, cy)
    ok = ok & (jnp.sum(valid) >= 4)
    return rvecs, tvecs, ok
