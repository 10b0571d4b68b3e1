"""Batched LambdaTwist P3P / P4P minimal pose solver.

Re-implementation of the LambdaTwist algorithm (Persson & Nordberg, ECCV
2018) as branch-free, vmapped JAX — the TPU replacement for the reference's
per-thread CUDA solver (lambdatwist/lambdatwist_p3p.h:19-295 and the P4P
disambiguation wrapper lambdatwist_p4p.h:5-62, batched by
gpu-kernels/solve_batch_lambdatwist.cu:11-102 over 8192 hypotheses).

Every data-dependent branch of the original becomes a `jnp.where` select;
invalid/failed solutions surface as `valid=False` rows (the CUDA version
writes NaNs which the host then filters; we keep static shapes and a mask).

Stages:
  1. cubic root (Newton with the paper's stationary-point-aware init),
  2. 3x3 eigendecomposition with a known zero eigenvalue,
  3. up to 4 lambda (depth) triples from two quadratics,
  4. Gauss-Newton refinement of each triple,
  5. rotation recovery R = Y X^-1, translation t = l1*y1 - R x1,
  6. P4P disambiguation by 4th-point reprojection.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from voldor_tpu.ops import lie

_CUBIC_ITERS = 24  # reference uses <=50 Newton steps with early break
_REFINE_ITERS = 5  # lambdatwist_p4p.h:12 template default


def _root2real(b, c):
    """Stable real roots of x^2 + b x + c (solve_cubic.h:13-33).

    Returns (r1, r2, has_real).
    """
    v = b * b - 4.0 * c
    has_real = v >= 0
    y = jnp.sqrt(jnp.maximum(v, 0.0))
    r1_neg = 0.5 * (-b + y)
    r2_neg = 0.5 * (-b - y)
    r1_pos = 2.0 * c / jnp.where(jnp.abs(-b + y) < 1e-30, 1e-30, (-b + y))
    r2_pos = 2.0 * c / jnp.where(jnp.abs(-b - y) < 1e-30, 1e-30, (-b - y))
    r1 = jnp.where(b < 0, r1_neg, r1_pos)
    r2 = jnp.where(b < 0, r2_neg, r2_pos)
    r1 = jnp.where(has_real, r1, 0.5 * b)
    r2 = jnp.where(has_real, r2, 0.5 * b)
    return r1, r2, has_real


def _cubick(b, c, d):
    """Most-stable real root of x^3 + b x^2 + c x + d (solve_cubic.h:155-205)."""

    def h(r):
        return ((r + b) * r + c) * r + d

    def hp(r):
        return (3.0 * r + 2.0 * b) * r + c

    # Init: stationary-point-aware seed.
    disc = b * b - 3.0 * c
    v = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - v) / 3.0
    t2 = (-b + v) / 3.0
    k1 = h(t1)
    k2 = h(t2)
    r0_a = t1 - jnp.sqrt(jnp.maximum(-k1 / (3.0 * t1 + b), 0.0))
    r0_b = t2 + jnp.sqrt(jnp.maximum(-k2 / (3.0 * t2 + b), 0.0))
    r0_stat = jnp.where(k1 > 0.0, r0_a, r0_b)
    r0_mono = -b / 3.0
    r0_mono = jnp.where(jnp.abs(hp(r0_mono)) < 1e-4, r0_mono + 1.0, r0_mono)
    r0 = jnp.where(disc >= 0.0, r0_stat, r0_mono)

    def newton(r, _):
        fx = h(r)
        fpx = hp(r)
        step = fx / jnp.where(jnp.abs(fpx) < 1e-30, 1e-30, fpx)
        return r - step, None

    r0, _ = jax.lax.scan(newton, r0, None, length=_CUBIC_ITERS)
    return r0


def _eig_with_known0(A):
    """Eigen-decomposition of symmetric 3x3 A with a known zero eigenvalue
    (solve_eig0.h). Returns (V columns (3,3), L=(e1,e2,0)) with |e1|>=|e2|."""
    a00, a01, a02 = A[0, 0], A[0, 1], A[0, 2]
    a11, a12, a22 = A[1, 1], A[1, 2], A[2, 2]

    v3 = jnp.stack(
        [a01 * a12 - a02 * a11, a02 * a01 - a12 * a00, a11 * a00 - a01 * a01]
    )
    v3 = v3 / jnp.maximum(jnp.linalg.norm(v3), 1e-30)

    b = -a00 - a11 - a22
    c = -a01 * a01 - a02 * a02 - a12 * a12 + a00 * (a11 + a22) + a11 * a22
    e1, e2, _ = _root2real(b, c)
    swap = jnp.abs(e1) < jnp.abs(e2)
    e1, e2 = jnp.where(swap, e2, e1), jnp.where(swap, e1, e2)

    mx0011 = -a00 * a11
    prec_0 = a01 * a12 - a02 * a11
    prec_1 = a01 * a02 - a00 * a12

    def eigvec(e):
        tmp = 1.0 / (e * (a00 + a11) + mx0011 - e * e + a01 * a01)
        w0 = -(e * a02 + prec_0) * tmp
        w1 = -(e * a12 + prec_1) * tmp
        rnorm = 1.0 / jnp.sqrt(w0 * w0 + w1 * w1 + 1.0)
        return jnp.stack([w0 * rnorm, w1 * rnorm, rnorm])

    V = jnp.stack([eigvec(e1), eigvec(e2), v3], axis=1)  # columns
    L = jnp.stack([e1, e2, jnp.zeros_like(e1)])
    return V, L


def _gn_refine_lambdas(L, valid, a12, a13, a23, b12, b13, b23):
    """Gauss-Newton refinement of a depth triple (refine_lambda.h:21-100),
    with the reference's accept-only-if-better gating as a frozen flag."""

    def residuals(l):
        l1, l2, l3 = l[0], l[1], l[2]
        r1 = l1 * l1 + l2 * l2 + b12 * l1 * l2 - a12
        r2 = l1 * l1 + l3 * l3 + b13 * l1 * l3 - a13
        r3 = l2 * l2 + l3 * l3 + b23 * l2 * l3 - a23
        return jnp.stack([r1, r2, r3])

    def step(carry, _):
        l, frozen = carry
        r = residuals(l)
        rsum = jnp.sum(jnp.abs(r))
        converged = rsum < 1e-10
        l1, l2, l3 = l[0], l[1], l[2]
        v0 = 2.0 * l1 + b12 * l2
        v1 = 2.0 * l2 + b12 * l1
        v3 = 2.0 * l1 + b13 * l3
        v5 = 2.0 * l3 + b13 * l1
        v7 = 2.0 * l2 + b23 * l3
        v8 = 2.0 * l3 + b23 * l2
        det = -v0 * v5 * v7 - v1 * v3 * v8
        det_inv = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        Ji = jnp.array(
            [
                [-v5 * v7, -v1 * v8, v1 * v5],
                [-v3 * v8, v0 * v8, -v0 * v5],
                [v3 * v7, -v0 * v7, -v1 * v3],
            ]
        )
        l_new = l - det_inv * (Ji @ r)
        worse = jnp.sum(jnp.abs(residuals(l_new))) > rsum
        accept = (~frozen) & (~converged) & (~worse)
        return (jnp.where(accept, l_new, l), frozen | converged | worse), None

    (L_out, _), _ = jax.lax.scan(step, (L, jnp.bool_(False)), None, length=_REFINE_ITERS)
    return jnp.where(valid, L_out, L)


def _inv3(M):
    """3x3 inverse via adjugate."""
    c = jnp.stack(
        [
            jnp.cross(M[:, 1], M[:, 2]),
            jnp.cross(M[:, 2], M[:, 0]),
            jnp.cross(M[:, 0], M[:, 1]),
        ],
        axis=0,
    )
    det = jnp.dot(M[:, 0], jnp.cross(M[:, 1], M[:, 2]))
    return c / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)


def _p4p_single(p2s, p3s, fx, fy, cx, cy):
    """Solve one P4P instance.

    p2s: (4, 2) pixel observations; p3s: (4, 3) world points. Returns
    (rvec(3), tvec(3), valid). Frame convention: p_cam = R p_world + t,
    matching the reference (points in frame active_idx-1 -> camera
    active_idx, geometry.cpp:17-18).
    """
    y = jnp.stack(
        [(p2s[:, 0] - cx) / fx, (p2s[:, 1] - cy) / fy, jnp.ones(4, p2s.dtype)], axis=-1
    )
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    y1, y2, y3 = y[0], y[1], y[2]
    x1, x2, x3 = p3s[0], p3s[1], p3s[2]

    b12 = -2.0 * jnp.dot(y1, y2)
    b13 = -2.0 * jnp.dot(y1, y3)
    b23 = -2.0 * jnp.dot(y2, y3)

    d12 = x1 - x2
    d13 = x1 - x3
    d23 = x2 - x3
    d12xd13 = jnp.cross(d12, d13)
    a12 = jnp.dot(d12, d12)
    a13 = jnp.dot(d13, d13)
    a23 = jnp.dot(d23, d23)

    c31 = -0.5 * b13
    c23 = -0.5 * b23
    c12 = -0.5 * b12
    blob = c12 * c23 * c31 - 1.0
    s31s = 1.0 - c31 * c31
    s23s = 1.0 - c23 * c23
    s12s = 1.0 - c12 * c12

    p3 = a13 * (a23 * s31s - a13 * s23s)
    p2 = 2.0 * blob * a23 * a13 + a13 * (2.0 * a12 + a13) * s23s + a23 * (a23 - a12) * s31s
    p1 = (
        a23 * (a13 - a23) * s12s
        - a12 * a12 * s23s
        - 2.0 * a12 * (blob * a23 + a13 * s23s)
    )
    p0 = a12 * (a12 * s23s - a23 * s12s)

    p3_inv = 1.0 / jnp.where(jnp.abs(p3) < 1e-30, 1e-30, p3)
    g = _cubick(p2 * p3_inv, p1 * p3_inv, p0 * p3_inv)

    A = jnp.array(
        [
            [a23 * (1.0 - g), (a23 * b12) * 0.5, (a23 * b13 * g) * (-0.5)],
            [(a23 * b12) * 0.5, a23 - a12 + a13 * g, b23 * (a13 * g - a12) * 0.5],
            [(a23 * b13 * g) * (-0.5), b23 * (a13 * g - a12) * 0.5, g * (a13 - a23) - a12],
        ]
    )
    V, L = _eig_with_known0(A)
    v = jnp.sqrt(jnp.maximum(-L[1] / jnp.where(jnp.abs(L[0]) < 1e-30, 1e-30, L[0]), 0.0))

    def lambda_candidates(s):
        denom = s * V[0, 1] - V[0, 0]
        w2 = 1.0 / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        w0 = (V[1, 0] - s * V[1, 1]) * w2
        w1 = (V[2, 0] - s * V[2, 1]) * w2
        den_a = (a13 - a12) * w1 * w1 - a12 * b13 * w1 - a12
        a = 1.0 / jnp.where(jnp.abs(den_a) < 1e-30, 1e-30, den_a)
        b = (a13 * b12 * w1 - a12 * b13 * w0 - 2.0 * w0 * w1 * (a12 - a13)) * a
        c = ((a13 - a12) * w0 * w0 + a13 * b12 * w0 + a13) * a
        tau1, tau2, has_real = _root2real(b, c)

        def from_tau(tau):
            d = a23 / (tau * (b23 + tau) + 1.0)
            ok = has_real & (tau > 0) & (d > 0)
            l2 = jnp.sqrt(jnp.maximum(d, 0.0))
            l3 = tau * l2
            l1 = w0 * l2 + w1 * l3
            ok = ok & (l1 >= 0)
            return jnp.stack([l1, l2, l3]), ok

        La, oka = from_tau(tau1)
        Lb, okb = from_tau(tau2)
        return (La, oka), (Lb, okb)

    (LA, okA), (LB, okB) = lambda_candidates(v)
    (LC, okC), (LD, okD) = lambda_candidates(-v)
    Ls = jnp.stack([LA, LB, LC, LD])  # (4, 3)
    oks = jnp.stack([okA, okB, okC, okD])

    Ls = jax.vmap(_gn_refine_lambdas, in_axes=(0, 0, None, None, None, None, None, None))(
        Ls, oks, a12, a13, a23, b12, b13, b23
    )

    X = jnp.stack([d12, d13, d12xd13], axis=1)  # columns
    Xinv = _inv3(X)

    def recover(Lrow):
        ry1 = y1 * Lrow[0]
        ry2 = y2 * Lrow[1]
        ry3 = y3 * Lrow[2]
        yd1 = ry1 - ry2
        yd2 = ry1 - ry3
        Y = jnp.stack([yd1, yd2, jnp.cross(yd1, yd2)], axis=1)
        R = Y @ Xinv
        t = ry1 - R @ x1
        return R, t

    Rs, ts = jax.vmap(recover)(Ls)  # (4,3,3), (4,3)

    # P4P disambiguation by 4th-point reprojection (lambdatwist_p4p.h:30-43).
    x4 = p3s[3]
    p4 = jnp.einsum("kij,j->ki", Rs, x4) + ts
    z4 = jnp.where(jnp.abs(p4[:, 2]) < 1e-30, 1e-30, p4[:, 2])
    u4 = cx + fx * p4[:, 0] / z4
    v4 = cy + fy * p4[:, 1] / z4
    reproj = (u4 - p2s[3, 0]) ** 2 + (v4 - p2s[3, 1]) ** 2
    reproj = jnp.where(oks & jnp.isfinite(reproj), reproj, jnp.inf)
    best = jnp.argmin(reproj)

    R = Rs[best]
    t = ts[best]
    valid = jnp.any(oks) & jnp.isfinite(reproj[best])
    rvec = lie.so3_log(R)
    valid = valid & jnp.all(jnp.isfinite(rvec)) & jnp.all(jnp.isfinite(t))
    return rvec, t, valid


@partial(jax.jit, static_argnames=("n_poses",))
def solve_batch_p4p(
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
    """Sample `n_poses` random 4-correspondence subsets and solve each.

    p2s: (M, 2) pixels, p3s: (M, 3) points, valid: (M,) bool mask of usable
    correspondences (the reference compacts NaNs on the host,
    geometry.cpp:70-87; we sample through a compaction permutation instead).

    Returns (rvecs (n_poses, 3), tvecs (n_poses, 3), ok (n_poses,)).
    """
    M = p2s.shape[0]
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    # Stable argsort: valid entries first, preserving order.
    order = jnp.argsort(~valid)
    idx = jax.random.randint(key, (n_poses, 4), 0, n_valid)
    sel = order[idx]  # (n_poses, 4)
    p2_sets = p2s[sel]  # (n_poses, 4, 2)
    p3_sets = p3s[sel]
    rvecs, tvecs, ok = jax.vmap(_p4p_single, in_axes=(0, 0, None, None, None, None))(
        p2_sets, p3_sets, fx, fy, cx, cy
    )
    ok = ok & (jnp.sum(valid) >= 4)
    return rvecs, tvecs, ok
