"""Truncated-Gaussian EM fit of the pose pool (mean + covariance).

After meanshift finds the pose mode, VOLDOR refines it into a mean and a
6x6 covariance with a hard-truncation EM: inliers are samples with
Mahalanobis z-score < trunc_sigma; the M-step re-estimates mean/covariance
from inliers with Ledoit-Wolf shrinkage (gpu-kernels/fit_robust_gaussian.cu:
101-286 + aux_funs.cpp:101-141).

The reference must do the 6x6 determinant/inverse in float64 on the host
because raw pose covariances are tiny (fit_robust_gaussian.cu:174). Instead
of paying f64 on TPU, we rely on the same conditioning trick the caller
already applies — the pool is pre-scaled by rg_pose_scaling=100 and rvecs by
meanshift_rvec_scale=25 (voldor/geometry.cpp:191-210) — and solve the
well-scaled 6x6 system with an f32 Cholesky factorization. Cholesky failure
(NaN in the factor) plays the role of the reference's det<=0 reliability
gate.

The whole EM runs as one jitted lax.while_loop; E-step reductions are (P,D)
matmuls (MXU-friendly).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class RobustGaussianResult(NamedTuple):
    mean: jax.Array  # (D,)
    covar: jax.Array  # (D, D)
    density: jax.Array  # inlier fraction of the valid pool
    iters: jax.Array  # int32
    reliable: jax.Array  # bool


def _lw_shrink(covar: jax.Array, lam) -> jax.Array:
    """Ledoit-Wolf shrinkage with fixed lambda (aux_funs.cpp:123-141):
    S* = lam * (tr(S)/d) * I + (1 - lam) * S."""
    d = covar.shape[-1]
    m = jnp.trace(covar) / d
    return lam * m * jnp.eye(d, dtype=covar.dtype) + (1.0 - lam) * covar


def _adj3(M):
    """Adjugate (transposed cofactor matrix) of a 3x3."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    return jnp.stack(
        [
            jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], -1),
            jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], -1),
            jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], -1),
        ],
        -2,
    )


def _det3(M):
    return (
        M[..., 0, 0] * (M[..., 1, 1] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 1])
        - M[..., 0, 1] * (M[..., 1, 0] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 0])
        + M[..., 0, 2] * (M[..., 1, 0] * M[..., 2, 1] - M[..., 1, 1] * M[..., 2, 0])
    )


def _inv3(M):
    det = _det3(M)
    safe = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    return _adj3(M) / safe[..., None, None], det


def _chol_inverse(covar: jax.Array):
    """(inverse, ok) of a 6x6 SPD matrix, closed form.

    Blockwise Schur inversion built from 3x3 adjugates: tiny LAPACK-style
    factorizations (cholesky / triangular solves) cost ~1ms each on TPU and
    dominated the whole pose step; this is pure unrolled elementwise math.
    The reliability gate matches the reference's det > 0 check
    (fit_robust_gaussian.cu:196-199): det6 = det(A) * det(D - C A^-1 B).
    """
    A = covar[..., :3, :3]
    B = covar[..., :3, 3:]
    C = covar[..., 3:, :3]
    D = covar[..., 3:, 3:]
    Ainv, detA = _inv3(A)
    S = D - C @ Ainv @ B  # Schur complement
    Sinv, detS = _inv3(S)
    AB = Ainv @ B
    CA = C @ Ainv
    top = jnp.concatenate([Ainv + AB @ Sinv @ CA, -AB @ Sinv], axis=-1)
    bot = jnp.concatenate([-Sinv @ CA, Sinv], axis=-1)
    inv = jnp.concatenate([top, bot], axis=-2)
    ok = (detA > 0) & (detS > 0) & jnp.all(jnp.isfinite(inv))
    return jnp.where(ok, inv, jnp.eye(6, dtype=covar.dtype)), ok


@partial(jax.jit, static_argnames=("max_iters",))
def fit_robust_gaussian(
    space: jax.Array,
    valid: jax.Array,
    mean0: jax.Array,
    covar0: jax.Array,
    trunc_sigma: float = 3.0,
    covar_reg_lambda: float = 0.001,
    epsilon: float = 1e-5,
    max_iters: int = 100,
) -> RobustGaussianResult:
    """EM fit over a (P, D) pool with a (P,) validity mask.

    Loop/exit structure mirrors fit_robust_gaussian.cu:164-263:
      * shrinkage is applied from iteration 1 on,
      * the convergence check (inlier-density change < epsilon) fires
        *before* committing the new M-step, so on convergence the returned
        mean is the one the inlier set was computed against and the returned
        covariance is the *regularized* current one,
      * a failed factorization or non-finite weight sum exits unreliable,
      * hitting max_iters returns the last committed M-step estimates.
    """
    P, D = space.shape
    valid = valid.astype(space.dtype)
    n_valid = jnp.maximum(jnp.sum(valid), 1.0)
    # (D, P) layout: samples along the minor axis keep the VPU lanes full
    # (see the layout note in meanshift.py).
    space_t = jnp.where(valid[None, :] > 0, space.T, 0.0)
    lam = jnp.asarray(covar_reg_lambda, space.dtype)

    def body(st):
        (it, mean, covar, out_mean, out_covar, out_density, prev_wsum, _, _) = st

        covar_r = jnp.where((it > 0) & (lam > 0), _lw_shrink(covar, lam), covar)
        inv, ok = _chol_inverse(covar_r)

        diff_t = space_t - mean[:, None]  # (D, P)
        z2 = jnp.sum((inv @ diff_t) * diff_t, axis=0)  # (P,)
        w = ((z2 < trunc_sigma * trunc_sigma) & (valid > 0)).astype(space.dtype)
        wsum = jnp.sum(w)
        fail = (~ok) | (~jnp.isfinite(wsum))
        converged = (jnp.abs(wsum - prev_wsum) / n_valid < epsilon) & (~fail)

        # M-step (committed only when the loop keeps going).
        wsum_safe = jnp.maximum(wsum, 1.0)
        new_mean = (space_t @ w) / wsum_safe
        diff_new = space_t - new_mean[:, None]
        new_covar = ((diff_new * w[None, :]) @ diff_new.T) / wsum_safe

        good = ~fail
        return (
            it + 1,
            jnp.where(good, new_mean, mean),
            jnp.where(good, new_covar, covar),
            # Outputs: on convergence freeze current (mean, regularized covar);
            # otherwise track the committed M-step (max_iters exit path).
            jnp.where(fail, out_mean, jnp.where(converged, mean, new_mean)),
            jnp.where(fail, out_covar, jnp.where(converged, covar_r, new_covar)),
            jnp.where(fail, out_density, wsum / n_valid),
            jnp.where(good, wsum, prev_wsum),
            fail | converged,  # done
            ~fail,  # reliable
        )

    def cond(st):
        it, done = st[0], st[7]
        return (it < max_iters) & (~done)

    init = (
        jnp.int32(0),
        mean0.astype(space.dtype),
        covar0.astype(space.dtype),
        mean0.astype(space.dtype),
        covar0.astype(space.dtype),
        jnp.float32(0.0),
        jnp.float32(0.0),
        jnp.bool_(False),
        jnp.bool_(True),
    )
    it, _, _, out_mean, out_covar, out_density, _, _, reliable = jax.lax.while_loop(
        cond, body, init
    )
    return RobustGaussianResult(
        mean=out_mean, covar=out_covar, density=out_density, iters=it, reliable=reliable
    )
