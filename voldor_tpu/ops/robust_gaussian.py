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


def _chol_inverse(covar: jax.Array):
    """(inverse, ok) of an SPD matrix via Cholesky; ok=False on failure."""
    L = jnp.linalg.cholesky(covar)
    ok = jnp.all(jnp.isfinite(L))
    Lsafe = jnp.where(ok, L, jnp.eye(covar.shape[-1], dtype=covar.dtype))
    eye = jnp.eye(covar.shape[-1], dtype=covar.dtype)
    inv = jax.scipy.linalg.cho_solve((Lsafe, True), eye)
    return inv, ok


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
    space = jnp.where(valid[:, None] > 0, space, 0.0)
    lam = jnp.asarray(covar_reg_lambda, space.dtype)

    def body(st):
        (it, mean, covar, out_mean, out_covar, out_density, prev_wsum, _, _) = st

        covar_r = jnp.where((it > 0) & (lam > 0), _lw_shrink(covar, lam), covar)
        inv, ok = _chol_inverse(covar_r)

        diff = space - mean[None, :]
        z2 = jnp.sum((diff @ inv) * diff, axis=-1)
        w = ((z2 < trunc_sigma * trunc_sigma) & (valid > 0)).astype(space.dtype)
        wsum = jnp.sum(w)
        fail = (~ok) | (~jnp.isfinite(wsum))
        converged = (jnp.abs(wsum - prev_wsum) / n_valid < epsilon) & (~fail)

        # M-step (committed only when the loop keeps going).
        wsum_safe = jnp.maximum(wsum, 1.0)
        new_mean = (w @ space) / wsum_safe
        diff_new = space - new_mean[None, :]
        new_covar = ((diff_new * w[:, None]).T @ diff_new) / wsum_safe

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
