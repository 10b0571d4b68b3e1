"""The empirical log-logistic (Fisk) flow-residual model.

VOLDOR's core probabilistic model (CVPR 2020): the magnitude of the residual
between observed optical flow and rigid-motion-induced flow follows a Fisk
distribution whose shape/scale depend on the observed flow magnitude. The
"rigidness" of a pixel is the posterior probability that its residual came
from the Fisk inlier density rather than a uniform-ish outlier level set at
the density value of ``lambda * |observed flow|``.

Function-for-function parity with gpu-kernels/residual_model.h:4-69 (model
constants were calibrated upstream on KITTI + PWC-Net flows at resize 0.5).
All functions broadcast elementwise and are jit/vmap safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Calibration constants (residual_model.h:6-12).
EST_RF = 0.5
FISK_A1 = 0.01
FISK_A2 = 0.09
FISK_B1 = 1.0
FISK_B2 = -0.0022
MIN_OBS_FMAG = 2.0
MAX_OBS_FMAG = 100.0

# FLT_EPSILON (gpu-kernels/utils.h:19). NOTE: plain Python float, not a
# materialized jnp scalar — a pre-materialized device array captured as a
# jit constant costs a ~30ms host sync per call on the axon TPU platform.
_ZDE = 1.1920929e-07


def _clamp_fmag(fmag: jax.Array) -> jax.Array:
    return jnp.clip(fmag * EST_RF, MIN_OBS_FMAG, MAX_OBS_FMAG)


def fmag_c(fmag: jax.Array) -> jax.Array:
    """Fisk shape parameter as a function of observed flow magnitude
    (residual_model.h:15-18)."""
    return FISK_B1 + FISK_B2 * _clamp_fmag(fmag)


def fmag_scale(fmag: jax.Array) -> jax.Array:
    """Fisk scale parameter (residual_model.h:21-24)."""
    return FISK_A1 * jnp.exp(FISK_A2 * _clamp_fmag(fmag))


def fisk_pdf(x: jax.Array, c: jax.Array, scale: jax.Array) -> jax.Array:
    """Fisk density used by the reference (residual_model.h:28-31).

    Note the reference evaluates the density at u = x^2/scale:
    pdf = c * u^(-c-1) * (1 + u^(-c))^(-2) / scale, with x pre-scaled by
    EST_RF and floored at FLT_EPSILON.
    """
    x = jnp.maximum(x * EST_RF, _ZDE)
    u = (x * x) / scale
    u_negc = u ** (-c)
    return (c * u_negc * (1.0 / u) * (1.0 + u_negc) ** (-2.0)) / scale


def rigidness_xy(dx1, dy1, dx2, dy2, lam, abs_rf) -> jax.Array:
    """Per-pixel inlier probability from flow components
    (residual_model.h:34-42).

    (dx1, dy1): rigid flow; (dx2, dy2): observed flow — as separate arrays.
    TPU note: keeping x/y components in separate (..., h, w) arrays (instead
    of a channel-last (..., 2) axis) keeps the minor dimension wide so the
    VPU's 128 lanes stay filled; the stacked variant measured ~60x slower.
    """
    obs_fmag = jnp.sqrt(dx2 * dx2 + dy2 * dy2) / abs_rf
    ddx = dx1 - dx2
    ddy = dy1 - dy2
    diff_fmag = jnp.sqrt(ddx * ddx + ddy * ddy) / abs_rf
    c = fmag_c(obs_fmag)
    s = fmag_scale(obs_fmag)
    p_in = fisk_pdf(diff_fmag, c, s)
    p_out = fisk_pdf(lam * obs_fmag, c, s)
    return p_in / (p_in + p_out)


def rigidness(
    rigid_flow: jax.Array,
    obs_flow: jax.Array,
    lam: jax.Array,
    abs_rf: jax.Array,
) -> jax.Array:
    """Vector-shaped convenience wrapper over rigidness_xy.

    rigid_flow, obs_flow: (..., 2) flow vectors. Prefer rigidness_xy in hot
    paths (see its TPU layout note).
    """
    return rigidness_xy(
        rigid_flow[..., 0],
        rigid_flow[..., 1],
        obs_flow[..., 0],
        obs_flow[..., 1],
        lam,
        abs_rf,
    )


def nll_cost(
    rigid_flow: jax.Array,
    obs_flow: jax.Array,
    weight: jax.Array,
    lam: jax.Array,
    abs_rf: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """(-weight*log(rigidness), weight) pair (residual_model.h:45-49)."""
    r = rigidness(rigid_flow, obs_flow, lam, abs_rf)
    return -weight * jnp.log(jnp.maximum(r, _ZDE)), weight


def depth_rigidness(
    d1: jax.Array,
    d2: jax.Array,
    basefocal: jax.Array,
    omega: jax.Array,
    abs_rf: jax.Array,
) -> jax.Array:
    """Inlier probability of depth d1 against prior depth d2 in disparity
    space (residual_model.h:51-61)."""
    disp1 = (basefocal / d1) / abs_rf
    disp2 = (basefocal / d2) / abs_rf
    diff = jnp.abs(disp1 - disp2)
    c = fmag_c(disp2)
    s = fmag_scale(disp2)
    p_in = fisk_pdf(diff, c, s)
    p_out = fisk_pdf(omega * disp2, c, s)
    return p_in / (p_in + p_out)


def depth_nll_cost(
    d1: jax.Array,
    d2: jax.Array,
    basefocal: jax.Array,
    weight: jax.Array,
    omega: jax.Array,
    abs_rf: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """(-weight*log(depth_rigidness), weight) pair (residual_model.h:64-68)."""
    r = depth_rigidness(d1, d2, basefocal, omega, abs_rf)
    return -weight * jnp.log(jnp.maximum(r, _ZDE)), weight
