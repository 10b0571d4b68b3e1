"""HMM forward-backward smoothing of rigidness maps.

The reference smooths each rigidness map with a 2-state HMM independently
along rows then columns (gpu-kernels/fb_smooth.h:17-109): a forward and a
backward message pass followed by a pointwise posterior, done twice (rows,
then columns). Each CUDA thread walks one line serially.

Two implementations:
  * fb_smooth (default): direct lax.scan of the recurrences — every carried
    value is a probability in [0, 1], so it is immune to the denormal
    slow-paths we measured on this platform, and the per-step work is wide
    enough (h*N lanes) that the serial depth costs nothing in practice.
  * fb_smooth_assoc: the per-line recurrence prev' = s1/(s0+s1) is a
    Moebius (linear-fractional) transform, and Moebius transforms compose
    by 2x2 matrix products — an associative operation — so every line
    position can be evaluated in O(log n) depth with
    jax.lax.associative_scan. Kept for hardware where log-depth wins;
    cumulative matrices are renormalized and underflow-flushed per combine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _mobius_combine(earlier, later):
    """Compose Moebius maps: apply `earlier` first, then `later` = later @ earlier.

    (This argument order is what lax.associative_scan feeds: accumulated
    prefix first, next element second.) Renormalized by the max |entry| —
    Moebius maps are scale-invariant, so this only fixes the dynamic range.
    """
    m = jnp.einsum("...ij,...jk->...ik", later, earlier)
    scale = jnp.max(jnp.abs(m), axis=(-2, -1), keepdims=True)
    m = m / jnp.maximum(scale, 1e-30)
    # Flush vanishing entries: the smaller eigencomponent of the cumulative
    # product decays geometrically; entries below 1e-12 would produce
    # denormal PRODUCTS inside the next combine's einsum, which execute
    # orders of magnitude slower on this platform.
    return jnp.where(jnp.abs(m) < 1e-12, 0.0, m)


def _apply_mobius(m, x):
    num = m[..., 0, 0] * x + m[..., 0, 1]
    den = m[..., 1, 0] * x + m[..., 1, 1]
    return num / jnp.where(jnp.abs(den) < 1e-30, 1e-30, den)


def _forward_coeffs(e1, e0, ncp):
    """Coefficient matrices of the forward recursion (fb_smooth.h:29-37).

    s0 = (prev*(1-ncp) + (1-prev)*ncp) * e0
    s1 = (prev*ncp + (1-prev)*(1-ncp)) * e1_i
    prev' = s1/(s0+s1)
    """
    a = e1 * (2.0 * ncp - 1.0)
    b = e1 * (1.0 - ncp)
    c = (e0 - e1) * (1.0 - 2.0 * ncp)
    d = e0 * ncp + e1 * (1.0 - ncp)
    return jnp.stack(
        [jnp.stack([a, b], axis=-1), jnp.stack([c, d], axis=-1)], axis=-2
    )


def _backward_coeffs(e1, e0, ncp):
    """Coefficient matrices of the backward recursion (fb_smooth.h:38-45).

    s0 = prev*e1_i*(1-ncp) + (1-prev)*ncp*e0
    s1 = prev*e1_i*ncp     + (1-prev)*(1-ncp)*e0
    prev' = s1/(s0+s1)
    """
    a = e1 * ncp - (1.0 - ncp) * e0
    b = jnp.broadcast_to((1.0 - ncp) * e0, a.shape)
    c = e1 - e0
    d = jnp.broadcast_to(e0, a.shape)
    return jnp.stack(
        [jnp.stack([a, b], axis=-1), jnp.stack([c, d], axis=-1)], axis=-2
    )


def _line_pass(s1_prob, e0, ncp, backward: bool):
    """One message pass along the last axis of s1_prob (any leading dims)."""
    if backward:
        s1_rev = jnp.flip(s1_prob, axis=-1)
        mats = _backward_coeffs(s1_rev, e0, ncp)
        init = s1_rev[..., 0]
    else:
        mats = _forward_coeffs(s1_prob, e0, ncp)
        init = s1_prob[..., 0]
    # Cumulative composition M_i o ... o M_0 along the line axis.
    # associative_scan expects the scanned axis first in the operand tree.
    mats = jnp.moveaxis(mats, -3, 0)  # (n, ..., 2, 2)
    cum = jax.lax.associative_scan(_mobius_combine, mats, axis=0)
    cum = jnp.moveaxis(cum, 0, -3)  # (..., n, 2, 2)
    msg = _apply_mobius(cum, init[..., None])
    if backward:
        msg = jnp.flip(msg, axis=-1)
    return msg


def _posterior(fwd, bwd):
    """Pointwise posterior combine (fb_smooth.h:65-69)."""
    s1 = fwd * bwd
    s0 = (1.0 - fwd) * (1.0 - bwd)
    return s1 / jnp.maximum(s0 + s1, 1e-30)


@partial(jax.jit, static_argnames=())
def fb_smooth_assoc(prob: jax.Array, s0_ems_prob: float, no_change_prob: float) -> jax.Array:
    """Associative-scan implementation of fb_smooth (O(log n) depth).

    Measured on the current platform the plain lax.scan version is equally
    fast and has zero denormal risk (every carried value is a probability),
    so fb_smooth defaults to that; this variant is kept for hardware where
    log-depth wins.
    """
    e0 = jnp.asarray(s0_ems_prob, prob.dtype)
    ncp = jnp.asarray(no_change_prob, prob.dtype)
    # Rows: lines along the last (w) axis.
    fwd = _line_pass(prob, e0, ncp, backward=False)
    bwd = _line_pass(prob, e0, ncp, backward=True)
    prob = _posterior(fwd, bwd)
    # Columns: transpose h<->w, same pass, transpose back.
    probT = jnp.swapaxes(prob, -1, -2)
    fwd = _line_pass(probT, e0, ncp, backward=False)
    bwd = _line_pass(probT, e0, ncp, backward=True)
    probT = _posterior(fwd, bwd)
    return jnp.swapaxes(probT, -1, -2)


def fb_smooth(prob, s0_ems_prob, no_change_prob):
    """Smooth a (..., h, w) stack of probability maps.

    Row pass (L2R + R2L messages -> posterior) then column pass, matching
    fb_smooth_batch_inplace (fb_smooth.h:73-109). Direct lax.scan
    transcription of the serial recurrences: every carried value stays a
    probability in [0, 1], so no denormals can arise (see fb_smooth_assoc
    for the log-depth alternative)."""
    e0 = jnp.asarray(s0_ems_prob, prob.dtype)
    ncp = jnp.asarray(no_change_prob, prob.dtype)

    def fwd_step(prev, e1):
        s0 = (prev * (1.0 - ncp) + (1.0 - prev) * ncp) * e0
        s1 = (prev * ncp + (1.0 - prev) * (1.0 - ncp)) * e1
        prev = s1 / (s0 + s1)
        return prev, prev

    def bwd_step(prev, e1):
        s0 = prev * e1 * (1.0 - ncp) + (1.0 - prev) * ncp * e0
        s1 = prev * e1 * ncp + (1.0 - prev) * (1.0 - ncp) * e0
        prev = s1 / (s0 + s1)
        return prev, prev

    def line(prob2d):  # (..., n) lines along last axis
        moved = jnp.moveaxis(prob2d, -1, 0)
        _, fwd = jax.lax.scan(fwd_step, moved[0], moved)
        rev = jnp.flip(moved, axis=0)
        _, bwd = jax.lax.scan(bwd_step, rev[0], rev)
        bwd = jnp.flip(bwd, axis=0)
        post = _posterior(fwd, bwd)
        return jnp.moveaxis(post, 0, -1)

    prob = line(prob)
    prob = jnp.swapaxes(line(jnp.swapaxes(prob, -1, -2)), -1, -2)
    return prob


# Backwards-compatible alias used by parity tests.
fb_smooth_scan_reference = fb_smooth
