"""Gaussian-kernel meanshift mode seeking.

VOLDOR fuses its 8192 P3P pose hypotheses by seeking the densest mode of the
pose pool with a flat-iteration meanshift (gpu-kernels/meanshift.cu:34-150).
The reference loops kernel launches from the host with per-iteration
host<->device mean transfers; here the whole search — init trials included —
is one jitted `lax.while_loop`.

TPU layout note: the pool is processed as (D, P) — samples along the minor
axis — so the per-iteration weight/reduction math fills all 128 VPU lanes.
The natural (P, D=6) layout left 6/128 lanes active and made each meanshift
iteration ~30x slower (measured via the profiler).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class MeanshiftResult(NamedTuple):
    mean: jax.Array  # (D,)
    confidence: jax.Array  # scalar: sum of kernel weights / n_valid
    iters: jax.Array  # int32
    n_valid: jax.Array  # int32


def _weights_t(space_t, valid, mean, kernel_var):
    """space_t: (D, P); mean: (D,). Returns (P,) kernel weights."""
    d2 = jnp.sum((space_t - mean[:, None]) ** 2, axis=0)
    return jnp.exp(-d2 / (2.0 * kernel_var)) * valid


@partial(jax.jit, static_argnames=("max_iters", "max_init_trials"))
def meanshift(
    space: jax.Array,
    valid: jax.Array,
    kernel_var: float,
    init_mean: jax.Array,
    use_external_init_mean: jax.Array,
    key: jax.Array,
    epsilon: float = 1e-5,
    max_iters: int = 100,
    max_init_trials: int = 20,
    good_init_confidence: float = 0.5,
) -> MeanshiftResult:
    """Mode-seek over a (P, D) sample pool.

    space: (P, D) float32; valid: (P,) {0,1} float mask;
    init_mean: (D,) external warm start (used when use_external_init_mean,
    matching the successive-pose warm start, meanshift.cu:69-70);
    key: PRNG key for the init trials.
    """
    P, D = space.shape
    valid = valid.astype(space.dtype)
    n_valid = jnp.maximum(jnp.sum(valid), 1.0)
    space_t = jnp.where(valid[None, :] > 0, space.T, 0.0)  # (D, P), NaNs scrubbed

    # --- init: best-of-k random trial by summed kernel weight
    # (meanshift.cu:71-97), early-stopped once confidence is good enough.
    def trial_cond(st):
        t, best_conf, _, _ = st
        return (t < max_init_trials) & (best_conf <= good_init_confidence * n_valid)

    def trial_body(st):
        t, best_conf, best_mean, k = st
        k, sub = jax.random.split(k)
        idx = jax.random.choice(sub, P, p=valid / jnp.sum(valid))
        cand = space_t[:, idx]
        conf = jnp.sum(_weights_t(space_t, valid, cand, kernel_var))
        better = conf > best_conf
        return (
            t + 1,
            jnp.where(better, conf, best_conf),
            jnp.where(better, cand, best_mean),
            k,
        )

    _, _, trial_mean, _ = jax.lax.while_loop(
        trial_cond, trial_body, (jnp.int32(0), jnp.float32(-1.0), space_t[:, 0], key)
    )

    mean0 = jnp.where(use_external_init_mean, init_mean, trial_mean)

    # --- iterate weighted means until displacement < epsilon
    # (meanshift.cu:103-134).
    def iter_cond(st):
        it, _, _, disp = st
        return (it < max_iters) & (disp >= epsilon)

    def iter_body(st):
        it, mean, _, _ = st
        w = _weights_t(space_t, valid, mean, kernel_var)
        wsum = jnp.maximum(jnp.sum(w), 1e-30)
        new_mean = (space_t @ w) / wsum
        disp = jnp.linalg.norm(mean - new_mean)
        return it + 1, new_mean, wsum / n_valid, disp

    iters, mean, conf, _ = jax.lax.while_loop(
        iter_cond, iter_body, (jnp.int32(0), mean0, jnp.float32(0.0), jnp.float32(jnp.inf))
    )
    return MeanshiftResult(
        mean=mean, confidence=conf, iters=iters, n_valid=jnp.sum(valid).astype(jnp.int32)
    )
