"""Microbench: bilinear-gather formulations on the TPU.

profile_falign_breakdown shows the falign residual's bilinear samples
read ~130 GB/iteration — XLA lowers the (1,1)-slice gathers of
`img[y, x]` into something that touches the whole map per sample. This
tool times candidate formulations at the falign workload shape
(16 lanes x 2 dirs, stride-3 query grid, 192x640 padded maps, 5 planes)
to pick the replacement.
"""

from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

B = 32          # lane-dirs (16 pairs x 2 directions)
H, W = 192, 640
HS, WS = 62, 205  # stride-3 query grid of 185x613
C = 6             # packed planes: depth, normal xyz, image, weight


def _time(fn, args, reps=7):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def corners(x, y, h, w):
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    return x0, y0, jnp.minimum(x0 + 1, w - 1), jnp.minimum(y0 + 1, h - 1), fx, fy


@jax.jit
def v_current(maps, xq, yq):
    """Per-plane advanced indexing (what bilinear_sample does today)."""
    def one(m, x, y):
        x0, y0, x1, y1, fx, fy = corners(x, y, H, W)
        out = []
        for c in range(C):
            img = m[c]
            v00 = img[y0, x0]
            v01 = img[y0, x1]
            v10 = img[y1, x0]
            v11 = img[y1, x1]
            top = v00 * (1 - fx) + v01 * fx
            bot = v10 * (1 - fx) + v11 * fx
            out.append(top * (1 - fy) + bot * fy)
        return jnp.stack(out)

    return jax.vmap(one)(maps, xq, yq)


@jax.jit
def v_flat_take(maps, xq, yq):
    """Flattened 1-D take per corner, planes packed on the last axis."""
    def one(m, x, y):
        x0, y0, x1, y1, fx, fy = corners(x, y, H, W)
        mc = m.reshape(C, H * W).T  # (H*W, C)

        def g(yy, xx):
            return jnp.take(mc, yy * W + xx, axis=0)  # (HS, WS, C)

        top = g(y0, x0) * (1 - fx)[..., None] + g(y0, x1) * fx[..., None]
        bot = g(y1, x0) * (1 - fx)[..., None] + g(y1, x1) * fx[..., None]
        return jnp.moveaxis(top * (1 - fy)[..., None] + bot * fy[..., None], -1, 0)

    return jax.vmap(one)(maps, xq, yq)


@jax.jit
def v_rowgather_tala(maps, xq, yq):
    """Gather full rows (slice (1, W) — sublane-friendly), then lane gather
    within rows via take_along_axis."""
    def one(m, x, y):
        x0, y0, x1, y1, fx, fy = corners(x, y, H, W)

        def g(yy, xx):
            rows = m[:, yy.reshape(-1), :]          # (C, HS*WS, W)
            v = jnp.take_along_axis(
                rows, xx.reshape(1, -1, 1), axis=2
            )[..., 0]                                # (C, HS*WS)
            return v.reshape(C, HS, WS)

        top = g(y0, x0) * (1 - fx) + g(y0, x1) * fx
        bot = g(y1, x0) * (1 - fx) + g(y1, x1) * fx
        return top * (1 - fy) + bot * fy

    return jax.vmap(one)(maps, xq, yq)


@jax.jit
def v_onehot_mxu(maps, xq, yq):
    """Two-stage one-hot contraction on the MXU (bf16): rows first
    (HS*WS, H) @ (H, W*C), then per-query lane weights fold x0/x1."""
    def one(m, x, y):
        x0, y0, x1, y1, fx, fy = corners(x, y, H, W)
        q = HS * WS
        # row interpolation weights: (q, H) with weights (1-fy)@y0, fy@y1
        oh_y = (
            jax.nn.one_hot(y0.reshape(-1), H, dtype=jnp.float32)
            * (1 - fy).reshape(-1, 1)
            + jax.nn.one_hot(y1.reshape(-1), H, dtype=jnp.float32)
            * fy.reshape(-1, 1)
        )
        flat = m.transpose(1, 0, 2).reshape(H, C * W)
        rows = jax.lax.dot(
            oh_y.astype(jnp.bfloat16), flat.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).reshape(q, C, W)
        oh_x = (
            jax.nn.one_hot(x0.reshape(-1), W, dtype=jnp.float32)
            * (1 - fx).reshape(-1, 1)
            + jax.nn.one_hot(x1.reshape(-1), W, dtype=jnp.float32)
            * fx.reshape(-1, 1)
        )
        v = jnp.einsum(
            "qcw,qw->qc", rows.astype(jnp.bfloat16), oh_x.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return v.T.reshape(C, HS, WS)

    return jax.vmap(one)(maps, xq, yq)


@jax.jit
def v_slice22(maps, xq, yq):
    """ONE lax.gather per lane with (2, 2, C) slices: all four corners of
    a query arrive in a single gathered slice. Start indices are clamped
    to [0, dim-2] so fx/fy stay exact at borders (x clamped to W-1 gives
    x0 = W-2, fx = 1)."""

    def one(m, x, y):
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
        x0 = jnp.minimum(jnp.floor(x), W - 2.0)
        y0 = jnp.minimum(jnp.floor(y), H - 2.0)
        fx, fy = x - x0, y - y0
        starts = jnp.stack(
            [y0.reshape(-1), x0.reshape(-1)], axis=-1
        ).astype(jnp.int32)  # (Q, 2)
        op = m.transpose(1, 2, 0)  # (H, W, C)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        )
        sl = jax.lax.gather(
            op, starts, dnums, slice_sizes=(2, 2, C),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (Q, 2, 2, C)
        fx = fx.reshape(-1, 1)
        fy = fy.reshape(-1, 1)
        top = sl[:, 0, 0] * (1 - fx) + sl[:, 0, 1] * fx
        bot = sl[:, 1, 0] * (1 - fx) + sl[:, 1, 1] * fx
        v = top * (1 - fy) + bot * fy  # (Q, C)
        return v.T.reshape(C, HS, WS)

    return jax.vmap(one)(maps, xq, yq)


def main():
    rng = np.random.default_rng(0)
    maps = jnp.asarray(rng.normal(size=(B, C, H, W)).astype(np.float32))
    # smooth warp: ref grid + moderate displacement
    ys, xs = np.mgrid[0:185:3, 0:613:3].astype(np.float32)
    xq = np.tile(xs, (B, 1, 1)) + rng.normal(0, 8, (B, HS, WS)).astype(np.float32)
    yq = np.tile(ys, (B, 1, 1)) + rng.normal(0, 8, (B, HS, WS)).astype(np.float32)
    xq = jnp.asarray(xq)
    yq = jnp.asarray(yq)

    ref = np.asarray(v_current(maps, xq, yq))
    rows = {}
    for name, fn in [
        ("current", v_current),
        ("flat_take", v_flat_take),
        ("rowgather_tala", v_rowgather_tala),
        ("onehot_mxu", v_onehot_mxu),
        ("slice22", v_slice22),
    ]:
        try:
            got = np.asarray(fn(maps, xq, yq))
            err = float(np.max(np.abs(got - ref)))
            s = _time(fn, (maps, xq, yq))
            rows[name] = {"s": round(s, 5), "max_err": err}
        except Exception as e:  # noqa: BLE001
            rows[name] = {"error": repr(e)[:200]}
        print(name, rows[name], flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
