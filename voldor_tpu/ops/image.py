"""Image sampling and filtering primitives.

`bilinear_sample` reproduces the CUDA texture-fetch semantics the reference
relies on everywhere (`GMat::at_tex`, gpu-kernels/gmat.h:175-179): linear
filtering with texel centers at integer coordinates (the +0.5 offset in the
reference cancels CUDA's half-texel convention) and clamp-to-edge
addressing. Getting this exactly right matters — off-by-half errors silently
degrade accuracy (SURVEY.md "texture-filter parity").

The reference additionally suffers ~9-bit fixed-point interpolation weights
from the texture unit; we compute exact fp32 weights (strictly better).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinearly sample `img` at continuous pixel coordinates.

    img: (h, w) or (h, w, c); x, y: any matching shape S (pixel-index space,
    pixel centers at integers). Returns (S,) or (S, c). Coordinates are
    clamped to the valid range (clamp-to-edge addressing).
    """
    h, w = img.shape[0], img.shape[1]
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    if img.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]

    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def bilinear_sample_packed(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear sample of a channel-packed (h, w, c) map — ONE lax.gather.

    Semantically identical to `bilinear_sample` on each channel (clamp-to-
    edge, texel centers at integers), but fetches all four corners of all c
    channels in a single gather of (2, 2, c) slices. XLA lowers the per-
    corner advanced-indexing form of `bilinear_sample` into four whole-map
    sweeps per channel on TPU (~130 GB/iteration at the falign workload,
    docs/PERF_FALIGN_BREAKDOWN.json); the slice form measured 4.0x faster
    (tools/microbench_gather.py: 40.5 ms vs 161 ms at 32 lanes).

    Start indices are clamped to [0, dim-2] so the interpolation weights
    stay exact at the borders (x clamped to w-1 gives x0 = w-2, fx = 1 —
    the same value the clamped corner pair produces).

    img: (h, w, c); x, y: shape S. Returns (S..., c).
    """
    h, w, c = img.shape
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.minimum(jnp.floor(x), w - 2.0)
    y0 = jnp.minimum(jnp.floor(y), h - 2.0)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    starts = jnp.stack(
        [y0.reshape(-1), x0.reshape(-1)], axis=-1
    ).astype(jnp.int32)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    sl = jax.lax.gather(
        img, starts, dnums, slice_sizes=(2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(x.shape + (2, 2, c))
    top = sl[..., 0, 0, :] * (1.0 - fx) + sl[..., 0, 1, :] * fx
    bot = sl[..., 1, 0, :] * (1.0 - fx) + sl[..., 1, 1, :] * fx
    return top * (1.0 - fy) + bot * fy


def bilinear_sample_packed_grad(img: jax.Array, x: jax.Array, y: jax.Array):
    """bilinear_sample_packed plus its screen-space derivatives.

    Returns (value, d/dx, d/dy), each (S..., c), from the SAME single
    (2, 2, c)-slice gather — the corner taps determine both the lerp and
    its piecewise-constant derivative. Matches autodiff of
    bilinear_sample_packed exactly: the clip on the query coordinates
    zeroes the derivative outside [0, dim-1] (jnp.clip gradient
    semantics), and the floor contributes nothing.
    """
    h, w, c = img.shape
    in_x = ((x >= 0.0) & (x <= w - 1.0)).astype(img.dtype)[..., None]
    in_y = ((y >= 0.0) & (y <= h - 1.0)).astype(img.dtype)[..., None]
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.minimum(jnp.floor(x), w - 2.0)
    y0 = jnp.minimum(jnp.floor(y), h - 2.0)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    starts = jnp.stack(
        [y0.reshape(-1), x0.reshape(-1)], axis=-1
    ).astype(jnp.int32)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    sl = jax.lax.gather(
        img, starts, dnums, slice_sizes=(2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(x.shape + (2, 2, c))
    top = sl[..., 0, 0, :] * (1.0 - fx) + sl[..., 0, 1, :] * fx
    bot = sl[..., 1, 0, :] * (1.0 - fx) + sl[..., 1, 1, :] * fx
    val = top * (1.0 - fy) + bot * fy
    ddx = ((sl[..., 0, 1, :] - sl[..., 0, 0, :]) * (1.0 - fy)
           + (sl[..., 1, 1, :] - sl[..., 1, 0, :]) * fy) * in_x
    ddy = (bot - top) * in_y
    return val, ddx, ddy


def nearest_sample(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Clamped nearest-neighbour fetch (GMat::at_safe, gmat.h:181-186)."""
    h, w = img.shape[0], img.shape[1]
    xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
    return img[yi, xi]


def cv2_gaussian_kernel(ksize: int, sigma: float = 0.0, dtype=jnp.float32) -> jax.Array:
    """1-D Gaussian kernel bit-matching cv2.getGaussianKernel.

    For sigma <= 0 OpenCV derives sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8.
    (The SLAM layer blurs depths/images with cv2.GaussianBlur before frame
    alignment, slam_py/voldor_slam.py:548,557,613,621 — this keeps those
    blurs device-side with identical numerics.)
    """
    # OpenCV special-cases tiny kernels with fixed binomial-ish taps.
    _SMALL_TAB = {
        1: [1.0],
        3: [0.25, 0.5, 0.25],
        5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
        7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
    }
    if sigma <= 0 and ksize in _SMALL_TAB:
        return jnp.asarray(_SMALL_TAB[ksize], dtype)
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1.0) + 0.8
    i = jnp.arange(ksize, dtype=jnp.float32) - (ksize - 1) * 0.5
    k = jnp.exp(-(i * i) / (2.0 * sigma * sigma))
    return (k / jnp.sum(k)).astype(dtype)


def gaussian_blur(img: jax.Array, ksize: int, sigma: float = 0.0) -> jax.Array:
    """Separable Gaussian blur of a (h, w) image.

    Border handling matches cv2's default BORDER_REFLECT_101
    (= jnp.pad mode='reflect').
    """
    if ksize <= 1:
        return img
    k = cv2_gaussian_kernel(ksize, sigma, img.dtype)
    r = ksize // 2
    padded = jnp.pad(img, ((r, r), (0, 0)), mode="reflect")
    # Convolve along rows (axis 0) then columns (axis 1).
    img = _conv1d(padded, k, axis=0)
    padded = jnp.pad(img, ((0, 0), (r, r)), mode="reflect")
    return _conv1d(padded, k, axis=1)


def _conv1d(padded: jax.Array, k: jax.Array, axis: int) -> jax.Array:
    n = padded.shape[axis] - (k.shape[0] - 1)
    out = jnp.zeros(
        padded.shape[:axis] + (n,) + padded.shape[axis + 1 :], dtype=padded.dtype
    )
    for i in range(k.shape[0]):
        out = out + k[i] * jax.lax.slice_in_dim(padded, i, i + n, axis=axis)
    return out


def sobel_like_gradient(img3: jax.Array) -> jax.Array:
    """Weighted central-difference gradient over a (N, h, w) stack.

    Matches init_normal_ddepth / init_dimage (align_frame.cu:175-202): the
    x-gradient is 0.3*(r-l) on the center row + 0.1*(r-l) on the rows above
    and below (and transposed for y), with clamped borders. Returns
    (N, h, w, 2) [gx, gy].
    """
    def shift(a, dy, dx):
        # clamp-to-edge shift
        a = jnp.roll(a, (-dy, -dx), axis=(-2, -1))
        if dy == 1:
            a = a.at[..., -1, :].set(a[..., -2, :])
        elif dy == -1:
            a = a.at[..., 0, :].set(a[..., 1, :])
        if dx == 1:
            a = a.at[..., :, -1].set(a[..., :, -2])
        elif dx == -1:
            a = a.at[..., :, 0].set(a[..., :, 1])
        return a

    def clamped(a, dy, dx):
        h, w = a.shape[-2], a.shape[-1]
        ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
        xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
        return a[..., ys[:, None], xs[None, :]]

    gx = (
        0.3 * (clamped(img3, 0, 1) - clamped(img3, 0, -1))
        + 0.1 * (clamped(img3, -1, 1) - clamped(img3, -1, -1))
        + 0.1 * (clamped(img3, 1, 1) - clamped(img3, 1, -1))
    )
    gy = (
        0.3 * (clamped(img3, 1, 0) - clamped(img3, -1, 0))
        + 0.1 * (clamped(img3, 1, -1) - clamped(img3, -1, -1))
        + 0.1 * (clamped(img3, 1, 1) - clamped(img3, -1, 1))
    )
    return jnp.stack([gx, gy], axis=-1)
