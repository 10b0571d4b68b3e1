"""KITTI ground-plane estimation (legacy capability).

Port of estimate_kitti_ground_plane (voldor/geometry.cpp:336-433 +
gpu-kernels meanshift over (height, normal) params). The reference flags it
"not used anymore" (config.h:78) but keeps it for paper parity; same here.

Per ROI pixel: local PCA over the backprojected (2*holo_width+1)^2
neighbourhood gives a plane normal (smallest eigenvector), flipped to point
at the viewer; the plane height is |n . X|. Heights are normalized by their
median, then a 4-D meanshift over (h, n1, n2, n3) finds the dominant ground
hypothesis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from voldor_tpu.ops.meanshift import meanshift


class KittiGround(NamedTuple):
    height: float
    normal: np.ndarray  # (3,)
    confidence: float
    used_iters: int


def estimate_kitti_ground(
    depth,
    K,
    roi_frac: float = 0.4,
    holo_width: int = 4,
    ms_kernel_var: float = 0.01,
    seed: int = 233,
) -> KittiGround:
    """depth: (h, w); K: (3, 3). ROI = bottom-center fraction
    (voldor.cpp:320-331)."""
    depth = jnp.asarray(depth)
    K = np.asarray(K)
    h, w = depth.shape
    x0 = int(w * 0.5 * (1 - roi_frac))
    y0 = int(h * (1 - roi_frac))
    rw = int(w * roi_frac)
    rh = int(h * roi_frac)

    ys, xs = jnp.mgrid[0:h, 0:w]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    X = jnp.stack(
        [
            ((xs - cx) / fx) * depth,
            ((ys - cy) / fy) * depth,
            depth,
        ],
        axis=-1,
    )  # (h, w, 3)

    # Local PCA via box-filter moments over the (2k+1)^2 window.
    k = holo_width

    def box(a):
        # cumulative-sum box filter with clamped borders (counts vary at edges)
        pad = jnp.pad(a, ((k, k), (k, k), (0, 0)) if a.ndim == 3 else ((k, k), (k, k)))
        c = jnp.cumsum(jnp.cumsum(pad, axis=0), axis=1)
        c = jnp.pad(c, ((1, 0), (1, 0), (0, 0)) if a.ndim == 3 else ((1, 0), (1, 0)))
        size = 2 * k + 1
        return (
            c[size:, size:] - c[:-size, size:] - c[size:, :-size] + c[:-size, :-size]
        )

    ones = jnp.ones((h, w))
    cnt = box(ones)
    mean = box(X) / cnt[..., None]
    # covariance from box-filtered moments: E[x x^T] - mu mu^T
    second = box((X[:, :, :, None] * X[:, :, None, :]).reshape(h, w, 9)).reshape(
        h, w, 3, 3
    ) / cnt[..., None, None]
    cov = second - mean[..., :, None] * mean[..., None, :]

    # smallest eigenvector of each 3x3 covariance (batched symmetric eigh)
    roi_cov = cov[y0 : y0 + rh, x0 : x0 + rw].reshape(-1, 3, 3)
    roi_X = X[y0 : y0 + rh, x0 : x0 + rw].reshape(-1, 3)
    evals, evecs = jnp.linalg.eigh(roi_cov)
    n_vec = evecs[:, :, 0]  # smallest eigenvalue's vector
    n_vec = n_vec / jnp.maximum(jnp.linalg.norm(n_vec, axis=-1, keepdims=True), 1e-12)
    height = jnp.sum(n_vec * roi_X, axis=-1)
    # make normals point at the viewer, heights positive (geometry.cpp:396-399)
    flip = height > 0
    n_vec = jnp.where(flip[:, None], -n_vec, n_vec)
    height = jnp.abs(height)
    finite = jnp.isfinite(height) & jnp.all(jnp.isfinite(n_vec), axis=-1)

    h_np = np.asarray(height)
    f_np = np.asarray(finite)
    if f_np.sum() < 1:
        return KittiGround(0.0, np.zeros(3), 0.0, 0)
    med = float(np.median(h_np[f_np]))
    med = med if med != 0 else 1.0

    params = jnp.concatenate([(height / med)[:, None], n_vec], axis=-1)  # (M, 4)
    res = meanshift(
        params,
        finite.astype(jnp.float32),
        ms_kernel_var,
        jnp.asarray([1.0, 0.0, -1.0, 0.0]),
        jnp.bool_(True),  # reference passes an external mean (geometry.cpp:424-425)
        jax.random.PRNGKey(seed),
    )
    mean_out = np.asarray(res.mean)
    return KittiGround(
        height=float(mean_out[0] * med),
        normal=mean_out[1:4],
        confidence=float(res.confidence),
        used_iters=int(res.iters),
    )
