"""Two-frame epipolar bootstrap for monocular initialization.

The reference bootstraps monocular sequences from the first flow with
OpenCV: findEssentialMat(LMedS) + recoverPose, then a per-pixel closed-form
depth (voldor/geometry.cpp:267-332, voldor.cpp:151-162). Here the whole
bootstrap is TPU-native: a batch of 8-point essential-matrix hypotheses
solved with one batched SVD, scored by LMedS over Sampson errors, and
decomposed with cheirality voting — all inside one jit.

Conventions match the reference: the recovered pose maps frame-0 points to
frame-1 (p1 = R p0 + t), and — replicating geometry.cpp:330 — the returned
translation is pre-multiplied by R (`t <- R t`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _sampson_sq(E, x1, x2):
    """Squared Sampson distance of normalized correspondences under E."""
    Ex1 = x1 @ E.T  # (M, 3)
    Etx2 = x2 @ E  # (M, 3)
    err = jnp.sum(x2 * Ex1, axis=-1)
    denom = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return err * err / jnp.maximum(denom, 1e-12)


def _eight_point(x1, x2):
    """E from >=8 normalized correspondences (x1/x2: (8, 3))."""
    A = jnp.concatenate(
        [
            x2[:, 0:1] * x1,
            x2[:, 1:2] * x1,
            x2[:, 2:3] * x1,
        ],
        axis=-1,
    )  # (8, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    E = vt[-1].reshape(3, 3)
    # Project onto the essential manifold: singular values (1, 1, 0).
    u, _, vt2 = jnp.linalg.svd(E)
    return u @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0], E.dtype)) @ vt2


def _linear_E(x1, x2, wgt):
    """Weighted linear (normal-equation) essential estimate over all points.

    Minimizes ||W^0.5 A e|| via a 9x9 eigendecomposition, then projects onto
    the essential manifold. This is the polish step cv::findEssentialMat's
    LMedS performs on the inlier set — a minimal 8-point sample alone
    carries O(noise) error; averaging over ~2k inliers shrinks it ~sqrt(M).
    """
    A = jnp.concatenate(
        [x2[:, 0:1] * x1, x2[:, 1:2] * x1, x2[:, 2:3] * x1], axis=-1
    )  # (M, 9)
    Aw = A * wgt[:, None]
    Mmat = Aw.T @ Aw
    _, v = jnp.linalg.eigh(Mmat)
    E = v[:, 0].reshape(3, 3)
    u, _, vt2 = jnp.linalg.svd(E)
    return u @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0], E.dtype)) @ vt2


def _triangulate_depths(R, t, x1, x2):
    """Midpoint-free two-view depth along each ray; returns (z1, z2).

    Solves z2*x2 = R (z1*x1) + t in least squares for (z1, z2).
    """
    # Normal equations of min ||z1*Rx1 + t - z2*x2||^2 over (z1, z2).
    Rx1 = x1 @ R.T
    a = jnp.sum(Rx1 * Rx1, axis=-1)
    b = -jnp.sum(Rx1 * x2, axis=-1)
    c = jnp.sum(x2 * x2, axis=-1)
    d = -jnp.sum(Rx1 * t[None, :], axis=-1)  # rhs_1
    e = jnp.sum(x2 * t[None, :], axis=-1)  # rhs_2
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    z1 = (c * d - b * e) / det
    z2 = (a * e - b * d) / det
    return z1, z2


@partial(jax.jit, static_argnames=("step", "n_hypotheses"))
def estimate_pose_epipolar(
    flow: jax.Array,
    K: jax.Array,
    key: jax.Array,
    mask: jax.Array | None = None,
    step: int = 4,
    n_hypotheses: int = 512,
):
    """Estimate the frame-0 -> frame-1 relative pose from one dense flow.

    flow: (h, w, 2); K: (3, 3); mask: optional (h, w) weights (>=0.5 keeps a
    pixel, geometry.cpp:300). Returns (R (3,3), t (3,) with ||t||=1 then
    t <- R t, median Sampson error of the winning model).
    """
    h, w = flow.shape[:2]
    ys, xs = jnp.mgrid[0:h:step, 0:w:step]
    xs = xs.reshape(-1).astype(flow.dtype)
    ys = ys.reshape(-1).astype(flow.dtype)
    fxy = flow[::step, ::step].reshape(-1, 2)
    u1 = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)
    u2 = jnp.stack([xs + fxy[:, 0], ys + fxy[:, 1], jnp.ones_like(xs)], axis=-1)
    Kinv = jnp.linalg.inv(K)
    x1 = u1 @ Kinv.T
    x2 = u2 @ Kinv.T

    use = jnp.ones(x1.shape[0], bool)
    if mask is not None:
        use = mask[::step, ::step].reshape(-1) >= 0.5
    n_use = jnp.maximum(jnp.sum(use.astype(jnp.int32)), 8)
    order = jnp.argsort(~use)

    idx = jax.random.randint(key, (n_hypotheses, 8), 0, n_use)
    sel = order[idx]
    Es = jax.vmap(_eight_point)(x1[sel], x2[sel])  # (B, 3, 3)

    # LMedS scoring on a bounded subsample: the median over ~2k points is
    # statistically equivalent and keeps the (B, M) sort cheap.
    n_score = min(2048, x1.shape[0])
    sidx = order[
        (jnp.arange(n_score) * (n_use / n_score)).astype(jnp.int32) % x1.shape[0]
    ]
    x1s, x2s = x1[sidx], x2[sidx]
    errs = jax.vmap(_sampson_sq, in_axes=(0, None, None))(Es, x1s, x2s)  # (B, n_score)
    med = jnp.median(errs, axis=-1)
    best = jnp.argmin(jnp.where(jnp.isfinite(med), med, jnp.inf))
    E = Es[best]
    med_best = med[best]

    # IRLS polish on the inlier set (2.5-sigma LMedS gate): re-estimate E
    # linearly over all inliers, keep the refinement only if the median
    # Sampson error does not regress. Without this the bootstrap carries the
    # full minimal-sample noise (measured ~4 deg rotation error at the
    # Fisk-calibrated noise level; <0.5 deg with the polish).
    sigma2 = 1.4826 ** 2 * jnp.maximum(med_best, 1e-14)
    for _ in range(2):
        err = _sampson_sq(E, x1s, x2s)
        wgt = (err < 6.25 * sigma2).astype(E.dtype)
        E_ref = _linear_E(x1s, x2s, wgt)
        med_ref = jnp.median(_sampson_sq(E_ref, x1s, x2s))
        keep = med_ref <= jnp.median(err)
        E = jnp.where(keep, E_ref, E)
        med_best = jnp.where(keep, med_ref, med_best)

    # Decompose with cheirality voting (recoverPose equivalent).
    u, _, vt = jnp.linalg.svd(E)
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    tvec = u[:, 2]

    def votes(R, t):
        z1, z2 = _triangulate_depths(R, t, x1, x2)
        good = (z1 > 0) & (z2 > 0) & use
        return jnp.sum(good.astype(jnp.int32))

    cands = [(R1, tvec), (R1, -tvec), (R2, tvec), (R2, -tvec)]
    vote_counts = jnp.stack([votes(R, t) for R, t in cands])
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    pick = jnp.argmax(vote_counts)
    R = Rs[pick]
    t = ts[pick]
    t = R @ t  # reference convention quirk (geometry.cpp:330)
    return R, t, med_best


@jax.jit
def estimate_depth_closed_form(
    flow: jax.Array,
    K: jax.Array,
    R: jax.Array,
    t: jax.Array,
    min_depth: float = 1e-2,
    max_depth: float = 1e10,
) -> jax.Array:
    """Per-pixel closed-form depth given flow and a relative pose
    (geometry.cpp:267-285). flow: (h, w, 2) -> depth (h, w)."""
    h, w = flow.shape[:2]
    bvec = K @ t  # (3,)
    KRKinv = K @ R @ jnp.linalg.inv(K)
    ys, xs = jnp.mgrid[0:h, 0:w]
    xs = xs.astype(flow.dtype)
    ys = ys.astype(flow.dtype)
    P = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # (h, w, 3)
    Wv = P @ KRKinv.T
    w1, w2, w3 = Wv[..., 0], Wv[..., 1], Wv[..., 2]
    a1 = xs + flow[..., 0]
    a2 = ys + flow[..., 1]
    b1, b2, b3 = bvec[0], bvec[1], bvec[2]
    nume = (a1 * b3 - b1) * (w1 - a1 * w3) + (a2 * b3 - b2) * (w2 - a2 * w3)
    deno = (w1 - a1 * w3) ** 2 + (w2 - a2 * w3) ** 2
    return jnp.clip(nume / jnp.maximum(deno, 1e-30), min_depth, max_depth)
