"""Batched SO(3) / SE(3) / quaternion math.

All functions broadcast over leading batch dimensions and are jit/vmap safe
(no data-dependent branching; singularities handled with `jnp.where` guards).

Conventions (matching the reference throughout):
  * rvec: axis-angle rotation vector, angle = ||rvec||.
  * pose6: ``[rvec(3), tvec(3)]``, the map ``p_cam2 = R(rvec) @ p_cam1 + t``.
  * quaternions are Hamilton ``[w, x, y, z]`` unless noted; the PGO layer
    also offers xyzw helpers to match Eigen's storage order.

Reference parity targets: cv2.Rodrigues semantics (slam_py/slam_utils.py:59-95),
the atan2-based angle-axis extraction (gpu-kernels/rodrigues.h:82-113 — chosen
over acos for accuracy, see voldor/geometry.cpp:158-161), and the
quaternion<->angle-axis conversions in pose-graph/types.h:51-71.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def so3_exp(rvec: jax.Array) -> jax.Array:
    """Axis-angle -> rotation matrix (Rodrigues). rvec: (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(rvec * rvec, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    # Guarded trig coefficients with small-angle Taylor fallbacks.
    small = theta2 < 1e-8
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    a = jnp.where(small, 1.0 - theta2 / 6.0, sin_t / theta)  # sin(t)/t
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - cos_t) / theta2)  # (1-cos t)/t^2
    K = _hat(rvec)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle. R: (..., 3, 3) -> (..., 3).

    Goes through a quaternion (Shepperd's method: branch-free 4-way select
    on the largest of trace/diagonal) then atan2-based angle extraction —
    accurate over the whole rotation group including near pi. The reference
    hit the same acos-vs-atan2 accuracy issue (geometry.cpp:158-161).
    """
    return quat_to_rvec(quat_from_matrix(R))


def quat_from_matrix(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> unit quaternion [w,x,y,z], Shepperd's method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions, each numerically stable in its regime.
    def cand(t, a, b, c, d):
        s = jnp.sqrt(jnp.maximum(t, _EPS)) * 2.0  # 4*|component|
        return jnp.stack([a / s, b / s, c / s, d / s], axis=-1), s

    qw, sw = cand(tr + 1.0, (tr + 1.0), (m21 - m12), (m02 - m20), (m10 - m01))
    qx, sx = cand(1.0 + m00 - m11 - m22, (m21 - m12), (1.0 + m00 - m11 - m22), (m01 + m10), (m02 + m20))
    qy, sy = cand(1.0 + m11 - m00 - m22, (m02 - m20), (m01 + m10), (1.0 + m11 - m00 - m22), (m12 + m21))
    qz, sz = cand(1.0 + m22 - m00 - m11, (m10 - m01), (m02 + m20), (m12 + m21), (1.0 + m22 - m00 - m11))

    scores = jnp.stack([sw, sx, sy, sz], axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None], axis=-2)[..., 0, :]
    # Canonical sign: w >= 0.
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    return quat_normalize(q)


def _hat(v: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric cross-product matrix."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def rotate_rvec(p: jax.Array, rvec: jax.Array) -> jax.Array:
    """Rotate points by an axis-angle vector without building R.

    p: (..., 3), rvec: (..., 3). Matches rot_with_rvec
    (gpu-kernels/align_frame.cu:47-122) value semantics; Jacobians come from
    autodiff instead of that file's 80-line hand-derived expressions.
    """
    theta2 = jnp.sum(rvec * rvec, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-12
    safe_theta = jnp.where(small, 1.0, theta)
    w = rvec / safe_theta
    cos_t = jnp.where(small[..., 0], 1.0, jnp.cos(theta[..., 0]))[..., None]
    sin_t = jnp.where(small[..., 0], 0.0, jnp.sin(theta[..., 0]))[..., None]
    w_cross_p = jnp.cross(w, p)
    w_dot_p = jnp.sum(w * p, axis=-1, keepdims=True)
    rotated = p * cos_t + w_cross_p * sin_t + w * w_dot_p * (1.0 - cos_t)
    # First-order fallback near zero (reference align_frame.cu:90-121).
    linear = p + jnp.cross(rvec, p)
    return jnp.where(small, linear, rotated)


def so3_right_jacobian(rvec: jax.Array) -> jax.Array:
    """Right Jacobian J_r of SO(3): exp((r+d)^) = exp(r^) exp((J_r(r) d)^).

    Closed form J_r = I - (1-cos t)/t^2 [r]x + (t - sin t)/t^3 [r]x^2 with
    Taylor fallbacks near t=0. Used by the falign analytic Jacobian
    (falign/residual.py:pair_residual_and_grads) to chain d(R(r)p)/dr =
    -[R p]x (R J_r) through a per-frame constant 3x3 instead of autodiff's
    per-point tangent replays. rvec: (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(rvec * rvec, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - cos_t) / theta2)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - sin_t) / (theta2 * theta)
    )
    K = _hat(rvec)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye - b * K + c * K2


def pose6_to_T44(pose6: jax.Array) -> jax.Array:
    """(..., 6) -> (..., 4, 4) homogeneous transform (slam_utils.py:77-95)."""
    R = so3_exp(pose6[..., :3])
    T = jnp.zeros(pose6.shape[:-1] + (4, 4), pose6.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(pose6[..., 3:6])
    T = T.at[..., 3, 3].set(1.0)
    return T


def T44_to_pose6(T: jax.Array) -> jax.Array:
    """(..., 4, 4) -> (..., 6) (slam_utils.py:59-75)."""
    return jnp.concatenate([so3_log(T[..., :3, :3]), T[..., :3, 3]], axis=-1)


def T44_inv(T: jax.Array) -> jax.Array:
    """Closed-form rigid-transform inverse."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", Rt, t))
    out = out.at[..., 3, 3].set(1.0)
    return out


def polish_R(R: jax.Array) -> jax.Array:
    """Re-orthonormalize via SVD (slam_utils.py:55-57 / rodrigues.h:82-113)."""
    u, _, vt = jnp.linalg.svd(R)
    return u @ vt


# --- quaternions (Hamilton, wxyz) -------------------------------------------


def quat_from_rvec(rvec: jax.Array) -> jax.Array:
    """Axis-angle -> unit quaternion [w,x,y,z] (types.h:51-60 semantics)."""
    theta2 = jnp.sum(rvec * rvec, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    # k = sin(theta/2)/theta with Taylor fallback (types.h:103-111 uses same k).
    small = theta2 < 1e-12
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(0.5 * theta) / theta)
    w = jnp.where(small[..., 0], 1.0 - theta2[..., 0] / 8.0, jnp.cos(0.5 * theta[..., 0]))
    return jnp.concatenate([w[..., None], rvec * k], axis=-1)


def quat_to_rvec(q: jax.Array) -> jax.Array:
    """Unit quaternion [w,x,y,z] -> axis-angle (types.h:65-71 semantics)."""
    w = q[..., 0]
    xyz = q[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1)
    theta = 2.0 * jnp.arctan2(sin_half, w)
    # Map theta through sign of w implicitly handled by atan2; scale axis.
    small = sin_half < 1e-8
    scale = jnp.where(small, 2.0 / jnp.where(w == 0, 1.0, jnp.sign(w) + (w == 0)), theta / jnp.maximum(sin_half, _EPS))
    return xyz * scale[..., None]


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product, [w,x,y,z]."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_rotate(q: jax.Array, p: jax.Array) -> jax.Array:
    """Rotate points p (..., 3) by unit quaternion q (..., 4) [w,x,y,z]."""
    w = q[..., 0:1]
    v = q[..., 1:]
    uv = jnp.cross(v, p)
    uuv = jnp.cross(v, uv)
    return p + 2.0 * (w * uv + uuv)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
