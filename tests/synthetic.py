"""Synthetic rigid-scene flow renderer for ground-truth EM tests.

A slanted plane (n . X = d in frame-0 coordinates) gives exact, analytic
depth from any camera along the window, hence exact optical flows — the
ground-truth oracle SURVEY.md 4(c) calls for.
"""

import numpy as np


def plane_depth(K, R0w, t0w, planes, h, w):
    """Depth map of a union of planes {n_i.X_w = d_i} seen from camera
    (R0w, t0w): X_cam = R0w X_w + t0w. Per pixel the nearest positive-depth
    plane wins (proper occlusion), so multi-plane scenes stay exactly
    renderable while spanning general 3D structure (a single plane would
    make the 8-point essential matrix degenerate)."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    rays = np.stack([xs, ys, np.ones_like(xs)], -1) @ np.linalg.inv(K).T
    best = np.full((h, w), np.inf)
    for n, d in planes:
        # X_w = R0w^T (X_c - t0w); n.X_w = d => (R0w n).X_c = d + n.(R0w^T t0w)
        n_c = R0w @ n
        d_c = d + n @ (R0w.T @ t0w)
        denom = rays @ n_c
        z = d_c / np.where(np.abs(denom) < 1e-9, 1e-9, denom)
        z = np.where(z > 0, z, np.inf)
        best = np.minimum(best, z)
    return best.astype(np.float32)


def render_window(K, poses6, planes, h, w, rvec_to_R):
    """Exact flows for a window of relative poses over a multi-plane scene.

    poses6: (N, 6) [rvec, tvec], pose f maps frame-f points to frame f+1.
    planes: list of (normal, offset) world planes.
    Returns (flows (N, h, w, 2) float32, depth0 (h, w) float32,
    cams_T (N+1, 4, 4) frame-0 -> frame-k transforms).
    """
    N = poses6.shape[0]
    # cumulative transforms T_k: frame0 -> framek
    T = np.eye(4)
    Ts = [T.copy()]
    for f in range(N):
        R = rvec_to_R(poses6[f, :3])
        t = poses6[f, 3:6]
        Tf = np.eye(4)
        Tf[:3, :3] = R
        Tf[:3, 3] = t
        T = Tf @ T
        Ts.append(T.copy())
    Ts = np.stack(Ts)

    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    Kinv = np.linalg.inv(K)
    flows = []
    for f in range(N):
        # depth of frame f along its grid, from the plane in frame-f coords
        Rf = Ts[f][:3, :3]
        tf = Ts[f][:3, 3]
        depth_f = plane_depth(K, Rf, tf, planes, h, w).astype(np.float64)
        rays = np.stack([xs, ys, np.ones_like(xs)], -1) @ Kinv.T
        Xf = rays * depth_f[..., None]
        # to frame f+1
        Rrel = Ts[f + 1][:3, :3] @ Ts[f][:3, :3].T
        trel = Ts[f + 1][:3, 3] - Rrel @ Ts[f][:3, 3]
        X1 = Xf @ Rrel.T + trel
        u1 = K[0, 0] * X1[..., 0] / X1[..., 2] + K[0, 2]
        v1 = K[1, 1] * X1[..., 1] / X1[..., 2] + K[1, 2]
        flows.append(np.stack([u1 - xs, v1 - ys], -1).astype(np.float32))

    depth0 = plane_depth(K, np.eye(3), np.zeros(3), planes, h, w)
    return np.stack(flows), depth0, Ts
