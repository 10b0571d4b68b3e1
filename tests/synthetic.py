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


# ---------------------------------------------------------------------------
# Adversarial degradations: the reference's operating point is noisy network
# flow (PWC-Net / MaskFlowNet) with occlusions and dynamic objects
# (README.md:110-160; Fisk residual model calibrated on PWC-Net flows,
# gpu-kernels/residual_model.h:4-12). These degradations stress the
# rigidness model, the truncation policy and the gating logic the clean
# renderer never exercises.
# ---------------------------------------------------------------------------

_EST_RF = 0.5  # residual_model.h:7
_FISK_A1, _FISK_A2 = 0.01, 0.09
_FISK_B1, _FISK_B2 = 1.0, -0.0022


def fisk_residual_magnitudes(rng, obs_mag, scale=1.0, u_cap=1e-3):
    """Sample flow-residual magnitudes (px) from the calibrated Fisk model.

    The reference models Y = (EST_RF * r)^2 ~ Fisk(shape c(m), scale s(m))
    where m is the observed flow magnitude (residual_model.h:28-31 evaluates
    the density at x^2/scale). Inverse-CDF sampling: Y = s*(u/(1-u))^(1/c).
    u_cap truncates the heavy upper tail (the model has no finite mean for
    c <= 1); the occasional multi-pixel outlier survives by design.
    """
    m = np.clip(np.asarray(obs_mag, np.float64) * _EST_RF, 2.0, 100.0)
    c = _FISK_B1 + _FISK_B2 * m
    s = _FISK_A1 * np.exp(_FISK_A2 * m)
    u = np.clip(rng.uniform(size=m.shape), 1e-9, 1.0 - u_cap)
    y = s * (u / (1.0 - u)) ** (1.0 / c)
    return (np.sqrt(y) / _EST_RF) * scale


def degrade_flows(
    flows,
    seed=0,
    noise_scale=1.0,
    n_occlusions=5,
    occlusion_size=(8, 30),
    moving_object=None,
):
    """Return a degraded copy of exact flows.

    noise_scale: multiplier on Fisk-calibrated per-pixel residual noise
      (1.0 = the noise level the rigidness model was calibrated for).
    n_occlusions: per frame, rectangles whose flow is replaced by a random
      constant shift (an occluder dragging its own motion).
    moving_object: None or dict(x=, y=, w=, h=, motion=(dx, dy)) — a region
      with coherent independent motion added on every frame (what the
      rigidness maps exist to reject, optimize_depth.cu:84-116).
    """
    rng = np.random.default_rng(seed)
    flows = np.array(flows, np.float32, copy=True)
    N, h, w, _ = flows.shape

    for f in range(N):
        if noise_scale > 0:
            mag = np.linalg.norm(flows[f], axis=-1)
            r = fisk_residual_magnitudes(rng, mag, noise_scale)
            theta = rng.uniform(0, 2 * np.pi, size=mag.shape)
            flows[f, ..., 0] += (r * np.cos(theta)).astype(np.float32)
            flows[f, ..., 1] += (r * np.sin(theta)).astype(np.float32)

        for _ in range(n_occlusions):
            oh = rng.integers(occlusion_size[0], occlusion_size[1] + 1)
            ow = rng.integers(occlusion_size[0], occlusion_size[1] + 1)
            y0 = rng.integers(0, max(h - oh, 1))
            x0 = rng.integers(0, max(w - ow, 1))
            occ_flow = rng.normal(0, 3.0, size=2).astype(np.float32)
            flows[f, y0 : y0 + oh, x0 : x0 + ow] = occ_flow

        if moving_object is not None:
            mo = moving_object
            # the object drifts with its own motion across frames
            x0 = int(mo["x"] + f * mo["motion"][0])
            y0 = int(mo["y"] + f * mo["motion"][1])
            x0 = np.clip(x0, 0, w - 1)
            y0 = np.clip(y0, 0, h - 1)
            x1 = min(x0 + mo["w"], w)
            y1 = min(y0 + mo["h"], h)
            flows[f, y0:y1, x0:x1, 0] += np.float32(mo["motion"][0])
            flows[f, y0:y1, x0:x1, 1] += np.float32(mo["motion"][1])

    return flows


def degrade_disparity(disparity, seed=0, noise_scale=1.0, holes_frac=0.05):
    """Noisy stereo disparity: Fisk-calibrated disparity noise (the depth
    prior arm uses the same residual model in disparity space,
    residual_model.h:53-63) plus invalid holes (disparity <= 0)."""
    rng = np.random.default_rng(seed)
    disp = np.array(disparity, np.float32, copy=True)
    if noise_scale > 0:
        r = fisk_residual_magnitudes(rng, np.abs(disp), noise_scale)
        disp += (r * rng.choice([-1.0, 1.0], size=disp.shape)).astype(np.float32)
    if holes_frac > 0:
        holes = rng.uniform(size=disp.shape) < holes_frac
        disp[holes] = 0.0
    return disp
