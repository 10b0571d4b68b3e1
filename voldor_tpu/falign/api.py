"""`falign()` — the pyvoldor-compatible frame-alignment entry point.

Signature, shapes and return dict match the reference Cython binding
(slam_py/install/pyvoldor_full.pyx:88-154 -> frame-alignment/
py_export.cpp:4-89).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from voldor_tpu.falign.residual import precompute_maps
from voldor_tpu.falign.solver import align_scores, lm_solve


def falign(
    depths: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    weights: np.ndarray | None = None,
    images: np.ndarray | None = None,
    poses_init: np.ndarray | None = None,
    connectivity: np.ndarray | None = None,
    vbf: float = 1000.0,
    crw: float = 10.0,
    optimize_7dof: bool = False,
    graduated_optmize: bool = False,  # accepted for compat; unused upstream too
    stride: int = 4,
    consistency_residual_bound: float = 1.0,
    debug: bool = False,
) -> dict:
    """Dense pairwise alignment of N keyframes.

    depths: (N, h, w); weights/images: (N, h, w); poses_init: (N, 6)
    cam->world [rvec, tvec]; connectivity: flat (ref, tar) pairs terminated
    by -1 (py_export.cpp:38-52), default fully connected.

    Returns {'poses_ret' (N, 6), 'poses_covar' (N, 7, 7) if optimize_7dof
    else (N, 6, 6), 'scaling_factor' (N,), 'visibility_mat' (N, N),
    'consistency_mat' (N, N)} with NaN matrix entries where unconnected.
    """
    depths = np.ascontiguousarray(depths, np.float32)
    N, h, w = depths.shape
    use_photo = images is not None and crw > 0

    if connectivity is not None:
        flat = list(np.asarray(connectivity).ravel())
        pairs = []
        i = 0
        while i < len(flat) and flat[i] != -1:
            pairs.append((int(flat[i]), int(flat[i + 1])))
            i += 2
    else:
        pairs = [(r, t) for r in range(N) for t in range(N) if r != t]
    pair_set = set(pairs)
    biconnected = np.asarray([(t, r) in pair_set for (r, t) in pairs], bool)
    pairs_np = np.asarray(pairs, np.int32)

    params0 = np.zeros((N, 9), np.float32)
    if poses_init is not None:
        params0[:, :6] = np.asarray(poses_init, np.float32)

    # Active parameter dims per frame: pose always; depth scale if 7dof;
    # color if photo. (In 7-dof mode the solver additionally soft-fixes the
    # mean log-scale — see lm_solve's gauge term.)
    dim_mask = np.zeros((N, 9), np.float32)
    dim_mask[:, :6] = 1.0
    if optimize_7dof:
        dim_mask[:, 6] = 1.0
    if use_photo:
        dim_mask[:, 7:9] = 1.0

    maps, bounds = precompute_maps(
        jnp.asarray(depths),
        None if weights is None else jnp.asarray(np.ascontiguousarray(weights, np.float32)),
        None if images is None else jnp.asarray(np.ascontiguousarray(images, np.float32)),
        fx, fy, cx, cy,
    )
    intr = (jnp.float32(fx), jnp.float32(fy), jnp.float32(cx), jnp.float32(cy))

    res = lm_solve(
        jnp.asarray(params0),
        jnp.asarray(pairs_np),
        jnp.asarray(biconnected),
        maps,
        intr,
        jnp.float32(vbf),
        jnp.float32(crw),
        jnp.asarray(dim_mask),
        use_photo=use_photo,
        stride=int(stride),
        bounds=bounds,
        n_frames=N,
    )
    params = np.asarray(res.params)
    covars9 = np.asarray(res.covars)

    d = 7 if optimize_7dof else 6
    poses_covar = np.zeros((N, d, d), np.float32)
    poses_covar[:, :6, :6] = covars9[:, :6, :6]
    if optimize_7dof:
        # Ceres only extracts the (pose, pose) and (scale, scale) blocks
        # (align_frame.cpp:174-195); cross terms stay zero.
        poses_covar[:, 6, 6] = covars9[:, 6, 6]

    vis, cons = align_scores(
        res.params,
        jnp.asarray(pairs_np),
        maps,
        intr,
        jnp.float32(vbf),
        jnp.float32(crw),
        use_photo,
        jnp.float32(consistency_residual_bound),
        bounds,
    )
    vis = np.asarray(vis)
    cons = np.asarray(cons)
    visibility_mat = np.full((N, N), np.nan, np.float32)
    consistency_mat = np.full((N, N), np.nan, np.float32)
    for k, (r, t) in enumerate(pairs):
        visibility_mat[r, t] = vis[k]
        consistency_mat[r, t] = cons[k]

    scaling = np.exp(params[:, 6]) if optimize_7dof else np.ones(N, np.float32)
    return {
        "poses_ret": params[:, :6].astype(np.float32),
        "poses_covar": poses_covar,
        "scaling_factor": scaling.astype(np.float32),
        "visibility_mat": visibility_mat,
        "consistency_mat": consistency_mat,
    }
