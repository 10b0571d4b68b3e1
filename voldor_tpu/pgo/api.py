"""`pgo()` — the pyvoldor-compatible pose-graph entry point.

Signature/shapes match the reference binding (pyvoldor_full.pyx:167-198 ->
pose-graph/py_export.cpp:19-91): poses (N, 7) [rvec, tvec, log s], edge
list + 7x7 covariances, returns optimized (N, 7).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from voldor_tpu.ops import lie
from voldor_tpu.pgo.solver import (build_problem, pgo_solve_dense_jit,
                                   pgo_solve_jit)


def pgo(
    poses: np.ndarray,
    edges_idx: np.ndarray,
    edges_pose: np.ndarray,
    edges_covar: np.ndarray | None = None,
    poses_idx: np.ndarray | None = None,
    optimize_7dof: bool = False,
    debug: bool = False,
) -> np.ndarray:
    poses = np.ascontiguousarray(poses, np.float32)
    edges_idx = np.ascontiguousarray(edges_idx, np.int32)
    edges_pose = np.ascontiguousarray(edges_pose, np.float32)
    if edges_covar is None:
        edges_covar = np.tile(np.eye(7, dtype=np.float32), (edges_pose.shape[0], 1, 1))

    prob, ids, info = build_problem(
        poses, poses_idx, edges_idx, edges_pose, edges_covar, optimize_7dof
    )
    if debug:
        print(f"Number of poses: {info['n_poses']}")
        print(f"Number of constraints: {info['n_edges']}")

    if info["n_edges"] == 0:
        return poses.copy()

    # dense normal-equation Cholesky up to 8192 tangent dims (~1170
    # poses): one MXU factorization per LM iteration instead of 60
    # latency-bound CG steps (docs/PERF_SLAM_PHASES.json solve_pgo);
    # matrix-free CG beyond, where the dense H would not fit comfortably
    if prob.p.shape[0] * 7 <= 8192:
        solved, cost, iters = pgo_solve_dense_jit(prob)
    else:
        solved, cost, iters = pgo_solve_jit(prob)
    if debug:
        print(f"PGO cost {float(cost):.6f} after {int(iters)} LM iterations")

    n = info["n_poses"]
    rvecs = np.asarray(lie.quat_to_rvec(solved.q[:n]))
    out = np.zeros((n, 7), np.float32)
    out[:, :3] = rvecs
    out[:, 3:6] = np.asarray(solved.p[:n])
    out[:, 6] = np.asarray(solved.s[:n])
    return out
