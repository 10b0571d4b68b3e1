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
    reduce_threshold_dofs: int = 8192,
) -> np.ndarray:
    """reduce_threshold_dofs: tangent-dim count above which degree-2 chain
    vertices are marginalized before the solve (tests force 0 to exercise
    the reduction on small graphs)."""
    poses = np.ascontiguousarray(poses, np.float32)
    edges_idx = np.ascontiguousarray(edges_idx, np.int32)
    edges_pose = np.ascontiguousarray(edges_pose, np.float32)
    if edges_covar is None:
        edges_covar = np.tile(np.eye(7, dtype=np.float32), (edges_pose.shape[0], 1, 1))

    # Large graphs: exactly marginalize degree-2 chain vertices (pure VO
    # chains between keyframes — pgo/reduce.py), solve the reduced graph
    # on the dense fast path, then redistribute corrections along each
    # chain. The reference achieves the same effect inside Ceres'
    # SPARSE_NORMAL_CHOLESKY (pose-graph/pgo.cpp:82-95), which never
    # materializes the chain fill-in; here the reduction keeps a
    # KITTI-length graph inside the MXU dense regime.
    n_in = poses.shape[0]
    if poses_idx is None and n_in * 7 > reduce_threshold_dofs:
        from voldor_tpu.pgo.reduce import chain_reduce, redistribute_chain

        kept_ids, red_idx, red_pose, red_covar, segments = chain_reduce(
            n_in, edges_idx, edges_pose, edges_covar
        )
        if len(kept_ids) < n_in:
            remap = np.full(n_in, -1, np.int64)
            remap[kept_ids] = np.arange(len(kept_ids))
            red_idx_c = remap[red_idx.astype(np.int64)].astype(np.int32)
            if debug:
                print(
                    f"PGO chain reduction: {n_in} -> {len(kept_ids)} poses, "
                    f"{edges_idx.shape[0]} -> {red_idx.shape[0]} edges"
                )
            solved_kept = pgo(
                poses[kept_ids],
                red_idx_c,
                red_pose,
                red_covar,
                optimize_7dof=optimize_7dof,
                debug=debug,
            )
            kept_rows = {int(kid): i for i, kid in enumerate(kept_ids)}
            return redistribute_chain(poses, solved_kept, kept_rows, segments)

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
