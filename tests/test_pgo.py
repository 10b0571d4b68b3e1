"""Pose-graph optimization tests: synthetic loops with drift + loop closure."""

import numpy as np
import jax.numpy as jnp
import pytest

from voldor_tpu.ops import lie
from voldor_tpu.pgo.api import pgo


def _compose(p1, p2):
    """Compose 6-dof poses (cam->world style T2 = T(p1) @ T(p2))."""
    T = np.asarray(
        lie.pose6_to_T44(jnp.asarray(p1[None].astype(np.float32)))[0]
        @ lie.pose6_to_T44(jnp.asarray(p2[None].astype(np.float32)))[0]
    )
    return np.asarray(lie.T44_to_pose6(jnp.asarray(T[None])))[0]


def _rel_pose7(poses7, begin, end):
    """Edge measurement for (begin, end): the transform mapping begin-frame
    points into end-frame coordinates, with vertices stored as cam->world
    poses — the convention the SLAM layer feeds PGO (voldor_slam.py:379-393,
    residual zero-condition of pgo_error_term.h:91-115 with the begin/end
    swap of pgo.cpp:41-49). Scale entry: s_end - s_begin (Edge pose7[6] =
    log(f2/f1), voldor_slam.py:592)."""
    Tb = np.asarray(lie.pose6_to_T44(jnp.asarray(poses7[begin, :6][None])))[0]
    Te = np.asarray(lie.pose6_to_T44(jnp.asarray(poses7[end, :6][None])))[0]
    Trel = np.linalg.inv(Te) @ Tb
    rel6 = np.asarray(lie.T44_to_pose6(jnp.asarray(Trel[None])))[0]
    out = np.zeros(7, np.float32)
    out[:6] = rel6
    out[6] = poses7[end, 6] - poses7[begin, 6]
    return out


def _circle_graph(n=40, radius=10.0, rng=None):
    """Ground-truth poses around a circle (world-frame positions + yaw)."""
    gt = np.zeros((n, 7), np.float32)
    for i in range(n):
        a = 2 * np.pi * i / n
        gt[i, :3] = [0, 0, a]  # rvec: yaw about z
        gt[i, 3:6] = [radius * np.cos(a), radius * np.sin(a), 0.0]
    return gt


def test_pgo_consistent_graph_is_fixed_point():
    gt = _circle_graph(24)
    edges_idx = np.asarray([[i, i + 1] for i in range(23)] + [[0, 23]], np.int32)
    edges_pose = np.stack([_rel_pose7(gt, i, j) for i, j in edges_idx])
    covar = np.tile((np.eye(7) * 1e-4).astype(np.float32), (len(edges_idx), 1, 1))
    out = pgo(gt, edges_idx, edges_pose, covar)
    np.testing.assert_allclose(out[:, 3:6], gt[:, 3:6], atol=1e-3)
    # rotations equivalent
    R_out = np.asarray(lie.so3_exp(jnp.asarray(out[:, :3])))
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(gt[:, :3])))
    np.testing.assert_allclose(R_out, R_gt, atol=1e-3)


def test_pgo_corrects_drift_with_loop_closure(rng):
    n = 30
    gt = _circle_graph(n)
    # odometry with accumulated noise
    noisy = gt.copy()
    drift_r = np.zeros(3)
    drift_t = np.zeros(3)
    for i in range(1, n):
        drift_r += rng.normal(0, 0.005, 3)
        drift_t += rng.normal(0, 0.02, 3)
        noisy[i, :3] = gt[i, :3] + drift_r
        noisy[i, 3:6] = gt[i, 3:6] + drift_t
    # edges: consecutive odometry (from the *noisy* relative transforms of
    # exact measurements? no — measurements are exact relative gt) + loop.
    edges_idx = np.asarray([[i, i + 1] for i in range(n - 1)] + [[0, n - 1], [0, n // 2]], np.int32)
    edges_pose = np.stack([_rel_pose7(gt, i, j) for i, j in edges_idx])
    covar = np.tile((np.eye(7) * 1e-4).astype(np.float32), (len(edges_idx), 1, 1))

    err_before = np.linalg.norm(noisy[:, 3:6] - gt[:, 3:6], axis=1).mean()
    out = pgo(noisy, edges_idx, edges_pose, covar)
    err_after = np.linalg.norm(out[:, 3:6] - gt[:, 3:6], axis=1).mean()
    assert err_after < 0.05 * max(err_before, 1e-9) or err_after < 1e-3
    # gauge: first pose unchanged
    np.testing.assert_allclose(out[0], noisy[0], atol=1e-6)


def test_pgo_7dof_scale_correction(rng):
    """A scale-drifted chain with a loop-closure scale measurement."""
    n = 12
    gt = _circle_graph(n)
    gt[:, 6] = 0.0
    noisy = gt.copy()
    noisy[:, 6] = np.cumsum(rng.normal(0, 0.05, n)).astype(np.float32)
    noisy[0, 6] = 0.0
    edges_idx = np.asarray([[i, i + 1] for i in range(n - 1)] + [[0, n - 1]], np.int32)
    edges_pose = np.stack([_rel_pose7(gt, i, j) for i, j in edges_idx])
    covar = np.tile((np.eye(7) * 1e-4).astype(np.float32), (len(edges_idx), 1, 1))
    out = pgo(noisy, edges_idx, edges_pose, covar, optimize_7dof=True)
    np.testing.assert_allclose(out[:, 6], 0.0, atol=5e-3)
    # without 7dof, scales must not move
    out6 = pgo(noisy, edges_idx, edges_pose, covar, optimize_7dof=False)
    np.testing.assert_allclose(out6[:, 6], noisy[:, 6], atol=1e-7)


def test_pgo_drops_nonfinite_covar_edges(capsys):
    gt = _circle_graph(8)
    edges_idx = np.asarray([[i, i + 1] for i in range(7)], np.int32)
    edges_pose = np.stack([_rel_pose7(gt, i, j) for i, j in edges_idx])
    covar = np.tile((np.eye(7) * 1e-4).astype(np.float32), (7, 1, 1))
    covar[3] = np.nan
    out = pgo(gt, edges_idx, edges_pose, covar, debug=True)
    captured = capsys.readouterr()
    assert "Nan/Inf" in captured.out
    assert out.shape == (8, 7)
    assert np.all(np.isfinite(out))


def test_pgo_poses_idx_remap():
    gt = _circle_graph(6)
    ids = np.asarray([10, 11, 12, 13, 14, 15], np.int32)
    edges_idx = np.asarray([[10 + i, 11 + i] for i in range(5)], np.int32)
    gtx = gt.copy()
    edges_pose = np.stack(
        [_rel_pose7(gtx, i, i + 1) for i in range(5)]
    )
    covar = np.tile((np.eye(7) * 1e-4).astype(np.float32), (5, 1, 1))
    out = pgo(gt, edges_idx, edges_pose, covar, poses_idx=ids)
    np.testing.assert_allclose(out[:, 3:6], gt[:, 3:6], atol=1e-3)


def test_pgo_dense_matches_cg(rng):
    """The dense-Cholesky LM (pgo_solve_dense_jit — one MXU factorization
    per iteration, the D<=8192 fast path) must land on the same optimum as
    the matrix-free LM+CG it replaces (docs/PERF_SLAM_PHASES.json
    solve_pgo: 5.6 s warm -> the latency-bound CG loop)."""
    from voldor_tpu.pgo.solver import (build_problem, pgo_solve_dense_jit,
                                       pgo_solve_jit)

    n = 30
    gt = _circle_graph(n)
    noisy = gt.copy()
    noisy[1:, 3:6] += rng.normal(0, 0.05, (n - 1, 3)).cumsum(0)
    noisy[1:, :3] += rng.normal(0, 0.01, (n - 1, 3)).cumsum(0)
    edges_idx = np.asarray(
        [[i, i + 1] for i in range(n - 1)] + [[0, n - 1]], np.int32
    )
    edges_pose = np.stack([_rel_pose7(gt, i, j) for i, j in edges_idx])
    covar = np.tile((np.eye(7) * 1e-4).astype(np.float32),
                    (len(edges_idx), 1, 1))

    prob, _, _ = build_problem(noisy, None, edges_idx,
                               edges_pose, covar, False)
    dense, cost_d, _ = pgo_solve_dense_jit(prob)
    cg, cost_c, _ = pgo_solve_jit(prob)
    assert float(cost_d) <= float(cost_c) * 1.05 + 1e-6
    np.testing.assert_allclose(np.asarray(dense.p), np.asarray(cg.p),
                               atol=2e-3)
    np.testing.assert_allclose(np.abs(np.sum(np.asarray(dense.q)
                                             * np.asarray(cg.q), -1)),
                               1.0, atol=1e-5)
