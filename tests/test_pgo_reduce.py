"""Chain-reduction PGO tests (pgo/reduce.py).

The reference solves every-frame pose graphs with Ceres
SPARSE_NORMAL_CHOLESKY (pose-graph/pgo.cpp:82-95); here degree-2 VO-chain
vertices are exactly marginalized (edge composition + first-order
covariance propagation) so KITTI-length graphs fit the dense MXU path,
then chain corrections are redistributed (Brownian-bridge interpolation).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from voldor_tpu.ops import lie
from voldor_tpu.pgo.api import pgo
from voldor_tpu.pgo.reduce import (R_to_rvec, chain_reduce, compose_edges,
                                   rvec_to_R)

from tests.test_pgo import _circle_graph, _rel_pose7


def _rel_pose7s(poses7, b, e):
    """Scale-aware wire measurement: the solver's zero-residual condition
    divides the relative translation by exp((s_b + s_e)/2)
    (pgo/solver.py:_edge_residual s_ab_avg)."""
    out = _rel_pose7(poses7, b, e)
    out[3:6] /= np.exp(0.5 * (poses7[b, 6] + poses7[e, 6]))
    return out


def test_rvec_roundtrip(rng):
    for _ in range(20):
        r = rng.normal(0, 1.0, 3)
        R = rvec_to_R(r)
        r2 = R_to_rvec(R)
        np.testing.assert_allclose(rvec_to_R(r2), R, atol=1e-9)
    # near-pi branch
    r = np.array([np.pi - 1e-7, 0.0, 0.0])
    np.testing.assert_allclose(rvec_to_R(R_to_rvec(rvec_to_R(r))), rvec_to_R(r), atol=1e-6)


def test_compose_edges_measurement(rng):
    """Composing (0->1) with (1->2) must equal the direct (0->2) edge in
    the SLAM wire convention (begin-frame points -> end-frame coords,
    scale = s_end - s_begin)."""
    gt = _circle_graph(3, rng=rng)
    gt[:, 6] = rng.normal(0, 0.3, 3)
    m01 = _rel_pose7s(gt, 0, 1)
    m12 = _rel_pose7s(gt, 1, 2)
    m02 = _rel_pose7s(gt, 0, 2)
    c = np.eye(7) * 1e-4
    mc, cc = compose_edges(m01, c, m12, c)
    np.testing.assert_allclose(rvec_to_R(mc[:3]), rvec_to_R(m02[:3].astype(np.float64)), atol=1e-5)
    np.testing.assert_allclose(mc[3:6], m02[3:6], atol=1e-4)
    np.testing.assert_allclose(mc[6], m02[6], atol=1e-5)
    assert np.all(np.isfinite(cc))
    assert np.all(np.linalg.eigvalsh(0.5 * (cc + cc.T)) > 0)


def test_compose_edges_covariance_monte_carlo(rng):
    """The propagated covariance must match the empirical covariance of
    composed measurements under wire-coordinate noise (validates the
    analytic SO(3)-Jacobian blocks)."""
    gt = _circle_graph(3, rng=rng)
    gt[:, 6] = [0.0, 0.1, -0.2]
    m01 = _rel_pose7(gt, 0, 1).astype(np.float64)
    m12 = _rel_pose7(gt, 1, 2).astype(np.float64)
    sig = 0.01
    c = np.eye(7) * sig**2
    mc0, cc = compose_edges(m01, c, m12, c)
    samples = []
    for _ in range(3000):
        mcs, _ = compose_edges(
            m01 + rng.normal(0, sig, 7), c, m12 + rng.normal(0, sig, 7), c
        )
        samples.append(mcs - mc0)
    emp = np.cov(np.asarray(samples).T)
    # elementwise agreement to ~15% of the largest variance
    scale = np.max(np.abs(cc))
    np.testing.assert_allclose(emp, cc, atol=0.15 * scale)


def test_chain_reduce_topology():
    """10-pose graph: chain edges + keyframe links (0,5) and (0,9).
    Interior chain vertices are removable; 0, 5, 9 are kept."""
    n = 10
    gt = _circle_graph(n)
    e = [[i, i + 1] for i in range(n - 1)] + [[0, 5], [0, 9]]
    edges_idx = np.asarray(e, np.int32)
    edges_pose = np.stack([_rel_pose7(gt, i, j) for i, j in edges_idx])
    covar = np.tile((np.eye(7) * 1e-4).astype(np.float32), (len(e), 1, 1))
    kept, red_idx, red_pose, red_covar, segs = chain_reduce(
        n, edges_idx, edges_pose, edges_covar=covar
    )
    np.testing.assert_array_equal(kept, [0, 5, 9])
    # reduced edges: (0,5), (5,9) composed chains + the two LC edges
    pairs = {tuple(r) for r in red_idx.tolist()}
    assert pairs == {(0, 5), (5, 9), (0, 9)}
    assert red_idx.shape[0] == 4  # (0,5)x2 (chain+LC), (5,9), (0,9)
    # composed chain measurements equal the direct relative transforms
    for k in range(red_idx.shape[0]):
        b, e2 = int(red_idx[k, 0]), int(red_idx[k, 1])
        direct = _rel_pose7(gt, b, e2)
        np.testing.assert_allclose(red_pose[k, 3:6], direct[3:6], atol=1e-3)


def test_reduced_pgo_matches_full(rng):
    """Forcing reduction (threshold 0) must land within noise-floor of the
    full dense solve on a drifted circle with keyframe loop closures."""
    n = 60
    gt = _circle_graph(n)
    noisy = gt.copy()
    noisy[1:, 3:6] += rng.normal(0, 0.02, (n - 1, 3)).cumsum(0).astype(np.float32)
    noisy[1:, :3] += rng.normal(0, 0.004, (n - 1, 3)).cumsum(0).astype(np.float32)
    kfs = [0, 15, 30, 45, n - 1]
    e = [[i, i + 1] for i in range(n - 1)] + [[0, n - 1], [0, 30], [15, 45]]
    edges_idx = np.asarray(e, np.int32)
    edges_pose = np.stack([_rel_pose7(gt, i, j) for i, j in edges_idx])
    covar = np.tile((np.eye(7) * 1e-4).astype(np.float32), (len(e), 1, 1))

    full = pgo(noisy, edges_idx, edges_pose, covar)
    red = pgo(noisy, edges_idx, edges_pose, covar, reduce_threshold_dofs=0)

    err_full = np.linalg.norm(full[:, 3:6] - gt[:, 3:6], axis=1).mean()
    err_red = np.linalg.norm(red[:, 3:6] - gt[:, 3:6], axis=1).mean()
    # both recover the circle; the reduced path within 2x of full's error
    # plus an absolute floor (first-order redistribution)
    assert err_red < max(2.0 * err_full, 5e-3)
    # kept keyframes agree tightly with the full solve
    np.testing.assert_allclose(red[kfs, 3:6], full[kfs, 3:6], atol=5e-3)


def test_reduced_pgo_7dof_scale(rng):
    """Scale drift corrected through the reduction path (7-dof)."""
    n = 40
    gt = _circle_graph(n)
    gt[:, 6] = 0.0
    noisy = gt.copy()
    noisy[1:, 6] = np.cumsum(rng.normal(0, 0.02, n - 1)).astype(np.float32)
    e = [[i, i + 1] for i in range(n - 1)] + [[0, n - 1], [0, 20]]
    edges_idx = np.asarray(e, np.int32)
    edges_pose = np.stack([_rel_pose7(gt, i, j) for i, j in edges_idx])
    covar = np.tile((np.eye(7) * 1e-4).astype(np.float32), (len(e), 1, 1))
    out = pgo(noisy, edges_idx, edges_pose, covar, optimize_7dof=True,
              reduce_threshold_dofs=0)
    np.testing.assert_allclose(out[:, 6], 0.0, atol=2e-2)


def test_reduce_noop_when_no_chains():
    """A graph whose every vertex carries an LC edge has nothing to
    reduce; pgo must fall through to the normal path unchanged."""
    n = 8
    gt = _circle_graph(n)
    e = [[i, i + 1] for i in range(n - 1)] + [[0, i] for i in range(2, n)]
    edges_idx = np.asarray(e, np.int32)
    edges_pose = np.stack([_rel_pose7(gt, i, j) for i, j in edges_idx])
    covar = np.tile((np.eye(7) * 1e-4).astype(np.float32), (len(e), 1, 1))
    out = pgo(gt, edges_idx, edges_pose, covar, reduce_threshold_dofs=0)
    np.testing.assert_allclose(out[:, 3:6], gt[:, 3:6], atol=1e-3)
