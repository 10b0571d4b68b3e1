"""Trajectory-metric tests."""

import numpy as np

from voldor_tpu.slam.slam_utils import rvec_to_R
from voldor_tpu.utils.evaluation import ate_rmse, kitti_rel_errors, umeyama_alignment


def _traj(n=200, r=50.0):
    T = np.tile(np.eye(4), (n, 1, 1))
    for i in range(n):
        a = 0.02 * i
        T[i, :3, :3] = rvec_to_R(np.asarray([0, 0, a]))
        T[i, :3, 3] = [r * np.sin(a), r * (1 - np.cos(a)), 0.01 * i]
    return T


def test_umeyama_exact(rng):
    src = rng.normal(size=(50, 3))
    R = rvec_to_R(np.asarray([0.2, -0.1, 0.4]))
    s_true, t_true = 1.7, np.asarray([1.0, -2.0, 3.0])
    dst = s_true * src @ R.T + t_true
    s, R_est, t = umeyama_alignment(src, dst)
    assert abs(s - s_true) < 1e-9
    np.testing.assert_allclose(R_est, R, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)


def test_ate_zero_for_similarity_transformed(rng):
    gt = _traj()
    est = gt.copy()
    R = rvec_to_R(np.asarray([0.1, 0.3, -0.2]))
    for i in range(gt.shape[0]):
        est[i, :3, 3] = 0.7 * R @ gt[i, :3, 3] + np.asarray([5, 6, 7])
    assert ate_rmse(est, gt, with_scale=True) < 1e-9
    assert ate_rmse(est, gt, with_scale=False) > 1.0


def test_ate_scales_with_noise(rng):
    gt = _traj()
    est = gt.copy()
    est[:, :3, 3] += rng.normal(0, 0.3, (gt.shape[0], 3))
    e = ate_rmse(est, gt)
    assert 0.2 < e < 0.7


def test_kitti_rel_errors():
    gt = _traj(1500, r=200.0)
    t_rel, r_rel = kitti_rel_errors(gt, gt)
    assert t_rel < 1e-9 and r_rel < 1e-6
    # a 1% per-frame scale drift shows as a ~1% translation error
    est = gt.copy()
    est[:, :3, 3] *= 1.01
    t_rel, r_rel = kitti_rel_errors(est, gt)
    assert 0.3 < t_rel < 3.0
