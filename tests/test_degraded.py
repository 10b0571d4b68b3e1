"""Adversarial-flow accuracy: noisy / occluded / dynamic-object inputs.

The reference's operating point is noisy network flow on KITTI/TUM
(README.md:110-160); its rigidness model, truncation policy, and gates exist
for exactly these degradations. The clean synthetic renderer never exercises
them — these tests do, with noise matched to the calibrated Fisk model
(gpu-kernels/residual_model.h:4-12).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from voldor_tpu.ops import lie
from voldor_tpu.utils.evaluation import ate_rmse
from voldor_tpu.vo.api import voldor

from synthetic import degrade_disparity, degrade_flows, render_window

H, W = 72, 96
FX = FY = 80.0
CX, CY = W / 2, H / 2
BF = 40.0


def _norm(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


PLANES = [
    (_norm([0.1, 0.15, 1.0]), 8.0),
    (_norm([-0.45, 0.1, 1.0]), 6.5),
    (_norm([0.3, -0.45, 1.0]), 7.0),
    (_norm([0.55, 0.35, 1.0]), 7.5),
    (_norm([-0.2, -0.5, 1.0]), 6.8),
]

# The object's motion must have a component inconsistent with ANY static
# depth: motion parallel to the epipolar flow direction is absorbed by a
# wrong depth (both here and in the reference — a translating object moving
# with the camera's flow is geometrically indistinguishable from closer
# static structure). The scene flow is mostly +x, so the object moves
# mostly in -y.
MOVING_OBJECT = dict(x=18, y=26, w=26, h=22, motion=(0.5, -3.0))


def _r2R(rv):
    return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))


def _scene(n=4, tx=0.4, seed=11):
    rng = np.random.default_rng(seed)
    poses = np.zeros((n, 6), np.float32)
    for f in range(n):
        poses[f, :3] = rng.normal(0, 0.008, 3)
        poses[f, 3:6] = [tx, 0.02, 0.2]
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)
    flows, depth0, Ts = render_window(K, poses, PLANES, H, W, _r2R)
    return poses, flows, depth0, Ts


@pytest.mark.slow
def test_rigidness_rejects_moving_object():
    """A coherently moving region must end with low rigidness (the E-step's
    whole purpose, optimize_depth.cu:84-116) and must not corrupt the pose."""
    poses, flows, depth0, _ = _scene(4)
    bad = degrade_flows(
        flows, seed=5, noise_scale=0.5, n_occlusions=0,
        moving_object=MOVING_OBJECT,
    )
    ret = voldor(
        bad, FX, FY, CX, CY, basefocal=BF,
        config="--silent --meanshift_kernel_var 0.1 --max_iters 5 "
               "--n_poses_to_sample 2048 --depth_rand_samples 6 "
               "--save_everything",
    )
    assert ret["n_registered"] >= 3

    rig = ret["rigidness"]  # (N, h, w) from save_everything
    mo = MOVING_OBJECT
    # rigidness maps live on the frame-0 pixel grid: check the object's
    # frame-0 footprint (eroded by a margin for trace leakage)
    obj = np.zeros((H, W), bool)
    m = 3
    obj[mo["y"] + m : mo["y"] + mo["h"] - m, mo["x"] + m : mo["x"] + mo["w"] - m] = True
    inside = rig[0][obj].mean()
    outside = rig[0][~obj].mean()
    assert inside < 0.5 * outside, (inside, outside)

    # pose: translation direction must survive the dynamic object
    t_est = ret["poses"][0, 3:6]
    t_true = poses[0, 3:6] / np.linalg.norm(poses[0, 3:6])
    cos = np.dot(t_est, t_true) / (np.linalg.norm(t_est) + 1e-12)
    assert cos > 0.98, cos


@pytest.mark.slow
def test_mono_vo_degraded_trajectory():
    """Full mono pipeline on Fisk-noise + occlusions + dynamic object."""
    from voldor_tpu.slam.system import VOLDOR_SLAM

    n_flows = 8
    poses, flows, depth0, Ts = _scene(n_flows, tx=0.35, seed=3)
    bad = degrade_flows(
        flows, seed=7, noise_scale=1.0, n_occlusions=4,
        moving_object=MOVING_OBJECT,
    )

    slam = VOLDOR_SLAM(mode="mono")
    slam.use_image_info = False
    slam.voldor_user_config = "--n_poses_to_sample 2048 --depth_rand_samples 6"
    slam.set_cam_params(FX, FY, CX, CY)
    slam.flows = [bad[i] for i in range(bad.shape[0])]
    slam.N_FRAMES = bad.shape[0] + 1
    slam.h, slam.w = H, W
    slam.flow_loader_pt = bad.shape[0]
    while slam.process_vo():
        pass

    assert len(slam.frames) == slam.N_FRAMES
    est = np.stack([f.Tcw for f in slam.frames])  # cam->world
    gt = np.linalg.inv(Ts)
    ate = ate_rmse(est.astype(np.float64), gt, with_scale=True)
    extent = float(np.linalg.norm(gt[:, :3, 3] - gt[0, :3, 3], axis=1).max())
    assert ate < 0.05 * extent, (ate, extent)

    T_last_est, T_last_true = est[-1], gt[-1]
    R_err = T_last_est[:3, :3] @ T_last_true[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    assert ang < 3.0, ang


@pytest.mark.slow
def test_stereo_degraded():
    """Stereo mode with Fisk-noisy disparity (holes included) + noisy flows:
    metric scale must still be recovered."""
    poses, flows, depth0, _ = _scene(4)
    bad_flows = degrade_flows(flows, seed=9, noise_scale=0.7, n_occlusions=3)
    bad_disp = degrade_disparity(
        (BF / depth0).astype(np.float32), seed=9, noise_scale=0.5,
        holes_frac=0.05,
    )
    ret = voldor(
        bad_flows, FX, FY, CX, CY, basefocal=BF,
        disparity=bad_disp,
        config="--silent --meanshift_kernel_var 0.1 --disp_delta 1 --delta 0.2 "
               "--max_iters 4 --n_poses_to_sample 2048 --depth_rand_samples 6",
    )
    assert ret["n_registered"] == 4
    # metric translation within 15% relative error under degradation
    t_err = np.linalg.norm(ret["poses"][:, 3:6] - poses[:, 3:6], axis=1)
    t_mag = np.linalg.norm(poses[:, 3:6], axis=1)
    assert np.all(t_err / t_mag < 0.15), t_err / t_mag
    np.testing.assert_allclose(ret["poses"][:, :3], poses[:, :3], atol=0.02)
