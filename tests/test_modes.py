"""Stereo / depth-prior VO modes + loader/viewer plumbing."""

import os
import threading

import numpy as np
import jax.numpy as jnp
import pytest

from voldor_tpu.ops import lie
from voldor_tpu.utils.flow_io import load_flow, save_flow
from voldor_tpu.vo.api import voldor

from synthetic import render_window

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
]


def _scene(n=4):
    rng = np.random.default_rng(11)
    poses = np.zeros((n, 6), np.float32)
    for f in range(n):
        poses[f, :3] = rng.normal(0, 0.01, 3)
        poses[f, 3:6] = [0.4, 0.02, 0.2]
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)

    def r2R(rv):
        return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))

    flows, depth0, Ts = render_window(K, poses, PLANES, H, W, r2R)
    return poses, flows, depth0


def test_stereo_mode_recovers_metric_scale():
    """With a disparity prior the solve is metric — translations must come
    out at TRUE scale (no mono gauge normalization)."""
    poses, flows, depth0 = _scene(4)
    disparity = (BF / depth0).astype(np.float32)
    ret = voldor(
        flows, FX, FY, CX, CY, basefocal=BF,
        disparity=disparity,
        config="--silent --meanshift_kernel_var 0.1 --disp_delta 1 --delta 0.2 "
               "--max_iters 4 --n_poses_to_sample 2048 --depth_rand_samples 6",
    )
    assert ret["n_registered"] == 4
    np.testing.assert_allclose(ret["poses"][:, :3], poses[:, :3], atol=8e-3)
    np.testing.assert_allclose(ret["poses"][:, 3:6], poses[:, 3:6], atol=0.05)
    inner = np.s_[8:-8, 8:-8]
    rel = np.abs(ret["depth"][inner] - depth0[inner]) / depth0[inner]
    assert np.median(rel) < 0.05
    assert ret["depth_conf"][inner].mean() > 0.5


def test_depth_prior_mode():
    """General depth priors (the temporal/spatial-KF path): prior given in a
    shifted camera with its relative pose."""
    poses, flows, depth0 = _scene(4)
    # prior camera = frame0 itself (identity pose), mild corruption
    prior = depth0 * 1.0
    ret = voldor(
        flows, FX, FY, CX, CY, basefocal=BF,
        depth_priors=prior[None],
        depth_prior_poses=np.zeros((1, 6), np.float32),
        depth_prior_pconfs=np.ones((1, H, W), np.float32),
        config="--silent --meanshift_kernel_var 0.1 --delta 1.5 --max_iters 4 "
               "--n_poses_to_sample 2048 --depth_rand_samples 6",
    )
    assert ret["n_registered"] == 4
    # metric scale anchored by the prior
    np.testing.assert_allclose(ret["poses"][:, 3:6], poses[:, 3:6], atol=0.06)


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.normal(0, 3, (32, 48, 2)).astype(np.float32)
    p = str(tmp_path / "t.flo")
    save_flow(p, flow)
    back = load_flow(p)
    np.testing.assert_array_equal(back, flow)


@pytest.mark.slow
def test_demo_pipeline_with_loaders(tmp_path):
    """flow_loader from .flo files on disk -> VO -> PLY export."""
    from voldor_tpu.slam.system import VOLDOR_SLAM
    from voldor_tpu.slam.viewer import VOLDOR_Viewer

    poses, flows, depth0 = _scene(4)
    flow_dir = tmp_path / "flows"
    flow_dir.mkdir()
    for i in range(flows.shape[0]):
        save_flow(str(flow_dir / f"{i:06d}.flo"), flows[i])

    slam = VOLDOR_SLAM(mode="mono")
    slam.use_image_info = False
    slam.voldor_user_config = "--n_poses_to_sample 2048 --depth_rand_samples 6"
    slam.set_cam_params(FX, FY, CX, CY)
    t = threading.Thread(target=slam.flow_loader, kwargs={"flow_path": str(flow_dir)})
    t.start()
    slam.flow_loader_sync(0, block_when_uninit=True)
    while slam.process_vo():
        pass
    t.join()
    assert len(slam.frames) == int(slam.N_FRAMES)

    viewer = VOLDOR_Viewer(slam)
    ply = tmp_path / "map.ply"
    viewer.save_ply(str(ply))
    text = ply.read_text()
    n_pts = int(text.split("element vertex ")[1].split("\n")[0])
    assert n_pts > 100
    assert len(viewer.trajectory()) == int(slam.N_FRAMES)


def test_mono_scaled_fit_recovers_disparity_scale(rng):
    """_mono_scaled_fit (voldor_slam.py:472-492): Huber fit of predicted vs
    observed disparity must rescale depth, translations, and covariances by
    the inverse fitted coefficient, robust to outliers."""
    from voldor_tpu.slam.system import VOLDOR_SLAM

    slam = VOLDOR_SLAM(mode="mono-scaled")
    slam.set_cam_params(FX, FY, CX, CY, BF)
    slam.fid_cur = 0

    depth = rng.uniform(3.0, 12.0, (H, W)).astype(np.float32)
    true_scale = 0.5  # observed disparity is 2x predicted -> scale = 1/2
    disp = (slam.basefocal / (depth * true_scale)).astype(np.float32)
    # 10% gross outliers: the Huber loss must shrug these off
    n_out = int(0.1 * disp.size)
    out_idx = rng.choice(disp.size, n_out, replace=False)
    disp.reshape(-1)[out_idx] *= rng.uniform(5.0, 20.0, n_out).astype(np.float32)
    slam.disps = [disp]

    poses = rng.normal(0, 0.2, (3, 6)).astype(np.float32)
    covar = np.tile(np.eye(6, dtype=np.float32), (3, 1, 1))
    vo_ret = {
        "depth": depth.copy(),
        "depth_conf": np.full((H, W), 0.9, np.float32),
        "poses": poses.copy(),
        "poses_covar": covar.copy(),
    }
    slam._mono_scaled_fit(vo_ret)

    np.testing.assert_allclose(vo_ret["depth"], depth * true_scale, rtol=0.05)
    np.testing.assert_allclose(vo_ret["poses"][:, 3:6], poses[:, 3:6] * true_scale, rtol=0.05)
    np.testing.assert_allclose(vo_ret["poses"][:, :3], poses[:, :3])  # rvec untouched
    # covar rows AND cols of the translation block get scaled
    np.testing.assert_allclose(
        vo_ret["poses_covar"][:, 3:6, 3:6],
        covar[:, 3:6, 3:6] * true_scale**2,
        rtol=0.05,
    )
