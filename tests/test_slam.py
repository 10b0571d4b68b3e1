"""End-to-end SLAM-layer tests on a synthetic monocular sequence."""

import numpy as np
import jax.numpy as jnp
import pytest

from voldor_tpu.ops import lie
from voldor_tpu.slam.system import VOLDOR_SLAM
from voldor_tpu.slam.slam_utils import T44_to_T6, T6_to_T44, eval_covisibility

from synthetic import render_window

H, W = 72, 96
FX = FY = 80.0
CX, CY = W / 2, H / 2


def _norm(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


# A richer scene (5 planes with diverse normals): keeps point-to-plane
# alignment fully constrained in every keyframe crop, so falign covariances
# are full-rank — the rank gate itself is exercised in test_falign.
PLANES = [
    (_norm([0.1, 0.15, 1.0]), 8.0),
    (_norm([-0.45, 0.1, 1.0]), 6.5),
    (_norm([0.3, -0.45, 1.0]), 7.0),
    (_norm([0.55, 0.35, 1.0]), 7.5),
    (_norm([-0.2, -0.5, 1.0]), 6.8),
]


def _make_sequence(n_flows=8, tx=0.45, flow_noise=0.0):
    rng = np.random.default_rng(3)
    poses = np.zeros((n_flows, 6), np.float32)
    for f in range(n_flows):
        poses[f, :3] = rng.normal(0, 0.008, 3)
        poses[f, 3:6] = [tx + 0.03 * rng.normal(), 0.03 * rng.normal(), 0.18]
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)

    def r2R(rv):
        return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))

    flows, depth0, Ts = render_window(K, poses, PLANES, H, W, r2R)
    if flow_noise > 0:
        flows = flows + rng.normal(0, flow_noise, flows.shape).astype(np.float32)
    return poses, flows, depth0, Ts


def _make_slam(flows):
    slam = VOLDOR_SLAM(mode="mono")
    slam.use_image_info = False
    slam.voldor_user_config = "--n_poses_to_sample 2048 --depth_rand_samples 6"
    slam.set_cam_params(FX, FY, CX, CY)
    # inject flows directly instead of running loader threads
    slam.flows = [flows[i] for i in range(flows.shape[0])]
    slam.N_FRAMES = flows.shape[0] + 1
    slam.h, slam.w = H, W
    slam.flow_loader_pt = flows.shape[0]
    return slam


@pytest.mark.slow
def test_slam_mono_vo_trajectory():
    poses, flows, depth0, Ts = _make_sequence(8)
    slam = _make_slam(flows)

    while slam.process_vo():
        pass

    assert len(slam.frames) == slam.N_FRAMES
    assert len(slam.kf_ids) >= 1
    assert slam.frames[slam.kf_ids[0]].depth is not None

    # Trajectory parity up to the monocular gauge: compare relative rotation
    # and direction of translation between first and last frame.
    # Frame.Tcw stores cam->world (KITTI convention, see frame.py note).
    T_last_est = slam.frames[int(slam.N_FRAMES) - 1].Tcw
    T_last_true = np.linalg.inv(Ts[-1])  # cam->world
    R_err = T_last_est[:3, :3] @ T_last_true[:3, :3].T
    ang = np.degrees(
        np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1))
    )
    assert ang < 2.0  # degrees over the whole sequence

    t_est = T_last_est[:3, 3]
    t_true = T_last_true[:3, 3]
    cos = np.dot(t_est, t_true) / (
        np.linalg.norm(t_est) * np.linalg.norm(t_true) + 1e-12
    )
    assert cos > 0.995  # translation direction matches (scale is free)

    # edges: one per consumed frame transition
    assert len(slam.edges) == slam.N_FRAMES - 1
    assert all(np.all(np.isfinite(e.pose_covar)) for e in slam.edges)


@pytest.mark.slow
def test_slam_mono_local_links_and_pgo():
    # gentler motion keeps keyframe overlap above the visibility gate; a
    # touch of flow noise keeps residuals away from the robustifier's
    # FLT_EPSILON passthrough so falign covariances stay full-rank (exactly
    # converged noise-free data zeroes the Jacobians — the reference's
    # sqrt-Cauchy has the same property, align_frame.cu:392)
    poses, flows, depth0, Ts = _make_sequence(8, tx=0.3, flow_noise=0.05)
    slam = _make_slam(flows)
    # the synthetic field of view is small; accept lower keyframe overlap
    slam.mp_link_visibility_thresh = 0.6
    while slam.process_vo():
        pass

    kfs = slam.kf_ids[:2] if len(slam.kf_ids) >= 2 else [0, 2]
    if len(slam.kf_ids) < 2:
        pytest.skip("sequence produced fewer than 2 keyframes")
    n_edges_before = len(slam.edges)
    slam.establish_local_links(kfs)
    # falign on a consistent map should pass the gates and add edges
    assert len(slam.edges) > n_edges_before

    # PGO should run and keep the trajectory consistent
    T_before = slam.frames[-1].Tcw.copy()
    slam.solve_pgo()
    T_after = slam.frames[-1].Tcw
    assert np.all(np.isfinite(T_after))
    # the map was already consistent; PGO must not blow it up
    assert np.linalg.norm(T_after[:3, 3] - T_before[:3, 3]) < 0.5


def test_save_poses_formats(tmp_path):
    poses, flows, depth0, Ts = _make_sequence(4)
    slam = _make_slam(flows)
    while slam.process_vo():
        pass
    p_kitti = tmp_path / "poses_kitti.txt"
    slam.save_poses(str(p_kitti), format="KITTI")
    lines = p_kitti.read_text().strip().split("\n")
    assert len(lines) == int(slam.N_FRAMES)
    assert len(lines[0].split()) == 12

    p_ta = tmp_path / "poses_ta.txt"
    slam.save_poses(str(p_ta), format="TartanAir")
    lines = p_ta.read_text().strip().split("\n")
    assert len(lines[0].split()) == 7

    d = tmp_path / "depths"
    slam.save_depth_maps(str(d))
    assert len(list(d.glob("*_depth.npy"))) == len(slam.kf_ids)


@pytest.mark.slow
def test_links_batch_matches_single():
    """establish_links_batch (many pairs, one falign dispatch, duplicated
    frames + block-diagonal connectivity) must produce the same edges as
    the one-pair-at-a-time path."""
    poses, flows, depth0, Ts = _make_sequence(14, tx=0.35, flow_noise=0.05)
    slam = _make_slam(flows)
    slam.mp_link_visibility_thresh = 0.6
    while slam.process_vo():
        pass
    if len(slam.kf_ids) < 3:
        pytest.skip("sequence produced fewer than 3 keyframes")
    pairs = [
        (slam.kf_ids[0], slam.kf_ids[1]),
        (slam.kf_ids[1], slam.kf_ids[2]),
    ]
    n0 = len(slam.edges)
    slam.establish_links_batch(pairs, kind="local")
    batched = slam.edges[n0:]
    n1 = len(slam.edges)
    slam.establish_local_links(list(pairs[0]))
    slam.establish_local_links(list(pairs[1]))
    single = slam.edges[n1:]
    assert len(batched) == len(single) > 0
    for b, s in zip(batched, single):
        assert (b.fid1, b.fid2) == (s.fid1, s.fid2)
        # the batched LM shares one convergence flag across pairs, so the
        # iterate can stop a step earlier/later than the single-pair solve
        np.testing.assert_allclose(b.pose, s.pose, rtol=0.05, atol=5e-3)
        np.testing.assert_allclose(
            np.diag(b.pose_covar), np.diag(s.pose_covar), rtol=0.3, atol=1e-6
        )


@pytest.mark.slow
def test_slam_engine_resize_factor_fallback():
    """A user config carrying --resize_factor must still run through the
    pipelined SLAM driver: the flows entry falls back to a host stack (the
    engine's array path resizes), instead of the device-handle list path
    which hard-rejects resize (ADVICE r4)."""
    poses, flows, depth0, Ts = _make_sequence(6)
    slam = _make_slam(flows)
    slam.voldor_user_config += " --resize_factor 0.5"

    steps = 0
    while slam.process_vo() and steps < 4:
        steps += 1
    assert len(slam.frames) >= 2
    for f in slam.frames:
        assert np.all(np.isfinite(f.Tcw))
