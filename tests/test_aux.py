"""Auxiliary subsystems: checkpoint/resume, save_result, KITTI ground,
profiling, config print."""

import numpy as np
import pytest

from voldor_tpu.slam.checkpoint import load_map, save_map
from voldor_tpu.slam.system import VOLDOR_SLAM
from voldor_tpu.utils.profiling import StageTimer
from voldor_tpu.vo.kitti_ground import estimate_kitti_ground

from test_slam import _make_sequence, _make_slam, FX, FY, CX, CY, H, W


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    poses, flows, depth0, Ts = _make_sequence(6)
    slam = _make_slam(flows)
    # run half the sequence
    for _ in range(2):
        if not slam.process_vo():
            break
    ckpt = str(tmp_path / "map.npz")
    save_map(slam, ckpt)

    slam2 = _make_slam(flows)
    load_map(slam2, ckpt)
    assert len(slam2.frames) == len(slam.frames)
    assert slam2.fid_cur == slam.fid_cur
    assert slam2.kf_ids == slam.kf_ids
    np.testing.assert_array_equal(slam2.Twc_cur, slam.Twc_cur)
    np.testing.assert_array_equal(
        slam2.frames[0].depth, slam.frames[0].depth
    )
    for e2, e1 in zip(slam2.edges, slam.edges):
        np.testing.assert_array_equal(e2.pose, e1.pose)
        np.testing.assert_array_equal(e2.pose_covar, e1.pose_covar)

    # resumed instance must be able to continue VO to the end
    while slam2.process_vo():
        pass
    assert len(slam2.frames) == int(slam2.N_FRAMES)


def test_save_result(tmp_path):
    from voldor_tpu.config import VoldorConfig
    from voldor_tpu.vo.engine import VoldorEngine, save_result

    poses, flows, depth0, Ts = _make_sequence(3)
    cfg = VoldorConfig(fx=FX, fy=FY, cx=CX, cy=CY, basefocal=40.0)
    cfg.silent = True
    cfg.save_everything = True
    cfg.n_poses_to_sample = 1024
    cfg.depth_rand_samples = 4
    e = VoldorEngine(cfg)
    e.init(flows)
    e.solve()
    out = tmp_path / "result"
    save_result(e, str(out))
    assert (out / "depth.npy").exists()
    assert (out / "camera_pose.txt").exists()
    assert (out / "rigidness_sum.npy").exists()
    assert (out / "rigidness-0.npy").exists()
    lines = (out / "camera_pose.txt").read_text().strip().split("\n")
    assert len(lines) == e.n_flows and len(lines[0].split()) == 6


def test_kitti_ground_plane():
    # camera looking at a tilted ground plane: n.X = d
    h, w = 64, 96
    K = np.array([[80.0, 0, 48], [0, 80.0, 32], [0, 0, 1]], np.float32)
    n = np.asarray([0.0, -0.9486833, -0.31622777])  # tilted "up" normal
    d = -1.5  # camera 1.5 above ground (n.X = d with n pointing up-ish)
    ys, xs = np.mgrid[0:h, 0:w]
    rays = np.stack(
        [(xs - 48) / 80.0, (ys - 32) / 80.0, np.ones_like(xs, np.float64)], -1
    )
    denom = rays @ n
    depth = np.where(np.abs(denom) > 1e-6, d / denom, 1e4).astype(np.float32)
    depth = np.clip(depth, 0.1, 100.0)

    g = estimate_kitti_ground(depth, K, roi_frac=0.4, holo_width=3)
    assert abs(g.height - 1.5) < 0.1
    # normal points at the viewer (negative dot with rays)
    cosang = abs(np.dot(g.normal, n))
    assert cosang > 0.98
    assert g.confidence > 0.3


def test_stage_timer():
    t = StageTimer(enabled=True)
    with t.stage("a"):
        sum(range(1000))
    with t.stage("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()
    t2 = StageTimer(enabled=False)
    with t2.stage("x"):
        pass
    assert not t2.totals


def test_config_to_string_parse_print(capsys):
    from voldor_tpu.config import VoldorConfig

    cfg = VoldorConfig.from_string("--silent --lambda 0.2 --max_iters 3")
    s = cfg.to_string()
    assert "--lambda 0.2" in s and "--silent" in s and "--max_iters 3" in s


def test_gl_viewer_headless_gating():
    """GLViewer must gate cleanly when no display exists; the data path is
    the shared VOLDOR_Viewer (rebuild_points / save_ply)."""
    import os

    from voldor_tpu.slam.gl_viewer import GLViewer

    if not os.environ.get("DISPLAY"):
        assert GLViewer.available() is False
    # constructible regardless (only start() needs GL)
    from voldor_tpu.slam.system import VOLDOR_SLAM

    slam = VOLDOR_SLAM(mode="mono")
    v = GLViewer(slam)
    v._on_key(b"w", 0, 0)
    assert v.point_size == 3
    v._on_click(3, 0, 0, 0)  # scroll zoom in
    assert v.view_box < 30.0
    v._on_motion(5, 5)


def test_pyvoldor_shims_import():
    """Reference client code imports pyvoldor_{vo,full} and calls the three
    entry points by name (pyvoldor_full.pyx:14-198). The shims must expose
    exactly those callables."""
    import pyvoldor_full
    import pyvoldor_vo

    assert callable(pyvoldor_full.voldor)
    assert callable(pyvoldor_full.falign)
    assert callable(pyvoldor_full.pgo)
    assert callable(pyvoldor_vo.voldor)
    # the full module's voldor IS the vo module's voldor
    assert pyvoldor_full.voldor is pyvoldor_vo.voldor

    # smoke: pgo on a 2-vertex chain returns (N, 7) unchanged-ish
    poses = np.zeros((2, 7), np.float32)
    poses[1, 3] = 1.0
    edges_idx = np.asarray([[0, 1]], np.int32)
    edges_pose = np.zeros((1, 7), np.float32)
    edges_pose[0, 3] = 1.0
    out = pyvoldor_full.pgo(poses, edges_idx, edges_pose)
    assert out.shape == (2, 7)
    # edge convention: begin-frame points map into end-frame coords
    # (pgo/solver.py residual; vertex 0 gauge-fixed at the origin)
    assert np.all(np.isfinite(out))
    assert np.allclose(out[0], 0.0, atol=1e-5)
