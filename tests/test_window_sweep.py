"""Batched (Jacobi) camera-window sweep vs the sequential reference sweep."""

import numpy as np
import jax.numpy as jnp
import pytest

from voldor_tpu.config import VoldorConfig
from voldor_tpu.ops import lie
from voldor_tpu.vo.em import EmParams
from voldor_tpu.vo.pose_step import (
    collect_p3p_instances,
    collect_p3p_instances_all,
)

from synthetic import render_window

H, W = 48, 64
FX = FY = 60.0
CX, CY = W / 2, H / 2


def _norm(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


PLANES = [
    (_norm([0.1, 0.15, 1.0]), 8.0),
    (_norm([-0.45, 0.1, 1.0]), 6.5),
    (_norm([0.3, -0.45, 1.0]), 7.0),
]


def _window(n=5, seed=0):
    rng = np.random.default_rng(seed)
    poses = np.zeros((n, 6), np.float32)
    for f in range(n):
        poses[f, :3] = rng.normal(0, 0.01, 3)
        poses[f, 3:6] = [0.3, 0.02, 0.15]
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)

    def r2R(rv):
        return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))

    flows, depth0, _ = render_window(K, poses, PLANES, H, W, r2R)
    return poses, flows, depth0


@pytest.mark.parametrize("stride", [1, 2])
def test_collect_all_matches_per_frame(rng, stride):
    """collect_p3p_instances_all must reproduce the sequential per-frame
    collect bit-for-bit (same poses): identical validity masks, (p2, p3)
    within f32 rounding."""
    poses, flows, depth0 = _window(5)
    cfg = VoldorConfig(fx=FX, fy=FY, cx=CX, cy=CY, basefocal=30.0)
    p = EmParams.from_config(cfg, False)
    # non-trivial rigidness so the trace-length logic is exercised
    rig = rng.uniform(0.3, 1.0, (5, H, W)).astype(np.float32)
    Rs = lie.so3_exp(jnp.asarray(poses[:, :3]))
    ts = jnp.asarray(poses[:, 3:6])
    kw = dict(
        rigidness_threshold=0.5,
        rigidness_sum_threshold=1.0,
        sample_min_depth=0.1,
        sample_max_depth=1000.0,
        max_trace_on_flow=3,
        sample_stride=stride,
    )
    p2a, p3a, va = collect_p3p_instances_all(
        jnp.asarray(depth0), jnp.asarray(flows), jnp.asarray(rig),
        Rs, ts, jnp.int32(5), p, **kw,
    )
    for i in range(5):
        p2, p3, v = collect_p3p_instances(
            jnp.asarray(depth0), jnp.asarray(flows), jnp.asarray(rig),
            Rs, ts, jnp.int32(i), p, **kw,
        )
        v = np.asarray(v)
        np.testing.assert_array_equal(v, np.asarray(va[i]))
        np.testing.assert_allclose(
            np.asarray(p2)[v], np.asarray(p2a[i])[v], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(p3)[v], np.asarray(p3a[i])[v], atol=1e-5
        )


def test_collect_all_respects_active_n(rng):
    """Frames >= active_n must come out invalid."""
    poses, flows, depth0 = _window(5)
    cfg = VoldorConfig(fx=FX, fy=FY, cx=CX, cy=CY, basefocal=30.0)
    p = EmParams.from_config(cfg, False)
    rig = np.ones((5, H, W), np.float32)
    Rs = lie.so3_exp(jnp.asarray(poses[:, :3]))
    ts = jnp.asarray(poses[:, 3:6])
    _, _, va = collect_p3p_instances_all(
        jnp.asarray(depth0), jnp.asarray(flows), jnp.asarray(rig),
        Rs, ts, jnp.int32(3), p,
        rigidness_threshold=0.5, rigidness_sum_threshold=1.0,
        sample_min_depth=0.1, sample_max_depth=1000.0,
        max_trace_on_flow=3,
    )
    va = np.asarray(va)
    assert va[:3].any(axis=(1, 2)).all()
    assert not va[3:].any()


@pytest.mark.slow
def test_hybrid_sweep_matches_seq_solve():
    """Full fused solve: the hybrid schedule (seq on iter 1, jacobi after)
    must land on the same window poses as the sequential solve on a clean
    window (mono gauge: compare rotation + translation direction)."""
    from voldor_tpu.vo.api import voldor

    poses, flows, depth0 = _window(4, seed=3)
    base = ("--silent --meanshift_kernel_var 0.1 --max_iters 5 "
            "--n_poses_to_sample 2048 --depth_rand_samples 6")
    ret_seq = voldor(flows, FX, FY, CX, CY, basefocal=30.0, config=base)
    ret_hyb = voldor(flows, FX, FY, CX, CY, basefocal=30.0,
                     config=base + " --pose_window_sweep hybrid")
    assert ret_seq["n_registered"] == ret_hyb["n_registered"] == 4
    for ret in (ret_seq, ret_hyb):
        t_est = ret["poses"][:, 3:6]
        t_true = poses[:, 3:6]
        cos = np.sum(t_est * t_true, 1) / (
            np.linalg.norm(t_est, axis=1) * np.linalg.norm(t_true, axis=1)
            + 1e-12
        )
        assert cos.min() > 0.999, cos
        np.testing.assert_allclose(ret["poses"][:, :3], poses[:, :3], atol=3e-3)
    # and against each other (same fixed point, looser than vs truth)
    np.testing.assert_allclose(
        ret_hyb["poses"][:, :3], ret_seq["poses"][:, :3], atol=5e-3
    )
