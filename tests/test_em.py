"""EM-core and engine tests against the synthetic plane oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voldor_tpu.config import VoldorConfig
from voldor_tpu.ops import lie
from voldor_tpu.vo import em
from voldor_tpu.vo.engine import VoldorEngine
from voldor_tpu.vo.pose_step import collect_p3p_instances, optimize_camera_pose

from synthetic import render_window

H, W = 72, 96
K = np.array([[80.0, 0, 48.0], [0, 80.0, 36.0], [0, 0, 1]], np.float32)


def _norm(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


# A wedge of three planes: non-coplanar structure keeps the 8-point
# essential-matrix bootstrap non-degenerate.
PLANES = [
    (_norm([0.1, 0.15, 1.0]), 8.0),
    (_norm([-0.35, 0.1, 1.0]), 6.5),
    (_norm([0.3, -0.25, 1.0]), 7.0),
]


def _rvec_to_R(rv):
    return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))


def _window(n=3, tx=0.5, tz=0.2):
    """Sideways-dominant motion so flows sit in the Fisk model's calibrated
    range (~4-8 px; magnitudes below MIN_OBS_FMAG=2px after the EST_RF
    rescale are intentionally treated as uninformative by the model,
    residual_model.h:11)."""
    poses = np.zeros((n, 6), np.float32)
    rng = np.random.default_rng(7)
    for f in range(n):
        poses[f, :3] = rng.normal(0, 0.01, 3)
        poses[f, 3:6] = [tx + 0.05 * rng.normal(), 0.05 * rng.normal(), tz]
    flows, depth0, Ts = render_window(K, poses, PLANES, H, W, _rvec_to_R)
    return poses, flows, depth0, Ts


def _params(cfg=None):
    cfg = cfg or VoldorConfig(fx=80.0, fy=80.0, cx=48.0, cy=36.0, basefocal=40.0)
    return em.EmParams.from_config(cfg, has_disparity=False)


def _pose_mats(poses):
    Rs = np.stack([_rvec_to_R(p[:3]) for p in poses])
    return jnp.asarray(Rs), jnp.asarray(poses[:, 3:6])


def test_rigidness_near_one_on_exact_flow():
    poses, flows, depth0, _ = _window()
    Rs, ts = _pose_mats(poses)
    rig = em.update_rigidness(
        jnp.asarray(depth0), jnp.asarray(flows), Rs, ts, jnp.int32(3), _params()
    )
    rig = np.asarray(rig)
    # interior pixels that stay in bounds should be confidently rigid
    inner = rig[:, 8:-8, 8:-8]
    assert np.mean(inner > 0.8) > 0.95
    # inactive-frame masking
    rig2 = em.update_rigidness(
        jnp.asarray(depth0), jnp.asarray(flows), Rs, ts, jnp.int32(1), _params()
    )
    assert np.all(np.asarray(rig2)[1:] == 0)


def test_rigidness_low_on_corrupted_flow():
    poses, flows, depth0, _ = _window()
    flows_bad = flows.copy()
    flows_bad[0, 20:40, 30:60] += 12.0  # a "dynamic object"
    Rs, ts = _pose_mats(poses)
    rig = np.asarray(
        em.update_rigidness(
            jnp.asarray(depth0), jnp.asarray(flows_bad), Rs, ts, jnp.int32(3), _params()
        )
    )
    assert np.mean(rig[0, 22:38, 32:58]) < 0.1
    assert np.mean(rig[0, 50:64, 8:20]) > 0.8


def test_cost_map_minimized_at_true_depth():
    poses, flows, depth0, _ = _window()
    Rs, ts = _pose_mats(poses)
    p = _params()
    rig = jnp.ones((3, H, W), jnp.float32)
    zeros = jnp.zeros((0, H, W), jnp.float32)
    dpR = jnp.zeros((0, 3, 3))
    dpt = jnp.zeros((0, 3))

    def cost(d):
        c = em.compute_cost_map(
            jnp.asarray(d), jnp.asarray(flows), rig, Rs, ts,
            None, None, None, dpR, dpt, jnp.int32(3), p,
        )
        return np.asarray(c)

    c_true = cost(depth0)
    c_off = cost(depth0 * 1.3)
    inner = np.s_[8:-8, 8:-8]
    assert np.median(c_true[inner]) < np.median(c_off[inner])
    assert np.mean((c_true < c_off)[inner]) > 0.9


def test_optimize_depth_recovers_from_wrong_init():
    poses, flows, depth0, _ = _window()
    Rs, ts = _pose_mats(poses)
    p = _params()
    rig = em.update_rigidness(jnp.asarray(depth0), jnp.asarray(flows), Rs, ts, jnp.int32(3), p)
    dpR = jnp.zeros((0, 3, 3))
    dpt = jnp.zeros((0, 3))
    depth = jnp.full((H, W), 2.5, jnp.float32)  # badly wrong

    def cost_of(d):
        return em.compute_cost_map(
            d, jnp.asarray(flows), rig, Rs, ts, None, None, None, dpR, dpt,
            jnp.int32(3), p,
        )

    cost = cost_of(depth)
    key = jax.random.PRNGKey(0)
    for it in range(3):
        depth, cost = em.optimize_depth(
            depth, cost, jnp.asarray(flows), rig, Rs, ts, None, None, None,
            dpR, dpt, jnp.int32(3), p, jax.random.fold_in(key, it),
            n_rand_samples=6, global_prop_step=8, local_prop_width=16,
            range_factor=1.0, local_prop_mode="jump",
        )
    inner = np.s_[8:-8, 8:-8]
    rel = np.abs(np.asarray(depth)[inner] - depth0[inner]) / depth0[inner]
    assert np.median(rel) < 0.05


def test_optimize_depth_monotone_cost():
    poses, flows, depth0, _ = _window()
    Rs, ts = _pose_mats(poses)
    p = _params()
    rig = jnp.ones((3, H, W), jnp.float32)
    dpR = jnp.zeros((0, 3, 3))
    dpt = jnp.zeros((0, 3))
    depth = jnp.asarray(depth0 * (1 + 0.3 * np.random.default_rng(3).normal(size=(H, W)))).astype(jnp.float32)
    depth = jnp.maximum(depth, 0.5)
    cost0 = em.compute_cost_map(depth, jnp.asarray(flows), rig, Rs, ts, None, None, None, dpR, dpt, jnp.int32(3), p)
    d1, c1 = em.optimize_depth(
        depth, cost0, jnp.asarray(flows), rig, Rs, ts, None, None, None,
        dpR, dpt, jnp.int32(3), p, jax.random.PRNGKey(1),
        n_rand_samples=4, global_prop_step=8, local_prop_width=8,
        range_factor=1.0, local_prop_mode="jump",
    )
    f0 = np.asarray(cost0)
    f1 = np.asarray(c1)
    ok = np.isfinite(f0) & np.isfinite(f1)
    assert np.all(f1[ok] <= f0[ok] + 1e-5)  # accept-only updates never worsen
    # and the returned cost matches a fresh evaluation of the returned depth
    c_check = em.compute_cost_map(d1, jnp.asarray(flows), rig, Rs, ts, None, None, None, dpR, dpt, jnp.int32(3), p)
    np.testing.assert_allclose(np.asarray(c_check)[ok], f1[ok], rtol=1e-4, atol=1e-5)


def test_collect_p3p_instances_exact():
    poses, flows, depth0, Ts = _window()
    Rs, ts = _pose_mats(poses)
    p = _params()
    rig = jnp.ones((3, H, W), jnp.float32)
    p2, p3, valid = collect_p3p_instances(
        jnp.asarray(depth0), jnp.asarray(flows), rig, Rs, ts, jnp.int32(0), p,
        rigidness_threshold=0.5, rigidness_sum_threshold=1.0,
        sample_min_depth=0.1, sample_max_depth=1000.0, max_trace_on_flow=3,
    )
    p2, p3, valid = np.asarray(p2), np.asarray(p3), np.asarray(valid)
    assert valid.mean() > 0.6
    # p3 should be the frame-0 backprojection (active_idx=0: no transform)
    ys, xs = np.mgrid[0:H, 0:W]
    rays = np.stack([xs, ys, np.ones_like(xs)], -1) @ np.linalg.inv(K).T
    X0 = rays * depth0[..., None]
    np.testing.assert_allclose(p3[valid], X0[valid], rtol=1e-4, atol=1e-4)
    # p2 = pixel traced along flow 0 = exact projection into frame 1
    X1 = X0 @ np.asarray(_rvec_to_R(poses[0, :3])).T + poses[0, 3:6]
    u1 = K[0, 0] * X1[..., 0] / X1[..., 2] + K[0, 2]
    v1 = K[1, 1] * X1[..., 1] / X1[..., 2] + K[1, 2]
    np.testing.assert_allclose(p2[valid][:, 0], u1[valid], atol=0.05)
    np.testing.assert_allclose(p2[valid][:, 1], v1[valid], atol=0.05)


def test_pose_step_recovers_pose():
    poses, flows, depth0, _ = _window()
    p = _params()
    rig = jnp.ones((3, H, W), jnp.float32)
    res = optimize_camera_pose(
        jnp.asarray(depth0), jnp.asarray(flows), rig,
        jnp.zeros((3, 6)), jnp.zeros((3, 6, 6)),
        jnp.int32(0), jnp.bool_(False), jnp.bool_(True),
        jnp.uint32(5), p,
        n_poses_to_sample=2048,
    )
    assert bool(res.success)
    got = np.asarray(res.poses6[0])
    np.testing.assert_allclose(got[:3], poses[0, :3], atol=5e-3)
    np.testing.assert_allclose(got[3:6], poses[0, 3:6], atol=2e-2)
    # untouched rows stay zero
    assert np.all(np.asarray(res.poses6[1:]) == 0)
    # covariance present and PSD-ish
    cov = np.asarray(res.pose_covars[0])
    assert np.all(np.isfinite(cov))
    assert np.all(np.diag(cov) >= 0)
    # On noise-free data the fitted mode is near-degenerate, so the 3-sigma
    # inlier fraction is small; it must still clear the engine's truncation
    # threshold (trunc_sample_density = 0.001, config.h:54).
    assert float(res.pose_density) > 0.003


@pytest.mark.slow
def test_engine_mono_end_to_end():
    poses, flows, depth0, _ = _window(n=3, tz=0.3)
    cfg = VoldorConfig(fx=80.0, fy=80.0, cx=48.0, cy=36.0, basefocal=40.0)
    cfg.silent = True
    cfg.max_iters = 4
    cfg.n_poses_to_sample = 2048
    cfg.depth_rand_samples = 6
    cfg.depth_local_prop_width = 16
    engine = VoldorEngine(cfg)
    engine.init(flows)
    iters = engine.solve()
    assert iters >= 1
    assert engine.n_flows == 3

    # mono gauge: mean ||t|| = 1; compare against similarly-normalized truth
    t_true = poses[:, 3:6]
    s = 3 / np.linalg.norm(t_true, axis=1).sum()
    np.testing.assert_allclose(engine.poses[:, :3], poses[:, :3], atol=8e-3)
    np.testing.assert_allclose(engine.poses[:, 3:6], t_true * s, atol=0.05)
    # depth up to the same scale
    inner = np.s_[8:-8, 8:-8]
    rel = np.abs(np.asarray(engine.depth)[inner] - depth0[inner] * s) / (depth0[inner] * s)
    assert np.median(rel) < 0.08
    conf = engine.depth_confidence()
    assert np.mean(conf[inner] > 0.5) > 0.9


def test_optimize_depth_batched_recovers():
    """The batched-proposal path (Pallas fast path's driver) must converge
    like the sequential one."""
    poses, flows, depth0, _ = _window()
    Rs, ts = _pose_mats(poses)
    p = _params()
    rig = em.update_rigidness(jnp.asarray(depth0), jnp.asarray(flows), Rs, ts, jnp.int32(3), p)
    track, tinb = em.precompute_obs_tracks(jnp.asarray(flows), jnp.int32(3), p)

    def batch_cost_fn(cands):
        return jax.vmap(
            lambda c: em.compute_cost_map_tracked(
                c, track, tinb, rig, Rs, ts, None, jnp.int32(3), p
            )
        )(cands)

    depth = jnp.full((H, W), 2.5, jnp.float32)
    cost = batch_cost_fn(depth[None])[0]
    key = jax.random.PRNGKey(0)
    for it in range(3):
        depth, cost = em.optimize_depth_batched(
            depth, cost, batch_cost_fn, jax.random.fold_in(key, it),
            n_rand_samples=6, global_prop_step=8, local_prop_width=16,
            range_factor=1.0,
        )
    inner = np.s_[8:-8, 8:-8]
    rel = np.abs(np.asarray(depth)[inner] - depth0[inner]) / depth0[inner]
    assert np.median(rel) < 0.05
    # cost/depth consistency
    c_check = batch_cost_fn(depth[None])[0]
    ok = np.isfinite(np.asarray(cost))
    np.testing.assert_allclose(np.asarray(c_check)[ok], np.asarray(cost)[ok], rtol=1e-4, atol=1e-5)


def test_exact_local_prop_mode_converges():
    """The bit-faithful sequential chunk-scan propagation (parity mode for
    the reference's width-32 serial chains, optimize_depth.cu:237-267) must
    converge like the jump-flooding default."""
    poses, flows, depth0, _ = _window()
    Rs, ts = _pose_mats(poses)
    p = _params()
    rig = em.update_rigidness(jnp.asarray(depth0), jnp.asarray(flows), Rs, ts, jnp.int32(3), p)
    dpR = jnp.zeros((0, 3, 3))
    dpt = jnp.zeros((0, 3))
    depth = jnp.full((H, W), 2.5, jnp.float32)

    def cost_of(d):
        return em.compute_cost_map(
            d, jnp.asarray(flows), rig, Rs, ts, None, None, None, dpR, dpt,
            jnp.int32(3), p,
        )

    cost = cost_of(depth)
    key = jax.random.PRNGKey(0)
    for it in range(3):
        depth, cost = em.optimize_depth(
            depth, cost, jnp.asarray(flows), rig, Rs, ts, None, None, None,
            dpR, dpt, jnp.int32(3), p, jax.random.fold_in(key, it),
            n_rand_samples=6, global_prop_step=8, local_prop_width=8,
            range_factor=1.0, local_prop_mode="exact",
        )
    inner = np.s_[8:-8, 8:-8]
    rel = np.abs(np.asarray(depth)[inner] - depth0[inner]) / depth0[inner]
    assert np.median(rel) < 0.06


def test_stack_flows_handle_and_host_paths_bit_identical():
    """The upload-ahead cache path (device f16 handles) must produce
    bit-identical flows to the plain host upload (_put_f16) — the VO
    solve's numerics must not depend on which route a window's flows took
    (vo/engine.py _stack_flows)."""
    import jax.numpy as jnp

    from voldor_tpu.vo.engine import _put_f16, _stack_flows

    rng = np.random.default_rng(11)
    flows = rng.normal(0, 7, (3, 24, 32, 2)).astype(np.float32)

    host = _put_f16(flows)
    handles = [jnp.asarray(flows[0].astype(np.float16)), flows[1], flows[2]]
    mixed = _stack_flows(handles, compress=True)
    np.testing.assert_array_equal(np.asarray(host), np.asarray(mixed))

    # f32 transfer mode: handles arrive uncompressed, exact passthrough
    host32 = _stack_flows([flows[0], flows[1], flows[2]], compress=False)
    mixed32 = _stack_flows(
        [jnp.asarray(flows[0]), flows[1], flows[2]], compress=False
    )
    np.testing.assert_array_equal(np.asarray(host32), np.asarray(mixed32))
