"""Frame-alignment tests on synthetic two-frame scenes."""

import numpy as np
import jax.numpy as jnp
import pytest

from voldor_tpu.falign.api import falign
from voldor_tpu.ops import lie

from synthetic import plane_depth

H, W = 64, 96
FX = FY = 70.0
CX, CY = W / 2, H / 2
K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)


def _norm(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


# Three non-parallel planes: point-to-plane alignment is fully constrained
# (two planes would leave translation along their intersection line free).
PLANES = [
    (_norm([0.15, 0.2, 1.0]), 7.0),
    (_norm([-0.45, 0.05, 1.0]), 6.0),
    (_norm([0.2, -0.5, 1.0]), 6.5),
]


def _world_texture(p3):
    """Smooth world-anchored intensity so photometric terms are consistent."""
    return (
        0.5
        + 0.25 * np.sin(1.3 * p3[..., 0] + 0.7 * p3[..., 1])
        + 0.25 * np.cos(0.9 * p3[..., 1] + 0.5 * p3[..., 2] * 0)
    ).astype(np.float32)


def _make_pair(pose6_rel):
    """Two cameras viewing the wedge; camera k's Twc: cam->world.

    pose6_rel: frame-1 cam->world pose (frame 0 is world).
    Returns depths (2, h, w), images (2, h, w).
    """
    R1 = np.asarray(lie.so3_exp(jnp.asarray(pose6_rel[:3].astype(np.float32))))
    t1 = pose6_rel[3:6]
    # world->cam for plane_depth: X_c = R_wc X_w + t_wc
    R1_wc = R1.T
    t1_wc = -R1.T @ t1
    d0 = plane_depth(K, np.eye(3), np.zeros(3), PLANES, H, W)
    d1 = plane_depth(K, R1_wc, t1_wc, PLANES, H, W)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    Kinv = np.linalg.inv(K)
    rays = np.stack([xs, ys, np.ones_like(xs)], -1) @ Kinv.T
    p3w_0 = rays * d0[..., None]
    p3c_1 = rays * d1[..., None]
    p3w_1 = p3c_1 @ R1.T + t1  # wait: X_w = R1 X_c + t1 (cam->world)
    img0 = _world_texture(p3w_0)
    img1 = _world_texture(p3w_1)
    return np.stack([d0, d1]).astype(np.float32), np.stack([img0, img1])


TRUE_POSE = np.array([0.01, -0.02, 0.005, 0.15, 0.05, -0.1], np.float32)


def test_falign_recovers_relative_pose_geometry_only():
    depths, _ = _make_pair(TRUE_POSE)
    init = np.zeros((2, 6), np.float32)
    init[1] = TRUE_POSE + np.array([0.004, -0.003, 0.002, 0.03, -0.02, 0.02], np.float32)
    ret = falign(
        depths, FX, FY, CX, CY,
        poses_init=init, vbf=FX * 5, crw=0.0, stride=2,
    )
    # relative pose frame0->frame1 in cam->world form; frame poses are
    # gauge-free, compare the relative transform
    T0 = np.asarray(lie.pose6_to_T44(jnp.asarray(ret["poses_ret"][0])))
    T1 = np.asarray(lie.pose6_to_T44(jnp.asarray(ret["poses_ret"][1])))
    Trel = np.linalg.inv(T0) @ T1
    Ttrue = np.asarray(lie.pose6_to_T44(jnp.asarray(TRUE_POSE)))
    np.testing.assert_allclose(Trel[:3, :3], Ttrue[:3, :3], atol=3e-3)
    np.testing.assert_allclose(Trel[:3, 3], Ttrue[:3, 3], atol=2e-2)
    # scores high on a consistent pair
    assert np.nanmean(ret["visibility_mat"]) > 0.8
    assert np.nanmean(ret["consistency_mat"]) > 0.85
    assert ret["poses_covar"].shape == (2, 6, 6)
    assert np.all(np.isfinite(ret["poses_covar"]))
    assert np.all(np.linalg.matrix_rank(ret["poses_covar"]) == 6)


def test_falign_photometric_refinement():
    depths, images = _make_pair(TRUE_POSE)
    init = np.zeros((2, 6), np.float32)
    init[1] = TRUE_POSE + np.array([0.003, 0.002, -0.002, 0.02, 0.02, -0.015], np.float32)
    ret = falign(
        depths, FX, FY, CX, CY, images=images,
        poses_init=init, vbf=FX * 5, crw=10.0, stride=2,
    )
    T0 = np.asarray(lie.pose6_to_T44(jnp.asarray(ret["poses_ret"][0])))
    T1 = np.asarray(lie.pose6_to_T44(jnp.asarray(ret["poses_ret"][1])))
    Trel = np.linalg.inv(T0) @ T1
    Ttrue = np.asarray(lie.pose6_to_T44(jnp.asarray(TRUE_POSE)))
    np.testing.assert_allclose(Trel[:3, :3], Ttrue[:3, :3], atol=3e-3)
    np.testing.assert_allclose(Trel[:3, 3], Ttrue[:3, 3], atol=2e-2)
    assert np.nanmean(ret["consistency_mat"]) > 0.85


def test_falign_7dof_recovers_scale():
    depths, _ = _make_pair(TRUE_POSE)
    s = 1.12
    depths_scaled = depths.copy()
    depths_scaled[1] *= s  # frame 1's map is mis-scaled by s
    init = np.zeros((2, 6), np.float32)
    init[1] = TRUE_POSE
    ret = falign(
        depths_scaled, FX, FY, CX, CY,
        poses_init=init, vbf=FX * 5, crw=0.0, optimize_7dof=True, stride=2,
    )
    # aligning frame 1 needs exp(d_scale_1 - d_scale_0) ~ 1/s
    ratio = ret["scaling_factor"][1] / ret["scaling_factor"][0]
    assert ratio == pytest.approx(1.0 / s, rel=0.05)
    assert ret["poses_covar"].shape == (2, 7, 7)
    assert np.all(ret["poses_covar"][:, 6, 6] > 0)
    # cross pose/scale terms must be zero (reference extracts only diagonal
    # blocks, align_frame.cpp:174-195)
    assert np.all(ret["poses_covar"][:, :6, 6] == 0)


def test_falign_bad_alignment_rejected_by_scores():
    depths, _ = _make_pair(TRUE_POSE)
    init = np.zeros((2, 6), np.float32)
    init[1] = TRUE_POSE + np.array([0.3, 0.2, -0.25, 1.5, -1.0, 1.0], np.float32)
    # do not let LM iterate: a garbage *converged* state isn't needed, we
    # only check that scores expose misalignment when LM can't fix it
    ret = falign(
        depths * 0 + np.stack([depths[0], depths[0][::-1, ::-1]]),  # inconsistent maps
        FX, FY, CX, CY, poses_init=init, vbf=FX * 5, crw=0.0, stride=2,
    )
    assert np.nanmean(ret["consistency_mat"]) < 0.85


def test_falign_connectivity_subset():
    depths, _ = _make_pair(TRUE_POSE)
    init = np.zeros((2, 6), np.float32)
    init[1] = TRUE_POSE
    conn = np.asarray([0, 1, -1], np.int32)  # only 0->1
    ret = falign(
        depths, FX, FY, CX, CY, poses_init=init, vbf=FX * 5, crw=0.0,
        connectivity=conn, stride=2,
    )
    assert np.isfinite(ret["visibility_mat"][0, 1])
    assert np.isnan(ret["visibility_mat"][1, 0])


def test_falign_pairs_matches_per_pair():
    """falign_pairs (vmapped independent 2-frame LM) must reproduce the
    per-pair falign() results — JAX's batched while_loop freezes converged
    lanes, so the iterates are identical up to f32 batching effects."""
    from voldor_tpu.falign.api import falign_pairs

    depths_a, _ = _make_pair(TRUE_POSE)
    shift = np.array([0.02, -0.01, 0.015, 0.1, -0.08, 0.12], np.float32)
    depths_b, _ = _make_pair(TRUE_POSE + shift)
    init = np.zeros((2, 2, 6), np.float32)
    init[0, 1] = TRUE_POSE
    init[1, 1] = TRUE_POSE + shift

    batch = falign_pairs(
        np.stack([depths_a, depths_b]), FX, FY, CX, CY,
        poses_init=init, vbf=FX * 5, crw=0.0, optimize_7dof=True, stride=2,
    )
    singles = [
        falign(d, FX, FY, CX, CY, poses_init=i, vbf=FX * 5, crw=0.0,
               optimize_7dof=True, stride=2)
        for d, i in ((depths_a, init[0]), (depths_b, init[1]))
    ]
    for b, s in zip(batch, singles):
        np.testing.assert_allclose(
            b["poses_ret"], s["poses_ret"], rtol=0.05, atol=5e-3
        )
        np.testing.assert_allclose(
            b["scaling_factor"], s["scaling_factor"], rtol=0.03
        )
        np.testing.assert_allclose(
            np.nanmean(b["consistency_mat"]), np.nanmean(s["consistency_mat"]),
            atol=0.02,
        )


def test_falign_pairs_coarse_to_fine_matches_single_phase():
    """The coarse-to-fine LM schedule (bulk iterations at 2x stride, short
    polish at the target stride) must land on the same optimum as the
    single-phase solve: same relative pose, same scale, same scores."""
    from voldor_tpu.falign.api import falign_pairs

    depths, images = _make_pair(TRUE_POSE)
    init = np.zeros((1, 2, 6), np.float32)
    init[0, 1] = TRUE_POSE + np.array(
        [0.004, -0.003, 0.002, 0.03, -0.02, 0.02], np.float32
    )

    kwargs = dict(
        fx=FX, fy=FY, cx=CX, cy=CY, poses_init=init, vbf=FX * 5, crw=10.0,
        optimize_7dof=True, stride=2,
    )
    ref = falign_pairs(depths[None], images=images[None], **kwargs)[0]
    c2f = falign_pairs(
        depths[None], images=images[None], coarse_stride=4, fine_iters=25,
        **kwargs,
    )[0]

    T = lambda p: np.asarray(lie.pose6_to_T44(jnp.asarray(p)))
    rel_ref = np.linalg.inv(T(ref["poses_ret"][0])) @ T(ref["poses_ret"][1])
    rel_c2f = np.linalg.inv(T(c2f["poses_ret"][0])) @ T(c2f["poses_ret"][1])
    np.testing.assert_allclose(rel_c2f[:3, :3], rel_ref[:3, :3], atol=3e-3)
    np.testing.assert_allclose(rel_c2f[:3, 3], rel_ref[:3, 3], atol=2e-2)
    np.testing.assert_allclose(
        c2f["scaling_factor"][1] / c2f["scaling_factor"][0],
        ref["scaling_factor"][1] / ref["scaling_factor"][0],
        rtol=0.03,
    )
    assert abs(
        np.nanmean(c2f["consistency_mat"]) - np.nanmean(ref["consistency_mat"])
    ) < 0.02
    assert np.all(np.isfinite(c2f["poses_covar"]))


def test_analytic_jacobian_matches_autodiff():
    """The hand-derived one-pass Jacobian (_pair_res_and_jacs, used on the
    hot path after docs/MFU.json measured the 18-tangent forward-mode
    linearize HBM/traffic-bound) must match the autodiff oracle
    (_pair_res_and_jacs_ad) on residuals and both Jacobian blocks, in every
    (photo, stride) regime, at nonzero poses/scales/color params."""
    from voldor_tpu.falign.residual import precompute_maps
    from voldor_tpu.falign.solver import (_pair_res_and_jacs,
                                          _pair_res_and_jacs_ad)

    depths, images = _make_pair(TRUE_POSE)
    weights = np.full_like(depths, 0.7)
    maps, bounds = precompute_maps(
        jnp.asarray(depths), jnp.asarray(weights), jnp.asarray(images),
        FX, FY, CX, CY,
    )
    intr = tuple(jnp.float32(v) for v in (FX, FY, CX, CY))
    params = np.zeros((2, 9), np.float32)
    params[0] = [0.02, -0.03, 0.01, 0.05, -0.02, 0.1, 0.04, 0.02, 1.5]
    params[1] = [-0.01, 0.02, 0.03, -0.06, 0.01, -0.08, -0.03, -0.01, -2.0]
    params = jnp.asarray(params)
    pairs = jnp.asarray([[0, 1], [1, 0]], jnp.int32)
    dim_mask = jnp.ones((2, 9), jnp.float32)

    for use_photo in (True, False):
        for stride in (1, 3):
            args = (params, pairs, maps, intr, jnp.float32(FX * 5),
                    jnp.float32(10.0), use_photo, stride, bounds, dim_mask)
            r_an, Jr_an, Jt_an = map(np.asarray, _pair_res_and_jacs(*args))
            r_ad, Jr_ad, Jt_ad = map(np.asarray, _pair_res_and_jacs_ad(*args))
            scale = max(np.abs(Jr_ad).max(), np.abs(Jt_ad).max(), 1e-9)
            assert np.abs(r_an - r_ad).max() < 1e-3, (use_photo, stride)
            assert np.abs(Jr_an - Jr_ad).max() / scale < 2e-3, (use_photo, stride)
            assert np.abs(Jt_an - Jt_ad).max() / scale < 2e-3, (use_photo, stride)
