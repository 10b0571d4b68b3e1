"""Unit tests for config, Lie math, image sampling, Fisk model, FB smoothing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voldor_tpu.config import VoldorConfig
from voldor_tpu.ops import lie, image, fisk, fb_smooth


# --------------------------------------------------------------------------
# Config
# --------------------------------------------------------------------------


def test_config_defaults_match_reference():
    cfg = VoldorConfig()
    assert cfg.omega == pytest.approx(0.15)
    assert cfg.n_poses_to_sample == 8192
    assert cfg.max_iters == 5
    assert cfg.depth_local_prop_width == 32
    assert cfg.meanshift_rvec_scale == 25.0


def test_config_parse_flag_dialect():
    cfg = VoldorConfig.from_string(
        "--silent --meanshift_kernel_var 0.2 --delta 1.5 --max_iters 4 "
        "--lambda 0.2 --pose_sample_min_depth 2.5 --abs_resize_factor 0.5"
    )
    assert cfg.silent is True
    assert cfg.meanshift_kernel_var == pytest.approx(0.2)
    assert cfg.delta == pytest.approx(1.5)
    assert cfg.max_iters == 4
    assert cfg.lambda_ == pytest.approx(0.2)
    assert cfg.pose_sample_min_depth == pytest.approx(2.5)
    assert cfg.abs_resize_factor == pytest.approx(0.5)


def test_config_unknown_flag_raises():
    with pytest.raises(ValueError):
        VoldorConfig.from_string("--not_a_flag 3")


def test_config_roundtrip():
    cfg = VoldorConfig.from_string("--silent --delta 1.5 --max_iters 4")
    cfg2 = VoldorConfig.from_string(cfg.to_string())
    assert cfg == cfg2


# --------------------------------------------------------------------------
# Lie math
# --------------------------------------------------------------------------


def _random_rvecs(rng, n, max_angle=np.pi - 1e-3):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(0, max_angle, size=(n, 1))
    return (axes * angles).astype(np.float32)


def test_so3_exp_log_roundtrip(rng):
    rvecs = _random_rvecs(rng, 256)
    R = lie.so3_exp(jnp.asarray(rvecs))
    # Orthonormality
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    back = lie.so3_log(R)
    np.testing.assert_allclose(back, rvecs, atol=2e-4)


def test_so3_log_near_pi(rng):
    rvecs = _random_rvecs(rng, 64)
    rvecs = rvecs / np.linalg.norm(rvecs, axis=-1, keepdims=True) * (np.pi - 1e-4)
    R = lie.so3_exp(jnp.asarray(rvecs.astype(np.float64)))
    back = np.asarray(lie.so3_log(R))
    # axis-angle defined up to sign of axis at pi; compare rotations
    R2 = lie.so3_exp(jnp.asarray(back))
    np.testing.assert_allclose(R2, R, atol=1e-4)


def test_so3_exp_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    rvecs = _random_rvecs(rng, 32)
    ours = np.asarray(lie.so3_exp(jnp.asarray(rvecs)))
    for i in range(32):
        Rcv, _ = cv2.Rodrigues(rvecs[i])
        np.testing.assert_allclose(ours[i], Rcv, atol=1e-5)


def test_rotate_rvec_matches_matrix(rng):
    rvecs = _random_rvecs(rng, 128)
    pts = rng.normal(size=(128, 3)).astype(np.float32)
    R = lie.so3_exp(jnp.asarray(rvecs))
    expected = jnp.einsum("nij,nj->ni", R, jnp.asarray(pts))
    got = lie.rotate_rvec(jnp.asarray(pts), jnp.asarray(rvecs))
    np.testing.assert_allclose(got, expected, atol=1e-5)
    # zero rotation
    got0 = lie.rotate_rvec(jnp.asarray(pts), jnp.zeros_like(jnp.asarray(rvecs)))
    np.testing.assert_allclose(got0, pts, atol=1e-6)


def test_rotate_rvec_grad_finite(rng):
    """Autodiff through rotate_rvec must be finite incl. at tiny angles
    (replaces the reference's hand-written d/drvec, align_frame.cu:70-84)."""
    p = jnp.asarray([1.0, 2.0, 3.0])
    for rv in [jnp.asarray([0.3, -0.2, 0.5]), jnp.asarray([1e-5, 0.0, 0.0])]:
        J = jax.jacobian(lambda r: lie.rotate_rvec(p, r))(rv)
        assert np.all(np.isfinite(J))
        # compare against matrix-based jacobian numerically
        eps = 1e-3
        for k in range(3):
            d = jnp.zeros(3).at[k].set(eps)
            fd = (lie.rotate_rvec(p, rv + d) - lie.rotate_rvec(p, rv - d)) / (2 * eps)
            np.testing.assert_allclose(J[:, k], fd, atol=5e-3)


def test_pose6_T44_roundtrip(rng):
    pose6 = np.concatenate(
        [_random_rvecs(rng, 16), rng.normal(size=(16, 3)).astype(np.float32)], axis=1
    )
    T = lie.pose6_to_T44(jnp.asarray(pose6))
    assert T.shape == (16, 4, 4)
    back = lie.T44_to_pose6(T)
    np.testing.assert_allclose(back, pose6, atol=2e-4)
    Tinv = lie.T44_inv(T)
    np.testing.assert_allclose(
        np.asarray(T @ Tinv), np.broadcast_to(np.eye(4), T.shape), atol=1e-5
    )


def test_quat_roundtrip(rng):
    rvecs = _random_rvecs(rng, 64)
    q = lie.quat_from_rvec(jnp.asarray(rvecs))
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    back = lie.quat_to_rvec(q)
    np.testing.assert_allclose(back, rvecs, atol=2e-4)
    # rotation by quat == rotation by R
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    R = lie.so3_exp(jnp.asarray(rvecs))
    np.testing.assert_allclose(
        lie.quat_rotate(q, jnp.asarray(pts)),
        jnp.einsum("nij,nj->ni", R, jnp.asarray(pts)),
        atol=1e-5,
    )


def test_quat_mul_matches_rotation_composition(rng):
    r1, r2 = _random_rvecs(rng, 8), _random_rvecs(rng, 8)
    q12 = lie.quat_mul(lie.quat_from_rvec(jnp.asarray(r1)), lie.quat_from_rvec(jnp.asarray(r2)))
    R12 = lie.so3_exp(jnp.asarray(r1)) @ lie.so3_exp(jnp.asarray(r2))
    np.testing.assert_allclose(
        lie.so3_exp(lie.quat_to_rvec(q12)), R12, atol=1e-5
    )


# --------------------------------------------------------------------------
# Image sampling
# --------------------------------------------------------------------------


def test_bilinear_sample_exact_at_integers(rng):
    img = rng.normal(size=(7, 9)).astype(np.float32)
    ys, xs = np.mgrid[0:7, 0:9]
    out = image.bilinear_sample(jnp.asarray(img), jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_bilinear_sample_midpoint_and_clamp(rng):
    img = np.array([[0.0, 1.0], [2.0, 3.0]], np.float32)
    j = jnp.asarray
    # midpoint
    assert float(image.bilinear_sample(j(img), j(0.5), j(0.5))) == pytest.approx(1.5)
    # clamp beyond borders
    assert float(image.bilinear_sample(j(img), j(-5.0), j(0.0))) == pytest.approx(0.0)
    assert float(image.bilinear_sample(j(img), j(10.0), j(10.0))) == pytest.approx(3.0)


def test_bilinear_sample_multichannel(rng):
    img = rng.normal(size=(5, 6, 2)).astype(np.float32)
    out = image.bilinear_sample(jnp.asarray(img), jnp.asarray([1.5]), jnp.asarray([2.0]))
    expected = 0.5 * (img[2, 1] + img[2, 2])
    np.testing.assert_allclose(out[0], expected, atol=1e-6)


def test_gaussian_blur_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.normal(size=(32, 40)).astype(np.float32)
    for k in (3, 5, 9):
        ours = np.asarray(image.gaussian_blur(jnp.asarray(img), k))
        ref = cv2.GaussianBlur(img, (k, k), 0)
        # cv2 quantizes kernels with ksize > 7 to 1/256 fixed point; we keep
        # exact fp32 taps, so allow the quantization gap there.
        np.testing.assert_allclose(ours, ref, atol=1e-5 if k <= 7 else 2e-2)


# --------------------------------------------------------------------------
# Fisk model
# --------------------------------------------------------------------------


def _fisk_pdf_numpy(x, c, scale):
    x = np.maximum(x * fisk.EST_RF, 1.1920929e-07)
    u = (x * x) / scale
    return (c * u ** (-c - 1.0) * (1.0 + u ** (-c)) ** (-2.0)) / scale


def test_fisk_pdf_formula(rng):
    x = rng.uniform(0.01, 50, size=1000).astype(np.float32)
    c = np.float32(0.9)
    s = np.float32(0.05)
    np.testing.assert_allclose(
        fisk.fisk_pdf(jnp.asarray(x), c, s), _fisk_pdf_numpy(x, c, s), rtol=1e-4
    )


def test_fisk_params_clamped():
    # below/above observation clamp both map to the clamp boundary values
    tol = dict(rel=1e-5)  # fp32 exp rounding
    assert float(fisk.fmag_c(jnp.asarray(0.0))) == pytest.approx(1.0 - 0.0022 * 2, **tol)
    assert float(fisk.fmag_c(jnp.asarray(1e6))) == pytest.approx(1.0 - 0.0022 * 100, **tol)
    assert float(fisk.fmag_scale(jnp.asarray(0.0))) == pytest.approx(0.01 * np.exp(0.09 * 2), **tol)


def test_rigidness_behaviour(rng):
    obs = jnp.asarray([10.0, 0.0])
    # perfect agreement -> high rigidness; large residual -> low
    r_good = float(fisk.rigidness(obs, obs, 0.15, 1.0))
    r_bad = float(fisk.rigidness(jnp.asarray([-10.0, 5.0]), obs, 0.15, 1.0))
    assert r_good > 0.9
    assert r_bad < 0.1
    # residual exactly at lambda*|obs| -> 0.5 by construction
    lam = 0.15
    diff = lam * 10.0
    r_half = float(fisk.rigidness(obs + jnp.asarray([diff, 0.0]), obs, lam, 1.0))
    assert r_half == pytest.approx(0.5, abs=1e-5)


def test_depth_rigidness_behaviour():
    bf = 400.0
    r_same = float(fisk.depth_rigidness(jnp.asarray(10.0), jnp.asarray(10.0), bf, 0.15, 1.0))
    r_off = float(fisk.depth_rigidness(jnp.asarray(30.0), jnp.asarray(10.0), bf, 0.15, 1.0))
    assert r_same > 0.9
    assert r_off < 0.2


def test_nll_cost_monotone():
    obs = jnp.asarray([8.0, 3.0])
    c1, w1 = fisk.nll_cost(obs, obs, jnp.asarray(1.0), 0.15, 1.0)
    c2, _ = fisk.nll_cost(obs + 2.0, obs, jnp.asarray(1.0), 0.15, 1.0)
    assert float(c1) < float(c2)
    assert float(w1) == 1.0


# --------------------------------------------------------------------------
# FB smoothing
# --------------------------------------------------------------------------


def test_fb_smooth_matches_scan_reference(rng):
    prob = rng.uniform(0.02, 0.98, size=(3, 17, 23)).astype(np.float32)
    fast = np.asarray(fb_smooth.fb_smooth(jnp.asarray(prob), 0.5, 0.9))
    slow = np.asarray(fb_smooth.fb_smooth_scan_reference(jnp.asarray(prob), 0.5, 0.9))
    np.testing.assert_allclose(fast, slow, atol=2e-4)
    assert np.all(fast >= 0) and np.all(fast <= 1)


def test_fb_smooth_denoises_isolated_flip():
    prob = np.full((1, 9, 33), 0.9, np.float32)
    prob[0, 4, 16] = 0.1  # isolated outlier inside confident region
    out = np.asarray(fb_smooth.fb_smooth(jnp.asarray(prob), 0.5, 0.9))
    assert out[0, 4, 16] > 0.3  # pulled up by neighbors
    assert out[0, 4, 2] > 0.85  # confident region stays confident
