"""Tests for meanshift, robust Gaussian fit, LambdaTwist P3P, epipolar bootstrap."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voldor_tpu.ops import lie, meanshift, robust_gaussian, p3p, epipolar


# --------------------------------------------------------------------------
# meanshift
# --------------------------------------------------------------------------


def _two_cluster_pool(rng, n_main=800, n_out=200, d=6):
    main = rng.normal(0, 0.05, size=(n_main, d)) + 1.0
    out = rng.normal(0, 1.5, size=(n_out, d)) - 2.0
    return np.concatenate([main, out]).astype(np.float32)


def test_meanshift_finds_dominant_mode(rng):
    pool = _two_cluster_pool(rng)
    valid = np.ones(pool.shape[0], np.float32)
    res = meanshift.meanshift(
        jnp.asarray(pool),
        jnp.asarray(valid),
        kernel_var=0.1,
        init_mean=jnp.zeros(6),
        use_external_init_mean=jnp.asarray(False),
        key=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(res.mean), np.ones(6), atol=0.1)
    assert float(res.confidence) > 0.3
    assert int(res.iters) >= 1


def test_meanshift_external_init_warm_start(rng):
    pool = _two_cluster_pool(rng)
    valid = np.ones(pool.shape[0], np.float32)
    res = meanshift.meanshift(
        jnp.asarray(pool),
        jnp.asarray(valid),
        kernel_var=0.1,
        init_mean=jnp.full((6,), 1.02),
        use_external_init_mean=jnp.asarray(True),
        key=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(res.mean), np.ones(6), atol=0.1)


def test_meanshift_respects_validity_mask(rng):
    pool = _two_cluster_pool(rng)
    valid = np.zeros(pool.shape[0], np.float32)
    valid[800:] = 1.0  # only the outlier cluster is valid
    res = meanshift.meanshift(
        jnp.asarray(pool),
        jnp.asarray(valid),
        kernel_var=1.0,
        init_mean=jnp.zeros(6),
        use_external_init_mean=jnp.asarray(False),
        key=jax.random.PRNGKey(1),
    )
    # mode must land near the valid cluster (-2), not the invalid one (+1)
    assert float(np.mean(np.asarray(res.mean))) < 0.0
    assert int(res.n_valid) == 200


# --------------------------------------------------------------------------
# robust gaussian
# --------------------------------------------------------------------------


def _robust_gaussian_oracle(pool, mean, covar, trunc_sigma=3.0, lam=0.001,
                            eps=1e-5, max_iters=100):
    """NumPy (f64) transcription of fit_robust_gaussian.cu:164-263."""
    pool = pool.astype(np.float64)
    mean = mean.astype(np.float64).copy()
    covar = covar.astype(np.float64).copy()
    N = pool.shape[0]
    prev_wsum = 0.0
    for it in range(max_iters):
        covar_r = covar
        if it > 0 and lam > 0:
            m = np.trace(covar) / covar.shape[0]
            covar_r = lam * m * np.eye(covar.shape[0]) + (1 - lam) * covar
        if np.linalg.det(covar_r) <= 0:
            return None
        inv = np.linalg.inv(covar_r)
        diff = pool - mean
        z2 = np.einsum("nd,de,ne->n", diff, inv, diff)
        w = (np.sqrt(np.maximum(z2, 0)) < trunc_sigma).astype(np.float64)
        wsum = w.sum()
        if abs(wsum - prev_wsum) / N < eps:
            return mean, covar_r, wsum / N
        new_mean = (w @ pool) / wsum
        d2 = pool - new_mean
        covar = (d2 * w[:, None]).T @ d2 / wsum
        mean, prev_wsum = new_mean, wsum
    return mean, covar, wsum / N


def test_robust_gaussian_matches_numpy_oracle(rng):
    true_mean = np.array([1.0, -2.0, 0.5, 3.0, 0.0, -1.0], np.float32)
    true_std = np.array([0.5, 0.2, 0.8, 0.3, 0.6, 0.4], np.float32)
    inliers = rng.normal(size=(4000, 6)).astype(np.float32) * true_std + true_mean
    outliers = rng.uniform(-30, 30, size=(1000, 6)).astype(np.float32)
    pool = np.concatenate([inliers, outliers])
    valid = np.ones(pool.shape[0], np.float32)

    res = robust_gaussian.fit_robust_gaussian(
        jnp.asarray(pool),
        jnp.asarray(valid),
        mean0=jnp.asarray(true_mean + 0.1),
        covar0=jnp.eye(6) * 1.0,
    )
    assert bool(res.reliable)
    oracle = _robust_gaussian_oracle(pool, true_mean + 0.1, np.eye(6))
    assert oracle is not None
    o_mean, o_covar, o_density = oracle
    np.testing.assert_allclose(np.asarray(res.mean), o_mean, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.covar), o_covar, atol=5e-3)
    assert float(res.density) == pytest.approx(o_density, abs=0.02)
    # mean should still be accurate despite outliers
    np.testing.assert_allclose(np.asarray(res.mean), true_mean, atol=0.1)


def test_robust_gaussian_unreliable_on_degenerate_pool(rng):
    # all samples identical -> zero covariance -> cholesky failure next iter
    pool = np.ones((100, 6), np.float32)
    res = robust_gaussian.fit_robust_gaussian(
        jnp.asarray(pool),
        jnp.ones(100),
        mean0=jnp.ones(6),
        covar0=jnp.zeros((6, 6)),
    )
    assert not bool(res.reliable)


def test_robust_gaussian_scaled_space_conditioning(rng):
    """The VO pose pool is pre-scaled by rg_pose_scaling (geometry.cpp:208-210);
    verify the f32 path recovers a tiny-covariance pool in scaled space."""
    scale = 100.0
    true_std = 1e-3  # tiny in raw units
    inliers = (rng.normal(size=(4000, 6)) * true_std).astype(np.float32)
    pool = inliers * scale
    res = robust_gaussian.fit_robust_gaussian(
        jnp.asarray(pool),
        jnp.ones(pool.shape[0]),
        mean0=jnp.zeros(6),
        covar0=jnp.eye(6) * (0.1 * scale * scale),
    )
    assert bool(res.reliable)
    oracle = _robust_gaussian_oracle(pool, np.zeros(6), np.eye(6) * (0.1 * scale * scale))
    assert oracle is not None
    np.testing.assert_allclose(np.asarray(res.covar), oracle[1], rtol=0.05, atol=1e-4)


# --------------------------------------------------------------------------
# P3P / P4P
# --------------------------------------------------------------------------


def _make_p4p_instance(rng, fx=400.0, fy=420.0, cx=320.0, cy=240.0, n=4):
    rvec = rng.normal(size=3).astype(np.float32) * 0.4
    tvec = rng.normal(size=3).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(rvec)))
    # world points in front of both cameras
    pts3 = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    pts3[:, 2] = rng.uniform(4, 12, size=n)
    pc = pts3 @ R.T + tvec
    assert np.all(pc[:, 2] > 0.5)
    u = fx * pc[:, 0] / pc[:, 2] + cx
    v = fy * pc[:, 1] / pc[:, 2] + cy
    pts2 = np.stack([u, v], axis=-1).astype(np.float32)
    return pts2, pts3, rvec, tvec


def test_p4p_single_exact_recovery(rng):
    """Exact synthetic instances must be recovered nearly always.

    f32 conditioning occasionally (~1/20) loses the true root — the CUDA
    reference's f32 GPU path has the same failure mode, absorbed by the
    8192-hypothesis pool + meanshift. Such failures must show up as a large
    4th-point reprojection error so downstream pooling can discount them.
    """
    fx, fy, cx, cy = 400.0, 420.0, 320.0, 240.0
    n_exact = 0
    for _ in range(20):
        pts2, pts3, rvec, tvec = _make_p4p_instance(rng, fx, fy, cx, cy)
        r, t, ok = p3p._p4p_single(jnp.asarray(pts2), jnp.asarray(pts3), fx, fy, cx, cy)
        if not bool(ok):
            continue
        r, t = np.asarray(r), np.asarray(t)
        R = np.asarray(lie.so3_exp(jnp.asarray(r)))
        pc = pts3 @ R.T + t
        u = fx * pc[:, 0] / pc[:, 2] + cx
        v = fy * pc[:, 1] / pc[:, 2] + cy
        reproj = np.abs(np.stack([u, v], -1) - pts2).max()
        if reproj < 1.0:  # solver-consistent solution
            n_exact += 1
            np.testing.assert_allclose(r, rvec, atol=2e-2)
            np.testing.assert_allclose(t, tvec, atol=5e-2)
    assert n_exact >= 17


def test_solve_batch_p4p(rng):
    fx, fy, cx, cy = 400.0, 420.0, 320.0, 240.0
    # one consistent pose, many correspondences
    rvec = np.array([0.05, -0.1, 0.02], np.float32)
    tvec = np.array([0.3, -0.1, 0.5], np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(rvec)))
    M = 600
    pts3 = rng.uniform(-3, 3, size=(M, 3)).astype(np.float32)
    pts3[:, 2] = rng.uniform(5, 20, size=M)
    pc = pts3 @ R.T + tvec
    pts2 = np.stack(
        [fx * pc[:, 0] / pc[:, 2] + cx, fy * pc[:, 1] / pc[:, 2] + cy], axis=-1
    ).astype(np.float32)
    valid = np.ones(M, bool)
    valid[500:] = False  # garbage tail must never be sampled
    pts2[500:] = np.nan
    pts3[500:] = np.nan

    rvecs, tvecs, ok = p3p.solve_batch_p4p(
        jnp.asarray(pts2), jnp.asarray(pts3), jnp.asarray(valid),
        jax.random.PRNGKey(3), fx, fy, cx, cy, n_poses=256,
    )
    ok = np.asarray(ok)
    assert ok.mean() > 0.9
    np.testing.assert_allclose(np.asarray(rvecs)[ok].mean(axis=0), rvec, atol=1e-2)
    np.testing.assert_allclose(np.asarray(tvecs)[ok].mean(axis=0), tvec, atol=3e-2)
    # no NaNs among ok rows
    assert np.all(np.isfinite(np.asarray(rvecs)[ok]))


def test_p4p_disambiguation_uses_fourth_point(rng):
    """With noise-free data the solution closest in reprojection must win."""
    fx, fy, cx, cy = 500.0, 500.0, 300.0, 200.0
    errs = []
    for _ in range(10):
        pts2, pts3, rvec, tvec = _make_p4p_instance(rng, fx, fy, cx, cy)
        r, t, ok = p3p._p4p_single(jnp.asarray(pts2), jnp.asarray(pts3), fx, fy, cx, cy)
        if not bool(ok):
            continue
        R = np.asarray(lie.so3_exp(r))
        pc = pts3 @ R.T + np.asarray(t)
        u = fx * pc[:, 0] / pc[:, 2] + cx
        v = fy * pc[:, 1] / pc[:, 2] + cy
        errs.append(np.abs(np.stack([u, v], -1) - pts2).max())
    assert np.median(errs) < 0.5  # sub-pixel reprojection on exact data


# --------------------------------------------------------------------------
# epipolar bootstrap
# --------------------------------------------------------------------------


def _render_flow(depth, K, R, t):
    """Exact rigid flow for a fronto-parallel-ish scene (numpy)."""
    h, w = depth.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    Kinv = np.linalg.inv(K)
    p = np.stack([xs, ys, np.ones_like(xs)], -1) @ Kinv.T * depth[..., None]
    p2 = p @ R.T + t
    u2 = K[0, 0] * p2[..., 0] / p2[..., 2] + K[0, 2]
    v2 = K[1, 1] * p2[..., 1] / p2[..., 2] + K[1, 2]
    return np.stack([u2 - xs, v2 - ys], -1).astype(np.float32)


def test_epipolar_bootstrap_recovers_pose(rng):
    h, w = 96, 128
    K = np.array([[100.0, 0, 64.0], [0, 100.0, 48.0], [0, 0, 1]], np.float32)
    rvec = np.array([0.02, -0.03, 0.01], np.float32)
    tvec = np.array([0.2, 0.05, 0.9], np.float32)
    tvec /= np.linalg.norm(tvec)
    R = np.asarray(lie.so3_exp(jnp.asarray(rvec)))
    depth = (5.0 + 2.0 * rng.random((h, w))).astype(np.float32)
    flow = _render_flow(depth, K, R, tvec)

    R_est, t_est, med = epipolar.estimate_pose_epipolar(
        jnp.asarray(flow), jnp.asarray(K), jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(np.asarray(R_est), R, atol=2e-2)
    # reference convention: t_est = R @ t_unit
    np.testing.assert_allclose(np.asarray(t_est), R @ tvec, atol=5e-2)
    assert float(med) < 1e-6


def test_closed_form_depth_recovers_scene(rng):
    h, w = 64, 80
    K = np.array([[90.0, 0, 40.0], [0, 90.0, 32.0], [0, 0, 1]], np.float32)
    rvec = np.array([0.01, 0.02, -0.015], np.float32)
    tvec = np.array([0.1, -0.05, 0.6], np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(rvec)))
    depth = (4.0 + 3.0 * rng.random((h, w))).astype(np.float32)
    flow = _render_flow(depth, K, R, tvec)

    # the closed form expects the reference's post-multiplied translation
    d_est = epipolar.estimate_depth_closed_form(
        jnp.asarray(flow), jnp.asarray(K), jnp.asarray(R), jnp.asarray(tvec)
    )
    # interior pixels (borders can leave the image)
    err = np.abs(np.asarray(d_est)[8:-8, 8:-8] - depth[8:-8, 8:-8]) / depth[8:-8, 8:-8]
    assert np.median(err) < 0.02


# --------------------------------------------------------------------------
# AP3P (--lambdatwist 0 backend, solve_batch_ap3p.cu parity)
# --------------------------------------------------------------------------


def test_ap3p_quartic_known_roots():
    from voldor_tpu.ops import ap3p

    # (x-1)(x+2)(x-3)(x+0.5) = x^4 - 1.5x^3 - 5.5x^2 + 8.5x - 3  ... expand
    roots_true = np.array([1.0, -2.0, 3.0, -0.5])
    c = np.poly(roots_true)  # leading-first coefficients
    r = np.sort(np.asarray(ap3p._solve_quartic(*[jnp.float32(x) for x in c])))
    np.testing.assert_allclose(r, np.sort(roots_true), atol=1e-3)


def test_ap3p_single_exact_recovery(rng):
    """AP3P must recover exact synthetic instances nearly always (same
    f32-conditioning caveat as the LambdaTwist test above)."""
    from voldor_tpu.ops import ap3p

    fx, fy, cx, cy = 400.0, 420.0, 320.0, 240.0
    n_exact = 0
    for _ in range(20):
        pts2, pts3, rvec, tvec = _make_p4p_instance(rng, fx, fy, cx, cy)
        r, t, ok = ap3p._ap3p_p4p_single(
            jnp.asarray(pts2), jnp.asarray(pts3), fx, fy, cx, cy
        )
        if not bool(ok):
            continue
        r, t = np.asarray(r), np.asarray(t)
        R = np.asarray(lie.so3_exp(jnp.asarray(r)))
        pc = pts3 @ R.T + t
        u = fx * pc[:, 0] / pc[:, 2] + cx
        v = fy * pc[:, 1] / pc[:, 2] + cy
        reproj = np.abs(np.stack([u, v], -1) - pts2).max()
        if reproj < 1.0:
            n_exact += 1
            np.testing.assert_allclose(r, rvec, atol=2e-2)
            np.testing.assert_allclose(t, tvec, atol=5e-2)
    assert n_exact >= 16


def test_solve_batch_p4p_ap3p(rng):
    from voldor_tpu.ops import ap3p

    fx, fy, cx, cy = 400.0, 420.0, 320.0, 240.0
    rvec = np.array([0.05, -0.1, 0.02], np.float32)
    tvec = np.array([0.3, -0.1, 0.5], np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(rvec)))
    M = 600
    pts3 = rng.uniform(-3, 3, size=(M, 3)).astype(np.float32)
    pts3[:, 2] = rng.uniform(5, 20, size=M)
    pc = pts3 @ R.T + tvec
    pts2 = np.stack(
        [fx * pc[:, 0] / pc[:, 2] + cx, fy * pc[:, 1] / pc[:, 2] + cy], axis=-1
    ).astype(np.float32)
    valid = np.ones(M, bool)
    valid[500:] = False  # garbage tail must never be sampled
    pts2[500:] = np.nan
    pts3[500:] = np.nan
    rvecs, tvecs, ok = ap3p.solve_batch_p4p_ap3p(
        jnp.asarray(pts2), jnp.asarray(pts3), jnp.asarray(valid),
        jax.random.PRNGKey(0), fx, fy, cx, cy, n_poses=256,
    )
    ok = np.asarray(ok)
    assert ok.mean() > 0.9  # exact data: nearly every sample solves
    err_r = np.linalg.norm(np.asarray(rvecs)[ok] - rvec, axis=1)
    err_t = np.linalg.norm(np.asarray(tvecs)[ok] - tvec, axis=1)
    assert np.median(err_r) < 5e-3, np.median(err_r)
    assert np.median(err_t) < 2e-2, np.median(err_t)


def test_minimal_solver_registry():
    from voldor_tpu.ops import ap3p
    from voldor_tpu.vo.pose_step import _get_batch_p4p

    assert _get_batch_p4p("lambdatwist") is p3p.solve_batch_p4p
    assert _get_batch_p4p("ap3p") is ap3p.solve_batch_p4p_ap3p
    with pytest.raises(ValueError):
        _get_batch_p4p("nope")
