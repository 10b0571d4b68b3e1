"""Device covisibility (ops/covis.py) vs the host reference
(slam_utils.eval_covisibility) — the pipelined VO driver steps windows from
the device scores, so they must agree with the host gate exactly."""

import numpy as np
import jax.numpy as jnp

from voldor_tpu.ops import lie
from voldor_tpu.ops.covis import covis_keyframe, covis_window
from voldor_tpu.slam.slam_utils import T6_to_T44, eval_covisibility


def _rand_depth(rng, h, w):
    return (5.0 + 2.0 * rng.random((h, w))).astype(np.float32)


def _chain(T6s):
    T = np.eye(4, dtype=np.float64)
    out = []
    for p in T6s:
        T = T6_to_T44(p).astype(np.float64) @ T
        out.append(T.copy())
    return out


def test_covis_window_matches_host():
    h, w = 72, 96
    K = np.array([[80.0, 0, w / 2], [0, 80.0, h / 2], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(5)
    depth = _rand_depth(rng, h, w)
    conf = rng.random((h, w)).astype(np.float32)
    poses6 = np.zeros((5, 6), np.float32)
    for i in range(5):
        poses6[i, :3] = rng.normal(0, 0.02, 3)
        poses6[i, 3:6] = [0.3, 0.02, 0.2]

    dev = np.asarray(
        covis_window(
            jnp.asarray(depth), jnp.asarray(conf), jnp.asarray(poses6),
            jnp.int32(5), jnp.asarray(K), jnp.float32(0.5),
        )
    )
    for i, T in enumerate(_chain(poses6)):
        host = eval_covisibility(depth, T, K, conf > 0.5)
        assert abs(dev[i] - host) < 1e-5, (i, dev[i], host)


def test_covis_window_inactive_frames_repeat():
    """Frames beyond n_flows must not extend the chain (their entries
    repeat the last active score)."""
    h, w = 48, 64
    K = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(9)
    depth = _rand_depth(rng, h, w)
    conf = np.ones((h, w), np.float32)
    poses6 = rng.normal(0, 0.1, (4, 6)).astype(np.float32)
    poses6[:, 3:6] += [0.2, 0, 0.1]
    dev = np.asarray(
        covis_window(
            jnp.asarray(depth), jnp.asarray(conf), jnp.asarray(poses6),
            jnp.int32(2), jnp.asarray(K), jnp.float32(0.5),
        )
    )
    assert dev[2] == dev[1] and dev[3] == dev[1]


def test_covis_keyframe_matches_host():
    """spakf gate: covis of the scaled keyframe depth under chain_s @ M."""
    h, w = 72, 96
    K = np.array([[80.0, 0, w / 2], [0, 80.0, h / 2], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(11)
    depth_kf = _rand_depth(rng, h, w)
    conf_kf = rng.random((h, w)).astype(np.float32)
    scale = 1.37
    poses6 = np.zeros((3, 6), np.float32)
    for i in range(3):
        poses6[i, :3] = rng.normal(0, 0.02, 3)
        poses6[i, 3:6] = [0.25, 0.01, 0.15]
    M = np.eye(4, dtype=np.float32)
    M[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, 0.05, 3)
                                                   .astype(np.float32))))
    M[:3, 3] = [0.4, -0.1, 0.2]

    dev = np.asarray(
        covis_keyframe(
            jnp.asarray(depth_kf), jnp.asarray(conf_kf), jnp.float32(scale),
            jnp.asarray(poses6), jnp.int32(3), jnp.asarray(M),
            jnp.asarray(K), jnp.float32(0.5),
        )
    )
    for s, Tc in enumerate(_chain(poses6)):
        T = Tc @ M.astype(np.float64)
        host = eval_covisibility(depth_kf * scale, T, K, conf_kf > 0.5)
        assert abs(dev[s] - host) < 1e-5, (s, dev[s], host)
