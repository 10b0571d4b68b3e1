"""Parity of the Pallas fused tracked-cost kernel (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from voldor_tpu.config import VoldorConfig
from voldor_tpu.ops import lie
from voldor_tpu.ops.pallas_cost import cost_map_tracked_pallas, normalize_cost
from voldor_tpu.vo import em

from synthetic import render_window

H, W = 32, 128  # aligned tile width


def test_pallas_cost_matches_reference():
    K = np.array([[40.0, 0, 64.0], [0, 40.0, 16.0], [0, 0, 1]], np.float32)

    def n_(v):
        v = np.asarray(v, np.float64)
        return v / np.linalg.norm(v)

    planes = [(n_([0.1, 0.15, 1.0]), 8.0), (n_([-0.4, 0.1, 1.0]), 6.5)]
    rng = np.random.default_rng(2)
    poses = np.zeros((4, 6), np.float32)
    for f in range(4):
        poses[f, :3] = rng.normal(0, 0.01, 3)
        poses[f, 3:6] = [0.35, 0.02, 0.15]

    def r2R(rv):
        return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))

    flows, depth0, _ = render_window(K, poses, planes, H, W, r2R)

    cfg = VoldorConfig(fx=40.0, fy=40.0, cx=64.0, cy=16.0, basefocal=20.0)
    p = em.EmParams.from_config(cfg, False)
    Rs = jnp.asarray(np.stack([r2R(q[:3]) for q in poses]))
    ts = jnp.asarray(poses[:, 3:6])
    fl = jnp.asarray(flows)
    rig = em.update_rigidness(jnp.asarray(depth0), fl, Rs, ts, jnp.int32(4), p)
    track, tinb = em.precompute_obs_tracks(fl, jnp.int32(4), p)

    cands = jnp.stack(
        [
            jnp.asarray(depth0),
            jnp.asarray(depth0 * 1.2),
            jnp.asarray(np.full((H, W), 5.0, np.float32)),
        ]
    )

    ref = jnp.stack(
        [
            em.compute_cost_map_tracked(
                c, track, tinb, rig, Rs, ts, None, jnp.int32(4), p
            )
            for c in cands
        ]
    )
    got = normalize_cost(
        *cost_map_tracked_pallas(
            cands, track, tinb, rig, Rs, ts, jnp.int32(4), p, interpret=True
        )
    )
    ref_np = np.asarray(ref)
    got_np = np.asarray(got)
    finite = np.isfinite(ref_np)
    np.testing.assert_array_equal(np.isfinite(got_np), finite)
    np.testing.assert_allclose(got_np[finite], ref_np[finite], rtol=1e-5, atol=1e-5)
    # truncated window parity
    ref2 = em.compute_cost_map_tracked(
        cands[0], track, tinb, rig, Rs, ts, None, jnp.int32(2), p
    )
    track2, tinb2 = em.precompute_obs_tracks(fl, jnp.int32(2), p)
    rig2 = em.update_rigidness(jnp.asarray(depth0), fl, Rs, ts, jnp.int32(2), p)
    ref2 = em.compute_cost_map_tracked(
        cands[0], track2, tinb2, rig2, Rs, ts, None, jnp.int32(2), p
    )
    got2 = normalize_cost(
        *cost_map_tracked_pallas(
            cands[:1], track2, tinb2, rig2, Rs, ts, jnp.int32(2), p, interpret=True
        )
    )[0]
    f2 = np.isfinite(np.asarray(ref2))
    np.testing.assert_allclose(
        np.asarray(got2)[f2], np.asarray(ref2)[f2], rtol=1e-5, atol=1e-5
    )
