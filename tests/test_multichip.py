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


@pytest.mark.slow
def test_multichip_full_solve_kitti_shape():
    """Production-shape sharding validation (VERDICT r2 #8): the FULL fused
    solve at the KITTI compute-grid size (185x616 after the demo's x0.5
    resize, BASELINE.md), window 5, on the 2-D sp x hyp mesh. The small-
    shape consistency tests above pin the numerics; this test pins the
    SHAPE — padding/tiling bugs in the sharded scan bodies only surface at
    grid sizes that don't divide the mesh evenly (185 rows over 4 sp
    shards). Checks: executes, finite outputs, poses within loose bounds
    of the single-device run."""
    import jax.numpy as jnp

    from voldor_tpu.config import VoldorConfig
    from voldor_tpu.ops import lie
    from voldor_tpu.parallel.mesh import make_mesh, make_mesh_2d, multichip_solve
    from synthetic import render_window

    n, h, w = 5, 185, 616
    K = np.array([[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]], np.float32)

    def _n(v):
        v = np.asarray(v, np.float64)
        return v / np.linalg.norm(v)

    planes = [(_n([0.1, 0.15, 1.0]), 8.0), (_n([-0.35, 0.1, 1.0]), 6.5),
              (_n([0.3, -0.4, 1.0]), 7.0)]
    rng = np.random.default_rng(5)
    poses = np.zeros((n, 6), np.float32)
    for f in range(n):
        poses[f, :3] = rng.normal(0, 0.004, 3)
        poses[f, 3:6] = [0.1, 0.01, 0.3]

    def r2R(rv):
        return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))

    flows, depth0, _ = render_window(K, poses, planes, h, w, r2R)

    cfg = VoldorConfig(fx=300.0, fy=300.0, cx=w / 2, cy=h / 2, basefocal=150.0)
    cfg.n_poses_to_sample = 512
    cfg.depth_rand_samples = 2
    cfg.max_iters = 2
    poses6 = np.zeros((n, 6), np.float32)
    poses6[:, 5] = 0.3

    outs = []
    for mesh in (make_mesh(1), make_mesh_2d(4, 2)):
        outs.append(multichip_solve(mesh, cfg, flows, depth0, poses6))

    for out in outs:
        for k in ("poses6", "depth", "rigidness"):
            assert np.all(np.isfinite(np.asarray(out[k]))), k
    # production-scale f32 EM: reduction-order noise compounds over the
    # window sweep; bound poses tightly, dense maps loosely (see the
    # docstring of test_multichip_full_solve_matches_single_chip)
    a = np.asarray(outs[0]["poses6"], np.float64)
    b = np.asarray(outs[1]["poses6"], np.float64)
    np.testing.assert_allclose(a, b, rtol=0, atol=5e-3)
    d_rel = np.abs(
        np.asarray(outs[0]["depth"], np.float64)
        - np.asarray(outs[1]["depth"], np.float64)
    ) / np.maximum(np.asarray(outs[1]["depth"], np.float64), 1e-3)
    assert np.quantile(d_rel, 0.99) < 0.05, np.quantile(d_rel, 0.99)
