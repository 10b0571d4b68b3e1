"""Device-mesh sharding of the VO EM step.

The reference is single-GPU (SURVEY.md 2.8); the TPU-native scaling axes we
add are:

  * sp (spatial): the pixel grid's row axis — depth / rigidness / flow maps
    shard across chips, XLA inserts halo/all-gather collectives for the
    bilinear samplers;
  * hyp (hypothesis / data-parallel): the 8192 P3P pose hypotheses — each
    chip solves its slice of minimal problems, and meanshift / robust-
    Gaussian reductions become cross-chip psums automatically.

Both axes ride on one jit with NamedSharding annotations (+ shard_hints on
the hypothesis pools, parallel/hints.py) — no hand-written collectives.

Validation status: both axes are CORRECTNESS-verified (driver multichip
dryrun + tests/test_multichip.py consistency at KITTI-shaped windows on an
8-device CPU mesh) but PERF-unmeasured on real multi-chip hardware — this
environment exposes a single physical TPU chip, so no cross-chip speedup
claim is made anywhere; treat the `hyp` axis as a scaling design, not a
measured win.
`multichip_solve` runs the engine's FULL fused solve loop over the mesh;
`multichip_em_step` is the single-EM-step variant kept for fine-grained
consistency tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from voldor_tpu.config import VoldorConfig
from voldor_tpu.parallel.hints import active_mesh
from voldor_tpu.vo import em
from voldor_tpu.vo.engine import _depth_round, _get_solve_fn
from voldor_tpu.vo.pose_step import optimize_camera_pose


def make_mesh(n_devices: int | None = None, axis: str = "sp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(n_sp: int, n_hyp: int) -> Mesh:
    """2-D mesh: pixel rows shard over `sp`, P4P hypotheses over `hyp`."""
    devs = jax.devices()[: n_sp * n_hyp]
    return Mesh(np.asarray(devs).reshape(n_sp, n_hyp), ("sp", "hyp"))


def shard_window(mesh: Mesh, flows, rigidness, depth):
    """Place the window state row-sharded over the mesh's sp axis."""
    s_flows = NamedSharding(mesh, P(None, "sp", None, None))
    s_rig = NamedSharding(mesh, P(None, "sp", None))
    s_depth = NamedSharding(mesh, P("sp", None))
    return (
        jax.device_put(flows, s_flows),
        jax.device_put(rigidness, s_rig),
        jax.device_put(depth, s_depth),
    )


def multichip_solve(
    mesh: Mesh, cfg: VoldorConfig, flows, depth, poses6, seed=None
):
    """The FULL fused EM solve (engine._get_solve_fn's while_loop — camera
    sweeps with truncation, depth rounds, gauge normalization) executed over
    a device mesh.

    Maps shard across the mesh's `sp` (row) axis; on a 2-D `sp`×`hyp` mesh
    the P4P hypothesis pools additionally partition across `hyp`
    (pose_step shard_hints). Inputs are numpy/jnp on host or any device;
    returns the engine state dict (depth, rigidness, poses6, covars, ...)
    with mesh shardings. Single-chip semantics are identical — the driver
    dryrun and tests/test_multichip.py compare the two.

    Production grids rarely divide the sp axis (KITTI's demo compute grid
    is 185 rows; NamedSharding needs divisibility), so the row axis is
    padded up to a multiple of _ROW_BLOCK with INERT rows — flow 0,
    depth 0 (below pose_sample_min_depth, so collect_p3p_instances marks
    every padded pixel invalid and it can never enter the P4P pool),
    rigidness 0 — and every output is cropped back. The block is FIXED
    (not the mesh's sp extent) so results are identical across mesh sizes
    with sp ≤ _ROW_BLOCK; larger sp extents round the block up (numerics
    then differ from smaller meshes only through the padded-row count's
    effect on the correspondence-draw index space)."""
    import jax.numpy as jnp

    N, h, w = flows.shape[:3]
    fn = _get_solve_fn(cfg, has_disparity=False, use_priors=False)

    sp_size = mesh.shape.get("sp", 1)
    block = _ROW_BLOCK
    while block < sp_size:
        block *= 2
    hp = -(-h // block) * block
    if hp != h:
        pad = ((0, 0), (0, hp - h), (0, 0), (0, 0))
        flows = jnp.pad(jnp.asarray(flows, jnp.float32), pad)
        depth = jnp.pad(jnp.asarray(depth, jnp.float32), ((0, hp - h), (0, 0)))
        rig0 = jnp.pad(
            jnp.ones((N, h, w), jnp.float32), ((0, 0), (0, hp - h), (0, 0))
        )
    else:
        rig0 = jnp.ones((N, h, w), jnp.float32)

    s_maps = NamedSharding(mesh, P(None, "sp", None))  # (N, h, w)
    s_flows = NamedSharding(mesh, P(None, "sp", None, None))
    s_depth = NamedSharding(mesh, P("sp", None))
    rep = NamedSharding(mesh, P())

    flows = jax.device_put(jnp.asarray(flows), s_flows)
    depth = jax.device_put(jnp.asarray(depth), s_depth)
    rigidness = jax.device_put(rig0, s_maps)
    z0 = jax.device_put(jnp.zeros((0, h, w), jnp.float32), rep)
    zp = jax.device_put(jnp.zeros((0, 6), jnp.float32), rep)
    poses6 = jax.device_put(jnp.asarray(poses6, jnp.float32), rep)
    covars = jax.device_put(jnp.zeros((N, 6, 6), jnp.float32), rep)
    dens = jax.device_put(jnp.zeros(N, jnp.float32), rep)
    counts = jax.device_put(jnp.zeros(N, jnp.int32), rep)

    with active_mesh(mesh):
        st = fn(
            depth, flows, rigidness, z0, z0, z0, zp,
            poses6, covars, dens, counts,
            np.int32(N), np.uint32(cfg.seed if seed is None else seed),
        )
    jax.block_until_ready(st)
    if hp != h:
        st = {k: _crop_rows(v, hp, h) for k, v in st.items()}
    return st


_ROW_BLOCK = 8


def _crop_rows(v, hp: int, h: int):
    """Crop every axis of size hp (the padded row count) back to h. Safe as
    long as no other dimension coincidentally equals hp — engine state maps
    are (hp, w) / (K, hp, w) / (K, hp, w, C) with w >> N."""
    if not hasattr(v, "ndim") or v.ndim == 0:
        return v
    idx = tuple(
        slice(0, h) if s == hp else slice(None) for s in v.shape
    )
    return v[idx]


def multichip_em_step(mesh: Mesh, cfg: VoldorConfig, flows, rigidness, depth, poses6):
    """One sharded EM step: pose step (frame 0) + depth round.

    flows (N, h, w, 2), rigidness (N, h, w), depth (h, w) are expected
    row-sharded (see shard_window); poses6 (N, 6) replicated. Returns
    (poses6, pose_covars, depth, rigidness) with the same shardings.
    """
    params = em.EmParams.from_config(cfg, has_disparity=False)
    N = flows.shape[0]
    covars = jax.device_put(
        jnp.zeros((N, 6, 6), jnp.float32), NamedSharding(mesh, P())
    )
    poses6 = jax.device_put(jnp.asarray(poses6), NamedSharding(mesh, P()))

    res = optimize_camera_pose(
        depth,
        flows,
        rigidness,
        poses6,
        covars,
        jnp.int32(0),
        jnp.bool_(False),
        jnp.bool_(True),
        np.uint32(cfg.seed),
        params,
        n_poses_to_sample=cfg.n_poses_to_sample,
    )

    dp0 = jax.device_put(
        jnp.zeros((0, depth.shape[0], depth.shape[1]), jnp.float32),
        NamedSharding(mesh, P()),
    )
    dpp0 = jax.device_put(jnp.zeros((0, 6), jnp.float32), NamedSharding(mesh, P()))
    depth, rigidness, _ = _depth_round(
        depth,
        flows,
        rigidness,
        res.poses6,
        dp0,
        dp0,
        dp0,
        dpp0,
        jnp.int32(N),
        params,
        np.uint32(cfg.seed + 1),
        jnp.float32(cfg.fb_emm),
        jnp.float32(cfg.fb_no_change_prob),
        jnp.float32(cfg.depth_range_factor),
        n_rand=cfg.depth_rand_samples,
        gstep=cfg.depth_global_prop_step,
        lwidth=cfg.depth_local_prop_width,
        mode=cfg.depth_local_prop_mode,
        fb=bool(cfg.fb_smooth),
        rig_only=False,
        use_flows=True,
        use_priors=False,
        tracked=cfg.depth_cost_mode in ("tracked", "anchored"),
    )
    return res.poses6, res.pose_covars, depth, rigidness
