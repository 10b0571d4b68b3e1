"""`falign()` — the pyvoldor-compatible frame-alignment entry point.

Signature, shapes and return dict match the reference Cython binding
(slam_py/install/pyvoldor_full.pyx:88-154 -> frame-alignment/
py_export.cpp:4-89).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from voldor_tpu.falign.residual import precompute_maps
from voldor_tpu.falign.solver import align_scores, lm_solve


def falign(
    depths: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    weights: np.ndarray | None = None,
    images: np.ndarray | None = None,
    poses_init: np.ndarray | None = None,
    connectivity: np.ndarray | None = None,
    vbf: float = 1000.0,
    crw: float = 10.0,
    optimize_7dof: bool = False,
    graduated_optmize: bool = False,  # accepted for compat; unused upstream too
    stride: int = 4,
    consistency_residual_bound: float = 1.0,
    debug: bool = False,
) -> dict:
    """Dense pairwise alignment of N keyframes.

    depths: (N, h, w); weights/images: (N, h, w); poses_init: (N, 6)
    cam->world [rvec, tvec]; connectivity: flat (ref, tar) pairs terminated
    by -1 (py_export.cpp:38-52), default fully connected.

    Returns {'poses_ret' (N, 6), 'poses_covar' (N, 7, 7) if optimize_7dof
    else (N, 6, 6), 'scaling_factor' (N,), 'visibility_mat' (N, N),
    'consistency_mat' (N, N)} with NaN matrix entries where unconnected.
    """
    depths = np.ascontiguousarray(depths, np.float32)
    N, h, w = depths.shape
    use_photo = images is not None and crw > 0

    if connectivity is not None:
        flat = list(np.asarray(connectivity).ravel())
        pairs = []
        i = 0
        while i < len(flat) and flat[i] != -1:
            pairs.append((int(flat[i]), int(flat[i + 1])))
            i += 2
    else:
        pairs = [(r, t) for r in range(N) for t in range(N) if r != t]
    pair_set = set(pairs)
    biconnected = np.asarray([(t, r) in pair_set for (r, t) in pairs], bool)
    pairs_np = np.asarray(pairs, np.int32)

    params0 = np.zeros((N, 9), np.float32)
    if poses_init is not None:
        params0[:, :6] = np.asarray(poses_init, np.float32)

    # Active parameter dims per frame: pose always; depth scale if 7dof;
    # color if photo. (In 7-dof mode the solver additionally soft-fixes the
    # mean log-scale — see lm_solve's gauge term.)
    dim_mask = np.zeros((N, 9), np.float32)
    dim_mask[:, :6] = 1.0
    if optimize_7dof:
        dim_mask[:, 6] = 1.0
    if use_photo:
        dim_mask[:, 7:9] = 1.0

    maps, bounds = precompute_maps(
        jnp.asarray(depths),
        None if weights is None else jnp.asarray(np.ascontiguousarray(weights, np.float32)),
        None if images is None else jnp.asarray(np.ascontiguousarray(images, np.float32)),
        fx, fy, cx, cy,
    )
    intr = (jnp.float32(fx), jnp.float32(fy), jnp.float32(cx), jnp.float32(cy))

    # Per-connected-component scale-gauge rows (see lm_solve): union-find
    # over the pair graph, one indicator row per component's scale dims.
    gauge_U = None
    if optimize_7dof:
        parent = list(range(N))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for r, t in pairs:
            ra, rb = find(r), find(t)
            if ra != rb:
                parent[ra] = rb
        comp_of = {}
        rows = []
        for i in range(N):
            if not any(i in p for p in pairs):
                continue  # isolated frame: no residuals, no gauge
            r = find(i)
            if r not in comp_of:
                comp_of[r] = len(rows)
                rows.append(np.zeros(N * 9, np.float32))
            rows[comp_of[r]][i * 9 + 6] = 1.0
        gauge_U = jnp.asarray(
            np.stack(rows) if rows else np.zeros((0, N * 9), np.float32)
        )

    res = lm_solve(
        jnp.asarray(params0),
        jnp.asarray(pairs_np),
        jnp.asarray(biconnected),
        maps,
        intr,
        jnp.float32(vbf),
        jnp.float32(crw),
        jnp.asarray(dim_mask),
        gauge_U,
        use_photo=use_photo,
        stride=int(stride),
        bounds=bounds,
        n_frames=N,
    )
    params = np.asarray(res.params)
    covars9 = np.asarray(res.covars)

    d = 7 if optimize_7dof else 6
    poses_covar = np.zeros((N, d, d), np.float32)
    poses_covar[:, :6, :6] = covars9[:, :6, :6]
    if optimize_7dof:
        # Ceres only extracts the (pose, pose) and (scale, scale) blocks
        # (align_frame.cpp:174-195); cross terms stay zero.
        poses_covar[:, 6, 6] = covars9[:, 6, 6]

    vis, cons = align_scores(
        res.params,
        jnp.asarray(pairs_np),
        maps,
        intr,
        jnp.float32(vbf),
        jnp.float32(crw),
        use_photo,
        jnp.float32(consistency_residual_bound),
        bounds,
        stride=int(stride),
    )
    vis = np.asarray(vis)
    cons = np.asarray(cons)
    visibility_mat = np.full((N, N), np.nan, np.float32)
    consistency_mat = np.full((N, N), np.nan, np.float32)
    for k, (r, t) in enumerate(pairs):
        visibility_mat[r, t] = vis[k]
        consistency_mat[r, t] = cons[k]

    scaling = np.exp(params[:, 6]) if optimize_7dof else np.ones(N, np.float32)
    return {
        "poses_ret": params[:, :6].astype(np.float32),
        "poses_covar": poses_covar,
        "scaling_factor": scaling.astype(np.float32),
        "visibility_mat": visibility_mat,
        "consistency_mat": consistency_mat,
    }


def _pairs_solve_compact(
    params0_b, maps_b, intr, vbf, crw, dim_mask, gauge_U, bound,
    *, use_photo, stride, bounds, max_iters=100, coarse_stride=0,
    coarse_iters=0, chunk_coarse=16, chunk_fine=8,
):
    """Independent 2-frame LMs over a (P, 2, ...) batch with per-lane
    convergence COMPACTION.

    A vmapped while_loop runs every lane's body until the SLOWEST lane
    converges — converged lanes freeze via select but still pay full
    compute (docs/PERF_FALIGN.json: per-lane 16..91 iterations in one
    16-batch, ~1.9x lockstep waste). Here each c2f phase dispatches in
    iteration CHUNKS (lm_chunk_pairs carries resumable per-lane LM state);
    after each chunk the host reads the tiny done flags and re-dispatches
    only the survivors, dropping to the {4} bucket when few remain. Chunk
    size is traced, so the executable lattice stays
    {bucket} x {phase stride} x {photo} — matching the reference's
    per-problem Ceres convergence (align_frame.cpp:142-159: each pair
    pays exactly its own iterations).

    Returns (params (P,2,9), covars, vis, cons, iters (P,), iters_coarse
    (P,)) — per-lane TRUE iteration counts."""
    from voldor_tpu.falign.solver import (PairLmState, lm_chunk_pairs,
                                          pairs_finalize, pairs_phase_init)

    P = params0_b.shape[0]
    # DEVICE-RESIDENT full-batch LM state with one dummy row (index P):
    # chunk dispatches gather/scatter on device; only a packed (2, Pb)
    # [done, it] array crosses to the host per chunk. Padding lanes
    # scatter into the dummy row, so live rows never alias.
    state = PairLmState(
        params=jnp.concatenate(
            [jnp.asarray(params0_b, jnp.float32),
             jnp.zeros((1, 2, 9), jnp.float32)]),
        lam=jnp.full((P + 1,), 1e-3, jnp.float32),
        cost=jnp.zeros((P + 1,), jnp.float32),
        H=jnp.zeros((P + 1, 18, 18), jnp.float32),
        g=jnp.zeros((P + 1, 18), jnp.float32),
        it=jnp.zeros((P + 1,), jnp.int32),
        done=jnp.zeros((P + 1,), bool),
        w2=jnp.zeros((P + 1,), jnp.float32),
        fresh=jnp.zeros((P + 1,), bool),
    )
    it_host = np.zeros(P, np.int32)

    phases = []
    if coarse_stride > stride and coarse_iters > 0:
        phases.append((coarse_stride, coarse_iters, chunk_coarse))
    phases.append((stride, max_iters, chunk_fine))

    def bucket(live):
        Pb = 4 if live.size <= 4 else 16
        idx_s = np.concatenate(
            [live, np.full(Pb - live.size, P)]).astype(np.int32)
        idx_m = np.concatenate(
            [live, np.full(Pb - live.size, live[0])]).astype(np.int32)
        pad = np.zeros(Pb, bool)
        pad[live.size:] = True
        return jnp.asarray(idx_s), jnp.asarray(idx_m), jnp.asarray(pad)

    phase_iters = []
    for stride_p, budget, chunk in phases:
        done = np.zeros(P, bool)
        it_host[:] = 0
        live = np.arange(P)
        # one linearize at phase entry fills (cost, H, g) on THIS phase's
        # grid and resets lam/w2/it/done — chunks then resume from the
        # carried normal equations (the LM body linearizes only at trial
        # points); nothing crosses to the host here
        idx_s, idx_m, _ = bucket(live)
        state = pairs_phase_init(
            state, maps_b, idx_s, idx_m, intr, vbf, crw, dim_mask,
            gauge_U, use_photo=use_photo, stride=stride_p, bounds=bounds,
        )
        used = 0
        while live.size and used < budget:
            step_iters = min(chunk, budget - used)
            idx_s, idx_m, pad = bucket(live)
            state, stats = lm_chunk_pairs(
                state, maps_b, idx_s, idx_m, pad, intr, vbf, crw, dim_mask,
                gauge_U, jnp.int32(step_iters), use_photo=use_photo,
                stride=stride_p, bounds=bounds,
            )
            stats = np.asarray(stats)  # the one per-chunk D2H
            k = live.size
            done[live] = stats[0, :k] != 0
            it_host[live] = stats[1, :k]
            used += step_iters
            live = live[~done[live]]
        phase_iters.append(it_host.copy())

    params_dev = state.params[:P]
    covars, ok, vis, cons = pairs_finalize(
        params_dev, maps_b, intr, vbf, crw, dim_mask, bound,
        use_photo=use_photo, stride=stride, bounds=bounds,
    )
    iters_fine = phase_iters[-1]
    iters_coarse = phase_iters[0] if len(phases) == 2 else np.zeros(P, np.int32)
    return (params_dev, covars, vis, cons, iters_fine, iters_coarse)


def falign_pairs(
    depths: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    weights: np.ndarray | None = None,
    images: np.ndarray | None = None,
    poses_init: np.ndarray | None = None,
    vbf: float = 1000.0,
    crw: float = 10.0,
    optimize_7dof: bool = False,
    stride: int = 4,
    consistency_residual_bound: float = 1.0,
    coarse_stride: int = 0,
    fine_iters: int = 100,
    coarse_iters: int = 100,
) -> list[dict]:
    """Batch of P INDEPENDENT two-frame alignment problems in one dispatch.

    The TPU-native mapping-scheduler path (SURVEY 2.8 task-parallel): the
    reference issues each keyframe-pair falign through a host thread pool
    one GPU problem at a time (voldor_slam.py:790-800); here the P pairs
    ride a batch axis of the 2-frame LM.

    depths: (P, 2, h, w); weights/images optional same shape;
    poses_init: (P, 2, 6). Returns a list of P dicts, each with the same
    keys/shapes as falign() on that 2-frame problem, plus per-pair
    ``iters`` (fine-grid LM iterations — the basis for per-iteration
    metrics) and ``iters_coarse`` (coarse-grid iterations, 0 without c2f).

    coarse_stride > stride enables the coarse-to-fine LM schedule (see
    lm_solve): up to ``coarse_iters`` cheap iterations at coarse_stride,
    then at most ``fine_iters`` at ``stride``. Scores/covariances always
    come from the fine stride.
    """
    depths = np.ascontiguousarray(depths, np.float32)
    P, two, h, w = depths.shape
    assert two == 2
    use_photo = images is not None and crw > 0

    def flat(a):
        return None if a is None else jnp.asarray(
            np.ascontiguousarray(a, np.float32).reshape(P * 2, h, w)
        )

    maps_flat, bounds = precompute_maps(
        flat(depths), flat(weights), flat(images), fx, fy, cx, cy
    )
    maps_b = jax.tree_util.tree_map(
        lambda a: a.reshape(P, 2, *a.shape[1:]), maps_flat
    )

    params0 = np.zeros((P, 2, 9), np.float32)
    if poses_init is not None:
        params0[:, :, :6] = np.asarray(poses_init, np.float32)

    dim_mask = np.zeros((2, 9), np.float32)
    dim_mask[:, :6] = 1.0
    if optimize_7dof:
        dim_mask[:, 6] = 1.0
    if use_photo:
        dim_mask[:, 7:9] = 1.0
    gauge_U = np.zeros((1 if optimize_7dof else 0, 18), np.float32)
    if optimize_7dof:
        gauge_U[0, 6] = 1.0
        gauge_U[0, 15] = 1.0

    intr = (jnp.float32(fx), jnp.float32(fy), jnp.float32(cx), jnp.float32(cy))
    params_b, covars_b, vis_b, cons_b, iters_b, citers_b = _pairs_solve_compact(
        jnp.asarray(params0), maps_b, intr, jnp.float32(vbf),
        jnp.float32(crw), jnp.asarray(dim_mask), jnp.asarray(gauge_U),
        jnp.float32(consistency_residual_bound),
        use_photo=use_photo, stride=int(stride), bounds=bounds,
        max_iters=int(fine_iters),
        coarse_stride=int(coarse_stride),
        coarse_iters=int(coarse_iters) if coarse_stride > stride else 0,
    )
    params_b = np.asarray(params_b)
    covars_b = np.asarray(covars_b)
    vis_b = np.asarray(vis_b)
    cons_b = np.asarray(cons_b)

    d = 7 if optimize_7dof else 6
    out = []
    for i in range(P):
        poses_covar = np.zeros((2, d, d), np.float32)
        poses_covar[:, :6, :6] = covars_b[i, :, :6, :6]
        if optimize_7dof:
            poses_covar[:, 6, 6] = covars_b[i, :, 6, 6]
        vm = np.full((2, 2), np.nan, np.float32)
        cm = np.full((2, 2), np.nan, np.float32)
        vm[0, 1], vm[1, 0] = vis_b[i, 0], vis_b[i, 1]
        cm[0, 1], cm[1, 0] = cons_b[i, 0], cons_b[i, 1]
        scaling = (np.exp(params_b[i, :, 6]) if optimize_7dof
                   else np.ones(2, np.float32))
        out.append({
            "poses_ret": params_b[i, :, :6],
            "poses_covar": poses_covar,
            "scaling_factor": scaling,
            "visibility_mat": vm,
            "consistency_mat": cm,
            "iters": int(iters_b[i]),
            "iters_coarse": int(citers_b[i]),
        })
    return out
