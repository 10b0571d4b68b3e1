"""Levenberg-Marquardt solver for dense frame alignment.

Replaces Ceres (frame-alignment/align_frame.cpp:94-195) with a jitted joint
LM. The reference only parameterizes the *ref* frame of each residual block
and reads the tar frame from the global iterate (align_frame_cost_fun.h:
164-166 + update_state_every_iteration, align_frame.cpp:143) — a
Gauss-Seidel scheme that we found stalls above the true optimum on coupled
modes (e.g. the joint scene-scale direction in 7-dof mode). Here the
Jacobian is taken w.r.t. BOTH frames of every pair (jax.jacfwd through the
residual) and all frames solve jointly; the global SE(3)(+scale) gauge
freedom is absorbed by LM damping around the initialization. This also
removes the reference's biconnected-pair jacobian-doubling quirk
(align_frame_cost_fun.h:178-180), which existed only to compensate the
one-sided scheme.

Where the reference serializes per-pair GPU evaluations behind a mutex,
all pairs evaluate as one vmapped batch — the main architectural win for
TPU.

Covariances keep the reference's semantics: per-frame blocks of inv(JtJ)
with only the (pose, pose) and (scale, scale) blocks reported
(align_frame.cpp:166-195).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from voldor_tpu.falign.residual import (FrameMaps, pair_residual_and_grads,
                                        pair_residual_map)


class FalignResult(NamedTuple):
    params: jax.Array  # (N, 9)
    covars: jax.Array  # (N, 9, 9); zeros where unreliable
    covar_ok: jax.Array  # (N,) bool
    cost: jax.Array
    iters: jax.Array  # fine-grid LM iterations (per-iteration metrics basis)
    iters_coarse: jax.Array  # coarse-grid iterations (0 without c2f)


class PairLmState(NamedTuple):
    """Resumable per-lane LM state for the chunked batched-pair solver
    (lm_chunk_pairs). One entry per lane of a (P, 2, ...) pair batch.

    H/g carry the normal equations AT params (raw, no gauge/damping):
    the LM body linearizes at the TRIAL point only (one residual+grads
    pass per iteration instead of res+grads at current plus res-only at
    trial) and reuses the carried system on rejects, which also makes a
    rejected step nearly free (re-solve of the damped 18x18 system)."""

    params: jax.Array  # (P, 2, 9)
    lam: jax.Array  # (P,) LM damping
    cost: jax.Array  # (P,) raw cost at params on the CURRENT phase grid
    H: jax.Array  # (P, 18, 18) normal matrix at params (raw)
    g: jax.Array  # (P, 18) gradient at params
    it: jax.Array  # (P,) int32 iterations done in the current phase
    done: jax.Array  # (P,) bool: lane converged (phase-local)
    w2: jax.Array  # (P,) gauge weight (0 = derive from next Hessian)
    fresh: jax.Array  # (P,) bool: cost/H/g not yet evaluated on this grid


def _pair_res_and_jacs(params, pairs, maps, intr, vbf, crw, use_photo, stride, bounds, dim_mask):
    """Residuals (P, hs, ws) and Jacobians w.r.t. ref and tar params
    ((P, hs, ws, 9) each) — the hand-derived one-pass chain rule
    (residual.pair_residual_and_grads). The previous 18-tangent forward-
    mode linearize (_pair_res_and_jacs_ad, kept below as the test oracle)
    measured HBM/traffic-bound on TPU (docs/MFU.json falign_lm_step_p16:
    ~106% of nominal HBM peak): each tangent replay re-walks the sampled
    maps. The analytic form gathers once and reverse-chains a single
    3-vector per point."""
    fx, fy, cx, cy = intr

    def one(pr, pt, ref, tar):
        return pair_residual_and_grads(
            pr, pt, ref, tar, maps, fx, fy, cx, cy, vbf, crw, use_photo,
            stride, bounds,
        )

    res, Jr, Jt = jax.vmap(one)(
        params[pairs[:, 0]], params[pairs[:, 1]], pairs[:, 0], pairs[:, 1]
    )
    # dim_mask is per-frame (N, 9): select each pair's side mask
    mask_r = dim_mask[pairs[:, 0]][:, None, None, :]
    mask_t = dim_mask[pairs[:, 1]][:, None, None, :]
    return res, Jr * mask_r, Jt * mask_t


def _pair_res_and_jacs_ad(params, pairs, maps, intr, vbf, crw, use_photo,
                          stride, bounds, dim_mask):
    """Forward-mode oracle for _pair_res_and_jacs: ONE linearize over the
    concatenated 18-dim pair parameter vector, J columns from unit-tangent
    replays. Used by tests/test_falign.py to verify the analytic chain
    rule; not on the hot path."""
    fx, fy, cx, cy = intr

    def one(pr, pt, ref, tar):
        def f18(p18):
            r, _ = pair_residual_map(
                p18[:9], p18[9:], ref, tar, maps, fx, fy, cx, cy, vbf, crw,
                use_photo, stride, bounds,
            )
            return r

        res, jvp = jax.linearize(f18, jnp.concatenate([pr, pt]))
        J = jax.vmap(jvp)(jnp.eye(18, dtype=res.dtype))  # (18, hs, ws)
        return res, jnp.moveaxis(J[:9], 0, -1), jnp.moveaxis(J[9:], 0, -1)

    res, Jr, Jt = jax.vmap(one)(
        params[pairs[:, 0]], params[pairs[:, 1]], pairs[:, 0], pairs[:, 1]
    )
    mask_r = dim_mask[pairs[:, 0]][:, None, None, :]
    mask_t = dim_mask[pairs[:, 1]][:, None, None, :]
    return res, Jr * mask_r, Jt * mask_t


def _make_lm_step(pairs, maps, intr, vbf, crw, use_photo, stride_p, bounds,
                  dim_mask, gauge_U, n_frames):
    """Build (body, init_fn, cost_fn) for one damped-LM iteration on the
    stride_p residual grid over `pairs`.

    State: (params, lam, cost, H, g, it, done, w2). `cost` is the RAW
    cost at params on this grid (gauge term added only for step
    comparisons); H/g are the RAW normal equations AT params. The body
    linearizes at the TRIAL point only — its residual pass yields the
    trial cost AND the trial normal equations, which become the carried
    system on accept — so each iteration pays ONE residual+grads sweep
    (the old body paid res+grads at current plus a res-only trial eval),
    and a rejected step re-solves the carried 18x18/NxN system at higher
    damping without touching the residual maps at all. The LM iterates
    are mathematically identical to the recompute-at-current scheme.

    w2 == 0 means "derive the gauge weight from this state's Hessian"
    (a positive w2 is then carried unchanged), which makes the state
    resumable across dispatches (lm_chunk_pairs) — with no scale dims in
    gauge_U the weight is identically zero and the term vanishes."""
    N = n_frames
    D = N * 9
    fx, fy, cx, cy = intr
    inactive = (1.0 - dim_mask).reshape(-1)

    def cost_fn(params):
        def one(pr, pt, ref, tar):
            r, _ = pair_residual_map(
                pr, pt, ref, tar, maps, fx, fy, cx, cy, vbf, crw, use_photo,
                stride_p, bounds,
            )
            return jnp.sum(r * r)

        return 0.5 * jnp.sum(
            jax.vmap(one)(
                params[pairs[:, 0]], params[pairs[:, 1]], pairs[:, 0],
                pairs[:, 1],
            )
        )

    def linearize(params):
        """(cost, H, g) at params — one residual+grads sweep."""
        res, Jr, Jt = _pair_res_and_jacs(
            params, pairs, maps, intr, vbf, crw, use_photo, stride_p,
            bounds, dim_mask,
        )
        H, g = _joint_normal_eq(res, Jr, Jt, pairs, N)
        return 0.5 * jnp.sum(res * res), H, g

    n_scale = jnp.maximum(jnp.sum(gauge_U), 1.0)
    u_any = jnp.sum(gauge_U, axis=0)  # (D,) union of scale dims

    def gauge_w2(H):
        return jnp.sum(jnp.diag(H) * u_any) / n_scale

    def gauge_cost(w2, params):
        s_sums = gauge_U @ params.reshape(-1)
        return 0.5 * w2 * jnp.sum(s_sums * s_sums)

    def init_fn(params):
        cost, H, g = linearize(params)
        return cost, H, g

    def body(state):
        params, lam, cost, H, g, it, done, w2 = state
        w2 = jnp.where(w2 > 0, w2, gauge_w2(H))
        s_sums = gauge_U @ params.reshape(-1)
        Hg = H + w2 * (gauge_U.T @ gauge_U)
        gg = g + w2 * (gauge_U.T @ s_sums)
        diag = jnp.maximum(jnp.diag(Hg), 1e-8)
        damped = Hg + jnp.diag(lam * diag + inactive)

        L = jnp.linalg.cholesky(damped)
        ok = jnp.all(jnp.isfinite(L))
        Lsafe = jnp.where(ok, L, jnp.eye(D))
        step = jax.scipy.linalg.cho_solve((Lsafe, True), gg)
        step_m = step.reshape(N, 9) * dim_mask
        trial = params - step_m
        trial_cost, H_t, g_t = linearize(trial)
        new_cost = trial_cost + gauge_cost(w2, trial)
        cur_cost = cost + gauge_cost(w2, params)
        accept = ok & jnp.isfinite(new_cost) & (new_cost < cur_cost)
        # Gain-ratio (Nielsen) damping: rho compares the achieved cost drop
        # to the quadratic model's prediction 0.5*s'(lam*D*s + g). A
        # fixed /3 decrease on every accept drives lam to the floor and
        # sets up accept->reject oscillation; scaling the decrease by rho
        # keeps lam where the model is honest. Reject multiplies by 4.
        sm = step_m.reshape(-1)
        pred = 0.5 * (jnp.sum(sm * (lam * diag * sm)) + jnp.sum(sm * gg))
        rho = (cur_cost - new_cost) / jnp.maximum(pred, 1e-30)
        dec = jnp.clip(1.0 - (2.0 * rho - 1.0) ** 3, 1.0 / 3.0, 1.0)
        lam = jnp.where(accept, jnp.maximum(lam * dec, 1e-7), lam * 4.0)
        rel_drop = (cur_cost - new_cost) / jnp.maximum(cur_cost, 1e-30)
        # Stopping: cost plateau (Ceres function_tolerance analog — 1e-5
        # is enough for the downstream consistency/visibility gates and
        # PGO edges; lanes spent 80-100 lockstep iterations shaving
        # <0.1% cost at 1e-6, docs/PERF_FALIGN.json), negligible
        # parameter step — on accept OR reject (a REJECTED tiny step means
        # no descent exists at this scale; without it a converged lane
        # burns ~27 iterations climbing lam from 1e-7 to 1e9 in pure
        # rejects — the long per-lane tails of PERF_FALIGN.json), or
        # damping blow-up (1e6: ~13 more rejects past any accept scale).
        step_inf = jnp.max(jnp.abs(step_m))
        done = ((accept & (rel_drop < 1e-5))
                | (accept & (step_inf < 1e-4))
                | ((~accept) & (step_inf < 3e-5))
                | (lam > 1e6))
        cost = jnp.where(accept, trial_cost, cost)
        params = jnp.where(accept, trial, params)
        H = jnp.where(accept, H_t, H)
        g = jnp.where(accept, g_t, g)
        return params, lam, cost, H, g, it + 1, done, w2

    return body, init_fn, cost_fn


def _joint_normal_eq(res, Jr, Jt, pairs, n_frames):
    """Full (N*9, N*9) JtJ and (N*9,) gradient from per-pair Jacobians."""
    P = pairs.shape[0]
    m = res.shape[1] * res.shape[2]
    Jr = Jr.reshape(P, m, 9)
    Jt = Jt.reshape(P, m, 9)
    r = res.reshape(P, m)

    oh_r = jax.nn.one_hot(pairs[:, 0], n_frames, dtype=res.dtype)  # (P, N)
    oh_t = jax.nn.one_hot(pairs[:, 1], n_frames, dtype=res.dtype)

    # Block accumulations via einsum over the pair axis.
    Hrr = jnp.einsum("pa,pb,pki,pkj->aibj", oh_r, oh_r, Jr, Jr)
    Hrt = jnp.einsum("pa,pb,pki,pkj->aibj", oh_r, oh_t, Jr, Jt)
    Htt = jnp.einsum("pa,pb,pki,pkj->aibj", oh_t, oh_t, Jt, Jt)
    H = Hrr + Hrt + jnp.swapaxes(jnp.swapaxes(Hrt, 0, 2), 1, 3) + Htt
    g = jnp.einsum("pa,pki,pk->ai", oh_r, Jr, r) + jnp.einsum(
        "pa,pki,pk->ai", oh_t, Jt, r
    )
    D = n_frames * 9
    return H.reshape(D, D), g.reshape(D)


@partial(
    jax.jit,
    static_argnames=(
        "use_photo", "stride", "max_iters", "n_frames", "bounds",
        "coarse_stride", "coarse_iters",
    ),
)
def lm_solve(
    params0,
    pairs,
    biconnected,  # kept for API stability; unused by the joint scheme
    maps: FrameMaps,
    intr,
    vbf,
    crw,
    dim_mask,
    gauge_U=None,
    *,
    use_photo: bool,
    stride: int,
    bounds: tuple[int, int],
    max_iters: int = 100,
    n_frames: int = 0,
    coarse_stride: int = 0,
    coarse_iters: int = 0,
) -> FalignResult:
    """Jointly damped LM; one residual trial per iteration.

    gauge_U: optional (K, N*9) indicator rows — one per connected component
    of the pair graph, marking that component's active scale dims (see the
    gauge-regularizer comment below). None disables the gauge term.

    coarse_stride/coarse_iters: optional coarse-to-fine schedule. When both
    are set, the solve first runs up to ``coarse_iters`` LM iterations on
    the ``coarse_stride``-subsampled residual grid (a strictly cheaper
    program — pixel count scales as 1/stride^2), then polishes at ``stride``
    with the remaining ``max_iters`` budget. The coarse phase carries the
    bulk of the convergence distance, so the expensive fine phase runs only
    a handful of iterations; the reported covariance, scores, and stopping
    semantics are all evaluated at the fine stride exactly as the
    single-phase solve. Measured on the SLAM link workload this halves the
    batch wall time at equal final cost (docs/PERF_FALIGN.json)."""
    del biconnected
    N = n_frames or params0.shape[0]
    D = N * 9

    # Scale-gauge regularizer (7-dof only): the disparity-space residuals
    # shrink as a whole constellation inflates (every inverse depth -> 0),
    # so the joint problem has a descent direction along each connected
    # component's common log-scale mode — observed as a ~90x scale +
    # huge-translation blow-up on loop-closure pairs. The reference's
    # one-sided Gauss-Seidel never exposes this direction
    # (align_frame.cpp:143); the joint scheme pins each component SOFTLY
    # with one residual r_k = W * sum_{i in comp k}(s_i) (W from the
    # initial Hessian's typical scale curvature), keeping the well-behaved
    # symmetric convergence of the free parameterization while removing
    # the runaway modes. Relative scales (what the SLAM edges consume) are
    # unaffected. Per-component (not global): independent pairs batched
    # into one solve each have their OWN runaway mode, and a single global
    # sum would let one component inflate while another deflates. (The
    # gauge math lives in _make_lm_step.)
    if gauge_U is None:
        gauge_U = jnp.zeros((0, D), jnp.float32)

    def run_phase(params_in, it0, stride_p, iters_budget):
        """One damped-LM while_loop over the stride_p residual grid.

        it0 (traced) is the global iteration counter at phase entry; the
        gauge weight w2 re-derives from the first Hessian of THIS phase
        (its typical curvature scales with the phase's pixel count —
        _make_lm_step derives it whenever the carried w2 is zero)."""
        body, init_p, _ = _make_lm_step(
            pairs, maps, intr, vbf, crw, use_photo, stride_p, bounds,
            dim_mask, gauge_U, N,
        )

        def cond(state):
            it, done = state[5], state[6]
            return (it < it0 + iters_budget) & (~done)

        init_cost, H0, g0 = init_p(params_in)
        return jax.lax.while_loop(
            cond, body,
            (params_in, jnp.float32(1e-3), init_cost, H0, g0, it0,
             jnp.bool_(False), jnp.float32(0.0)),
        )

    if coarse_stride > stride and coarse_iters > 0:
        out_c = run_phase(params0, jnp.int32(0), coarse_stride, coarse_iters)
        params_c, it_c = out_c[0], out_c[5]
        out_f = run_phase(params_c, it_c, stride, max_iters)
        params, cost, it = out_f[0], out_f[2], out_f[5]
        it_fine = it - it_c
    else:
        out_f = run_phase(params0, jnp.int32(0), stride, max_iters)
        params, cost, it = out_f[0], out_f[2], out_f[5]
        it_c = jnp.int32(0)
        it_fine = it

    covars, ok = _pair_covariances(
        params, pairs, maps, intr, vbf, crw, use_photo, stride, bounds,
        dim_mask, N,
    )
    return FalignResult(params=params, covars=covars, covar_ok=ok, cost=cost,
                        iters=it_fine, iters_coarse=it_c)


def _pair_covariances(params, pairs, maps, intr, vbf, crw, use_photo, stride,
                      bounds, dim_mask, N):
    """Covariance at the optimum: per-frame blocks, ref-side Jacobians only —
    exactly the information the reference's block-diagonal problem exposes
    to ceres::Covariance (align_frame.cpp:166-195)."""
    res, Jr, _ = _pair_res_and_jacs(
        params, pairs, maps, intr, vbf, crw, use_photo, stride, bounds, dim_mask
    )
    P = pairs.shape[0]
    m = res.shape[1] * res.shape[2]
    Jf = Jr.reshape(P, m, 9)
    JtJ_p = jnp.einsum("pki,pkj->pij", Jf, Jf)
    onehot = jax.nn.one_hot(pairs[:, 0], N, dtype=res.dtype)
    JtJ = jnp.einsum("pn,pij->nij", onehot, JtJ_p)
    JtJ_solve = JtJ + jax.vmap(jnp.diag)(1.0 - dim_mask)
    L = jnp.linalg.cholesky(JtJ_solve)
    ok = jnp.all(jnp.isfinite(L), axis=(-2, -1))
    Lsafe = jnp.where(ok[:, None, None], L, jnp.broadcast_to(jnp.eye(9), L.shape))
    covars = jax.vmap(lambda l: jax.scipy.linalg.cho_solve((l, True), jnp.eye(9)))(
        Lsafe
    )
    covars = jnp.where(ok[:, None, None], covars, 0.0)
    return covars, ok


_PAIRS2 = ((0, 1), (1, 0))


@partial(jax.jit, static_argnames=("use_photo", "stride", "bounds"))
def lm_chunk_pairs(state: PairLmState, maps_b, idx_state, idx_maps, pad,
                   intr, vbf, crw, dim_mask, gauge_U, chunk_iters, *,
                   use_photo, stride, bounds):
    """Advance the ``idx`` lanes of a DEVICE-RESIDENT (P+1, 2, ...) pair
    batch state by up to ``chunk_iters`` LM iterations on the ``stride``
    grid, entirely on device: gather live lanes, run the vmapped
    while_loop, scatter results back, and return the updated full state
    plus one tiny packed (2, Pb) [done, it] int32 array — the ONLY
    per-chunk D2H. The previous driver shipped the whole 8-field
    per-lane state host<->device around every chunk (~16 tunnel round
    trips x 10-20 ms on this platform, docs/PLATFORM_NOTES.md), which
    cost more than the chunk's compute at SLAM link workloads.

    idx_state: (Pb,) rows into the (P+1)-row state; padding entries
    point at the dummy row P (their scatter is harmless — no duplicate
    live index — and ``pad`` forces them done). idx_maps: (Pb,) rows
    into the P-row maps (padding entries reuse a live row; maps are
    read-only). chunk_iters is TRACED, so one executable serves every
    chunk size and the host compaction driver (falign/api.py) can
    re-dispatch the unconverged lanes of a 16-bucket into a 4-bucket —
    per-lane results are identical to a single uninterrupted lm_solve
    because the per-lane state is exactly the LM loop state."""
    pairs2 = jnp.asarray(_PAIRS2, jnp.int32)

    st = jax.tree_util.tree_map(lambda a: a[idx_state], state)
    st = st._replace(done=st.done | pad)
    maps_live = jax.tree_util.tree_map(lambda a: a[idx_maps], maps_b)

    def one(st_l: PairLmState, maps):
        body, _, _ = _make_lm_step(
            pairs2, maps, intr, vbf, crw, use_photo, stride, bounds,
            dim_mask, gauge_U, 2,
        )
        it_end = st_l.it + chunk_iters

        def cond(s):
            it, done = s[5], s[6]
            return (it < it_end) & (~done)

        params, lam, cost, H, g, it, done, w2 = jax.lax.while_loop(
            cond, body,
            (st_l.params, st_l.lam, st_l.cost, st_l.H, st_l.g, st_l.it,
             st_l.done, st_l.w2),
        )
        return PairLmState(params=params, lam=lam, cost=cost, H=H, g=g,
                           it=it, done=done, w2=w2, fresh=jnp.bool_(False))

    out = jax.vmap(one)(st, maps_live)
    new_state = jax.tree_util.tree_map(
        lambda full, new: full.at[idx_state].set(new), state, out
    )
    stats = jnp.stack([out.done.astype(jnp.int32), out.it])
    return new_state, stats


@partial(jax.jit, static_argnames=("use_photo", "stride", "bounds"))
def pairs_phase_init(state: PairLmState, maps_b, idx_state, idx_maps, intr,
                     vbf, crw, dim_mask, gauge_U, *, use_photo, stride,
                     bounds):
    """Reset the ``idx`` lanes of the device-resident state for a new c2f
    phase: one linearize at params on THIS phase's grid fills (cost, H,
    g); lam/w2/it/done reset. Returns the updated full state — nothing
    crosses to the host (fresh-ness is per-PHASE: the driver calls this
    once when a phase starts, chunks resume from carried normal
    equations)."""
    pairs2 = jnp.asarray(_PAIRS2, jnp.int32)

    params_live = state.params[idx_state]
    maps_live = jax.tree_util.tree_map(lambda a: a[idx_maps], maps_b)

    def one(params, maps):
        _, init_p, _ = _make_lm_step(
            pairs2, maps, intr, vbf, crw, use_photo, stride, bounds,
            dim_mask, gauge_U, 2,
        )
        return init_p(params)

    cost, H, g = jax.vmap(one)(params_live, maps_live)
    Pb = idx_state.shape[0]
    return PairLmState(
        params=state.params,
        lam=state.lam.at[idx_state].set(jnp.full((Pb,), 1e-3, jnp.float32)),
        cost=state.cost.at[idx_state].set(cost),
        H=state.H.at[idx_state].set(H),
        g=state.g.at[idx_state].set(g),
        it=state.it.at[idx_state].set(jnp.zeros((Pb,), jnp.int32)),
        done=state.done.at[idx_state].set(jnp.zeros((Pb,), bool)),
        w2=state.w2.at[idx_state].set(jnp.zeros((Pb,), jnp.float32)),
        fresh=state.fresh,
    )


@partial(jax.jit, static_argnames=("use_photo", "stride", "bounds"))
def pairs_finalize(params_b, maps_b, intr, vbf, crw, dim_mask, bound, *,
                   use_photo, stride, bounds):
    """Covariances + (visibility, consistency) scores for a (P, 2, ...)
    pair batch at the fine stride — the tail of _pairs_solve, split out so
    the chunked compaction driver runs it once after all lanes converge."""
    pairs2 = jnp.asarray(_PAIRS2, jnp.int32)

    def one(params, maps):
        covars, ok = _pair_covariances(
            params, pairs2, maps, intr, vbf, crw, use_photo, stride, bounds,
            dim_mask, 2,
        )
        vis, cons = align_scores(
            params, pairs2, maps, intr, vbf, crw, use_photo, bound, bounds,
            stride=stride,
        )
        return covars, ok, vis, cons

    return jax.vmap(one)(params_b, maps_b)


def align_scores(params, pairs, maps: FrameMaps, intr, vbf, crw, use_photo,
                 bound, bounds, stride: int = 1):
    """Per-pair (visibility, consistency) over the unweighted residual at
    the problem's pixel stride — the reference scores the same strided
    residual map its cost function evaluates (align_frame_cost_fun.h:78,
    96-127), not a full-resolution one."""
    fx, fy, cx, cy = intr

    def one(pr, pt, ref, tar):
        r, v = pair_residual_map(
            pr, pt, ref, tar, maps, fx, fy, cx, cy, vbf, crw, use_photo,
            stride=stride, bounds=bounds, apply_weights=False,
        )
        n_total = r.shape[0] * r.shape[1]
        n_vis = jnp.sum(v)
        bounded = jnp.minimum(r * r, bound)
        consistency = jnp.sum(jnp.where(v, 1.0 - bounded / bound, 0.0)) / jnp.maximum(
            n_vis, 1
        )
        visibility = n_vis / n_total
        return visibility, consistency

    return jax.vmap(one)(
        params[pairs[:, 0]], params[pairs[:, 1]], pairs[:, 0], pairs[:, 1]
    )
