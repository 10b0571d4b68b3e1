"""Pose-graph optimization over 7-DoF vertices (SE(3) + log scale).

Replaces the Ceres problem (pose-graph/pgo.cpp:8-95) with a jitted
Levenberg-Marquardt whose normal equations are solved matrix-free by
preconditioned conjugate gradients — the TPU-native analogue of Ceres'
SPARSE_NORMAL_CHOLESKY: per-edge Jacobians come from autodiff, Hessian-
vector products are edge-wise gathers + segment-sums (no sparse matrix is
ever materialized), and a block-Jacobi (7x7 per pose) preconditioner keeps
CG iteration counts low.

Residual parity with PoseGraph3dErrorTerm (pose-graph/pgo_error_term.h:
68-134) including the begin/end swap the reference applies when adding
blocks (pgo.cpp:41-49), the quaternion local parameterization, the
fixed-unless-7dof scale blocks, and the gauge fix of the first pose
(pgo.cpp:70-74).

State layout: p (N, 3) position, q (N, 4) unit quaternion [w,x,y,z],
s (N,) log scale. Edge measurement: same 7-tuple derived from the
[rvec, tvec, log s] wire format (types.h:44-75).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from voldor_tpu.ops import lie


class PgoProblem(NamedTuple):
    p: jax.Array  # (N, 3)
    q: jax.Array  # (N, 4) wxyz
    s: jax.Array  # (N,)
    edges_idx: jax.Array  # (M, 2) int32 (begin, end)
    meas_p: jax.Array  # (M, 3)
    meas_q: jax.Array  # (M, 4)
    meas_s: jax.Array  # (M,)
    sqrt_info: jax.Array  # (M, 7, 7)
    edge_mask: jax.Array  # (M,) float: 0 for padding
    free_mask: jax.Array  # (N, 7) float: tangent dims free to move


def _edge_residual(p_a, q_a, s_a, p_b, q_b, s_b, meas_p, meas_q, meas_s, sqrt_info):
    """Whitened 7-residual (pgo_error_term.h:91-115). 'a' is the END pose,
    'b' the BEGIN pose (the reference swaps them, pgo.cpp:41-49)."""
    s_ab_avg = jnp.sqrt(jnp.exp(s_a + s_b))
    q_a_inv = lie.quat_conj(q_a)
    q_ab = lie.quat_mul(q_a_inv, q_b)
    p_ab = lie.quat_rotate(q_a_inv, (p_b - p_a) / s_ab_avg)
    delta_q = lie.quat_mul(meas_q, lie.quat_conj(q_ab))
    res = jnp.concatenate(
        [
            p_ab - meas_p,
            2.0 * delta_q[1:4],
            jnp.asarray([(s_a - s_b) - meas_s]),
        ]
    )
    return sqrt_info @ res


def _retract(p, q, s, delta):
    """Apply a (7,) tangent step: [dp(3), dtheta(3), ds(1)]."""
    dp = delta[:3]
    dq = lie.quat_from_rvec(delta[3:6])
    return p + dp, lie.quat_normalize(lie.quat_mul(dq, q)), s + delta[6]


def _edge_res_and_jacs(prob: PgoProblem):
    """Residuals (M, 7) and Jacobians w.r.t. the two endpoint tangents
    ((M, 7, 7) each, columns masked by free_mask)."""

    def one(i_b, i_e, mp, mq, ms, si, mask, fm_b, fm_e):
        p_b, q_b, s_b = prob.p[i_b], prob.q[i_b], prob.s[i_b]
        p_e, q_e, s_e = prob.p[i_e], prob.q[i_e], prob.s[i_e]

        def f(d_e, d_b):
            pa, qa, sa = _retract(p_e, q_e, s_e, d_e)
            pb, qb, sb = _retract(p_b, q_b, s_b, d_b)
            return _edge_residual(pa, qa, sa, pb, qb, sb, mp, mq, ms, si)

        zero = jnp.zeros(7)
        r = f(zero, zero) * mask
        J_e = jax.jacfwd(f, argnums=0)(zero, zero) * mask
        J_b = jax.jacfwd(f, argnums=1)(zero, zero) * mask
        return r, J_e * fm_e[None, :], J_b * fm_b[None, :]

    return jax.vmap(one)(
        prob.edges_idx[:, 0],
        prob.edges_idx[:, 1],
        prob.meas_p,
        prob.meas_q,
        prob.meas_s,
        prob.sqrt_info,
        prob.edge_mask,
        prob.free_mask[prob.edges_idx[:, 0]],
        prob.free_mask[prob.edges_idx[:, 1]],
    )


def _edge_residuals(prob: PgoProblem):
    """Residuals only — no Jacobians. The LM trial evaluation calls this
    every iteration; going through _edge_res_and_jacs there computed (and
    discarded) 14 jacfwd columns per edge."""

    def one(i_b, i_e, mp, mq, ms, si, mask):
        return _edge_residual(
            prob.p[i_e], prob.q[i_e], prob.s[i_e],
            prob.p[i_b], prob.q[i_b], prob.s[i_b],
            mp, mq, ms, si,
        ) * mask

    return jax.vmap(one)(
        prob.edges_idx[:, 0],
        prob.edges_idx[:, 1],
        prob.meas_p,
        prob.meas_q,
        prob.meas_s,
        prob.sqrt_info,
        prob.edge_mask,
    )


def _cost(prob: PgoProblem):
    r = _edge_residuals(prob)
    return 0.5 * jnp.sum(r * r)


@partial(jax.jit, static_argnames=("max_iters",))
def pgo_solve_dense_jit(prob: PgoProblem, max_iters: int = 100):
    """LM with a DENSE normal-equation Cholesky per iteration.

    The matrix-free LM+CG path (pgo_solve_jit below) runs up to 100x60
    tiny sequential while/fori steps; on the TPU each step pays small-op
    latency and a 62-vertex solve measured 5.6 s warm
    (docs/PERF_SLAM_PHASES.json solve_pgo). A pose graph of N vertices is
    only D = 7N tangent dims — dense Cholesky on the MXU is microseconds
    up to thousands of poses, so one LM iteration collapses to one
    factorization. pgo() picks dense for D <= 8192 (the H materialization
    is D^2 floats), CG beyond.
    """
    N = prob.p.shape[0]
    D = N * 7

    def dense_normal(prob):
        """JtJ/gradient assembly as one-hot MATMULS, not scatters: XLA
        scatter-adds of (M, 7, 7) blocks into a (N, 7, N, 7) operand
        serialize on TPU, while S^T @ V contractions ride the MXU. The
        cross-term einsum is written with the 49 block entries as a batch
        axis so XLA contracts (N, M) @ (M, N) per entry instead of
        materializing an (M, N, 7, 7) intermediate."""
        r, J_e, J_b = _edge_res_and_jacs(prob)
        ib, ie = prob.edges_idx[:, 0], prob.edges_idx[:, 1]
        S_b = jax.nn.one_hot(ib, N, dtype=r.dtype)  # (M, N)
        S_e = jax.nn.one_hot(ie, N, dtype=r.dtype)

        g = S_e.T @ jnp.einsum("mij,mi->mj", J_e, r) + S_b.T @ jnp.einsum(
            "mij,mi->mj", J_b, r
        )  # (N, 7)

        ee = jnp.einsum("mia,mib->mab", J_e, J_e)  # (M, 7, 7)
        bb = jnp.einsum("mia,mib->mab", J_b, J_b)
        be = jnp.einsum("mia,mib->mab", J_b, J_e)
        # endpoint-diagonal blocks: (N, M) @ (M, 49) matmuls
        diag_blk = (S_e.T @ ee.reshape(-1, 49) + S_b.T @ bb.reshape(-1, 49)
                    ).reshape(N, 7, 7)
        # cross blocks: Hx[k, a, b] = sum_m be[m, k] S_b[m, a] S_e[m, b]
        Hx = jnp.einsum(
            "mk,ma,mb->kab", be.reshape(-1, 49), S_b, S_e
        )  # (49, N, N) — XLA contracts as 49 (N,M)@(M,N) matmuls
        H = jnp.zeros((N, 7, N, 7), r.dtype)
        ar = jnp.arange(N)
        H = H.at[ar, :, ar, :].add(diag_blk)
        Hx = Hx.reshape(7, 7, N, N).transpose(2, 0, 3, 1)  # (N, 7, N, 7)
        H = H + Hx + jnp.swapaxes(jnp.swapaxes(Hx, 0, 2), 1, 3)
        return r, H.reshape(D, D), g.reshape(D)

    def lm_body(state):
        prob, lam, cost, it, done = state
        r, H, g = dense_normal(prob)
        diag = jnp.diag(H)
        # fixed/padding dims have zero rows+cols and zero gradient: unit
        # diagonal keeps the factorization SPD and their step exactly 0
        damped = H + jnp.diag(
            lam * jnp.clip(diag, 1e-6, 1e32) + (diag <= 0.0)
        )
        L = jnp.linalg.cholesky(damped)
        ok = jnp.all(jnp.isfinite(L))
        Lsafe = jnp.where(ok, L, jnp.eye(D))
        step = jax.scipy.linalg.cho_solve((Lsafe, True), g).reshape(N, 7)
        step = step * prob.free_mask

        def apply_step(prob, step):
            p, q, s = jax.vmap(_retract)(prob.p, prob.q, prob.s, -step)
            return prob._replace(p=p, q=q, s=s)

        trial = apply_step(prob, step)
        new_cost = _cost(trial)
        accept = ok & jnp.isfinite(new_cost) & (new_cost < cost)
        prob = prob._replace(
            p=jnp.where(accept, trial.p, prob.p),
            q=jnp.where(accept, trial.q, prob.q),
            s=jnp.where(accept, trial.s, prob.s),
        )
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-9), lam * 4.0)
        rel = (cost - new_cost) / jnp.maximum(cost, 1e-30)
        done = (accept & (rel < 1e-9)) | (lam > 1e10)
        cost = jnp.where(accept, new_cost, cost)
        return prob, lam, cost, it + 1, done

    def lm_cond(state):
        _, _, _, it, done = state
        return (it < max_iters) & (~done)

    cost0 = _cost(prob)
    prob, _, cost, iters, _ = jax.lax.while_loop(
        lm_cond, lm_body,
        (prob, jnp.float32(1e-4), cost0, jnp.int32(0), jnp.bool_(False)),
    )
    return prob, cost, iters


@partial(jax.jit, static_argnames=("max_iters", "cg_iters"))
def pgo_solve_jit(prob: PgoProblem, max_iters: int = 100, cg_iters: int = 60):
    N = prob.p.shape[0]

    def normal_parts(prob):
        r, J_e, J_b = _edge_res_and_jacs(prob)
        # gradient: scatter J^T r to each endpoint
        g = jnp.zeros((N, 7))
        g = g.at[prob.edges_idx[:, 1]].add(jnp.einsum("mij,mi->mj", J_e, r))
        g = g.at[prob.edges_idx[:, 0]].add(jnp.einsum("mij,mi->mj", J_b, r))
        # block-diagonal of JtJ for damping + preconditioning
        blk = jnp.zeros((N, 7, 7))
        blk = blk.at[prob.edges_idx[:, 1]].add(jnp.einsum("mia,mib->mab", J_e, J_e))
        blk = blk.at[prob.edges_idx[:, 0]].add(jnp.einsum("mia,mib->mab", J_b, J_b))
        return r, J_e, J_b, g, blk

    def hvp(J_e, J_b, edges_idx, lam_diag, v):
        """(JtJ + lam*D) v, matrix-free over edges. v: (N, 7)."""
        Jv = jnp.einsum("mij,mj->mi", J_e, v[edges_idx[:, 1]]) + jnp.einsum(
            "mij,mj->mi", J_b, v[edges_idx[:, 0]]
        )
        out = jnp.zeros_like(v)
        out = out.at[edges_idx[:, 1]].add(jnp.einsum("mij,mi->mj", J_e, Jv))
        out = out.at[edges_idx[:, 0]].add(jnp.einsum("mij,mi->mj", J_b, Jv))
        return out + lam_diag * v

    def cg(J_e, J_b, edges_idx, lam_diag, precond, g):
        x = jnp.zeros_like(g)
        r = g
        z = jnp.einsum("nij,nj->ni", precond, r)
        d = z
        rz = jnp.sum(r * z)

        def body(k, st):
            x, r, d, rz = st
            Hd = hvp(J_e, J_b, edges_idx, lam_diag, d)
            alpha = rz / jnp.maximum(jnp.sum(d * Hd), 1e-30)
            x = x + alpha * d
            r = r - alpha * Hd
            z = jnp.einsum("nij,nj->ni", precond, r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            d = z + beta * d
            return x, r, d, rz_new

        x, _, _, _ = jax.lax.fori_loop(0, cg_iters, body, (x, r, d, rz))
        return x

    def lm_body(state):
        prob, lam, cost, it, done = state
        r, J_e, J_b, g, blk = normal_parts(prob)
        diag = jnp.clip(jnp.diagonal(blk, axis1=-2, axis2=-1), 1e-6, 1e32)
        lam_diag = lam * diag
        # block-Jacobi preconditioner: inv(blk + lam*diag + fixed-dim eye)
        fixed = 1.0 - prob.free_mask
        pre_mat = (
            blk
            + jax.vmap(jnp.diag)(lam_diag)
            + jax.vmap(jnp.diag)(fixed + 1e-8)
        )
        precond = jnp.linalg.inv(pre_mat)

        step = cg(J_e, J_b, prob.edges_idx, lam_diag, precond, g)
        step = step * prob.free_mask

        def apply_step(prob, step):
            p, q, s = jax.vmap(_retract)(prob.p, prob.q, prob.s, -step)
            return prob._replace(p=p, q=q, s=s)

        trial = apply_step(prob, step)
        new_cost = _cost(trial)
        accept = jnp.isfinite(new_cost) & (new_cost < cost)
        prob = prob._replace(
            p=jnp.where(accept, trial.p, prob.p),
            q=jnp.where(accept, trial.q, prob.q),
            s=jnp.where(accept, trial.s, prob.s),
        )
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-9), lam * 4.0)
        rel = (cost - new_cost) / jnp.maximum(cost, 1e-30)
        done = (accept & (rel < 1e-9)) | (lam > 1e10)
        cost = jnp.where(accept, new_cost, cost)
        return prob, lam, cost, it + 1, done

    def lm_cond(state):
        _, _, _, it, done = state
        return (it < max_iters) & (~done)

    cost0 = _cost(prob)
    prob, _, cost, iters, _ = jax.lax.while_loop(
        lm_cond, lm_body, (prob, jnp.float32(1e-4), cost0, jnp.int32(0), jnp.bool_(False))
    )
    return prob, cost, iters


def _rvec_covar_to_tqs_order(covar7, rvec):
    """Reorder an (rvec, tvec, s) covariance to (t, q-scaled-r, s) with the
    k = sin(theta/2)/theta quaternion scaling (types.h:103-125)."""
    theta2 = float(np.dot(rvec, rvec))
    if theta2 > 0:
        theta = np.sqrt(theta2)
        k = np.sin(theta * 0.5) / theta
    else:
        k = 0.5
    out = np.empty((7, 7), np.float64)
    for i1 in range(7):
        for i2 in range(7):
            i1t = 6 if i1 == 6 else (i1 + 3 if i1 < 3 else i1 - 3)
            i2t = 6 if i2 == 6 else (i2 + 3 if i2 < 3 else i2 - 3)
            sc = 1.0
            if i1t < 3:
                sc *= k
            if i2t < 3:
                sc *= k
            out[i1, i2] = covar7[i1t, i2t] * sc
    return out


def _pad_to_bucket(n, base=16):
    m = base
    while m < n:
        m *= 2
    return m


# A growing SLAM graph walks through (Np, Mp) bucket combos — (16,16),
# (32,64), (64,128), ... — and EVERY new combo is a fresh 10-20 s XLA
# compile mid-run (docs/PERF_SLAM_PHASES.json: an 11 s "warm" solve_pgo
# that was a new edge bucket). Padding floors keep a typical realtime
# window (and the 61-frame bench run end-to-end) inside ONE executable;
# the dense assembly/factorization cost of the extra padding is
# microseconds at these sizes.
_POSE_BUCKET_BASE = 64
_EDGE_BUCKET_BASE = 128


def build_problem(
    poses7: np.ndarray,
    poses_idx: np.ndarray | None,
    edges_idx: np.ndarray,
    edges_pose: np.ndarray,
    edges_covar: np.ndarray,
    optimize_7dof: bool,
) -> tuple[PgoProblem, np.ndarray, dict]:
    """Host-side assembly (py_export.cpp:19-75): pose-id remap, edge covar
    whitening in float64, non-finite-covar edge dropping, padding to
    power-of-two buckets so graph growth rarely recompiles."""
    n = poses7.shape[0]
    ids = np.arange(n, dtype=np.int64) if poses_idx is None else np.asarray(poses_idx, np.int64)
    id_to_row = {int(pid): i for i, pid in enumerate(ids)}
    if len(id_to_row) != n:
        raise ValueError("Duplicate pose id")

    kept = []
    sqrt_infos = []
    for m in range(edges_idx.shape[0]):
        covar = np.asarray(edges_covar[m], np.float64)
        if not np.all(np.isfinite(covar)):
            print("Warning: Nan/Inf encountered at PGO edge covar")
            continue
        rvec = np.asarray(edges_pose[m, :3], np.float64)
        covar_tqs = _rvec_covar_to_tqs_order(covar, rvec)
        info = np.linalg.inv(covar_tqs)
        # lower-triangular sqrt (llt().matrixL(), pgo.cpp:34-39)
        try:
            L = np.linalg.cholesky(info)
        except np.linalg.LinAlgError:
            # symmetrize + jitter fallback
            info = 0.5 * (info + info.T) + 1e-12 * np.eye(7)
            L = np.linalg.cholesky(info)
        kept.append(m)
        sqrt_infos.append(L)

    M = len(kept)
    Np = _pad_to_bucket(n, _POSE_BUCKET_BASE)
    Mp = _pad_to_bucket(max(M, 1), _EDGE_BUCKET_BASE)

    p = np.zeros((Np, 3), np.float32)
    q = np.zeros((Np, 4), np.float32)
    q[:, 0] = 1.0
    s = np.zeros(Np, np.float32)
    p[:n] = poses7[:, 3:6]
    q[:n] = np.asarray(lie.quat_from_rvec(jnp.asarray(poses7[:, :3])))
    s[:n] = poses7[:, 6]

    e_idx = np.zeros((Mp, 2), np.int32)
    meas_p = np.zeros((Mp, 3), np.float32)
    meas_q = np.zeros((Mp, 4), np.float32)
    meas_q[:, 0] = 1.0
    meas_s = np.zeros(Mp, np.float32)
    sinfo = np.tile(np.eye(7, dtype=np.float32), (Mp, 1, 1))
    emask = np.zeros(Mp, np.float32)
    if kept:
        # one batched conversion: a per-edge eager quat_from_rvec costs a
        # full device round trip each (~30ms on the remote-TPU tunnel)
        kept_np = np.asarray(kept, np.int64)
        meas_q[: len(kept)] = np.asarray(
            lie.quat_from_rvec(jnp.asarray(edges_pose[kept_np, :3]))
        )
    for j, m in enumerate(kept):
        e_idx[j, 0] = id_to_row[int(edges_idx[m, 0])]
        e_idx[j, 1] = id_to_row[int(edges_idx[m, 1])]
        meas_p[j] = edges_pose[m, 3:6]
        meas_s[j] = edges_pose[m, 6]
        sinfo[j] = sqrt_infos[j].astype(np.float32)
        emask[j] = 1.0

    free = np.ones((Np, 7), np.float32)
    free[n:] = 0.0  # padding poses
    # first pose (lowest id) gauge-fixed entirely (pgo.cpp:70-74)
    first_row = id_to_row[int(ids.min())]
    free[first_row] = 0.0
    if not optimize_7dof:
        free[:, 6] = 0.0  # scale blocks constant (pgo.cpp:56-59)

    prob = PgoProblem(
        p=jnp.asarray(p),
        q=jnp.asarray(q),
        s=jnp.asarray(s),
        edges_idx=jnp.asarray(e_idx),
        meas_p=jnp.asarray(meas_p),
        meas_q=jnp.asarray(meas_q),
        meas_s=jnp.asarray(meas_s),
        sqrt_info=jnp.asarray(sinfo),
        edge_mask=jnp.asarray(emask),
        free_mask=jnp.asarray(free),
    )
    return prob, ids, {"n_poses": n, "n_edges": M}
