"""Chain reduction for large pose graphs.

The SLAM pose graph has a specific shape (slam/system.py:process_vo +
establish_links_batch): every frame is a vertex, consecutive frames are
connected by exactly one VO edge, and all other edges (local/loop-closure
links) connect keyframes. Non-keyframe vertices therefore have degree 2
with purely sequential connectivity — marginalizing them out of the
Gaussian problem is exact at the linearization point (Schur complement of
a chain), and equals composing the chain measurements with first-order
covariance propagation.

The reference solves the full graph with Ceres SPARSE_NORMAL_CHOLESKY
(pose-graph/pgo.cpp:82-95), which exploits exactly this sparsity inside
the factorization. On TPU the dense-Cholesky LM (pgo/solver.py) is the
fast path but materializes a (7N)^2 Hessian, capping N at ~1170 poses.
Reduction shrinks a KITTI-length graph (4,500 poses, ~300 keyframes) to
the dense regime, then redistributes the keyframe corrections along each
chain segment (covariance-weighted tangent interpolation — the exact
conditional mean of a Brownian bridge, first order in SE(3)).

Wire conventions (CLAUDE.md / pgo/api.py): pose7 = [rvec(3), tvec(3),
log s]; an edge (b, e) measures the begin-frame -> end-frame transform;
covariances are 7x7 in the same [rvec, tvec, s] order; vertices are
cam->world.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# SO(3) helpers (NumPy: this runs on the host once per global PGO; eager
# device calls here would pay a tunnel round trip per edge, PLATFORM_NOTES)
# ---------------------------------------------------------------------------


def _hat(v):
    return np.array(
        [[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]]
    )


def rvec_to_R(r):
    th = np.linalg.norm(r)
    if th < 1e-12:
        K = _hat(r)
        return np.eye(3) + K + 0.5 * K @ K
    K = _hat(r / th)
    return np.eye(3) + np.sin(th) * K + (1.0 - np.cos(th)) * (K @ K)


def R_to_rvec(R):
    tr = np.clip((np.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    th = np.arccos(tr)
    if th < 1e-9:
        # first-order: vee(R - R^T)/2
        return 0.5 * np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    if th > np.pi - 1e-6:
        # near-pi: axis from the symmetric part
        A = (R + np.eye(3)) * 0.5
        axis = np.sqrt(np.maximum(np.diag(A), 0.0))
        # fix signs from off-diagonals
        i = int(np.argmax(axis))
        if axis[i] > 0:
            axis = A[i] / axis[i]
            axis[i] = np.sqrt(max(A[i, i], 0.0))
        n = np.linalg.norm(axis)
        axis = axis / n if n > 0 else np.array([1.0, 0.0, 0.0])
        return axis * th
    v = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return v * (th / (2.0 * np.sin(th)))


def _so3_left_jacobian(r):
    th2 = float(r @ r)
    K = _hat(r)
    if th2 < 1e-12:
        return np.eye(3) + 0.5 * K + (K @ K) / 6.0
    th = np.sqrt(th2)
    return (
        np.eye(3)
        + ((1.0 - np.cos(th)) / th2) * K
        + ((th - np.sin(th)) / (th2 * th)) * (K @ K)
    )


def _so3_left_jacobian_inv(r):
    th2 = float(r @ r)
    K = _hat(r)
    if th2 < 1e-12:
        return np.eye(3) - 0.5 * K + (K @ K) / 12.0
    th = np.sqrt(th2)
    half = 0.5 * th
    cot = 1.0 / np.tan(half) if abs(np.sin(half)) > 1e-12 else 0.0
    return np.eye(3) - 0.5 * K + ((1.0 - half * cot) / th2) * (K @ K)


# ---------------------------------------------------------------------------
# Edge composition with covariance
# ---------------------------------------------------------------------------


def compose_edges(m1, c1, m2, c2):
    """Compose measurement m1: (b -> m) with m2: (m -> e) into (b -> e).

    Derivation against the solver residual (pgo/solver.py:_edge_residual,
    vertices cam->world, s_ab_avg = exp((s_a+s_b)/2)):
      R_be = R_me R_bm                      (rvec block)
      t_be = R_me t_bm e^{-s2/2} + t_me e^{s1/2}
      s_be = s1 + s2
    Covariance: first-order propagation, Sigma = J1 c1 J1^T + J2 c2 J2^T
    with analytic Jacobians in the wire [rvec, tvec, s] coordinates
    (rvec sensitivities via SO(3) left/right Jacobians).
    """
    r1, t1, s1 = m1[:3].astype(np.float64), m1[3:6].astype(np.float64), float(m1[6])
    r2, t2, s2 = m2[:3].astype(np.float64), m2[3:6].astype(np.float64), float(m2[6])
    R1 = rvec_to_R(r1)
    R2 = rvec_to_R(r2)
    Rc = R2 @ R1
    rc = R_to_rvec(Rc)
    e1 = np.exp(0.5 * s1)
    e2 = np.exp(-0.5 * s2)
    tc = R2 @ t1 * e2 + t2 * e1
    sc = s1 + s2

    # rotation-block Jacobians:
    #   Exp(r1 + d1) = R1 Exp(Jr(r1) d1)  ->  rc + Jr(rc)^{-1} Jr(r1) d1
    #   Exp(r2 + d2) = Exp(Jl(r2) d2) R2  ->  rc + Jl(rc)^{-1} Jl(r2) d2
    # with Jr(r) = Jl(-r).
    Jl_rc_inv = _so3_left_jacobian_inv(rc)
    Jr_rc_inv = _so3_left_jacobian_inv(-rc)
    dr_dr1 = Jr_rc_inv @ _so3_left_jacobian(-r1)
    dr_dr2 = Jl_rc_inv @ _so3_left_jacobian(r2)

    # translation-block Jacobians: d(R2 v)/dr2 = -R2 [v]x Jr(r2)
    Jr_r2 = _so3_left_jacobian(-r2)
    dt_dr2 = -R2 @ _hat(t1 * e2) @ Jr_r2
    dt_dt1 = R2 * e2
    dt_dt2 = np.eye(3)
    dt_ds1 = 0.5 * t2 * e1
    dt_ds2 = -0.5 * R2 @ t1 * e2

    J1 = np.zeros((7, 7))
    J1[:3, :3] = dr_dr1
    J1[3:6, 3:6] = dt_dt1
    J1[3:6, 6] = dt_ds1
    J1[6, 6] = 1.0
    J2 = np.zeros((7, 7))
    J2[:3, :3] = dr_dr2
    J2[3:6, :3] = dt_dr2
    J2[3:6, 3:6] = dt_dt2
    J2[3:6, 6] = dt_ds2
    J2[6, 6] = 1.0

    mc = np.empty(7, np.float64)
    mc[:3] = rc
    mc[3:6] = tc
    mc[6] = sc
    cc = J1 @ c1.astype(np.float64) @ J1.T + J2 @ c2.astype(np.float64) @ J2.T
    return mc, cc


# ---------------------------------------------------------------------------
# Graph reduction
# ---------------------------------------------------------------------------


def chain_reduce(n_poses, edges_idx, edges_pose, edges_covar):
    """Identify removable chain vertices and compose their edges.

    A vertex v is removable iff its only incident edges are exactly one
    (v-1, v) and one (v, v+1) chain edge. Returns
    (kept_ids, red_idx, red_pose, red_covar, segments) where segments is a
    list of (kept_begin, kept_end, [interior ids], [per-edge weights],
    [per-edge measurements]) used for back-substitution. Edge weights are
    trace of the translation-block covariance (the Brownian-bridge time
    parameterization).
    """
    edges_idx = np.asarray(edges_idx)
    M = edges_idx.shape[0]
    incident: dict[int, list[int]] = {}
    for m in range(M):
        a, b = int(edges_idx[m, 0]), int(edges_idx[m, 1])
        incident.setdefault(a, []).append(m)
        incident.setdefault(b, []).append(m)

    def chain_edge_ms(v):
        """The (v-1,v) and (v,v+1) edge indices if v is a removable
        interior vertex, else None."""
        ms = incident.get(v, [])
        if len(ms) != 2 or v == 0 or v == n_poses - 1:
            return None
        prev_m = next_m = None
        for m in ms:
            a, b = int(edges_idx[m, 0]), int(edges_idx[m, 1])
            if (a, b) == (v - 1, v):
                prev_m = m
            elif (a, b) == (v, v + 1):
                next_m = m
        if prev_m is None or next_m is None:
            return None
        return prev_m, next_m

    removable = np.zeros(n_poses, bool)
    for v in range(1, n_poses - 1):
        if chain_edge_ms(v) is not None:
            removable[v] = True

    kept_ids = np.flatnonzero(~removable)
    red_idx, red_pose, red_covar = [], [], []
    segments = []
    consumed = np.zeros(M, bool)

    # walk maximal runs of removable vertices; compose their chain edges
    v = 0
    while v < n_poses - 1:
        if removable[v + 1] if v + 1 < n_poses else False:
            start = v
            interior = []
            mlist = []
            u = v + 1
            first = chain_edge_ms(u)
            mlist.append(first[0])
            while u < n_poses and removable[u]:
                interior.append(u)
                mlist.append(chain_edge_ms(u)[1])
                u += 1
            m0 = mlist[0]
            mc = np.asarray(edges_pose[m0], np.float64)
            cc = np.asarray(edges_covar[m0], np.float64)
            weights = [float(np.trace(cc[3:6, 3:6]))]
            for m in mlist[1:]:
                mc, cc = compose_edges(
                    mc, cc, np.asarray(edges_pose[m]), np.asarray(edges_covar[m])
                )
                weights.append(float(np.trace(np.asarray(edges_covar[m], np.float64)[3:6, 3:6])))
            for m in mlist:
                consumed[m] = True
            red_idx.append([start, u])
            red_pose.append(mc)
            red_covar.append(cc)
            segments.append(
                (start, u, interior, weights,
                 [np.asarray(edges_pose[m], np.float64) for m in mlist])
            )
            v = u
        else:
            v += 1

    for m in range(M):
        if not consumed[m]:
            red_idx.append([int(edges_idx[m, 0]), int(edges_idx[m, 1])])
            red_pose.append(np.asarray(edges_pose[m], np.float64))
            red_covar.append(np.asarray(edges_covar[m], np.float64))

    return (
        kept_ids,
        np.asarray(red_idx, np.int32),
        np.asarray(red_pose, np.float32),
        np.asarray(red_covar, np.float32),
        segments,
    )


# ---------------------------------------------------------------------------
# Back-substitution
# ---------------------------------------------------------------------------


def _se3_log(R, t):
    phi = R_to_rvec(R)
    rho = _so3_left_jacobian_inv(phi) @ t
    return phi, rho


def _se3_exp(phi, rho):
    return rvec_to_R(phi), _so3_left_jacobian(phi) @ rho


def redistribute_chain(poses_old, poses_new_kept, kept_rows, segments):
    """Fill in marginalized vertices after the reduced solve.

    poses_old: (N, 7) wire poses BEFORE the solve (cam->world).
    poses_new_kept: (K, 7) solved poses of kept vertices.
    kept_rows: row index of each kept vertex id in poses_new_kept.
    segments: from chain_reduce.

    Interior poses are forward-composed along the chain MEASUREMENTS from
    the solved begin pose (the conditional mode given the endpoints when
    the chain is self-consistent); the remaining closure discrepancy at
    the solved end pose is distributed along the chain via SE(3)-geodesic
    interpolation with covariance-weighted fractions — the conditional
    mean of a Brownian bridge pinned at both endpoints. Exact (not merely
    first-order) whenever the chain measurements are consistent.

    Measurement semantics (pgo/solver.py:_edge_residual zero condition,
    vertices cam->world): R_m = R_e^T R_b, t_m = R_e^T (p_b - p_e)
    / exp((s_b + s_e) / 2), s_m = s_e - s_b. Forward propagation:
    R_next = R @ R_m^T; p_next = p - R_next t_m exp((s + s_next)/2).
    """
    out = poses_old.astype(np.float32).copy()
    for kid, row in kept_rows.items():
        out[kid] = poses_new_kept[row]

    for (a_id, b_id, interior, weights, meas) in segments:
        if not interior:
            continue
        R = rvec_to_R(out[a_id][:3].astype(np.float64))
        p = out[a_id][3:6].astype(np.float64)
        s = float(out[a_id][6])
        preds = []
        for m in meas:
            s_next = s + float(m[6])
            R_next = R @ rvec_to_R(m[:3]).T
            p_next = p - R_next @ (m[3:6] * np.exp(0.5 * (s + s_next)))
            preds.append((R_next, p_next, s_next))
            R, p, s = R_next, p_next, s_next
        # world-frame (left) closure delta: solved end vs predicted end
        Rb_sol = rvec_to_R(out[b_id][:3].astype(np.float64))
        pb_sol = out[b_id][3:6].astype(np.float64)
        Rd = Rb_sol @ R.T
        td = pb_sol - Rd @ p
        phi, rho = _se3_log(Rd, td)
        ds = float(out[b_id][6]) - s
        wsum = float(sum(weights))
        acc = 0.0
        for j, v in enumerate(interior):
            acc += weights[j]
            alpha = acc / wsum if wsum > 0 else (j + 1) / (len(interior) + 1)
            Da_R, Da_t = _se3_exp(alpha * phi, alpha * rho)
            Rv, pv, sv = preds[j]
            out[v, :3] = R_to_rvec(Da_R @ Rv)
            out[v, 3:6] = Da_R @ pv + Da_t
            out[v, 6] = sv + alpha * ds
    return out
