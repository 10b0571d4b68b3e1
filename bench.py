"""Headline benchmark: KITTI-odometry-scale VO frames/sec on one chip.

Runs the full monocular VO pipeline (VOLDOR_SLAM.process_vo over a
24-frame synthetic sequence at the reference's KITTI half-resolution
613x185 compute grid, BASELINE.md) — covisibility-gated window stepping
with temporal/spatial keyframe depth priors, exactly as in production —
verifies Sim3-aligned ATE against ground truth, and reports the sustained
frame rate.

Baseline: the reference publishes no numbers (BASELINE.md); its README
claims real-time operation at the recommended 10 Hz KITTI input rate on an
unspecified CUDA GPU, so vs_baseline is measured against 10 frames/sec.

The remote-TPU backend's throughput fluctuates up to ~3.5x between
processes (a degraded-worker mode that is sticky for a process's lifetime;
docs/PLATFORM_NOTES.md). The measurement runs in N_RUNS child processes
and the MEDIAN run is reported; every run's fps is included under "runs"
so the worker lottery stays visible.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/10, "runs": [...]}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

N_RUNS = 3

BASELINE_FPS = 10.0  # reference README.md:160 recommended KITTI input rate
WINDOW = 5
H, W = 185, 613


def build_scene():
    import jax.numpy as jnp

    from voldor_tpu.ops import lie

    sys.path.insert(0, "tests")
    from synthetic import render_window

    K = np.array([[350.0, 0, W / 2], [0, 350.0, H / 2], [0, 0, 1]], np.float32)

    def n_(v):
        v = np.asarray(v, np.float64)
        return v / np.linalg.norm(v)

    planes = [
        (n_([0.1, 0.15, 1.0]), 8.0),
        (n_([-0.35, 0.1, 1.0]), 6.5),
        (n_([0.3, -0.25, 1.0]), 7.0),
    ]
    rng = np.random.default_rng(7)
    poses = np.zeros((WINDOW, 6), np.float32)
    for f in range(WINDOW):
        poses[f, :3] = rng.normal(0, 0.005, 3)
        poses[f, 3:6] = [0.1, 0.01, 0.35]

    def r2R(rv):
        return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))

    flows, depth0, _ = render_window(K, poses, planes, H, W, r2R)
    return flows, depth0, poses


def build_sequence(n_flows=24):
    """Longer synthetic sequence for the pipeline benchmark."""
    import jax.numpy as jnp

    from voldor_tpu.ops import lie

    sys.path.insert(0, "tests")
    from synthetic import render_window

    K = np.array([[350.0, 0, W / 2], [0, 350.0, H / 2], [0, 0, 1]], np.float32)

    def n_(v):
        v = np.asarray(v, np.float64)
        return v / np.linalg.norm(v)

    planes = [
        (n_([0.1, 0.15, 1.0]), 8.0),
        (n_([-0.35, 0.1, 1.0]), 6.5),
        (n_([0.3, -0.25, 1.0]), 7.0),
        (n_([0.5, 0.35, 1.0]), 7.5),
    ]
    rng = np.random.default_rng(7)
    poses = np.zeros((n_flows, 6), np.float32)
    for f in range(n_flows):
        poses[f, :3] = rng.normal(0, 0.004, 3)
        poses[f, 3:6] = [0.08, 0.01, 0.3]

    def r2R(rv):
        return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))

    flows, depth0, Ts = render_window(K, poses, planes, H, W, r2R)
    return flows, Ts


def _make_slam(flows):
    from voldor_tpu.slam.system import VOLDOR_SLAM

    slam = VOLDOR_SLAM(mode="mono")
    slam.use_image_info = False
    # TPU speed knob (collect on a strided subgrid); the benchmark's ATE
    # gate below verifies accuracy still holds with it.
    slam.voldor_user_config = "--pose_sample_stride 2"
    slam.set_cam_params(350.0, 350.0, W / 2, H / 2)
    slam.flows = [flows[i] for i in range(flows.shape[0])]
    slam.N_FRAMES = flows.shape[0] + 1
    slam.h, slam.w = H, W
    slam.flow_loader_pt = flows.shape[0]
    return slam


def run_once():
    import voldor_tpu  # noqa: F401
    from voldor_tpu.utils.evaluation import ate_rmse

    flows, Ts_true = build_sequence(24)

    # warmup: compile every path (bootstrap window + prior-fed windows)
    slam = _make_slam(flows[:10])
    while slam.process_vo():
        pass

    # timed: the real VO pipeline (windows warm-started by temporal/spatial
    # keyframe depth priors — only the first window pays the bootstrap)
    slam = _make_slam(flows)
    t0 = time.perf_counter()
    while slam.process_vo():
        pass
    dt = time.perf_counter() - t0
    n_frames = int(slam.N_FRAMES)
    fps = n_frames / dt

    # accuracy: Sim3-aligned ATE against ground truth
    est = np.stack([f.Tcw for f in slam.frames])  # cam->world (see frame.py)
    gt = np.linalg.inv(Ts_true)  # (n_flows+1, 4, 4) cam->world
    ate = ate_rmse(est.astype(np.float64), gt, with_scale=True)
    scene_extent = float(
        np.linalg.norm(gt[:, :3, 3] - gt[0, :3, 3], axis=1).max()
    )
    ok = bool(ate < 0.02 * scene_extent)

    fps_out = fps if ok else 0.0
    print(
        json.dumps(
            {
                "metric": "kitti_vo_frames_per_sec_per_chip",
                "value": round(fps_out, 3),
                "unit": "frames/s (613x185 mono VO pipeline, window 5)",
                "vs_baseline": round(fps_out / BASELINE_FPS, 3),
                "pipeline_s": round(dt, 3),
                "n_frames": n_frames,
                "accuracy_ok": ok,
                "ate_rmse": round(ate, 5),
                "scene_extent": round(scene_extent, 2),
            }
        )
    )


def main():
    if os.environ.get("VOLDOR_BENCH_CHILD"):
        run_once()
        return
    results = []
    env = dict(os.environ, VOLDOR_BENCH_CHILD="1")
    for _ in range(N_RUNS):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                results.append(json.loads(line))
                break
            except json.JSONDecodeError:
                continue
    if not results:
        run_once()  # children failed (e.g. no subprocess allowed): run inline
        return
    results.sort(key=lambda r: r["value"])
    median = results[len(results) // 2]
    median["runs"] = [r["value"] for r in results]
    print(json.dumps(median))


if __name__ == "__main__":
    main()
