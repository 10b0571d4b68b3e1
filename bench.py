"""Headline benchmark: KITTI-odometry-scale VO frames/sec on one chip.

Runs the full VO EM solve (window of 5 flows, 613x185 compute grid — the
reference's KITTI half-resolution setting, BASELINE.md) on synthetic
ground-truth flows, verifies the solution is correct, and reports the
sustained frame rate.

Baseline: the reference publishes no numbers (BASELINE.md); its README
claims real-time operation at the recommended 10 Hz KITTI input rate on an
unspecified CUDA GPU, so vs_baseline is measured against 10 frames/sec.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/10}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_FPS = 10.0  # reference README.md:160 recommended KITTI input rate
WINDOW = 5
VO_STEP = 2  # typical covisibility-gated frame advance per solve (mono KITTI)
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


def main():
    import voldor_tpu  # noqa: F401
    from voldor_tpu.config import VoldorConfig
    from voldor_tpu.vo.engine import VoldorEngine

    flows, depth0, poses_true = build_scene()
    cfg = VoldorConfig(fx=350.0, fy=350.0, cx=W / 2, cy=H / 2, basefocal=175.0)
    cfg.silent = True

    # warmup / compile
    engine = VoldorEngine(cfg)
    engine.init(flows)
    engine.solve()

    # timed trials
    times = []
    for _ in range(5):
        e = VoldorEngine(cfg)
        e.init(flows)
        t0 = time.perf_counter()
        e.solve()
        times.append(time.perf_counter() - t0)
    solve_s = float(np.median(times))

    # sanity: the benchmark only counts if the solve is actually correct
    s = WINDOW / np.linalg.norm(poses_true[:, 3:6], axis=1).sum()
    rvec_err = float(np.abs(e.poses[:, :3] - poses_true[:, :3]).max())
    t_err = float(np.abs(e.poses[:, 3:6] - poses_true[:, 3:6] * s).max())
    ok = rvec_err < 5e-3 and t_err < 5e-2 and e.n_flows == WINDOW

    fps = VO_STEP / solve_s if ok else 0.0
    print(
        json.dumps(
            {
                "metric": "kitti_vo_frames_per_sec_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s (613x185 window-5 EM solve, stride 2)",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "solve_s": round(solve_s, 3),
                "accuracy_ok": ok,
                "rvec_err": round(rvec_err, 6),
                "t_err": round(t_err, 6),
            }
        )
    )


if __name__ == "__main__":
    main()
