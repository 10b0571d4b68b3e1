"""Headline benchmark: KITTI-odometry-scale VO frames/sec on one chip.

Runs the full monocular VO pipeline (VOLDOR_SLAM.process_vo over a
24-frame synthetic sequence at the reference's KITTI half-resolution
613x185 compute grid, BASELINE.md) — covisibility-gated window stepping
with temporal/spatial keyframe depth priors, exactly as in production —
verifies Sim3-aligned ATE against ground truth, and reports the sustained
frame rate. A full-SLAM end-to-end record (VO + mapping links + loop
closure + PGO) is nested under "slam_e2e" when the time budget allows.

Baseline: the reference publishes no numbers (BASELINE.md); its README
claims real-time operation at the recommended 10 Hz KITTI input rate on an
unspecified CUDA GPU, so vs_baseline is measured against 10 frames/sec.

Budget discipline (round 2 timed out with NO number on record): ONE child
process runs VO warmup + N_TRIALS in-process timed passes (median — the
remote-TPU worker lottery is per-process, docs/PLATFORM_NOTES.md), prints
its VO JSON line IMMEDIATELY, then runs the SLAM e2e pass in the SAME
process (reusing every compiled VO executable, which dominates child wall
time). The parent relays each child line as it arrives and enforces a
self-imposed deadline (VOLDOR_BENCH_BUDGET_S, default 840 s) so the driver
always finds a parseable JSON tail no matter where time runs out.

The LAST JSON line on stdout is the headline record:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/10,
   "runs": [...], "slam_e2e": {...}?}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

N_TRIALS = 3  # in-process timed VO passes (median reported)

# CPU smoke-test runs (VOLDOR_BENCH_BACKEND=cpu) must never overwrite the
# durable docs/PERF_*.json TPU records with incomparable numbers.
_CPU_PIN = os.environ.get("VOLDOR_BENCH_BACKEND") == "cpu"

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


def build_stereo_sequence(n_flows=24):
    """The build_sequence scene plus per-frame ground-truth disparity
    (BASELINE.md 'VO stereo' config: KITTI flows + disparity input)."""
    import jax.numpy as jnp

    from voldor_tpu.ops import lie

    sys.path.insert(0, "tests")
    from synthetic import plane_depth, render_window

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

    flows, _, Ts = render_window(K, poses, planes, H, W, r2R)
    bf = 0.5 * 350.0  # reference auto virtual basefocal (voldor_slam.py:204)
    disps = [
        (bf / plane_depth(K, Ts[k][:3, :3], Ts[k][:3, 3], planes, H, W))
        .astype(np.float32)
        for k in range(n_flows)
    ]
    return flows, disps, bf, Ts


def run_stereo(n_trials: int = N_TRIALS, mode: str = "stereo"):
    """Disparity-anchored VO benchmark, both metric configs from
    BASELINE.md: mode="stereo" ('VO stereo': disparity as a hard depth
    prior, docs/PERF_STEREO.json) and mode="mono-scaled" ('VO RGB-D /
    mono-scaled (TUM)': mono windows + Huber disparity-scale fit,
    voldor_slam.py:472-492, docs/PERF_RGBD.json). Manual children
    (`VOLDOR_BENCH_CHILD=stereo|rgbd`) — kept off the driver's budgeted
    path because each solve config compiles its own executables."""
    import voldor_tpu  # noqa: F401
    from voldor_tpu.slam.system import VOLDOR_SLAM
    from voldor_tpu.utils.evaluation import ate_rmse

    flows, disps, bf, Ts_true = build_stereo_sequence(24)

    def make():
        slam = VOLDOR_SLAM(mode=mode)
        slam.use_image_info = False
        slam.voldor_user_config = ""
        slam.set_cam_params(350.0, 350.0, W / 2, H / 2, basefocal=bf)
        slam.flows = [flows[i] for i in range(flows.shape[0])]
        slam.N_FRAMES = flows.shape[0] + 1
        slam.h, slam.w = H, W
        slam.flow_loader_pt = flows.shape[0]
        slam.disps = list(disps)
        slam.disp_loader_pt = len(disps)
        return slam

    slam = make()
    while slam.process_vo():
        pass

    gt = np.linalg.inv(Ts_true)
    scene_extent = float(
        np.linalg.norm(gt[:, :3, 3] - gt[0, :3, 3], axis=1).max()
    )
    trials = []
    for _ in range(max(1, n_trials)):
        slam = make()
        t0 = time.perf_counter()
        while slam.process_vo():
            pass
        dt = time.perf_counter() - t0
        est = np.stack([f.Tcw for f in slam.frames])
        # both configs are METRIC: no scale alignment in the ATE protocol.
        # stereo anchors depth directly (tight gate); mono-scaled recovers
        # scale post-hoc from a robust disparity fit (looser gate).
        ate = ate_rmse(est.astype(np.float64), gt, with_scale=False)
        ok = bool(ate < (0.02 if mode == "stereo" else 0.05) * scene_extent)
        trials.append({
            "fps": (int(slam.N_FRAMES) / dt) if ok else 0.0,
            "dt": dt, "ate": ate, "ok": ok,
        })
    trials.sort(key=lambda r: r["fps"])
    med = trials[len(trials) // 2]
    stereo = mode == "stereo"
    rec = {
        "metric": ("kitti_stereo_vo_frames_per_sec_per_chip" if stereo
                   else "tum_mono_scaled_vo_frames_per_sec_per_chip"),
        "value": round(med["fps"], 3),
        "unit": f"frames/s ({W}x{H} {mode} VO pipeline, window 5)",
        "vs_baseline": round(med["fps"] / BASELINE_FPS, 3),
        "pipeline_s": round(med["dt"], 3),
        "n_frames": int(slam.N_FRAMES),
        "accuracy_ok": med["ok"],
        "ate_rmse": round(med["ate"], 5),
        "scene_extent": round(scene_extent, 2),
        "runs": [round(r["fps"], 3) for r in trials],
    }
    print(json.dumps(rec), flush=True)
    if not _CPU_PIN:
        try:
            from voldor_tpu.utils.artifacts import stamp

            path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "docs",
                                "PERF_STEREO.json" if stereo else "PERF_RGBD.json")
            with open(path, "w") as f:
                json.dump(stamp(rec, config=mode), f, indent=1)
        except OSError:
            pass
    return rec


def build_slam_scene(n_flows=60):
    """Out-and-back textured sequence with a genuine revisit (frames 0 and
    N see the same view) — the full-SLAM workload: VO + keyframes + local
    falign links + loop-closure retrieval + PGO (voldor_slam.py:729-828)."""
    import jax.numpy as jnp

    from voldor_tpu.ops import lie

    sys.path.insert(0, "tests")
    from synthetic import plane_depth, render_window

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
    rng = np.random.default_rng(11)
    half = n_flows // 2
    poses = np.zeros((n_flows, 6), np.float32)
    for f in range(n_flows):
        poses[f, :3] = rng.normal(0, 0.002, 3)
        sign = 1.0 if f < half else -1.0
        poses[f, 3:6] = [sign * 0.22, 0.01 * sign, 0.0]

    def r2R(rv):
        return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))

    flows, _, Ts = render_window(K, poses, planes, H, W, r2R)

    # textured images: a world-anchored procedural texture on the planes, so
    # a revisit reproduces the view (ORB features + retrieval work on it)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    rays = np.stack([xs, ys, np.ones_like(xs)], -1) @ np.linalg.inv(
        np.asarray(K, np.float64)
    ).T
    images_bgri, images_grayf = [], []
    for k in range(n_flows + 1):
        R, t = Ts[k][:3, :3], Ts[k][:3, 3]
        d = plane_depth(K, R, t, planes, H, W).astype(np.float64)
        Xc = rays * d[..., None]
        Xw = (Xc - t) @ R  # R^T (Xc - t), row-vector form
        # hard-edged blob pattern: thresholded sinusoids give strong corners
        # (ORB/FAST finds nothing on smooth gradients — measured 0 features
        # on the raw sinusoid mixture)
        t1 = np.sin(2.1 * Xw[..., 0]) * np.cos(1.7 * Xw[..., 1])
        t2 = np.sin(0.9 * Xw[..., 0] + 1.3 * Xw[..., 1] + 0.7 * Xw[..., 2])
        t3 = np.sin(3.7 * Xw[..., 0]) * np.sin(2.9 * Xw[..., 1])
        tex = 40.0 + 75.0 * (t1 > 0) + 60.0 * (t2 > 0.3) + 45.0 * (t3 > 0.2)
        g8 = np.clip(tex, 0, 255).astype(np.uint8)
        images_bgri.append(np.repeat(g8[..., None], 3, axis=-1))
        images_grayf.append(g8.astype(np.float32) / 255.0)
    return flows, images_bgri, images_grayf, Ts


def _make_slam_e2e(flows, images_bgri, images_grayf):
    from voldor_tpu.slam.system import VOLDOR_SLAM

    slam = VOLDOR_SLAM(mode="mono")
    slam.set_cam_params(350.0, 350.0, W / 2, H / 2)
    slam.flows = [flows[i] for i in range(flows.shape[0])]
    slam.N_FRAMES = flows.shape[0] + 1
    slam.h, slam.w = H, W
    slam.flow_loader_pt = flows.shape[0]
    slam.images_bgri = list(images_bgri)
    slam.images_grayf = list(images_grayf)
    slam.image_loader_pt = len(images_bgri)
    # VOLDOR_BENCH_VOCAB=path loads a pretrained DBoW text vocabulary
    # (e.g. data/vocab_k10L4.txt.gz) instead of the built-in online one —
    # used to validate the real-vocab LC path end-to-end (docs/LC_PR.json)
    slam.enable_loop_closure(os.environ.get("VOLDOR_BENCH_VOCAB") or None)
    # short sequence: relax the (20-keyframe) revisit distance gate (the
    # return leg re-covers outbound views, so covisibility stepping yields
    # few return-leg keyframes)
    slam.lc_min_kf_distance = 3
    return slam


def _run_slam_once(flows, images_bgri, images_grayf):
    import threading

    slam = _make_slam_e2e(flows, images_bgri, images_grayf)
    t0 = time.perf_counter()
    vo = threading.Thread(target=slam.vo_thread, daemon=True)
    mp = threading.Thread(target=slam.mapping_thread, daemon=True)
    vo.start()
    mp.start()
    vo.join(timeout=600)
    mp.join(timeout=600)
    dt = time.perf_counter() - t0
    # a hung thread must be visible, not silently measured as a partial map
    timed_out = vo.is_alive() or mp.is_alive()
    est = np.stack([f.Tcw for f in slam.frames])
    return slam, dt, est, timed_out


def run_slam_e2e():
    """Full-SLAM benchmark (VERDICT r1 #5): mapping + links + LC + PGO.

    Cold pass first, then a warm (timed) pass — and a parseable record is
    printed after EACH pass, so even a driver budget that kills the child
    mid-warm-pass still has a slam_e2e line in the tail (the round-3 'all'
    child was cut before printing anything for SLAM; VERDICT r3 weak #2).
    The cold record is flagged `"pass": "cold"` — it includes the falign/
    PGO compiles — and is superseded by the warm record when the remaining
    budget (VOLDOR_BENCH_DEADLINE_UNIX, set by the parent) allows the
    second pass; consumers should take the LAST slam record.
    """
    import voldor_tpu  # noqa: F401
    from voldor_tpu.utils.evaluation import ate_rmse

    flows, images_bgri, images_grayf, Ts_true = build_slam_scene(60)
    gt = np.linalg.inv(Ts_true)
    scene_extent = float(
        np.linalg.norm(gt[:, :3, 3] - gt[0, :3, 3], axis=1).max()
    )

    def record(slam, dt, est, timed_out, pass_name):
        ate = ate_rmse(est.astype(np.float64), gt, with_scale=True)
        n_lc_edges = sum(1 for e in slam.edges if e.edge_type == "falign-lc")
        rec = {
            "metric": "kitti_slam_e2e_frames_per_sec_per_chip",
            "value": round(int(slam.N_FRAMES) / dt, 3),
            "unit": "frames/s (613x185 mono SLAM: VO+links+LC+PGO)",
            "pass": pass_name,
            "wall_s": round(dt, 3),
            "n_frames": int(slam.N_FRAMES),
            "n_keyframes": len(slam.kf_ids),
            "n_edges": len(slam.edges),
            "n_lc_edges": n_lc_edges,
            "ate_rmse": round(ate, 5),
            "scene_extent": round(scene_extent, 2),
            "accuracy_ok": bool(ate < 0.02 * scene_extent and not timed_out),
        }
        if timed_out:
            rec["timed_out"] = True
        print(json.dumps(rec), flush=True)
        # durable record (VERDICT r2 #5): mapping/LC/PGO throughput must
        # survive outside the (timeout-prone) driver bench tail
        if not _CPU_PIN and pass_name == "warm":
            try:
                from voldor_tpu.utils.artifacts import stamp

                path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "docs", "PERF_SLAM_E2E.json")
                with open(path, "w") as f:
                    json.dump(stamp(rec, config="mono full SLAM"), f, indent=1)
            except OSError:
                pass
        return rec

    # cold pass: compiles whatever this process hasn't compiled yet
    cold = _run_slam_once(flows, images_bgri, images_grayf)
    rec = record(*cold, "cold")

    # warm pass only if the parent's budget still fits one (estimate: the
    # warm pass is never slower than the cold one; require half of it plus
    # slack). No deadline env (standalone child mode) = always run it.
    deadline = float(os.environ.get("VOLDOR_BENCH_DEADLINE_UNIX", "0"))
    if deadline and time.time() + 0.5 * cold[1] + 30.0 > deadline:
        return rec
    warm = _run_slam_once(flows, images_bgri, images_grayf)
    return record(*warm, "warm")


def _make_slam(flows):
    from voldor_tpu.slam.system import VOLDOR_SLAM

    slam = VOLDOR_SLAM(mode="mono")
    slam.use_image_info = False
    # Engine defaults (anchored cost + hybrid sweep + obs collect) — the
    # fast path IS the default; accuracy gated below and in
    # docs/ACCURACY_AB.json.
    slam.voldor_user_config = ""
    slam.set_cam_params(350.0, 350.0, W / 2, H / 2)
    slam.flows = [flows[i] for i in range(flows.shape[0])]
    slam.N_FRAMES = flows.shape[0] + 1
    slam.h, slam.w = H, W
    slam.flow_loader_pt = flows.shape[0]
    return slam


def run_once(n_trials: int = N_TRIALS):
    """VO benchmark: one compile warmup pass + n_trials timed in-process
    passes; prints the MEDIAN trial (PLATFORM_NOTES prescribes in-process
    medians — per-trial throughput fluctuates ~2x on the remote backend)."""
    import voldor_tpu  # noqa: F401
    from voldor_tpu.utils.evaluation import ate_rmse

    flows, Ts_true = build_sequence(24)

    # warmup: run the FULL sequence once so every executable the timed run
    # needs is compiled (bootstrap window, 1-prior and 2-prior windows — a
    # partial warmup left an ~0.8s mid-sequence recompile in the timing)
    slam = _make_slam(flows)
    while slam.process_vo():
        pass

    gt = np.linalg.inv(Ts_true)  # (n_flows+1, 4, 4) cam->world
    scene_extent = float(
        np.linalg.norm(gt[:, :3, 3] - gt[0, :3, 3], axis=1).max()
    )

    trials = []
    for _ in range(max(1, n_trials)):
        # timed: the real VO pipeline (windows warm-started by temporal/
        # spatial keyframe depth priors — only window 0 pays the bootstrap)
        slam = _make_slam(flows)
        t0 = time.perf_counter()
        while slam.process_vo():
            pass
        dt = time.perf_counter() - t0
        n_frames = int(slam.N_FRAMES)
        est = np.stack([f.Tcw for f in slam.frames])  # cam->world (frame.py)
        ate = ate_rmse(est.astype(np.float64), gt, with_scale=True)
        ok = bool(ate < 0.02 * scene_extent)
        trials.append({
            "fps": (n_frames / dt) if ok else 0.0,
            "dt": dt, "ate": ate, "ok": ok, "n_frames": n_frames,
        })

    trials.sort(key=lambda r: r["fps"])
    med = trials[len(trials) // 2]
    print(
        json.dumps(
            {
                "metric": "kitti_vo_frames_per_sec_per_chip",
                "value": round(med["fps"], 3),
                "unit": "frames/s (613x185 mono VO pipeline, window 5)",
                "vs_baseline": round(med["fps"] / BASELINE_FPS, 3),
                "pipeline_s": round(med["dt"], 3),
                "n_frames": med["n_frames"],
                "accuracy_ok": med["ok"],
                "ate_rmse": round(med["ate"], 5),
                "scene_extent": round(scene_extent, 2),
                "runs": [round(r["fps"], 3) for r in trials],
            }
        ),
        flush=True,
    )


def run_all():
    """Child mode 'all': VO benchmark line first (the headline number must
    be on stdout before anything slow happens), then the SLAM e2e line in
    the SAME process so it reuses every compiled VO executable."""
    run_once()
    run_slam_e2e()


def _last_json_line(text):
    for line in reversed(text.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return None


def _tunnel_alive(timeout_s: float = 150.0) -> bool:
    """Probe the remote-TPU tunnel in a disposable child. When the axon
    tunnel is down, `jax.devices()` HANGS indefinitely instead of raising
    (observed: >10 min block) — so any in-process device touch would eat
    the whole bench budget and leave an empty stdout tail (the round-2
    failure mode). A hard-timeout child keeps the parent responsive."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def _print_unreachable_record():
    """A parseable headline line even when no measurement is possible —
    value 0 / accuracy_ok false marks the result invalid, and the error
    field records the cause plus where the last committed on-TPU
    measurement lives."""
    print(
        json.dumps(
            {
                "metric": "kitti_vo_frames_per_sec_per_chip",
                "value": 0.0,
                "unit": "frames/s (613x185 mono VO pipeline, window 5)",
                "vs_baseline": 0.0,
                "accuracy_ok": False,
                "error": "tpu tunnel unreachable (jax.devices() hung in a "
                "probe child); last committed on-TPU measurements: "
                "docs/PERF_PIPELINE.json, docs/PERF_SLAM_E2E.json",
            }
        ),
        flush=True,
    )


def main():
    # VOLDOR_BENCH_BACKEND=cpu pins the local CPU backend — a smoke-test
    # escape hatch for bench logic while the remote-TPU tunnel is down
    # (fps numbers produced this way are NOT comparable to TPU records).
    if os.environ.get("VOLDOR_BENCH_BACKEND") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    child = os.environ.get("VOLDOR_BENCH_CHILD")
    if child == "slam":
        run_slam_e2e()
        return
    if child == "stereo":
        run_stereo()
        return
    if child == "rgbd":
        run_stereo(mode="mono-scaled")
        return
    if child == "all":
        run_all()
        return
    if child:
        run_once()
        return

    # Parent: ONE child process (mode 'all'), stdout streamed line-by-line.
    # Every JSON line the child prints is relayed IMMEDIATELY, so whatever
    # the driver's timeout is, the tail always carries the latest complete
    # record. A self-imposed deadline kills the child cleanly and the final
    # (combined) record is printed from whatever arrived.
    budget_s = float(os.environ.get("VOLDOR_BENCH_BUDGET_S", "840"))
    deadline = time.monotonic() + budget_s
    if not _tunnel_alive():
        _print_unreachable_record()
        return
    records = []
    try:
        proc = subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__)],
            env=dict(
                os.environ,
                VOLDOR_BENCH_CHILD="all",
                # run_slam_e2e consults this (wall-clock) deadline to decide
                # whether a warm pass still fits after the cold one
                VOLDOR_BENCH_DEADLINE_UNIX=str(time.time() + budget_s - 20.0),
            ),
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        import selectors

        sel = selectors.DefaultSelector()
        sel.register(proc.stdout, selectors.EVENT_READ)
        while True:
            remain = deadline - time.monotonic()
            if remain <= 0:
                proc.kill()
                break
            if not sel.select(timeout=min(remain, 5.0)):
                if proc.poll() is not None:
                    break
                continue
            chunk = proc.stdout.readline()
            if chunk == "":
                break
            try:
                rec = json.loads(chunk.strip())
            except json.JSONDecodeError:
                continue
            records.append(rec)
            if rec.get("metric") == "kitti_vo_frames_per_sec_per_chip":
                print(json.dumps(rec), flush=True)  # headline out EARLY
        proc.wait(timeout=30)
    except Exception:
        pass

    vo = next(
        (r for r in records if r.get("metric") == "kitti_vo_frames_per_sec_per_chip"),
        None,
    )
    # LAST slam record wins: the child prints a cold-pass record first and
    # a warm-pass record if the budget allowed the second run
    slam_r = next(
        (r for r in reversed(records)
         if r.get("metric") == "kitti_slam_e2e_frames_per_sec_per_chip"),
        None,
    )
    if vo is None:
        # child never delivered: run inline as a last resort — but only if
        # the tunnel is still up (it can die mid-run; an inline device
        # touch would then hang past the driver timeout with no tail)
        if _tunnel_alive(timeout_s=60.0):
            run_once(n_trials=1)
        else:
            _print_unreachable_record()
        return
    if slam_r is not None:
        vo = dict(vo)
        vo["slam_e2e"] = slam_r  # child already wrote docs/PERF_SLAM_E2E.json
    print(json.dumps(vo), flush=True)


if __name__ == "__main__":
    main()
