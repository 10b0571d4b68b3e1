"""Decompose the steady-state VO window's DEVICE time on the TPU.

The pipelined driver hides all host work behind the in-flight solve
(docs/PERF_PIPELINE.json: collect_block ~= window wall), so the bench fps
is bound by per-window device time. The fused solve itself measures
~138 ms (docs/PERF_ABLATE.json baseline) — this tool attributes the rest:
upload, the init-time prior-fusion depth round, the priors-variant solve,
depth-confidence, covisibility, and the dense D2H copies.

Method: rebuild the exact bench window (2 depth priors, f16 transfer,
covis_spec) via voldor_dispatch and time the warm end-to-end chain, then
variants with one component removed each. Writes docs/PERF_WINDOW.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

H, W = 185, 613
WINDOW = 5
TRIALS = 7


def main():
    import jax
    import jax.numpy as jnp

    import voldor_tpu  # noqa: F401
    from voldor_tpu.ops import lie
    from voldor_tpu.vo.api import voldor_dispatch
    from synthetic import render_window

    K = np.array([[350.0, 0, W / 2], [0, 350.0, H / 2], [0, 0, 1]], np.float32)

    def n_(v):
        v = np.asarray(v, np.float64)
        return v / np.linalg.norm(v)

    planes = [(n_([0.1, 0.15, 1.0]), 8.0), (n_([-0.35, 0.1, 1.0]), 6.5),
              (n_([0.3, -0.25, 1.0]), 7.0)]
    rng = np.random.default_rng(7)
    poses = np.zeros((WINDOW, 6), np.float32)
    for f in range(WINDOW):
        poses[f, :3] = rng.normal(0, 0.005, 3)
        poses[f, 3:6] = [0.1, 0.01, 0.35]

    def r2R(rv):
        return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))

    flows_np, depth0_np, _ = render_window(K, poses, planes, H, W, r2R)
    # two plausible depth priors (temporal + spatial keyframe), as device
    # handles like the pipelined driver passes them
    prior0 = jnp.asarray(depth0_np)
    prior1 = jnp.asarray(depth0_np * 1.02)
    pconf = jnp.ones((H, W), jnp.float32)
    prior_poses = np.stack([np.zeros(6, np.float32),
                            np.asarray([0, 0, 0, 0.05, 0, -0.3], np.float32)])

    M = np.eye(4, dtype=np.float32)
    base_kw = dict(
        fx=350.0, fy=350.0, cx=W / 2, cy=H / 2, basefocal=175.0,
        depth_priors=[prior0, prior1],
        depth_prior_poses=prior_poses,
        depth_prior_pconfs=[pconf, pconf],
        pad_window_to=WINDOW,
        covis_spec={
            "conf_thresh": 0.3,
            "spakf": (prior1, pconf, 1.0, M),
        },
    )

    def timed(name, reps=TRIALS, collect=True, **over):
        kw = dict(base_kw)
        kw.update(over)
        for _ in range(2):  # compile + warm
            h = voldor_dispatch(flows_np, **kw)
            h.collect() if collect else None
            jax.block_until_ready(h.engine.depth)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            h = voldor_dispatch(flows_np, **kw)
            if collect:
                h.collect()
            jax.block_until_ready(h.engine.depth)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        print(json.dumps({"variant": name, "median_ms": round(med * 1e3, 1),
                          "runs_ms": [round(t * 1e3, 1) for t in ts]}),
              flush=True)
        return med

    def stage_decomposition(reps=TRIALS):
        """Serialize the dispatch chain with a device sync after each stage.

        Mirrors voldor_dispatch's internals (vo/api.py) stage by stage.
        Per-stage sync adds ~one tunnel latency each, so the stage sum
        exceeds the pipelined 'full' number — the RATIOS are the signal.
        """
        from voldor_tpu.config import VoldorConfig
        from voldor_tpu.ops.covis import covis_keyframe, covis_window
        from voldor_tpu.vo.engine import VoldorEngine, _depth_confidence_jit

        cfg = VoldorConfig(fx=350.0, fy=350.0, cx=W / 2, cy=H / 2,
                           basefocal=175.0)
        K_np = np.array([[350.0, 0, W / 2], [0, 350.0, H / 2], [0, 0, 1]],
                        np.float32)
        M_np = np.eye(4, dtype=np.float32)
        kf = base_kw["covis_spec"]["spakf"]
        stages = {}

        def run_once(record):
            def mark(name, t0):
                if record:
                    stages.setdefault(name, []).append(
                        time.perf_counter() - t0
                    )

            t0 = time.perf_counter()
            engine = VoldorEngine(cfg)
            engine.init(
                flows_np,
                depth_priors=[prior0, prior1],
                depth_prior_poses=prior_poses,
                depth_prior_pconfs=[pconf, pconf],
            )
            jax.block_until_ready(engine.flows)
            mark("upload", t0)
            t0 = time.perf_counter()
            jax.block_until_ready(engine.depth)
            mark("init_fusion_round", t0)
            t0 = time.perf_counter()
            engine.solve(defer_host=True)
            jax.block_until_ready(engine.poses6)
            mark("solve", t0)
            t0 = time.perf_counter()
            conf = _depth_confidence_jit(
                engine.rigidness, engine.dp_confs, engine._st_scalars[0]
            )
            jax.block_until_ready(conf)
            mark("depth_conf", t0)
            t0 = time.perf_counter()
            cv = covis_window(
                engine.depth, conf, engine.poses6, engine._st_scalars[0],
                K_np, np.float32(0.3), n_cap=WINDOW,
            )
            cv2_ = covis_keyframe(
                kf[0], kf[1], np.float32(kf[2]),
                engine.poses6, engine._st_scalars[0], M_np, K_np,
                np.float32(0.3), n_cap=WINDOW,
            )
            jax.block_until_ready((cv, cv2_))
            mark("covis", t0)
            t0 = time.perf_counter()
            engine.finalize_host(
                [engine.poses6[:WINDOW], engine.pose_covars[:WINDOW], cv, cv2_]
            )
            mark("scalar_readback", t0)

        run_once(False)  # compile + warm
        run_once(False)
        for _ in range(reps):
            run_once(True)
        rec = {}
        for name, ts in stages.items():
            ts.sort()
            rec[name] = round(ts[len(ts) // 2] * 1e3, 1)
        print(json.dumps({"stage_decomposition_ms": rec}), flush=True)
        return rec

    out = {}
    out["full"] = timed("full (bench steady-state)")
    out["stages"] = stage_decomposition()
    out["no_covis"] = timed("no_covis", covis_spec=None)
    out["one_prior"] = timed(
        "one_prior",
        depth_priors=[prior0], depth_prior_poses=prior_poses[:1],
        depth_prior_pconfs=[pconf],
    )
    out["host_priors"] = timed(
        "host_priors (numpy upload)",
        depth_priors=[np.asarray(prior0), np.asarray(prior1)],
    )
    out["f32_transfer"] = timed(
        "f32_transfer", config="--transfer_dtype float32"
    )
    out["prior_round_mode"] = timed(
        "prior_sample_round", config="--prior_sample_mode round"
    )
    out["no_collect"] = timed("dispatch_only (no scalar readback)",
                              collect=False)

    rec = {k: (v if isinstance(v, dict) else round(v * 1e3, 1))
           for k, v in out.items()}
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "PERF_WINDOW.json")
    with open(path, "w") as f:
        from voldor_tpu.utils.artifacts import stamp
        json.dump(stamp(rec), f, indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
