"""Microbenchmark of the batched falign path on representative inputs.

Full-SLAM profiling (docs/PERF_SLAM_PHASES.json) shows falign_pairs is
~95% of the e2e wall. This tool isolates it: LC-style bucket-16 problems
built from the real-texture renderer (tests/realscene.py), timed warm,
with per-lane LM iteration counts — the data that decides between
fewer-iterations, smaller-buckets, and cheaper-iterations work.
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


def build_pairs(P=16):
    import cv2

    import realscene as RS

    K = np.array([[350.0, 0, W / 2], [0, 350.0, H / 2], [0, 0, 1]])
    images, depths, Ts = RS.render_sequence(P + 4, H, W, K)
    deps, wgts, imgs = [], [], []
    for i in range(P):
        for j in (i, i + 3):  # ~3-frames-apart keyframe pair
            d = cv2.GaussianBlur(depths[j], (5, 5), 0)
            deps.append(d * (10.0 / np.median(d)))  # LC mono normalization
            wgts.append(np.ones((H, W), np.float32))
            imgs.append(cv2.GaussianBlur(
                images[j].astype(np.float32) / 255.0, (9, 9), 0))
    shape = (P, 2, H, W)
    return (np.stack(deps).reshape(shape), np.stack(wgts).reshape(shape),
            np.stack(imgs).reshape(shape))


def run(deps, wgts, imgs, P, photo, stride, reps=3, tag=""):
    from voldor_tpu.falign.api import falign_pairs

    kw = dict(
        depths=deps[:P], fx=350.0, fy=350.0, cx=W / 2, cy=H / 2,
        weights=wgts[:P], optimize_7dof=True, stride=stride,
        vbf=175.0 * 5, crw=10.0,
    )
    if photo:
        kw["images"] = imgs[:P]
    falign_pairs(**kw)  # compile
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        rets = falign_pairs(**kw)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    iters = [r["iters"] for r in rets]
    rec = {"tag": tag, "P": P, "photo": photo, "stride": stride,
           "best_s": round(best, 3), "iters": iters,
           "s_per_iter_batch": round(best / max(iters), 4)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    deps, wgts, imgs = build_pairs(16)
    recs = []
    recs.append(run(deps, wgts, imgs, 16, True, 3, tag="lc16_photo"))
    recs.append(run(deps, wgts, imgs, 16, False, 3, tag="lc16_geo"))
    recs.append(run(deps, wgts, imgs, 4, True, 3, tag="lc4_photo"))
    recs.append(run(deps, wgts, imgs, 1, True, 3, tag="lc1_photo"))
    recs.append(run(deps, wgts, imgs, 16, True, 4, tag="local16_photo_s4"))
    recs.append(run(deps, wgts, imgs, 4, True, 4, tag="local4_photo_s4"))
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "PERF_FALIGN.json")
    with open(path, "w") as f:
        from voldor_tpu.utils.artifacts import stamp
        json.dump(stamp({"runs": recs}), f, indent=1)


if __name__ == "__main__":
    main()
