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
sys.path.insert(0, os.path.dirname(__file__))

H, W = 185, 613


def build_pairs(P=16):
    import cv2

    import real_scene as RS

    K = np.array([[350.0, 0, W / 2], [0, 350.0, H / 2], [0, 0, 1]])
    planes, textures = RS._planes(), RS._textures()
    cams = RS.trajectory(P + 4)
    rng = np.random.default_rng(3)
    images, depths = [], []
    for T in cams:
        img, dep = RS.render_view(
            K, T[:3, :3], T[:3, 3], planes, textures, H, W, rng=rng
        )
        images.append(cv2.cvtColor(img, cv2.COLOR_RGB2GRAY))
        depths.append(np.where(np.isfinite(dep), dep, 0.0).astype(np.float32))
    deps, wgts, imgs = [], [], []
    for i in range(P):
        for j in (i, i + 3):  # ~3-frames-apart keyframe pair
            dj = depths[j]
            good = dj > 0
            med = np.median(dj[good])
            d = cv2.GaussianBlur(
                np.where(good, dj, med).astype(np.float32), (5, 5), 0
            )
            deps.append(d * (10.0 / med))  # LC mono normalization
            wgts.append(good.astype(np.float32))  # sky/hole weight 0
            imgs.append(cv2.GaussianBlur(
                images[j].astype(np.float32) / 255.0, (9, 9), 0))
    shape = (P, 2, H, W)
    return (np.stack(deps).reshape(shape), np.stack(wgts).reshape(shape),
            np.stack(imgs).reshape(shape))


def run(deps, wgts, imgs, P, photo, stride, reps=3, tag="", coarse=0,
        fine_iters=100, poses=None):
    from voldor_tpu.falign.api import falign_pairs

    kw = dict(
        depths=deps[:P], fx=350.0, fy=350.0, cx=W / 2, cy=H / 2,
        weights=wgts[:P], optimize_7dof=True, stride=stride,
        vbf=175.0 * 5, crw=10.0,
    )
    if photo:
        kw["images"] = imgs[:P]
    if coarse:
        kw["coarse_stride"] = coarse
        kw["fine_iters"] = fine_iters
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
    if coarse:
        rec["coarse_stride"] = coarse
        rec["fine_iters"] = fine_iters
        rec["iters_coarse"] = [r["iters_coarse"] for r in rets]
    if poses is not None:
        # max relative-pose translation deviation vs a reference run —
        # sanity that a schedule variant lands on the same optimum
        dev = max(
            float(np.linalg.norm(r["poses_ret"][1][3:6]
                                 - pr["poses_ret"][1][3:6]))
            for r, pr in zip(rets, poses)
        )
        rec["max_t_dev_vs_ref"] = round(dev, 5)
    print(json.dumps(rec), flush=True)
    return rets, rec


def main():
    deps, wgts, imgs = build_pairs(16)
    recs = []
    ref_lc, rec = run(deps, wgts, imgs, 16, True, 3, tag="lc16_photo")
    recs.append(rec)
    for tag, args in [
        ("lc16_geo", dict(P=16, photo=False, stride=3)),
        ("lc4_photo", dict(P=4, photo=True, stride=3)),
        ("lc1_photo", dict(P=1, photo=True, stride=3)),
        ("local16_photo_s4", dict(P=16, photo=True, stride=4)),
        ("local4_photo_s4", dict(P=4, photo=True, stride=4)),
    ]:
        recs.append(run(deps, wgts, imgs, tag=tag, **args)[1])
    # coarse-to-fine schedule (falign_coarse_factor): same problems, bulk
    # iterations at 2x stride + <=25 fine — compare best_s and final poses
    # against the single-phase lc16_photo/local16 rows above
    recs.append(run(deps, wgts, imgs, 16, True, 3, tag="lc16_photo_c2f",
                    coarse=6, fine_iters=25, poses=ref_lc)[1])
    ref_local, rec = run(deps, wgts, imgs, 16, True, 4,
                         tag="local16_photo_s4_c2f", coarse=8, fine_iters=25)
    recs.append(rec)
    recs.append(run(deps, wgts, imgs, 16, False, 3, tag="lc16_geo_c2f",
                    coarse=6, fine_iters=25)[1])
    # local-link schedule variants: the s4_c2f fine phase saturates its
    # 25-iteration cap on ~half the lanes (coarse stride 8 hands off too
    # far from the stride-4 optimum) — try a closer coarse grid and a
    # tighter fine budget, deviation-checked against the saturated run
    recs.append(run(deps, wgts, imgs, 16, True, 4, tag="local16_s4_c6",
                    coarse=6, fine_iters=25, poses=ref_local)[1])
    recs.append(run(deps, wgts, imgs, 16, True, 4, tag="local16_s4_c6_f12",
                    coarse=6, fine_iters=12, poses=ref_local)[1])
    recs.append(run(deps, wgts, imgs, 16, True, 3, tag="lc16_c2f_f12",
                    coarse=6, fine_iters=12, poses=ref_lc)[1])
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "PERF_FALIGN.json")
    with open(path, "w") as f:
        from voldor_tpu.utils.artifacts import stamp
        json.dump(stamp({"runs": recs}), f, indent=1)


if __name__ == "__main__":
    main()
