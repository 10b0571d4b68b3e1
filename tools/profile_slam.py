"""Phase profiling of the full-SLAM e2e bench workload on the TPU.

Runs the bench.py 60-frame out-and-back SLAM scene (VO + local links +
loop closure + PGO) twice — warmup then timed — with wall timers around
every major phase: per-call falign_pairs (split by first-call compile vs
warm), solve_pgo, the VO windows, append_kf feature work, and the VO
thread's _block_vo_signal stall. Writes docs/PERF_SLAM_PHASES.json.

The point (VERDICT r3 #5): full-SLAM measured ~30x slower than plain VO;
this artifact says where the wall time goes before anything is "fixed".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import bench as B
    import voldor_tpu.falign.api as FA
    import voldor_tpu.slam.system as S

    flows, images_bgri, images_grayf, _ = B.build_slam_scene(60)

    calls: dict[str, list] = {}

    def wrap(mod, name, label, extra=None):
        orig = getattr(mod, name)

        def f(*a, **kw):
            t0 = time.perf_counter()
            r = orig(*a, **kw)
            rec = {"s": round(time.perf_counter() - t0, 4)}
            if extra:
                rec.update(extra(a, kw, r))
            calls.setdefault(label, []).append(rec)
            return r

        setattr(mod, name, f)
        return orig

    wrap(FA, "falign_pairs", "falign_pairs",
         extra=lambda a, kw, r: {
             "n_pairs": int(kw["depths"].shape[0] if "depths" in kw
                            else a[0].shape[0]),
             "photo": ("images" in kw and kw["images"] is not None),
         })
    wrap(S.VOLDOR_SLAM, "solve_pgo", "solve_pgo")
    wrap(S.VOLDOR_SLAM, "process_vo", "process_vo")
    wrap(S.VOLDOR_SLAM, "append_kf", "append_kf")
    wrap(S.VOLDOR_SLAM, "establish_links_batch", "links_batch",
         extra=lambda a, kw, r: {
             "n_pairs": len(a[1]) if len(a) > 1 else len(kw.get("pair_list", [])),
             "kind": kw.get("kind", a[2] if len(a) > 2 else "local"),
         })

    # VO-thread stall on _block_vo_signal: patch vo_thread's wait loop by
    # timing it via a subclassed property is invasive; instead sample the
    # signal from a watcher thread at 2ms resolution.
    stall = {"s": 0.0}
    stop = {"flag": False}

    def watcher(slam):
        t_prev = time.perf_counter()
        while not stop["flag"]:
            time.sleep(0.002)
            now = time.perf_counter()
            if slam._block_vo_signal:
                stall["s"] += now - t_prev
            t_prev = now

    import threading

    def run(tag):
        for k in list(calls):
            calls[k].clear()
        stall["s"] = 0.0
        stop["flag"] = False
        slam = B._make_slam_e2e(flows, images_bgri, images_grayf)
        w = threading.Thread(target=watcher, args=(slam,), daemon=True)
        w.start()
        t0 = time.perf_counter()
        vo = threading.Thread(target=slam.vo_thread, daemon=True)
        mp = threading.Thread(target=slam.mapping_thread, daemon=True)
        vo.start(); mp.start()
        vo.join(timeout=900); mp.join(timeout=900)
        dt = time.perf_counter() - t0
        stop["flag"] = True
        out = {
            "wall_s": round(dt, 3),
            "fps": round(int(slam.N_FRAMES) / dt, 3),
            "n_keyframes": len(slam.kf_ids),
            "n_edges": len(slam.edges),
            "block_vo_stall_s": round(stall["s"], 3),
            "phases": {},
        }
        for k, v in calls.items():
            tot = round(sum(c["s"] for c in v), 3)
            out["phases"][k] = {
                "n_calls": len(v),
                "total_s": tot,
                "calls": v if k != "process_vo" else
                [c["s"] for c in v],
            }
        print(tag, json.dumps({k: (v["n_calls"], v["total_s"])
                               for k, v in out["phases"].items()}),
              "wall", out["wall_s"], "stall", out["block_vo_stall_s"],
              flush=True)
        return out

    cold = run("cold")
    warm = run("warm")
    out = {"cold": cold, "warm": warm}
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "PERF_SLAM_PHASES.json")
    with open(path, "w") as f:
        from voldor_tpu.utils.artifacts import stamp
        json.dump(stamp(out), f, indent=1)
    print(json.dumps(out["warm"])[:2000])


if __name__ == "__main__":
    main()
