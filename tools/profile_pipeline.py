"""Pipeline-level phase timing of the VO bench workload on the TPU.

Times each pipelined VO window's phases (bootstrap / fused solve dispatch /
collect block / host finalize) across the bench sequence, after a full
warmup pass. `dispatch` is the async window enqueue (voldor_dispatch);
`collect_block` is the host's wait on the in-flight solve — under perfect
overlap it approaches the device solve time minus inter-window host work.
Writes docs/PERF_PIPELINE.json. Single-process medians per
docs/PLATFORM_NOTES.md; cross-process comparisons are meaningless.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax  # noqa: F401

    import bench as B
    import voldor_tpu.vo.api as A
    import voldor_tpu.vo.engine as E

    flows, _ = B.build_sequence(24)

    phases = []
    orig_solve = E.VoldorEngine.solve
    orig_boot = E.VoldorEngine.bootstrap
    orig_fin = E.VoldorEngine.finalize_host
    orig_dispatch = A.voldor_dispatch
    orig_collect = A.VoWindow.collect

    def wrap(name, orig):
        def f(*a, **kw):
            t0 = time.perf_counter()
            r = orig(*a, **kw)
            phases.append((name, time.perf_counter() - t0))
            return r
        return f

    E.VoldorEngine.solve = wrap("solve_dispatch", orig_solve)
    E.VoldorEngine.bootstrap = wrap("bootstrap", orig_boot)
    E.VoldorEngine.finalize_host = wrap("finalize_host", orig_fin)
    A.voldor_dispatch = wrap("dispatch", orig_dispatch)
    A.VoWindow.collect = wrap("collect_block", orig_collect)

    slam = B._make_slam(flows)  # warmup: compile everything
    while slam.process_vo():
        pass
    phases.clear()

    slam = B._make_slam(flows)
    t0 = time.perf_counter()
    marks = []
    prev = t0
    while slam.process_vo():
        now = time.perf_counter()
        marks.append(round(1000 * (now - prev), 1))
        prev = now
    total = time.perf_counter() - t0

    agg: dict = {}
    for k, v in phases:
        agg.setdefault(k, []).append(round(1000 * v, 1))
    out = {
        "fps": round(int(slam.N_FRAMES) / total, 3),
        "total_s": round(total, 3),
        "window_ms": marks,
        "phase_ms": agg,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "PERF_PIPELINE.json")
    with open(path, "w") as f:
        from voldor_tpu.utils.artifacts import stamp
        json.dump(stamp(out), f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
