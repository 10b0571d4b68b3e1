"""Per-window attribution of the bench pipeline: device solve vs host glue.

Runs the exact bench sequence (24 synthetic flows at 613x185, mono, priors
from keyframes) and times, per process_vo window: the py_voldor call
(upload + fused solve + readback), and the rest of the host bookkeeping
(covisibility stepping, keyframe policy). Medians of in-process trials per
PLATFORM_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import bench

    import voldor_tpu.vo.api as voapi

    flows, Ts_true = bench.build_sequence(24)

    # wrap the voldor API to time each window's device call
    calls = []
    real_voldor = voapi.voldor

    def timed_voldor(*a, **kw):
        t0 = time.perf_counter()
        ret = real_voldor(*a, **kw)
        calls.append(time.perf_counter() - t0)
        return ret

    voapi.voldor = timed_voldor

    # warmup (compile)
    slam = bench._make_slam(flows[:10])
    while slam.process_vo():
        pass
    calls.clear()

    windows = []
    slam = bench._make_slam(flows)
    t_all0 = time.perf_counter()
    while True:
        t0 = time.perf_counter()
        more = slam.process_vo()
        windows.append(time.perf_counter() - t0)
        if not more:
            break
    total = time.perf_counter() - t_all0

    n_frames = int(slam.N_FRAMES)
    out = {
        "n_windows": len(windows),
        "n_vo_calls": len(calls),
        "n_frames": n_frames,
        "fps": round(n_frames / total, 3),
        "total_s": round(total, 3),
        "window_ms": [round(1e3 * t, 1) for t in windows],
        "voldor_call_ms": [round(1e3 * t, 1) for t in calls],
        "host_glue_ms": round(
            1e3 * (sum(windows) - sum(calls)) / max(len(calls), 1), 1
        ),
    }
    print(json.dumps(out, indent=1))
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "PERF_PIPELINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
