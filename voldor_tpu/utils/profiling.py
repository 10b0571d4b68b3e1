"""Stage timing + device profiling hooks.

The reference sprinkles tic/toc wall timers through the VO class
(voldor/voldor.h:66-81, geometry.cpp per-stage prints) and the SLAM layer
(voldor_slam.py:26-29). This module provides the structured equivalent: a
StageTimer that synchronizes the device per stage when enabled, and a
jax.profiler trace context for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulating per-stage wall timers; no-ops when disabled."""

    def __init__(self, enabled: bool = True, sync=None):
        self.enabled = enabled
        self._sync = sync  # callable run before reading the clock (e.g. block_until_ready)
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if self._sync is not None:
            self._sync()
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            lines.append(
                f"{name:>28}: {self.totals[name]*1000:9.1f} ms "
                f"(x{self.counts[name]}, {self.totals[name]/max(self.counts[name],1)*1000:7.2f} ms avg)"
            )
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/voldor_trace"):
    """jax.profiler trace context (the deep-dive replacement for the reference's
    per-kernel chrono prints)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
    print(f"profiler trace written to {log_dir}")


_GLOBAL = {}


def tic(name: str = "default"):
    _GLOBAL[name] = time.perf_counter()


def toc(name: str = "default") -> float:
    return time.perf_counter() - _GLOBAL.get(name, time.perf_counter())
