"""Stage timing + codec statistics: the TIMER/COUNTER analog.

The reference instruments its pipeline with `TIMER`/`COUNTER` macros
(`Codec/timing.h:88-115`, per-thread via `DoThreadTiming`) and prints CSV
statistics (`PrintStatistics`, `timing.h:42`); `Codec/stats.c:40-70`
collects coefficient distributions under `_STATS`.

Here: a context-manager stage timer that forces device completion with
`jax.block_until_ready` (so device stages measure compute, not dispatch),
counters, and a CSV/report dump.  For deep device profiles use
`jax.profiler.trace` alongside.
"""

from __future__ import annotations

import io
import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class StageStats:
    calls: int = 0
    total_s: float = 0.0
    min_s: float = float("inf")
    max_s: float = 0.0

    def add(self, dt: float) -> None:
        self.calls += 1
        self.total_s += dt
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)


@dataclass
class Timing:
    """Collects per-stage wall times and event counters."""

    stages: dict = field(default_factory=lambda: defaultdict(StageStats))
    counters: dict = field(default_factory=lambda: defaultdict(int))

    @contextmanager
    def stage(self, name: str, sync=None):
        """Time a stage; pass a jax pytree as `sync` to block on device
        completion before stopping the clock."""
        import jax

        t0 = time.perf_counter()
        result = {}
        try:
            yield result
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            elif "sync" in result:
                jax.block_until_ready(result["sync"])
            self.stages[name].add(time.perf_counter() - t0)

    def count(self, name: str, n: int = 1) -> None:
        self.counters[name] += n

    def report(self) -> str:
        out = io.StringIO()
        out.write("stage,calls,total_ms,mean_ms,min_ms,max_ms\n")
        for name, s in sorted(self.stages.items()):
            out.write(f"{name},{s.calls},{s.total_s*1e3:.3f},"
                      f"{s.total_s/max(s.calls,1)*1e3:.3f},"
                      f"{s.min_s*1e3:.3f},{s.max_s*1e3:.3f}\n")
        for name, v in sorted(self.counters.items()):
            out.write(f"counter:{name},{v}\n")
        return out.getvalue()


# module-level default collector (like the reference's global timers)
default_timing = Timing()
