"""Per-stage runtime tracing.

The reference's observability is limited to an in-graph BenchmarkSink and a
debug logger (/root/reference/radio/blocks/sinks/benchmark.lua:88-121,
radio/core/debug.lua).  The TPU runtime adds a light span tracer around the
pump: per-chunk wall time of source reads, each fused device segment's
dispatch, and the host tail, aggregated into count/total/min/max.

Enable with ``LUARADIO_TPU_TRACE=1`` (report printed to stderr at the end of
``run()``) or programmatically via ``CompositeBlock.run(trace=True)`` +
``top.stats()``.
"""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager


class Tracer:
    def __init__(self):
        self.spans: dict[str, list[float]] = {}

    @contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            agg = self.spans.setdefault(name, [0, 0.0, float("inf"), 0.0])
            agg[0] += 1
            agg[1] += dt
            agg[2] = min(agg[2], dt)
            agg[3] = max(agg[3], dt)

    def report(self) -> dict:
        return {
            name: {"count": int(c), "total_s": t, "mean_s": t / max(c, 1),
                   "min_s": mn, "max_s": mx}
            for name, (c, t, mn, mx) in self.spans.items()
        }

    def print_report(self, file=None):
        file = file or sys.stderr
        rep = self.report()
        if not rep:
            return
        width = max(len(n) for n in rep)
        print("luaradio_tpu trace:", file=file)
        for name, s in sorted(rep.items(), key=lambda kv: -kv[1]["total_s"]):
            print(f"  {name:<{width}}  n={s['count']:<6d} "
                  f"total={s['total_s'] * 1e3:9.2f} ms  "
                  f"mean={s['mean_s'] * 1e3:8.3f} ms  "
                  f"max={s['max_s'] * 1e3:8.3f} ms", file=file)


def enabled_by_env() -> bool:
    v = os.environ.get("LUARADIO_TPU_TRACE", "")
    return v not in ("", "0", "false")


__all__ = ["Tracer", "enabled_by_env"]
