"""Profiling: stage timers + structured per-frame metrics.

Upgrades the reference's only profiling facility — the `time_it` wall-clock
printer (src/Helpers.h:8-25, used per stage in src/Slam.cpp:102-119) — to:
- the same time_it helper (host-side wall clock; remember JAX dispatch is
  async: wrap with block=True to measure device completion);
- a StageTimer aggregating per-stage stats under the reference's stage names
  (initial_pose / match_kf / optimize_pose / match_map / keyframe);
- a JSONL metrics sink for per-frame structured logs;
- jax.profiler trace capture for TensorBoard-level analysis.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path


def time_it(name: str, fn, block: bool = True):
    """Wall-clock a callable (reference Helpers.h:8-25). Returns fn's result."""
    import jax

    t0 = time.perf_counter()
    out = fn()
    if block:
        jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) * 1e3:.2f} ms")
    return out


class StageTimer:
    """Accumulate wall-clock per named stage; report mean/total."""

    def __init__(self):
        self._acc = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        import jax

        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self._acc[name].append(time.perf_counter() - t0)

    def summary(self) -> dict:
        return {
            k: {
                "mean_ms": 1e3 * sum(v) / len(v),
                "total_ms": 1e3 * sum(v),
                "count": len(v),
            }
            for k, v in self._acc.items()
        }

    def report(self) -> str:
        lines = []
        for k, s in sorted(self.summary().items()):
            lines.append(
                f"{k:>16}: {s['mean_ms']:8.2f} ms avg x{s['count']:<5d}"
                f" ({s['total_ms']:.0f} ms total)"
            )
        return "\n".join(lines)


class MetricsSink:
    """Append-only JSONL of per-frame metrics (SURVEY.md §5 observability)."""

    def __init__(self, path: str | Path):
        self._f = open(path, "a", buffering=1)

    def write(self, record: dict) -> None:
        self._f.write(json.dumps({k: _jsonable(v) for k, v in record.items()}) + "\n")

    def close(self):
        self._f.close()


def _jsonable(v):
    import numpy as np

    if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
        return v.item()
    if isinstance(v, np.ndarray):
        return v.tolist()
    return v


@contextlib.contextmanager
def profiler_trace(logdir: str | Path):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
