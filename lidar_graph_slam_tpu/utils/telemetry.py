"""Structured telemetry: per-frame metrics stream + profiler hooks.

The reference's observability is RCLCPP log lines and rviz topics (SURVEY.md §5.1/§5.5 —
fitness and matched ids logged at `graph_based_slam.cpp:324-325,343`, non-convergence at
`lidar_scan_matcher.cpp:168`). Here every frame emits a structured record (JSONL) carrying
registration iterations/fitness/inlier counts, keyframe/loop events, and per-stage
wall-clock — and `trace()` wraps any span in a `jax.profiler` trace for TensorBoard.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Optional


class MetricsWriter:
    """Append-only JSONL metrics stream (one record per frame/event)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        if path:
            import os

            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None
        self.records: list[dict] = []

    def emit(self, record: dict) -> None:
        record = {"ts": time.time(), **record}
        self.records.append(record)
        if self._f:
            self._f.write(json.dumps(record) + "\n")
            self._f.flush()

    def close(self) -> None:
        if self._f:
            self._f.close()
            self._f = None


@contextlib.contextmanager
def trace(label: str, profile_dir: Optional[str] = None):
    """Wall-clock span timer; when `profile_dir` is set, also a jax.profiler trace that
    captures device-side activity for TensorBoard."""
    import jax

    ctx = (
        jax.profiler.trace(profile_dir) if profile_dir else contextlib.nullcontext()
    )
    t0 = time.perf_counter()
    with ctx:
        with jax.profiler.TraceAnnotation(label):
            yield
    trace.last_ms = 1000 * (time.perf_counter() - t0)


class StageTimers:
    """Rolling per-stage timing aggregation (mean/p50/p99/max)."""

    def __init__(self):
        self.samples: dict[str, list] = {}

    @contextlib.contextmanager
    def time(self, stage: str):
        t0 = time.perf_counter()
        yield
        self.samples.setdefault(stage, []).append(time.perf_counter() - t0)

    def summary(self) -> dict:
        import numpy as np

        out = {}
        for stage, ts in self.samples.items():
            a = np.asarray(ts)
            out[stage] = {
                "mean_ms": float(a.mean() * 1000),
                "p50_ms": float(np.percentile(a, 50) * 1000),
                "p99_ms": float(np.percentile(a, 99) * 1000),
                "max_ms": float(a.max() * 1000),
                "count": int(a.size),
            }
        return out
