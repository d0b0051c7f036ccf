"""Tracing and profiling.

The reference has no profiler (SURVEY.md §5: "closest artifacts are
per-stage wall-clock in HierarchicalRetriever and timestamped logs").
Here it is a first-class subsystem:

  * ``StageTimer`` — nested per-stage wall-clock spans, queryable stats
    (count/total/mean/p50/p95), exportable to the JSONL metrics stream
  * ``device_trace`` — context manager around ``jax.profiler`` producing
    a TensorBoard-loadable trace of the on-TPU work
  * ``annotate`` — ``jax.profiler.TraceAnnotation`` passthrough so engine
    stages are visible inside the device trace
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List

import numpy as np


class StageTimer:
    def __init__(self):
        self._spans: Dict[str, List[float]] = defaultdict(list)
        self._stack: List[tuple] = []

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        path = ("/".join(s for s, _ in self._stack) + "/" + name).lstrip("/")
        self._stack.append((name, time.perf_counter()))
        try:
            yield
        finally:
            _, t0 = self._stack.pop()
            self._spans[path].append(time.perf_counter() - t0)

    def stats(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, times in self._spans.items():
            arr = np.asarray(times)
            out[name] = {
                "count": len(arr),
                "total_s": float(arr.sum()),
                "mean_ms": float(arr.mean() * 1e3),
                "p50_ms": float(np.percentile(arr, 50) * 1e3),
                "p95_ms": float(np.percentile(arr, 95) * 1e3),
            }
        return out

    def reset(self) -> None:
        self._spans.clear()

    def export(self, exporter) -> None:
        """Write stats through a utils.metrics_export.MetricsExporter."""
        exporter.export({"kind": "stage_timings", "stages": self.stats()})


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/orag_trace"):
    """jax.profiler trace (open with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the device trace timeline."""
    import jax
    return jax.profiler.TraceAnnotation(name)


GLOBAL_TIMER = StageTimer()
