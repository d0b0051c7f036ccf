"""Micro-batching query executor.

Production serving layer the reference lacks entirely (it is a single-user
REPL, main.py:14): concurrent callers enqueue queries; a dispatcher thread
coalesces them into one batched embed + one batched fused top-k dispatch —
the shape the TPU actually wants (per-call dispatch costs a host<->device
round trip; batches amortize it).

Usage:
    server = QueryServer(embed_fn, index, max_batch=64, max_wait_ms=5)
    server.start()
    fut = server.submit("some query", k=10)
    scores, ids = fut.result()
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np


@dataclass
class _Request:
    query: str
    k: int
    future: Future = field(default_factory=Future)
    enqueued_at: float = field(default_factory=time.perf_counter)


class QueryServer:
    def __init__(self, embed_fn: Callable[[List[str]], np.ndarray],
                 index, max_batch: int = 64, max_wait_ms: float = 5.0,
                 max_k: int = 100, workers: int = 2):
        self.embed_fn = embed_fn
        self.index = index            # anything with .search(q_batch, k)
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self.max_k = max_k
        # Two dispatcher threads keep two batches in flight: while one
        # waits on the device result transfer (which releases the GIL —
        # a ~30 ms round trip through the tunneled runtime), the other
        # tokenizes and dispatches the next batch. Device execution
        # still serializes on-chip; only host work and transfer overlap.
        # Measured (14k docs, trained encoder, max_batch=64): above
        # saturation (192 clients) workers=2 doubles throughput
        # (~1,040 vs ~520 qps); below it (64 clients) the two workers
        # split what would be one full batch and workers=1 wins
        # (448 vs ~190 qps). Default 2 = the saturated serving regime.
        self.workers = workers
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._threads: List[threading.Thread] = []
        self._running = False
        self._stats_lock = threading.Lock()
        self.stats = {"batches": 0, "queries": 0, "max_batch_seen": 0,
                      "wait_ms_sum": 0.0}

    # ---------------------------------------------------------------- API

    def start(self) -> None:
        assert not self._running
        # Fresh queue: a previous stop() leaves its sentinel circulating
        # (workers re-put it as they exit), which would kill restarted
        # workers immediately.
        self._q = queue.Queue()
        self._running = True
        self._threads = [threading.Thread(target=self._loop, daemon=True)
                         for _ in range(self.workers)]
        for t in self._threads:
            t.start()

    def stop(self) -> None:
        self._running = False
        self._q.put(None)
        for t in self._threads:
            t.join(timeout=5)

    def submit(self, query: str, k: int = 10) -> Future:
        assert self._running, "server not started"
        assert k <= self.max_k, f"k={k} > max_k={self.max_k}"
        req = _Request(query=query, k=k)
        self._q.put(req)
        return req.future

    def search(self, query: str, k: int = 10, timeout: float = 30.0):
        return self.submit(query, k).result(timeout=timeout)

    # ------------------------------------------------------------- internal

    def _bucket(self, n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return min(b, max(self.max_batch, n))

    def _collect(self) -> List[_Request]:
        """Block for the first request, then coalesce briefly."""
        first = self._q.get()
        if first is None:
            self._q.put(None)  # propagate stop to sibling workers
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                req = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if req is None:
                self._q.put(None)  # re-signal stop for sibling workers
                break
            batch.append(req)
        return batch

    def _loop(self) -> None:
        while self._running:
            batch = self._collect()
            if not batch:
                break
            t0 = time.perf_counter()
            try:
                k_eff = max(r.k for r in batch)
                # Pad the batch up to a pow2 bucket: every distinct batch
                # size is a separate XLA compile of the search program,
                # and under concurrent load coalesced sizes vary per
                # batch — unbucketed serving recompiles almost every
                # dispatch (measured: 4x throughput loss, p90 in seconds).
                texts = [r.query for r in batch]
                bucket = self._bucket(len(texts))
                texts += [texts[-1]] * (bucket - len(texts))
                q = self.embed_fn(texts)
                res = self.index.search(np.atleast_2d(q), k=k_eff)
                scores, ids = (res.scores, res.ids) \
                    if hasattr(res, "scores") else res
                for row, req in enumerate(batch):
                    req.future.set_result(
                        (scores[row, : req.k], ids[row, : req.k]))
            except Exception as exc:
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(exc)
            with self._stats_lock:
                self.stats["batches"] += 1
                self.stats["queries"] += len(batch)
                self.stats["max_batch_seen"] = max(
                    self.stats["max_batch_seen"], len(batch))
                self.stats["wait_ms_sum"] += sum(
                    (t0 - r.enqueued_at) * 1e3 for r in batch)

    def get_stats(self) -> dict:
        with self._stats_lock:
            s = dict(self.stats)
        s["avg_batch"] = (s["queries"] / s["batches"]) if s["batches"] else 0
        s["avg_queue_wait_ms"] = (s["wait_ms_sum"] / s["queries"]
                                  if s["queries"] else 0.0)
        return s
