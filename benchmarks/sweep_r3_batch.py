"""Batch-size sweep: exploit the ~31 ms/batch pipelined dispatch floor.

Round-3 finding: at B=512 every kernel variant (exact, certified, ANN)
converges to ~31 ms/batch pipelined at BOTH 10M and 16M rows — the
tunnel RTT/dispatch path binds, not compute. Larger batches amortize it.
Sweeps B x {certified, r2} x pipeline depth in one process.
"""

from __future__ import annotations

import time

import numpy as np

from benchmarks.common import log, emit, make_corpus_device


def main() -> None:
    import jax
    import jax.numpy as jnp
    from optimized_rag_tpu.ops.topk import (
        pallas_topk_certified, pallas_topk_verified_batch)
    from optimized_rag_tpu.utils.health import check_device_health

    for _ in range(6):
        if check_device_health(timeout_s=150).get("healthy"):
            break
        time.sleep(60)

    N, D, K = 10 * (1 << 20), 128, 10
    corpus = make_corpus_device(N, D, clusters=4096, dtype=jnp.bfloat16)
    corpus.block_until_ready()
    log("corpus ready")
    rng = np.random.default_rng(0)

    def qbatches(b, n=4):
        out = []
        for _ in range(n):
            qq = rng.standard_normal((b, D)).astype(np.float32)
            qq /= np.linalg.norm(qq, axis=1, keepdims=True)
            out.append(jax.device_put(jnp.asarray(qq)))
        return out

    def timed_pipe(fn, qjs, iters=16, depth=2):
        pend = []
        t0 = time.perf_counter()
        for j in range(iters):
            pend.append(fn(qjs[j % len(qjs)]))
            if len(pend) >= depth:
                _ = np.asarray(pend.pop(0)[1])
        while pend:
            _ = np.asarray(pend.pop(0)[1])
        return (time.perf_counter() - t0) / iters

    def timed_sync(fn, qjs, iters=8):
        t0 = time.perf_counter()
        for j in range(iters):
            _ = np.asarray(fn(qjs[j % len(qjs)])[1])
        return (time.perf_counter() - t0) / iters

    for b in (512, 1024, 2048):
        qjs = qbatches(b)
        for name, fn in (
            ("certified_t4096_g8",
             lambda q: pallas_topk_certified(q, corpus, K, tile=4096,
                                             groups=8)),
            ("certified_t2048_g8",
             lambda q: pallas_topk_certified(q, corpus, K, tile=2048,
                                             groups=8)),
            ("r2_verified_t4096",
             lambda q: pallas_topk_verified_batch(q, corpus, K, tile=4096,
                                                  tile_k=2)),
        ):
            try:
                out = fn(qjs[0])
                ids = np.asarray(out[1])
                unc = int(ids[-1, 0])
                sync_s = timed_sync(fn, qjs)
                best = None
                for depth in (2, 3, 4):
                    p = timed_pipe(fn, qjs, depth=depth)
                    if best is None or p < best[1]:
                        best = (depth, p)
                rec = {"variant": name, "batch": b,
                       "sync_ms": round(sync_s * 1e3, 2),
                       "pipe_ms": round(best[1] * 1e3, 2),
                       "depth": best[0],
                       "qps": round(b / best[1], 1),
                       "gbps": round(N * D * 2 / best[1] / 1e9, 1),
                       "uncovered": unc}
                emit(rec)
                log(f"{rec}")
            except Exception as e:
                emit({"variant": name, "batch": b, "error": repr(e)})
                log(f"{name} b={b} FAILED: {e}")


if __name__ == "__main__":
    main()
