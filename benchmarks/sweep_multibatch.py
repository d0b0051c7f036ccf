"""Single-dispatch multi-batch sweep (round-4 kernel lever).

Round-3 finding: pipelined dispatch floors at ~31 ms/batch through the
tunnel at BOTH 10M and 16.7M rows — the dispatch path, not compute,
binds, and VMEM caps a single certified call at B~1024.
``pallas_topk_certified_multi`` runs M sub-batches through an XLA
``lax.map`` inside ONE dispatch: VMEM stays at the sub-batch level
while M blocks amortize one round trip. This sweep measures qps for
M x sub_batch against the single-batch baseline on the 10M x 128 bf16
headline corpus, certified-exact (uncovered must be 0).
"""

from __future__ import annotations

import time

import numpy as np

from benchmarks.common import log, emit, make_corpus_device


def main() -> None:
    import jax
    import jax.numpy as jnp
    from optimized_rag_tpu.ops.topk import (
        pallas_topk_certified, pallas_topk_certified_multi)
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

    def timed_pipe(fn, qjs, iters, depth=2):
        pend = []
        t0 = time.perf_counter()
        for j in range(iters):
            pend.append(fn(qjs[j % len(qjs)]))
            if len(pend) >= depth:
                _ = np.asarray(pend.pop(0)[1])
        while pend:
            _ = np.asarray(pend.pop(0)[1])
        return (time.perf_counter() - t0) / iters

    # Baseline: the round-3 headline configuration.
    for sub, tile in ((1024, 4096), (512, 4096)):
        for m in (1, 2, 4, 8):
            b = m * sub
            qjs = qbatches(b)
            if m == 1:
                fn = lambda q, _t=tile: pallas_topk_certified(
                    q, corpus, K, tile=_t, groups=8)
            else:
                fn = lambda q, _t=tile, _s=sub: pallas_topk_certified_multi(
                    q, corpus, K, sub_batch=_s, tile=_t, groups=8)
            try:
                out = fn(qjs[0])                       # compile
                ids = np.asarray(out[1])
                unc = int(ids[-1, 0])
                iters = max(4, 16 // m)
                best = None
                for depth in (2, 3):
                    t = timed_pipe(fn, qjs, iters, depth)
                    if best is None or t < best[0]:
                        best = (t, depth)
                emit({"sub_batch": sub, "m": m, "batch": b, "tile": tile,
                      "uncovered": unc,
                      "pipelined_ms": round(best[0] * 1e3, 2),
                      "depth": best[1],
                      "qps": round(b / best[0], 1)})
            except Exception as exc:                   # OOM etc.
                emit({"sub_batch": sub, "m": m, "tile": tile,
                      "error": repr(exc)[:200]})


if __name__ == "__main__":
    main()
