"""Headline benchmark: dense retrieval QPS/chip at 10M chunks.

The BASELINE.json north star: recall@10 parity with exact search and
>10x QPS/chip over the CPU pipeline at 10M chunks. Headline = the
EXACT batch-union-verified kernel (ops/topk.pallas_topk_verified_batch,
the dispatch/DenseIndex default at this shape): fast tile_k=2 extraction
plus one contiguous MXU rescan of the hottest suspicious tiles, with a
per-call certification counter proving coverage. The explicitly
approximate ANN mode (tile_k=2, no rescan) is reported alongside with
measured recall. CPU baseline: NumPy exact brute force.

Protocol notes (see docs/RESULTS_r1.md):
  * the corpus is GENERATED ON DEVICE — nothing large crosses the
    host<->device link (which is a network tunnel here)
  * timing forces host materialization per iteration because
    block_until_ready does not synchronize under this runtime; numbers
    therefore include transfer
  * throughput (the headline) uses a depth-2 pipeline — dispatch batch
    j+1, then fetch batch j — so result transfer overlaps the next
    batch's compute, exactly as a serving loop runs; every result is
    still materialized on the host. Per-batch SYNC latency (one batch in
    flight end-to-end) is reported separately as p50_batch_ms.
  * the CPU baseline runs the same workload shape on a host-side corpus
    (throughput is data-independent); fewer queries, since exact CPU scan
    at 10M is ~seconds per query

Prints ONE JSON line on stdout; diagnostics on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Cap BLAS threads at the actual core count BEFORE numpy loads its BLAS:
# oversubscribed OpenBLAS spin-waits (sched_yield storms) make the CPU
# baseline ~50x slower on small hosts (observed: 1 core, 8 BLAS threads,
# stime 10x utime).
_cores = os.cpu_count() or 1
os.environ.setdefault("OPENBLAS_NUM_THREADS", str(_cores))
os.environ.setdefault("OMP_NUM_THREADS", str(_cores))

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from benchmarks.common import make_corpus_device
    from optimized_rag_tpu.ops.topk import (
        chunked_topk, pallas_topk, pallas_topk_verified_batch)
    from optimized_rag_tpu.utils.health import check_device_health

    # The chip takes 1-3 min to grant a claim after another process exits;
    # wait for health rather than hanging silently in the first op.
    for attempt in range(4):
        health = check_device_health(timeout_s=120)
        if health.get("healthy"):
            log(f"device healthy: {health}")
            break
        log(f"device not ready (attempt {attempt + 1}/4): {health}")
        time.sleep(60)
    else:
        log("WARNING: proceeding despite failing health checks")

    N, D, B, K = 10 * (1 << 20), 128, 512, 10
    TILE, TILE_K = 4096, 2
    backend = jax.default_backend()
    log(f"backend={backend} corpus={N}x{D} bf16, batch={B}, k={K}")

    t0 = time.perf_counter()
    corpus = make_corpus_device(N, D, clusters=4096, dtype=jnp.bfloat16)
    corpus.block_until_ready()
    log(f"on-device corpus ready in {time.perf_counter() - t0:.0f}s")

    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qj = jnp.asarray(q)
    # Distinct staged query batches for the pipelined throughput loop.
    qjs = []
    for _ in range(4):
        qq = rng.standard_normal((B, D)).astype(np.float32)
        qq /= np.linalg.norm(qq, axis=1, keepdims=True)
        qjs.append(jax.device_put(jnp.asarray(qq)))
    on_tpu = backend == "tpu"

    def exact(qq):
        """Certified-exact batch-union kernel; returns (s, ids, covered)."""
        if on_tpu:
            s, packed = pallas_topk_verified_batch(qq, corpus, K, tile=TILE,
                                                   tile_k=TILE_K)
            return s, packed[:-1], packed[-1:]
        s, i = chunked_topk(qq, corpus, K, chunk=1 << 17)
        return s, i, None

    def fast(qq):
        """Approximate ANN mode (explicit opt-in path)."""
        if on_tpu:
            return pallas_topk(qq, corpus, K, tile=TILE, tile_k=TILE_K)
        return chunked_topk(qq, corpus, K, chunk=1 << 17)

    # recall of the approximate mode vs the certified-exact kernel
    # (device oracle — the corpus never leaves the device).
    _, i_exact, cover = exact(qj)
    uncovered = int(np.asarray(cover)[0, 0]) if cover is not None else 0
    log(f"exactness certification: uncovered={uncovered} (0 = exact)")
    i_exact = np.asarray(i_exact)
    s, i = fast(qj)
    i_np = np.asarray(i)
    recall = float(np.mean([len(set(i_np[r]) & set(i_exact[r])) / K
                            for r in range(B)]))
    log(f"approx-mode recall@{K} vs exact kernel: {recall:.4f}")

    def timed_sync(fn, iters=10):
        """One batch in flight: per-batch latency (dispatch + compute +
        result transfer, serialized)."""
        t0 = time.perf_counter()
        for j in range(iters):
            out = fn(qjs[j % len(qjs)])
            _ = np.asarray(out[1])
        return (time.perf_counter() - t0) / iters

    def timed_pipe(fn, iters=20, depth=2):
        """Throughput protocol: depth-2 pipeline — dispatch batch j+1,
        then materialize batch j on the host. Every result is still
        fetched to the host; transfer overlaps the next batch's compute
        (what any real serving loop does). Depth 2 is measured optimal;
        deeper adds nothing."""
        pend = []
        t0 = time.perf_counter()
        for j in range(iters):
            pend.append(fn(qjs[j % len(qjs)]))
            if len(pend) >= depth:
                _ = np.asarray(pend.pop(0)[1])
        while pend:
            _ = np.asarray(pend.pop(0)[1])
        return (time.perf_counter() - t0) / iters

    # HEADLINE: the certified-exact kernel, pipelined throughput.
    sync_s = timed_sync(exact)
    dev_s = timed_pipe(exact)
    dev_qps = B / dev_s
    log(f"EXACT device: sync {sync_s * 1e3:.2f} ms/batch "
        f"({B / sync_s:.0f} qps); pipelined {dev_s * 1e3:.2f} ms/batch "
        f"-> {dev_qps:.0f} qps "
        f"({N * D * 2 / dev_s / 1e9:.0f} GB/s effective)")

    # Approximate ANN mode alongside.
    ann_sync_s = timed_sync(fast)
    ann_s = timed_pipe(fast)
    ann_qps = B / ann_s
    log(f"ANN mode: sync {ann_sync_s * 1e3:.2f} ms/batch; pipelined "
        f"{ann_s * 1e3:.2f} ms/batch -> {ann_qps:.0f} qps "
        f"at measured recall {recall:.4f}")

    # CPU exact baseline (pgvector-equivalent brute force), same D/k.
    # Brute-force scan time is linear in rows, so measure on an N/8
    # subsample and scale by 8 — small hosts (this one has os.cpu_count()
    # cores) cannot scan 10M x 128 within the harness budget. The scaling
    # favors the CPU: the smaller corpus is more cache-friendly, so the
    # scaled estimate is a LOWER bound on true 10M latency and
    # vs_baseline is conservative. Warm pass first; best-of-2 so host
    # noise can't inflate vs_baseline.
    bc = 16
    sub = 8
    n_cpu = N // sub
    cpu_corpus = rng.standard_normal((n_cpu, D), dtype=np.float32)
    cpu_corpus /= np.linalg.norm(cpu_corpus, axis=1, keepdims=True)
    _ = q[:2] @ cpu_corpus.T  # touch every page
    best = float("inf")
    for _rep in range(2):
        t0 = time.perf_counter()
        scores = q[:bc] @ cpu_corpus.T
        part = np.argpartition(-scores, K, axis=1)[:, :K]
        _ = np.take_along_axis(scores, part, axis=1)
        best = min(best, (time.perf_counter() - t0) / bc)
    cpu_s = best * sub
    cpu_qps = 1.0 / cpu_s
    log(f"cpu measured at {n_cpu} rows: {best:.3f} s/query x{sub}")
    log(f"cpu exact: {cpu_s:.2f} s/query -> {cpu_qps:.2f} qps")

    print(json.dumps({
        "metric": f"dense_topk_qps_10M_{D}d_b{B}",
        "value": round(dev_qps, 1),
        "unit": "qps/chip",
        "vs_baseline": round(dev_qps / cpu_qps, 1),
        "mode": "exact (batch-union verified)",
        "exactness_uncovered": uncovered,
        "recall_at_10": 1.0 if uncovered == 0 else None,
        "p50_batch_ms": round(sync_s * 1e3, 2),
        "pipelined_batch_ms": round(dev_s * 1e3, 2),
        "sync_qps": round(B / sync_s, 1),
        "ann_mode_qps": round(ann_qps, 1),
        "ann_mode_recall_at_10": round(recall, 4),
        "ann_mode_p50_batch_ms": round(ann_sync_s * 1e3, 2),
        "cpu_baseline_qps": round(cpu_qps, 3),
        "corpus": f"{N}x{D} bf16",
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
