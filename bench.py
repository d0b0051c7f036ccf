"""Headline benchmark: dense retrieval QPS/chip vs the CPU baseline.

Measures the BASELINE.json north-star quantity: fused query->top-k
throughput over a large chunk corpus, compared against the
pgvector-equivalent exact brute-force scan on CPU (NumPy), at verified
equal recall@10. Prints ONE JSON line:

  {"metric": ..., "value": QPS, "unit": "qps/chip", "vs_baseline": ratio,
   ...extras}

Sizing: 1M x 384 float32 corpus (1.5 GB HBM), query batch 32, k=10 —
config[3]-scale; the 10M sharded variant is benchmarks/bench_sharded.py.
All diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from optimized_rag_tpu.ops.topk import pallas_topk, chunked_topk
    from optimized_rag_tpu.ops.similarity import normalize

    N, D, B, K = 1_000_000, 384, 512, 10
    N_pad = ((N + 2047) // 2048) * 2048
    backend = jax.default_backend()
    log(f"backend={backend} corpus={N}x{D} batch={B} k={K}")

    rng = np.random.default_rng(0)
    corpus_np = rng.standard_normal((N_pad, D), dtype=np.float32)
    corpus_np /= np.linalg.norm(corpus_np, axis=1, keepdims=True)
    q_np = rng.standard_normal((B, D), dtype=np.float32)
    q_np /= np.linalg.norm(q_np, axis=1, keepdims=True)

    # ---------------- CPU baseline: exact brute-force (pgvector-equivalent)
    t0 = time.perf_counter()
    scores = q_np @ corpus_np[:N].T
    base_idx = np.argpartition(-scores, K, axis=1)[:, :K]
    base_sorted = np.take_along_axis(scores, base_idx, axis=1)
    order = np.argsort(-base_sorted, axis=1)
    base_idx = np.take_along_axis(base_idx, order, axis=1)
    cpu_s = time.perf_counter() - t0
    cpu_qps = B / cpu_s
    log(f"cpu exact: {cpu_s:.3f}s -> {cpu_qps:.2f} qps")

    # ---------------- TPU fused path
    corpus = jnp.asarray(corpus_np)
    q = jnp.asarray(q_np)
    interpret = backend != "tpu"

    def tpu_topk(qq):
        if interpret:
            return chunked_topk(qq, corpus, K, size=N, chunk=65536)
        return pallas_topk(qq, corpus, K, size=N, tile=2048)

    s, i = tpu_topk(q)
    i_np = np.asarray(i)  # host transfer forces real completion

    # recall@10 parity check vs the CPU oracle. A retrieved doc counts if
    # it is in the oracle set OR its true score ties the oracle's k-th
    # score within 1e-5 (float near-ties at the cutoff are not errors).
    cutoff = base_sorted[np.arange(B), order[:, -1]] - 1e-5
    true_scores = np.take_along_axis(scores, i_np, axis=1)
    hit = np.zeros((B, K), bool)
    for r in range(B):
        hit[r] = np.isin(i_np[r], base_idx[r]) | \
            (true_scores[r] >= cutoff[r])
    recall = float(hit.mean())
    log(f"recall@{K} vs exact oracle (1e-5 tie tolerance): {recall:.4f}")

    # Timing protocol: per-iteration host materialization. NOTE: in this
    # environment the device is reached through a network tunnel and
    # block_until_ready does NOT synchronize with remote execution —
    # np.asarray is the only honest barrier; numbers therefore INCLUDE
    # host<->device transfer, which is the end-to-end serving quantity.
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        s, i = tpu_topk(q)
        _ = np.asarray(i)
    dev_s = (time.perf_counter() - t0) / iters
    dev_qps = B / dev_s
    gbps = (N * D * 4) / dev_s / 1e9
    log(f"device: {dev_s * 1e3:.2f} ms/batch -> {dev_qps:.1f} qps "
        f"({gbps:.0f} GB/s effective corpus read incl transfer)")

    print(json.dumps({
        "metric": f"dense_topk_qps_1M_{D}d_b{B}",
        "value": round(dev_qps, 2),
        "unit": "qps/chip",
        "vs_baseline": round(dev_qps / cpu_qps, 2),
        "recall_at_10_vs_exact": round(float(recall), 4),
        "p50_batch_ms": round(dev_s * 1e3, 3),
        "cpu_baseline_qps": round(cpu_qps, 2),
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
