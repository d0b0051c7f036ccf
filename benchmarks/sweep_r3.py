"""Round-3 kernel sweep: certified packed extraction vs the r2 kernel.

Measures, in ONE process (the chip claim is expensive — see
docs/RESULTS_r1.md protocol notes):
  * r2 baseline: pallas_topk_verified_batch tile=4096 tile_k=2
  * r3 certified: tile x groups sweep
  * ANN reference: pallas_topk tile_k=2 (no rescan)
  * 16M x 128 bf16 single-chip capacity probe (VERDICT r2 missing #2a)

Every variant reports sync ms/batch, depth-2 pipelined ms/batch, qps, and
the exactness counter. Emits one JSON line per result on stdout.
"""

from __future__ import annotations

import time
import traceback

import numpy as np

from benchmarks.common import log, emit, make_corpus_device


def main() -> None:
    import jax
    import jax.numpy as jnp
    from optimized_rag_tpu.ops.topk import (
        pallas_topk, pallas_topk_certified, pallas_topk_verified_batch)
    from optimized_rag_tpu.utils.health import check_device_health

    for attempt in range(6):
        health = check_device_health(timeout_s=150)
        if health.get("healthy"):
            log(f"device healthy: {health}")
            break
        log(f"device not ready (attempt {attempt + 1}/6): {health}")
        time.sleep(60)

    D, B, K = 128, 512, 10
    backend = jax.default_backend()
    rng = np.random.default_rng(0)
    qjs = []
    for _ in range(4):
        qq = rng.standard_normal((B, D)).astype(np.float32)
        qq /= np.linalg.norm(qq, axis=1, keepdims=True)
        qjs.append(jax.device_put(jnp.asarray(qq)))

    def timed_sync(fn, iters=8):
        t0 = time.perf_counter()
        for j in range(iters):
            out = fn(qjs[j % len(qjs)])
            _ = np.asarray(out[1])
        return (time.perf_counter() - t0) / iters

    def timed_pipe(fn, iters=16, depth=2):
        pend = []
        t0 = time.perf_counter()
        for j in range(iters):
            pend.append(fn(qjs[j % len(qjs)]))
            if len(pend) >= depth:
                _ = np.asarray(pend.pop(0)[1])
        while pend:
            _ = np.asarray(pend.pop(0)[1])
        return (time.perf_counter() - t0) / iters

    def run_variant(name, fn, n, has_counter, oracle_ids=None):
        try:
            t0 = time.perf_counter()
            out = fn(qjs[0])
            ids = np.asarray(out[1])
            compile_s = time.perf_counter() - t0
            uncovered = int(ids[-1, 0]) if has_counter else -1
            recall = None
            if oracle_ids is not None:
                got = ids[:-1] if has_counter else ids
                recall = float(np.mean([
                    len(set(got[r]) & set(oracle_ids[r])) / K
                    for r in range(B)]))
            sync_s = timed_sync(fn)
            pipe_s = timed_pipe(fn)
            rec = {
                "variant": name, "n": n,
                "sync_ms": round(sync_s * 1e3, 2),
                "pipe_ms": round(pipe_s * 1e3, 2),
                "qps": round(B / pipe_s, 1),
                "sync_qps": round(B / sync_s, 1),
                "gbps_effective": round(n * D * 2 / pipe_s / 1e9, 1),
                "uncovered": uncovered,
                "recall_vs_ref": recall,
                "compile_s": round(compile_s, 1),
            }
            emit(rec)
            log(f"{name}: {rec}")
            return ids
        except Exception as e:
            emit({"variant": name, "n": n, "error": repr(e)})
            log(f"{name} FAILED: {e}\n{traceback.format_exc()}")
            return None

    # ----------------------------------------------------- 10M sweep
    N = 10 * (1 << 20)
    t0 = time.perf_counter()
    corpus = make_corpus_device(N, D, clusters=4096, dtype=jnp.bfloat16)
    corpus.block_until_ready()
    log(f"10M corpus ready in {time.perf_counter() - t0:.0f}s")

    ref_ids = run_variant(
        "r2_verified_batch_t4096",
        lambda q: pallas_topk_verified_batch(q, corpus, K, tile=4096,
                                             tile_k=2),
        N, True)
    oracle = ref_ids[:-1] if ref_ids is not None else None

    for tile, groups in [(4096, 8), (2048, 8), (4096, 16), (8192, 8),
                         (2048, 4)]:
        run_variant(
            f"r3_certified_t{tile}_g{groups}",
            lambda q, t=tile, g=groups: pallas_topk_certified(
                q, corpus, K, tile=t, groups=g),
            N, True, oracle_ids=oracle)

    run_variant(
        "ann_tile_k2_t4096",
        lambda q: pallas_topk(q, corpus, K, tile=4096, tile_k=2),
        N, False, oracle_ids=oracle)

    del corpus

    # ----------------------------------------------------- 16M capacity
    N2 = 16 * (1 << 20)
    try:
        t0 = time.perf_counter()
        corpus2 = make_corpus_device(N2, D, clusters=4096,
                                     dtype=jnp.bfloat16)
        corpus2.block_until_ready()
        log(f"16M corpus ready in {time.perf_counter() - t0:.0f}s")
        run_variant(
            "r3_certified_16M_t4096_g8",
            lambda q: pallas_topk_certified(q, corpus2, K, tile=4096,
                                            groups=8),
            N2, True)
        run_variant(
            "r2_verified_batch_16M_t4096",
            lambda q: pallas_topk_verified_batch(q, corpus2, K, tile=4096,
                                                 tile_k=2),
            N2, True)
    except Exception as e:
        emit({"variant": "16M_capacity", "error": repr(e)})
        log(f"16M probe failed: {e}")

    log("sweep done")


if __name__ == "__main__":
    main()
