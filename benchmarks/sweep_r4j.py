"""Round-4j: single-chip capacity beyond the 16.7M round-3 point.

Round 3 measured 16.7M x 128-d bf16 (4.3 GB) as "the claimed edge" but
never probed the actual ceiling. The extract-union graft removed the
c2 path's ~545 MB [B, U*tile] f32 intermediate, so the certified
kernel's HBM profile is now essentially corpus + O(tiles) winners.
This probes N in {24M, 32M} rows x 128-d bf16 (6.1 / 8.2 GB on a
16 GB v5e): certified-exact B=1024 qps + uncovered + exactness vs the
corpus-dtype oracle on a query subsample.

Run: python -u -m benchmarks.sweep_r4j [--rows-mib 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def emit(d):
    print(json.dumps(d), flush=True)


def timed(fn, fetch, iters=8, warm=2, depth=2):
    for _ in range(warm):
        fetch(fn())
    pend = []
    t0 = time.perf_counter()
    for _ in range(iters):
        pend.append(fn())
        if len(pend) >= depth:
            fetch(pend.pop(0))
    while pend:
        fetch(pend.pop(0))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-mib", type=int, default=32,
                    help="corpus rows in MiB-rows (24 or 32)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from benchmarks.common import make_corpus_device_big
    from optimized_rag_tpu.ops import topk as T

    log(f"backend={jax.default_backend()}")
    n, d, b, k = args.rows_mib * (1 << 20), 128, 1024, 10
    t0 = time.perf_counter()
    corpus = make_corpus_device_big(n, d, clusters=4096, dtype=jnp.bfloat16)
    corpus.block_until_ready()
    gb = n * d * 2 / 1e9
    log(f"corpus [{n},{d}] bf16 ({gb:.1f} GB) on device "
        f"in {time.perf_counter() - t0:.0f}s")
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q1 = jnp.asarray(q)

    # Exactness: certified vs the corpus-dtype oracle on a 128-query
    # subsample. Full-batch tile=4096 oracle OOM'd the chip next to the
    # 8.6 GB corpus (winner buffers + merge transposes); at B=128 /
    # tile=1024 the oracle peaks ~0.5 GB and stays bit-exact vs the
    # certified kernel (same MXU f32-accumulated bf16 dot per tile).
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        log(f"hbm: {stats.get('bytes_in_use', '?')} in use / "
            f"{stats.get('bytes_limit', '?')} limit")
    except Exception as exc:  # not all backends expose memory_stats
        log(f"memory_stats unavailable: {exc}")

    bo = 128
    try:
        so = np.sort(np.asarray(T.pallas_topk(q1[:bo], corpus, k, size=n,
                                              tile_k=k)[0]), axis=1)
        mism = None  # filled after the certified run
    except Exception as exc:
        # The oracle's [N/tile, k, B] winner buffers can OOM next to the
        # corpus at the largest sizes; the certified kernel's uncovered
        # counter is the primary exactness evidence, so continue.
        log(f"oracle skipped ({type(exc).__name__}); "
            "relying on the exactness certificate")
        so = None
    s, i = T.pallas_topk_certified(q1, corpus, k, size=n)
    s, i = np.asarray(s), np.asarray(i)
    unc = int(i[b, 0])
    mism = (int((np.sort(s[:bo], axis=1) != so).sum())
            if so is not None else None)
    emit({"check": f"certified_{args.rows_mib}M", "uncovered": unc,
          "score_mismatch": mism, "corpus_gb": round(gb, 1)})

    ms = timed(lambda: T.pallas_topk_certified(q1, corpus, k, size=n),
               lambda r: np.asarray(r[1][-1:]))
    emit({"variant": f"cert_b1024_{args.rows_mib}M", "ms": round(ms, 2),
          "qps": round(b / ms * 1e3), "uncovered": unc,
          "effective_gb_s": round(gb / ms * 1e3, 1)})

    q4 = rng.standard_normal((4 * b, d)).astype(np.float32)
    q4 /= np.linalg.norm(q4, axis=1, keepdims=True)
    q4 = jnp.asarray(q4)
    ms = timed(lambda: T.pallas_topk_certified_multi(q4, corpus, k, size=n),
               lambda r: np.asarray(r[1][-1:]))
    unc4 = int(np.asarray(
        T.pallas_topk_certified_multi(q4, corpus, k, size=n)[1])[-1, 0])
    emit({"variant": f"cert_m4_{args.rows_mib}M", "ms": round(ms, 2),
          "qps": round(4 * b / ms * 1e3), "uncovered": unc4,
          "effective_gb_s": round(4 * gb / ms * 1e3, 1)})
    log("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
