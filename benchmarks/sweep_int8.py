"""int8 corpus mode on the chip: quality at 2M, capacity at 48/56M.

Two sections:
  quality  2M rows where the f32 original fits (1 GB): recall@10 of the
           int8 scan (raw, and 4x-oversampled + f32 rescore — the
           DenseIndex int8 search path) against the f32 exact oracle.
  capacity N in {48M, 56M} rows x 128-d int8 (6.1 / 7.2 GB vs the
           measured ~7.5 GB resident ceiling, RESULTS_r4 §10): B=1024
           scan qps via the scaled two-stage kernel, plus the
           oversample+rescore pipeline, plus an exactness probe vs the
           dequantized-corpus oracle (chunked f32 scan, 128-query
           subsample).

Run: python -u -m benchmarks.sweep_int8 [--rows-mib 48] [--skip-quality]
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


def queries(rng, b, d):
    import jax.numpy as jnp
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return jnp.asarray(q)


def quality(rng):
    import jax.numpy as jnp

    from benchmarks.common import make_corpus_device
    from optimized_rag_tpu.ops.quantize import quantize_int8
    from optimized_rag_tpu.ops import topk as T

    n, d, b, k = 2 << 20, 128, 256, 10
    corpus = make_corpus_device(n, d, clusters=4096)
    corpus.block_until_ready()
    log("quality: corpus ready")
    codes, scale = quantize_int8(corpus)
    codes.block_until_ready()
    log("quality: quantized")
    q = queries(rng, b, d)
    want_i = np.asarray(T.pallas_topk(q, corpus, k, size=n)[1])
    log("quality: f32 oracle done")
    raw_i = np.asarray(T.pallas_topk(q, codes, k, size=n,
                                     row_scale=scale)[1])
    log("quality: raw int8 scan done")
    _, cand = T.pallas_topk(q, codes, 4 * k, size=n, row_scale=scale)
    res_i = np.asarray(T.rescore_topk(q, codes, cand, k,
                                      row_scale=scale)[1])
    want_sets = [set(want_i[r]) for r in range(b)]
    raw = np.mean([len(set(raw_i[r]) & want_sets[r]) for r in range(b)]) / k
    res = np.mean([len(set(res_i[r]) & want_sets[r]) for r in range(b)]) / k
    emit({"check": "int8_quality_2M", "recall_raw": round(float(raw), 4),
          "recall_rescored": round(float(res), 4), "queries": b})
    del corpus, codes, scale


def capacity(rng, args):
    import jax.numpy as jnp

    from benchmarks.common import make_corpus_device_int8
    from optimized_rag_tpu.ops import topk as T

    rows_mib = args.rows_mib
    n, d, b, k = rows_mib * (1 << 20), 128, 1024, 10
    # tile=8192 keeps the two-stage winner buffers O(n/tile * k * B)
    # small next to the corpus (tile=1024 at 48M/B=1024 would need
    # 6.4 GB of winners). Still exact: any one tile holds at most k of
    # the global top-k, and tile_k defaults to k.
    tile = 8192
    t0 = time.perf_counter()
    codes, scale = make_corpus_device_int8(n, d)
    codes.block_until_ready()
    gb = n * (d + 4) / 1e9
    log(f"int8 corpus [{n},{d}] ({gb:.1f} GB incl. scales) on device "
        f"in {time.perf_counter() - t0:.0f}s")
    q1 = queries(rng, b, d)

    # Exactness probe vs the f32 dequantized-corpus oracle (streaming
    # HIGHEST-precision scan) on a small subsample; skipped if the
    # scan's xs copy doesn't fit next to the corpus.
    bo = 16
    try:
        if args.certified_only:
            raise RuntimeError("certified-only run: certificate carries "
                               "exactness")
        so = np.sort(np.asarray(
            T.chunked_topk(q1[:bo], codes, k, row_scale=scale)[0]), axis=1)
        _, cand = T.pallas_topk(q1[:bo], codes, 4 * k, size=n, tile=tile,
                                row_scale=scale)
        sr = np.sort(np.asarray(
            T.rescore_topk(q1[:bo], codes, cand, k, row_scale=scale)[0]),
            axis=1)
        mism = int((np.abs(sr - so) > 1e-5).sum())
    except Exception as exc:
        log(f"oracle skipped ({type(exc).__name__})")
        mism = None
    emit({"check": f"int8_{rows_mib}M", "score_mismatch": mism,
          "corpus_gb": round(gb, 1)})

    # Packed certified kernel with scales (single-pass extraction): the
    # production large-corpus path via dispatch_topk(row_scale=...).
    def certified():
        return T.pallas_topk_certified(q1, codes, k, size=n,
                                       row_scale=scale)

    try:
        unc = int(np.asarray(certified()[1])[-1, 0])
        ms = timed(certified, lambda r: np.asarray(r[1][-1:]))
        emit({"variant": f"int8_certified_b1024_{rows_mib}M",
              "ms": round(ms, 2), "qps": round(b / ms * 1e3),
              "uncovered": unc,
              "effective_gb_s": round(gb / ms * 1e3, 1)})
    except Exception as exc:
        log(f"certified failed ({type(exc).__name__}): {exc}")

    if args.certified_only:
        return

    ms = timed(lambda: T.pallas_topk(q1, codes, k, size=n, tile=tile,
                                     row_scale=scale),
               lambda r: np.asarray(r[1][-1:]))
    emit({"variant": f"int8_scan_b1024_{rows_mib}M", "ms": round(ms, 2),
          "qps": round(b / ms * 1e3),
          "effective_gb_s": round(gb / ms * 1e3, 1)})

    def make_pipeline(cc):
        def pipeline():
            _, cand = T.pallas_topk(q1, codes, cc, size=n, tile=tile,
                                    row_scale=scale)
            return T.rescore_topk(q1, codes, cand, k, row_scale=scale)
        return pipeline

    for cc in (4 * k, 2 * k):
        try:
            ms = timed(make_pipeline(cc), lambda r: np.asarray(r[1][-1:]))
        except Exception as exc:
            log(f"pipeline cc={cc} failed ({type(exc).__name__})")
            continue
        emit({"variant": f"int8_rescored_b1024_{rows_mib}M",
              "oversample": cc, "ms": round(ms, 2),
              "qps": round(b / ms * 1e3),
              "effective_gb_s": round(gb / ms * 1e3, 1)})
        break


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-mib", type=int, default=48)
    ap.add_argument("--skip-quality", action="store_true")
    ap.add_argument("--certified-only", action="store_true")
    args = ap.parse_args()

    import jax
    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    if not args.skip_quality:
        quality(rng)
    capacity(rng, args)
    log("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
