"""Round-4f: certified2 (exact unit-mate export) vs certified v1 on-chip.

certified v1 (post slab-read fix) measures 40.13 ms/1024q single /
150.4 ms M=4 at the headline shape (10M x 128-d bf16, k=10). Round-4
attribution put ~19 ms of that in the c1 rescue + c2 union rescan that
exist only because the packed kernel exports quantized winners.
certified2 exports exact f32 mate scores from VMEM instead, deleting
both. This sweep, at the headline shape:

  v1_single / v1_m4    — pallas_topk_certified(_multi), session baseline
  v2_single / v2_m4    — pallas_topk_certified2(_multi), tile=2048 G=8
  v2_single_t4096      — certified2 at tile=4096 G=16

plus exactness: per-row sorted scores vs pallas_topk tile_k=k (the
corpus-dtype oracle; sorted-score compare is tie-tolerant) and the
uncovered certificate count (must be 0 on the cluster corpus).

Run on the TPU: python -m benchmarks.sweep_r4f [--smoke]
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
    print(msg, file=sys.stderr, flush=True)


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
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from benchmarks.common import make_corpus_device
    from optimized_rag_tpu.ops import topk as T

    log(f"backend={jax.default_backend()}")
    n, d, b, k = 10 * (1 << 20), 128, 1024, 10
    if args.smoke:
        n = 1 << 20
    corpus = make_corpus_device(n, d, clusters=4096, dtype=jnp.bfloat16)
    corpus.block_until_ready()
    log(f"corpus [{n},{d}] bf16 on device")
    rng = np.random.default_rng(0)

    def qbatch(bb):
        q = rng.standard_normal((bb, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        return jax.device_put(jnp.asarray(q))

    q1 = qbatch(b)
    q4 = qbatch(4 * b)

    def fetch(out):
        return np.asarray(out[1])

    # Exactness vs the corpus-dtype oracle (same bf16 DEFAULT scoring).
    so = np.asarray(T.pallas_topk(q1, corpus, k, size=n, tile_k=k)[0])
    so_sorted = np.sort(so, axis=1)
    for name, fn in [
        ("v1", lambda: T.pallas_topk_certified(q1, corpus, k, size=n)),
        ("v2", lambda: T.pallas_topk_certified2(q1, corpus, k, size=n,
                                                tile=2048, groups=8)),
    ]:
        s, i = fn()
        s, i = np.asarray(s), np.asarray(i)
        unc = int(i[b, 0])
        mism = int((np.sort(s, axis=1) != so_sorted).sum())
        emit({"check": name, "uncovered": unc, "score_mismatch": mism})
        if (unc or mism) and not args.smoke:
            # At 1M the 32-tile union budget overflows by design (256
            # tiles, clustered corpus) — dispatch_topk reruns on that
            # signal. Only the 10M headline shape must certify clean.
            log(f"FAIL {name}: uncovered={unc} mismatch={mism}")
            return 1

    iters = 2 if args.smoke else 8
    rows = [
        ("v1_single", b,
         lambda: T.pallas_topk_certified(q1, corpus, k, size=n)),
        ("v2_single", b,
         lambda: T.pallas_topk_certified2(q1, corpus, k, size=n,
                                          tile=2048, groups=8)),
    ]
    if not args.smoke:
        # v2_m4 (1.24 s/iter) and t4096 G=16 (AOT helper OOM) measured
        # 2026-08-19 and dropped: certified2 is demoted to experimental.
        rows += [
            ("v1_m4", 4 * b,
             lambda: T.pallas_topk_certified_multi(q4, corpus, k, size=n)),
        ]
    for name, bb, fn in rows:
        try:
            ms = timed(fn, fetch, iters=iters)
            unc = int(fetch(fn())[-1, 0])
            emit({"variant": name, "ms": round(ms, 2),
                  "qps": round(bb / ms * 1e3), "uncovered": unc})
        except Exception as exc:
            emit({"variant": name, "error": str(exc)[:300]})
    log("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
