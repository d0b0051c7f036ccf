"""Round-4b: certified-kernel compile recovery + cover-cost levers.

The round-4 full-tile fast path (pl.when) pushed the packed kernel's
scoped-VMEM demand over the relay AOT helper's 16M limit at b1024 —
this script re-validates compilability after the single-path revert and
measures the two cover levers the component sweep implicated:

  certified_b1024          — the bench.py headline config (must compile)
  certified_u{8,16}        — smaller c2 batch-union rescan (lax.top_k
                             over [B, u*tile] was 37 ms standalone at
                             u=32; 8/16 shrink the sort 4x/2x)
  certified_r12            — smaller c1 rescue set (pad_r=12 -> 96
                             gathered rows/query instead of 160)
  certified_u8_r12         — both
  multi_m4 / multi_m8      — M sub-batches of 1024 in one dispatch
                             (amortizes the ~25-31 ms relay round trip)

Exactness is certified per call (uncovered counter in the ids buffer);
any nonzero uncovered disqualifies that lever.

Run on the TPU: python -m benchmarks.sweep_r4b [--interpret]
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


SMOKE = False


def timed(fn, fetch, iters=8, warm=2, depth=2):
    if SMOKE:
        iters, warm, depth = 1, 0, 1
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
    ap.add_argument("--n", type=int, default=10 * (1 << 20))
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tile", type=int, default=4096)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
        global SMOKE
        SMOKE = True
    import jax.numpy as jnp
    from benchmarks.common import make_corpus_device
    from optimized_rag_tpu.ops import topk as T

    n, d, b, k, tile = args.n, args.d, args.b, args.k, args.tile
    interp = args.interpret
    log(f"backend={jax.default_backend()} n={n} d={d} b={b} tile={tile}")
    corpus = make_corpus_device(n, d, clusters=4096, dtype=jnp.bfloat16)
    corpus.block_until_ready()
    rng = np.random.default_rng(0)

    def qbatch(bb, n_b=4):
        out = []
        for _ in range(n_b):
            q = rng.standard_normal((bb, d)).astype(np.float32)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            out.append(jax.device_put(jnp.asarray(q)))
        return out

    qs = qbatch(b)
    it = iter(range(1 << 30))

    def nxt(pool):
        return pool[next(it) % len(pool)]

    def run(name, fn, pool, bb, iters=8):
        try:
            ms = timed(lambda: fn(nxt(pool)), lambda r: np.asarray(r[1]),
                       iters=iters)
            unc = int(np.asarray(fn(pool[0])[1])[-1, 0])
            emit({"m": name, "ms": round(ms, 2), "uncovered": unc,
                  "qps": round(bb / (ms / 1e3), 0)})
        except Exception as exc:
            emit({"m": name, "error": repr(exc)[:300]})
            log(f"section {name} failed: {exc!r}")

    run("certified_b1024",
        lambda q: T.pallas_topk_certified(q, corpus, k, tile=tile, groups=8,
                                          interpret=interp), qs, b)
    for ut in (16, 8):
        run(f"certified_u{ut}",
            lambda q, ut=ut: T.pallas_topk_certified(
                q, corpus, k, tile=tile, groups=8, union_tiles=ut,
                interpret=interp), qs, b)
    run("certified_r12",
        lambda q: T.pallas_topk_certified(q, corpus, k, tile=tile, groups=8,
                                          pad_r=12, interpret=interp), qs, b)
    run("certified_u8_r12",
        lambda q: T.pallas_topk_certified(q, corpus, k, tile=tile, groups=8,
                                          union_tiles=8, pad_r=12,
                                          interpret=interp), qs, b)

    for m in (4, 8):
        if SMOKE and m > 4:
            continue
        qm = qbatch(m * b, n_b=2)
        run(f"multi_m{m}",
            lambda q: T.pallas_topk_certified_multi(
                q, corpus, k, sub_batch=b, tile=tile, groups=8,
                interpret=interp), qm, m * b, iters=6)

    # cheapest levers combined at the multi config
    qm = qbatch(4 * b, n_b=2)
    run("multi_m4_u8_r12",
        lambda q: T.pallas_topk_certified_multi(
            q, corpus, k, sub_batch=b, tile=tile, groups=8, union_tiles=8,
            pad_r=12, interpret=interp), qm, 4 * b, iters=6)


if __name__ == "__main__":
    main()
