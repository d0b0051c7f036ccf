"""Round-4d: segmented c2 union merge vs the wide sort.

RESULTS_r4 §8 attributed ~12 ms of the certified kernel's 33 ms/1024q
on-chip budget to ``lax.top_k`` over the [B, U*tile] union-rescan block.
``_segmented_union_topk`` replaces it with 3 masked int-max passes plus
a [B, 3*(U*tile/32)] narrow sort, carrying two new certificate terms
(segment residue, quantized boundary). This sweep measures, at the
headline shape (10M x 128-d bf16, b=1024, k=10, tile=4096):

  cert_wide        — certified single-dispatch, wide-sort c2 (r4 baseline)
  cert_seg         — same with the segmented merge (the new default)
  cert_seg_m4      — certified_multi M=4 (the bench headline config)
  cert_wide_m4     — baseline M=4 for the same session (jitter control)

Every row reports the uncovered certificate count — a nonzero count on
the cluster corpus would disqualify the variant (mandatory rerun).

Run on the TPU: python -m benchmarks.sweep_r4d [--interpret]
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
        args.n = 64 * args.tile
        args.b = 64
    import jax.numpy as jnp
    from benchmarks.common import make_corpus_device
    from optimized_rag_tpu.ops import topk as T

    n, d, b, k, tile = args.n, args.d, args.b, args.k, args.tile
    interp = args.interpret
    log(f"backend={jax.default_backend()} n={n} d={d} b={b} tile={tile}")
    corpus = make_corpus_device(n, d, clusters=4096, dtype=jnp.bfloat16)
    corpus.block_until_ready()
    rng = np.random.default_rng(0)

    def qbatch(bb, n_b=2):
        out = []
        for _ in range(n_b):
            q = rng.standard_normal((bb, d)).astype(np.float32)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            out.append(jax.device_put(jnp.asarray(q)))
        return out

    it = iter(range(1 << 30))

    def nxt(pool):
        return pool[next(it) % len(pool)]

    def run(name, fn, pool, bb, iters=6):
        fetch = lambda r: np.asarray(r[1])  # noqa: E731
        try:
            ms = timed(lambda: fn(nxt(pool)), fetch, iters=iters)
            r = fn(pool[0])
            unc = int(np.asarray(r[1])[-1, 0])
            emit({"m": name, "ms": round(ms, 2),
                  "qps": round(bb / (ms / 1e3), 0), "uncovered": unc})
        except Exception as exc:
            emit({"m": name, "error": repr(exc)[:300]})
            log(f"section {name} failed: {exc!r}")

    seg_impl = T._segmented_union_topk

    def wide_impl(scu, tau, kk, **kw):
        r_s, r_pos = jax.lax.top_k(scu, kk)
        return r_s, r_pos, jnp.int32(0)

    q1 = qbatch(b)
    qm4 = qbatch(4 * b)

    for label, impl in (("seg", seg_impl), ("wide", wide_impl)):
        T._segmented_union_topk = impl
        jax.clear_caches()
        run(f"cert_{label}",
            lambda q: T.pallas_topk_certified(
                q, corpus, k, tile=tile, groups=8, interpret=interp),
            q1, b)
        run(f"cert_{label}_m4",
            lambda q: T.pallas_topk_certified_multi(
                q, corpus, k, sub_batch=b, tile=tile, groups=8,
                interpret=interp),
            qm4, 4 * b)
    T._segmented_union_topk = seg_impl


if __name__ == "__main__":
    main()
