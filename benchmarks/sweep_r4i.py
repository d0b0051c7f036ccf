"""Round-4i: lookback-pipelined main pass vs the single-stage kernel.

The diag_r4h device trace attributed 23.1 ms of certified's 36.4 ms
device time to the main packed pass — ~9 ms of VPU packing serialized
behind the ~14 ms MXU-bound scan per grid step. `_packed_pass_pipe`
breaks the in-step dependency (step t packs tile t-1 from scratch
while the MXU scores tile t). This measures, at the headline shape
(10M x 128-d bf16, B=1024, k=10, tile=4096):

  main_default / main_pipe   — the two main passes in isolation
  cert_default / cert_pipe   — full certified kernel, M=1
  cert_m4_pipe               — certified_multi M=4 (headline config)

plus exactness of cert_pipe vs the corpus-dtype oracle.

Run: python -u -m benchmarks.sweep_r4i [--smoke]
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
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q1 = jnp.asarray(q)
    q4 = rng.standard_normal((4 * b, d)).astype(np.float32)
    q4 /= np.linalg.norm(q4, axis=1, keepdims=True)
    q4 = jnp.asarray(q4)

    # Exactness first: pipeline output vs default and vs the oracle.
    so = np.asarray(T.pallas_topk(q1, corpus, k, size=n, tile_k=k)[0])
    s, i = T.pallas_topk_certified(q1, corpus, k, size=n, pipeline=2)
    s, i = np.asarray(s), np.asarray(i)
    unc = int(i[b, 0])
    mism = int((np.sort(s, axis=1) != np.sort(so, axis=1)).sum())
    emit({"check": "cert_pipe", "uncovered": unc, "score_mismatch": mism})
    if (unc or mism) and not args.smoke:
        log(f"FAIL: uncovered={unc} mismatch={mism}")
        return 1

    mp_d = jax.jit(lambda qq, cc: T._packed_pass(
        qq, cc, None, 4096, 8, False, None)[0],
        static_argnums=())
    mp_p = jax.jit(lambda qq, cc: T._packed_pass_pipe(
        qq, cc, None, 4096, 8, False, None)[0])
    mp_p2 = jax.jit(lambda qq, cc: T._packed_pass_pipe(
        qq, cc, None, 4096, 8, False, None, variant=2)[0])

    iters = 2 if args.smoke else 8
    rows = [
        ("main_default", b, lambda: mp_d(q1, corpus),
         lambda r: np.asarray(r[:1, :1, :1])),
        ("main_pipe", b, lambda: mp_p(q1, corpus),
         lambda r: np.asarray(r[:1, :1, :1])),
        ("main_pipe2", b, lambda: mp_p2(q1, corpus),
         lambda r: np.asarray(r[:1, :1, :1])),
        ("cert_default", b,
         lambda: T.pallas_topk_certified(q1, corpus, k, size=n),
         lambda r: np.asarray(r[1][-1:])),
        ("cert_pipe2", b,
         lambda: T.pallas_topk_certified(q1, corpus, k, size=n,
                                         pipeline=2),
         lambda r: np.asarray(r[1][-1:])),
    ]
    if not args.smoke:
        rows += [
            ("cert_m4_default", 4 * b,
             lambda: T.pallas_topk_certified_multi(q4, corpus, k, size=n),
             lambda r: np.asarray(r[1][-1:])),
            ("cert_m4_pipe2", 4 * b,
             lambda: T.pallas_topk_certified_multi(q4, corpus, k, size=n,
                                                   pipeline=2),
             lambda r: np.asarray(r[1][-1:])),
        ]
    for name, bb, fn, fetch in rows:
        try:
            ms = timed(fn, fetch, iters=iters)
            emit({"variant": name, "ms": round(ms, 2),
                  "qps": round(bb / ms * 1e3)})
        except Exception as exc:
            emit({"variant": name, "error": str(exc)[:300]})
    log("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
