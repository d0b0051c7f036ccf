"""Stage-by-stage compile diagnostic for certified2 on the real chip.

The 10M certified2 compile died with `tpu_compile_helper subprocess
exit signal SIGKILL (9)` in the remote AOT helper. This isolates which
compile is responsible and how long each takes at 1M (identical kernel
MLIR to 10M — only the grid count and outer-graph T differ):

  stage A — _mates_pass main kernel (n_units=2, tile=2048, G=8)
  stage B — _mates_pass union kernel (n_units=16: the 128-slice unroll)
  stage C — full pallas_topk_certified2 (outer graph included)

Run: python -u -m benchmarks.diag_r4f [--n N]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from benchmarks.common import make_corpus_device
    from optimized_rag_tpu.ops import topk as T

    log("importing done; touching backend...")
    log(f"backend={jax.default_backend()}")
    n, d, b, k, tile, groups = args.n, 128, 1024, 10, 2048, 8
    corpus = make_corpus_device(n, d, clusters=4096, dtype=jnp.bfloat16)
    corpus.block_until_ready()
    log(f"corpus [{n},{d}] bf16 on device")
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q1 = jnp.asarray(q)
    num_tiles = n // tile
    import jax.lax  # noqa: F401

    t0 = time.perf_counter()
    val, mates = T._mates_pass(q1, corpus, None, tile, groups, 2,
                               jnp.arange(num_tiles, dtype=jnp.int32),
                               False, None)
    np.asarray(val[:1])
    log(f"stage A (main mates kernel, T={num_tiles}): "
        f"{time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    uval, ucol = T._extract_pass(q1, corpus, None, tile, k,
                                 jnp.arange(32, dtype=jnp.int32),
                                 False, None)
    np.asarray(uval[:1])
    log(f"stage B (union extract kernel, rounds={k}): "
        f"{time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    s, i = T.pallas_topk_certified2(q1, corpus, k, size=n, tile=tile,
                                    groups=groups)
    i = np.asarray(i)
    log(f"stage C (full certified2): {time.perf_counter() - t0:.1f}s; "
        f"uncovered={int(i[b, 0])}")

    # warm timing
    def fetch(out):
        return np.asarray(out[1])
    for _ in range(2):
        fetch(T.pallas_topk_certified2(q1, corpus, k, size=n, tile=tile,
                                       groups=groups))
    t0 = time.perf_counter()
    it = 4
    for _ in range(it):
        fetch(T.pallas_topk_certified2(q1, corpus, k, size=n, tile=tile,
                                       groups=groups))
    log(f"warm: {(time.perf_counter() - t0) / it * 1e3:.2f} ms/call")
    log("done")


if __name__ == "__main__":
    main()
