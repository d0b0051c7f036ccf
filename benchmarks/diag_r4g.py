"""Round-4g: decompose certified2's 311 ms (vs v1's 40 ms) at 10M.

Pieces, each jitted and timed separately (pipelined, per-iteration host
fetch of a small result):

  mates_main   — _mates_pass over all T tiles (the kernel itself)
  top2_outer   — _top2_rows + provisional sort, on pre-computed
                 val/mates device arrays (the pure-XLA outer graph)
  union_pass   — _extract_pass over 32 tiles (rounds=k)
  v1_ref       — pallas_topk_certified for the same-session baseline

Run: python -u -m benchmarks.diag_r4g
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(fn, fetch, iters=6, warm=2, depth=2):
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
    import functools
    import jax
    import jax.numpy as jnp
    from benchmarks.common import make_corpus_device
    from optimized_rag_tpu.ops import topk as T

    log(f"backend={jax.default_backend()}")
    n, d, b, k, tile, groups = 10 * (1 << 20), 128, 1024, 10, 2048, 8
    corpus = make_corpus_device(n, d, clusters=4096, dtype=jnp.bfloat16)
    corpus.block_until_ready()
    log("corpus on device")
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q1 = jnp.asarray(q)
    num_tiles = n // tile
    tiles_main = jnp.arange(num_tiles, dtype=jnp.int32)

    # corpus rides as a jit ARGUMENT everywhere below — a closure
    # capture lowers it as a 2.68 GB inline constant (14-min lowering,
    # rc=124 on 2026-08-19).
    mates_fn = jax.jit(lambda qq, cc: T._mates_pass(
        qq, cc, None, tile, groups, 2, tiles_main, False, None))
    ms = timed(lambda: mates_fn(q1, corpus), lambda r: np.asarray(r[0][:1]))
    log(json.dumps({"piece": "mates_main", "ms": round(ms, 2)}))

    val, mates = mates_fn(q1, corpus)
    val.block_until_ready()

    @jax.jit
    def outer(val, mates):
        val_bt = jax.lax.bitcast_convert_type(
            jnp.transpose(val, (2, 0, 1)), jnp.int32)
        mates_bt = jnp.transpose(mates, (2, 0, 1))
        c1v, row1, c2v, row2, c3v = T._top2_rows(mates_bt, val_bt, tile,
                                                 groups)
        cand_s = jnp.concatenate([c1v, c2v], axis=1)
        cand_i = jnp.concatenate([row1, row2], axis=1)
        top_s, pos = jax.lax.top_k(cand_s, k)
        top_i = jnp.take_along_axis(cand_i, pos, axis=1)
        tau = top_s[:, k - 1]
        ub2 = T._unpack_ub(val_bt[:, :, 1], tile)
        sus = (ub2 > tau[:, None]) | (c3v > tau[:, None])
        margin = jnp.maximum(ub2, c3v) - tau[:, None]
        priority = jnp.max(jnp.where(sus, margin, -jnp.inf), axis=0)
        sel_pri, sel_tiles = jax.lax.top_k(priority, 32)
        return top_s, top_i, tau, sel_tiles

    ms = timed(lambda: outer(val, mates), lambda r: np.asarray(r[2][:1]))
    log(json.dumps({"piece": "top2_outer", "ms": round(ms, 2)}))

    # transpose alone (the [T,2G,B] -> [B,T,2G] relayout)
    tr = jax.jit(lambda m: jnp.transpose(m, (2, 0, 1)))
    ms = timed(lambda: tr(mates), lambda r: np.asarray(r[:1, :1, :1]))
    log(json.dumps({"piece": "transpose_mates", "ms": round(ms, 2)}))

    sel = jnp.arange(32, dtype=jnp.int32)
    union_fn = jax.jit(lambda qq, cc: T._extract_pass(
        qq, cc, None, tile, k, sel, False, None))
    ms = timed(lambda: union_fn(q1, corpus), lambda r: np.asarray(r[0][:1]))
    log(json.dumps({"piece": "union_pass", "ms": round(ms, 2)}))

    ms = timed(lambda: T.pallas_topk_certified(q1, corpus, k, size=n),
               lambda r: np.asarray(r[1][-1:]))
    log(json.dumps({"piece": "v1_ref", "ms": round(ms, 2)}))
    log("done")


if __name__ == "__main__":
    main()
