"""Round-4c: attribute the multi-batch slope — lax.map vs unrolled.

r4b measured: certified single b1024 = 44.8 ms pipelined (floor kernel
34.5 ms same protocol), yet certified_multi m=4 = 157 ms — a 39 ms
per-sub-batch slope where the single-dispatch delta over floor is only
~10 ms. Suspect: per-step overhead inside ``lax.map`` (sequential
while-loop with dynamic-slice copies) vs letting XLA schedule M
independent sub-batch programs. This script measures:

  multi_m1          — the map wrapper at M=1 (wrapper cost alone)
  multi_m4          — r4b reference
  unroll_m4 / m8    — M explicit certified calls on query slices inside
                      ONE jit, results stacked (no loop machinery)
  floor_map4        — 4 floor-kernel sub-batches under lax.map
  floor_unroll4     — same, unrolled (map overhead on a trivial body)
  c2_sort_narrow    — top_k as [B*32, 4096] two-stage vs the measured
                      36.9 ms [B, 131072] wide sort (c2 merge lever)

Run on the TPU: python -m benchmarks.sweep_r4c [--interpret]
"""

from __future__ import annotations

import argparse
import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
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

    def run(name, fn, pool, bb, fetch=None, iters=6, extra=None):
        fetch = fetch or (lambda r: np.asarray(r[1]))
        try:
            ms = timed(lambda: fn(nxt(pool)), fetch, iters=iters)
            row = {"m": name, "ms": round(ms, 2),
                   "qps": round(bb / (ms / 1e3), 0)}
            if extra:
                row.update(extra(fn(pool[0])))
            emit(row)
        except Exception as exc:
            emit({"m": name, "error": repr(exc)[:300]})
            log(f"section {name} failed: {exc!r}")

    def unc(r):
        return {"uncovered": int(np.asarray(r[1])[-1, 0])}

    # ---- map wrapper cost at M=1 --------------------------------------
    q1 = qbatch(b)
    run("multi_m1",
        lambda q: T.pallas_topk_certified_multi(
            q, corpus, k, sub_batch=b, tile=tile, groups=8,
            interpret=interp), q1, b, extra=unc)

    # ---- unrolled M certified calls in one jit ------------------------
    def make_unrolled(m):
        @jax.jit
        def f(q, c):
            outs = [T.pallas_topk_certified(
                q[j * b:(j + 1) * b], c, k, tile=tile, groups=8,
                interpret=interp) for j in range(m)]
            scores = jnp.concatenate([s for s, _ in outs], axis=0)
            ids = jnp.concatenate([i[:-1] for _, i in outs], axis=0)
            uncv = sum(i[-1:, :1].sum() for _, i in outs).astype(jnp.int32)
            count_row = jnp.zeros((1, k), jnp.int32).at[0, 0].set(uncv)
            return scores, jnp.concatenate([ids, count_row], axis=0)
        return f

    for m in (4, 8):
        if SMOKE and m > 4:
            continue
        qm = qbatch(m * b)
        fu = make_unrolled(m)
        run(f"unroll_m{m}", lambda q, fu=fu: fu(q, corpus), qm, m * b,
            extra=unc)

    # ---- map reference at M=4 -----------------------------------------
    qm4 = qbatch(4 * b)
    run("multi_m4",
        lambda q: T.pallas_topk_certified_multi(
            q, corpus, k, sub_batch=b, tile=tile, groups=8,
            interpret=interp), qm4, 4 * b, extra=unc)

    # ---- floor kernel: map vs unrolled --------------------------------
    def _floor_kernel(q_ref, c_ref, out_ref, *, precision):
        scores = jax.lax.dot_general(
            q_ref[:].astype(c_ref.dtype), c_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        out_ref[0, 0, :] = jnp.max(scores, axis=1)

    num_tiles = n // tile

    def floor_one(q, c):
        per_tile = pl.pallas_call(
            functools.partial(_floor_kernel,
                              precision=jax.lax.Precision.DEFAULT),
            interpret=interp,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((b, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((num_tiles, 1, b), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n * d,
                bytes_accessed=n * d * c.dtype.itemsize,
                transcendentals=0),
        )(q, c)
        return jnp.max(per_tile[:, 0, :], axis=0)             # [B]

    @jax.jit
    def floor_map4(q, c):
        return jax.lax.map(lambda qq: floor_one(qq, c),
                           q.reshape(4, b, d))

    @jax.jit
    def floor_unroll4(q, c):
        return jnp.stack([floor_one(q[j * b:(j + 1) * b], c)
                          for j in range(4)])

    run("floor_map4", lambda q: floor_map4(q, corpus), qm4, 4 * b,
        fetch=np.asarray)
    run("floor_unroll4", lambda q: floor_unroll4(q, corpus), qm4, 4 * b,
        fetch=np.asarray)

    # ---- c2 sort: narrow two-stage vs wide ----------------------------
    u = 32
    blk = jax.device_put(jnp.asarray(
        rng.standard_normal((b, u * tile)).astype(np.float32)))

    @jax.jit
    def narrow(x):
        s1, p1 = jax.lax.top_k(x.reshape(b * u, tile), k)     # [b*u, k]
        s1 = s1.reshape(b, u * k)
        p1 = p1.reshape(b, u * k)
        tile_of = jnp.arange(u * k, dtype=jnp.int32) // k
        s2, p2 = jax.lax.top_k(s1, k)
        within = jnp.take_along_axis(p1, p2, axis=1)
        return s2, jnp.take(tile_of, p2) * tile + within

    run("c2_sort_narrow", lambda _: narrow(blk), [blk], b,
        fetch=lambda r: np.asarray(r[0]))


if __name__ == "__main__":
    main()
