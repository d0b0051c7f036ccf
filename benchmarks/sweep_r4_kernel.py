"""Round-4 kernel component sweep (VERDICT r3 next #3).

b1024 certified-exact ran 40.2 ms/batch in round 3 against a ~15 ms
matmul floor. This script splits the time on-chip so the optimization
targets measurements, not guesses:

  floor      — matmul-only pallas kernel, same grid/tiles, one [T, B]
               max written per tile (the stream+MXU lower bound)
  packed     — the extraction kernel alone (with the round-4 full-tile
               fast path: no pad mask / clamp on unpadded corpora)
  certified  — full pallas_topk_certified (kernel + c1 rescue + c2
               union rescan + c3 bound + merges)
  topk_cost  — lax.top_k over a [B, union_tiles*tile] f32 block alone
               (the c2 merge suspect)
  e2e        — depth-2 pipelined dispatch_topk at B=1024 (headline
               protocol)

Run on the TPU:  python -m benchmarks.sweep_r4_kernel [--n N] [--b B]
One JSON line per measurement on stdout; diagnostics on stderr.
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
    """Depth-pipelined ms/iter with per-iteration host fetch (the only
    honest barrier through the tunneled runtime). The fetched value must
    be SMALL (a checksum row, ids, or a reduced vector): a multi-MB fetch
    is itself tens of ms through the tunnel and pollutes the number."""
    if SMOKE:  # interpret-mode correctness pass: one iteration, no warmup
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


def section(name):
    """Isolate one measurement: a failed section emits an error line and
    the sweep continues (the first run died whole on one VMEM OOM)."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        try:
            yield
        except Exception as exc:
            emit({"m": name, "error": repr(exc)[:300]})
            log(f"section {name} failed: {exc!r}")
    return cm()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10 * (1 << 20))
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tile", type=int, default=4096)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke mode: interpret pallas kernels (correctness of the script, not a timing)")
    args = ap.parse_args()

    import jax
    if args.interpret:
        # The axon boot hook force-sets jax_platforms="axon,cpu" at
        # interpreter start, overriding JAX_PLATFORMS; a "CPU" smoke run
        # would otherwise hang in the chip-claim wait.
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
    backend = jax.default_backend()
    log(f"backend={backend} n={n} d={d} b={b} tile={tile}")
    corpus = make_corpus_device(n, d, clusters=4096, dtype=jnp.bfloat16)
    corpus.block_until_ready()
    rng = np.random.default_rng(0)
    qs = []
    for _ in range(4):
        q = rng.standard_normal((b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        qs.append(jax.device_put(jnp.asarray(q)))
    it = iter(range(1 << 30))

    def nxt():
        return qs[next(it) % len(qs)]

    # ---- floor: matmul + single max per tile --------------------------
    # NB: the corpus MUST be a jit argument, never a closure capture — a
    # closed-over device array is lowered as a 2.68 GB captured CONSTANT
    # and the compile wedges serializing it through the tunnel.
    def _floor_kernel(q_ref, c_ref, out_ref, *, precision):
        scores = jax.lax.dot_general(
            q_ref[:].astype(c_ref.dtype), c_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        out_ref[0, 0, :] = jnp.max(scores, axis=1)

    num_tiles = n // tile

    @jax.jit
    def floor_call(q, c):
        # Output is [T, 1, B] with a (1, 1, B) block: Mosaic requires the
        # last two block dims to divide (8, 128) or equal the array dims —
        # a 2D (1, B) block over [T, B] fails that rule on real TPU.
        # Reduce IN-JIT: fetching the raw [T, 1, B] array is a 10.5 MB
        # host transfer per iteration through the tunnel (~the whole
        # measurement); the [B] max costs one tiny HBM re-read.
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

    with section("floor_matmul_max"):
        ms = timed(lambda: floor_call(nxt(), corpus), np.asarray)
        emit({"m": "floor_matmul_max", "ms": round(ms, 2), "b": b,
              "gbps": round(n * d * 2 / (ms / 1e3) / 1e9, 1)})

    # ---- packed extraction pass alone ---------------------------------
    # Reduce in-jit for the same reason as the floor — AND because the
    # raw [T, 2, B] f32 output returned as a program output triggers a
    # scoped-VMEM stack allocation for relayout (18.68M > 16M OOM on the
    # first run); a consumer op lets XLA stream it through HBM instead.
    @jax.jit
    def packed_call(q, c):
        (w,) = T._packed_pass(q, c, None, tile, 8, interp,
                              jax.lax.Precision.DEFAULT)
        return jnp.max(w, axis=0)                              # [2, B]

    with section("packed_pass"):
        ms = timed(lambda: packed_call(nxt(), corpus), np.asarray)
        emit({"m": "packed_pass", "ms": round(ms, 2),
              "gbps": round(n * d * 2 / (ms / 1e3) / 1e9, 1)})

    # ---- full certified -------------------------------------------------
    def cert(q):
        return T.pallas_topk_certified(q, corpus, k, tile=tile,
                                       groups=8, interpret=interp)

    with section("certified_full"):
        ms = timed(lambda: cert(nxt()), lambda r: np.asarray(r[1]))
        emit({"m": "certified_full", "ms": round(ms, 2),
              "qps": round(b / (ms / 1e3), 0)})

    # ---- certified with smaller covers ---------------------------------
    for ut in (8, 16):
        def cert_u(q, ut=ut):
            return T.pallas_topk_certified(q, corpus, k, tile=tile,
                                           groups=8, union_tiles=ut,
                                           interpret=interp)
        with section(f"certified_union{ut}"):
            ms = timed(lambda: cert_u(nxt()), lambda r: np.asarray(r[1]))
            unc = int(np.asarray(cert_u(qs[0])[1])[-1, 0])
            emit({"m": f"certified_union{ut}", "ms": round(ms, 2),
                  "uncovered": unc, "qps": round(b / (ms / 1e3), 0)})

    # ---- lax.top_k cost over the c2 rescan block -----------------------
    for cols in (32 * tile, 8 * tile):
        with section(f"lax_topk_{cols}"):
            blk = jax.device_put(jnp.asarray(
                rng.standard_normal((b, cols)).astype(np.float32)))

            @jax.jit
            def tk(x):
                return jax.lax.top_k(x, k)

            ms = timed(lambda: tk(blk), lambda r: np.asarray(r[0]),
                       iters=6)
            emit({"m": f"lax_topk_{cols}", "ms": round(ms, 2)})

    # ---- two-stage alternative for the c2 merge -------------------------
    # top_k over [B, u*tile] vs per-tile top_k then a tiny merge: same
    # result set, different sort sizes — measure which the TPU prefers.
    for cols_t in (32,):
        with section(f"lax_topk_two_stage_{cols_t * tile}"):
            blk = jax.device_put(jnp.asarray(
                rng.standard_normal((b, cols_t * tile)).astype(np.float32)))

            @jax.jit
            def tk2(x, cols_t=cols_t):
                x3 = x.reshape(b, cols_t, tile)
                s1, p1 = jax.lax.top_k(x3, k)          # [b, u, k]
                s2, p2 = jax.lax.top_k(s1.reshape(b, cols_t * k), k)
                tile_of = p2 // k
                within = jnp.take_along_axis(
                    p1.reshape(b, cols_t * k), p2, axis=1)
                return s2, tile_of * tile + within

            ms = timed(lambda: tk2(blk), lambda r: np.asarray(r[0]), iters=6)
            emit({"m": f"lax_topk_two_stage_{cols_t * tile}",
                  "ms": round(ms, 2)})

    # ---- c1 rescore cost alone -----------------------------------------
    with section("c1_rescore"):
        r_cnt, groups = k + max(k, 8), 8
        flat = jax.device_put(jnp.asarray(
            rng.integers(0, n, (b, r_cnt * groups), dtype=np.int32)))

        @jax.jit
        def c1(q, fl, c):
            g = c[fl]
            s = T._exact_rowwise_scores(q, g, c.dtype,
                                        jax.lax.Precision.HIGHEST)
            return jnp.max(s, axis=1)                          # [B]

        ms = timed(lambda: c1(nxt(), flat, corpus), np.asarray, iters=6)
        emit({"m": "c1_rescore", "ms": round(ms, 2),
              "rows_per_q": r_cnt * groups})

    # ---- end-to-end dispatch (headline protocol) ------------------------
    def e2e(q):
        # dispatch_topk derives interpret from the backend; force the
        # pallas route in smoke mode (prefer_pallas defaults False on CPU).
        return T.dispatch_topk(q, corpus, k, tile=tile,
                               defer_certificate=True,
                               prefer_pallas=True if interp else None)

    with section("dispatch_e2e"):
        ms = timed(lambda: e2e(nxt()), lambda r: np.asarray(r[1]), iters=12)
        unc = int(np.asarray(e2e(qs[0])[1])[-1, 0])
        emit({"m": "dispatch_e2e_b%d" % b, "ms": round(ms, 2),
              "qps": round(b / (ms / 1e3), 0), "uncovered": unc})


if __name__ == "__main__":
    main()
