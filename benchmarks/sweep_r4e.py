"""Round-4e: micro-attribution of the segmented c2 merge pieces.

sweep_r4d measured the segmented merge 10.5 ms SLOWER than the wide
sort it replaces. This isolates each stage on the exact shapes the
certified kernel uses (B=1024, C=32*4096=131072, w=32, s=4096):

  wide_sort      — lax.top_k(scu, 10) over [B, C] f32 (reference)
  pack_chain     — pack + m1..m4 masked-max reductions only
  cand_sort      — lax.top_k over [B, 3s] int32
  exact_fetch    — take_along_axis of k+pad cols/query from scu
  seg_full       — the full helper
  seg_lb         — variant: no exact re-fetch; packed lower bounds as
                   scores (candidate ordering), exactness via final
                   rescore outside

Run: python -m benchmarks.sweep_r4e
"""

from __future__ import annotations

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
    import jax
    import jax.numpy as jnp
    from optimized_rag_tpu.ops import topk as T

    b, c, k, w, pad = 1024, 32 * 4096, 10, 32, 8
    s = c // w
    rng = np.random.default_rng(0)
    blocks = [jax.device_put(jnp.asarray(
        (rng.standard_normal((b, c)).astype(np.float32) * 0.2).clip(-1, 1)))
        for _ in range(2)]
    tau = jax.device_put(jnp.asarray(
        np.full((b,), 0.55, np.float32)))
    it = iter(range(1 << 30))

    def nxt():
        return blocks[next(it) % 2]

    def run(name, fn, fetch=None):
        fetch = fetch or (lambda r: np.asarray(r[0]))
        try:
            ms = timed(lambda: fn(nxt()), fetch)
            emit({"m": name, "ms": round(ms, 2)})
        except Exception as exc:
            emit({"m": name, "error": repr(exc)[:200]})

    @jax.jit
    def wide(x):
        return jax.lax.top_k(x, k)

    run("wide_sort", wide)

    @jax.jit
    def pack_chain(x):
        sh = jnp.maximum(x + 2.0, 0.0)
        p = jax.lax.bitcast_convert_type(sh, jnp.int32)
        g = jax.lax.broadcasted_iota(jnp.int32, (b, w, s), 1)
        packed = (p.reshape(b, w, s) & ~jnp.int32(w - 1)) | g
        m1 = jnp.max(packed, axis=1)
        p2 = jnp.where(packed == m1[:, None, :], 0, packed)
        m2 = jnp.max(p2, axis=1)
        p3 = jnp.where(p2 == m2[:, None, :], 0, p2)
        m3 = jnp.max(p3, axis=1)
        p4 = jnp.where(p3 == m3[:, None, :], 0, p3)
        m4 = jnp.max(p4, axis=1)
        return m1, m2, m3, m4

    run("pack_chain", pack_chain)

    cand_blk = [jax.device_put(jnp.asarray(
        rng.integers(1 << 20, 1 << 30, (b, 3 * s), dtype=np.int32)))
        for _ in range(2)]

    @jax.jit
    def cand_sort(x):
        return jax.lax.top_k(x, k + pad + 1)

    run("cand_sort", lambda _: cand_sort(cand_blk[next(it) % 2]))

    cols_blk = jax.device_put(jnp.asarray(
        rng.integers(0, c, (b, k + pad), dtype=np.int32)))

    @jax.jit
    def fetch18(x):
        return jnp.take_along_axis(x, cols_blk, axis=1)

    run("exact_fetch", fetch18)

    def seg_full(x):
        return T._segmented_union_topk(x, tau, k)

    run("seg_full", seg_full)

    # lb variant: candidates ordered by packed value; scores returned as
    # quantized lower bounds (caller rescores final winners exactly).
    @jax.jit
    def seg_lb(x):
        sh = jnp.maximum(x + 2.0, 0.0)
        p = jax.lax.bitcast_convert_type(sh, jnp.int32)
        g = jax.lax.broadcasted_iota(jnp.int32, (b, w, s), 1)
        packed = (p.reshape(b, w, s) & ~jnp.int32(w - 1)) | g
        m1 = jnp.max(packed, axis=1)
        p2 = jnp.where(packed == m1[:, None, :], 0, packed)
        m2 = jnp.max(p2, axis=1)
        p3 = jnp.where(p2 == m2[:, None, :], 0, p2)
        m3 = jnp.max(p3, axis=1)
        p4 = jnp.where(p3 == m3[:, None, :], 0, p3)
        m4 = jnp.max(p4, axis=1)
        cand = jnp.concatenate([m1, m2, m3], axis=1)
        top_p, top_pos = jax.lax.top_k(cand, k + pad + 1)
        seg = top_pos % s
        grp = top_p & jnp.int32(w - 1)
        cols = grp * s + seg
        lb = T._unpack_lb(top_p[:, :k], w)
        residue = jnp.sum(T._unpack_ub(m4, w) > tau[:, None])
        return lb, cols[:, :k], residue

    run("seg_lb", seg_lb)


if __name__ == "__main__":
    main()
