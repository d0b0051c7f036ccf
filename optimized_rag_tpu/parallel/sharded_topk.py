"""Sharded dense top-k: per-shard fused top-k + all-gather merge.

The scaling pattern for BASELINE.json config[4] (10M vectors over a v5e-8
mesh): the embedding matrix lives row-sharded across ICI, every chip runs
the fused matmul+top-k over its local shard (ops/topk.py), and the k
winners per shard — a tiny [devices, B, k] tensor — are all-gathered and
re-top-k'd. Collective volume is O(devices * B * k), independent of N.

Implemented with ``shard_map`` so the per-shard body is exactly the
single-chip kernel; XLA inserts the all-gather over the ICI ring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from optimized_rag_tpu.ops.similarity import normalize
from optimized_rag_tpu.ops.topk import (
    NEG_INF, chunked_topk, exact_topk, pallas_topk, pallas_topk_verified)


@functools.partial(
    jax.jit, static_argnames=("k", "mesh", "axis", "impl", "tile", "chunk"))
def sharded_topk(queries: jax.Array, corpus: jax.Array, k: int, *,
                 mesh: Mesh, sizes: jax.Array, axis="data",
                 impl: str = "auto", tile: int = 1024, chunk: int = 65536):
    """Top-k over a row-sharded corpus.

    queries [B, D] replicated; corpus [N, D] sharded on rows over ``axis``
    — a single mesh axis name, or a tuple like ("dcn", "data") for
    multi-host meshes (parallel/mesh.make_multihost_mesh): the merge
    all-gather then spans DCN, carrying only the [devices, B, k] winners;
    sizes [devices] — live rows per shard (shards are padded to equal
    static shape). Returns (scores [B,k], global_ids [B,k]).
    """
    axes = axis if isinstance(axis, tuple) else (axis,)
    ndev = 1
    for a in axes:
        ndev *= mesh.shape[a]
    n = corpus.shape[0]
    assert n % ndev == 0
    shard_rows = n // ndev

    def local(q, c, sizes_local):
        my = jnp.int32(0)
        for a in axes:  # row-major linear index over the composite axis
            my = my * mesh.shape[a] + jax.lax.axis_index(a)
        size = sizes_local[0]
        kk = min(k, shard_rows)
        if impl == "pallas":
            interp = jax.default_backend() != "tpu"
            if shard_rows // tile >= 8 * kk:
                # Extraction-bound shard: fast 2-winner extraction with the
                # tau-bound rescan keeping per-shard results exact.
                s, i = pallas_topk_verified(q, c, kk, size=size, tile=tile,
                                            tile_k=2, interpret=interp)
            else:
                s, i = pallas_topk(q, c, kk, size=size, tile=tile,
                                   interpret=interp)
        elif impl == "chunked":
            s, i = chunked_topk(q, c, kk, size=size, chunk=chunk)
        else:
            s, i = exact_topk(q, c, kk, size=size)
        gid = i + my.astype(jnp.int32) * shard_rows
        # [B, kk] -> all-gather to [B, ndev*kk]; merge replicated.
        gs = jax.lax.all_gather(s, axis, axis=1, tiled=True)
        gi = jax.lax.all_gather(gid, axis, axis=1, tiled=True)
        top_s, pos = jax.lax.top_k(gs, k)
        top_i = jnp.take_along_axis(gi, pos, axis=1)
        return top_s, top_i

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis)),
        out_specs=(P(), P()), check_vma=False)
    return fn(queries, corpus, sizes)


class ShardedDenseIndex:
    """Dense index whose storage is row-sharded over the mesh data axis.

    Rows are round-robin assigned to shards so growth stays balanced; a
    [devices] ``sizes`` vector masks per-shard padding. Global ids encode
    (shard, slot) so results map straight back to document ids.
    """

    def __init__(self, dim: int, mesh: Mesh, capacity_block: int = 8192,
                 dtype=jnp.float32, tile: int = 1024, axis: str = "data"):
        self.dim = dim
        self.mesh = mesh
        self.axis = axis
        self.ndev = mesh.shape[axis]
        self.tile = tile
        self.dtype = dtype
        self.shard_capacity = max(
            tile, ((capacity_block + self.ndev - 1) // self.ndev + tile - 1)
            // tile * tile)
        self._sizes = np.zeros(self.ndev, np.int32)
        self._emb = jax.device_put(
            jnp.zeros((self.ndev * self.shard_capacity, dim), dtype),
            NamedSharding(mesh, P(axis, None)))
        # Persistent bidirectional id maps, maintained incrementally so a
        # search is O(B*k) host work regardless of corpus size:
        #   _rows_by_ext [size]          external id -> storage row
        #   _row_to_ext  [ndev*capacity] storage row -> external id (-1)
        self._rows_by_ext = np.zeros(0, np.int64)
        self._row_to_ext = np.full(self.ndev * self.shard_capacity, -1,
                                   np.int64)

    @property
    def size(self) -> int:
        return int(self._sizes.sum())

    def _grow(self) -> None:
        old = self._emb
        old_cap = self.shard_capacity
        new_cap = old_cap * 2
        grown = jnp.zeros((self.ndev, new_cap, self.dim), self.dtype)
        grown = grown.at[:, :old_cap].set(
            old.reshape(self.ndev, old_cap, self.dim))
        self._emb = jax.device_put(
            grown.reshape(self.ndev * new_cap, self.dim),
            NamedSharding(self.mesh, P(self.axis, None)))
        self.shard_capacity = new_cap
        # Storage rows moved: shard s's block now starts at s*new_cap.
        self._rows_by_ext = ((self._rows_by_ext // old_cap) * new_cap
                             + self._rows_by_ext % old_cap)
        self._row_to_ext = np.full(self.ndev * new_cap, -1, np.int64)
        self._row_to_ext[self._rows_by_ext] = np.arange(
            len(self._rows_by_ext))

    def _water_fill(self, n: int) -> np.ndarray:
        """Distribute n additions so shard sizes level out (bulk version
        of fill-the-least-loaded-first). Returns per-shard counts."""
        sizes = self._sizes.astype(np.int64)
        counts = np.zeros(self.ndev, np.int64)
        rem = n
        while rem > 0:
            mn = sizes.min()
            lows = np.flatnonzero(sizes == mn)
            higher = sizes[sizes > mn]
            level = higher.min() if higher.size else mn + rem
            take = min(rem, int(level - mn) * len(lows))
            per, extra = divmod(take, len(lows))
            add = np.full(len(lows), per, np.int64)
            add[:extra] += 1
            sizes[lows] += add
            counts[lows] += add
            rem -= take
        return counts

    def add(self, embeddings) -> np.ndarray:
        """Append embeddings [n, dim]; returns dense external ids."""
        emb = normalize(jnp.asarray(embeddings)).astype(self.dtype)
        n = emb.shape[0]
        ext_start = len(self._rows_by_ext)
        counts = self._water_fill(n)
        while (self._sizes + counts).max() > self.shard_capacity:
            self._grow()
        rows = np.concatenate([
            s * self.shard_capacity
            + np.arange(self._sizes[s], self._sizes[s] + counts[s],
                        dtype=np.int64)
            for s in range(self.ndev)])
        self._emb = self._emb.at[jnp.asarray(rows)].set(emb)
        self._sizes = (self._sizes + counts).astype(np.int32)
        ext = np.arange(ext_start, ext_start + n, dtype=np.int64)
        self._rows_by_ext = np.concatenate([self._rows_by_ext, rows])
        self._row_to_ext[rows] = ext
        return ext

    def bulk_build(self, embeddings, batch: int = 1 << 20) -> np.ndarray:
        """One-shot bulk load into an EMPTY index; returns external ids.

        ``add`` is an O(capacity) functional update per call — fine for
        incremental ingest, quadratic for whole-corpus construction. This
        lays the balanced shard layout out host-side in slabs (normalize +
        dtype cast per slab, so peak host memory is one slab above the
        final buffer) and ships it with ONE device_put. Capacity-scale
        builds (multi-GB, benchmarks/bench_sharded.py capacity mode) go
        from minutes of repeated buffer copies to one transfer.
        """
        if self.size:
            raise ValueError("bulk_build requires an empty index")
        n = int(embeddings.shape[0])
        counts = self._water_fill(n)  # empty index -> balanced split
        while counts.max() > self.shard_capacity:
            self._grow()
        cap = self.shard_capacity
        host = np.zeros((self.ndev * cap, self.dim),
                        np.dtype(self.dtype))
        rows = np.concatenate([
            s * cap + np.arange(counts[s], dtype=np.int64)
            for s in range(self.ndev)])
        for lo in range(0, n, batch):
            sl = np.asarray(embeddings[lo:lo + batch], np.float32)
            sl /= np.maximum(np.linalg.norm(sl, axis=1, keepdims=True),
                             1e-12)
            host[rows[lo:lo + batch]] = sl.astype(host.dtype)
        self._emb = jax.device_put(
            host, NamedSharding(self.mesh, P(self.axis, None)))
        self._sizes = counts.astype(np.int32)
        ext = np.arange(n, dtype=np.int64)
        self._rows_by_ext = rows
        self._row_to_ext[rows] = ext
        return ext

    def search(self, queries, k: int, impl: str = "auto"):
        q = normalize(jnp.atleast_2d(jnp.asarray(queries))).astype(jnp.float32)
        if self.size == 0 or q.shape[0] == 0:
            b = q.shape[0]
            return (np.full((b, k), -np.inf, np.float32),
                    np.full((b, k), -1, np.int64))
        kk = min(k, self.size)
        scores, rows = sharded_topk(
            q, self._emb, kk, mesh=self.mesh,
            sizes=jnp.asarray(self._sizes), axis=self.axis, impl=impl,
            tile=self.tile)
        scores, rows = np.asarray(scores), np.asarray(rows, np.int64)
        # Map storage rows -> external ids via the persistent inverse
        # array: O(B*k), independent of corpus size.
        ids = self._row_to_ext[np.clip(rows, 0, len(self._row_to_ext) - 1)]
        # Kernels mask dead rows with the FINITE sentinel NEG_INF=-1e30
        # (np.isfinite alone never fired); normalize them to the -inf /
        # id=-1 convention the other indexes use so consumers can keep
        # treating finite scores as valid hits.
        dead = (rows < 0) | (scores < NEG_INF / 2)
        ids = np.where(dead, np.int64(-1), ids)
        scores = np.where(dead, -np.inf, scores)
        if kk < k:
            pad = k - kk
            scores = np.pad(scores, ((0, 0), (0, pad)),
                            constant_values=-np.inf)
            ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        return scores.astype(np.float32), ids.astype(np.int64)
