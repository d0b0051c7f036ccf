"""Dense embedding index: a padded, growable matrix of unit vectors.

TPU-native replacement for the pgvector ``document_chunks(embedding
vector(D))`` table and its HNSW/IVFFlat indexes
(reference: rag/document_store.py:125-236, 424-460).

Design for XLA static shapes (SURVEY.md §7 "hard parts"):
  * capacity is padded up in fixed blocks; ``size`` masks the tail, so adds
    never trigger recompilation until a (rare) capacity doubling.
  * deletes are tombstones: the row is zeroed (score contribution 0) and the
    id recorded host-side; searches oversample by the live tombstone count
    and filter, and ``compact()`` rebuilds densely — segment-merge style.
  * vectors are L2-normalized at add time so cosine == dot and search is a
    single fused matmul+top-k (ops/topk.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from optimized_rag_tpu.ops.similarity import normalize
from optimized_rag_tpu.ops.topk import dispatch_topk


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class DenseSearchResult:
    scores: np.ndarray   # [B, k] f32
    ids: np.ndarray      # [B, k] int64 (-1 for missing)


class DenseIndex:
    """Exact (brute-force, MXU-fused) dense index.

    Exact search is the recall gold standard (BASELINE.json config[0]); the
    IVF index (index/ivf.py) builds on the same storage for >1M vectors.
    """

    def __init__(self, dim: int, capacity_block: int = 65536,
                 dtype=jnp.float32, tile: int = 1024):
        self.dim = dim
        self.capacity_block = _round_up(capacity_block, tile)
        self.tile = tile
        self.dtype = dtype
        # int8 storage (ops/quantize.py): 4x less HBM than f32, with a
        # per-row f32 dequantization scale; searches scan quantized and
        # rescore candidates in f32 like the bf16 path.
        self.quantized = dtype == jnp.int8
        self.size = 0
        self._emb = jnp.zeros((self.capacity_block, dim), dtype)
        self._scale = (jnp.zeros((self.capacity_block,), jnp.float32)
                       if self.quantized else None)
        self._tombstones: set[int] = set()
        # Bumped whenever existing row->vector assignments change
        # (delete/compact): side caches keyed by row id (e.g. the
        # retriever's created-days cache) must rebuild when it moves.
        self.epoch = 0

    # ------------------------------------------------------------- mutation

    @property
    def capacity(self) -> int:
        return self._emb.shape[0]

    def _ensure_capacity(self, needed: int) -> None:
        if needed <= self.capacity:
            return
        new_cap = _round_up(needed, self.capacity_block)
        pad = jnp.zeros((new_cap - self.capacity, self.dim), self.dtype)
        if self.quantized:
            self._scale = jnp.concatenate(
                [self._scale,
                 jnp.zeros((new_cap - self.capacity,), jnp.float32)])
        self._emb = jnp.concatenate([self._emb, pad], axis=0)

    def add(self, embeddings) -> np.ndarray:
        """Append embeddings [n, dim]; returns their assigned int64 ids."""
        emb = jnp.asarray(embeddings)
        assert emb.ndim == 2 and emb.shape[1] == self.dim, emb.shape
        n = emb.shape[0]
        self._ensure_capacity(self.size + n)
        unit = normalize(emb.astype(jnp.float32))
        if self.quantized:
            from optimized_rag_tpu.ops.quantize import quantize_int8
            rows, scale = quantize_int8(unit)
            self._scale = jax.lax.dynamic_update_slice(
                self._scale, scale, (self.size,))
        else:
            rows = unit.astype(self.dtype)
        self._emb = jax.lax.dynamic_update_slice(
            self._emb, rows, (self.size, 0))
        ids = np.arange(self.size, self.size + n, dtype=np.int64)
        self.size += n
        return ids

    def delete(self, ids) -> None:
        """Tombstone rows; they stop matching after this call."""
        ids = np.asarray(ids, np.int64)
        live = [int(i) for i in ids if 0 <= i < self.size
                and i not in self._tombstones]
        if not live:
            return
        zeros = jnp.zeros((len(live), self.dim), self.dtype)
        self._emb = self._emb.at[jnp.asarray(live)].set(zeros)
        if self.quantized:
            self._scale = self._scale.at[jnp.asarray(live)].set(0.0)
        self._tombstones.update(live)
        self.epoch += 1

    def compact(self) -> np.ndarray:
        """Drop tombstoned rows; returns old_id -> new_id mapping (-1 gone)."""
        keep = np.array([i for i in range(self.size)
                         if i not in self._tombstones], np.int64)
        mapping = np.full(self.size, -1, np.int64)
        mapping[keep] = np.arange(len(keep))
        new_cap = max(self.capacity_block, _round_up(len(keep), self.tile))
        new_emb = jnp.zeros((new_cap, self.dim), self.dtype)
        if len(keep):
            new_emb = jax.lax.dynamic_update_slice(
                new_emb, self._emb[jnp.asarray(keep)], (0, 0))
        if self.quantized:
            new_scale = jnp.zeros((new_cap,), jnp.float32)
            if len(keep):
                new_scale = jax.lax.dynamic_update_slice(
                    new_scale, self._scale[jnp.asarray(keep)], (0,))
            self._scale = new_scale
        self._emb = new_emb
        self.size = len(keep)
        self._tombstones.clear()
        self.epoch += 1
        return mapping

    # --------------------------------------------------------------- search

    def embeddings(self) -> jax.Array:
        """The padded device matrix [capacity, dim] (rows >= size are 0).

        Raw storage: int8 codes in quantized mode — use ``vectors_f32``
        when real-valued vectors are needed (IVF builds, exports).
        """
        return self._emb

    @property
    def row_scale(self):
        """Per-row dequantization scales [capacity] (int8 mode), else
        None — pass straight to the ops' ``row_scale`` parameters."""
        return self._scale

    def vectors_f32(self, limit: int | None = None) -> jax.Array:
        """Float32 unit vectors [limit or size, dim] — dequantized in
        int8 mode, upcast otherwise."""
        stop = self.size if limit is None else limit
        rows = self._emb[:stop]
        if self.quantized:
            from optimized_rag_tpu.ops.quantize import dequantize_int8
            return dequantize_int8(rows, self._scale[:stop])
        return rows.astype(jnp.float32)

    def get(self, ids) -> jax.Array:
        rows = self._emb[jnp.asarray(np.asarray(ids, np.int64))]
        if self.quantized:
            from optimized_rag_tpu.ops.quantize import dequantize_int8
            return dequantize_int8(
                rows, self._scale[jnp.asarray(np.asarray(ids, np.int64))])
        return rows

    def _settle_certificate(self, q, scores, ids, kk):
        """Resolve a ``defer_certificate`` dispatch: ids fetched as np.

        The certified kernel appends an uncovered-count row (ids shape
        [B+1, kk]); checking it from the ids the caller fetches anyway
        saves one device->host round trip per search (VERDICT r2 weak #4).
        Nonzero count (rare cover overflow) -> certain-exact rerun.
        """
        b = q.shape[0]
        if ids.shape[0] == b:                 # plain exact path
            return np.asarray(scores), ids
        if int(ids[-1, 0]) == 0:              # certified exact
            return np.asarray(scores), ids[:-1]
        from optimized_rag_tpu.ops.topk import pallas_topk
        s2, i2 = pallas_topk(q, self._emb, kk, size=self.size,
                             tile=self.tile,
                             interpret=jax.default_backend() != "tpu",
                             row_scale=self._scale)
        return np.asarray(s2), np.asarray(i2)

    def search(self, queries, k: int, *, prefer_pallas=None,
               approx_tile_k: int | None = None) -> DenseSearchResult:
        """Fused top-k over live rows. queries [B, dim] (any scale).

        Exact by default (dispatch_topk routes large corpora through the
        tau-verified fast kernel). ``approx_tile_k`` opts into unverified
        approximate extraction — see ops/topk.dispatch_topk.
        """
        q = normalize(jnp.atleast_2d(jnp.asarray(queries)))
        if self.size == 0:
            b = q.shape[0]
            return DenseSearchResult(np.full((b, k), -np.inf, np.float32),
                                     np.full((b, k), -1, np.int64))
        # Oversample past tombstones (zeroed rows score 0.0 and could
        # otherwise crowd out genuinely-negative matches).
        slack = min(len(self._tombstones), max(0, self.size - k))
        kk = min(k + slack, self.size)
        if self.quantized:
            # int8 scan (quarter the f32 HBM read) + dequantized f32
            # rescore of a 4x-oversampled candidate set. dispatch_topk
            # threads the scales into every kernel (incl. the packed
            # certified path for large corpora).
            from optimized_rag_tpu.ops.topk import rescore_topk
            cc = min(4 * kk, self.size)
            c_s, cand = dispatch_topk(q, self._emb, cc, size=self.size,
                                      prefer_pallas=prefer_pallas,
                                      tile=self.tile,
                                      approx_tile_k=approx_tile_k,
                                      defer_certificate=True,
                                      row_scale=self._scale)
            _, cand = self._settle_certificate(q, c_s, np.asarray(cand),
                                               cc)
            scores, ids = rescore_topk(q, self._emb, jnp.asarray(cand),
                                       kk, row_scale=self._scale)
            scores, ids = np.asarray(scores), np.asarray(ids, np.int64)
        elif self.dtype == jnp.bfloat16 and self.size > 4 * kk:
            # bf16 storage (half the HBM read): oversample 4x in the fast
            # low-precision pass, then rescore candidates with float32
            # accumulation — measured recall 1.0 vs the f32 oracle
            # (docs/RESULTS_r1.md kernel-level options).
            from optimized_rag_tpu.ops.topk import rescore_topk
            c_s, cand = dispatch_topk(q, self._emb, 4 * kk, size=self.size,
                                      prefer_pallas=prefer_pallas,
                                      tile=self.tile,
                                      approx_tile_k=approx_tile_k,
                                      defer_certificate=True)
            _, cand = self._settle_certificate(q, c_s, np.asarray(cand),
                                               4 * kk)
            scores, ids = rescore_topk(q, self._emb, jnp.asarray(cand), kk)
            scores, ids = np.asarray(scores), np.asarray(ids, np.int64)
        else:
            scores, ids = dispatch_topk(q, self._emb, kk, size=self.size,
                                        prefer_pallas=prefer_pallas,
                                        tile=self.tile,
                                        approx_tile_k=approx_tile_k,
                                        defer_certificate=True)
            scores, ids = self._settle_certificate(q, scores,
                                                   np.asarray(ids), kk)
            ids = ids.astype(np.int64)
        if self._tombstones or kk > k:
            out_s = np.full((scores.shape[0], k), -np.inf, np.float32)
            out_i = np.full((scores.shape[0], k), -1, np.int64)
            for r in range(scores.shape[0]):
                cols = [c for c in range(kk)
                        if ids[r, c] >= 0 and
                        int(ids[r, c]) not in self._tombstones][:k]
                out_s[r, :len(cols)] = scores[r, cols]
                out_i[r, :len(cols)] = ids[r, cols]
            return DenseSearchResult(out_s, out_i)
        return DenseSearchResult(scores, ids)

    def search_tail(self, queries, k: int, from_row: int
                    ) -> DenseSearchResult:
        """Exact search restricted to rows [from_row, size) — the segment
        added since an ANN index was last built. The policy layer unions
        this with the ANN candidates so freshness never costs recall."""
        q = normalize(jnp.atleast_2d(jnp.asarray(queries)))
        b = q.shape[0]
        n_tail = self.size - from_row
        if n_tail <= 0:
            return DenseSearchResult(
                np.full((b, k), -np.inf, np.float32),
                np.full((b, k), -1, np.int64))
        start = (from_row // self.tile) * self.tile  # tile-aligned slice
        tail = jax.lax.dynamic_slice(
            self._emb, (start, 0),
            (_round_up(self.size - start, self.tile), self.dim))
        # Oversample by the alignment slack so pre-from_row rows caught by
        # the tile-aligned slice cannot crowd out genuine tail rows.
        kk = min(k + (from_row - start), self.size - start)
        if self.quantized:
            from optimized_rag_tpu.ops.topk import chunked_topk
            tail_scale = jax.lax.dynamic_slice(
                self._scale, (start,), (tail.shape[0],))
            scores, ids = chunked_topk(q, tail, kk, size=self.size - start,
                                       row_scale=tail_scale)
        else:
            scores, ids = dispatch_topk(q, tail, kk, size=self.size - start,
                                        tile=self.tile)
        scores = np.asarray(scores)
        ids = np.asarray(ids, np.int64) + start
        valid = (ids >= from_row) & (ids < self.size) & np.isfinite(scores)
        out_s = np.full((b, k), -np.inf, np.float32)
        out_i = np.full((b, k), -1, np.int64)
        for r in range(b):
            cols = np.flatnonzero(valid[r])[:k]
            out_s[r, :len(cols)] = scores[r, cols]
            out_i[r, :len(cols)] = ids[r, cols]
        return DenseSearchResult(out_s, out_i)

    # ------------------------------------------------------------- snapshot

    def state_dict(self) -> dict:
        state = {
            "dim": self.dim, "size": self.size, "tile": self.tile,
            "capacity_block": self.capacity_block,
            "dtype": str(jnp.zeros((), self.dtype).dtype),
            "embeddings": np.asarray(self._emb[:self.size]),
            "tombstones": np.array(sorted(self._tombstones), np.int64),
        }
        if self.quantized:
            state["scale"] = np.asarray(self._scale[:self.size])
        return state

    @classmethod
    def from_state_dict(cls, state: dict) -> "DenseIndex":
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
                 "float16": jnp.float16, "int8": jnp.int8}[str(state["dtype"])]
        idx = cls(int(state["dim"]), int(state["capacity_block"]),
                  dtype, int(state["tile"]))
        emb = state["embeddings"]
        if len(emb):
            idx._ensure_capacity(len(emb))
            idx._emb = jax.lax.dynamic_update_slice(
                idx._emb, jnp.asarray(emb, idx.dtype), (0, 0))
            if idx.quantized:
                idx._scale = jax.lax.dynamic_update_slice(
                    idx._scale, jnp.asarray(state["scale"], jnp.float32),
                    (0,))
            idx.size = len(emb)
        idx._tombstones = set(int(i) for i in state.get("tombstones", []))
        return idx
