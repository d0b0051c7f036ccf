"""Mesh-sharded IVF: cluster-partitioned storage + per-shard probe +
all-gather merge.

BASELINE.json config[4] is "a partitioned index sharded across a v5e-8
mesh" (the pgvector-IVFFlat analog, reference rag/document_store.py:
150-155). Composition of the two single-axis designs already in the tree:

  * clusters come from on-device spherical k-means (ops/kmeans.py), and
    WHOLE clusters are assigned to shards (greedy largest-first onto the
    least-loaded shard) so every probe window is shard-local — no
    cross-chip gathers at query time;
  * each chip runs the single-device IVF scan (index/ivf.py::_ivf_search)
    over its own clusters: centroid scores are masked to the shard's
    owned clusters, so the union of per-shard probes is a superset of the
    global top-nprobe plan (recall can only improve);
  * the per-shard top-k winners — a [devices, B, k] tensor — are
    all-gathered over ICI and re-top-k'd, identical to
    parallel/sharded_topk.py. Collective volume is O(devices * B * k),
    independent of N.

Row bookkeeping mirrors ShardedDenseIndex: a persistent storage-row ->
external-id array makes search host work O(B * k).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from optimized_rag_tpu.index.ivf import _ivf_search, _round_up
from optimized_rag_tpu.ops.kmeans import kmeans_assign, kmeans_fit
from optimized_rag_tpu.ops.similarity import normalize
from optimized_rag_tpu.ops.topk import NEG_INF


def partition_clusters(counts: np.ndarray, ndev: int) -> np.ndarray:
    """Greedy balanced partition: largest cluster first onto the
    least-loaded shard. Returns shard id per cluster."""
    shard_of = np.zeros(len(counts), np.int32)
    load = np.zeros(ndev, np.int64)
    for c in np.argsort(-counts, kind="stable"):
        s = int(np.argmin(load))
        shard_of[c] = s
        load[s] += int(counts[c])
    return shard_of


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "window", "npad", "mesh",
                              "axis"))
def _sharded_ivf_search(q, centroids, big_emb, starts, counts, owned,
                        k: int, nprobe: int, window: int, npad: int, *,
                        mesh: Mesh, axis: str):
    """q [B,D]; big_emb [ndev*npad, D] row-sharded; starts/counts/owned
    [ndev, C] sharded on dim 0. Returns (scores [B,k], rows [B,k]) where
    rows index big_emb storage."""

    def local(q_, emb_, starts_, counts_, owned_):
        my = jax.lax.axis_index(axis)
        s, slots = _ivf_search(q_, centroids, emb_, starts_[0], counts_[0],
                               k=k, nprobe=nprobe, window=window,
                               owned=owned_[0])
        rows = jnp.where(slots >= 0, slots + my.astype(jnp.int32) * npad,
                         -1)
        gs = jax.lax.all_gather(s, axis, axis=1, tiled=True)
        gr = jax.lax.all_gather(rows, axis, axis=1, tiled=True)
        top_s, pos = jax.lax.top_k(gs, k)
        top_r = jnp.take_along_axis(gr, pos, axis=1)
        return top_s, top_r

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None)),
        out_specs=(P(), P()), check_vma=False)
    return fn(q, big_emb, starts, counts, owned)


class ShardedIVFIndex:
    """Frozen cluster-pruned index partitioned over the mesh data axis.

    Like IVFIndex, built once over the current corpus; incremental adds
    belong in the exact index until the next rebuild (the policy layer
    unions result sets).
    """

    def __init__(self, mesh: Mesh, num_clusters: int = 1024,
                 nprobe: int = 64, kmeans_iters: int = 8, tile: int = 1024,
                 seed: int = 0, axis: str = "data"):
        self.mesh = mesh
        self.axis = axis
        self.ndev = mesh.shape[axis]
        self.num_clusters = num_clusters
        self.nprobe = nprobe
        self.kmeans_iters = kmeans_iters
        self.tile = tile
        self.seed = seed
        self.size = 0

    def build(self, embeddings, ids=None, storage_dtype=jnp.float32,
              train_sample: int = 1 << 21, balanced: bool = False,
              cap_factor: float = 1.15) -> None:
        emb = normalize(jnp.asarray(embeddings)).astype(storage_dtype)
        n, d = emb.shape
        c = min(self.num_clusters, max(self.ndev, n // 4))
        train = emb[: min(n, train_sample)].astype(jnp.float32)
        centroids, _ = kmeans_fit(train, c, iters=self.kmeans_iters,
                                  seed=self.seed)
        del train
        if balanced:  # equal-size clusters: smaller probe windows AND a
            # naturally balanced cluster->shard partition (index/ivf.py)
            from optimized_rag_tpu.ops.kmeans import balanced_assign
            cap = max(1, int(np.ceil(n / c * cap_factor)))
            assign = balanced_assign(emb, centroids, cap, chunk=1 << 16)
        else:
            assign = np.asarray(kmeans_assign(emb, centroids,
                                              chunk=1 << 20)[0])
        counts_c = np.bincount(assign, minlength=c).astype(np.int64)
        shard_of = partition_clusters(counts_c, self.ndev)

        # Shard-major, cluster-minor row layout.
        shard_ids = shard_of[assign]
        order = np.lexsort((assign, shard_ids))
        rows_per_shard = np.bincount(shard_ids, minlength=self.ndev)
        self._window = max(self.tile,
                           _round_up(int(counts_c.max() or 1), self.tile))
        npad = _round_up(int(rows_per_shard.max() or 1), self.tile) \
            + self._window
        self._npad = npad

        # Per-shard cluster tables: local start offsets; zero counts for
        # non-owned clusters (a stray probe then matches nothing).
        starts = np.zeros((self.ndev, c), np.int32)
        counts = np.zeros((self.ndev, c), np.int32)
        owned = np.zeros((self.ndev, c), bool)
        for s in range(self.ndev):
            mine = shard_of == s
            owned[s, mine] = counts_c[mine] > 0
            local_counts = np.where(mine, counts_c, 0)
            starts[s] = np.concatenate(
                [[0], np.cumsum(local_counts)[:-1]]).astype(np.int32)
            counts[s] = local_counts.astype(np.int32)

        # Stacked storage [ndev*npad, D], placed row-sharded on the mesh.
        sorted_emb = jnp.take(emb, jnp.asarray(order), axis=0)
        del emb
        big = jnp.zeros((self.ndev * npad, d), storage_dtype)
        offset = 0
        for s in range(self.ndev):
            rows_s = int(rows_per_shard[s])
            if rows_s:
                big = jax.lax.dynamic_update_slice(
                    big, jax.lax.dynamic_slice(
                        sorted_emb, (offset, 0), (rows_s, d)),
                    (s * npad, 0))
            offset += rows_s
        self._emb = jax.device_put(
            big, NamedSharding(self.mesh, P(self.axis, None)))
        self._centroids = centroids
        self._starts = jnp.asarray(starts)
        self._counts = jnp.asarray(counts)
        self._owned = jnp.asarray(owned)

        # Storage-row -> external-id map (O(B*k) search-side mapping).
        src_ids = (np.arange(n, dtype=np.int64) if ids is None
                   else np.asarray(ids, np.int64))
        dst = np.empty(n, np.int64)
        offset = 0
        for s in range(self.ndev):
            rows_s = int(rows_per_shard[s])
            dst[offset:offset + rows_s] = s * npad + np.arange(rows_s)
            offset += rows_s
        self._row_to_ext = np.full(self.ndev * npad, -1, np.int64)
        self._row_to_ext[dst] = src_ids[order]
        self.size = n
        self.num_clusters_built = c

    def search(self, queries, k: int, nprobe: int | None = None):
        """Returns (scores [B,k] f32, ids [B,k] int64; -1 = missing)."""
        assert self.size > 0, "build() first"
        q = normalize(jnp.atleast_2d(jnp.asarray(queries))) \
            .astype(jnp.float32)
        nprobe = min(nprobe or self.nprobe, self.num_clusters_built)
        kk = min(k, self.size)
        scores, rows = _sharded_ivf_search(
            q, self._centroids, self._emb, self._starts, self._counts,
            self._owned, k=kk, nprobe=nprobe, window=self._window,
            npad=self._npad, mesh=self.mesh, axis=self.axis)
        scores = np.asarray(scores)
        rows = np.asarray(rows, np.int64)
        ids = self._row_to_ext[np.clip(rows, 0, len(self._row_to_ext) - 1)]
        miss = (rows < 0) | (scores < NEG_INF / 2)
        out_s = np.where(miss, -np.inf, scores).astype(np.float32)
        out_i = np.where(miss, -1, ids)
        if kk < k:
            pad = k - kk
            out_s = np.pad(out_s, ((0, 0), (0, pad)),
                           constant_values=-np.inf)
            out_i = np.pad(out_i, ((0, 0), (0, pad)), constant_values=-1)
        return out_s, out_i
