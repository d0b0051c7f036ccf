"""IVF (inverted-file) cluster-pruned dense index.

TPU-native replacement for pgvector's ``ivfflat`` index
(reference: rag/document_store.py:150-155, lists=100). Centroids are
trained on-device with spherical k-means (ops/kmeans.py); embeddings are
stored *cluster-sorted* in one flat [N, D] matrix so probing a cluster is a
contiguous dynamic-slice window — no scatter/gather of rows at query time.

Query plan (all on device, one jit):
  1. score query against centroids, take top-``nprobe`` clusters
  2. ``lax.scan`` over probed clusters: dynamic-slice a [window, D] block,
     fused matmul + mask (positions outside the cluster range), merge into
     a running top-k
  3. map slot positions back to caller ids through the sort permutation

The window is the max cluster size rounded to the tile; recall vs the exact
oracle is measured in tests and by bench.py (BASELINE.json config[4] gate:
recall@10 >= exact baseline at matched latency budget).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from optimized_rag_tpu.ops.kmeans import (
    balanced_assign, kmeans_assign, kmeans_fit)
from optimized_rag_tpu.ops.similarity import normalize
from optimized_rag_tpu.ops.topk import NEG_INF


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "window"))
def _ivf_search(q, centroids, sorted_emb, starts, counts, k: int,
                nprobe: int, window: int, owned=None):
    """q [B,D] normalized; sorted_emb [Npad, D]; starts/counts [C].

    ``owned`` [C] bool restricts probing to a cluster subset (the
    mesh-sharded composition masks each shard to its own clusters —
    parallel/sharded_ivf.py); None probes everything.

    Returns (scores [B,k], slots [B,k]) where slots index sorted_emb rows.
    """
    b = q.shape[0]
    npad = sorted_emb.shape[0]
    cent_scores = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)   # [B, C]
    if owned is not None:
        cent_scores = jnp.where(owned[None, :], cent_scores, NEG_INF)
    _, probe = jax.lax.top_k(cent_scores, nprobe)                # [B, nprobe]

    def scan_probe(carry, p):
        best_s, best_i = carry
        start = starts[probe[:, p]]                              # [B]
        count = counts[probe[:, p]]                              # [B]
        start_cl = jnp.minimum(start, npad - window)

        def per_query(qi, s0, s_real, cnt):
            block = jax.lax.dynamic_slice(
                sorted_emb, (s0, 0), (window, sorted_emb.shape[1]))
            s = jnp.dot(block.astype(jnp.float32), qi,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)     # [window]
            pos = s0 + jax.lax.broadcasted_iota(jnp.int32, (window, 1),
                                                0).squeeze(-1)
            valid = (pos >= s_real) & (pos < s_real + cnt)
            return jnp.where(valid, s, NEG_INF), pos

        s, pos = jax.vmap(per_query)(q, start_cl, start, count)  # [B, window]
        cand_s = jnp.concatenate([best_s, s], axis=1)
        cand_i = jnp.concatenate([best_i, pos], axis=1)
        top_s, sel = jax.lax.top_k(cand_s, k)
        top_i = jnp.take_along_axis(cand_i, sel, axis=1)
        return (top_s, top_i), None

    init = (jnp.full((b, k), NEG_INF), jnp.full((b, k), -1, jnp.int32))
    (scores, slots), _ = jax.lax.scan(
        scan_probe, init, jnp.arange(nprobe, dtype=jnp.int32))
    return scores, slots


class IVFIndex:
    """Cluster-pruned index built from a frozen set of embeddings.

    Build once over the current corpus (like ``CREATE INDEX``); incremental
    adds go to the exact DenseIndex until the next rebuild — the engine
    unions both result sets, so freshness never costs recall.
    """

    def __init__(self, num_clusters: int = 1024, nprobe: int = 64,
                 kmeans_iters: int = 12, tile: int = 1024, seed: int = 0):
        self.num_clusters = num_clusters
        self.nprobe = nprobe
        self.kmeans_iters = kmeans_iters
        self.tile = tile
        self.seed = seed
        self.size = 0
        self._centroids = None      # [C, D]
        self._sorted_emb = None     # [Npad, D] cluster-sorted
        self._starts = None         # [C] int32 slot offsets
        self._counts = None         # [C] int32
        self._perm = None           # [N] slot -> original id (np.int64)
        self._window = 0

    def build(self, embeddings, ids=None, storage_dtype=jnp.float32,
              train_sample: int = 1 << 21, balanced: bool = False,
              cap_factor: float = 1.15) -> None:
        """Train centroids and lay out cluster-sorted storage.

        embeddings [N, D] (unnormalized ok); ids [N] original doc ids
        (defaults to arange). ``storage_dtype=jnp.bfloat16`` halves HBM
        (mandatory at 10M x 128+ on a 16 GB chip). Centroids train on the
        first ``train_sample`` rows (standard IVF practice — Lloyd on the
        full corpus would also need a full float32 copy); assignment of
        the full corpus is chunked.

        ``balanced=True`` caps clusters at cap_factor*ceil(N/C) via
        affinity-greedy reassignment (ops/kmeans.balanced_assign), so the
        probe window is ~the MEAN cluster size instead of the max (~4x
        smaller on clustered data) — the difference between windowed
        probes losing to and beating streaming brute force. Displaced
        points sit in near-best clusters; recover recall with a slightly
        higher nprobe (measured in benchmarks/bench_sharded.py).
        """
        emb = normalize(jnp.asarray(embeddings)).astype(storage_dtype)
        n, d = emb.shape
        c = min(self.num_clusters, max(1, n // 4))
        train = emb[: min(n, train_sample)].astype(jnp.float32)
        centroids, _ = kmeans_fit(train, c, iters=self.kmeans_iters,
                                  seed=self.seed)
        del train
        if balanced:
            cap = max(1, int(np.ceil(n / c * cap_factor)))
            # Small chunks: top_k is a custom call XLA cannot fuse into the
            # matmul, so the [chunk, C] sims matrix materializes (1 GB at
            # 64k x 4096 f32; a 1M chunk would OOM the chip).
            assign = balanced_assign(emb, centroids, cap, chunk=1 << 16)
            window_round = 128  # window ~= cap, not tile-rounded
        else:
            assign, _ = kmeans_assign(emb, centroids, chunk=1 << 20)
            assign = np.asarray(assign)       # [n] int32 — small
            window_round = self.tile
        order = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=c).astype(np.int32)
        starts = np.zeros(c, np.int32)
        starts[1:] = np.cumsum(counts)[:-1]
        self._window = max(window_round,
                           _round_up(int(counts.max() or 1), window_round))
        npad = _round_up(n, self.tile) + self._window  # slack for clamping
        # Cluster-sort ON DEVICE: a host round trip of the full matrix
        # (2x n*d floats) dwarfs everything else at 10M scale.
        sorted_emb = jnp.take(emb, jnp.asarray(order), axis=0)
        del emb
        pad = jnp.zeros((npad - n, d), storage_dtype)
        self._sorted_emb = jnp.concatenate([sorted_emb, pad], axis=0)
        self._centroids = centroids
        self._starts = jnp.asarray(starts)
        self._counts = jnp.asarray(counts)
        src_ids = (np.arange(n, dtype=np.int64) if ids is None
                   else np.asarray(ids, np.int64))
        self._perm = src_ids[order]
        self.size = n
        self.num_clusters_built = c

    def search(self, queries, k: int, nprobe: int | None = None):
        """Returns (scores [B,k] np.f32, ids [B,k] np.int64; -1 missing)."""
        assert self._sorted_emb is not None, "build() first"
        q = normalize(jnp.atleast_2d(jnp.asarray(queries))).astype(jnp.float32)
        nprobe = min(nprobe or self.nprobe, self.num_clusters_built)
        scores, slots = _ivf_search(
            q, self._centroids, self._sorted_emb, self._starts, self._counts,
            k=min(k, self.size), nprobe=nprobe, window=self._window)
        scores = np.asarray(scores)
        slots = np.asarray(slots)
        ids = np.where(slots >= 0, self._perm[np.clip(slots, 0, self.size - 1)],
                       -1)
        miss = scores < NEG_INF / 2
        out_s = np.where(miss, -np.inf, scores).astype(np.float32)
        out_i = np.where(miss, -1, ids)
        if out_s.shape[1] < k:  # pad when corpus smaller than k
            pad = k - out_s.shape[1]
            out_s = np.pad(out_s, ((0, 0), (0, pad)),
                           constant_values=-np.inf)
            out_i = np.pad(out_i, ((0, 0), (0, pad)), constant_values=-1)
        return out_s, out_i

    def state_dict(self) -> dict:
        return {
            "num_clusters": self.num_clusters, "nprobe": self.nprobe,
            "kmeans_iters": self.kmeans_iters, "tile": self.tile,
            "seed": self.seed, "size": self.size, "window": self._window,
            "num_clusters_built": getattr(self, "num_clusters_built", 0),
            "centroids": np.asarray(self._centroids),
            "sorted_emb": np.asarray(self._sorted_emb),
            "starts": np.asarray(self._starts),
            "counts": np.asarray(self._counts),
            "perm": self._perm,
        }

    @classmethod
    def from_state_dict(cls, s: dict) -> "IVFIndex":
        idx = cls(int(s["num_clusters"]), int(s["nprobe"]),
                  int(s["kmeans_iters"]), int(s["tile"]), int(s["seed"]))
        idx.size = int(s["size"])
        idx._window = int(s["window"])
        idx.num_clusters_built = int(s["num_clusters_built"])
        idx._centroids = jnp.asarray(s["centroids"])
        idx._sorted_emb = jnp.asarray(s["sorted_emb"])
        idx._starts = jnp.asarray(s["starts"])
        idx._counts = jnp.asarray(s["counts"])
        idx._perm = np.asarray(s["perm"], np.int64)
        return idx
