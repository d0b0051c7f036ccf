"""On-device k-means for IVF centroid training.

Replaces the pgvector index build (``CREATE INDEX ... ivfflat (lists=N)``,
rag/document_store.py:150-155) with Lloyd iterations that run entirely on
TPU: assignment is a fused matmul+argmax, the centroid update is a
segment-sum, and empty clusters are reseeded from the points farthest from
their centroid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from optimized_rag_tpu.ops.similarity import normalize


@functools.partial(jax.jit, static_argnames=())
def _assign_chunk(pts: jax.Array, c_norm: jax.Array):
    sims = jnp.dot(pts.astype(jnp.float32), c_norm.T,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return (jnp.argmax(sims, axis=1).astype(jnp.int32),
            jnp.max(sims, axis=1))


def kmeans_assign(points: jax.Array, centroids: jax.Array,
                  chunk: int = 65536):
    """Assign each point to its nearest centroid (cosine / dot metric).

    points [N, D] (normalized, any float dtype incl. bfloat16 storage),
    centroids [C, D]. Returns (assignment [N] int32, best_sim [N] f32).
    Host-chunked over N so only one chunk is ever cast to float32 at a
    time — a full-matrix cast would double HBM use at 10M scale.
    """
    n, _ = points.shape
    c_norm = normalize(centroids).astype(jnp.float32)
    if n <= chunk:
        return _assign_chunk(points, c_norm)
    parts_a, parts_s = [], []
    for lo in range(0, n, chunk):
        size = min(chunk, n - lo)
        a, s = _assign_chunk(
            jax.lax.dynamic_slice_in_dim(points, lo, size, axis=0), c_norm)
        parts_a.append(a)
        parts_s.append(s)
    return jnp.concatenate(parts_a), jnp.concatenate(parts_s)


@functools.partial(jax.jit, static_argnames=("t",))
def _assign_topt_chunk(pts: jax.Array, c_norm: jax.Array, t: int):
    sims = jnp.dot(pts.astype(jnp.float32), c_norm.T,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    s, i = jax.lax.top_k(sims, t)
    return i.astype(jnp.int32), s


def balanced_assign(points: jax.Array, centroids: jax.Array, cap: int,
                    top: int = 8, chunk: int = 65536):
    """Capacity-capped cluster assignment (balanced IVF).

    Each point goes to its best-affinity centroid whose cluster still has
    room (greedy, rank-round robin over each point's top-``top`` choices;
    stragglers fill the least-loaded clusters). Equal-size clusters make
    every IVF probe window exactly ceil(N/C) rows instead of the max
    cluster size (~4x the mean on clustered data) — the round-1 reason
    windowed probes lost to streaming brute force.

    Returns assignment [N] int32 with bincount(assign) <= cap.
    """
    import numpy as np
    n = points.shape[0]
    c = centroids.shape[0]
    assert cap * c >= n, (cap, c, n)
    c_norm = normalize(centroids).astype(jnp.float32)
    ch_i, ch_s = [], []
    for lo in range(0, n, chunk):
        size = min(chunk, n - lo)
        i, s = _assign_topt_chunk(
            jax.lax.dynamic_slice_in_dim(points, lo, size, axis=0),
            c_norm, min(top, c))
        ch_i.append(np.asarray(i))
        ch_s.append(np.asarray(s))
    choices = np.concatenate(ch_i)          # [N, T]
    scores = np.concatenate(ch_s)           # [N, T]
    assign = np.full(n, -1, np.int64)
    load = np.zeros(c, np.int64)
    for r in range(choices.shape[1]):
        un = np.flatnonzero(assign < 0)
        if not len(un):
            break
        cc = choices[un, r].astype(np.int64)
        ss = scores[un, r]
        order = np.lexsort((-ss, cc))       # by cluster, best first
        un_o, c_o = un[order], cc[order]
        # rank within each cluster run
        starts = np.r_[0, np.flatnonzero(np.diff(c_o)) + 1]
        run_len = np.diff(np.r_[starts, len(c_o)])
        rank = np.arange(len(c_o)) - np.repeat(starts, run_len)
        take = rank < (cap - load)[c_o]
        assign[un_o[take]] = c_o[take]
        load += np.bincount(c_o[take], minlength=c)
    un = np.flatnonzero(assign < 0)
    if len(un):  # stragglers: round-robin into remaining room
        room_ids = np.repeat(np.arange(c), np.maximum(cap - load, 0))
        assign[un] = room_ids[: len(un)]
    return assign.astype(np.int32)


@functools.partial(jax.jit, static_argnames=("num_clusters", "iters"))
def kmeans_fit(points: jax.Array, num_clusters: int, iters: int = 12,
               seed: int = 0, valid: jax.Array | None = None):
    """Spherical k-means (cosine metric) on normalized points [N, D].

    Returns (centroids [C, D] f32 normalized, assignment [N] int32).
    ``valid`` masks padded rows; invalid rows are assigned cluster 0 but do
    not influence centroids.
    """
    n, d = points.shape
    pts = normalize(points).astype(jnp.float32)
    if valid is None:
        valid = jnp.ones((n,), bool)
    key = jax.random.PRNGKey(seed)
    # Init: random valid points (sampling with replacement is fine at scale).
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    init_idx = jax.random.choice(key, n, (num_clusters,), p=probs)
    centroids = pts[init_idx]

    def lloyd(carry, _):
        cents, key = carry
        assign, best = _assign_chunk(pts, normalize(cents).astype(
            jnp.float32))
        assign = jnp.where(valid, assign, num_clusters)  # park invalid rows
        w = valid.astype(jnp.float32)
        sums = jnp.zeros((num_clusters + 1, d), jnp.float32).at[assign].add(
            pts * w[:, None])
        counts = jnp.zeros((num_clusters + 1,), jnp.float32).at[assign].add(w)
        sums, counts = sums[:num_clusters], counts[:num_clusters]
        new_cents = sums / jnp.maximum(counts[:, None], 1e-6)
        # Reseed empty clusters from the worst-fitting points.
        key, sub = jax.random.split(key)
        worst = jnp.argsort(jnp.where(valid, best, jnp.inf))[:num_clusters]
        empty = counts < 0.5
        new_cents = jnp.where(empty[:, None], pts[worst], new_cents)
        return (normalize(new_cents), key), None

    (centroids, _), _ = jax.lax.scan(lloyd, (centroids, key), None,
                                     length=iters)
    assign, _ = _assign_chunk(pts, centroids)
    assign = jnp.where(valid, assign, 0)
    return centroids, assign
