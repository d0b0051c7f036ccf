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
