"""Score fusion kernels: RRF, weighted hybrid blending, temporal decay.

Replaces the reference's Python dict/loop fusion:
  * hybrid score = alpha*semantic + beta*bm25 + gamma*temporal with
    per-intent weight tables (rag/retrieval.py:294-322, :22-47)
  * reciprocal rank fusion  score = sum 1/(rrf_k + rank)
    (rag/reranker.py:239-271)
  * exponential recency decay 0.5^(age_days / half_life)
    (rag/retrieval.py:283)
  * rerank blend 0.7*new + 0.3*orig (rag/reranker.py:77)

All operate on aligned score tensors; adaptive weights arrive as a device
array so the DW-GRPO learner (engine/adaptive.py) feeds straight in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@jax.jit
def minmax_normalize(scores: jax.Array, valid: jax.Array | None = None,
                     eps: float = 1e-9) -> jax.Array:
    """Min-max normalize along the last axis, ignoring invalid entries."""
    s = scores.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones_like(s, dtype=bool)
    lo = jnp.min(jnp.where(valid, s, jnp.inf), axis=-1, keepdims=True)
    hi = jnp.max(jnp.where(valid, s, -jnp.inf), axis=-1, keepdims=True)
    out = (s - lo) / jnp.maximum(hi - lo, eps)
    # Degenerate range (single candidate / all-equal scores): neutral 0.5
    # rather than collapsing every score to 0.
    out = jnp.where(hi - lo < eps, 0.5, out)
    return jnp.where(valid, out, 0.0)


@jax.jit
def weighted_fusion(score_stack: jax.Array, weights: jax.Array,
                    valid: jax.Array | None = None) -> jax.Array:
    """Blend S aligned score channels.

    score_stack [S, ...candidates], weights [S] (need not be normalized;
    they are re-normalized here like adaptive_weights.py:416-421). Each
    channel is min-max normalized before blending so heterogeneous score
    scales (cosine vs BM25 vs decay) compose.
    """
    w = weights.astype(jnp.float32)
    w = w / jnp.maximum(jnp.sum(w), 1e-9)
    normed = jax.vmap(lambda s: minmax_normalize(s, valid))(score_stack)
    return jnp.einsum("s...,s->...", normed, w)


@functools.partial(jax.jit, static_argnames=("k_out", "num_candidates"))
def rrf_fuse(indices_lists: jax.Array, valid: jax.Array, k_out: int,
             rrf_k: float = 60.0, num_candidates: int | None = None):
    """Reciprocal-rank fusion over L ranked lists of document ids.

    indices_lists [L, K] int32 global doc ids (rank = position), valid [L, K]
    bool. Fuses by scattering 1/(rrf_k + rank + 1) into a dense id-space
    accumulator sized to the max id seen (callers pass ``num_candidates`` =
    corpus capacity for a static shape), then takes top ``k_out``.

    Returns (fused_scores [k_out], doc_ids [k_out]).
    """
    l, k = indices_lists.shape
    n = num_candidates
    assert n is not None, "num_candidates (static corpus capacity) required"
    rank = jax.lax.broadcasted_iota(jnp.int32, (l, k), 1)
    contrib = jnp.where(valid, 1.0 / (rrf_k + rank.astype(jnp.float32) + 1.0),
                        0.0)
    safe_ids = jnp.where(valid, indices_lists, 0)
    acc = jnp.zeros((n,), jnp.float32).at[safe_ids.reshape(-1)].add(
        jnp.where(valid, contrib, 0.0).reshape(-1))
    scores, ids = jax.lax.top_k(acc, k_out)
    return scores, ids


@jax.jit
def temporal_decay(age_days: jax.Array, half_life_days: float | jax.Array
                   ) -> jax.Array:
    """Exponential recency boost: 0.5 ** (age / half_life).

    Mirrors rag/retrieval.py:283; vectorized over candidates.
    """
    return jnp.exp2(-age_days.astype(jnp.float32) /
                    jnp.asarray(half_life_days, jnp.float32))


@jax.jit
def blend_rerank(new_scores: jax.Array, orig_scores: jax.Array,
                 blend_original: float = 0.3) -> jax.Array:
    """Reranker blend: (1-b)*new + b*original (rag/reranker.py:77)."""
    return ((1.0 - blend_original) * new_scores.astype(jnp.float32)
            + blend_original * orig_scores.astype(jnp.float32))
