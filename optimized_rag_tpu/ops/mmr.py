"""Maximal Marginal Relevance diversification.

Replaces the reference's O(k*n) Python greedy loops
(rag/reranker.py:156-191, rag/nodes/helpers.py:226-256) with a jitted
greedy selection: the candidate similarity matrix is one matmul, and each
greedy step is a masked argmax over the fused MMR objective
``lambda*relevance - (1-lambda)*max_sim_to_selected``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from optimized_rag_tpu.ops.similarity import normalize

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("k",))
def mmr_select(embeddings: jax.Array, relevance: jax.Array, k: int,
               lam: float | jax.Array = 0.7,
               valid: jax.Array | None = None):
    """Greedy MMR over n candidates, selecting k.

    embeddings [n, d]; relevance [n] (higher = better); valid [n] bool mask
    for padded candidates. Returns (order [k] int32 indices into the
    candidate list, mmr_scores [k]); padded selections have index -1.
    """
    n = embeddings.shape[0]
    emb = normalize(embeddings).astype(jnp.float32)
    sim = jnp.dot(emb, emb.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)  # [n, n]
    rel = relevance.astype(jnp.float32)
    lam = jnp.asarray(lam, jnp.float32)
    if valid is None:
        valid = jnp.ones((n,), bool)

    def step(carry, _):
        selected_mask, max_sim_sel, any_sel = carry
        # Penalty is 0 until something is selected (first pick = pure
        # relevance, matching rag/reranker.py:166-170).
        penalty = jnp.where(any_sel, max_sim_sel, 0.0)
        score = lam * rel - (1.0 - lam) * penalty
        score = jnp.where(valid & ~selected_mask, score, NEG_INF)
        j = jnp.argmax(score).astype(jnp.int32)
        best = score[j]
        ok = best > NEG_INF / 2  # candidates remain
        j_out = jnp.where(ok, j, -1)
        selected_mask = selected_mask.at[j].set(
            jnp.where(ok, True, selected_mask[j]))
        max_sim_sel = jnp.where(ok, jnp.maximum(max_sim_sel, sim[j]),
                                max_sim_sel)
        return (selected_mask, max_sim_sel, any_sel | ok), (j_out, best)

    init = (jnp.zeros((n,), bool), jnp.full((n,), NEG_INF), jnp.asarray(False))
    _, (order, scores) = jax.lax.scan(step, init, None, length=k)
    return order, scores
