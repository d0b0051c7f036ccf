"""BM25 lexical scoring on TPU via impact-ordered champion lists.

The reference rebuilds a ``rank_bm25.BM25Okapi`` object over the whole
corpus **per query** (rag/retrieval.py:324-347) — O(corpus) CPU work per
call. Sparse CSR traversal is TPU-hostile (dynamic lengths, scalar
gathers), so the TPU-native design uses the classic *champion list*
(impact-ordered postings) layout:

  For every vocabulary term we keep the top ``cap`` documents by term
  frequency as dense padded arrays ``champ_docs [V, cap] int32`` and
  ``champ_tf [V, cap] float32`` (built once at index time,
  index/lexical.py). Scoring a query = gather the rows for its (few) query
  terms, compute the BM25 contribution of every posting on the VPU, and
  scatter-add into a dense [N] score accumulator — then a fused top-k.

This is exact whenever every query term's document frequency <= cap, and a
principled impact-based approximation beyond that (high-df terms carry the
lowest idf). Tests verify exactness against a NumPy oracle with cap >= max
document frequency.

BM25:  idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * len_d / avg_len))
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def bm25_score_champions(query_terms: jax.Array, query_valid: jax.Array,
                         champ_docs: jax.Array, champ_tf: jax.Array,
                         champ_valid: jax.Array, idf: jax.Array,
                         doc_len: jax.Array, avg_len: jax.Array,
                         k1: float = 1.5, b: float = 0.75) -> jax.Array:
    """Dense BM25 score vector for one query.

    query_terms [Q] int32 term ids (padded), query_valid [Q] bool;
    champ_docs/champ_tf/champ_valid [V, cap]; idf [V] f32; doc_len [N] f32.
    Returns scores [N] f32 (0 for unmatched docs).
    """
    n = doc_len.shape[0]
    q = jnp.where(query_valid, query_terms, 0)
    docs = champ_docs[q]                       # [Q, cap]
    tf = champ_tf[q].astype(jnp.float32)       # [Q, cap]
    pvalid = champ_valid[q] & query_valid[:, None]
    term_idf = idf[q].astype(jnp.float32)[:, None]

    safe_docs = jnp.where(pvalid, docs, 0)
    dlen = doc_len[safe_docs].astype(jnp.float32)
    denom = tf + k1 * (1.0 - b + b * dlen / jnp.maximum(avg_len, 1e-6))
    contrib = term_idf * tf * (k1 + 1.0) / jnp.maximum(denom, 1e-9)
    contrib = jnp.where(pvalid, contrib, 0.0)

    acc = jnp.zeros((n,), jnp.float32)
    return acc.at[safe_docs.reshape(-1)].add(contrib.reshape(-1))


@functools.partial(jax.jit, static_argnames=("k",))
def bm25_topk(query_terms, query_valid, champ_docs, champ_tf, champ_valid,
              idf, doc_len, avg_len, k: int, size=None,
              k1: float = 1.5, b: float = 0.75):
    """BM25 scores fused with top-k selection. Returns (scores[k], ids[k])."""
    scores = bm25_score_champions(query_terms, query_valid, champ_docs,
                                  champ_tf, champ_valid, idf, doc_len,
                                  avg_len, k1=k1, b=b)
    if size is not None:
        n = scores.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        scores = jnp.where(row < size, scores, -jnp.inf)
    return jax.lax.top_k(scores, k)


@jax.jit
def bm25_idf(doc_freq: jax.Array, num_docs: jax.Array) -> jax.Array:
    """Okapi BM25 idf: ln((N - df + 0.5)/(df + 0.5) + 1)."""
    df = doc_freq.astype(jnp.float32)
    n = jnp.asarray(num_docs, jnp.float32)
    return jnp.log((n - df + 0.5) / (df + 0.5) + 1.0)
