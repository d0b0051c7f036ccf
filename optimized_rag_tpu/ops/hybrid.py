"""Fused hybrid-query kernels: minimize host<->device round trips.

The hybrid path (engine/retriever.py) logically needs: dense top-k, BM25
top-k, candidate gather, temporal decay, weighted fusion. Dispatched
separately that is ~5 host<->device round trips per query — and in
deployments where the host reaches the TPU over a network hop, RTT
dominates per-query latency. These two kernels collapse the path to 2:

  dual_topk        one jit: fused dense matmul+top-k AND champion-list
                   BM25 top-k (independent compute, shared dispatch)
  fuse_candidates  one jit: gather candidate embeddings, exact semantic
                   re-score, temporal decay, per-channel min-max
                   normalization, weighted blend, final top-k

Semantics match the unfused path (channel normalization over the
candidate union) — parity-tested in tests/test_ops_hybrid.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from optimized_rag_tpu.ops.bm25 import bm25_score_champions
from optimized_rag_tpu.ops.fusion import minmax_normalize, temporal_decay
from optimized_rag_tpu.ops.topk import NEG_INF, exact_topk


@functools.partial(jax.jit, static_argnames=("k",))
def dual_topk(q_emb, corpus, size, q_terms, q_valid, champ_docs, champ_tf,
              champ_valid, idf, doc_len, avg_len, k: int,
              k1: float = 1.5, b: float = 0.75, row_scale=None):
    """One dispatch for both retrieval channels.

    Returns (dense_s [B,k], dense_i [B,k], bm25_s [k], bm25_i [k]).
    q_emb [B,D] normalized; BM25 args as in ops/bm25.py. ``row_scale``
    [N] dequantizes an int8 corpus's scores (ops/quantize.py).
    """
    # ids ride back as float32 in the packed buffer below; float32 is only
    # exact for integers < 2^24, so refuse corpora past that (checked at
    # trace time — the shape is static). Larger corpora belong in
    # ShardedDenseIndex / IVF, not this single-dispatch path.
    assert corpus.shape[0] < (1 << 24), (
        f"dual_topk id packing is exact only below 2^24 rows; "
        f"got {corpus.shape[0]}")
    if row_scale is not None:
        # Keep the int8 corpus int8-resident: exact_topk would upcast the
        # WHOLE corpus to f32 inside its dot (4x the resident bytes — at
        # the int8 capacity ceiling that transient alone OOMs). The
        # chunked scan casts one 64k-row chunk at a time instead.
        from optimized_rag_tpu.ops.topk import chunked_topk
        dense_s, dense_i = chunked_topk(q_emb, corpus, k, size=size,
                                        row_scale=row_scale)
    else:
        dense_s, dense_i = exact_topk(q_emb, corpus, k, size=size)
    scores = bm25_score_champions(q_terms, q_valid, champ_docs, champ_tf,
                                  champ_valid, idf, doc_len, avg_len,
                                  k1=k1, b=b)
    n = scores.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    scores = jnp.where(row < size, scores, -jnp.inf)
    bm25_s, bm25_i = jax.lax.top_k(scores, k)
    # Pack everything into ONE buffer [2, B+1, k]: fetching each output
    # separately costs one host<->device round trip apiece, and RTT
    # dominates per-query latency on tunneled/remote-host deployments.
    # ids ride as float32 (exact below 2^24 — corpus caps enforce that).
    packed = jnp.zeros((2, dense_s.shape[0] + 1, k), jnp.float32)
    packed = packed.at[0, :-1].set(dense_s)
    packed = packed.at[1, :-1].set(dense_i.astype(jnp.float32))
    packed = packed.at[0, -1].set(bm25_s)
    packed = packed.at[1, -1].set(bm25_i.astype(jnp.float32))
    return packed


@functools.partial(jax.jit, static_argnames=("k",))
def fuse_candidates(q_emb, corpus, cand_ids, cand_valid, kw_scores,
                    age_days, weights, half_life_days, k: int,
                    row_scale=None):
    """Score + fuse a candidate union in one dispatch.

    q_emb [D] normalized; cand_ids [C] int32 (padded, cand_valid masks);
    kw_scores [C] BM25 scores (0 for dense-only candidates); age_days [C];
    weights [3] = (semantic, keyword, temporal). ``row_scale`` [N]
    dequantizes gathered int8 corpus rows (ops/quantize.py).
    Returns (fused_scores [k], positions [k] into the candidate list;
    invalid slots are -1 / -inf).
    """
    safe = jnp.maximum(cand_ids, 0)
    emb = corpus[safe].astype(jnp.float32)                     # [C, D]
    if row_scale is not None:
        emb = emb * row_scale[safe][:, None].astype(jnp.float32)
    sem = emb @ q_emb.astype(jnp.float32)                      # [C]
    tmp = temporal_decay(age_days, half_life_days)
    stack = jnp.stack([sem, kw_scores.astype(jnp.float32), tmp])
    normed = jax.vmap(lambda s: minmax_normalize(s, cand_valid))(stack)
    w = weights.astype(jnp.float32)
    w = w / jnp.maximum(w.sum(), 1e-9)
    fused = jnp.einsum("sc,s->c", normed, w)
    fused = jnp.where(cand_valid, fused, NEG_INF)
    top_s, pos = jax.lax.top_k(fused, k)
    pos = jnp.where(top_s > NEG_INF / 2, pos, -1)
    safe_pos = jnp.maximum(pos, 0)
    # One packed buffer [5, k]: fused score, position, and the three
    # channel scores gathered at the winners (single fetch round trip).
    return jnp.stack([
        top_s, pos.astype(jnp.float32), sem[safe_pos],
        kw_scores.astype(jnp.float32)[safe_pos], tmp[safe_pos]])
