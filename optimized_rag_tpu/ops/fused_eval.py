"""Single-dispatch post-retrieval scoring: rerank + MMR + relevance + sim.

The modular rerank_and_eval node costs four synchronized device calls on
the warm path — cross-encoder forward, MMR selection, Self-RAG relevance
cosine, pairwise-consistency cosine — and each round trip through a
tunneled TPU runtime is ~30 ms. This kernel computes all four in ONE
dispatch; the host keeps only the decisions (routing policy, contradiction
heuristics, loop control), which is exactly the SURVEY.md §7 rule: scores
in large batches on device, decisions on host.

Replaces (behavior-parity, one dispatch): cross-encoder rerank + blend
(reference rag/reranker.py:274-359,77), greedy MMR (:156-191), Self-RAG
retrieval relevance (rag/self_rag.py:49), and the consistency checker's
all-pairs cosine (rag/consistency_checker.py:169-190).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from optimized_rag_tpu.ops.fusion import blend_rerank
from optimized_rag_tpu.ops.mmr import mmr_select
from optimized_rag_tpu.ops.similarity import normalize

NEG_INF = -1e30


@functools.partial(jax.jit,
                   static_argnames=("k_mmr", "mode", "ce_apply"))
def rerank_eval_fused(ce_params, pair_ids, pair_mask, pair_types,
                      doc_embs, q_emb, orig_scores, valid,
                      blend_original, lam,
                      *, k_mmr: int, mode: str, ce_apply=None):
    """One dispatch for the whole post-retrieval scoring pass.

    mode: "ce" scores (query, doc) token pairs with the cross-encoder,
    "emb" re-scores by query-doc cosine (bi-encoder rerank), "none" skips
    reranking (policy said skip) but still runs MMR/relevance/consistency.

    doc_embs [N, D] (unit vectors; zero padding rows), q_emb [D] unit,
    orig_scores [N], valid [N] bool. Returns packed [5 + N, N] float32:
      row 0: rerank scores (new)      row 1: blended scores
      row 2: descending sort order    row 3: MMR selection (first k_mmr
                                             cols; indices into row 2's
                                             sorted list, -1 padded)
      row 4: per-candidate relevance in [0, 1] (Self-RAG semantic)
      rows 5..5+N: pairwise cosine similarity matrix
    """
    n = doc_embs.shape[0]
    emb = doc_embs.astype(jnp.float32)
    orig = orig_scores.astype(jnp.float32)
    if mode == "ce":
        logits = ce_apply(ce_params, pair_ids, pair_mask, pair_types)
        new = jax.nn.sigmoid(logits.astype(jnp.float32))
        blended = blend_rerank(new, orig, blend_original)
    elif mode == "emb":
        new = emb @ q_emb.astype(jnp.float32)
        blended = blend_rerank(new, orig, blend_original)
    else:  # "none": policy said skip reranking
        new = orig
        blended = orig
    blended_m = jnp.where(valid, blended, NEG_INF)
    order = jnp.argsort(-blended_m, stable=True)

    # MMR over the reranked (sorted) candidates — identical semantics to
    # SelectiveReranker.apply_mmr on the reranked list.
    mmr_order, _ = mmr_select(emb[order], blended_m[order], k_mmr,
                              lam=lam, valid=valid[order])

    # Self-RAG retrieval relevance: cosine mapped to [0, 1]
    # (agent/verification.py evaluate_retrieval).
    dn = normalize(emb)
    qn = q_emb.astype(jnp.float32)
    qn = qn / jnp.maximum(jnp.linalg.norm(qn), 1e-12)
    rel01 = jnp.clip((dn @ qn + 1.0) / 2.0, 0.0, 1.0)

    # Pairwise cosine for the consistency checker's contradiction scan.
    sim = jnp.dot(dn, dn.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)

    packed = jnp.zeros((5 + n, n), jnp.float32)
    packed = packed.at[0].set(new)
    packed = packed.at[1].set(blended)
    packed = packed.at[2].set(order.astype(jnp.float32))
    packed = packed.at[3, :k_mmr].set(mmr_order.astype(jnp.float32))
    packed = packed.at[4].set(rel01)
    packed = packed.at[5:].set(sim)
    return packed
