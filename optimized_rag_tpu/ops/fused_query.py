"""Single-dispatch hybrid query: encoder forward + dual top-k + fusion.

The round-2 fused path (ops/hybrid.py) cut the hybrid query to two device
dispatches (dual_topk, fuse_candidates) plus one encoder forward — three
synchronized round trips. Through a tunneled/remote TPU runtime each
round trip costs ~30 ms, so the trips, not the FLOPs, set warm-turn
latency. This kernel collapses the whole read path to ONE dispatch:

  tokens -> BiEncoder forward -> L2/Matryoshka -> dense top-k + BM25
  top-k -> candidate-union dedup (on device) -> gather + semantic
  re-score + temporal decay -> per-channel min-max -> weighted blend ->
  final top-k

Semantics match the two-dispatch path exactly (same candidate union,
same normalization over it) — parity-tested in tests/test_fused_query.py.
The candidate-union dedup that engine/retriever.py used to do with host
sets runs on device as a sort + adjacent-duplicate merge: both channels
return distinct ids, so duplicate runs have length <= 2 and one
shift-compare merges the BM25 score onto the kept slot.

Replaces the reference's per-query pgvector SQL + rank_bm25 rebuild + dict
fusion (rag/document_store.py:448-460, rag/retrieval.py:294-347).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from optimized_rag_tpu.ops.bm25 import bm25_score_champions
from optimized_rag_tpu.ops.fusion import minmax_normalize, temporal_decay
from optimized_rag_tpu.ops.topk import NEG_INF, exact_topk

NEG_INF_HALF = NEG_INF / 2
_INVALID_KEY = 1 << 30  # sorts every invalid candidate past the valid ones


@functools.partial(
    jax.jit,
    static_argnames=("encode_fn", "matryoshka_dim", "candidate_k", "k"))
def encode_and_retrieve(params, q_ids, q_mask,
                        corpus, size,
                        q_terms, q_valid, champ_docs, champ_tf, champ_valid,
                        idf, doc_len, avg_len,
                        created_days, now_days,
                        weights, half_life_days,
                        *, encode_fn, matryoshka_dim: int | None,
                        candidate_k: int, k: int,
                        k1: float = 1.5, b: float = 0.75, row_scale=None):
    """One dispatch from query tokens to fused hybrid top-k.

    ``encode_fn(params, ids, mask) -> [1, D]`` is the (static) bi-encoder
    apply; ``created_days`` [N] is days-since-epoch per corpus row (pass
    zeros and weights[2]=0 when no temporal data exists). Returns a packed
    [6, W] float32 buffer with W = max(k, D):
      row 0: fused scores   (cols [0, k))
      row 1: doc ids        (float32; exact below 2^24 — asserted)
      row 2: semantic score at each winner
      row 3: BM25 score     at each winner
      row 4: temporal score at each winner
      row 5: the query embedding (cols [0, D)) — callers cache it so the
             downstream rerank/eval stages reuse it without a new forward.
    """
    assert corpus.shape[0] < (1 << 24), (
        f"fused-query id packing is exact only below 2^24 rows; "
        f"got {corpus.shape[0]}")
    # ---- encoder forward (unit vectors out of the BiEncoder head)
    q = encode_fn(params, q_ids, q_mask)                       # [1, D]
    if matryoshka_dim:
        q = q[:, :matryoshka_dim]
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-9)
    q = q.astype(jnp.float32)

    # ---- both retrieval channels (same compute as ops/hybrid.dual_topk)
    # row_scale dequantizes an int8 corpus's scores (ops/quantize.py).
    if row_scale is not None:
        # Chunked scan keeps the int8 corpus int8-resident (exact_topk's
        # whole-corpus f32 upcast is a 4x HBM transient — see
        # ops/hybrid.dual_topk).
        from optimized_rag_tpu.ops.topk import chunked_topk
        dense_s, dense_i = chunked_topk(q, corpus, candidate_k, size=size,
                                        row_scale=row_scale)
    else:
        dense_s, dense_i = exact_topk(q, corpus, candidate_k, size=size)
    bm = bm25_score_champions(q_terms, q_valid, champ_docs, champ_tf,
                              champ_valid, idf, doc_len, avg_len,
                              k1=k1, b=b)
    row = jax.lax.broadcasted_iota(jnp.int32, (bm.shape[0],), 0)
    bm = jnp.where(row < size, bm, -jnp.inf)
    bm25_s, bm25_i = jax.lax.top_k(bm, candidate_k)

    # ---- candidate-union dedup on device (engine/retriever.py:162 host set)
    d_ok = (dense_i[0] >= 0) & (dense_s[0] > NEG_INF_HALF)
    b_ok = (bm25_i >= 0) & (bm25_s > 0.0)
    ids = jnp.concatenate([dense_i[0], bm25_i]).astype(jnp.int32)   # [2C]
    ok = jnp.concatenate([d_ok, b_ok])
    kw = jnp.concatenate([jnp.zeros_like(bm25_s),
                          jnp.where(b_ok, bm25_s, 0.0)])
    key = jnp.where(ok, ids, _INVALID_KEY)
    order = jnp.argsort(key)            # stable: ascending id, invalid last
    sid, skw, sok = key[order], kw[order], ok[order]
    first = jnp.concatenate([jnp.ones(1, bool), sid[1:] != sid[:-1]])
    # Each channel's ids are distinct, so a duplicate run is exactly the
    # (dense, bm25) pair — one look-ahead merges the BM25 score.
    same_next = jnp.concatenate([sid[1:] == sid[:-1],
                                 jnp.zeros(1, bool)])
    kw_next = jnp.concatenate([skw[1:], jnp.zeros(1, skw.dtype)])
    merged_kw = jnp.maximum(skw, jnp.where(same_next, kw_next, 0.0))
    cand_valid = sok & first
    cand_ids = jnp.where(cand_valid, sid, -1)

    # ---- gather + score + fuse (same math as ops/hybrid.fuse_candidates)
    safe = jnp.maximum(cand_ids, 0)
    emb = corpus[safe].astype(jnp.float32)                     # [2C, D]
    if row_scale is not None:
        emb = emb * row_scale[safe][:, None].astype(jnp.float32)
    sem = emb @ q[0]
    ages = jnp.maximum(now_days - created_days[safe], 0.0)
    tmp = temporal_decay(ages, half_life_days)
    stack = jnp.stack([sem, merged_kw.astype(jnp.float32), tmp])
    normed = jax.vmap(lambda s: minmax_normalize(s, cand_valid))(stack)
    w = weights.astype(jnp.float32)
    w = w / jnp.maximum(w.sum(), 1e-9)
    fused = jnp.einsum("sc,s->c", normed, w)
    fused = jnp.where(cand_valid, fused, NEG_INF)
    top_s, pos = jax.lax.top_k(fused, k)
    safe_pos = jnp.maximum(pos, 0)
    out_ids = jnp.where(top_s > NEG_INF_HALF, cand_ids[safe_pos], -1)

    # ---- one packed buffer (single fetch round trip)
    width = max(k, q.shape[1])
    packed = jnp.zeros((6, width), jnp.float32)
    packed = packed.at[0, :k].set(top_s)
    packed = packed.at[1, :k].set(out_ids.astype(jnp.float32))
    packed = packed.at[2, :k].set(sem[safe_pos])
    packed = packed.at[3, :k].set(merged_kw.astype(jnp.float32)[safe_pos])
    packed = packed.at[4, :k].set(tmp[safe_pos])
    packed = packed.at[5, :q.shape[1]].set(q[0])
    return packed
