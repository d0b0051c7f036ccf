"""Fused post-retrieval pass (ops/fused_eval.py) vs the modular sequence.

FusedRerankEval.run must reproduce SelectiveReranker.rerank -> apply_mmr
-> SelfRAG relevance -> pairwise consistency cosine, byte for byte modulo
float tolerance, across every routing mode (ce / emb / none).
"""

import dataclasses

import numpy as np

from optimized_rag_tpu.engine.consistency import ConsistencyChecker
from optimized_rag_tpu.engine.fused import FusedRerankEval
from optimized_rag_tpu.engine.rerank import SelectiveReranker
from optimized_rag_tpu.engine.types import Intent, RetrievedDoc
from optimized_rag_tpu.models.encoder import (
    CrossEncoderService, EmbeddingService, TransformerConfig)
from optimized_rag_tpu.ops.similarity import cosine_matrix

import jax.numpy as jnp

TEXTS = [
    "tpus accelerate matrix multiplication with systolic arrays",
    "postgres stores rows in relational tables",
    "bananas grow in tropical climates",
    "systolic arrays pump data through multiply units",
    "embedding vectors live in high dimensional space",
    "the quick brown fox jumps over the lazy dog",
    "matrix multiplication dominates transformer flops",
    "dogs and foxes are both canids",
    "retrieval quality depends on reranking depth",
    "compression trades context tokens for latency",
]


def _services():
    cfg = TransformerConfig(vocab_size=1024, hidden_dim=64, num_layers=2,
                            num_heads=4, mlp_dim=128, out_dim=32,
                            max_seq_len=64)
    svc = EmbeddingService(cfg, seed=3, max_len=32)
    ce = CrossEncoderService(cfg, seed=7, max_len=64)
    return svc, ce


def _docs(n, scores=None):
    scores = scores or [0.9 - 0.07 * i for i in range(n)]
    return [RetrievedDoc(doc_id=i, score=float(scores[i]), text=TEXTS[i])
            for i in range(n)]


def _modular(query, docs, intent, svc, ce, k_mmr, lam=0.7):
    rr = SelectiveReranker(cross_encoder=ce, embed_fn=svc.encode)
    out = rr.rerank(query, docs, intent)
    out = rr.apply_mmr(out, k=min(k_mmr, len(out)), lam=lam)
    embs = np.atleast_2d(svc.encode([query] + [d.text for d in out]))
    sims = np.asarray(cosine_matrix(jnp.asarray(embs[:1]),
                                    jnp.asarray(embs[1:])))[0]
    rel01 = np.clip((sims + 1.0) / 2.0, 0.0, 1.0)
    checker = ConsistencyChecker(svc.encode)
    cons = checker.check_consistency(out)
    return out, rel01, cons


def _fused(query, docs, intent, svc, ce, k_mmr, lam=0.7):
    rr = SelectiveReranker(cross_encoder=ce, embed_fn=svc.encode)
    fe = FusedRerankEval(rr, svc.encode, cross_encoder=ce)
    res = fe.run(query, docs, intent, k_mmr=k_mmr, lam=lam)
    checker = ConsistencyChecker(svc.encode)
    cons = checker.check_consistency(res["docs"], sim=res["sim"])
    return res, cons


def _copy(docs):
    return [dataclasses.replace(d) for d in docs]


def _assert_match(query, n, intent, k_mmr, scores=None):
    svc, ce = _services()
    docs = _docs(n, scores)
    mod_docs, mod_rel, mod_cons = _modular(query, _copy(docs), intent,
                                           svc, ce, k_mmr)
    res, fus_cons = _fused(query, _copy(docs), intent, svc, ce, k_mmr)
    fus_docs = res["docs"]
    assert [d.doc_id for d in mod_docs] == [d.doc_id for d in fus_docs]
    np.testing.assert_allclose([d.score for d in mod_docs],
                               [d.score for d in fus_docs], atol=3e-5)
    mod_rr = [d.rerank_score for d in mod_docs]
    fus_rr = [d.rerank_score for d in fus_docs]
    if any(r is not None for r in mod_rr):
        np.testing.assert_allclose([r or 0 for r in mod_rr],
                                   [r or 0 for r in fus_rr], atol=3e-5)
    np.testing.assert_allclose(res["per_doc"], mod_rel, atol=3e-5)
    assert mod_cons["consistent"] == fus_cons["consistent"]
    assert ([(i, j) for i, j, _ in mod_cons["contradictions"]]
            == [(i, j) for i, j, _ in fus_cons["contradictions"]])


def test_ce_mode_precision_intent_small():
    _assert_match("matrix multiplication hardware", 5,
                  Intent.QUESTION_ANSWERING, k_mmr=5)


def test_ce_mode_with_mmr_selection():
    _assert_match("matrix multiplication systolic", 10,
                  Intent.FACT_CHECKING, k_mmr=5)


def test_emb_mode_conversational():
    # 10 docs with equal scores -> low variance -> rerank; conversational
    # routes to the embedding reranker.
    _assert_match("tell me about foxes and dogs", 10,
                  Intent.CONVERSATIONAL, k_mmr=5,
                  scores=[0.5] * 10)


def test_none_mode_skip_small_high_scores():
    # <=5 docs with decent scores and non-precision intent -> skip.
    _assert_match("chatting about bananas", 4, Intent.CONVERSATIONAL,
                  k_mmr=5, scores=[0.9, 0.8, 0.7, 0.6])


def test_none_mode_high_variance_skip():
    scores = [0.95, 0.1, 0.08, 0.07, 0.06, 0.05, 0.04, 0.03, 0.02, 0.01]
    _assert_match("one clear winner", 10, Intent.CONVERSATIONAL,
                  k_mmr=5, scores=scores)


def test_stats_parity():
    svc, ce = _services()
    rr_m = SelectiveReranker(cross_encoder=ce, embed_fn=svc.encode)
    rr_f = SelectiveReranker(cross_encoder=ce, embed_fn=svc.encode)
    fe = FusedRerankEval(rr_f, svc.encode, cross_encoder=ce)
    cases = [(5, Intent.QUESTION_ANSWERING, None),
             (10, Intent.CONVERSATIONAL, [0.5] * 10),
             (4, Intent.CONVERSATIONAL, [0.9, 0.8, 0.7, 0.6])]
    for n, intent, scores in cases:
        rr_m.rerank("q", _docs(n, scores), intent)
        fe.run("q", _docs(n, scores), intent, k_mmr=5, lam=0.7)
    assert rr_m.stats == rr_f.stats
