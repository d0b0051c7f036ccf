"""Single-dispatch query path (ops/fused_query.py) vs the modular path.

The fused kernel must reproduce the two-dispatch hybrid path exactly:
same candidate union, same channel normalization, same winners.
"""

import time

import numpy as np

from optimized_rag_tpu.engine.retriever import HybridRetriever
from optimized_rag_tpu.index.dense import DenseIndex
from optimized_rag_tpu.index.lexical import LexicalIndex
from optimized_rag_tpu.models.encoder import EmbeddingService, TransformerConfig

CORPUS = [
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

QUERIES = [
    "matrix multiplication systolic arrays",
    "how do embedding vectors work",
    "fox and dog comparison",
    "reranking and compression",
]


def _svc(matryoshka=None):
    cfg = TransformerConfig(vocab_size=1024, hidden_dim=64, num_layers=2,
                            num_heads=4, mlp_dim=128, out_dim=32,
                            max_seq_len=64)
    return EmbeddingService(cfg, seed=3, max_len=32, matryoshka_dim=matryoshka)


def _build(svc, with_temporal=True):
    dense = DenseIndex(dim=svc.dim, capacity_block=256, tile=256)
    dense.add(svc.encode(CORPUS))
    lex = LexicalIndex(vocab_hash_bits=14, cap=16)
    lex.add(CORPUS)
    lex.build()
    now = time.time()
    created = {i: now - i * 86400.0 for i in range(len(CORPUS))}
    get_created = (lambda i: created.get(i, now)) if with_temporal else None
    texts = lambda i: (CORPUS[i] if i < len(CORPUS)  # noqa: E731
                       else f"grown doc {i}")
    mk = lambda enc: HybridRetriever(  # noqa: E731
        dense, lex, svc.encode, get_text=texts,
        get_created_at=get_created, candidate_k=6, encoder=enc)
    return mk(None), mk(svc)


def test_fused_query_matches_modular_path():
    svc = _svc()
    modular, fused = _build(svc)
    for q in QUERIES:
        a = modular.hybrid_search(q, top_k=5)
        b = fused.hybrid_search(q, top_k=5)
        assert [d.doc_id for d in a] == [d.doc_id for d in b], q
        np.testing.assert_allclose([d.score for d in a],
                                   [d.score for d in b], atol=2e-5)
        np.testing.assert_allclose([d.semantic_score for d in a],
                                   [d.semantic_score for d in b], atol=2e-5)
        np.testing.assert_allclose([d.keyword_score for d in a],
                                   [d.keyword_score for d in b], atol=2e-5)
        np.testing.assert_allclose([d.temporal_score for d in a],
                                   [d.temporal_score for d in b], atol=2e-3)


def test_fused_query_without_temporal_channel():
    svc = _svc()
    modular, fused = _build(svc, with_temporal=False)
    a = modular.hybrid_search(QUERIES[0], top_k=4)
    b = fused.hybrid_search(QUERIES[0], top_k=4)
    assert [d.doc_id for d in a] == [d.doc_id for d in b]
    np.testing.assert_allclose([d.score for d in a], [d.score for d in b],
                               atol=2e-5)


def test_fused_query_matryoshka_truncation():
    svc = _svc(matryoshka=16)
    modular, fused = _build(svc)
    a = modular.hybrid_search(QUERIES[1], top_k=5)
    b = fused.hybrid_search(QUERIES[1], top_k=5)
    assert [d.doc_id for d in a] == [d.doc_id for d in b]
    np.testing.assert_allclose([d.score for d in a], [d.score for d in b],
                               atol=2e-5)


def test_fused_query_caches_query_embedding():
    svc = _svc()
    _, fused = _build(svc)
    q = "systolic arrays for retrieval"
    fused.hybrid_search(q, top_k=3)
    misses = svc.stats["misses"]
    got = svc.encode([q])  # must be a cache hit now
    assert svc.stats["misses"] == misses
    direct = _svc().encode([q])  # fresh service, same seed -> same forward
    np.testing.assert_allclose(got[0], direct[0], atol=2e-5)


def test_fused_query_respects_top_k_larger_than_corpus_hits():
    svc = _svc()
    _, fused = _build(svc)
    out = fused.hybrid_search("bananas tropical", top_k=10)
    ids = [d.doc_id for d in out]
    assert len(ids) == len(set(ids))           # no duplicate candidates
    assert all(0 <= i < len(CORPUS) for i in ids)
    assert 2 in ids                            # the banana doc is found


def test_retrieve_uses_fused_path_and_grows(tmp_path):
    svc = _svc()
    _, fused = _build(svc)
    before = fused.dense.size
    fused.dense.add(svc.encode(["new document about matrix hardware"]))
    # created_at provider covers only original ids; extend via closure
    out = fused.dense_only("matrix hardware", top_k=3)
    assert out  # dense path still works after growth
    assert fused.dense.size == before + 1
