"""Staged benchmarks matching BASELINE.json configs[0..3].

  stage0  sample-corpus exact cosine top-10 (the pgvector-equivalent gold
          baseline; chunk 1200/150, on-device encoder embeddings)
  stage1  100k-chunk hybrid: dense + BM25 champion lists + RRF/weighted
          fusion with adaptive weights
  stage2  cross-encoder rerank top-50 -> top-5 as a batched JAX forward
  stage3  1M-chunk 3-tier hierarchical retrieval with confidence-gated
          escalation + on-device consistency scoring

Run:  python benchmarks/bench_stages.py [stage0|stage1|stage2|stage3|all]
Each stage emits one JSON line on stdout.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
from benchmarks.common import emit, log, make_corpus, recall_at_k, timed


def stage0() -> None:
    """Exact top-10 over an encoder-embedded sample corpus."""
    import jax.numpy as jnp
    from optimized_rag_tpu.engine.chunking import RecursiveChunker
    from optimized_rag_tpu.index.dense import DenseIndex
    from optimized_rag_tpu.models.encoder import (
        EmbeddingService, TransformerConfig)

    cfg = TransformerConfig(num_layers=4, hidden_dim=256, num_heads=8,
                            mlp_dim=1024, out_dim=256, vocab_size=16384)
    svc = EmbeddingService(cfg, max_len=128)
    chunker = RecursiveChunker(1200, 150)
    rng = np.random.default_rng(0)
    words = [f"term{i}" for i in range(3000)]
    docs = [" ".join(rng.choice(words, 400)) for _ in range(50)]
    chunks = [c["content"] for d in docs for c in chunker.chunk(d)]
    log(f"stage0: {len(chunks)} chunks")
    emb = svc.encode(chunks)
    idx = DenseIndex(dim=cfg.out_dim, capacity_block=4096, tile=512)
    idx.add(emb)
    queries = svc.encode([" ".join(rng.choice(words, 12))
                          for _ in range(64)])
    oracle = np.argsort(-(queries @ emb.T), axis=1)[:, :10]

    def run():
        res = idx.search(queries, k=10)
        run.ids = res.ids
    dt = timed(run, iters=10)
    emit({"stage": 0, "metric": "exact_topk_sample_corpus",
          "chunks": len(chunks), "qps": round(64 / dt, 1),
          "recall_at_10": recall_at_k(run.ids, oracle)})


def stage1() -> None:
    """100k hybrid dense+BM25+fusion with adaptive weights."""
    from optimized_rag_tpu.engine.adaptive import DynamicWeightManager
    from optimized_rag_tpu.engine.retriever import HybridRetriever
    from optimized_rag_tpu.index.dense import DenseIndex
    from optimized_rag_tpu.index.lexical import LexicalIndex

    n, d = 100_000, 256
    corpus = make_corpus(n, d, clusters=256)
    rng = np.random.default_rng(1)
    vocab = [f"w{i}" for i in range(5000)]
    texts = [" ".join(rng.choice(vocab, 40)) for _ in range(n)]
    dense = DenseIndex(dim=d, capacity_block=131072, tile=2048)
    dense.add(corpus)
    log("stage1: dense index built; building lexical...")
    lex = LexicalIndex(cap=256)
    lex.add(texts)
    lex.build()
    log("stage1: lexical built")

    class _Embed:
        def __call__(self, qs):
            out = rng.standard_normal((len(qs), d)).astype(np.float32)
            return out / np.linalg.norm(out, axis=1, keepdims=True)
    retr = HybridRetriever(dense, lex, _Embed(),
                           get_text=lambda i: texts[i], candidate_k=50)
    mgr = DynamicWeightManager()
    q_texts = [" ".join(rng.choice(vocab, 6)) for _ in range(16)]

    def run():
        for qt in q_texts:
            w = mgr.calculate_optimal_weights(qt, "search")
            retr.hybrid_search(qt, top_k=10, weights=w)
    dt = timed(run, iters=3)
    emit({"stage": 1, "metric": "hybrid_100k_qps",
          "qps": round(len(q_texts) / dt, 2)})


def stage2() -> None:
    """Cross-encoder rerank top-50 -> top-5, batched JAX forward."""
    from optimized_rag_tpu.models.encoder import (
        CrossEncoderService, TransformerConfig)

    cfg = TransformerConfig(num_layers=4, hidden_dim=384, num_heads=12,
                            mlp_dim=1536, vocab_size=16384)
    svc = CrossEncoderService(cfg, max_len=256)
    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(2000)]
    docs = [" ".join(rng.choice(vocab, 180)) for _ in range(50)]
    query = " ".join(rng.choice(vocab, 10))

    def run():
        run.scores = svc.score_pairs(query, docs)
    dt = timed(run, iters=5)
    emit({"stage": 2, "metric": "cross_encoder_rerank_50",
          "pairs_per_s": round(50 / dt, 1),
          "ms_per_query_rerank": round(dt * 1e3, 1)})


def stage3() -> None:
    """1M-chunk 3-tier hierarchical retrieval + consistency scoring."""
    import jax.numpy as jnp
    from optimized_rag_tpu.engine.hierarchical import HierarchicalRetriever
    from optimized_rag_tpu.engine.retriever import HybridRetriever
    from optimized_rag_tpu.index.dense import DenseIndex
    from optimized_rag_tpu.ops.similarity import pairwise_cosine

    n, d = 1_000_000, 256
    corpus = make_corpus(n, d, clusters=1024)
    dense = DenseIndex(dim=d, capacity_block=1 << 20, tile=2048)
    dense.add(corpus)
    log("stage3: 1M dense index built")
    rng = np.random.default_rng(3)

    class _Embed:
        def __call__(self, qs):
            out = rng.standard_normal((len(qs), d)).astype(np.float32)
            return out / np.linalg.norm(out, axis=1, keepdims=True)
    retr = HybridRetriever(dense, None, _Embed(), get_text=lambda i: f"doc {i}")
    hier = HierarchicalRetriever(
        retr, core_memory_fn=lambda: {"facts": "nothing relevant here"},
        escalation_threshold=0.7)

    def run():
        docs, info = hier.retrieve("some query text", top_k=10)
        # on-device consistency scoring over the candidates
        emb = dense.get([d_.doc_id for d_ in docs])
        run.sims = np.asarray(pairwise_cosine(jnp.asarray(emb)))
    dt = timed(run, iters=5)
    emit({"stage": 3, "metric": "tiered_1M_query_ms",
          "ms_per_query": round(dt * 1e3, 1),
          "tier_stats": {k: v for k, v in
                         hier.get_statistics().items()
                         if isinstance(v, (int, float))}})


STAGES = {"stage0": stage0, "stage1": stage1, "stage2": stage2,
          "stage3": stage3}

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for name, fn in STAGES.items():
        if which in ("all", name):
            log(f"=== {name}")
            fn()
