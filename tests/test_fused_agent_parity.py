"""Agent-level parity: fused turn on vs off must give identical answers.

The fused paths (ops/fused_query.py, ops/fused_eval.py) are exercised
end-to-end through RAGAgent with real (tiny) on-device models; flipping
Flags.enable_fused_turn / RetrievalConfig.fuse_query_encoder must not
change any user-visible field of the ChatResponse.
"""

import numpy as np

from optimized_rag_tpu.agent.agent import RAGAgent
from optimized_rag_tpu.agent.llm import DeterministicLLM
from optimized_rag_tpu.agent.web import WebSearchTool
from optimized_rag_tpu.config import Settings
from optimized_rag_tpu.models.encoder import (
    CrossEncoderService, EmbeddingService, TransformerConfig)

DOCS = [
    "The TPU is a matrix accelerator built around a systolic array. "
    "Its MXU performs 128x128 multiply accumulate operations per cycle.",
    "Reranking depth interacts with context compression: deeper rerank "
    "pools improve precision while compression caps token budgets.",
    "Bananas grow in tropical climates and ripen after harvest.",
    "Hybrid retrieval blends dense semantic scores with BM25 keyword "
    "scores and a temporal recency decay per intent.",
]

QUERIES = [
    "What does the MXU do in a TPU?",
    "How does reranking interact with compression?",
]


def _mk_agent(fused: bool):
    cfg = TransformerConfig(vocab_size=1024, hidden_dim=64, num_layers=2,
                            num_heads=4, mlp_dim=128, out_dim=32,
                            max_seq_len=64)
    settings = Settings()
    settings.flags.enable_fused_turn = fused
    settings.retrieval.fuse_query_encoder = fused
    a = RAGAgent(settings, llm=DeterministicLLM(),
                 embed_service=EmbeddingService(cfg, seed=3, max_len=32),
                 cross_encoder=CrossEncoderService(cfg, seed=7, max_len=64),
                 web=WebSearchTool(search_fn=lambda q, n: []))
    for i, t in enumerate(DOCS):
        a.ingestor.ingest_text(t, title=f"doc{i}")
    return a


def test_fused_agent_turn_matches_modular():
    fused = _mk_agent(True)
    modular = _mk_agent(False)
    assert fused.fused_eval is not None
    assert fused.retriever.encoder is not None
    assert modular.fused_eval is None
    assert modular.retriever.encoder is None
    for q in QUERIES:
        rf = fused.chat(q)
        rm = modular.chat(q)
        assert rf.answer == rm.answer, q
        assert rf.citations == rm.citations
        assert [s["doc_id"] for s in rf.sources] == \
               [s["doc_id"] for s in rm.sources]
        np.testing.assert_allclose(rf.factuality_score, rm.factuality_score,
                                   atol=1e-4)
        np.testing.assert_allclose(rf.support_ratio, rm.support_ratio,
                                   atol=1e-4)
        np.testing.assert_allclose(rf.confidence, rm.confidence, atol=1e-4)
        assert rf.refused == rm.refused
        assert rf.tiers_used == rm.tiers_used
