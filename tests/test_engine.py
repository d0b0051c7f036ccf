"""Engine layer: hybrid retrieval, rerank policy, tiers, compression,
consistency, chunking, wrangling, adaptive weights."""

import numpy as np
import pytest

from optimized_rag_tpu.engine.adaptive import (
    DynamicWeightManager, QueryComplexity, QueryFeatureExtractor)
from optimized_rag_tpu.engine.chunking import (
    FixedSizeChunker, RecursiveChunker, SemanticChunker)
from optimized_rag_tpu.engine.compressor import ContextCompressor
from optimized_rag_tpu.engine.consistency import (
    ConsistencyChecker, is_contradiction)
from optimized_rag_tpu.engine.hierarchical import (
    ConfidenceEvaluator, HierarchicalRetriever)
from optimized_rag_tpu.engine.rerank import SelectiveReranker
from optimized_rag_tpu.engine.retriever import HybridRetriever
from optimized_rag_tpu.engine.types import (
    Intent, RetrievedDoc, Source, intent_weights, retrieval_strategy)
from optimized_rag_tpu.index.dense import DenseIndex
from optimized_rag_tpu.index.lexical import LexicalIndex

from fakes import FakeCrossEncoder, FakeEmbedder

CORPUS = [
    "the transformer architecture uses attention mechanisms",
    "tpus accelerate matrix multiplication with systolic arrays",
    "postgres is a relational database with vector extensions",
    "attention is all you need introduced transformers",
    "bananas are rich in potassium and grow in tropical climates",
    "systolic arrays pump data through multiply accumulate units",
    "the cat sat on the warm windowsill in the sun",
    "vector databases store embeddings for similarity search",
]


@pytest.fixture
def embed():
    return FakeEmbedder(dim=64)


@pytest.fixture
def retriever(embed):
    dense = DenseIndex(dim=64, capacity_block=256, tile=256)
    dense.add(embed(CORPUS))
    lex = LexicalIndex(vocab_hash_bits=14, cap=32)
    lex.add(CORPUS)
    return HybridRetriever(
        dense, lex, embed, get_text=lambda i: CORPUS[i],
        get_created_at=lambda i: 0.0, candidate_k=8)


# ------------------------------------------------------------------ adaptive

def test_complexity_extraction():
    fx = QueryFeatureExtractor()
    assert fx.extract_complexity("compare x and y", None) == QueryComplexity.COMPLEX
    assert fx.extract_complexity("what is a tpu", None) == QueryComplexity.SIMPLE
    assert fx.extract_complexity("the weather there", None) == QueryComplexity.MODERATE


def test_weights_normalized_and_boosted():
    mgr = DynamicWeightManager()
    w = mgr.calculate_optimal_weights("latest recent news today", "search")
    assert abs(sum(w.values()) - 1.0) < 1e-6
    base = intent_weights("search")
    assert w["temporal"] > base[2] / (sum(base))  # temporal boost applied


def test_learning_shifts_weights():
    mgr = DynamicWeightManager(learning_rate=0.5)
    base = mgr.calculate_optimal_weights("something neutral here", "search")
    for _ in range(6):
        mgr.record_feedback({"semantic": 1.0, "keyword": 0.0,
                             "temporal": 0.0, "knowledge_graph": 0.0},
                            quality=1.0, intent="search",
                            complexity=QueryComplexity.MODERATE)
    learned = mgr.calculate_optimal_weights("something neutral here", "search")
    assert learned["semantic"] > base["semantic"]


def test_persistence_hooks_called():
    calls = []

    class FakeDB:
        def load_learned_weights(self, *a):
            return None

        def save_performance(self, rec):
            calls.append(("perf", rec))

        def save_learned_weights(self, *a):
            calls.append(("weights", a))

    mgr = DynamicWeightManager(db=FakeDB(), persist_every=2)
    for _ in range(5):
        mgr.record_feedback({"semantic": .6, "keyword": .3, "temporal": .1,
                             "knowledge_graph": 0}, 0.8, "search",
                            QueryComplexity.SIMPLE)
    kinds = [k for k, _ in calls]
    assert kinds.count("perf") == 5 and "weights" in kinds


# ----------------------------------------------------------------- retriever

def test_hybrid_retrieve_relevant_docs(retriever):
    docs = retriever.retrieve("systolic arrays matrix multiplication",
                              top_k=3, intent=Intent.SEARCH)
    ids = [d.doc_id for d in docs]
    assert 1 in ids and 5 in ids       # both systolic-array docs
    assert 4 not in ids[:2]            # bananas not on top


def test_dense_only_path_for_conversational(retriever):
    docs = retriever.retrieve("cat windowsill sun", top_k=2,
                              intent=Intent.CONVERSATIONAL)
    assert docs[0].doc_id == 6


def test_hybrid_channel_scores_populated(retriever):
    docs = retriever.hybrid_search("vector embeddings database", top_k=3)
    top = docs[0]
    assert top.keyword_score > 0 or top.semantic_score > 0
    assert all(d.text for d in docs)


def test_empty_corpus_retrieval(embed):
    dense = DenseIndex(dim=64, capacity_block=256, tile=256)
    r = HybridRetriever(dense, None, embed, get_text=lambda i: "")
    assert r.retrieve("anything", top_k=3) == []


# -------------------------------------------------------------------- rerank

def _mk_docs(scores, texts=None):
    return [RetrievedDoc(doc_id=i, score=s,
                         text=(texts[i] if texts else f"doc {i}"))
            for i, s in enumerate(scores)]


def test_precision_intent_always_reranks():
    sr = SelectiveReranker(cross_encoder=FakeCrossEncoder())
    ok, reason = sr.should_rerank(_mk_docs([0.9, 0.8]), Intent.FACT_CHECKING)
    assert ok and "precision" in reason


def test_few_results_skip_unless_scores_low():
    sr = SelectiveReranker(cross_encoder=FakeCrossEncoder())
    ok, _ = sr.should_rerank(_mk_docs([0.8, 0.7, 0.6]), "unknown")
    assert not ok
    ok, reason = sr.should_rerank(_mk_docs([0.01, 0.02, 0.03]), "unknown")
    assert ok and "low embedding scores" in reason.lower()


def test_variance_rules():
    sr = SelectiveReranker(cross_encoder=FakeCrossEncoder())
    high_var = _mk_docs([0.9, 0.1, 0.9, 0.1, 0.9, 0.1, 0.9, 0.1])
    ok, reason = sr.should_rerank(high_var, "unknown")
    assert not ok and "high" in reason
    low_var = _mk_docs([0.5, 0.5, 0.51, 0.49, 0.5, 0.5, 0.5, 0.5])
    ok, reason = sr.should_rerank(low_var, "unknown")
    assert ok and "low" in reason


def test_rerank_blends_and_reorders():
    texts = ["tpu systolic array", "completely unrelated words here"]
    docs = _mk_docs([0.5, 0.9], texts)  # orig favors the wrong one
    sr = SelectiveReranker(cross_encoder=FakeCrossEncoder(),
                           blend_original=0.0)
    out = sr.rerank("tpu systolic array", docs, Intent.SEARCH)
    assert out[0].doc_id == 0
    assert out[0].rerank_score is not None


def test_mmr_diversifies(embed):
    texts = ["tpu tpu tpu", "tpu tpu tpu", "unrelated banana topic"]
    docs = _mk_docs([0.9, 0.89, 0.5], texts)
    sr = SelectiveReranker(embed_fn=embed)
    out = sr.apply_mmr(docs, k=2, lam=0.3)
    assert {d.doc_id for d in out} == {0, 2}  # near-dup 1 dropped


def test_rrf_merge():
    l1 = _mk_docs([0.9, 0.8, 0.7])           # ids 0,1,2
    l2 = [RetrievedDoc(doc_id=i, score=s, text=f"d{i}")
          for i, s in [(1, 0.95), (3, 0.5)]]
    out = SelectiveReranker.rrf_merge([l1, l2], k_out=3)
    assert out[0].doc_id == 1  # appears in both lists


# ---------------------------------------------------------------------- tiers

def test_confidence_evaluator_blend():
    ev = ConfidenceEvaluator()
    strong = _mk_docs([0.9, 0.88, 0.87, 0.9, 0.89])
    weak = _mk_docs([0.2, 0.1])
    assert ev.evaluate_confidence(strong, "search") > \
        ev.evaluate_confidence(weak, "search")
    blended = ev.evaluate_confidence(strong, "search",
                                     semantic_confidence=0.0)
    assert blended < ev.evaluate_confidence(strong, "search")


def test_tier1_answers_without_escalation(retriever):
    hr = HierarchicalRetriever(
        retriever,
        core_memory_fn=lambda: {"facts": "the user name is alice and alice "
                                         "likes tensor processing units"},
        escalation_threshold=0.2, tier1_min_score=0.3)
    docs, info = hr.retrieve("what is the user name alice likes",
                             intent=Intent.QUESTION_ANSWERING)
    assert info["tiers_used"] == [1]
    assert docs[0].source == Source.CORE_MEMORY
    assert hr.get_statistics()["tier1_hits"] == 1


def test_escalates_to_tier2_and_tier3(retriever):
    t3_calls = []

    def tier3(query, intent):
        t3_calls.append(query)
        return [RetrievedDoc(doc_id=999, score=0.9, text="web result",
                             source=Source.WEB)]

    hr = HierarchicalRetriever(retriever, core_memory_fn=lambda: {},
                               tier3_fn=tier3, escalation_threshold=0.99)
    docs, info = hr.retrieve("systolic arrays", intent=Intent.SEARCH)
    assert info["tiers_used"] == [2, 3]
    assert t3_calls and any(d.source == Source.WEB for d in docs)


def test_tier3_failure_is_swallowed(retriever):
    def tier3(query, intent):
        raise RuntimeError("boom")

    hr = HierarchicalRetriever(retriever, tier3_fn=tier3,
                               escalation_threshold=0.99)
    docs, info = hr.retrieve("systolic arrays")
    assert "tier3_error" in info and docs  # tier2 results survive


# ---------------------------------------------------------------- compressor

def test_compression_skips_small_sets(embed):
    c = ContextCompressor(embed, max_tokens=100)
    docs = _mk_docs([0.9] * 3, ["short text"] * 3)
    assert c.compress("q", docs) == docs


def test_compression_selects_relevant_sentences(embed):
    c = ContextCompressor(embed, max_tokens=400, sentences_per_doc=1,
                          conservative_mode=False, skip_doc_count=2)
    text = ("tpus multiply matrices quickly. bananas are yellow fruit. "
            "the matrix unit is a systolic array.")
    docs = _mk_docs([0.9] * 3, [text] * 3)
    out = c.compress("matrix multiplication systolic", docs,
                     confidence=0.95)
    assert out and "banana" not in out[0].text
    assert out[0].metadata["compressed"]


def test_low_confidence_concatenates(embed):
    c = ContextCompressor(embed, max_tokens=10, skip_doc_count=2)
    docs = _mk_docs([0.9] * 5, ["word " * 30] * 5)
    out = c.compress("q", docs, confidence=0.3)
    assert 1 <= len(out) < 5  # truncated, not sentence-compressed


# --------------------------------------------------------------- consistency

def test_contradiction_heuristics():
    assert is_contradiction("the sky is not blue", "the sky is blue")
    assert is_contradiction("it costs 5 dollars", "it costs 7 dollars")
    assert not is_contradiction("the sky is blue", "the sky is blue")


def test_consistency_checker_flags_numeric_conflict(embed):
    docs = _mk_docs([0.9, 0.9], [
        "the tower is 300 meters tall and made of iron",
        "the tower is 450 meters tall and made of iron"])
    cc = ConsistencyChecker(embed, sim_threshold=0.5)
    res = cc.check_consistency(docs)
    assert not res["consistent"]
    assert res["confidence_multiplier"] == pytest.approx(0.85)


def test_consistency_checker_passes_clean_docs(embed):
    docs = _mk_docs([0.9, 0.9], ["cats are mammals with fur",
                                 "tpus are accelerators for matmul"])
    res = ConsistencyChecker(embed).check_consistency(docs)
    assert res["consistent"]


# ------------------------------------------------------------------ chunking

def test_fixed_chunker_overlap():
    ch = FixedSizeChunker(chunk_size=100, overlap=20)
    chunks = ch.chunk("x" * 250)
    assert len(chunks) == 4  # step 80: 0,80,160,240
    assert chunks[0]["content"][-20:] == chunks[1]["content"][:20]


def test_recursive_chunker_respects_paragraphs():
    text = "para one. " * 10 + "\n\n" + "para two. " * 10
    ch = RecursiveChunker(chunk_size=120, overlap=10)
    chunks = ch.chunk(text)
    assert all(len(c["content"]) <= 120 for c in chunks)
    assert len(chunks) >= 2


def test_semantic_chunker_splits_on_topic_shift(embed):
    text = ("tpus multiply matrices. tpus have systolic arrays. "
            "tpus use high bandwidth memory. "
            "bananas are yellow. bananas grow on trees. bananas have potassium.")
    ch = SemanticChunker(embed, threshold=0.3, max_chars=500)
    chunks = ch.chunk(text)
    assert len(chunks) >= 2
    assert "banana" not in chunks[0]["content"]


# ------------------------------------------------------------------ wrangler

def test_wrangler_pipeline(embed):
    from optimized_rag_tpu.engine.wrangler import DataWrangler
    w = DataWrangler()
    res = w.process("  Some   text\n\n\n\nwith   mess \x00control ")
    assert "\x00" not in res["content"]
    assert "   " not in res["content"]
    assert 0 <= res["quality_score"] <= 1


def test_dedup_exact_fuzzy_semantic(embed):
    from optimized_rag_tpu.engine.wrangler import Deduplicator
    texts = ["the quick brown fox jumps over a lazy dog",
             "The quick brown fox jumps over a lazy dog",   # exact (case)
             "the quick brown fox jumps over a lazy dot",   # fuzzy
             "completely different content about tpus"]
    d = Deduplicator(embed_fn=embed)
    keep = d.dedup(texts)
    assert keep == [0, 3]


def test_embedding_reranker_reorders(embed):
    from optimized_rag_tpu.engine.rerank import EmbeddingReranker
    texts = ["tpu systolic array hardware", "irrelevant banana content"]
    docs = _mk_docs([0.4, 0.9], texts)  # orig favors the wrong doc
    rr = EmbeddingReranker(embed, blend_original=0.0)
    out = rr.rerank("tpu systolic array", docs)
    assert out[0].doc_id == 0 and out[0].rerank_score is not None


def test_selective_routes_to_embedding_reranker_without_cross_encoder(embed):
    sr = SelectiveReranker(cross_encoder=None, embed_fn=embed)
    texts = ["tpu systolic array hardware", "irrelevant banana content"]
    docs = _mk_docs([0.4, 0.9], texts)
    out = sr.rerank("tpu systolic array", docs, Intent.SEARCH)
    assert sr.stats["embedding_reranked"] == 1
    assert out[0].doc_id == 0


def test_docx_extraction(tmp_path):
    import zipfile
    from optimized_rag_tpu.engine.documents import DocumentProcessor
    doc_xml = (
        '<?xml version="1.0"?><w:document '
        'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        '<w:body><w:p><w:r><w:t>Hello docx</w:t></w:r></w:p>'
        '<w:p><w:r><w:t>Second paragraph.</w:t></w:r></w:p>'
        '</w:body></w:document>')
    path = tmp_path / "t.docx"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("word/document.xml", doc_xml)
    text = DocumentProcessor().extract_text(str(path))
    assert "Hello docx" in text and "Second paragraph." in text


def test_cost_savings_report():
    from optimized_rag_tpu.store.cost import CostTracker
    t = CostTracker()
    t.track_embedding(1_000_000, "on-device", device_seconds=1.0)
    rep = t.get_cost_savings_report()
    assert rep["api_cost_avoided_usd"] > 0
    assert rep["net_savings_usd"] == rep["api_cost_avoided_usd"]


def test_language_detection():
    from optimized_rag_tpu.engine.wrangler import detect_language
    assert detect_language("the cat and the dog are in the house") == "en"
    assert detect_language("você não sabe que isso é muito bom para mim") == "pt"
    assert detect_language("los gatos son muy bonitos pero este perro") == "es"


def test_wrangler_adds_language_metadata():
    from optimized_rag_tpu.engine.wrangler import DataWrangler
    out = DataWrangler().process("the quick brown fox and the lazy dog "
                                 "that they were with")
    assert out["metadata"]["language"] == "en"


# ------------------------------------------------- round-2 regression tests

def test_rrf_merge_negative_and_mixed_ids():
    """Core-memory (-1000-i), web (-(2000+i)), KG (-3000) and dense (0..n)
    ids must all survive fusion (round-1 bug: negative ids were dropped or
    crashed the kernel)."""
    dense = _mk_docs([0.9, 0.8])
    core = [RetrievedDoc(doc_id=-1000, score=0.7, text="core",
                         source=Source.CORE_MEMORY)]
    web = [RetrievedDoc(doc_id=-2000, score=0.6, text="web",
                        source=Source.WEB)]
    kg = [RetrievedDoc(doc_id=-3000, score=0.5, text="kg",
                       source=Source.KNOWLEDGE_GRAPH)]
    out = SelectiveReranker.rrf_merge([dense, core, web, kg], k_out=10)
    ids = {(d.source, d.doc_id) for d in out}
    assert (Source.CORE_MEMORY, -1000) in ids
    assert (Source.WEB, -2000) in ids
    assert (Source.KNOWLEDGE_GRAPH, -3000) in ids
    assert len(out) == 5


def test_rrf_merge_all_negative_ids():
    l1 = [RetrievedDoc(doc_id=-1000, score=0.9, text="a",
                       source=Source.CORE_MEMORY),
          RetrievedDoc(doc_id=-1001, score=0.8, text="b",
                       source=Source.CORE_MEMORY)]
    l2 = [RetrievedDoc(doc_id=-1001, score=0.95, text="b",
                       source=Source.CORE_MEMORY)]
    out = SelectiveReranker.rrf_merge([l1, l2], k_out=5)
    assert out[0].doc_id == -1001  # in both lists -> highest RRF
    assert len(out) == 2


def test_rrf_merge_scores_match_oracle():
    l1 = _mk_docs([0.9, 0.8, 0.7])        # ids 0,1,2 at ranks 0,1,2
    l2 = [RetrievedDoc(doc_id=1, score=0.95, text="d1")]
    out = SelectiveReranker.rrf_merge([l1, l2], k_out=4, rrf_k=60.0)
    got = {d.doc_id: d.score for d in out}
    assert abs(got[1] - (1 / 62 + 1 / 61)) < 1e-9
    assert abs(got[0] - 1 / 61) < 1e-9
    assert abs(got[2] - 1 / 63) < 1e-9


def test_rrf_merge_dedups_by_source_namespace():
    """Same integer id in different namespaces = two distinct docs
    (round-1 bug: chunk id 3 aliased archival id 3)."""
    chunk = [RetrievedDoc(doc_id=3, score=0.9, text="chunk three",
                          source=Source.DOCUMENTS)]
    arch = [RetrievedDoc(doc_id=3, score=0.8, text="archival three",
                         source=Source.ARCHIVAL)]
    out = SelectiveReranker.rrf_merge([chunk, arch], k_out=5)
    assert len(out) == 2
    assert {d.text for d in out} == {"chunk three", "archival three"}


def test_selective_routing_parity(embed):
    """Factual intents -> cross-encoder; conversational -> embedding
    reranker; fallback to the other when one is missing
    (reference selective_reranker.py:188-226)."""
    docs_factory = lambda: _mk_docs([0.01, 0.02, 0.01, 0.02, 0.01, 0.02])
    both = SelectiveReranker(cross_encoder=FakeCrossEncoder(),
                             embed_fn=embed)
    both.rerank("tpu query", docs_factory(), Intent.FACT_CHECKING)
    assert both.stats["reranked"] == 1
    both.rerank("tpu query", docs_factory(), Intent.SEARCH)
    assert both.stats["embedding_reranked"] == 1
    # Fallbacks.
    only_ce = SelectiveReranker(cross_encoder=FakeCrossEncoder())
    only_ce.rerank("tpu query", docs_factory(), Intent.SEARCH)
    assert only_ce.stats["reranked"] == 1
    only_emb = SelectiveReranker(embed_fn=embed)
    only_emb.rerank("tpu query", docs_factory(), Intent.FACT_CHECKING)
    assert only_emb.stats["embedding_reranked"] == 1
    neither = SelectiveReranker()
    out = neither.rerank("tpu query", docs_factory(), Intent.FACT_CHECKING)
    assert neither.stats["skipped"] == 1 and len(out) == 6


def test_rerank_config_thresholds_wired():
    from optimized_rag_tpu.config import RerankConfig
    cfg = RerankConfig(high_variance_skip=0.5, low_variance_rerank=0.4,
                       low_score_force=0.2)
    sr = SelectiveReranker(cross_encoder=FakeCrossEncoder(), config=cfg)
    assert sr.high_variance_skip == 0.5
    assert sr.low_variance_rerank == 0.4
    assert sr.low_score_force == 0.2


def test_tier1_stopwords_do_not_score():
    """'what is the project about' must not clear the tier-1 threshold on
    function words alone (round-1 weak #10)."""
    verbose_block = ("this is about what the user said and the things that "
                     "were discussed in the project meeting notes overall")
    hr = HierarchicalRetriever(
        None, core_memory_fn=lambda: {"facts": verbose_block},
        tier1_min_score=0.3)
    docs = hr._retrieve_tier1("what is the project about")
    # only "project" is a content term; overlap 1/1 -> hits legitimately;
    # a pure function-word query must not hit at all
    assert all("project" in d.text for d in docs)
    assert hr._retrieve_tier1("what is this about") == []


def test_tier3_receives_context_docs(retriever):
    seen = {}

    def tier3(query, intent, context_docs):
        seen["docs"] = context_docs
        return []

    hr = HierarchicalRetriever(retriever, core_memory_fn=lambda: {},
                               tier3_fn=tier3, escalation_threshold=0.99)
    hr.retrieve("systolic arrays", intent=Intent.SEARCH)
    assert seen["docs"], "tier-3 should see the tier-1/2 docs"


def test_semantic_confidence_forces_escalation(retriever):
    """Low Self-RAG semantic confidence escalates where raw scores alone
    would not (reference hierarchical_retriever.py:86-90)."""
    calls = []

    def tier3(query, intent, docs):
        calls.append(query)
        return []

    hr = HierarchicalRetriever(retriever, core_memory_fn=lambda: {},
                               tier3_fn=tier3, escalation_threshold=0.55)
    q = "tpus accelerate matrix multiplication with systolic arrays"
    _, info = hr.retrieve(q, intent=Intent.SEARCH)
    assert not calls, f"raw confidence {info['confidence']} should suffice"
    _, info2 = hr.retrieve(q, intent=Intent.SEARCH, semantic_confidence=0.0)
    assert calls, "semantic_confidence=0 must force tier-3"
    assert info2["confidence"] < info["confidence"]


# ------------------------------------------------ round-4 review fixes


def test_semantic_dedup_checks_kept_not_positions():
    """sim rows are keep-local; the membership loop must iterate the KEPT
    indices, not list positions (regression: once one text was dropped,
    later candidates were compared against the wrong rows — a dup of a
    kept text survived whenever a dropped dup preceded it)."""
    from optimized_rag_tpu.engine.wrangler import Deduplicator
    vecs = {"alpha": [1.0, 0.0], "beta": [1.0, 0.0],
            "gamma": [0.0, 1.0], "delta": [0.0, 1.0]}
    texts = ["alpha stands entirely alone here",
             "beta text shares nothing lexically with the first one",
             "gamma covers an unrelated topic in other words",
             "delta also written with no overlapping words at all"]
    key = {t: t.split()[0] for t in texts}

    def embed(batch):
        return np.asarray([vecs[key[t]] for t in batch], np.float32)

    d = Deduplicator(embed_fn=embed, semantic_threshold=0.9)
    keep = d.dedup(texts, semantic=True)
    # beta dups alpha (dropped); delta dups gamma and must ALSO drop —
    # the positional loop compared delta against rows 0/1 (alpha, the
    # dropped beta) instead of gamma and kept it.
    assert keep == [0, 2], keep


def test_ann_candidates_filter_tombstones(retriever, embed):
    """An installed ANN keeps pre-delete vector copies; deleted rows must
    be masked out of the candidate union, not resurrected at full
    score."""
    dense = retriever.dense

    class FrozenANN:                      # snapshot of the built segment
        def __init__(self, emb, size):
            self.emb, self.n = np.asarray(emb[:size]), size

        def search(self, q, k):
            s = np.atleast_2d(q) @ self.emb.T
            ids = np.argsort(-s, axis=1)[:, :k]
            return (np.take_along_axis(s, ids, axis=1),
                    ids.astype(np.int64))

    retriever.ann = FrozenANN(dense._emb, dense.size)
    retriever.ann_size = dense.size
    target = "tpus accelerate matrix multiplication with systolic arrays"
    docs = retriever.dense_only(target, 3)
    assert docs and docs[0].doc_id == 1          # sanity: hit pre-delete
    dense.delete([1])
    docs = retriever.dense_only(target, 3)
    assert all(d.doc_id != 1 for d in docs), [d.doc_id for d in docs]
    # remaining candidates are still returned (oversample kept k live)
    assert len(docs) >= 2


def test_tier_latency_stats_are_bounded(retriever):
    """One float per query per tier grew without bound in a long-lived
    server; the window is now a fixed-size deque and the avg still
    computes."""
    hr = HierarchicalRetriever(retriever, core_memory_fn=lambda: {},
                               escalation_threshold=0.0)
    for t in (1, 2, 3):
        for i in range(1500):
            hr.stats["tier_latency_ms"][t].append(float(i))
        assert len(hr.stats["tier_latency_ms"][t]) == 1024
    stats = hr.get_statistics()
    assert stats["tier2_avg_ms"] == pytest.approx(np.mean(range(476, 1500)))
