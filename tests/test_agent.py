"""Agent graph: full 16-node workflow driven hermetically with the
deterministic LLM and fake embedder (SURVEY.md §4 test strategy)."""

import numpy as np
import pytest

from optimized_rag_tpu.agent.agent import RAGAgent
from optimized_rag_tpu.agent.graph import END, StateGraph
from optimized_rag_tpu.agent.llm import DeterministicLLM
from optimized_rag_tpu.agent.rewriter import (
    ConversationReferenceDetector, IntentRecognizer, QueryRewriter,
    QueryRouter)
from optimized_rag_tpu.agent.state import AgentState
from optimized_rag_tpu.agent.verification import (
    CitationValidator, ConfidenceCalibrator, EnsembleVerifier,
    FactualityScorer, SelfRAGEvaluator, TemporalValidator,
    exact_match_verify, quantify_uncertainty)
from optimized_rag_tpu.agent.web import WebSearchTool
from optimized_rag_tpu.config import Settings
from optimized_rag_tpu.engine.types import Intent, RetrievedDoc, Source

from fakes import FakeCrossEncoder, FakeEmbedder


class FakeEmbedService(FakeEmbedder):
    """FakeEmbedder with the EmbeddingService attribute surface
    (``dim`` is already set by FakeEmbedder.__init__)."""


@pytest.fixture
def agent():
    settings = Settings()
    settings.flags.enable_kg = True
    a = RAGAgent(settings, llm=DeterministicLLM(),
                 embed_service=FakeEmbedService(dim=64),
                 cross_encoder=FakeCrossEncoder(),
                 web=WebSearchTool(search_fn=lambda q, n: []))
    a.ingestor.ingest_text(
        "The TPU is a matrix accelerator. The TPU has a systolic array "
        "with 128x128 multiply accumulate units. The MXU performs "
        "matrix multiplication in bfloat16 precision.",
        filename="tpu.txt", title="TPU basics")
    a.ingestor.ingest_text(
        "PostgreSQL is a relational database. The pgvector extension "
        "has HNSW indexes. HNSW uses hierarchical navigable small worlds.",
        filename="pg.txt", title="Postgres")
    return a


# ------------------------------------------------------------------- graph

def test_graph_framework_loops_and_conditionals():
    g = StateGraph(max_steps=10)
    log = []
    g.add_node("a", lambda s: log.append("a"))
    g.add_node("b", lambda s: log.append("b"))
    g.set_entry("a")
    g.add_conditional("a", lambda s: "go" if len(log) < 3 else "stop",
                      {"go": "a", "stop": "b"})
    g.add_edge("b", END)
    g.compile().invoke(AgentState())
    assert log == ["a", "a", "a", "b"]


def test_graph_step_cap():
    g = StateGraph(max_steps=5)
    g.add_node("a", lambda s: None)
    g.set_entry("a")
    g.add_edge("a", "a")
    with pytest.raises(RuntimeError, match="exceeded"):
        g.compile().invoke(AgentState())


# ----------------------------------------------------------------- end2end

def test_chat_answers_with_citations(agent):
    trace = []
    resp = agent.chat("What is the TPU systolic array?", trace=trace)
    assert resp.answer
    assert not resp.refused
    assert resp.citations, "answer should carry [N] citations"
    assert "systolic" in resp.answer.lower()
    assert trace[0] == "receive_input" and "generate_response" in trace
    assert resp.support_ratio > 0.5
    assert 0.05 <= resp.confidence <= 0.95


def test_chat_persists_conversation(agent):
    agent.chat("What is the TPU systolic array?")
    msgs = agent.memory.get_recent_messages(4)
    roles = [m["role"] for m in msgs]
    assert roles[-2:] == ["user", "assistant"]


def test_chat_empty_index_refuses():
    a = RAGAgent(Settings(), llm=DeterministicLLM(),
                 embed_service=FakeEmbedService(dim=64),
                 cross_encoder=FakeCrossEncoder(),
                 web=WebSearchTool(search_fn=lambda q, n: []))
    resp = a.chat("what is the answer to everything?")
    assert resp.refused
    assert resp.support_ratio == 0.0


def test_web_fallback_rescues_refusal():
    hits = []

    def web_fn(q, n):
        hits.append(q)
        return [{"title": "Answer", "content": "the answer is 42", "url": ""}]

    a = RAGAgent(Settings(), llm=DeterministicLLM(),
                 embed_service=FakeEmbedService(dim=64),
                 cross_encoder=FakeCrossEncoder(),
                 web=WebSearchTool(search_fn=web_fn))
    trace = []
    resp = a.chat("what is the answer to everything?", trace=trace)
    assert hits, "web search should have been attempted"
    # Web results arrive either via tier-3 escalation during retrieval or
    # via the explicit fallback node after a failed generation.
    assert "web_search_fallback" in trace or 3 in resp.tiers_used
    assert any(s["source"] == "web" for s in resp.sources)
    assert not resp.refused
    assert "42" in resp.answer


def test_clarification_routes_to_recall(agent):
    agent.chat("What is the TPU systolic array?")
    trace = []
    resp = agent.chat("what did I ask earlier?", trace=trace)
    assert resp.intent == "clarification"
    srcs = {s["source"] for s in resp.sources}
    assert srcs <= {"conversation"}, srcs


def test_comparison_triggers_cot(agent):
    trace = []
    agent.chat("Compare the TPU and PostgreSQL approaches", trace=trace)
    assert "chain_of_thought" in trace


def test_adaptive_weights_fed_back(agent):
    agent.chat("What is the TPU systolic array?")
    stats = agent.weight_manager.tracker.stats()
    assert sum(stats.values()) >= 1


def test_kg_extraction_on_ingest(agent):
    triples = agent.store.find_triples(agent.settings.agent_id, "tpu")
    assert triples, "ingestion should extract KG triples"


def test_tool_registry_surface(agent):
    names = {t["name"] for t in agent.tools.specs()}
    assert {"core_memory_append", "core_memory_replace",
            "archival_memory_insert", "archival_memory_search",
            "conversation_search", "add_core_fact", "upload_document",
            "search_documents", "list_documents"} <= names
    out = agent.tools.execute("add_core_fact", {"fact": "user likes tests"})
    assert "facts" in out
    assert "user likes tests" in agent.memory.get_core_memory()["facts"]
    assert agent.tools.execute("nope", {}).startswith("Error")


# ------------------------------------------------------------- verification

def test_citation_validator():
    cv = CitationValidator()
    res = cv.validate_citations("TPUs are fast [1]. They multiply [2].", 2)
    assert res["valid"] and res["citation_count"] == 2
    res = cv.validate_citations("TPUs are fast [3].", 2)
    assert not res["valid"] and res["invalid_citations"] == [3]
    res = cv.validate_citations("No citations here at all today.", 2)
    assert not res["valid"]


def test_factuality_scorer_refusal_rule():
    fs = FactualityScorer()
    good = fs.calculate(0.9, 0.9, 0.8, 0.7, citation_count=3)
    assert good["factuality_score"] > 0.7 and not good["should_refuse"]
    bad = fs.calculate(0.2, 0.1, 0.3, 0.2, citation_count=0)
    assert bad["should_refuse"] and bad["level"] == "poor"
    # zero-citation penalty halves the score
    with_c = fs.calculate(0.8, 0.8, 0.8, 0.8, citation_count=1)
    without_c = fs.calculate(0.8, 0.8, 0.8, 0.8, citation_count=0)
    assert without_c["factuality_score"] == pytest.approx(
        with_c["factuality_score"] * 0.5)


def test_ensemble_verifier_votes():
    ev = EnsembleVerifier(DeterministicLLM(), FakeEmbedder(dim=64))
    res = ev.verify_claim("the tpu has a systolic array",
                          "the tpu has a systolic array for matmul")
    assert res["supported"]
    res2 = ev.verify_claim("the moon is made of cheese",
                           "tpus multiply matrices quickly")
    assert not res2["supported"]


def test_selfrag_evaluate_answer_support():
    sr = SelfRAGEvaluator(DeterministicLLM(), FakeEmbedder(dim=64))
    docs = [RetrievedDoc(doc_id=0, score=0.9,
                         text="the tpu has a 128x128 systolic array")]
    good = sr.evaluate_answer("what is in a tpu",
                              "The tpu has a 128x128 systolic array [1].",
                              docs)
    assert good["support_ratio"] == 1.0 and not good["hallucination_flag"]
    bad = sr.evaluate_answer("what is in a tpu",
                             "The tpu contains seventeen hamsters.", docs)
    assert bad["support_ratio"] < 0.6


def test_exact_match_verify():
    assert exact_match_verify("the systolic array multiplies",
                              "a systolic array multiplies matrices")
    assert not exact_match_verify("quantum wormhole teleportation",
                                  "a systolic array multiplies matrices")


def test_temporal_validator():
    tv = TemporalValidator(current_year=2026)
    docs = [RetrievedDoc(doc_id=0, score=1.0,
                         text="the project started in 2019")]
    ok = tv.validate("It started in 2019.", docs)
    assert ok["valid"]
    bad = tv.validate("It started in 1987.", docs)
    assert not bad["valid"]
    fut = tv.validate("It will launch in 2031.", [])
    assert fut["valid"]  # prediction wording allowed
    fut2 = tv.validate("It launched in 2031.", [])
    assert not fut2["valid"]


def test_uncertainty_quantification():
    low = quantify_uncertainty("Clear answer [1].", 0.9, 0.9, True, 2,
                               True, 0.9)
    assert low["uncertainty"] < 0.2
    high = quantify_uncertainty(
        "It might be, maybe, possibly, perhaps this could be true.",
        0.3, 0.2, False, 0, False, 0.1)
    assert high["uncertainty"] > 0.6 and len(high["reasons"]) >= 4


def test_confidence_calibrator_clamps():
    c = ConfidenceCalibrator()
    assert 0.05 <= c.calibrate(0.999) <= 0.95
    assert c.calibrate(0.9, support_ratio=0.2) < c.calibrate(0.9)


# ---------------------------------------------------------------- rewriter

def test_intent_recognizer_conversation_reference():
    det = ConversationReferenceDetector(FakeEmbedder(dim=32))
    rec = IntentRecognizer(DeterministicLLM(), det)
    out = rec.recognize("what did you say earlier?",
                        [{"role": "user", "content": "hello"}])
    assert out["intent"] == Intent.CLARIFICATION
    assert out["is_conversation_reference"]


def test_rewriter_skips_llm_when_clean():
    rw = QueryRewriter(DeterministicLLM())
    out = rw.rewrite("simple short query")
    assert out["rewritten"] == "simple short query"
    assert rw.stats["llm_calls"] == 0 and rw.stats["skipped"] == 1


def test_rewriter_engages_on_ambiguity():
    rw = QueryRewriter(DeterministicLLM())
    out = rw.rewrite("what about it", history=[
        {"role": "user", "content": "tell me about tpus"}])
    assert "contextualize" in out["strategies"]
    assert rw.stats["llm_calls"] == 1


def test_router_deterministic():
    r = QueryRouter()
    out = r.route("describe the transformer architecture")
    assert out["sources"] == [Source.DOCUMENTS]
    out2 = r.route("remember my favorite color?")
    assert Source.ARCHIVAL in out2["sources"]
    out3 = r.route("what about that earlier thing")
    assert Source.CONVERSATION in out3["sources"]


# ------------------------------------------------- round-2: agentic tier-3

def _web_recorder(hits):
    def web_fn(q, n):
        hits.append(q)
        return [{"title": "T", "content": f"web says {q}", "url": "u"}]
    return web_fn


def _t3_agent(hits):
    return RAGAgent(Settings(), llm=DeterministicLLM(),
                    embed_service=FakeEmbedService(dim=64),
                    cross_encoder=FakeCrossEncoder(),
                    web=WebSearchTool(search_fn=_web_recorder(hits)))


def test_tier3_sufficient_context_skips_web():
    hits = []
    a = _t3_agent(hits)
    ctx = [RetrievedDoc(doc_id=0, score=0.9, text="a tpu is an accelerator")]
    out = a.tier3_agentic_search("what is a tpu", existing_context=ctx)
    assert hits == [], "LLM judged context sufficient; no web call"
    assert all(d.source != Source.WEB for d in out)


def test_tier3_low_scores_trigger_web():
    hits = []
    a = _t3_agent(hits)
    ctx = [RetrievedDoc(doc_id=0, score=0.1, text="weak match")]
    out = a.tier3_agentic_search("what is a tpu", existing_context=ctx)
    assert hits == ["what is a tpu"]
    web = [d for d in out if d.source == Source.WEB]
    assert web and web[0].tier == 3 and web[0].score == 0.8
    assert web[0].metadata["llm_decided"]


def test_tier3_recency_triggers_web_despite_good_context():
    hits = []
    a = _t3_agent(hits)
    ctx = [RetrievedDoc(doc_id=0, score=0.95, text="old tpu description")]
    a.tier3_agentic_search("latest tpu announcements", existing_context=ctx)
    assert hits == ["latest tpu announcements"]


def test_tier3_conversation_guard_skips_web():
    hits = []
    a = _t3_agent(hits)
    out = a.tier3_agentic_search("what was my first question?")
    assert hits == []
    assert all(d.source != Source.WEB for d in out)


def test_tier3_llm_failure_falls_back_to_direct_search():
    hits = []

    class BrokenLLM(DeterministicLLM):
        def structured(self, prompt, keys, task="", **kw):
            if task == "tier3_decision":
                raise RuntimeError("llm down")
            return super().structured(prompt, keys, task=task, **kw)

    a = RAGAgent(Settings(), llm=BrokenLLM(),
                 embed_service=FakeEmbedService(dim=64),
                 cross_encoder=FakeCrossEncoder(),
                 web=WebSearchTool(search_fn=_web_recorder(hits)))
    out = a.tier3_agentic_search("what is a tpu")
    web = [d for d in out if d.source == Source.WEB]
    assert hits == ["what is a tpu"]
    assert web and web[0].score == 0.7 and web[0].metadata["fallback"]


def test_agent_rerank_score_set_by_cross_encoder(agent):
    # cross-encoder path stamps rerank_score on precision intents
    docs = [d for d in agent.reranker.rerank(
        "what is the mxu", [RetrievedDoc(doc_id=i, score=0.01,
                                         text=t) for i, t in enumerate(
            ["the mxu multiplies matrices"] * 6)],
        "question_answering")]
    assert all(d.rerank_score is not None for d in docs)
    assert agent.reranker.stats["reranked"] >= 1


# --------------------------------- round-2: conversation-reference ensemble

def _detector(with_llm=True):
    from optimized_rag_tpu.agent.rewriter import ConversationReferenceDetector
    return ConversationReferenceDetector(
        embed_fn=FakeEmbedService(dim=64),
        llm=DeterministicLLM() if with_llm else None)


_HISTORY = [
    {"role": "user", "content": "what is a tensor processing unit?"},
    {"role": "assistant", "content": "a tpu is a matrix accelerator."},
    {"role": "user", "content": "how fast is the memory bandwidth?"},
    {"role": "assistant", "content": "hundreds of gigabytes per second."},
]


def test_detector_coreference_english_ordinal():
    d = _detector()
    out = d.detect("what was my first question?", _HISTORY)
    assert out["is_reference"]
    assert out["referenced_index"] == 0


def test_detector_coreference_portuguese():
    d = _detector()
    out = d.detect("qual foi a primeira pergunta?", _HISTORY)
    assert out["is_reference"]
    assert out["referenced_index"] == 0
    out2 = d.detect("sobre o que conversamos antes?", _HISTORY)
    assert out2["is_reference"]


def test_detector_self_contained_not_flagged():
    d = _detector()
    assert not d.detect("what is machine learning?", _HISTORY)[
        "is_reference"]
    assert not d.detect("por que o ceu e azul de dia?", _HISTORY)[
        "is_reference"]


def test_detector_ambiguous_resolved_by_llm_vote():
    """A mid-confidence case: meta+temporal cues give coref ~0.66 — a
    single vote below the 0.8 early-exit. The LLM vote supplies the second
    vote; without the LLM the ensemble stays below the 2-vote bar."""
    q = "can you expand on the answer that was mentioned?"
    with_llm = _detector(True).detect(q, _HISTORY)
    without = _detector(False).detect(q, _HISTORY)
    assert with_llm["is_reference"]
    assert with_llm["method"] == "ensemble"
    assert not without["is_reference"]


def test_detector_semantic_near_duplicate_short_query():
    d = _detector(False)
    out = d.detect("what is a tensor processing unit?", _HISTORY)
    assert out["is_reference"] and out["confidence"] > 0.85
    assert out["method"] == "semantic"


def test_detector_no_history_is_never_reference():
    d = _detector()
    assert not d.detect("what was my first question?", [])[
        "referenced_index"]


# ------------------------------------------------------- deterministic llm
def test_deterministic_llm_reads_multiline_context_items():
    """Chunk text keeps its newlines; the fake LLM must see every line of
    a [N] context item, not just the first (regression: the answer to a
    question about line 2 came from line 1)."""
    from optimized_rag_tpu.agent import prompts
    llm = DeterministicLLM()
    context = ("[1] The quarterly revenue grew 14 percent.\n"
               "The new TPU pod reduced training time from nine days "
               "to two days.\n"
               "[2] Unrelated filler about databases.")
    prompt = prompts.GENERATE_PROMPT.format(
        core_memory="(none)", context=context,
        query="What reduced the training time?")
    docs = llm._context_docs(prompt)
    assert len(docs) == 2
    assert "reduced training time" in docs[0]
    assert docs[1] == "Unrelated filler about databases."
    answer = llm.complete(prompt, task="generate")
    assert "TPU pod" in answer and "[1]" in answer


def test_deterministic_llm_last_context_item_stops_at_trailer():
    llm = DeterministicLLM()
    prompt = ("Context:\n[1] Only item, single line.\n\n"
              "Question: anything?\nAnswer:")
    assert llm._context_docs(prompt) == ["Only item, single line."]


def test_deterministic_llm_skips_query_echo_context():
    """A recall-memory item that merely echoes the user's question must not
    be chosen as the answer when a content-bearing document is present."""
    from optimized_rag_tpu.agent import prompts
    llm = DeterministicLLM()
    context = ("[1] [Conversation] user: What reduced the training time?\n"
               "[2] assistant: What reduced the training time? [3]\n"
               "[3] The new TPU pod reduced training time from nine days "
               "to two days.")
    prompt = prompts.GENERATE_PROMPT.format(
        core_memory="(none)", context=context,
        query="What reduced the training time?")
    answer = llm.complete(prompt, task="generate")
    assert answer.startswith("The new TPU pod"), answer
    assert "[3]" in answer


def test_kg_two_hop_question_requires_chain(tmp_path):
    """The composed KG chain is the only evidence surface for a 2-hop
    question (facts in different docs): with KG on the agent answers
    and cites the chain doc; with KG off it cannot produce the fact."""
    from optimized_rag_tpu.agent.agent import RAGAgent
    from optimized_rag_tpu.config import Settings
    s = Settings()
    s.data_dir = str(tmp_path)
    agent = RAGAgent(s)
    for name, text in (
            ("p1.txt", "The Meridian project was led by Dr. Alvarez. "
                       "The Meridian project built the retrieval engine."),
            ("p2.txt", "Dr. Alvarez joined from the Basel lab in 2021. "
                       "The Basel group studied cluster pruning.")):
        p = tmp_path / name
        p.write_text(text)
        agent.ingestor.upload_file(str(p))
    q = "Where did the head of the Meridian project come from?"
    r = agent.chat(q)
    assert "basel" in r.answer.lower()
    assert not r.refused
    agent.settings.flags.enable_kg = False
    r2 = agent.chat(q)
    assert "basel" not in r2.answer.lower()
