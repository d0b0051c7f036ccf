"""Per-node unit tests for the 16 workflow node bodies."""

import numpy as np
import pytest

from optimized_rag_tpu.agent.agent import RAGAgent
from optimized_rag_tpu.agent.llm import DeterministicLLM
from optimized_rag_tpu.agent.nodes import core
from optimized_rag_tpu.agent.state import AgentState
from optimized_rag_tpu.agent.web import WebSearchTool
from optimized_rag_tpu.config import Settings
from optimized_rag_tpu.engine.types import Intent, RetrievedDoc, Source
from optimized_rag_tpu.utils.health import check_device_health

from fakes import FakeEmbedder, FakeCrossEncoder


@pytest.fixture
def agent():
    a = RAGAgent(Settings(), llm=DeterministicLLM(),
                 embed_service=FakeEmbedder(dim=32),
                 cross_encoder=FakeCrossEncoder(),
                 web=WebSearchTool(search_fn=lambda q, n: []))
    a.ingestor.ingest_text(
        "The MXU multiplies matrices. It is a 128x128 systolic array.")
    return a


def _state(**kw):
    return AgentState(user_input=kw.pop("q", "what is the MXU?"), **kw)


def test_receive_input_increments(agent):
    st = _state()
    core.receive_input(st, agent)
    core.receive_input(st, agent)
    assert st.iteration == 2


def test_recognize_intent_sets_fields(agent):
    st = _state()
    core.recognize_intent(st, agent)
    assert st.query_intent == Intent.QUESTION_ANSWERING
    assert st.intent_confidence > 0


def test_rewrite_query_translation_path(agent):
    st = _state(q="qual é a função do MXU você sabe?")
    core.rewrite_query(st, agent)
    assert st.language == "non-en"
    assert st.translated_input


def test_retrieve_memory_populates(agent):
    agent.memory.save_message("user", "hi")
    agent.memory.archival_memory_insert("the user likes matrices")
    st = _state()
    core.retrieve_memory(st, agent)
    assert st.recent_messages and st.core_memory
    assert st.archival_memories


def test_route_query_and_recall_bypass(agent):
    st = _state()
    core.route_query(st, agent)
    assert st.needs_document_retrieval
    st2 = _state(recall_bypass=True)
    core.route_query(st2, agent)
    assert not st2.needs_document_retrieval


def test_check_context_counts_tokens(agent):
    st = _state()
    core.check_context(st, agent)
    assert st.context_tokens > 0


def test_retrieve_rag_recall_bypass_uses_conversation(agent):
    agent.memory.save_message("user", "earlier question about MXU")
    st = _state(recall_bypass=True)
    st.recent_messages = agent.memory.get_recent_messages(5)
    core.route_query(st, agent)
    core.retrieve_rag(st, agent)
    assert all(d.source == Source.CONVERSATION for d in st.rag_context)


def test_rerank_and_eval_empty_context_noop(agent):
    st = _state()
    core.rerank_and_eval(st, agent)
    assert st.relevance_score == 0.0


def test_rerank_early_exit_needs_lexical_miss_too(agent):
    """A sub-threshold cross-encoder score alone must NOT drop docs
    whose text covers the query's content terms: the on-device
    cross-encoder scores out-of-domain pairs near zero even for
    lexically perfect answers (regression: single-doc corpus refusal)."""
    st = _state(q="what does the alpha system use for multiplication?")
    st.query_intent = Intent.QUESTION_ANSWERING
    doc = RetrievedDoc(doc_id=0, score=0.4, text=(
        "The alpha system uses a systolic array for multiplication."))
    doc.rerank_score = 0.01          # below cross_encoder_threshold
    st.rag_context = [doc]
    fe, agent.fused_eval = agent.fused_eval, None   # deterministic path
    try:
        import unittest.mock as mock
        with mock.patch.object(agent.reranker, "rerank",
                               side_effect=lambda q, d, i: d), \
             mock.patch.object(agent.reranker, "apply_mmr",
                               side_effect=lambda d, k, lam: d):
            core.rerank_and_eval(st, agent)
    finally:
        agent.fused_eval = fe
    assert st.rag_context, "lexically covered doc must survive"
    # ...while an off-topic sub-threshold retrieval still exits early.
    st2 = _state(q="what is the capital of the northern kingdom?")
    st2.query_intent = Intent.QUESTION_ANSWERING
    doc2 = RetrievedDoc(doc_id=0, score=0.4,
                        text="The MXU multiplies matrices on the chip.")
    doc2.rerank_score = 0.01
    st2.rag_context = [doc2]
    fe, agent.fused_eval = agent.fused_eval, None
    try:
        import unittest.mock as mock
        with mock.patch.object(agent.reranker, "rerank",
                               side_effect=lambda q, d, i: d), \
             mock.patch.object(agent.reranker, "apply_mmr",
                               side_effect=lambda d, k, lam: d):
            core.rerank_and_eval(st2, agent)
    finally:
        agent.fused_eval = fe
    assert not st2.rag_context
    assert st2.relevance_score == 0.0


def test_chain_of_thought_writes_reasoning(agent):
    st = _state()
    st.rag_context = [RetrievedDoc(doc_id=0, score=0.9, text="MXU doc")]
    core.chain_of_thought(st, agent)
    assert st.cot_reasoning


def test_synthesize_requires_intent_and_docs(agent):
    st = _state()
    st.query_intent = Intent.COMPARISON
    st.rag_context = [RetrievedDoc(doc_id=i, score=0.9, text=f"d{i}")
                      for i in range(3)]
    core.synthesize_multi_doc(st, agent)
    assert st.synthesized_context
    st2 = _state()
    st2.query_intent = Intent.CONVERSATIONAL
    st2.rag_context = st.rag_context
    core.synthesize_multi_doc(st2, agent)
    assert not st2.synthesized_context


def test_generate_response_empty_context_refuses(agent):
    st = _state()
    core.generate_response(st, agent)
    assert st.refused and st.factuality_level == "poor"


def test_generate_response_with_context_cites(agent):
    st = _state()
    st.query_intent = Intent.QUESTION_ANSWERING
    st.rag_context = [RetrievedDoc(
        doc_id=0, score=0.9,
        text="The MXU is a 128x128 systolic array.")]
    core.generate_response(st, agent)
    assert st.citations and not st.refused
    assert st.support_ratio > 0.5


def test_verify_response_passes_supported_claims(agent):
    st = _state()
    st.response = "The MXU is a systolic array [1]."
    st.rag_context = [RetrievedDoc(doc_id=0, score=0.9,
                                   text="the MXU is a systolic array")]
    st.claims = [{"claim": "the MXU is a systolic array",
                  "supported": None}]
    core.verify_response(st, agent)
    assert st.verification_passed


def test_query_refinement_early_stop(agent):
    st = _state()
    st.rewritten_query = None

    class EchoLLM(DeterministicLLM):
        def complete(self, prompt, task="", **kw):
            if task == "refine":
                return st.effective_query  # no improvement
            return super().complete(prompt, task=task, **kw)

    agent.llm, saved = EchoLLM(), agent.llm
    agent.query_rewriter.llm = agent.llm
    try:
        core.query_refinement(st, agent)
        assert st.refinement_attempts >= \
            agent.settings.loops.max_refinement_attempts
    finally:
        agent.llm = saved
        agent.query_rewriter.llm = saved


def test_web_search_fallback_unavailable_is_noop(agent):
    st = _state()
    core.web_search_fallback(st, agent)  # fake web returns []
    assert st.web_search_attempted and not st.web_context


def test_process_tool_calls_executes_and_clears(agent):
    st = _state()
    st.tool_calls = [{"name": "add_core_fact",
                      "arguments": {"fact": "unit test fact"}}]
    core.process_tool_calls(st, agent)
    assert not st.tool_calls and st.tool_results
    assert "unit test fact" in agent.memory.get_core_memory()["facts"]


def test_kg_chain_doc_not_duplicated_after_compression(agent):
    """The compressor REBUILDS surviving docs (new objects), so pinning
    KG evidence by object identity re-added a chain doc that already
    survived — duplicating its evidence and citation. Membership is now
    by (doc_id, source)."""
    import unittest.mock as mock
    st = _state(q="where did the meridian project leader come from?")
    st.query_intent = Intent.QUESTION_ANSWERING
    st.retrieval_confidence = 0.7
    kg = RetrievedDoc(doc_id=-2, score=0.9,
                      source=Source.KNOWLEDGE_GRAPH,
                      text="Alvarez leads the meridian project. "
                           "Alvarez joined from the Basel lab.")
    fillers = [RetrievedDoc(doc_id=i, score=0.5 - i * 0.01,
                            text=("The meridian project studies mapping "
                                  "of coastal regions in detail. " * 40))
               for i in range(8)]          # > skip_doc_count=7
    st.rag_context = [kg] + fillers     # total chars force real compression
    fe, agent.fused_eval = agent.fused_eval, None
    try:
        with mock.patch.object(agent.reranker, "rerank",
                               side_effect=lambda q, d, i: d), \
             mock.patch.object(agent.reranker, "apply_mmr",
                               side_effect=lambda d, k, lam: d), \
             mock.patch.object(agent.selfrag, "evaluate_retrieval",
                               return_value={"relevance": 0.9}), \
             mock.patch.object(agent.selfrag, "should_reretrieve",
                               return_value=False):
            core.rerank_and_eval(st, agent)
    finally:
        agent.fused_eval = fe
    kg_docs = [d for d in st.rag_context
               if d.source == Source.KNOWLEDGE_GRAPH]
    assert len(kg_docs) == 1, [d.doc_id for d in st.rag_context]
    assert kg_docs[0].metadata.get("compressed"), \
        "the surviving copy should be the compressed rebuild"


def test_update_memory_persists_turn(agent):
    st = _state()
    st.response = "answer text"
    before = len(agent.memory.get_recent_messages(50))
    core.update_memory(st, agent)
    assert len(agent.memory.get_recent_messages(50)) == before + 2


def test_health_check_healthy_on_cpu():
    out = check_device_health(timeout_s=30)
    assert out["healthy"] and out["device_count"] >= 1


def test_health_check_timeout_path(monkeypatch):
    # A big matmul guarantees the probe outlives the 0s timeout — with the
    # default tiny probe, the worker thread can win the race on a warm
    # backend and flake this test.
    out = check_device_health(timeout_s=0.0, matmul_dim=4096)
    assert not out["healthy"] and "respond" in out["error"]


# ---------------------------------------------------------------- round 3
# Regression tests for the QA-sheet findings (docs/RESULTS_r3.md §3).

def test_context_docs_stop_at_aux_sections():
    """[KG]/[Conversation]/... must not bleed into the last numbered doc."""
    prompt = ("Context:\n"
              "[1] Alpha doc about kernels.\n"
              "[2] Beta doc about memory tiers.\n"
              "[Conversation]\nuser: hi\n"
              "[KG]\nAlpha|is|kernel\n\n"
              "Question: what is alpha?\nAnswer:")
    docs = DeterministicLLM._context_docs(prompt)
    assert docs == ["Alpha doc about kernels.",
                    "Beta doc about memory tiers."]


def test_generate_cites_true_source_sentence():
    """Each extracted sentence cites ITS doc, not a fixed top doc."""
    llm = DeterministicLLM()
    prompt = ("Context:\n"
              "[1] Cats are mammals that purr loudly.\n"
              "[2] Contradiction checking reduces the final confidence "
              "by fifteen percent for every detected contradiction.\n\n"
              "Question: How much does each detected contradiction "
              "reduce confidence?\nAnswer:")
    out = llm.structured(prompt, ("answer", "citations"), task="generate")
    assert "[2]" in out["answer"] and "[1]" not in out["answer"]
    assert out["citations"] == [2]


def test_generate_enumeration_pulls_following_sentences():
    llm = DeterministicLLM()
    prompt = ("Context:\n"
              "[1] An agent maintains three kinds of memory. Core memory "
              "holds persona facts. Archival memory stores passages. "
              "Recall memory is the conversation log.\n\n"
              "Question: What are the three kinds of agent memory?\n"
              "Answer:")
    ans = llm._generate(prompt)
    assert "Core memory" in ans and "Archival" in ans and "Recall" in ans


def test_generate_refuses_single_word_overlap():
    """Multi-term query whose best sentence shares ONE content word ->
    refusal, not an off-topic extraction."""
    llm = DeterministicLLM()
    prompt = ("Context:\n"
              "[1] Tiered retrieval escalates cost only when needed.\n\n"
              "Question: What did the framework's cloud bill cost in "
              "March?\nAnswer:")
    assert "don't have enough information" in llm._generate(prompt)


def test_verify_claims_selects_cited_doc_evidence(agent):
    """A claim sourced from a later doc must be graded against THAT doc,
    not a prefix of the joined evidence (QA sheet vf-contradiction)."""
    from optimized_rag_tpu.agent.verification import EnsembleVerifier
    from tests.fakes import FakeEmbedder
    ev = EnsembleVerifier(DeterministicLLM(), FakeEmbedder(dim=64))
    docs = ["Cats are mammals that purr loudly and nap in the sun.",
            "Dogs are loyal companions that bark at strangers.",
            "Each detected contradiction reduces the final confidence "
            "by fifteen percent."]
    claim = ("Each detected contradiction reduces the final confidence "
             "by fifteen percent. [3]")
    verdict = ev.verify_claims([claim], docs)[0]
    assert verdict["supported"]


def test_format_context_neutralizes_bibliography_lines():
    """Doc text whose lines start with [N] (bibliography entries in
    academic PDFs) must not create phantom numbered docs: the
    deterministic generator would otherwise cite shifted indices that
    don't resolve against ChatResponse.sources (round-3 qa_sheet pdf-*
    finding)."""
    docs = [
        RetrievedDoc(doc_id=1, text="Alpha systems use beam search.\n"
                     "[6] Someone et al. 2020. A bibliography entry.\n"
                     "[7] Other et al. 2021. Another entry.",
                     score=0.9, source=Source.DOCUMENTS),
        RetrievedDoc(doc_id=2, text="Gamma relies on reciprocal "
                     "rank fusion for merging.",
                     score=0.8, source=Source.DOCUMENTS),
    ]
    ctx = core._format_context(docs)
    parsed = DeterministicLLM._context_docs(ctx + "\n\nQuestion: x\nAnswer:")
    assert len(parsed) == 2
    assert "bibliography entry" in parsed[0].lower()
    # end-to-end: the answer sentence from doc 2 must cite [2]
    llm = DeterministicLLM()
    ans = llm.complete(
        f"Context:\n{ctx}\n\nQuestion: What does Gamma rely on for "
        "merging?\nAnswer:", task="generate")
    assert "[2]" in ans and "[3]" not in ans


def test_aux_sections_cannot_spawn_phantom_docs():
    """[N]-at-line-start text inside [Conversation]/[KG]/... payloads
    must not parse as extra numbered docs (code-review r3 finding)."""
    payload = core._neutralize_bracket_lines(
        "[2] Gamma relies on reciprocal rank fusion.\n[3] More.")
    ctx = ("[1] The only real doc about alpha.\n[KG]\n" + payload
           + "\n\nQuestion: x\nAnswer:")
    parsed = DeterministicLLM._context_docs(ctx)
    assert len(parsed) == 1
    assert "real doc" in parsed[0]


def test_duplicated_winner_sentence_is_not_refused():
    """Scoring must be invariant to chunk overlap: the SAME answering
    sentence replicated into several retrieved chunks is ONE sentence —
    it must neither change stats (idf, redundancy split) nor flip the
    outcome (code-review r3 repro: answered at 1 copy, refused at 3)."""
    sent = "The scheduler batches embedding lookups efficiently."
    q = ("Question: Which scheduler batches embedding lookups across "
         "requests?\nAnswer:")
    llm = DeterministicLLM()
    one = llm._generate(f"Context:\n[1] {sent}\n\n{q}")
    three = llm._generate(
        f"Context:\n[1] {sent}\n[2] {sent}\n[3] {sent}\n\n{q}")
    assert "scheduler batches" in one
    assert "scheduler batches" in three     # same outcome as 1 copy


def test_stem_collapses_y_verb_families():
    s = DeterministicLLM._stem
    assert s("applies") == s("applied") == s("apply")
    assert s("relies") == s("relied") == s("rely")
    assert s("studies") == s("study")
    assert s("quickly") == "quick"
    assert s("really") == "real"
