"""The online provider path, end to end over real loopback HTTP.

VERDICT r3 next #4: OpenAICompatibleLLM (agent/llm.py) had never been
exercised — zero egress made it dead code. These tests stand up a real
chat-completions server (eval/llm_endpoint.MockOpenAIServer) and run
the FULL agent graph through it: structured cited generation, claim
verification, refusal, cross-lingual translate->retrieve->generate,
and cost accounting (reference semantics:
rag/nodes/generate_response.py:168-208).
"""

import os

import pytest

from optimized_rag_tpu.agent.agent import RAGAgent
from optimized_rag_tpu.agent.llm import OpenAICompatibleLLM
from optimized_rag_tpu.config import Settings
from optimized_rag_tpu.eval.llm_endpoint import (
    MockOpenAIServer, ScriptedInstructLLM, infer_task,
    translate_to_english)
from optimized_rag_tpu.store.cost import CostTracker

from fakes import FakeEmbedder, FakeCrossEncoder


# ---------------------------------------------------------------------- unit

def test_infer_task_covers_all_pipeline_prompts():
    from optimized_rag_tpu.agent import prompts as P
    cases = {
        "intent": P.INTENT_PROMPT.format(query="q"),
        "rewrite": P.REWRITE_PROMPT.format(history="h", query="q"),
        "translate": P.TRANSLATE_PROMPT.format(query="q"),
        "decompose": P.DECOMPOSE_PROMPT.format(query="q"),
        "expand": P.EXPAND_PROMPT.format(query="q"),
        "cot": P.COT_PROMPT.format(context="c", query="q"),
        "synthesize": P.SYNTHESIZE_PROMPT.format(context="c", query="q"),
        "extract_claims": P.EXTRACT_CLAIMS_PROMPT.format(query="q",
                                                         answer="a"),
        "verify_claim": P.VERIFY_CLAIM_PROMPT.format(claim="c",
                                                     evidence="e"),
        "faithfulness": P.FAITHFULNESS_PROMPT.format(context="c",
                                                     answer="a"),
        "extract_facts": P.FACT_EXTRACTION_PROMPT.format(user="u",
                                                         assistant="a"),
        "extract_triples": P.KG_EXTRACT_PROMPT.format(text="t"),
        "refine": P.REFINE_PROMPT.format(query="q", problems="p"),
    }
    for want, prompt in cases.items():
        assert infer_task(prompt) == want, want
    # store/kg.py's own triple-prompt variant.
    from optimized_rag_tpu.store.kg import _EXTRACT_PROMPT
    assert infer_task(_EXTRACT_PROMPT.format(text="t")) == "extract_triples"
    assert infer_task("tell me a joke") == ""


def test_translate_preserves_technical_terms():
    out = translate_to_english(
        "Qual é o tamanho da unidade de matriz da TPU?")
    low = out.lower()
    for word in ("what", "size", "unit", "matrix", "tpu"):
        assert word in low, (word, out)
    # Spanish too; unknown tokens pass through untouched.
    out_es = translate_to_english(
        "¿Cuál es el tamaño de la unidad de matriz?")
    assert "size" in out_es.lower() and "matrix" in out_es.lower()
    assert translate_to_english("plain english question") \
        == "plain english question"


def test_translate_covers_es_sheet():
    """Every ES_SHEET question translates with its content terms intact
    (the graded es-* section rides on this vocabulary)."""
    from optimized_rag_tpu.eval.qa_sheet import ES_SHEET
    need = {
        "es-hw-mxu": ("matrix", "unit", "size"),
        "es-hw-vmem": ("vector", "memory", "core"),
        "es-dr-cosine": ("cosine", "similarity", "dot product"),
        "es-dr-ivf": ("ivf", "search", "cost"),
        "es-mt-kinds": ("three", "memory", "kinds", "agent"),
        "es-vf-support": ("support", "ratio", "answer", "accepted"),
        "es-un-capital": ("capital", "australia"),
        "es-un-nobel": ("who", "won", "nobel", "physics", "1921"),
    }
    for item in ES_SHEET:
        low = translate_to_english(item.question).lower()
        for word in need[item.id]:
            assert word in low, (item.id, word, low)


def test_translate_covers_fr_sheet():
    """Every FR_SHEET question translates with its content terms intact
    (elisions like "l'unité" and fr noun-compound inversion included)."""
    from optimized_rag_tpu.eval.qa_sheet import FR_SHEET
    need = {
        "fr-hw-mxu": ("matrix", "unit", "size"),
        "fr-hw-vmem": ("vector", "memory", "core"),
        "fr-dr-cosine": ("cosine", "similarity", "dot product"),
        "fr-dr-ivf": ("ivf", "search", "cost"),
        "fr-mt-kinds": ("three", "memory", "kinds", "agent"),
        "fr-vf-support": ("support", "ratio", "answer", "accepted"),
        "fr-un-capital": ("capital", "australia"),
        "fr-un-nobel": ("who", "won", "nobel", "physics", "1921"),
    }
    for item in FR_SHEET:
        low = translate_to_english(item.question).lower()
        for word in need[item.id]:
            assert word in low, (item.id, word, low)


def test_translate_covers_de_sheet():
    """German: non-Romance word order, single-word technical compounds
    ("Matrixeinheit" -> "matrix unit") mapped by the table, no
    inversion rule."""
    from optimized_rag_tpu.eval.qa_sheet import DE_SHEET
    need = {
        "de-hw-mxu": ("matrix unit", "size"),
        "de-hw-vmem": ("vector memory", "core"),
        "de-dr-cosine": ("cosine similarity", "dot product"),
        "de-dr-ivf": ("ivf index", "search cost"),
        "de-mt-kinds": ("three", "memory", "kinds", "agent"),
        "de-vf-support": ("support ratio", "answer", "accepted"),
        "de-un-capital": ("capital", "australia"),
        "de-un-nobel": ("who", "won", "nobel prize", "physics", "1921"),
    }
    for item in DE_SHEET:
        low = translate_to_english(item.question).lower()
        for word in need[item.id]:
            assert word in low, (item.id, word, low)


def test_lang_identifies_all_sheet_questions():
    """utils/lang.py routes every cross-lingual sheet question to its
    language (the translation gate rides on this), and leaves English
    and technical fragments alone."""
    from optimized_rag_tpu.eval.qa_sheet import (
        DE_SHEET, ES_SHEET, FR_SHEET, PT_SHEET)
    from optimized_rag_tpu.utils.lang import detect_language
    for lang, sheet_ in (("pt", PT_SHEET), ("es", ES_SHEET),
                         ("fr", FR_SHEET), ("de", DE_SHEET)):
        for item in sheet_:
            assert detect_language(item.question) == lang, item.id
    assert detect_language("What is the default chunk size?") == "en"
    assert detect_language("bfloat16 MXU pallas pjit") == "en"
    # Shared Romance function words inside English queries must NOT
    # trigger translation (regression: one "de" flipped short English
    # queries to pt/es/fr and sent them through the translator).
    assert detect_language("De-dup vs embedding de-dup?") == "en"
    assert detect_language("Uses de la Salle data") == "en"
    assert detect_language("Compare a la carte de facto options") == "en"


def test_server_rejects_bad_api_key():
    import urllib.error
    with MockOpenAIServer(require_key="sk-right") as srv:
        bad = OpenAICompatibleLLM(srv.api_base, model="m", api_key="sk-no")
        with pytest.raises(urllib.error.HTTPError):
            bad.complete("hello", task="generate")
        good = OpenAICompatibleLLM(srv.api_base, model="m",
                                   api_key="sk-right")
        assert isinstance(good.complete(
            "Translate to English, preserving technical terms.\n\n"
            "Query: ok\nEnglish:"), str)


# ----------------------------------------------------------------- full graph

@pytest.fixture(scope="module")
def http_agent(tmp_path_factory):
    srv = MockOpenAIServer().start()
    s = Settings()
    s.data_dir = str(tmp_path_factory.mktemp("httpagent"))
    tracker = CostTracker(os.path.join(s.data_dir, "cost.json"))
    llm = OpenAICompatibleLLM(srv.api_base, model="scripted-1",
                              cost_tracker=tracker)
    agent = RAGAgent(s, llm=llm, embed_service=FakeEmbedder(dim=32),
                     cross_encoder=FakeCrossEncoder())
    doc = os.path.join(s.data_dir, "doc.txt")
    with open(doc, "w", encoding="utf-8") as f:
        f.write("The TPU matrix unit is a 128 by 128 systolic array. "
                "Embeddings are stored in bfloat16 because it halves "
                "the bytes per row and doubles the achievable scan rate.")
    agent.ingestor.upload_file(doc)
    yield agent, srv, tracker
    srv.stop()


def test_full_graph_answers_with_citations_over_http(http_agent):
    agent, srv, tracker = http_agent
    r = agent.chat("What is the size of the TPU matrix unit?")
    assert not r.refused
    assert "128 by 128" in r.answer
    assert r.citations == [1]
    assert r.support_ratio == 1.0
    # generation went over the wire as a structured-JSON request
    assert any("JSON object" in str(req) for req in srv.requests)
    assert tracker.get_summary()["llm_input_tokens"] > 0


def test_full_graph_refuses_offtopic_over_http(http_agent):
    agent, _, _ = http_agent
    r = agent.chat("What is the capital of the Eldoria kingdom?")
    assert r.refused
    assert not r.citations


def test_cross_lingual_pt_question_over_http(http_agent):
    """PT question over EN docs: translate -> retrieve -> generate ->
    verify all through the HTTP provider (VERDICT r3 next #4b)."""
    agent, srv, _ = http_agent
    r = agent.chat("Qual é o tamanho da unidade de matriz da TPU?")
    assert not r.refused
    assert "128 by 128" in r.answer
    assert r.support_ratio == 1.0
    assert "translate" in srv.model.calls


def test_cross_lingual_es_question_over_http(http_agent):
    agent, _, _ = http_agent
    r = agent.chat("¿Cuál es el tamaño de la unidad de matriz de la TPU?")
    assert not r.refused
    assert "128 by 128" in r.answer
