"""Embedding rescue channel for zero-lexical-overlap (non-EN) queries
(agent/llm.DeterministicLLM._embed_extract, VERDICT r4 next #3)."""

import numpy as np

from optimized_rag_tpu.agent.llm import DeterministicLLM
from optimized_rag_tpu.agent import prompts

DOCS = [
    "The matrix unit multiplies dense matrices every clock cycle. "
    "It feeds accumulators in float32 precision.",
    "Temporal decay multiplies a document score by a half-life factor. "
    "Recent documents therefore rank higher in search results.",
]
# enough filler sentences that n_sents >= 8 and IDF is meaningful
FILLER = ("Scalar registers hold loop counters. Grid steps iterate "
          "over corpus tiles. The compiler fuses elementwise operators. "
          "Padding rows never win the ranking. Snapshots persist index "
          "arrays. Daily metrics aggregate cost rows.")


def _prompt(query):
    ctx = "\n".join(f"[{i + 1}] {d}" for i, d in enumerate(
        DOCS + [FILLER]))
    return prompts.GENERATE_PROMPT.format(core_memory="", context=ctx,
                                          query=query)


class VocabEmbed:
    """Deterministic toy cross-lingual embedder: texts sharing topic
    words (en or pt) land on the same axis."""

    TOPICS = (("matriz", "matrix", "multiplica", "multiplies"),
              ("decaimento", "decay", "temporal"),
              ("capital", "austrália", "australia"))

    def __call__(self, texts):
        out = np.zeros((len(texts), 4), np.float32)
        for r, t in enumerate(texts):
            low = t.lower()
            for a, words in enumerate(self.TOPICS):
                out[r, a] = sum(w in low for w in words)
            out[r, 3] = 0.1           # shared floor component
            out[r] /= np.linalg.norm(out[r])
        return out


def test_embed_rescue_answers_pt_query():
    llm = DeterministicLLM(embed_fn=VocabEmbed(), embed_min_sim=0.6)
    ans = llm.complete(
        _prompt("Qual é a unidade de matriz que multiplica?"),
        task="generate")
    assert "matrix unit multiplies" in ans.lower()
    assert "[1]" in ans
    assert llm.last_bar.get("embed_used") is True


def test_embed_rescue_refuses_offtopic_pt_query():
    llm = DeterministicLLM(embed_fn=VocabEmbed(), embed_min_sim=0.6)
    ans = llm.complete(
        _prompt("Qual é a capital da Austrália?"), task="generate")
    assert "don't have enough information" in ans
    assert llm.last_bar.get("embed_used") is True
    assert llm.last_bar["embed_best"] < 0.6


def test_en_paths_never_use_embed_channel():
    """English queries — answerable or off-topic — must behave
    byte-identically whether the channel is configured or not."""
    q_ok = "What does the matrix unit multiply every cycle?"
    q_off = "What is the capital of Australia?"
    with_ch = DeterministicLLM(embed_fn=VocabEmbed())
    without = DeterministicLLM()
    for q in (q_ok, q_off):
        a1 = with_ch.complete(_prompt(q), task="generate")
        a2 = without.complete(_prompt(q), task="generate")
        assert a1 == a2
        assert not with_ch.last_bar.get("embed_used")
