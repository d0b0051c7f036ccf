"""Query understanding: intent recognition, conversation-reference
detection, conditional rewriting, deterministic routing.

Re-implements:
  * IntentRecognizer (rag/intent_recognizer.py:20-156): reference-detector
    pre-check then structured LLM classification
  * ConversationReferenceDetector (rag/conversation_reference_detector.py:
    29-528): anaphora patterns + embedding similarity to history + LLM
    fallback, ensembled
  * QueryRewriter (rag/query_rewriter.py:21-536): System-1 heuristics
    decide which strategies apply; ZERO LLM calls when none do; single
    structured call otherwise; priority contextualized > reformulated >
    simplified > corrected. decompose/expand helpers for multi-hop.
  * QueryRouter (rag/router.py:22-108): deterministic DOCUMENTS-first
    source routing with personalization / follow-up keywords.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from optimized_rag_tpu.agent import prompts
from optimized_rag_tpu.engine.types import Intent, Source
from optimized_rag_tpu.ops.similarity import cosine_matrix


# ---------------------------------------------------------------------------
# Conversation-reference detection
# ---------------------------------------------------------------------------

# EN + PT anaphora patterns (the reference is bilingual,
# conversation_reference_detector.py:204-380).
_REFERENCE_PATTERNS = (
    r"\b(you (said|mentioned|told)|earlier|before|previous(ly)?|"
    r"first question|last (question|answer)|what did i (say|ask))\b",
    r"\b(voc[eê] (disse|falou|mencionou)|anteriormente|"
    r"primeira pergunta|[uú]ltima (pergunta|resposta)|o que eu (disse|perguntei))\b",
)
_REF_RES = tuple(re.compile(p, re.IGNORECASE) for p in _REFERENCE_PATTERNS)

# Queries about the conversation itself — web search can never help these
# (reference hierarchical_retriever.py:470-499, bilingual pattern list).
_CONTEXT_QUERY_RES = tuple(re.compile(p, re.IGNORECASE) for p in (
    r"(primeir|[uú]ltim|pen[uú]ltim)a? pergunta", r"pergunta anterior",
    r"o que (eu )?(perguntei|disse|falei)", r"o que (voc[eê]|n[oó]s)"
    r" (disse|falou|conversamos)", r"nossa conversa",
    r"sobre o que conversamos",
    r"(first|last|previous) question", r"what did (i|we|you)",
    r"what (i|we|you) (ask|said|mention)", r"our conversation",
    r"what we (talked|discussed)", r"earlier in (this|our) conversation",
))


def is_conversation_context_query(query: str) -> bool:
    """True for queries about the conversation history itself, where
    external retrieval (web/KG) cannot help (reference :470-499)."""
    return any(rx.search(query) for rx in _CONTEXT_QUERY_RES)


class ConversationReferenceDetector:
    def __init__(self, embed_fn: Optional[Callable] = None, llm=None,
                 semantic_threshold: float = 0.55):
        self.embed_fn = embed_fn
        self.llm = llm
        self.semantic_threshold = semantic_threshold

    def detect(self, query: str, history: Sequence[Dict]) -> Dict:
        """Ensemble of pattern + semantic + (optional) LLM signals
        (reference :465-528)."""
        votes = []
        pattern_hit = any(rx.search(query) for rx in _REF_RES)
        votes.append(pattern_hit)
        semantic_hit = False
        if self.embed_fn is not None and history:
            texts = [m["content"] for m in history[-10:]]
            embs = np.atleast_2d(self.embed_fn([query] + texts))
            sims = np.asarray(cosine_matrix(jnp.asarray(embs[:1]),
                                            jnp.asarray(embs[1:])))[0]
            semantic_hit = bool(sims.max() >= self.semantic_threshold) \
                and pattern_hit  # semantic alone is too trigger-happy
            votes.append(semantic_hit)
        is_ref = pattern_hit or (sum(votes) >= 2)
        return {"is_reference": is_ref, "pattern": pattern_hit,
                "semantic": semantic_hit}


# ---------------------------------------------------------------------------
# Intent recognition
# ---------------------------------------------------------------------------

class IntentRecognizer:
    def __init__(self, llm, detector: Optional[ConversationReferenceDetector]
                 = None):
        self.llm = llm
        self.detector = detector

    def recognize(self, query: str, history: Sequence[Dict] = ()) -> Dict:
        # Pre-check: conversation references route to recall
        # (reference intent_recognizer.py:80-100).
        if self.detector is not None:
            ref = self.detector.detect(query, history)
            if ref["is_reference"]:
                return {"intent": Intent.CLARIFICATION, "confidence": 0.95,
                        "is_conversation_reference": True}
        out = self.llm.structured(
            prompts.INTENT_PROMPT.format(query=query),
            keys=("intent", "confidence", "reasoning"), task="intent")
        try:
            intent = Intent(out.get("intent", ""))
        except ValueError:
            intent = Intent.QUESTION_ANSWERING
        return {"intent": intent,
                "confidence": float(out.get("confidence", 0.5) or 0.5),
                "is_conversation_reference": False}


# ---------------------------------------------------------------------------
# Query rewriting
# ---------------------------------------------------------------------------

_AMBIGUOUS = re.compile(
    r"\b(it|that|this|those|these|he|she|they|them|one)\b", re.IGNORECASE)
_TYPO_HINTS = re.compile(r"(.)\1{2,}|\s{2,}")


class QueryRewriter:
    def __init__(self, llm, max_words_simple: int = 25):
        self.llm = llm
        self.max_words_simple = max_words_simple
        self.stats = {"llm_calls": 0, "skipped": 0}

    # System-1 heuristics (reference :92-102).
    def _needs_simplification(self, q: str) -> bool:
        return len(q.split()) > self.max_words_simple

    def _has_ambiguous_references(self, q: str) -> bool:
        return bool(_AMBIGUOUS.search(q))

    def _needs_reformulation(self, q: str, intent) -> bool:
        return intent in (Intent.MULTI_HOP_REASONING, Intent.COMPARISON) \
            and len(q.split()) > 12

    def _has_obvious_errors(self, q: str) -> bool:
        return bool(_TYPO_HINTS.search(q))

    def rewrite(self, query: str, intent: Optional[Intent] = None,
                history: Optional[Sequence[Dict]] = None) -> Dict:
        needs = {
            "simplify": self._needs_simplification(query),
            "contextualize": self._has_ambiguous_references(query)
            and bool(history),
            "reformulate": self._needs_reformulation(query, intent),
            "correct": self._has_obvious_errors(query),
        }
        if not any(needs.values()):
            self.stats["skipped"] += 1
            return {"original": query, "rewritten": query, "strategies": [],
                    "variants": [query]}
        self.stats["llm_calls"] += 1
        hist_text = "\n".join(
            f"{m.get('role', 'user').upper()}: {m.get('content', '')[:300]}"
            for m in (history or [])[-5:]) or "N/A"
        out = self.llm.structured(
            prompts.REWRITE_PROMPT.format(history=hist_text, query=query),
            keys=("rewritten_query", "simplified", "variants",
                  "corrections_applied"),
            task="rewrite")
        rewritten = str(out.get("rewritten_query") or query).strip() or query
        variants = out.get("variants") or [rewritten]
        if not isinstance(variants, list):
            variants = [str(variants)]
        return {"original": query, "rewritten": rewritten,
                "strategies": [k for k, v in needs.items() if v],
                "variants": [str(v) for v in variants if v][:4] or [rewritten]}

    def decompose_query(self, query: str) -> List[str]:
        raw = self.llm.complete(prompts.DECOMPOSE_PROMPT.format(query=query),
                                task="decompose")
        subs = [re.sub(r"^[\d\-.)\s]+", "", ln).strip()
                for ln in raw.splitlines() if ln.strip()]
        return [s for s in subs if len(s) > 3][:4] or [query]

    def expand_query(self, query: str) -> List[str]:
        raw = self.llm.complete(prompts.EXPAND_PROMPT.format(query=query),
                                task="expand")
        alts = [ln.strip("-• \t") for ln in raw.splitlines() if ln.strip()]
        return [query] + [a for a in alts if len(a) > 3][:2]

    def refine(self, query: str, problems: str) -> str:
        return self.llm.complete(
            prompts.REFINE_PROMPT.format(query=query, problems=problems),
            task="refine").strip() or query


# ---------------------------------------------------------------------------
# Deterministic routing
# ---------------------------------------------------------------------------

_PERSONAL_WORDS = ("me", "my", "i ", "remember", "you told")
_FOLLOWUP_WORDS = ("that", "it", "this", "previous", "earlier")


class QueryRouter:
    """DOCUMENTS-first deterministic routing (reference rag/router.py:26-60;
    its LLM path is dead code and intentionally not reproduced)."""

    def route(self, query: str) -> Dict:
        ql = f" {query.lower()} "
        sources = [Source.DOCUMENTS]
        reasoning = "documents first (local knowledge base priority)"
        if any(f" {w}" in ql for w in _PERSONAL_WORDS):
            sources.append(Source.ARCHIVAL)
            reasoning = "documents + archival (personalization detected)"
        if any(f" {w} " in ql for w in _FOLLOWUP_WORDS):
            sources.append(Source.CONVERSATION)
            reasoning += " + conversation history (follow-up detected)"
        return {"sources": sources, "reasoning": reasoning,
                "confidence": 1.0}
