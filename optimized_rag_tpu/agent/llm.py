"""LLM provider interface + deterministic offline implementation.

The reference hard-wires LangChain ChatOpenAI everywhere
(agent/rag_graph.py:84). Here every LLM call goes through ``LLMProvider``:

  complete(prompt, task=...)      -> str
  structured(prompt, keys, task=...) -> dict

``task`` is a semantic tag ("intent", "rewrite", "generate", ...) that real
providers ignore; the ``DeterministicLLM`` uses it to produce useful,
reproducible behavior without a network (SURVEY.md §4: the agent pipeline
is tested with a deterministic fake LLM so graph logic is hermetic).

``OpenAICompatibleLLM`` speaks the OpenAI chat-completions HTTP protocol
for deployments that do have an endpoint (api_base is required; there is
no hidden default since this build environment has zero egress).
"""

from __future__ import annotations

import json
import math
import re
from typing import Dict, List, Protocol, Sequence


class LLMProvider(Protocol):
    def complete(self, prompt: str, task: str = "", **kw) -> str: ...

    def structured(self, prompt: str, keys: Sequence[str],
                   task: str = "", **kw) -> Dict: ...


# ---------------------------------------------------------------------------
# Deterministic offline LLM
# ---------------------------------------------------------------------------

_QUESTION_WORDS = ("what", "who", "when", "where", "why", "how", "which")

# Enumeration-question cue words (in the RAW query) and the sentence
# structure they should retrieve: explicit item markers "(1) ... (2)" or
# a counted-noun announcement ("three-stage process", "three kinds of").
_ENUM_CUES = {"stages", "steps", "kinds", "types", "phases", "tiers",
              "levels", "components", "parts", "categories"}
_ENUM_MARKS = re.compile(
    r"\(\d\)|\b(two|three|four|five|six|seven)[- ]"
    r"(stage|step|kind|type|phase|tier|level|component|part|categor)",
    re.IGNORECASE)


class DeterministicLLM:
    """Rule-based stand-in producing well-formed outputs per task.

    Good enough to drive every branch of the agent graph in tests and
    offline demos; swap in a real provider for production generation.
    """

    def __init__(self, min_weighted: float = 2.6,
                 min_coverage: float = 0.7,
                 min_evidence_mass: float = 1.45,
                 embed_fn=None, embed_min_sim: float = 0.60):
        # Relevance-bar thresholds (config.VerificationConfig
        # extractive_min_weighted / extractive_min_coverage /
        # extractive_min_evidence_mass): calibrated on the QA sheet,
        # validated on the fresh held-out probes in
        # eval/holdout_probes.py.
        self.min_weighted = min_weighted
        self.min_coverage = min_coverage
        self.min_evidence_mass = min_evidence_mass
        # Embedding rescue channel (round 5): when the query shares
        # almost no lexical surface with the context — the cross-lingual
        # case with translation disabled — sentence selection rides the
        # (cross-lingually trained) encoder instead of term overlap.
        # ``embed_min_sim`` is the refusal bar on best-sentence cosine,
        # calibrated on the EN holdout probes (eval/holdout_probes.py),
        # NOT on the cross-lingual sections it unlocks.
        self.embed_fn = embed_fn
        self.embed_min_sim = embed_min_sim
        self.last_bar: Dict = {}
        self.calls: List[tuple] = []

    # -- helpers ------------------------------------------------------------

    @staticmethod
    def _context_docs(prompt: str) -> List[str]:
        """Pull [N]-tagged context items out of a generation prompt.

        Items are multi-line (chunk text keeps its newlines): each runs
        until the next ``[N]`` line, an auxiliary context section header
        ([Conversation]/[KG]/[Reasoning]/[Synthesis], appended by
        generate_response after the numbered docs), or the blank line
        before the Question/Query/Answer trailer — so auxiliary sections
        never bleed into the last numbered doc and citations stay aligned.
        """
        starts = list(re.finditer(r"^\[\d+\][ \t]*", prompt, re.MULTILINE))
        docs = []
        for j, m in enumerate(starts):
            end = starts[j + 1].start() if j + 1 < len(starts) \
                else len(prompt)
            text = prompt[m.end():end]
            text = re.split(
                r"\n\[(?:Conversation|KG|Reasoning|Synthesis)\]", text)[0]
            if j + 1 == len(starts):
                text = re.split(
                    r"\n\s*\n(?=(?:Core memory|Question|Query|Answer)\b)",
                    text)[0]
            docs.append(" ".join(text.split()))
        return docs

    @staticmethod
    def _query_of(prompt: str) -> str:
        m = re.search(r"(?:Question|Query|QUESTION):\s*(.+)", prompt)
        return m.group(1).strip() if m else prompt.strip().splitlines()[-1]

    # -- API ----------------------------------------------------------------

    def complete(self, prompt: str, task: str = "", **kw) -> str:
        self.calls.append((task, prompt[:120]))
        if task == "intent":
            return self._intent(self._query_of(prompt))
        if task == "translate":
            return self._query_of(prompt)
        if task in ("rewrite", "refine"):
            q = self._query_of(prompt)
            return q if task == "rewrite" else q + " (refined)"
        if task == "extract_claims":
            m = re.search(r"ANSWER:\s*(.+?)(?:\nClaims:|$)", prompt,
                          re.DOTALL)
            answer = m.group(1).strip() if m else self._query_of(prompt)
            sents = [s.strip() for s in re.split(r"(?<=[.!?])\s+", answer)
                     if s.strip()]
            return "\n".join(f"{i+1}. {s}" for i, s in enumerate(sents[:10]))
        if task == "verify_claim":
            # SUPPORTED iff >=40% of claim words appear in the evidence.
            m = re.search(r"CLAIM:\s*(.+?)\nEVIDENCE:\s*(.+)", prompt,
                          re.DOTALL)
            if m:
                claim_w = set(m.group(1).lower().split())
                ev_w = set(m.group(2).lower().split())
                ratio = len(claim_w & ev_w) / max(len(claim_w), 1)
                if ratio >= 0.4:
                    return "SUPPORTED (confidence: 0.9)"
            return "NOT_SUPPORTED (confidence: 0.9)"
        if task == "faithfulness":
            return "0.9"
        if task in ("cot", "synthesize"):
            docs = self._context_docs(prompt)
            return " ".join(docs[:3]) if docs else "No context available."
        if task == "extract_facts":
            # Only scan the conversation payload, not the instruction text.
            m = re.search(r"User:\s*(.+?)\nAssistant:\s*(.+?)(?:\nFacts:|$)",
                          prompt, re.DOTALL)
            convo = " ".join(m.groups()) if m else ""
            convo = " ".join(s for s in re.split(r"(?<=[.!?])\s+", convo)
                             if not s.rstrip().endswith("?"))
            facts = re.findall(
                r"\b((?:my|i)\s+[\w ]{2,40}\s+(?:is|are|likes?|prefer)\s+"
                r"[\w ]{2,40})", convo, re.IGNORECASE)
            return "\n".join(f"- {f.strip()}" for f in facts[:3]) or "NONE"
        if task == "extract_triples":
            # Simulated LLM extraction = the shared pattern extractor
            # over the prompt's text payload (quality measured by
            # eval/kg_eval.py). Lazy import: llm.py must not pull the
            # store package at module load.
            from optimized_rag_tpu.store.kg import heuristic_triples
            m = re.search(r"Text:\s*(.+?)\s*Triples:", prompt, re.DOTALL)
            payload = m.group(1) if m else prompt
            return "\n".join(f"{s}|{r}|{o}"
                             for s, r, o in heuristic_triples(payload)[:20])
        if task == "generate":
            return self._generate(prompt)
        if task == "conversation_reference":
            # Vote IS_REFERENCE when the query names conversation artifacts
            # or points backwards; NOT_REFERENCE otherwise.
            q = self._query_of(prompt).lower()
            cues = ("question", "answer", "said", "asked", "earlier",
                    "mention", "pergunt", "respost", "disse", "convers",
                    "isso", "aquilo")
            hit = any(c in q for c in cues)
            return ("IS_REFERENCE 0.8" if hit else "NOT_REFERENCE 0.8")
        # default echo
        return self._query_of(prompt)

    def structured(self, prompt: str, keys: Sequence[str],
                   task: str = "", **kw) -> Dict:
        self.calls.append((f"structured:{task}", prompt[:120]))
        if task == "intent":
            q = self._query_of(prompt)
            return {"intent": self._intent(q), "confidence": 0.9,
                    "reasoning": "keyword heuristics"}
        if task == "rewrite":
            q = self._query_of(prompt)
            return {"rewritten_query": q, "simplified": q, "variants": [q],
                    "corrections_applied": False}
        if task == "generate":
            answer = self._generate(prompt)
            return {"answer": answer,
                    "citations": sorted({int(m) for m in
                                         re.findall(r"\[(\d+)\]", answer)})}
        if task == "tier3_decision":
            # Mirror the reference's decision criteria deterministically
            # (hierarchical_retriever.py:556-561): recency keywords or low
            # local scores -> web search; otherwise sufficient.
            m = re.search(r"User query:\s*(.+)", prompt)
            query = m.group(1).strip() if m else ""
            scores = [float(s) for s in
                      re.findall(r"\(score:\s*([0-9.]+)\)", prompt)]
            recency = bool(re.search(
                r"\b(latest|recent|current|today|20\d\d)\b", query,
                re.IGNORECASE))
            insufficient = recency or not scores or max(scores) < 0.5
            return {"sufficient": not insufficient,
                    "use_web_search": insufficient,
                    "search_query": query}
        return {k: "" for k in keys}

    # -- internals ----------------------------------------------------------

    @staticmethod
    def _intent(q: str) -> str:
        ql = q.lower()
        if any(w in ql for w in ("compare", "versus", " vs ", "difference")):
            return "comparison"
        if "summar" in ql:
            return "summarization"
        if any(w in ql for w in ("is it true", "fact check", "verify")):
            return "fact_checking"
        if ql.count("?") > 1 or " and then " in ql or "relationship" in ql:
            return "multi_hop_reasoning"
        if any(ql.startswith(w) for w in ("find", "search", "look up")):
            return "search"
        if any(w in ql for w in ("you said", "you mentioned", "earlier",
                                 "my first question", "what did i")):
            return "clarification"
        if any(w in ql for w in _QUESTION_WORDS):
            return "question_answering"
        if ql.rstrip().endswith("?"):
            return "question_answering"
        return "conversational"

    _STOP = frozenset(
        "the a an is are was were of to and in on by for with that this "
        "its as at or it do does did what which who when where why how "
        "much many size shape have has had can could would should".split())

    @classmethod
    def _stem(cls, w: str) -> str:
        if w.endswith("ies") and len(w) >= 5:      # applies -> apply
            w = w[:-3] + "y"
        else:
            for suf in ("ings", "ions", "ing", "ion", "edly", "ed",
                        "es", "s"):
                if w.endswith(suf) and len(w) - len(suf) >= 3:
                    w = w[: -len(suf)]
                    break
            # applied -> appli -> apply, so -ied/-ies/-y forms meet.
            if len(w) > 3 and w[-1] == "i":
                w = w[:-1] + "y"
        # Adverb -ly (quickly -> quick) — but not the -ply verb family
        # (apply, reply, supply), whose base ends in "ly" itself.
        if w.endswith("ly") and not w.endswith("ply") \
                and len(w) - 2 >= 3:
            w = w[:-2]
        # Normalize inflection artifacts so base and derived forms meet:
        # scanning->scann->scan (vs scan), storing->stor (vs store->stor).
        if len(w) > 3 and w[-1] == w[-2] and w[-1] not in "aeiou0123456789":
            w = w[:-1]
        if len(w) > 3 and w[-1] == "e":
            w = w[:-1]
        return w

    @staticmethod
    def _non_english(text: str) -> bool:
        from optimized_rag_tpu.utils.lang import detect_language
        return detect_language(text) not in (None, "en")

    def _embed_extract(self, query: str, doc_sents, live):
        """Encoder-space sentence selection for zero-lexical-overlap
        queries. Returns the cited answer string, or None (refuse) when
        the best sentence's cosine is below ``embed_min_sim``."""
        import numpy as np
        flat = [(i, j) for i, j in live]
        texts = [doc_sents[i][j] for i, j in flat]
        vecs = np.asarray(self.embed_fn([query] + texts))
        sims = vecs[1:] @ vecs[0]
        order = np.argsort(-sims)
        best = float(sims[order[0]])
        self.last_bar = {"embed_best": round(best, 4),
                         "embed_used": True,
                         "embed_min_sim": self.embed_min_sim,
                         "n_sents": len(texts)}
        if best < self.embed_min_sim:
            return None
        i, j = flat[int(order[0])]
        ans = re.sub(r"\s*\[\d+\]", "", doc_sents[i][j]).strip()
        parts = [f"{ans} [{i + 1}]"]
        # Append one distinct runner-up inside the margin (same rule of
        # thumb as the lexical channel's 60% second-sentence rule).
        if len(order) > 1 and float(sims[order[1]]) >= max(
                0.92 * best, self.embed_min_sim):
            i2, j2 = flat[int(order[1])]
            if (i2, j2) != (i, j):
                s2 = re.sub(r"\s*\[\d+\]", "",
                            doc_sents[i2][j2]).strip()
                parts.append(f"{s2} [{i2 + 1}]")
        return " ".join(parts)

    def _generate(self, prompt: str) -> str:
        """Global sentence-level extraction with per-sentence citations.

        Every sentence of every numbered doc is scored against the query:
        stemmed unigram overlap weighted by sentence-level IDF (a query
        term appearing in half the context's sentences — e.g. the
        subject entity's name — carries less evidence than a term
        appearing in one), doubled IDF-weighted bigram hits, a 1.5×
        boost on the question's fronted focus term, a length
        normalization that stops run-on pseudo-sentences (title/author
        blocks in PDFs) from winning on raw term count, and a
        redundancy split so N sentences matching in the identical way
        (running headers, restated proposal sentences) share one
        sentence's worth of credit. The refusal bar stays on RAW match
        counts so reweighting never changes what gets refused. The best
        sentence wins; a second is appended only when it scores within
        60% of the winner and matches differently than the winner —
        each cited with ITS OWN doc number, so citations always point
        at the sentence's true source.
        """
        docs = self._context_docs(prompt)
        if not docs:
            return ("I don't have enough information in the provided "
                    "context to answer that.")
        q_raw = re.findall(r"[a-z0-9]+", self._query_of(prompt).lower())
        q_terms = [self._stem(w) for w in q_raw
                   if w not in self._STOP and len(w) > 2]
        q_set = set(q_terms)
        q_bigrams = {(a, b) for a, b in zip(q_terms, q_terms[1:])}
        noise = {"user", "assistant", "conversation"}

        def words(text):
            return [self._stem(w) for w in
                    re.findall(r"[a-z0-9]+", text.lower())]

        from optimized_rag_tpu.agent.verification import split_sentences
        doc_sents = [[s for s in split_sentences(doc.strip())
                      if len(s) >= 3] for doc in docs]
        sent_words = [[words(s) for s in sents] for sents in doc_sents]
        sent_sets = [[set(sw) for sw in sws] for sws in sent_words]
        # Exact-duplicate sentences (ordinary chunk overlap replicates
        # the same sentence into several retrieved chunks) are ONE
        # sentence: keep the first occurrence and drop the rest from
        # candidates and statistics, so scoring and the refusal bars
        # are invariant to how many chunks happen to repeat a sentence.
        seen_sent: set = set()
        live = []                          # (doc_idx, sent_idx)
        for i, sws in enumerate(sent_words):
            for j, sw in enumerate(sws):
                key = tuple(sw)
                if key and key not in seen_sent:
                    seen_sent.add(key)
                    live.append((i, j))

        # Sentence-level IDF over the context: normalized so an
        # average-rarity query term contributes ~1.0, keeping the
        # min_score bar below in absolute units.
        n_sents = len(live) or 1
        df = {t: sum(t in sent_sets[i][j] for i, j in live)
              for t in q_set}
        idf = {t: math.log((1.0 + n_sents) / (1.0 + df[t])) + 0.1
               for t in q_set}
        mean_idf = (sum(idf.values()) / len(idf)) if idf else 1.0
        w = {t: v / mean_idf for t, v in idf.items()} if mean_idf else idf
        # English wh-questions front their focus ("What LEARNING RATE
        # does...", "What GUIDES..."): the first content term is the
        # question's head — a sentence matching it is far likelier to
        # answer than one echoing the subject entity's name.
        if q_terms:
            w[q_terms[0]] = w.get(q_terms[0], 1.0) * 1.5

        def score(sw, s_set):
            """(weighted score, raw match count for the bar, signature)."""
            hits = q_set & s_set
            bi_hits = q_bigrams & set(zip(sw, sw[1:]))
            # A sentence that only echoes the query (e.g. the user's
            # question surfaced from recall memory) answers nothing.
            novel_words = s_set - q_set - self._STOP - noise
            if not novel_words:
                return 0.0, 0.0, None
            uni = sum(w[t] for t in hits)
            bi = sum((w[a] + w[b]) / 2.0 for (a, b) in bi_hits)
            # Run-on pseudo-sentences (PDF title/author blocks never
            # broken by punctuation) accumulate matches by sheer size.
            length_norm = max(1.0, math.sqrt(len(sw) / 30.0))
            return ((uni + 2.0 * bi) / length_norm,
                    len(hits) + 2.0 * len(bi_hits),
                    (frozenset(hits), frozenset(bi_hits)))

        # Enumeration questions ("What are the STAGES/KINDS of X?") are
        # ANSWER-TYPE questions: the asker wants the sentence that lists
        # the items, yet a title/summary sentence restating X's name
        # always outscores it on entity-term overlap (observed: "What
        # are the stages of Deep GraphRAG's hierarchical retrieval
        # strategy?" picked the conclusion's one-line summary at 6.8
        # weighted over the "(1) inter-community filtering; (2) ..."
        # sentence at 2.1 — no bounded boost can honestly close a 3x
        # entity-echo gap). So enumeration-structured candidates form a
        # preferred pool, and the pool's best wins outright when it
        # carries at least a quarter of the top score (below that it is
        # an off-topic list, not the asked-for enumeration). Ranking
        # only — best_weighted/best_raw for the refusal bars are
        # pool-blind.
        enum_q = bool(_ENUM_CUES.intersection(q_raw))
        cands = []               # (score, doc_idx, sent_idx, signature)
        enum_marked = set()      # (doc_idx, sent_idx) with list structure
        best_raw = 0.0
        best_weighted = 0.0      # BEFORE the redundancy split
        sig_count: Dict = {}
        for i, j in live:
            s, raw, sig = score(sent_words[i][j], sent_sets[i][j])
            if s > 0:
                best_raw = max(best_raw, raw)
                best_weighted = max(best_weighted, s)
                if enum_q and _ENUM_MARKS.search(doc_sents[i][j]):
                    enum_marked.add((i, j))
                cands.append((s, i, j, sig))
                sig_count[sig] = sig_count.get(sig, 0) + 1
        # Redundancy: N sentences matching the query in the identical
        # way (same hit/bigram signature — running headers, a proposal
        # sentence restated in abstract+intro+conclusion) are one piece
        # of evidence, not N; split their credit so a uniquely-matching
        # sentence can win. Ranking only: the refusal bars below use the
        # pre-split maximum, so a good sentence duplicated by chunk
        # overlap never flips an answer into a refusal.
        cands = [(s / math.sqrt(sig_count[sig]), i, j, sig)
                 for (s, i, j, sig) in cands]
        # Relevance bar: an off-topic question (the reference
        # instrument's closing "nada a ver" probes, validacao.md:80-89)
        # still shares generic terms (search, token, model) with SOME
        # sentence, but its distinctive terms appear nowhere — so the
        # context covers little of the query's idf mass AND the best
        # sentence carries little weighted evidence. Measured on the QA
        # sheet: off-topic winners ≤2.49 weighted at coverage ≤0.48;
        # legitimate answers ≥3.08 or coverage 1.0. Held-out validation
        # (fresh probes never used for tuning): eval/holdout_probes.py.
        ctx_terms = set().union(*(sent_sets[i][j] for i, j in live)) \
            if live else set()
        q_mass = sum(w[t] for t in q_set) or 1e-9
        qcov = sum(w[t] for t in q_set & ctx_terms) / q_mass
        # Observability: the values the refusal decision is about to use
        # (reading them beats re-deriving the pipeline when a probe
        # answers or a legitimate question refuses unexpectedly).
        self.last_bar = {
            "best_weighted": best_weighted, "qcov": qcov,
            "best_raw": best_raw, "n_sents": n_sents,
            "q_terms": sorted(q_set),
            "missing_terms": sorted(q_set - ctx_terms)}
        # n_sents >= 8: in a tiny context every present term has df ~
        # n_sents, idf degenerates and the weighted score means nothing.
        if len(q_set) >= 4 and n_sents >= 8 \
                and best_weighted < self.min_weighted \
                and qcov < self.min_coverage:
            cands = []
        # Coverage-weighted evidence rail: in the low-coverage regime a
        # strong-looking sentence can be built entirely from the query's
        # generic half (the distinctive subject absent from the ENTIRE
        # context), so the evidence required scales inversely with
        # coverage — best_weighted * qcov must clear min_evidence_mass.
        if len(q_set) >= 4 and n_sents >= 8 \
                and qcov < self.min_coverage \
                and best_weighted * qcov < self.min_evidence_mass:
            cands = []
        # Embedding rescue channel: a NON-ENGLISH query with translation
        # disabled shares almost no lexical surface with the EN context
        # (qcov ~ 0) — expected, not evidence of off-topic-ness — and
        # the cross-lingually trained encoder can still rank the EN
        # sentences (models/xlingual.py). The channel keeps its own
        # refusal bar (best cosine >= embed_min_sim) and fires ONLY for
        # non-English queries, so every English path — probes, sheets,
        # tests — is byte-identical with the channel configured.
        query_text = self._query_of(prompt)
        if self.embed_fn is not None and live and qcov < 0.25 \
                and self._non_english(query_text):
            ans = self._embed_extract(query_text, doc_sents, live)
            if ans is not None:
                return ans
            return ("I don't have enough information in the provided "
                    "context to answer that.")
        # Minimum-evidence bar: a multi-term query whose best sentence
        # shares only one content word is off-topic context, not an
        # answer — refuse rather than extract (the reference's factuality
        # gate refuses low-support answers the same way). The bar uses
        # RAW match counts (IDF reweighting only affects ranking).
        min_score = 2.0 if len(q_set) >= 3 else 1.0
        if not cands or best_raw < min_score:
            return ("I don't have enough information in the provided "
                    "context to answer that.")
        cands.sort(key=lambda t: (-t[0], t[1], t[2]))
        sc, i, j, win_sig = cands[0]
        if enum_marked:
            pool = [c for c in cands if (c[1], c[2]) in enum_marked]
            if pool and pool[0][0] >= 0.25 * sc:
                sc, i, j, win_sig = pool[0]

        def clean(sent: str) -> str:
            # Strip the SOURCE's own inline citation markers ("[22]" in
            # academic text): kept verbatim they read as this answer's
            # doc citations and point at nothing.
            return re.sub(r"\s*\[\d+\]", "", sent).strip()

        winner = doc_sents[i][j]
        parts = [f"{clean(winner)} [{i + 1}]"]
        # An enumeration announcement ("maintains three kinds of memory",
        # "consists of:") carries its content in the FOLLOWING sentences —
        # append them from the same doc so the items make it into the
        # answer.
        enum = re.search(
            r"\b(?:two|three|four|five|several)[-\s]+(?:kinds?|types?|"
            r"tiers?|levels?|parts?|components?|stages?|categories|"
            r"memories|modes?)\b", winner, re.IGNORECASE) \
            or winner.endswith(":")
        if enum:
            for follow in doc_sents[i][j + 1: j + 4]:
                parts.append(f"{clean(follow)} [{i + 1}]")
        else:
            for s, i2, j2, sig2 in cands[1:]:
                # Skip restatements that match exactly like the winner
                # (same signature): they add words, not evidence.
                if (i2, j2) != (i, j) and sig2 != win_sig \
                        and s >= 0.6 * sc:
                    parts.append(f"{clean(doc_sents[i2][j2])} [{i2 + 1}]")
                    break
        return " ".join(parts)


# ---------------------------------------------------------------------------
# OpenAI-compatible HTTP provider
# ---------------------------------------------------------------------------

class OpenAICompatibleLLM:
    """Minimal chat-completions client (stdlib urllib; no SDK dependency)."""

    def __init__(self, api_base: str, model: str, api_key: str = "",
                 temperature: float = 0.0, timeout: float = 60.0,
                 cost_tracker=None):
        self.api_base = api_base.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.temperature = temperature
        self.timeout = timeout
        self.cost_tracker = cost_tracker

    def _post(self, messages: List[Dict], **kw) -> str:
        import urllib.request
        body = json.dumps({
            "model": self.model, "messages": messages,
            "temperature": kw.get("temperature", self.temperature),
        }).encode()
        req = urllib.request.Request(
            f"{self.api_base}/chat/completions", data=body,
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {self.api_key}"})
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            data = json.loads(resp.read())
        usage = data.get("usage", {})
        if self.cost_tracker is not None:
            self.cost_tracker.track_llm(usage.get("prompt_tokens", 0),
                                        usage.get("completion_tokens", 0),
                                        self.model)
        return data["choices"][0]["message"]["content"]

    def complete(self, prompt: str, task: str = "", **kw) -> str:
        return self._post([{"role": "user", "content": prompt}], **kw)

    def structured(self, prompt: str, keys: Sequence[str],
                   task: str = "", **kw) -> Dict:
        schema_hint = ("\nRespond with ONLY a JSON object with keys: "
                       + ", ".join(keys))
        raw = self.complete(prompt + schema_hint, task=task, **kw)
        m = re.search(r"\{.*\}", raw, re.DOTALL)
        try:
            return json.loads(m.group(0) if m else raw)
        except json.JSONDecodeError:
            return {k: "" for k in keys}
