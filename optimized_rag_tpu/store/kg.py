"""Knowledge graph: triple extraction + multi-hop retrieval.

Re-implements rag/knowledge_graph.py:
  * ``KnowledgeGraphExtractor.extract_triples`` (:40) — LLM prompt
    returning "subject|relation|object" lines, parsed tolerantly, with a
    dependency-free heuristic fallback when no LLM is configured
  * ``KnowledgeGraphRetriever.find_related_entities`` (:180) — BFS up to
    max_hops; each hop is a LIKE scan over the triples table (:219-226)
  * ``query_knowledge_graph`` (:260) — entity extraction + traversal to a
    context string
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional, Set, Tuple

from optimized_rag_tpu.store.db import MetadataStore

Triple = Tuple[str, str, str]

_EXTRACT_PROMPT = """Extract factual (subject, relation, object) triples \
from the text. Output ONE triple per line as: subject|relation|object
Only include facts stated in the text. Text:
{text}
Triples:"""

# Heuristic fallback: "X is/was/has/are Y" patterns.
_HEUR_RE = re.compile(
    r"([A-Z][\w \-]{1,40}?)\s+(is|are|was|were|has|have|uses|contains)\s+"
    r"(?:a |an |the )?([\w \-]{2,50}?)(?:[.,;]|$)", re.MULTILINE)


def parse_triple_lines(raw: str) -> List[Triple]:
    out = []
    for line in raw.splitlines():
        parts = [p.strip() for p in line.split("|")]
        if len(parts) == 3 and all(parts) and len(parts[0]) < 128:
            out.append((parts[0], parts[1], parts[2]))
    return out


class KnowledgeGraphExtractor:
    """``llm_fn(prompt) -> str`` is any text-in/text-out provider."""

    def __init__(self, store: MetadataStore, agent_id: str = "default",
                 llm_fn: Optional[Callable[[str], str]] = None,
                 max_triples_per_doc: int = 50):
        self.store = store
        self.agent_id = agent_id
        self.llm_fn = llm_fn
        self.max_triples = max_triples_per_doc

    def extract_triples(self, text: str) -> List[Triple]:
        if self.llm_fn is not None:
            try:
                raw = self.llm_fn(_EXTRACT_PROMPT.format(text=text[:4000]))
                triples = parse_triple_lines(raw)
                if triples:
                    return triples[: self.max_triples]
            except Exception:
                pass  # fall through to heuristics (fail-open like reference)
        return [(s.strip(), r.strip(), o.strip())
                for s, r, o in _HEUR_RE.findall(text)][: self.max_triples]

    def store_triples(self, triples: List[Triple],
                      source_doc: Optional[int] = None) -> int:
        if not triples:
            return 0
        return self.store.insert_triples(self.agent_id, triples, source_doc)

    def extract_and_store(self, text: str,
                          source_doc: Optional[int] = None) -> int:
        return self.store_triples(self.extract_triples(text), source_doc)


class KnowledgeGraphRetriever:
    def __init__(self, store: MetadataStore, agent_id: str = "default",
                 max_hops: int = 2, max_entities: int = 20):
        self.store = store
        self.agent_id = agent_id
        self.max_hops = max_hops
        self.max_entities = max_entities

    def find_related_entities(self, entity: str,
                              max_hops: Optional[int] = None
                              ) -> List[Triple]:
        """BFS traversal; per hop, a LIKE scan (reference :219-226)."""
        hops = max_hops or self.max_hops
        seen_triples: Set[Triple] = set()
        frontier: Set[str] = {entity.lower()}
        visited: Set[str] = set()
        out: List[Triple] = []
        for _ in range(hops):
            next_frontier: Set[str] = set()
            for ent in frontier:
                if ent in visited or len(visited) >= self.max_entities:
                    continue
                visited.add(ent)
                for t in self.store.find_triples(self.agent_id, ent):
                    if t in seen_triples:
                        continue
                    seen_triples.add(t)
                    out.append(t)
                    next_frontier.add(t[0].lower())
                    next_frontier.add(t[2].lower())
            frontier = next_frontier - visited
            if not frontier:
                break
        return out

    @staticmethod
    def extract_query_entities(query: str) -> List[str]:
        """Capitalized spans + long words (the reference prompts an LLM;
        this keeps the hot path LLM-free)."""
        caps = re.findall(r"\b[A-Z][\w\-]+(?:\s+[A-Z][\w\-]+)*", query)
        longw = [w for w in re.findall(r"[a-zA-Z]{5,}", query)]
        seen, out = set(), []
        for e in caps + longw:
            k = e.lower()
            if k not in seen:
                seen.add(k)
                out.append(e)
        return out[:5]

    def query_knowledge_graph(self, query: str) -> str:
        """Entity extraction + traversal -> context block (reference :260)."""
        lines = []
        for ent in self.extract_query_entities(query):
            for s, r, o in self.find_related_entities(ent, 1):
                lines.append(f"{s} {r} {o}")
        seen, uniq = set(), []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                uniq.append(ln)
        return "\n".join(uniq[:30])
