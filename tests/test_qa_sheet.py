"""Hermetic tests for the graded QA sheet (eval/qa_sheet.py).

The sheet is the analog of the reference's manual QA instrument
(/root/reference/validacao.md); these tests pin the grader semantics —
substring accuracy, refusal handling, citation validity — with a stub
agent so no model or index is built.
"""

from types import SimpleNamespace

from optimized_rag_tpu.eval.qa_sheet import (
    PDF_SHEET, QA_SHEET, QAItem, _citation_validity, run_sheet)


class _StubAgent:
    """Maps question -> canned response; mimics the chat surface
    run_sheet touches (chat(), memory.agent_id)."""

    def __init__(self, responses):
        self._responses = responses
        self.memory = SimpleNamespace(agent_id="stub")

    def chat(self, question):
        return self._responses[question]


def _resp(answer, refused=False, sources=(), support=1.0):
    return SimpleNamespace(
        answer=answer, refused=refused, sources=list(sources),
        support_ratio=support, factuality_score=0.9, confidence=0.8)


def test_run_sheet_grades_accuracy_and_refusals():
    sheet = [
        QAItem("a", "q-hit", ["the right fact"]),
        QAItem("b", "q-miss", ["absent key"]),
        QAItem("c", "q-unans", unanswerable=True),
    ]
    agent = _StubAgent({
        "q-hit": _resp("Indeed, the right fact holds [1].",
                       sources=[{"text": "the right fact holds here"}]),
        "q-miss": _resp("Something unrelated."),
        "q-unans": _resp("I don't have enough information to answer."),
    })
    out = run_sheet(agent, sheet=sheet, verbose=False)
    rows = {r["id"]: r for r in out["rows"]}
    assert rows["a"]["correct"] and not rows["a"]["refused"]
    assert not rows["b"]["correct"]
    assert rows["c"]["correct"] and rows["c"]["refused"]
    s = out["summary"]
    assert s["answer_accuracy"] == 0.5          # a of (a, b)
    assert s["unanswerable_refused"] == 1.0


def test_run_sheet_isolates_memory_per_question():
    seen = []

    class _Agent(_StubAgent):
        def chat(self, question):
            seen.append(self.memory.agent_id)
            return _resp("x")

    agent = _Agent({})
    run_sheet(agent, sheet=[QAItem("i1", "q1", ["x"]),
                            QAItem("i2", "q2", ["x"])], verbose=False)
    assert len(set(seen)) == 2                  # fresh id per question
    assert agent.memory.agent_id == "stub"      # restored after the run


def test_citation_validity_rules():
    srcs = [{"text": "the quick brown fox jumps over the lazy dog"}]
    # supported citation
    assert _citation_validity(
        "The quick brown fox jumps high [1].", srcs) is True
    # out-of-range index
    assert _citation_validity("Fact [3].", srcs) is False
    # cited source shares no content with the sentence
    assert _citation_validity(
        "Completely unrelated assertion about pallas kernels [1].",
        srcs) is False
    # no citations at all -> None (not graded)
    assert _citation_validity("No citations here.", srcs) is None
    # a leading citation on the FIRST sentence owns that sentence's
    # body (regression: empty prev_body skipped the overlap check, so
    # '[1] Unrelated.' graded valid against any source)
    assert _citation_validity(
        "[1] Unrelated assertion about pallas kernels.", srcs) is False
    assert _citation_validity(
        "[1] The quick brown fox jumps over the dog.", srcs) is True
    # ...while a leading citation on a LATER sentence still attaches to
    # the preceding sentence (the generators emit them post-period)
    assert _citation_validity(
        "The quick brown fox jumps over the dog. [1] It lands.",
        srcs) is True


def test_pdf_sheet_hygiene():
    ids = [q.id for q in PDF_SHEET]
    assert len(ids) == len(set(ids))
    assert all(i.startswith("pdf-") for i in ids)
    assert not any(i in {q.id for q in QA_SHEET} for i in ids)
    for q in PDF_SHEET:
        assert q.expect_any or q.unanswerable, q.id
        for key in q.expect_any:
            # grading lowercases the answer; keys must be lowercase and,
            # because the stdlib extractor preserves fi/fl ligatures from
            # the reference PDFs verbatim, must not contain them.
            assert key == key.lower(), (q.id, key)
            assert "fi" not in key and "fl" not in key, (q.id, key)


def test_run_sheet_isolates_adaptive_weights():
    """Each question must see a FRESH DW-GRPO weight manager: weights
    learned from one question's feedback must not shift the retrieval
    blend of the next (sheet results were question-order-dependent)."""
    from optimized_rag_tpu.engine.adaptive import DynamicWeightManager

    seen = []

    class _Agent(_StubAgent):
        def chat(self, question):
            seen.append((self.weight_manager.agent_id,
                         self.weight_manager.db))
            return _resp("x")

    agent = _Agent({})
    base = DynamicWeightManager(agent_id="base", db=object())
    agent.weight_manager = base
    run_sheet(agent, sheet=[QAItem("i1", "q1", ["x"]),
                            QAItem("i2", "q2", ["x"])], verbose=False)
    ids = [s[0] for s in seen]
    assert len(set(ids)) == 2 and "base" not in ids
    assert all(db is None for _, db in seen)    # no cross-run persistence
    assert agent.weight_manager is base         # restored after the run


def test_holdout_probes_are_fresh_and_well_formed():
    """The held-out instrument (eval/holdout_probes.py) must not reuse
    any QA_SHEET/PDF_SHEET question (that would re-circularize the bar)
    and must keep the 12+12 answerable/off-topic split."""
    from optimized_rag_tpu.eval.holdout_probes import HOLDOUT_SHEET
    tuned_questions = {i.question.lower() for i in QA_SHEET + PDF_SHEET}
    ids = [i.id for i in HOLDOUT_SHEET]
    assert len(ids) == len(set(ids))
    answerable = [i for i in HOLDOUT_SHEET if not i.unanswerable]
    probes = [i for i in HOLDOUT_SHEET if i.unanswerable]
    assert len(answerable) >= 10 and len(probes) >= 10
    for item in HOLDOUT_SHEET:
        assert item.question.lower() not in tuned_questions, item.id
        if not item.unanswerable:
            assert item.expect_any, item.id


def test_holdout_gate_semantics():
    """false_answers / wrongful_refusals accounting behind the gate."""
    from optimized_rag_tpu.eval.holdout_probes import HOLDOUT_SHEET
    sheet = [QAItem("a", "good q", ["fact"]),
             QAItem("p", "offtopic q", unanswerable=True)]
    agent = _StubAgent({
        "good q": _resp("the fact [1]", sources=[{"text": "the fact"}]),
        "offtopic q": _resp("A made-up confident answer."),
    })
    out = run_sheet(agent, sheet=sheet, verbose=False)
    probes = [r for r in out["rows"] if r["unanswerable"]]
    assert sum(not r["correct"] for r in probes) == 1  # false answer
