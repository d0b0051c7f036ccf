"""ICTSampler and the docstring-harvest corpus source."""

import numpy as np
import pytest

from optimized_rag_tpu.models.corpus import harvest_docstrings
from optimized_rag_tpu.models.pretrain import ICTSampler, ict_pairs

TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "matrix multiplication dominates transformer training compute budgets",
    "tiny",
    "chunked documents embed into a shared dense vector space for search",
]


def test_ict_sampler_spans_come_from_source_chunk():
    s = ICTSampler(TEXTS, min_span=2, max_span=4)
    rng = np.random.default_rng(0)
    q, d, picks = s.sample(rng, 32)
    assert len(q) == len(d) == len(picks) == 32
    for span, doc, i in zip(q, d, picks):
        assert doc == TEXTS[i]
        assert 2 <= len(span.split()) <= 4
        for w in span.split():
            assert w in doc.lower()


def test_ict_sampler_skips_too_short_texts():
    s = ICTSampler(TEXTS, min_span=2, max_span=4)
    assert 2 not in s.usable          # "tiny" has one word


def test_ict_pairs_back_compat():
    rng = np.random.default_rng(1)
    q, d, picks = ict_pairs(TEXTS, rng, 8)
    assert len(q) == 8 and all(d[j] == TEXTS[picks[j]] for j in range(8))


def test_ict_sampler_rejects_empty():
    with pytest.raises(ValueError):
        ICTSampler(["a", ""])


def test_harvest_docstrings_numpy_only():
    chunks = harvest_docstrings(packages=["numpy"], max_files_per_pkg=40,
                                max_chunks=50, min_chars=200,
                                max_chars=1000)
    assert 0 < len(chunks) <= 50
    assert all(len(c) >= 150 for c in chunks)   # re-packed paragraphs
    assert len(set(chunks)) == len(chunks)      # deduped
    # deterministic
    again = harvest_docstrings(packages=["numpy"], max_files_per_pkg=40,
                               max_chunks=50, min_chars=200,
                               max_chars=1000)
    assert chunks == again


def test_harvest_docstrings_unknown_package_is_empty():
    assert harvest_docstrings(packages=["not_a_real_pkg_xyz"]) == []
