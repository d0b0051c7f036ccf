"""Native C++ analyzer: build + bit-parity with the Python implementations."""

import re
from collections import Counter

import numpy as np
import pytest

from optimized_rag_tpu import native
from optimized_rag_tpu.index.lexical import LexicalIndex, lexical_tokens
from optimized_rag_tpu.models.tokenizer import HashTokenizer


@pytest.fixture(scope="module")
def built():
    if not native.available() and not native.build():
        pytest.skip("native toolchain unavailable")
    return True


SAMPLES = [
    "The quick brown fox jumps over the lazy dog!",
    "TPUs multiply 128x128 matrices, fast -- in bfloat16.",
    "a the and of in is",             # all stopwords
    "",
    "punctuation: (parens) [brackets] {braces} ... !!!",
    "Supercalifragilisticexpialidocious antidisestablishmentarianism",
    "mixed CASE Text With   Multiple   spaces\nand\nnewlines",
    # Control bytes: tokens in the model regex ([^\sa-z0-9] matches
    # \x01/\x7f; \x1c-\x1f are Python whitespace), plain separators in
    # the lexical path — both must agree with their Python oracles.
    "word\x7fother a\x01b\x1cc d\x00e",
]


def test_lexical_tokenize_parity(built):
    idx = LexicalIndex(vocab_hash_bits=15)
    for text in SAMPLES:
        want = [idx._term_id(t) for t in lexical_tokens(text)]
        got = native.tokenize_hash(text, idx.vocab_size)
        assert got is not None
        assert got.tolist() == want, text


def test_term_counts_parity(built):
    idx = LexicalIndex(vocab_hash_bits=15)
    for text in SAMPLES:
        toks = lexical_tokens(text)
        want = Counter(idx._term_id(t) for t in toks)
        res = native.term_counts(text, idx.vocab_size)
        assert res is not None
        terms, tfs, dlen = res
        assert dlen == len(toks), text
        assert dict(zip(terms.tolist(), tfs.tolist())) == dict(want), text


def test_model_tokenize_parity(built):
    tok = HashTokenizer(vocab_size=32768)
    # Force the pure-Python path for the oracle.
    py = lambda t: [tok._tid(w) for w in _py_words(t)]  # noqa: E731

    def _py_words(text):
        out = []
        for w in re.findall(r"[a-z0-9]+|[^\sa-z0-9]", text.lower()):
            out.append(w)
            if len(w) > 12:
                out.extend("##" + w[i:i + 3]
                           for i in range(0, len(w) - 2, 3))
        return out

    for text in SAMPLES:
        got = native.model_tokenize(text, 32768)
        assert got is not None
        assert got == py(text), text


def test_non_ascii_falls_back(built):
    assert native.tokenize_hash("café résumé", 1024) is None
    assert native.model_tokenize("日本語テキスト", 1024) is None


def test_lexical_index_same_results_native_vs_python(built):
    texts = [s for s in SAMPLES if s.strip()]
    a = LexicalIndex(vocab_hash_bits=14)
    a.add(texts)                      # native path (ASCII)
    b = LexicalIndex(vocab_hash_bits=14)
    # Force python path by monkeypatching availability.
    import optimized_rag_tpu.native as nat
    saved = nat._lib
    nat._lib = None
    nat._load_attempted = True
    try:
        b.add(texts)
    finally:
        nat._lib = saved
    s1, i1 = a.search("quick brown matrices", k=4)
    s2, i2 = b.search("quick brown matrices", k=4)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_vocab_tokenizer_native_matches_python(built):
    """Learned-vocab fast path (orag_vocab_tokenize): bit-identical ids
    on ASCII text, including head-vocab hits, hash fallback, OOV
    trigrams, punctuation singles (vocab-eligible), and empty input."""
    from optimized_rag_tpu.models.tokenizer import VocabTokenizer
    words = ["the", "matrix", "unit", "systolic", "array", "retrieval",
             "memory", "?", "a1b2", "extraordinarilylongword"]
    vt = VocabTokenizer(words, vocab_size=4096)
    cases = SAMPLES + [
        "The matrix unit is a 128x128 systolic array?",
        "unknown extraordinarilylongword vs anotherveryverylongoovword",
        "punct: (parens), [brackets]; 'quotes'! ###",
        "a1b2 A1B2 mixed CASE Memory",
        "",
        # Control bytes: Python's [^\sa-z0-9] emits a token for \x01 /
        # \x7f etc. while \x1c-\x1f are unicode whitespace — the native
        # path silently DROPPED the former (regression: same text, two
        # id sequences depending on .so availability).
        "word\x7fother",
        "a\x01b\x1cc d\x00e \x08tail\x1f",
    ]
    for text in [c for c in cases if c.isascii()]:
        fast = vt.tokenize(text)
        handle = vt._native_handle
        assert handle is not None
        vt._native_handle = None
        try:
            slow = vt.tokenize(text)
        finally:
            vt._native_handle = handle
        assert fast == slow, text


def test_vocab_tokenizer_non_ascii_falls_back(built):
    from optimized_rag_tpu import native
    from optimized_rag_tpu.models.tokenizer import VocabTokenizer
    vt = VocabTokenizer(["resume"], vocab_size=4096)
    # Non-ASCII text routes to Python (authoritative); still tokenizes,
    # and the native entry point itself declines it.
    ids = vt.tokenize("café résumé")
    assert ids
    assert vt._native_handle is not None
    assert native.vocab_tokenize(vt._native_handle, "café") is None
    # ASCII text with the same tokenizer still takes the fast path.
    assert vt.tokenize("resume the resume") == \
        [4, vt._tid("the"), 4]
