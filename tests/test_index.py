"""Dense / lexical / IVF index behavior vs exact oracles."""

import jax.numpy as jnp
import numpy as np

from optimized_rag_tpu.index.dense import DenseIndex
from optimized_rag_tpu.index.ivf import IVFIndex
from optimized_rag_tpu.index.lexical import LexicalIndex, lexical_tokens
from optimized_rag_tpu.index.snapshot import load_state, save_state


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


# --------------------------------------------------------------------- dense

def test_dense_add_search_exact(rng):
    idx = DenseIndex(dim=64, capacity_block=1024, tile=256)
    docs = _unit(rng, 500, 64)
    ids = idx.add(docs)
    assert ids.tolist() == list(range(500))
    q = _unit(rng, 3, 64)
    res = idx.search(q, k=5)
    oracle = np.argsort(-(q @ docs.T), axis=1)[:, :5]
    np.testing.assert_array_equal(res.ids, oracle)


def test_dense_growth_across_capacity_block(rng):
    idx = DenseIndex(dim=32, capacity_block=256, tile=256)
    a = idx.add(_unit(rng, 200, 32))
    b = idx.add(_unit(rng, 200, 32))  # crosses 256 capacity
    assert idx.capacity >= 400 and idx.size == 400
    assert b[0] == 200
    res = idx.search(_unit(rng, 1, 32), k=10)
    assert (res.ids >= 0).all()


def test_dense_delete_excludes_and_compact_remaps(rng):
    idx = DenseIndex(dim=32, capacity_block=256, tile=256)
    docs = _unit(rng, 50, 32)
    idx.add(docs)
    # Query identical to doc 7 -> doc 7 is the top hit; delete it.
    q = docs[7:8]
    assert idx.search(q, k=1).ids[0, 0] == 7
    idx.delete([7])
    res = idx.search(q, k=3)
    assert 7 not in res.ids
    mapping = idx.compact()
    assert mapping[7] == -1 and idx.size == 49
    assert mapping[8] == 7  # shifted down
    res2 = idx.search(q, k=1)
    assert res2.ids[0, 0] == mapping[np.argsort(-(q @ docs.T))[0][1]]


def test_dense_empty_search(rng):
    idx = DenseIndex(dim=16, capacity_block=256, tile=256)
    res = idx.search(_unit(rng, 2, 16), k=4)
    assert (res.ids == -1).all()


def test_dense_snapshot_roundtrip(tmp_path, rng):
    idx = DenseIndex(dim=32, capacity_block=256, tile=256)
    docs = _unit(rng, 100, 32)
    idx.add(docs)
    idx.delete([3])
    save_state(str(tmp_path), "dense", idx.state_dict())
    idx2 = DenseIndex.from_state_dict(load_state(str(tmp_path), "dense"))
    q = _unit(rng, 2, 32)
    r1, r2 = idx.search(q, 5), idx2.search(q, 5)
    np.testing.assert_array_equal(r1.ids, r2.ids)
    np.testing.assert_allclose(r1.scores, r2.scores, atol=1e-6)


# ------------------------------------------------------------------- lexical

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "machine learning on tensor processing units",
    "quick sort and merge sort algorithms",
    "deep learning models require massive compute",
    "the fox hunted rabbits in the brown forest",
]


def test_lexical_tokens_drop_stopwords():
    assert "the" not in lexical_tokens("the quick fox")
    assert lexical_tokens("Quick FOX!") == ["quick", "fox"]


def test_lexical_search_finds_term_matches():
    idx = LexicalIndex(vocab_hash_bits=12, cap=16)
    idx.add(CORPUS)
    scores, ids = idx.search("brown fox", k=3)
    assert set(ids[ids >= 0]) == {0, 4}  # the two fox/brown docs
    assert (scores[:2] > 0).all()


def test_lexical_no_match_returns_minus_one():
    idx = LexicalIndex(vocab_hash_bits=12, cap=16)
    idx.add(CORPUS)
    scores, ids = idx.search("zzzqqq nonexistent", k=3)
    assert (ids == -1).all()


def test_lexical_matches_rank_bm25_oracle(rng):
    """Exactness vs an independent BM25 implementation when cap >= df."""
    idx = LexicalIndex(vocab_hash_bits=14, cap=64)
    idx.add(CORPUS)
    scores, ids = idx.search("learning compute", k=5)
    # Oracle
    toks = [lexical_tokens(t) for t in CORPUS]
    n = len(toks)
    avg = np.mean([len(t) for t in toks])
    want = np.zeros(n)
    for term in ["learning", "compute"]:
        df = sum(term in t for t in toks)
        idf = np.log((n - df + 0.5) / (df + 0.5) + 1)
        for d, t in enumerate(toks):
            tf = t.count(term)
            if tf:
                want[d] += idf * tf * 2.5 / (tf + 1.5 * (1 - 0.75 + 0.75 * len(t) / avg))
    order = np.argsort(-want)
    matched = order[want[order] > 0]
    np.testing.assert_array_equal(ids[:len(matched)], matched)
    np.testing.assert_allclose(scores[:len(matched)], want[matched], rtol=1e-4)


def test_lexical_snapshot_roundtrip(tmp_path):
    idx = LexicalIndex(vocab_hash_bits=12, cap=16)
    idx.add(CORPUS)
    save_state(str(tmp_path), "lex", idx.state_dict())
    idx2 = LexicalIndex.from_state_dict(load_state(str(tmp_path), "lex"))
    s1, i1 = idx.search("brown fox", 3)
    s2, i2 = idx2.search("brown fox", 3)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


# ----------------------------------------------------------------------- IVF

def test_ivf_full_probe_equals_exact(rng):
    docs = _unit(rng, 2000, 64)
    ivf = IVFIndex(num_clusters=16, nprobe=16, tile=128, seed=0)
    ivf.build(docs)
    q = _unit(rng, 4, 64)
    s, ids = ivf.search(q, k=10)
    oracle = np.argsort(-(q @ docs.T), axis=1)[:, :10]
    # probing all clusters == exact search
    np.testing.assert_array_equal(np.sort(ids, axis=1), np.sort(oracle, axis=1))


def test_ivf_partial_probe_recall(rng):
    # Clustered data: partial probing should still get high recall.
    centers = _unit(rng, 32, 64) * 3
    docs = np.concatenate(
        [c + 0.3 * rng.standard_normal((64, 64)).astype(np.float32)
         for c in centers])
    docs = docs / np.linalg.norm(docs, axis=1, keepdims=True)
    ivf = IVFIndex(num_clusters=32, nprobe=8, tile=128, seed=0)
    ivf.build(docs)
    q = docs[::100][:8] + 0.01 * rng.standard_normal((8, 64)).astype(np.float32)
    _, ids = ivf.search(q, k=10)
    oracle = np.argsort(-(q @ docs.T), axis=1)[:, :10]
    recall = np.mean([len(set(ids[r]) & set(oracle[r])) / 10
                      for r in range(len(q))])
    assert recall >= 0.95, recall


def test_ivf_custom_ids_and_snapshot(tmp_path, rng):
    docs = _unit(rng, 600, 32)
    ext_ids = np.arange(600) * 7  # non-contiguous external ids
    ivf = IVFIndex(num_clusters=8, nprobe=8, tile=128)
    ivf.build(docs, ids=ext_ids)
    q = docs[42:43]
    _, ids = ivf.search(q, k=1)
    assert ids[0, 0] == 42 * 7
    save_state(str(tmp_path), "ivf", ivf.state_dict())
    ivf2 = IVFIndex.from_state_dict(load_state(str(tmp_path), "ivf"))
    _, ids2 = ivf2.search(q, k=1)
    assert ids2[0, 0] == 42 * 7


# --------------------------------------------- round-2: index policy

def test_select_index_kind_matrix():
    from optimized_rag_tpu.index.policy import select_index_kind
    f = lambda n, d: select_index_kind(n, d, ivf_min_size=4_000_000,
                                       shard_min_size=250_000)
    assert f(10_000, 1) == "dense"
    assert f(5_000_000, 1) == "ivf"
    assert f(10_000, 8) == "dense"
    assert f(300_000, 8) == "sharded_dense"
    assert f(5_000_000, 8) == "sharded_ivf"


def test_dense_search_tail(rng):
    from optimized_rag_tpu.index.dense import DenseIndex
    idx = DenseIndex(dim=16, capacity_block=512, tile=256)
    old = rng.standard_normal((300, 16)).astype(np.float32)
    new = rng.standard_normal((80, 16)).astype(np.float32)
    idx.add(old)
    idx.add(new)
    q = new[:4]
    res = idx.search_tail(q, k=5, from_row=300)
    assert (res.ids[:, 0] == np.arange(300, 304)).all()
    assert (res.ids.flatten() >= 300).sum() + (res.ids.flatten() == -1).sum() \
        == res.ids.size
    empty = idx.search_tail(q, k=5, from_row=idx.size)
    assert (empty.ids == -1).all()


def test_agent_policy_upgrades_to_ivf(rng):
    """With tiny thresholds the agent installs an IVF ANN after ingest and
    retrieval unions ANN + exact tail."""
    import sys
    sys.path.insert(0, "tests")
    from fakes import FakeCrossEncoder, FakeEmbedder
    from optimized_rag_tpu.agent.agent import RAGAgent
    from optimized_rag_tpu.agent.llm import DeterministicLLM
    from optimized_rag_tpu.config import Settings
    s = Settings()
    s.ivf.ivf_min_size = 8           # force IVF immediately
    s.flags.enable_metrics_export = False
    s.flags.enable_kg = False
    a = RAGAgent(s, llm=DeterministicLLM(),
                 embed_service=FakeEmbedder(dim=32),
                 cross_encoder=FakeCrossEncoder())
    for i in range(12):
        a.ingestor.ingest_text(
            f"document number {i} about topic{i % 4} with words "
            f"alpha{i} beta{i} gamma{i} " * 4, filename=f"d{i}.txt")
    assert a.dense.size >= 8
    kind = a.maybe_upgrade_index()
    assert kind == "ivf"
    assert type(a.retriever.ann).__name__ == "IVFIndex"
    built = a.retriever.ann_size
    # fresh post-build ingest must still be retrievable (exact tail union)
    a.ingestor.ingest_text("zebra quagga okapi unique animal words",
                           filename="fresh.txt")
    assert a.dense.size > built
    docs = a.retriever.dense_only("zebra quagga okapi unique animal", 5)
    assert any("zebra" in d.text for d in docs), [d.text[:30] for d in docs]


# ------------------------------------------- round-2: balanced IVF

def test_balanced_assign_respects_cap(rng):
    from optimized_rag_tpu.ops.kmeans import balanced_assign, kmeans_fit
    import jax.numpy as jnp
    # heavily skewed data: half the points near one center
    hot = rng.standard_normal(16).astype(np.float32)
    pts = np.concatenate([
        hot + 0.05 * rng.standard_normal((500, 16)).astype(np.float32),
        rng.standard_normal((500, 16)).astype(np.float32)])
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    cents, _ = kmeans_fit(jnp.asarray(pts), 16, iters=6)
    cap = int(np.ceil(1000 / 16 * 1.05))
    assign = balanced_assign(jnp.asarray(pts), cents, cap)
    counts = np.bincount(assign, minlength=16)
    assert counts.max() <= cap, (counts.max(), cap)
    assert counts.sum() == 1000
    assert (assign >= 0).all()


def test_ivf_balanced_build_recall(rng):
    from optimized_rag_tpu.index.ivf import IVFIndex
    centers = rng.standard_normal((32, 32)).astype(np.float32)
    docs = centers[rng.integers(0, 32, 4096)] + \
        0.2 * rng.standard_normal((4096, 32)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = docs[rng.integers(0, 4096, 16)] + \
        0.05 * rng.standard_normal((16, 32)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ivf = IVFIndex(num_clusters=32, nprobe=16, kmeans_iters=8, tile=256)
    ivf.build(docs, balanced=True)
    counts = np.asarray(ivf._counts)
    assert counts.max() <= int(np.ceil(4096 / 32 * 1.15))
    # window sized to the (rounded) cap, not the max natural cluster
    assert ivf._window <= 256
    # displaced points need a few extra probes (the documented tradeoff);
    # the read budget nprobe*window stays far below the unbalanced build's
    scores, ids = ivf.search(q, k=10)
    oracle = np.argsort(-(q @ docs.T), axis=1)[:, :10]
    recall = np.mean([len(set(ids[r]) & set(oracle[r])) / 10
                      for r in range(16)])
    assert recall >= 0.95, recall


def test_bf16_storage_rescore_matches_f32_oracle(rng):
    """bfloat16 corpus + 4x oversample + f32 rescore recovers the exact
    f32 ranking (the corpus_dtype='bfloat16' setting path)."""
    docs = _unit(rng, 4096, 64)
    f32 = DenseIndex(dim=64, capacity_block=4096, tile=256)
    f32.add(docs)
    bf16 = DenseIndex(dim=64, capacity_block=4096, tile=256,
                      dtype=jnp.bfloat16)
    bf16.add(docs)
    q = _unit(rng, 8, 64)
    want = f32.search(q, k=10)
    got = bf16.search(q, k=10)
    recall = np.mean([len(set(got.ids[r]) & set(want.ids[r])) / 10
                      for r in range(8)])
    assert recall == 1.0, recall
    # rescored scores carry f32 accumulation (bf16-quantized vectors)
    np.testing.assert_allclose(got.scores, want.scores, atol=8e-3)


def test_agent_corpus_dtype_setting():
    import sys
    sys.path.insert(0, "tests")
    from fakes import FakeCrossEncoder, FakeEmbedder
    from optimized_rag_tpu.agent.agent import RAGAgent
    from optimized_rag_tpu.agent.llm import DeterministicLLM
    from optimized_rag_tpu.config import Settings
    s = Settings.from_env({"ORAG_RETRIEVAL_CORPUS_DTYPE": "bfloat16",
                           "ORAG_FLAGS_ENABLE_METRICS_EXPORT": "0"})
    a = RAGAgent(s, llm=DeterministicLLM(),
                 embed_service=FakeEmbedder(dim=32),
                 cross_encoder=FakeCrossEncoder())
    assert a.dense.dtype == jnp.bfloat16
    a.ingestor.ingest_text("the quick brown fox document")
    docs = a.retriever.dense_only("quick brown fox", 3)
    assert docs


def test_lexical_doc_len_pow2_padded():
    """doc_len is a jitted-input shape: exact-n sizing forced an XLA
    recompile on every add()+search cycle. It is now pow2-padded like
    the champion arrays, so growth within a power of two reuses the
    compiled program (size masks the padding to -inf)."""
    from optimized_rag_tpu.index.lexical import LexicalIndex
    lex = LexicalIndex(vocab_hash_bits=14, cap=16)
    lex.add(["alpha beta gamma", "beta gamma delta", "gamma delta eps",
             "delta eps zeta", "eps zeta alpha"])
    lex.build()
    shape5 = lex._device["doc_len"].shape[0]
    assert shape5 == 8, shape5
    s, ids = lex.search("gamma delta", k=4)
    assert (ids >= 0).sum() >= 3
    assert (ids < 5).all() or (ids[s == -np.inf] == -1).all()
    lex.add(["zeta alpha beta"])       # 6 docs: same pow2 bucket
    lex.build()
    assert lex._device["doc_len"].shape[0] == 8
    s2, ids2 = lex.search("zeta alpha", k=4)
    assert 5 in ids2.tolist()          # the fresh doc is retrievable
