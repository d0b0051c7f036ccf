"""Fused hybrid kernels vs their unfused building blocks."""

import jax.numpy as jnp
import numpy as np

from optimized_rag_tpu.index.dense import DenseIndex
from optimized_rag_tpu.index.lexical import LexicalIndex
from optimized_rag_tpu.ops.fusion import minmax_normalize, temporal_decay
from optimized_rag_tpu.ops.hybrid import dual_topk, fuse_candidates
from optimized_rag_tpu.ops.topk import exact_topk

from fakes import FakeEmbedder

CORPUS = [
    "tpus accelerate matrix multiplication with systolic arrays",
    "postgres stores rows in relational tables",
    "bananas grow in tropical climates",
    "systolic arrays pump data through multiply units",
    "embedding vectors live in high dimensional space",
    "the quick brown fox jumps over the lazy dog",
    "matrix multiplication dominates transformer flops",
    "dogs and foxes are both canids",
]


def _setup():
    emb = FakeEmbedder(dim=32)
    dense = DenseIndex(dim=32, capacity_block=256, tile=256)
    dense.add(emb(CORPUS))
    lex = LexicalIndex(vocab_hash_bits=14, cap=16)
    lex.add(CORPUS)
    lex.build()
    return emb, dense, lex


def test_dual_topk_matches_separate_paths():
    emb, dense, lex = _setup()
    query = "matrix multiplication systolic"
    q = emb([query])
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    qt, qv = lex.encode_query(query)
    d = lex._device
    packed = np.asarray(dual_topk(
        qn.astype(np.float32), dense.embeddings(), dense.size, qt, qv,
        d["champ_docs"], d["champ_tf"], d["champ_valid"], d["idf"],
        d["doc_len"], d["avg_len"], k=5))
    dense_ids = packed[1, 0].astype(int)
    bm25_ids = packed[1, -1].astype(int)
    bm25_scores = packed[0, -1]

    want = dense.search(qn, k=5)
    np.testing.assert_array_equal(dense_ids, want.ids[0])
    ls, li = lex.search(query, k=5)
    matched = li[li >= 0]
    np.testing.assert_array_equal(bm25_ids[: len(matched)], matched)
    np.testing.assert_allclose(bm25_scores[: len(matched)],
                               ls[: len(matched)], rtol=1e-5)


def test_fuse_candidates_matches_manual_fusion():
    emb, dense, lex = _setup()
    q = emb(["matrix multiplication"])[0]
    qn = q / max(np.linalg.norm(q), 1e-9)
    cand = np.asarray([0, 3, 6, 1, -1, -1, -1, -1], np.int32)
    valid = cand >= 0
    kw = np.asarray([2.0, 1.0, 3.0, 0.0, 0, 0, 0, 0], np.float32)
    ages = np.asarray([0.0, 30.0, 60.0, 90.0, 0, 0, 0, 0], np.float32)
    w = np.asarray([0.5, 0.3, 0.2], np.float32)
    packed = np.asarray(fuse_candidates(
        qn.astype(np.float32), dense.embeddings(), cand, valid, kw, ages,
        w, 30.0, k=4))
    got_scores, got_pos = packed[0], packed[1].astype(int)

    # Manual: same channels, same normalization basis.
    emb_rows = np.asarray(dense.get(cand[:4].astype(np.int64)))
    sem = np.concatenate([emb_rows @ qn, np.zeros(4)]).astype(np.float32)
    tmp = np.asarray(temporal_decay(jnp.asarray(ages), 30.0))
    stack = np.stack([sem, kw, tmp])
    normed = np.stack([np.asarray(minmax_normalize(jnp.asarray(s),
                                                   jnp.asarray(valid)))
                       for s in stack])
    fused = (w / w.sum()) @ normed
    fused[~valid] = -np.inf
    order = np.argsort(-fused)[:4]
    np.testing.assert_array_equal(got_pos, order)
    np.testing.assert_allclose(got_scores, fused[order], rtol=1e-4)


def test_fuse_candidates_all_invalid():
    emb, dense, _ = _setup()
    cand = np.full(8, -1, np.int32)
    packed = np.asarray(fuse_candidates(
        np.zeros(32, np.float32), dense.embeddings(), cand, cand >= 0,
        np.zeros(8, np.float32), np.zeros(8, np.float32),
        np.asarray([1, 1, 1], np.float32), 30.0, k=4))
    assert (packed[1].astype(int) == -1).all()
