"""Tokenizer, encoders, services, training, and weight I/O."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimized_rag_tpu.models.encoder import (
    BiEncoder, CrossEncoder, CrossEncoderService, EmbeddingService,
    TransformerConfig)
from optimized_rag_tpu.models.loader import (
    import_hf_bert, load_params, save_params)
from optimized_rag_tpu.models.tokenizer import (
    CLS_ID, PAD_ID, SEP_ID, HashTokenizer)
from optimized_rag_tpu.models.training import (
    BiEncoderTrainer, CrossEncoderTrainer, info_nce_loss)
from optimized_rag_tpu.parallel.mesh import make_mesh

SMALL = TransformerConfig(vocab_size=1024, hidden_dim=64, num_layers=2,
                          num_heads=4, mlp_dim=128, max_seq_len=64,
                          out_dim=32)


# ----------------------------------------------------------------- tokenizer

def test_tokenizer_deterministic_and_bounded():
    tok = HashTokenizer(vocab_size=1024, max_len=32)
    a = tok.tokenize("Hello, TPU world!")
    b = tok.tokenize("Hello, TPU world!")
    assert a == b and all(4 <= t < 1024 for t in a)


def test_tokenizer_encode_framing():
    tok = HashTokenizer(vocab_size=1024, max_len=16)
    ids, mask = tok.encode("hello world")
    assert ids[0] == CLS_ID
    assert ids[mask.sum() - 1] == SEP_ID
    assert (ids[mask.sum():] == PAD_ID).all()


def test_tokenizer_batch_bucketing():
    tok = HashTokenizer(vocab_size=1024, max_len=64)
    ids, mask = tok.encode_batch(["one two", "a much longer sentence here"])
    assert ids.shape == mask.shape
    assert ids.shape[1] % 8 == 0


def test_tokenizer_pairs_type_ids():
    tok = HashTokenizer(vocab_size=1024, max_len=64)
    ids, mask, types = tok.encode_pairs([("what is tpu", "a tpu is a chip")])
    assert types[0, 0] == 0            # query segment
    assert types[0, mask[0].sum() - 1] == 1  # doc segment
    assert (types[0][mask[0] == 0] == 0).all()


# ------------------------------------------------------------------ encoders

def test_biencoder_unit_norm_output(rng):
    model = BiEncoder(SMALL)
    ids = jnp.asarray(rng.integers(4, 1024, (3, 16)), jnp.int32)
    mask = jnp.ones((3, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    out = model.apply(params, ids, mask)
    assert out.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0,
                               atol=1e-5)


def test_biencoder_padding_invariance(rng):
    """Mean pooling must ignore padded positions."""
    model = BiEncoder(SMALL)
    ids = jnp.asarray(rng.integers(4, 1024, (1, 8)), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    a = model.apply(params, ids, mask)
    ids_pad = jnp.pad(ids, ((0, 0), (0, 8)))
    mask_pad = jnp.pad(mask, ((0, 0), (0, 8)))
    b = model.apply(params, ids_pad, mask_pad)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)


def test_cross_encoder_scalar_logits(rng):
    model = CrossEncoder(SMALL)
    ids = jnp.asarray(rng.integers(4, 1024, (5, 16)), jnp.int32)
    mask = jnp.ones((5, 16), jnp.int32)
    types = jnp.zeros((5, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, types)
    out = model.apply(params, ids, mask, types)
    assert out.shape == (5,)


# ------------------------------------------------------------------ services

def test_embedding_service_cache_and_shapes():
    svc = EmbeddingService(SMALL, max_len=32, cache_size=10)
    out = svc.encode(["alpha beta", "gamma delta", "alpha beta"])
    assert out.shape == (3, 32)
    np.testing.assert_allclose(out[0], out[2], atol=1e-6)  # same text
    svc.encode(["alpha beta"])
    assert svc.cache_stats()["hits"] >= 2


def test_embedding_service_deterministic():
    a = EmbeddingService(SMALL, seed=0, max_len=32).encode_one("same text")
    b = EmbeddingService(SMALL, seed=0, max_len=32).encode_one("same text")
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_embedding_service_matryoshka():
    svc = EmbeddingService(SMALL, max_len=32, matryoshka_dim=16)
    out = svc.encode(["hello"])
    assert out.shape == (1, 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_cross_encoder_service_scores():
    svc = CrossEncoderService(SMALL, max_len=64)
    scores = svc.score_pairs("what is a tpu",
                             ["a tpu is an accelerator", "bananas are yellow",
                              "tpus multiply matrices"])
    assert scores.shape == (3,)
    assert ((scores >= 0) & (scores <= 1)).all()
    assert svc.score_pairs("q", []).shape == (0,)


# ------------------------------------------------------------------ training

def test_info_nce_perfect_alignment_low_loss():
    e = jnp.eye(4, 8)
    aligned = float(info_nce_loss(e, e))
    shuffled = float(info_nce_loss(e, jnp.roll(e, 1, axis=0)))
    assert aligned < shuffled


def test_biencoder_trainer_loss_decreases(rng):
    mesh = make_mesh(data=4, model=2)
    tr = BiEncoderTrainer(SMALL, mesh, learning_rate=1e-3, seed=0)
    q_ids = rng.integers(4, 1024, (8, 16)).astype(np.int32)
    d_ids = rng.integers(4, 1024, (8, 16)).astype(np.int32)
    ones = np.ones((8, 16), np.int32)
    losses = [tr.train_step(q_ids, ones, d_ids, ones) for _ in range(4)]
    assert losses[-1] < losses[0]


def test_cross_encoder_trainer_step(rng):
    mesh = make_mesh(data=8, model=1)
    tr = CrossEncoderTrainer(SMALL, mesh, learning_rate=1e-3)
    ids = rng.integers(4, 1024, (8, 16)).astype(np.int32)
    ones = np.ones((8, 16), np.int32)
    types = np.zeros((8, 16), np.int32)
    labels = (np.arange(8) % 2).astype(np.float32)
    losses = [tr.train_step(ids, ones, types, labels) for _ in range(4)]
    assert losses[-1] < losses[0]


# ----------------------------------------------------------------- weight IO

def test_params_save_load_roundtrip(tmp_path, rng):
    svc = EmbeddingService(SMALL, seed=3, max_len=32)
    save_params(str(tmp_path), "enc", svc.params)
    restored = load_params(str(tmp_path), "enc")
    svc2 = EmbeddingService(SMALL, params=restored, max_len=32)
    a, b = svc.encode_one("round trip"), svc2.encode_one("round trip")
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_hf_bert_import_maps_and_runs():
    transformers = pytest.importorskip("transformers")
    torch_cfg = transformers.BertConfig(
        vocab_size=1024, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64)
    hf = transformers.BertModel(torch_cfg)  # random init, no download
    trunk = import_hf_bert(hf.state_dict(), num_layers=2, num_heads=4,
                           hidden_dim=64)
    # Graft onto a BiEncoder param tree and run a forward.
    model = BiEncoder(SMALL)
    ids = jnp.asarray(np.ones((1, 8)), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    grafted = {"params": {**params["params"], "trunk": trunk["trunk"]}}
    out = model.apply(grafted, ids, mask)
    assert np.isfinite(np.asarray(out)).all()
    # Embedding table really came from HF weights.
    got = np.asarray(grafted["params"]["trunk"]["emb"]["tok"]["embedding"])
    want = hf.state_dict()["embeddings.word_embeddings.weight"].numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_embedding_cache_size_zero_disables_caching():
    from optimized_rag_tpu.models.encoder import (
        EmbeddingService, TransformerConfig)
    svc = EmbeddingService(TransformerConfig(
        vocab_size=512, hidden_dim=32, num_layers=1, num_heads=2,
        mlp_dim=64, out_dim=32), max_len=16, cache_size=0)
    out = svc.encode(["hello world", "hello world", "again"])
    assert out.shape == (3, 32)
    assert svc.cache_stats()["entries"] == 0
    svc.cache_put("x", out[0])                   # must not raise
    assert svc.cache_stats()["entries"] == 0


def test_embedding_cache_thread_safe_under_concurrent_encode():
    import threading
    from optimized_rag_tpu.models.encoder import (
        EmbeddingService, TransformerConfig)
    svc = EmbeddingService(TransformerConfig(
        vocab_size=512, hidden_dim=32, num_layers=1, num_heads=2,
        mlp_dim=64, out_dim=32), max_len=16, cache_size=8)
    errors = []

    def worker(tid):
        try:
            for i in range(30):
                svc.encode([f"text {tid} {i}", f"text {i % 5}"])
        except Exception as exc:  # pragma: no cover - the regression
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(svc._cache) <= 8
