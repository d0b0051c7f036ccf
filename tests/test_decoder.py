"""Decoder LM: byte tokenizer, causal forward, KV-cache generation,
training, provider adapter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimized_rag_tpu.models.decoder import (
    BOS, EOS, DecoderConfig, DecoderLM, Generator, LocalLMProvider,
    decode_bytes, encode_bytes)
from optimized_rag_tpu.models.training import DecoderTrainer
from optimized_rag_tpu.parallel.mesh import make_mesh

TINY = DecoderConfig(hidden_dim=64, num_layers=2, num_heads=4, mlp_dim=128,
                     max_seq_len=128, dtype=jnp.float32)


def test_byte_tokenizer_roundtrip():
    s = "Hello, TPU! 123 — unicode ✓"
    ids = encode_bytes(s)
    assert ids[0] == BOS
    assert decode_bytes(ids.tolist()) == s


def test_causal_forward_shapes(rng):
    model = DecoderLM(TINY)
    ids = jnp.asarray(rng.integers(3, 259, (2, 16)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    logits, caches = model.apply(params, ids)
    assert logits.shape == (2, 16, TINY.vocab_size)
    assert len(caches) == TINY.num_layers


def test_causality(rng):
    """Changing a future token must not affect earlier logits."""
    model = DecoderLM(TINY)
    ids = jnp.asarray(rng.integers(3, 259, (1, 12)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    logits1, _ = model.apply(params, ids)
    ids2 = ids.at[0, -1].set((ids[0, -1] + 5) % 256 + 3)
    logits2, _ = model.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(logits1[0, :-1]),
                               np.asarray(logits2[0, :-1]), atol=1e-5)


def test_cached_decode_matches_full_forward(rng):
    """One-step cached decode must reproduce the full-forward logits."""
    cfg = TINY
    model = DecoderLM(cfg)
    seq = jnp.asarray(rng.integers(3, 259, (1, 10)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), seq)
    full_logits, _ = model.apply(params, seq)

    prefix = seq[:, :9]
    _, caches = model.apply(params, prefix)
    total = 16
    caches = [
        (jnp.zeros((1, total, cfg.num_heads, cfg.head_dim),
                   cfg.dtype).at[:, :9].set(k),
         jnp.zeros((1, total, cfg.num_heads, cfg.head_dim),
                   cfg.dtype).at[:, :9].set(v))
        for k, v in caches]
    step_logits, _ = model.apply(params, seq[:, 9:10], kv_caches=caches,
                                 pos=jnp.asarray(9))
    np.testing.assert_allclose(np.asarray(step_logits[0, 0]),
                               np.asarray(full_logits[0, 9]), atol=2e-4)


def test_generator_greedy_deterministic():
    gen = Generator(TINY, max_prompt_len=32, max_new_tokens=8)
    a = gen.generate("hello", temperature=0.0)
    b = gen.generate("hello", temperature=0.0)
    assert a == b
    assert isinstance(a, str)


def test_generator_respects_max_new():
    gen = Generator(TINY, max_prompt_len=32, max_new_tokens=4)
    out = gen.generate("abc", max_new_tokens=4)
    assert len(out.encode("utf-8", errors="replace")) <= 4 * 4


def test_decoder_trainer_memorizes(rng):
    mesh = make_mesh(data=4, model=2)
    tr = DecoderTrainer(TINY, mesh, learning_rate=3e-3)
    text = "the tpu multiplies matrices. "
    ids = encode_bytes(text * 3, 96)
    batch = np.tile(ids, (8, 1)).astype(np.int32)
    losses = [tr.train_step(batch) for _ in range(8)]
    assert losses[-1] < losses[0] * 0.8, losses


def test_trained_model_scores_seen_text_higher():
    mesh = make_mesh(data=8, model=1)
    tr = DecoderTrainer(TINY, mesh, learning_rate=5e-3)
    text = "aaaa bbbb aaaa bbbb "
    ids = encode_bytes(text * 4, 96)
    batch = np.tile(ids, (8, 1)).astype(np.int32)
    for _ in range(12):
        tr.train_step(batch)
    gen = Generator(TINY, params=jax.device_get(tr.params),
                    max_prompt_len=32, max_new_tokens=8)
    seen = gen.score(text * 2)
    unseen = gen.score("zzzz qqqq xxxx wwww")
    assert seen > unseen


def test_local_lm_provider_falls_back():
    gen = Generator(TINY, max_prompt_len=32, max_new_tokens=8)
    prov = LocalLMProvider(gen)
    # Structured / task-tagged calls route to the deterministic fallback.
    out = prov.structured("Query: what is x\nIntent:", ["intent"],
                          task="intent")
    assert "intent" in out
    ans = prov.complete("[1] context doc\nQuestion: what\nAnswer:",
                        task="generate")
    assert isinstance(ans, str) and ans


def test_sampling_filters():
    gen = Generator(TINY, max_prompt_len=32, max_new_tokens=8)
    # top_k=1 sampling must equal greedy (only the argmax survives).
    greedy = gen.generate("hello world", temperature=0.0)
    topk1 = gen.generate("hello world", temperature=0.7, top_k=1, seed=3)
    assert topk1 == greedy
    # nucleus with tiny top_p also collapses to (near-)greedy.
    nucleus = gen.generate("hello world", temperature=0.7, top_p=1e-6,
                           seed=3)
    assert nucleus == greedy
    # permissive settings still produce deterministic output per seed
    a = gen.generate("hello world", temperature=0.9, top_k=40, top_p=0.9,
                     seed=5)
    b = gen.generate("hello world", temperature=0.9, top_k=40, top_p=0.9,
                     seed=5)
    assert a == b


def test_batched_generation_matches_single():
    gen = Generator(TINY, max_prompt_len=32, max_new_tokens=8)
    prompts = ["short", "a somewhat longer prompt here", "mid size one"]
    batched = gen.generate_batch(prompts, temperature=0.0)
    singles = [gen.generate(p, temperature=0.0) for p in prompts]
    assert batched == singles
