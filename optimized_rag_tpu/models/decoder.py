"""Decoder-only language model with KV-cache generation.

The reference's generation is an OpenAI chat RPC (agent/rag_graph.py:84);
this module is the TPU-native counterpart: a flax causal LM whose entire
serving path — prefill, KV cache, sampled decode loop — runs as compiled
XLA with static shapes (lax.scan over decode steps).

Tokenization is byte-level (vocab = 256 bytes + specials) so the vocab is
exactly reversible without any downloaded files — the right call in a
no-egress environment, and the model can later load trained weights
through models/loader.py conventions.

``LocalLMProvider`` adapts the model to the agent's LLMProvider interface
so the whole RAG stack can run generation on-device.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

PAD = 0
BOS = 1
EOS = 2
NUM_SPECIAL = 3
BYTE_OFFSET = NUM_SPECIAL          # byte b -> id b + 3


def encode_bytes(text: str, max_len: Optional[int] = None,
                 truncate: str = "right") -> np.ndarray:
    """Byte-level encode with BOS. ``truncate``: "right" drops the tail
    (training windows); "left" keeps the LAST max_len-1 bytes after BOS —
    the right choice for generation prompts, where the question sits at
    the end. Trimming counts encoded bytes, not characters."""
    raw = text.encode("utf-8")
    if max_len is not None and truncate == "left":
        raw = raw[-(max_len - 1):]
    ids = [BOS] + [b + BYTE_OFFSET for b in raw]
    if max_len is not None:
        ids = ids[:max_len]
    return np.asarray(ids, np.int32)


def decode_bytes(ids: Sequence[int]) -> str:
    out = bytes(i - BYTE_OFFSET for i in ids
                if i >= BYTE_OFFSET)
    return out.decode("utf-8", errors="replace")


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 256 + NUM_SPECIAL
    hidden_dim: int = 384
    num_layers: int = 6
    num_heads: int = 6
    mlp_dim: int = 1536
    max_seq_len: int = 1024
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads


class _CausalBlock(nn.Module):
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x, kv_cache=None, pos=None, key_valid=None):
        """x [B, L, H]. Without cache: full causal self-attention (with an
        optional [B, L] key-validity mask for left-padded batches). With
        cache (k, v of shape [B, max_len, heads, hd]) and pos: one decode
        step (L == 1) attending to cache[:pos+1] ∧ key_valid [B, max_len].
        """
        c = self.cfg
        h = nn.LayerNorm(dtype=jnp.float32, name="ln1")(x).astype(c.dtype)
        b, l, _ = h.shape
        qkv = nn.Dense(3 * c.hidden_dim, dtype=c.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shape = (b, l, c.num_heads, c.head_dim)
        q, k, v = (t.reshape(shape) for t in (q, k, v))
        scale = 1.0 / np.sqrt(c.head_dim)

        if kv_cache is None:
            att = jnp.einsum("blhd,bmhd->bhlm", q, k) * scale
            mask = jnp.tril(jnp.ones((l, l), bool))[None, None]
            if key_valid is not None:
                mask = mask & key_valid[:, None, None, :]
            att = jnp.where(mask, att.astype(jnp.float32), -1e30)
            att = jax.nn.softmax(att, axis=-1).astype(c.dtype)
            out = jnp.einsum("bhlm,bmhd->blhd", att, v)
            new_cache = (k, v)
        else:
            ck, cv = kv_cache                     # [B, M, h, d]
            ck = jax.lax.dynamic_update_slice(
                ck, k.astype(ck.dtype), (0, pos, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, v.astype(cv.dtype), (0, pos, 0, 0))
            att = jnp.einsum("blhd,bmhd->bhlm", q, ck) * scale
            m = ck.shape[1]
            idx = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
            valid = (idx <= pos)[None, :]
            if key_valid is not None:
                valid = valid & key_valid
            att = jnp.where(valid[:, None, None, :],
                            att.astype(jnp.float32), -1e30)
            att = jax.nn.softmax(att, axis=-1).astype(c.dtype)
            out = jnp.einsum("bhlm,bmhd->blhd", att, cv)
            new_cache = (ck, cv)

        out = out.reshape(b, l, c.hidden_dim)
        x = x + nn.Dense(c.hidden_dim, dtype=c.dtype, name="attn_out")(out)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x).astype(c.dtype)
        h = nn.Dense(c.mlp_dim, dtype=c.dtype, name="mlp_in")(h)
        h = nn.gelu(h)
        h = nn.Dense(c.hidden_dim, dtype=c.dtype, name="mlp_out")(h)
        return x + h, new_cache


class DecoderLM(nn.Module):
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, ids, kv_caches=None, pos=None, key_valid=None,
                 pos_ids=None):
        """ids [B, L] -> (logits [B, L, V], caches).

        kv_caches: None (full causal forward / prefill from scratch) or a
        list of per-layer (k, v) buffers with ``pos`` (scalar storage slot)
        for one-step decode. ``key_valid`` masks pad key positions (for
        left-padded batches); ``pos_ids`` [B, L] overrides the positional
        ids (per-row logical positions under left-padding).

        ``self.sow("intermediates", "hidden", x)`` exports the final
        pre-head hidden states for heads built on top of the backbone
        (models/grounded.py's pointer-generator reads them via
        ``mutable=["intermediates"]``).
        """
        c = self.cfg
        tok = nn.Embed(c.vocab_size, c.hidden_dim, dtype=c.dtype,
                       name="tok")(ids)
        if pos_ids is not None:
            positions = pos_ids
        elif pos is None:
            positions = jnp.arange(ids.shape[1])[None]
        else:
            positions = jnp.full((1, ids.shape[1]), pos)
        tok = tok + nn.Embed(c.max_seq_len, c.hidden_dim, dtype=c.dtype,
                             name="pos")(positions)
        x = tok
        new_caches = []
        for i in range(c.num_layers):
            cache_i = None if kv_caches is None else kv_caches[i]
            x, cache = _CausalBlock(c, name=f"block_{i}")(x, cache_i, pos,
                                                          key_valid)
            new_caches.append(cache)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln_f")(x)
        self.sow("intermediates", "hidden", x)
        logits = nn.Dense(c.vocab_size, dtype=jnp.float32,
                          name="head")(x)
        return logits, new_caches


# ---------------------------------------------------------------------------
# Generation
# ---------------------------------------------------------------------------

class Generator:
    """Compiled prefill + scan-decode text generation."""

    def __init__(self, cfg: DecoderConfig | None = None, params=None,
                 seed: int = 0, max_prompt_len: int = 768,
                 max_new_tokens: int = 256):
        self.cfg = cfg or DecoderConfig()
        assert max_prompt_len + max_new_tokens <= self.cfg.max_seq_len
        self.max_prompt_len = max_prompt_len
        self.max_new_tokens = max_new_tokens
        self.model = DecoderLM(self.cfg)
        if params is None:
            params = self.model.init(jax.random.PRNGKey(seed),
                                     jnp.zeros((1, 8), jnp.int32))
        self.params = params
        self._generate = jax.jit(
            self._generate_impl, static_argnames=("max_new",))

    # -- compiled pipeline --------------------------------------------------

    def _generate_impl(self, params, ids, pad_len, key, temperature,
                       top_k, top_p, max_new: int):
        """Batched generation over LEFT-padded prompts.

        ids [B, max_prompt_len] (prompt right-aligned; PAD on the left,
        pad_len [B] pads per row) -> [max_new, B] token ids. Left padding
        makes every row's decode slot uniform (one scalar cache position
        per step); pad keys are masked and positional ids are shifted per
        row, so batched output is exactly the single-prompt output.
        """
        c = self.cfg
        b = ids.shape[0]
        p = self.max_prompt_len
        total = p + max_new
        pad_mask = jax.lax.broadcasted_iota(
            jnp.int32, (b, p), 1) >= pad_len[:, None]
        pos_ids = jnp.maximum(
            jax.lax.broadcasted_iota(jnp.int32, (b, p), 1)
            - pad_len[:, None], 0)
        logits, caches = self.model.apply(params, ids, key_valid=pad_mask,
                                          pos_ids=pos_ids)
        caches = [
            (jnp.zeros((b, total, c.num_heads, c.head_dim),
                       c.dtype).at[:, :p].set(k),
             jnp.zeros((b, total, c.num_heads, c.head_dim),
                       c.dtype).at[:, :p].set(v))
            for k, v in caches]
        last_logits = logits[:, -1]                       # [B, V]
        storage_valid = jnp.concatenate(
            [pad_mask, jnp.ones((b, max_new), bool)], axis=1)

        def sample_one(logits, key):
            def sampled():
                lg = logits / jnp.maximum(temperature, 1e-4)
                # top-k filter: keep the k largest logits.
                kth = jnp.sort(lg)[-jnp.maximum(top_k, 1)]
                lg = jnp.where(top_k > 0, jnp.where(lg >= kth, lg, -1e30),
                               lg)
                # nucleus (top-p): smallest prefix of the sorted
                # distribution whose mass reaches top_p.
                probs = jax.nn.softmax(lg)
                order = jnp.argsort(-probs)
                csum = jnp.cumsum(probs[order])
                cut = csum - probs[order] < top_p
                keep_sorted = jnp.where(top_p < 1.0, cut, True)
                keep = jnp.zeros_like(keep_sorted).at[order].set(keep_sorted)
                lg = jnp.where(keep, lg, -1e30)
                return jax.random.categorical(key, lg).astype(jnp.int32)

            return jax.lax.cond(
                temperature <= 1e-4,
                lambda: jnp.argmax(logits).astype(jnp.int32),
                sampled)

        def step(carry, t):
            caches, logits, key, done = carry
            key, sub = jax.random.split(key)
            toks = jax.vmap(sample_one)(logits,
                                        jax.random.split(sub, b))  # [B]
            toks = jnp.where(done, PAD, toks)
            pos = p + t
            step_pos_ids = (pos - pad_len)[:, None]
            new_logits, new_caches = self.model.apply(
                params, toks[:, None], kv_caches=caches, pos=pos,
                key_valid=storage_valid, pos_ids=step_pos_ids)
            done = done | (toks == EOS)
            return ((new_caches, new_logits[:, 0], key, done), toks)

        init = (caches, last_logits, key, jnp.zeros((b,), bool))
        _, toks = jax.lax.scan(step, init,
                               jnp.arange(max_new, dtype=jnp.int32))
        return toks                                       # [max_new, B]

    # -- host API -----------------------------------------------------------

    def generate_batch(self, prompts: list[str],
                       max_new_tokens: Optional[int] = None,
                       temperature: float = 0.0, top_k: int = 0,
                       top_p: float = 1.0, seed: int = 0) -> list[str]:
        """Batched generation; one compiled dispatch for the whole batch."""
        max_new = max_new_tokens or self.max_new_tokens
        b = len(prompts)
        ids = np.zeros((b, self.max_prompt_len), np.int32)
        pad_len = np.zeros(b, np.int32)
        for r, prompt in enumerate(prompts):
            # Keep the prompt TAIL: in a RAG prompt the question comes last.
            row = encode_bytes(prompt, self.max_prompt_len, truncate="left")
            pad_len[r] = self.max_prompt_len - len(row)
            ids[r, pad_len[r]:] = row
        toks = np.asarray(self._generate(
            self.params, jnp.asarray(ids), jnp.asarray(pad_len),
            jax.random.PRNGKey(seed),
            jnp.asarray(temperature, jnp.float32),
            jnp.asarray(top_k, jnp.int32),
            jnp.asarray(top_p, jnp.float32), max_new=max_new)).T  # [B, new]
        out = []
        for row in toks:
            row = row.tolist()
            if EOS in row:
                row = row[: row.index(EOS)]
            out.append(decode_bytes(row))
        return out

    def generate(self, prompt: str, max_new_tokens: Optional[int] = None,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, seed: int = 0) -> str:
        """top_k=0 disables the top-k filter; top_p=1.0 disables nucleus
        sampling; temperature<=0 is greedy (filters ignored)."""
        return self.generate_batch([prompt], max_new_tokens, temperature,
                                   top_k, top_p, seed)[0]

    def score(self, text: str) -> float:
        """Mean next-token log-prob (perplexity surrogate for tests)."""
        ids = encode_bytes(text, self.cfg.max_seq_len)[None]
        logits, _ = self.model.apply(self.params, jnp.asarray(ids))
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
        tgt = jnp.asarray(ids)[:, 1:]
        token_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)
        return float(token_lp.mean())


class LocalLMProvider:
    """LLMProvider backed by the on-device Generator.

    Generation quality depends on trained weights; structurally this
    completes the no-network serving path. ``fallback`` (default: the
    DeterministicLLM) answers structured/task-tagged calls the raw LM
    cannot, so the agent remains fully functional.
    """

    def __init__(self, generator: Generator, fallback=None,
                 temperature: float = 0.0):
        from optimized_rag_tpu.agent.llm import DeterministicLLM
        self.generator = generator
        self.fallback = fallback or DeterministicLLM()
        self.temperature = temperature

    def complete(self, prompt: str, task: str = "", **kw) -> str:
        if task in ("generate", "cot", "synthesize"):
            # No host-side char trim: the generator tail-trims by encoded
            # bytes (UTF-8 chars may span several bytes).
            out = self.generator.generate(
                prompt,
                temperature=kw.get("temperature", self.temperature))
            if out.strip():
                return out
        return self.fallback.complete(prompt, task=task, **kw)

    def structured(self, prompt: str, keys, task: str = "", **kw):
        if task == "generate":
            # Route the answer itself through the decoder (the whole
            # point of --local-lm); citations are whatever [N] markers
            # the model emitted. Empty output falls back so the agent
            # keeps functioning with an untrained/weak checkpoint.
            import re as _re
            out = self.generator.generate(
                prompt, temperature=kw.get("temperature",
                                           self.temperature))
            if out.strip():
                return {"answer": out.strip(),
                        "citations": sorted({
                            int(m) for m in
                            _re.findall(r"\[(\d+)\]", out)})}
        return self.fallback.structured(prompt, keys, task=task, **kw)
