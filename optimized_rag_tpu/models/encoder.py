"""JAX transformer encoders: bi-encoder (embeddings) and cross-encoder.

Replaces the reference's two neural network dependencies with on-TPU
forwards (SURVEY.md §2.3):
  * OpenAI text-embedding-3-small RPC (memory/embeddings.py:62-133)
    -> ``BiEncoder``: masked-mean-pooled transformer, L2-normalized,
       with Matryoshka-style truncation (optimization_config.py:15-19)
  * ms-marco-MiniLM-L-6-v2 CPU cross-encoder (rag/reranker.py:313-359)
    -> ``CrossEncoder``: pair-encoded transformer, [CLS] -> scalar logit

Architecture is MiniLM-class (6 layers, 384 wide) — matmul shapes that tile
cleanly onto the MXU (384 = 3*128, mlp 1536 = 12*128). Compute dtype is
bfloat16 with float32 layernorm/softmax accumulation.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from optimized_rag_tpu.models.tokenizer import HashTokenizer


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 32768
    hidden_dim: int = 384
    num_layers: int = 6
    num_heads: int = 12
    mlp_dim: int = 1536
    max_seq_len: int = 512
    num_types: int = 2
    out_dim: int = 384          # embedding projection dim
    dtype: Any = jnp.bfloat16   # compute dtype (params stay float32)
    dropout: float = 0.0


class _Embeddings(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, ids, type_ids):
        c = self.cfg
        tok = nn.Embed(c.vocab_size, c.hidden_dim, dtype=c.dtype,
                       name="tok")(ids)
        pos_ids = jnp.arange(ids.shape[-1])[None, :]
        pos = nn.Embed(c.max_seq_len, c.hidden_dim, dtype=c.dtype,
                       name="pos")(pos_ids)
        typ = nn.Embed(c.num_types, c.hidden_dim, dtype=c.dtype,
                       name="typ")(type_ids)
        x = tok + pos + typ
        return nn.LayerNorm(dtype=jnp.float32, name="ln")(x).astype(c.dtype)


class _Block(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        # Pre-LN attention. attention mask: [B, 1, 1, L] additive handled
        # by flax via boolean mask argument.
        h = nn.LayerNorm(dtype=jnp.float32, name="ln1")(x).astype(c.dtype)
        attn_mask = mask[:, None, None, :].astype(bool)
        h = nn.MultiHeadDotProductAttention(
            num_heads=c.num_heads, dtype=c.dtype, name="attn",
            )(h, h, mask=attn_mask)
        x = x + h
        h = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x).astype(c.dtype)
        h = nn.Dense(c.mlp_dim, dtype=c.dtype, name="mlp_in")(h)
        h = nn.gelu(h)
        h = nn.Dense(c.hidden_dim, dtype=c.dtype, name="mlp_out")(h)
        return x + h


class _Trunk(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, ids, mask, type_ids=None):
        c = self.cfg
        if type_ids is None:
            type_ids = jnp.zeros_like(ids)
        x = _Embeddings(c, name="emb")(ids, type_ids)
        # Activations ride the data axis; annotate for pjit.
        x = jax.lax.with_sharding_constraint(
            x, jax.sharding.PartitionSpec("data", None, None)) \
            if _in_mesh_context() else x
        for i in range(c.num_layers):
            x = _Block(c, name=f"block_{i}")(x, mask)
        return nn.LayerNorm(dtype=jnp.float32, name="ln_f")(x)


def _in_mesh_context() -> bool:
    try:
        from jax._src.mesh import thread_resources
        return not thread_resources.env.physical_mesh.empty
    except Exception:
        return False


class BiEncoder(nn.Module):
    """Masked-mean-pooled sentence encoder producing unit vectors."""
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, ids, mask):
        c = self.cfg
        x = _Trunk(c, name="trunk")(ids, mask)          # [B, L, H] f32
        m = mask.astype(jnp.float32)[..., None]
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
        out = nn.Dense(c.out_dim, dtype=jnp.float32, name="proj")(pooled)
        # L2-normalize; Matryoshka truncation renormalizes downstream.
        return out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-9)


class CrossEncoder(nn.Module):
    """(query, doc) pair scorer: [CLS] representation -> scalar logit."""
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, ids, mask, type_ids):
        c = self.cfg
        x = _Trunk(c, name="trunk")(ids, mask, type_ids)
        cls = x[:, 0]                                    # [B, H]
        h = nn.Dense(c.hidden_dim, dtype=jnp.float32, name="pool")(cls)
        h = jnp.tanh(h)
        return nn.Dense(1, dtype=jnp.float32, name="score")(h)[:, 0]


# ---------------------------------------------------------------------------
# Host-facing embedding service
# ---------------------------------------------------------------------------

class EmbeddingService:
    """Batched on-device embedding with an LRU cache.

    API mirror of the reference's ``EmbeddingService``
    (memory/embeddings.py:31: generate_embedding / generate_embeddings_batch
    / cache stats / get_embedding_dimension) with the OpenAI RPC replaced by
    a jitted transformer forward. Sequence lengths are bucketed to limit
    compiled shapes; batches are padded to fixed sizes for the same reason.
    """

    BATCH_BUCKETS = (8, 32, 64, 128)

    def __init__(self, cfg: TransformerConfig | None = None, params=None,
                 seed: int = 0, cache_size: int = 4096, max_len: int = 128,
                 matryoshka_dim: int | None = None, tokenizer=None):
        self.cfg = cfg or TransformerConfig()
        self.max_len = max_len
        self.matryoshka_dim = matryoshka_dim
        # tokenizer must match training (learned-vocab checkpoints ship
        # tokenizer.vocab.txt — models/pretrain.load_tokenizer)
        self.tokenizer = tokenizer or HashTokenizer(self.cfg.vocab_size,
                                                    max_len)
        self.model = BiEncoder(self.cfg)
        if params is None:
            ids = jnp.zeros((1, 8), jnp.int32)
            params = self.model.init(jax.random.PRNGKey(seed), ids,
                                     jnp.ones((1, 8), jnp.int32))
        self.params = params
        self._fwd = jax.jit(self.model.apply)
        self._cache: dict[str, np.ndarray] = {}
        self._cache_size = cache_size
        # Concurrent callers (serving.QueryServer runs 2 dispatcher
        # threads) share this cache — same locking the reference's
        # embedding LRU carries (memory/embeddings.py:51-52).
        self._cache_lock = threading.Lock()
        self.stats = {"hits": 0, "misses": 0}

    @property
    def dim(self) -> int:
        d = self.matryoshka_dim or self.cfg.out_dim
        return d

    def _bucket_batch(self, n: int) -> int:
        for b in self.BATCH_BUCKETS:
            if n <= b:
                return b
        return -(-n // self.BATCH_BUCKETS[-1]) * self.BATCH_BUCKETS[-1]

    def encode(self, texts: list[str]) -> np.ndarray:
        """Embed a list of texts -> [n, dim] float32 unit vectors."""
        out = np.zeros((len(texts), self.dim), np.float32)
        todo_idx: list[int] = []
        seen: dict[str, list[int]] = {}
        with self._cache_lock:
            for i, t in enumerate(texts):
                hit = self._cache.get(t)
                if hit is not None:
                    out[i] = hit
                    self.stats["hits"] += 1
                elif t in seen:          # duplicate within this batch
                    seen[t].append(i)
                    self.stats["hits"] += 1
                else:
                    seen[t] = []
                    todo_idx.append(i)
                    self.stats["misses"] += 1
        if todo_idx:
            todo = [texts[i] for i in todo_idx]
            ids, mask = self.tokenizer.encode_batch(todo, self.max_len)
            bsz = self._bucket_batch(len(todo))
            if bsz > len(todo):
                pad = bsz - len(todo)
                ids = np.pad(ids, ((0, pad), (0, 0)))
                mask = np.pad(mask, ((0, pad), (0, 0)))
            emb = np.asarray(self._fwd(self.params, jnp.asarray(ids),
                                       jnp.asarray(mask)))[:len(todo)]
            if self.matryoshka_dim:
                emb = np.array(emb[:, :self.matryoshka_dim])
                emb /= np.maximum(
                    np.linalg.norm(emb, axis=1, keepdims=True), 1e-9)
            with self._cache_lock:
                for j, i in enumerate(todo_idx):
                    out[i] = emb[j]
                    for dup in seen.get(texts[i], ()):
                        out[dup] = emb[j]
                    self._cache_insert(texts[i], emb[j])
        return out

    def _cache_insert(self, text: str, vec: np.ndarray) -> None:
        """LRU insert; caller holds the lock. cache_size<=0 disables."""
        if self._cache_size <= 0:
            return
        while len(self._cache) >= self._cache_size:
            self._cache.pop(next(iter(self._cache)))
        self._cache[text] = vec

    def encode_one(self, text: str) -> np.ndarray:
        return self.encode([text])[0]

    def cache_put(self, text: str, vec: np.ndarray) -> None:
        """Insert an externally-computed embedding (e.g. the query vector
        that rode back from the fused retrieval dispatch,
        ops/fused_query.py) so later stages get a cache hit instead of a
        fresh forward."""
        with self._cache_lock:
            self._cache_insert(text, np.asarray(vec, np.float32))

    def cache_stats(self) -> dict:
        total = self.stats["hits"] + self.stats["misses"]
        return {**self.stats,
                "hit_rate": self.stats["hits"] / total if total else 0.0,
                "entries": len(self._cache)}


class CrossEncoderService:
    """Batched (query, doc) pair scoring on device.

    Replaces the reference's CPU sentence-transformers predict loop
    (rag/reranker.py:342-359): pairs are bucket-padded and scored in one
    jitted forward; scores come back through a sigmoid like the reference's
    post-processing (:359).
    """

    BATCH_BUCKETS = (8, 32, 64)

    def __init__(self, cfg: TransformerConfig | None = None, params=None,
                 seed: int = 1, max_len: int = 256, tokenizer=None):
        self.cfg = cfg or TransformerConfig()
        self.max_len = max_len
        self.tokenizer = tokenizer or HashTokenizer(self.cfg.vocab_size,
                                                    max_len)
        self.model = CrossEncoder(self.cfg)
        if params is None:
            ids = jnp.zeros((1, 8), jnp.int32)
            params = self.model.init(jax.random.PRNGKey(seed), ids,
                                     jnp.ones((1, 8), jnp.int32),
                                     jnp.zeros((1, 8), jnp.int32))
        self.params = params
        self._fwd = jax.jit(self.model.apply)

    def score_pairs(self, query: str, docs: list[str]) -> np.ndarray:
        """Sigmoid relevance scores [len(docs)] in [0, 1]."""
        if not docs:
            return np.zeros(0, np.float32)
        ids, mask, types = self.tokenizer.encode_pairs(
            [(query, d) for d in docs], self.max_len)
        n = len(docs)
        bsz = next((b for b in self.BATCH_BUCKETS if n <= b),
                   -(-n // self.BATCH_BUCKETS[-1]) * self.BATCH_BUCKETS[-1])
        if bsz > n:
            pad = bsz - n
            ids = np.pad(ids, ((0, pad), (0, 0)))
            mask = np.pad(mask, ((0, pad), (0, 0)))
            types = np.pad(types, ((0, pad), (0, 0)))
        logits = np.asarray(self._fwd(self.params, jnp.asarray(ids),
                                      jnp.asarray(mask),
                                      jnp.asarray(types)))[:n]
        return (1.0 / (1.0 + np.exp(-logits))).astype(np.float32)
