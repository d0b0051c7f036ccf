"""Sharded training for the retrieval models.

The reference calls frozen external models; here the embedder and reranker
are first-class trainable JAX models, so the framework includes their
training loop, sharded over the (data, model) mesh:

  * data axis  — batch data-parallelism: per-device batch shards, gradients
    reduced by XLA (psum inserted from the sharding annotations)
  * model axis — tensor parallelism: attention QKV/out and MLP in/out
    kernels column/row-sharded, activations all-reduced by XLA across ICI

Bi-encoder objective: symmetric InfoNCE over in-batch negatives (the
standard dual-encoder recipe). Cross-encoder objective: pointwise sigmoid
relevance (mirrors the ms-marco training target of the reference's
reranker model, rag/reranker.py:313).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from optimized_rag_tpu.models.encoder import (
    BiEncoder, CrossEncoder, TransformerConfig)


# ---------------------------------------------------------------------------
# Param partitioning (tensor parallelism)
# ---------------------------------------------------------------------------

def param_pspec(path: tuple, leaf) -> P:
    """PartitionSpec for one param leaf, keyed on its module path.

    Column-parallel: attention q/k/v kernels, mlp_in  (split output dim)
    Row-parallel:    attention out kernel,   mlp_out  (split input dim)
    Everything else (embeddings, layernorms, biases, heads) replicated.
    """
    names = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(names)
    ndim = getattr(leaf, "ndim", 0)
    if "qkv" in joined and "kernel" in joined:
        return P(None, "model")          # decoder fused qkv [H, 3H]
    if "attn" in joined and "kernel" in joined:
        if "out" in joined:
            # [heads, head_dim, hidden] — split heads (row-parallel input)
            return P("model", None, None) if ndim == 3 else P("model", None)
        # query/key/value kernels [hidden, heads, head_dim] — split heads
        return P(None, "model", None) if ndim == 3 else P(None, "model")
    if "mlp_in" in joined and "kernel" in joined:
        return P(None, "model")
    if "mlp_out" in joined and "kernel" in joined:
        return P("model", None)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param tree on the mesh with tensor-parallel layout."""
    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, param_pspec(path,
                                                                    leaf)))
    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_pspec(path, leaf)),
        params)


# ---------------------------------------------------------------------------
# Bi-encoder contrastive training
# ---------------------------------------------------------------------------

def info_nce_loss(q_emb, d_emb, temperature: float = 0.05):
    """Symmetric in-batch-negative InfoNCE. q_emb/d_emb [B, D] unit vecs."""
    logits = jnp.dot(q_emb, d_emb.T,
                     preferred_element_type=jnp.float32) / temperature
    labels = jnp.arange(logits.shape[0])
    loss_q = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_d = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return 0.5 * (loss_q.mean() + loss_d.mean())


class BiEncoderTrainer:
    """Contrastive trainer for the embedding model on a (data, model) mesh."""

    def __init__(self, cfg: TransformerConfig, mesh: Mesh,
                 learning_rate: float = 1e-4, temperature: float = 0.05,
                 seed: int = 0):
        self.cfg = cfg
        self.mesh = mesh
        self.model = BiEncoder(cfg)
        self.temperature = temperature
        ids = jnp.zeros((1, 8), jnp.int32)
        params = self.model.init(jax.random.PRNGKey(seed), ids,
                                 jnp.ones((1, 8), jnp.int32))
        self.params = shard_params(params, mesh)
        self.tx = optax.adamw(learning_rate)
        opt_state = self.tx.init(params)
        self.opt_state = jax.device_put(
            opt_state, NamedSharding(mesh, P()))
        self._step = self._build_step()

    def _build_step(self):
        batch_sharding = NamedSharding(self.mesh, P("data", None))
        p_shard = param_shardings(self.params, self.mesh)

        def loss_fn(params, q_ids, q_mask, d_ids, d_mask):
            q = self.model.apply(params, q_ids, q_mask)
            d = self.model.apply(params, d_ids, d_mask)
            return info_nce_loss(q, d, self.temperature)

        @functools.partial(
            jax.jit,
            in_shardings=(p_shard, None, batch_sharding, batch_sharding,
                          batch_sharding, batch_sharding),
            out_shardings=(p_shard, None, None))
        def step(params, opt_state, q_ids, q_mask, d_ids, d_mask):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, q_ids, q_mask, d_ids, d_mask)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def train_step(self, q_ids, q_mask, d_ids, d_mask) -> float:
        with jax.sharding.set_mesh(self.mesh):
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, q_ids, q_mask, d_ids, d_mask)
        return float(loss)


# ---------------------------------------------------------------------------
# Decoder LM training (next-token cross-entropy)
# ---------------------------------------------------------------------------

class DecoderTrainer:
    """Causal-LM trainer on the (data, model) mesh: DP batch shards + TP
    attention/MLP kernels (same partitioning rules as the encoders —
    param_pspec keys on qkv/attn_out/mlp_in/mlp_out paths)."""

    def __init__(self, cfg, mesh: Mesh, learning_rate: float = 3e-4,
                 seed: int = 0):
        from optimized_rag_tpu.models.decoder import PAD, DecoderLM
        self.cfg = cfg
        self.mesh = mesh
        self.model = DecoderLM(cfg)
        self._pad = PAD
        params = self.model.init(jax.random.PRNGKey(seed),
                                 jnp.zeros((1, 8), jnp.int32))
        self.params = shard_params(params, mesh)
        self.tx = optax.adamw(learning_rate)
        self.opt_state = jax.device_put(self.tx.init(params),
                                        NamedSharding(mesh, P()))
        self._step = self._build_step()

    def _build_step(self):
        batch_sharding = NamedSharding(self.mesh, P("data", None))
        p_shard = param_shardings(self.params, self.mesh)
        pad = self._pad

        def loss_fn(params, ids):
            logits, _ = self.model.apply(params, ids)
            logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
            tgt = ids[:, 1:]
            mask = (tgt != pad).astype(jnp.float32)
            token_lp = jnp.take_along_axis(logp, tgt[..., None],
                                           axis=-1)[..., 0]
            return -(token_lp * mask).sum() / jnp.maximum(mask.sum(), 1.0)

        @functools.partial(
            jax.jit,
            in_shardings=(p_shard, None, batch_sharding),
            out_shardings=(p_shard, None, None))
        def step(params, opt_state, ids):
            loss, grads = jax.value_and_grad(loss_fn)(params, ids)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def train_step(self, ids) -> float:
        with jax.sharding.set_mesh(self.mesh):
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, ids)
        return float(loss)


# ---------------------------------------------------------------------------
# Cross-encoder pointwise training
# ---------------------------------------------------------------------------

class CrossEncoderTrainer:
    def __init__(self, cfg: TransformerConfig, mesh: Mesh,
                 learning_rate: float = 1e-4, seed: int = 0):
        self.cfg = cfg
        self.mesh = mesh
        self.model = CrossEncoder(cfg)
        ids = jnp.zeros((1, 8), jnp.int32)
        params = self.model.init(jax.random.PRNGKey(seed), ids,
                                 jnp.ones((1, 8), jnp.int32),
                                 jnp.zeros((1, 8), jnp.int32))
        self.params = shard_params(params, mesh)
        self.tx = optax.adamw(learning_rate)
        self.opt_state = jax.device_put(self.tx.init(params),
                                        NamedSharding(mesh, P()))
        self._step = self._build_step()

    def _build_step(self):
        batch_sharding = NamedSharding(self.mesh, P("data", None))
        label_sharding = NamedSharding(self.mesh, P("data"))
        p_shard = param_shardings(self.params, self.mesh)

        def loss_fn(params, ids, mask, types, labels):
            logits = self.model.apply(params, ids, mask, types)
            return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

        @functools.partial(
            jax.jit,
            in_shardings=(p_shard, None, batch_sharding, batch_sharding,
                          batch_sharding, label_sharding),
            out_shardings=(p_shard, None, None))
        def step(params, opt_state, ids, mask, types, labels):
            loss, grads = jax.value_and_grad(loss_fn)(params, ids, mask,
                                                      types, labels)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def train_step(self, ids, mask, types, labels) -> float:
        with jax.sharding.set_mesh(self.mesh):
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, ids, mask, types, labels)
        return float(loss)
