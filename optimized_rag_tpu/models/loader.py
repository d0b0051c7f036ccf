"""Model parameter persistence and (optional) HF BERT weight import.

Persistence uses flattened-npz (same scheme as index/snapshot.py), so
model + index checkpoints live side by side in a snapshot directory.

``import_hf_bert`` maps a locally-available HuggingFace BERT-family
state dict (e.g. ms-marco-MiniLM-L-6-v2, the reference's cross-encoder,
rag/reranker.py:313) onto this framework's param tree. The environment has
no network egress, so this path only activates when a local model dir
exists; tests exercise it with a random-init ``transformers`` BERT.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    tree: dict = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


def save_params(path: str, name: str, params) -> None:
    os.makedirs(path, exist_ok=True)
    np.savez_compressed(os.path.join(path, f"{name}.params.npz"),
                        **_flatten(params))


def load_params(path: str, name: str):
    with np.load(os.path.join(path, f"{name}.params.npz")) as z:
        return _unflatten({k: z[k] for k in z.files})


# ---------------------------------------------------------------------------
# HuggingFace BERT import
# ---------------------------------------------------------------------------

def import_hf_bert(state_dict: dict, num_layers: int, num_heads: int,
                   hidden_dim: int, trunk_key: str = "trunk",
                   hf_prefix: str = ""):
    """Map a torch BERT state_dict onto this framework's trunk params.

    Returns a dict subtree for the ``trunk`` module (embeddings + blocks +
    final LN are mapped; the caller keeps its own heads). HF BERT is
    post-LN while this trunk is pre-LN — weights still transfer usefully
    for warm-starting, which is all the no-egress environment permits.
    """
    def t(name):
        arr = state_dict[hf_prefix + name]
        return np.asarray(arr.detach().cpu().numpy()
                          if hasattr(arr, "detach") else arr)

    head_dim = hidden_dim // num_heads
    trunk = {
        "emb": {
            "tok": {"embedding": t("embeddings.word_embeddings.weight")},
            "pos": {"embedding": t("embeddings.position_embeddings.weight")},
            "typ": {"embedding": t("embeddings.token_type_embeddings.weight")},
            "ln": {"scale": t("embeddings.LayerNorm.weight"),
                   "bias": t("embeddings.LayerNorm.bias")},
        },
        "ln_f": {"scale": np.ones(hidden_dim, np.float32),
                 "bias": np.zeros(hidden_dim, np.float32)},
    }
    for i in range(num_layers):
        pre = f"encoder.layer.{i}."
        qkv = {}
        for name, hf in (("query", "attention.self.query"),
                         ("key", "attention.self.key"),
                         ("value", "attention.self.value")):
            w = t(pre + hf + ".weight").T        # [hidden, hidden]
            b = t(pre + hf + ".bias")
            qkv[name] = {
                "kernel": w.reshape(hidden_dim, num_heads, head_dim),
                "bias": b.reshape(num_heads, head_dim),
            }
        out_w = t(pre + "attention.output.dense.weight").T
        qkv["out"] = {
            "kernel": out_w.reshape(num_heads, head_dim, hidden_dim),
            "bias": t(pre + "attention.output.dense.bias"),
        }
        trunk[f"block_{i}"] = {
            "attn": qkv,
            "ln1": {"scale": t(pre + "attention.output.LayerNorm.weight"),
                    "bias": t(pre + "attention.output.LayerNorm.bias")},
            "ln2": {"scale": t(pre + "output.LayerNorm.weight"),
                    "bias": t(pre + "output.LayerNorm.bias")},
            "mlp_in": {"kernel": t(pre + "intermediate.dense.weight").T,
                       "bias": t(pre + "intermediate.dense.bias")},
            "mlp_out": {"kernel": t(pre + "output.dense.weight").T,
                        "bias": t(pre + "output.dense.bias")},
        }
    return {trunk_key: jax.tree.map(jnp.asarray, trunk)}
