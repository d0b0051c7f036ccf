"""Mesh construction and sharding helpers.

Axes follow the scaling-book recipe: pick a mesh, annotate shardings, let
XLA insert the collectives.

  data   — corpus shards / batch data-parallelism (rides ICI)
  model  — tensor parallelism for encoder training (heads / mlp split)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh. data=None uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    dev = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(dev, ("data", "model"))


def corpus_sharding(mesh: Mesh) -> NamedSharding:
    """Corpus rows sharded across the data axis: [N/d, D] per device."""
    return NamedSharding(mesh, P("data", None))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_corpus(mesh: Mesh, corpus) -> jax.Array:
    """Place a [N, D] corpus row-sharded over the data axis (N % d == 0)."""
    return jax.device_put(corpus, corpus_sharding(mesh))
