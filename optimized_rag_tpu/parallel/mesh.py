"""Mesh construction and sharding helpers.

Axes follow the scaling-book recipe: pick a mesh, annotate shardings, let
XLA insert the collectives.

  dcn    — (multi-host only) slice/pod axis over the data-center network;
           only batch/corpus data parallelism crosses it — never tensor
           parallelism, whose all-reduces need ICI bandwidth
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


def make_multihost_mesh(model: int = 1, data_per_host: int | None = None
                        ) -> Mesh:
    """(dcn, data, model) mesh for multi-host slices.

    The ``dcn`` axis spans processes (one group per host); ``data`` and
    ``model`` stay within each host's ICI domain, so the only collectives
    crossing DCN are the data-parallel ones (gradient psums, the
    [hosts, B, k] top-k all-gather) — both tiny and latency-tolerant.
    Requires jax.distributed.initialize() to have run on every host;
    degrades to a 1-host dcn axis in single-process runs so the same code
    path is exercised (and tested) everywhere.
    """
    n_hosts = jax.process_count()
    local = jax.local_device_count()
    if data_per_host is None:
        assert local % model == 0, (local, model)
        data_per_host = local // model
    assert data_per_host * model <= local, (data_per_host, model, local)
    per_host = data_per_host * model
    # jax.devices() orders by process; take each host's first per_host.
    devs = np.asarray(
        [d for p in range(n_hosts)
         for d in [d for d in jax.devices() if d.process_index == p]
         [:per_host]])
    dev = devs.reshape(n_hosts, data_per_host, model)
    return Mesh(dev, ("dcn", "data", "model"))


def dcn_corpus_sharding(mesh: Mesh) -> NamedSharding:
    """Corpus rows sharded over BOTH dcn and data axes: each host holds
    N/hosts rows, each chip N/(hosts*data)."""
    return NamedSharding(mesh, P(("dcn", "data"), None))


def corpus_sharding(mesh: Mesh) -> NamedSharding:
    """Corpus rows sharded across the data axis: [N/d, D] per device."""
    return NamedSharding(mesh, P("data", None))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_corpus(mesh: Mesh, corpus) -> jax.Array:
    """Place a [N, D] corpus row-sharded over the data axis (N % d == 0)."""
    return jax.device_put(corpus, corpus_sharding(mesh))
