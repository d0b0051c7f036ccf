"""Index selection policy: Dense / IVF / sharded by scale and devices.

The reference picks HNSW vs IVFFlat at table-creation time
(rag/document_store.py:141-155). Here the policy is explicit and
measurement-driven (docs/RESULTS_r1.md): exact fused brute force wins on
a single chip up to ~10M vectors at 128d bf16 (streaming budget), IVF
pays off past that, and any multi-device mesh shards rows (brute force)
or clusters (IVF) with an all-gather merge.

``select_index_kind`` is pure policy; ``build_index_for`` constructs the
chosen index. The agent consults the policy at startup and again after
ingestion grows the corpus past a threshold (RAGAgent.maybe_upgrade_index).
"""

from __future__ import annotations

from typing import Optional


def select_index_kind(corpus_size: int, n_devices: int,
                      ivf_min_size: int = 16_000_000,
                      shard_min_size: int = 250_000) -> str:
    """Returns one of "dense", "ivf", "sharded_dense", "sharded_ivf".

    * single device: exact brute force until ``ivf_min_size`` (measured
      round 2 at 10M x 128 bf16, docs/RESULTS_r2.md: the streaming exact
      kernel beats IVF — even balanced-cluster IVF — at every batch
      size; IVF only engages near the HBM streaming budget), IVF past it
    * multi device: small corpora stay dense on one chip (collectives
      cost more than they save below ``shard_min_size``); larger ones
      shard rows; past ``ivf_min_size`` per the whole corpus, shard
      clusters
    """
    if n_devices <= 1:
        return "dense" if corpus_size < ivf_min_size else "ivf"
    if corpus_size < shard_min_size:
        return "dense"
    return "sharded_dense" if corpus_size < ivf_min_size else "sharded_ivf"


def build_index_for(kind: str, dim: int, settings, mesh=None,
                    capacity_block: int = 65536, tile: int = 1024):
    """Construct an (empty or to-be-built) index of the selected kind."""
    if kind == "dense":
        from optimized_rag_tpu.index.dense import DenseIndex
        return DenseIndex(dim=dim, capacity_block=capacity_block, tile=tile)
    if kind == "ivf":
        from optimized_rag_tpu.index.ivf import IVFIndex
        return IVFIndex(num_clusters=settings.ivf.num_clusters,
                        nprobe=settings.ivf.nprobe,
                        kmeans_iters=settings.ivf.kmeans_iters, tile=tile)
    assert mesh is not None, f"{kind} needs a mesh"
    if kind == "sharded_dense":
        from optimized_rag_tpu.parallel.sharded_topk import ShardedDenseIndex
        return ShardedDenseIndex(dim=dim, mesh=mesh,
                                 capacity_block=capacity_block, tile=tile)
    if kind == "sharded_ivf":
        from optimized_rag_tpu.parallel.sharded_ivf import ShardedIVFIndex
        return ShardedIVFIndex(mesh, num_clusters=settings.ivf.num_clusters,
                               nprobe=settings.ivf.nprobe,
                               kmeans_iters=settings.ivf.kmeans_iters,
                               tile=tile)
    raise ValueError(f"unknown index kind {kind!r}")


def mesh_or_none(settings) -> Optional[object]:
    """Build the configured mesh when settings ask for >1-way data
    parallelism; None keeps everything single-device."""
    if settings.mesh.data_parallel <= 1:
        return None
    from optimized_rag_tpu.parallel.mesh import make_mesh
    return make_mesh(data=settings.mesh.data_parallel,
                     model=settings.mesh.model_parallel)
