"""BASELINE.json config[4]: 10M-vector partitioned index over a mesh.

Two modes:
  * real chip (single): IVF cluster-pruned top-k at 10M on one v5e chip,
    recall vs exact measured on clustered data
  * virtual mesh (JAX_PLATFORMS=cpu + host_platform_device_count=8):
    validates the sharded all-gather-merge path at reduced scale

Run:  python benchmarks/bench_sharded.py [ivf10m|mesh]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
from benchmarks.common import (
    emit, log, make_corpus, make_corpus_device, recall_at_k, timed)


def ivf10m(n: int = 10_485_760, d: int = 128) -> None:  # 10*2^20 (chunk-divisible)
    import jax.numpy as jnp
    from optimized_rag_tpu.index.ivf import IVFIndex
    from optimized_rag_tpu.ops.topk import chunked_topk

    log(f"building {n}x{d} clustered corpus ON DEVICE (bf16 storage)...")
    corpus = make_corpus_device(n, d, clusters=4096, dtype=jnp.bfloat16)
    corpus.block_until_ready()
    log("corpus ready; building IVF...")
    ivf = IVFIndex(num_clusters=4096, nprobe=128, kmeans_iters=6, tile=2048)
    import time
    t0 = time.perf_counter()
    ivf.build(corpus, storage_dtype=jnp.bfloat16)
    build_s = time.perf_counter() - t0
    log(f"IVF build (on-device k-means, {ivf.num_clusters_built} clusters): "
        f"{build_s:.1f}s; window={ivf._window}")

    rng = np.random.default_rng(7)
    b = 64
    # Queries = perturbed corpus rows; only b rows cross the link.
    base_rows = np.asarray(corpus[jnp.asarray(rng.integers(0, n, b))])
    q = base_rows + 0.05 * rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    # Exact oracle via streamed chunked top-k on device (CPU would take
    # minutes at 10M).
    cj = corpus
    oracle_s, oracle_i = chunked_topk(jnp.asarray(q), cj, 10, chunk=131072)
    oracle_i = np.asarray(oracle_i)

    def run_exact():
        s, i = chunked_topk(jnp.asarray(q), cj, 10, chunk=131072)
        _ = np.asarray(i)
    dt_exact = timed(run_exact, iters=3)

    sweep = {}
    for nprobe in (8, 16, 32, 64, 128):
        def run():
            run.out = ivf.search(q, k=10, nprobe=nprobe)
            _ = run.out[1]
        dt = timed(run, iters=5)
        rec = recall_at_k(run.out[1], oracle_i)
        sweep[nprobe] = {"qps": round(b / dt, 1),
                         "recall_at_10": round(rec, 4)}
        log(f"nprobe={nprobe}: {sweep[nprobe]}")

    emit({"stage": 4, "metric": "ivf_10M_sweep", "n": n,
          "exact_qps": round(b / dt_exact, 1),
          "build_seconds": round(build_s, 1),
          "clusters": ivf.num_clusters_built,
          "window": ivf._window,
          "nprobe_sweep": sweep})


def mesh_validate() -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from optimized_rag_tpu.parallel.mesh import make_mesh, shard_corpus
    from optimized_rag_tpu.parallel.sharded_topk import sharded_topk

    mesh = make_mesh(data=8)
    n, d = 8 * 8192, 128
    corpus = make_corpus(n, d, clusters=64)
    q = corpus[:32]
    sharded = shard_corpus(mesh, jnp.asarray(corpus))
    sizes = jnp.full((8,), n // 8, jnp.int32)

    def run():
        s, i = sharded_topk(jnp.asarray(q), sharded, 10, mesh=mesh,
                            sizes=sizes)
        run.ids = np.asarray(i)
    dt = timed(run, iters=5)
    oracle = np.argsort(-(q @ corpus.T), axis=1)[:, :10]
    emit({"stage": 4, "metric": "sharded_mesh_validation",
          "devices": 8, "qps": round(32 / dt, 1),
          "recall_at_10": recall_at_k(run.ids, oracle)})


def mesh_ivf_validate() -> None:
    """BASELINE config[4] composition: cluster-partitioned IVF over the
    mesh, recall@10 vs the exact oracle (gate: >= exact-parity on the
    clustered eval; pruning must not cost recall at the chosen nprobe)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from optimized_rag_tpu.parallel.mesh import make_mesh
    from optimized_rag_tpu.parallel.sharded_ivf import ShardedIVFIndex

    mesh = make_mesh(data=8)
    n, d, k, b = 8 * 8192, 128, 10, 32
    corpus = make_corpus(n, d, clusters=256)
    rng = np.random.default_rng(3)
    q = corpus[rng.integers(0, n, b)] \
        + 0.05 * rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    idx = ShardedIVFIndex(mesh, num_clusters=256, nprobe=48,
                          kmeans_iters=8, tile=1024)
    import time
    t0 = time.time()
    idx.build(corpus)
    build_s = time.time() - t0
    oracle = np.argsort(-(q @ corpus.T), axis=1)[:, :k]
    sweep = {}
    for nprobe in (8, 16, 32, 48):
        def run():
            run.out = idx.search(q, k=k, nprobe=nprobe)
            _ = run.out[1]
        dt = timed(run, iters=5)
        sweep[nprobe] = {"qps": round(b / dt, 1),
                         "recall_at_10": recall_at_k(run.out[1], oracle)}
        log(f"mesh-ivf nprobe={nprobe}: {sweep[nprobe]}")
    emit({"stage": 4, "metric": "sharded_mesh_ivf", "devices": 8,
          "n": n, "clusters": idx.num_clusters_built,
          "build_seconds": round(build_s, 1), "nprobe_sweep": sweep})


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ivf10m"
    if which in ("mesh", "mesh-ivf"):
        import os
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
        mesh_validate() if which == "mesh" else mesh_ivf_validate()
    else:
        ivf10m()
