"""Sharded top-k over the virtual 8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimized_rag_tpu.parallel.mesh import (
    corpus_sharding, make_mesh, shard_corpus)
from optimized_rag_tpu.parallel.sharded_topk import (
    ShardedDenseIndex, sharded_topk)


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_topk_matches_oracle(rng):
    mesh = make_mesh(data=8)
    n, d, k = 8 * 512, 64, 10
    docs = _unit(rng, n, d)
    q = _unit(rng, 4, d)
    corpus = shard_corpus(mesh, jnp.asarray(docs))
    sizes = jnp.full((8,), n // 8, jnp.int32)
    s, ids = sharded_topk(jnp.asarray(q), corpus, k, mesh=mesh, sizes=sizes)
    oracle = np.argsort(-(q @ docs.T), axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(ids), oracle)


def test_sharded_topk_respects_per_shard_sizes(rng):
    mesh = make_mesh(data=8)
    n, d, k = 8 * 256, 32, 5
    docs = _unit(rng, n, d)
    # Only the first 100 rows of each shard are live.
    live = np.zeros(n, bool)
    per = n // 8
    for s in range(8):
        live[s * per: s * per + 100] = True
    corpus = shard_corpus(mesh, jnp.asarray(docs))
    sizes = jnp.full((8,), 100, jnp.int32)
    q = _unit(rng, 2, d)
    _, ids = sharded_topk(jnp.asarray(q), corpus, k, mesh=mesh, sizes=sizes)
    ids = np.asarray(ids)
    assert live[ids].all()
    scores_masked = q @ docs.T
    scores_masked[:, ~live] = -np.inf
    oracle = np.argsort(-scores_masked, axis=1)[:, :k]
    np.testing.assert_array_equal(ids, oracle)


@pytest.mark.parametrize("impl", ["auto", "chunked", "pallas"])
def test_sharded_topk_impls_agree(rng, impl):
    mesh = make_mesh(data=8)
    n, d, k = 8 * 1024, 32, 7
    docs = _unit(rng, n, d)
    q = _unit(rng, 2, d)
    corpus = shard_corpus(mesh, jnp.asarray(docs))
    sizes = jnp.full((8,), n // 8, jnp.int32)
    kwargs = dict(mesh=mesh, sizes=sizes, tile=256, chunk=256)
    _, ids = sharded_topk(jnp.asarray(q), corpus, k, impl=impl, **kwargs)
    oracle = np.argsort(-(q @ docs.T), axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(ids), oracle)


def test_sharded_dense_index_add_and_search(rng):
    mesh = make_mesh(data=8)
    idx = ShardedDenseIndex(dim=32, mesh=mesh, capacity_block=8 * 256,
                            tile=256)
    docs = _unit(rng, 300, 32)
    ids = idx.add(docs)
    assert ids.tolist() == list(range(300))
    q = docs[17:18]
    scores, got = idx.search(q, k=3)
    assert got[0, 0] == 17
    assert scores[0, 0] > 0.999


def test_sharded_dense_index_incremental_adds(rng):
    mesh = make_mesh(data=8)
    idx = ShardedDenseIndex(dim=16, mesh=mesh, capacity_block=8 * 256,
                            tile=256)
    a = _unit(rng, 100, 16)
    b = _unit(rng, 100, 16)
    idx.add(a)
    ids_b = idx.add(b)
    assert ids_b[0] == 100
    q = b[5:6]
    _, got = idx.search(q, k=1)
    assert got[0, 0] == 105


def test_sharded_dense_index_grows_capacity(rng):
    mesh = make_mesh(data=8)
    idx = ShardedDenseIndex(dim=16, mesh=mesh, capacity_block=8 * 256,
                            tile=256)
    cap0 = idx.shard_capacity
    docs = _unit(rng, 8 * 256 + 50, 16)   # overflow initial capacity
    idx.add(docs)
    assert idx.shard_capacity > cap0
    assert idx.size == len(docs)
    _, got = idx.search(docs[2090:2091], k=1)
    assert got[0, 0] == 2090


# ------------------------------------------------- round-2: scale honesty

def test_sharded_index_bulk_add_and_id_maps(rng):
    """Bulk (water-fill) placement stays balanced across grows and the
    persistent row<->ext maps stay mutually consistent."""
    mesh = make_mesh(data=8)
    idx = ShardedDenseIndex(dim=16, mesh=mesh, capacity_block=8 * 256,
                            tile=256)
    all_ids = []
    for n in (100, 3000, 7):
        all_ids.append(idx.add(_unit(rng, n, 16)))
    ids = np.concatenate(all_ids)
    assert (ids == np.arange(3107)).all()
    # balance: no shard more than 1 above the minimum
    assert idx._sizes.max() - idx._sizes.min() <= 1
    # bidirectional map consistency
    rows = idx._rows_by_ext
    assert len(rows) == 3107
    assert (idx._row_to_ext[rows] == np.arange(3107)).all()
    occupied = idx._row_to_ext >= 0
    assert occupied.sum() == 3107


def test_sharded_index_search_host_work_is_o_k(rng):
    """Search host-side id mapping must not scale with N: ~1M rows through
    several capacity grows, exact self-hits, and the whole mapped search
    far below what any O(N)-per-query host pass would take."""
    import time
    mesh = make_mesh(data=8)
    idx = ShardedDenseIndex(dim=8, mesh=mesh, capacity_block=8 * 1024,
                            tile=256)
    n = 1_050_000
    docs = _unit(rng, n, 8)
    t0 = time.time()
    ids = idx.add(docs)          # old per-row argmin loop: minutes at 1M
    add_s = time.time() - t0
    # Self-calibrating bound: one O(N) python dict build over the same
    # row count is the unit of "host pass"; it slows down with CI load
    # exactly like the code under test, so the bound doesn't flake.
    t0 = time.time()
    _ = {int(i): int(i) for i in range(n)}
    host_pass_s = max(time.time() - t0, 0.05)
    assert add_s < 120 * host_pass_s + 30, \
        f"bulk add took {add_s:.1f}s (host pass {host_pass_s:.2f}s)"
    assert idx.size == n and len(ids) == n
    probe_ext = np.array([0, 123_456, 999_999])
    probe_rows = idx._rows_by_ext[probe_ext]
    q = np.asarray(jnp.take(idx._emb, jnp.asarray(probe_rows), axis=0),
                   np.float32)
    idx.search(q, k=5)           # warm the compile
    search_s = float("inf")
    for _ in range(3):           # best-of-3 rides out CI CPU contention
        t0 = time.time()
        scores, got = idx.search(q, k=5)
        search_s = min(search_s, time.time() - t0)
    assert (got[:, 0] == probe_ext).all(), got[:, 0]
    # Device brute force at 1M x 8 on CPU is ~10ms; the old O(N)
    # regression rebuilt a 1M-entry dict per query (>= host_pass_s each).
    # Calibrated bound catches the regression without flaking under load.
    assert search_s < max(4 * host_pass_s, 1.0), \
        f"search took {search_s:.2f}s (host pass {host_pass_s:.2f}s)"


# ------------------------------------------------- round-2: sharded IVF

def test_partition_clusters_balances():
    from optimized_rag_tpu.parallel.sharded_ivf import partition_clusters
    counts = np.array([100, 90, 10, 10, 10, 10, 50, 40, 30, 20])
    shard_of = partition_clusters(counts, 4)
    load = np.zeros(4, np.int64)
    np.add.at(load, shard_of, counts)
    assert load.max() - load.min() <= 100  # no shard dominated


def test_sharded_ivf_recall_vs_oracle(rng):
    from optimized_rag_tpu.parallel.sharded_ivf import ShardedIVFIndex
    mesh = make_mesh(data=8)
    n, d, k = 8192, 32, 10
    # clustered corpus so IVF pruning is meaningful
    centers = _unit(rng, 64, d)
    docs = centers[rng.integers(0, 64, n)] + \
        0.25 * rng.standard_normal((n, d)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = docs[rng.integers(0, n, 16)] + \
        0.05 * rng.standard_normal((16, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    idx = ShardedIVFIndex(mesh, num_clusters=64, nprobe=16,
                          kmeans_iters=8, tile=256)
    idx.build(docs)
    scores, ids = idx.search(q, k)
    oracle = np.argsort(-(q @ docs.T), axis=1)[:, :k]
    recall = np.mean([len(set(ids[r]) & set(oracle[r])) / k
                      for r in range(len(q))])
    assert recall >= 0.9, recall
    # scores must be true cosines for the returned ids
    got = q[0] @ docs[ids[0, 0]]
    assert abs(got - scores[0, 0]) < 1e-3


def test_sharded_ivf_external_ids_and_small_k(rng):
    from optimized_rag_tpu.parallel.sharded_ivf import ShardedIVFIndex
    mesh = make_mesh(data=8)
    docs = _unit(rng, 1024, 16)
    ext = np.arange(1024, dtype=np.int64) + 5000
    idx = ShardedIVFIndex(mesh, num_clusters=16, nprobe=16, tile=256)
    idx.build(docs, ids=ext)
    scores, ids = idx.search(docs[:4], k=3)
    assert (ids[:, 0] == ext[:4]).all()
    # k larger than corpus pads with -1
    _, ids2 = idx.search(docs[:2], k=2000)
    assert (ids2 >= -1).all() and ids2.shape == (2, 2000)


# --------------------------------------------- round-2: multi-host (DCN)

def test_multihost_mesh_single_process_shape():
    from optimized_rag_tpu.parallel.mesh import make_multihost_mesh
    mesh = make_multihost_mesh(model=1)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert mesh.shape["dcn"] == 1 and mesh.shape["data"] == 8


def test_sharded_topk_over_composite_dcn_axis(rng):
    """The same sharded top-k runs over the (dcn, data) composite axis of
    a multi-host-shaped mesh; merge all-gather spans both axes."""
    import jax
    from optimized_rag_tpu.parallel.mesh import (
        dcn_corpus_sharding, make_multihost_mesh)
    mesh = make_multihost_mesh(model=2)   # (1, 4, 2) on 8 virtual devices
    ndev = mesh.shape["dcn"] * mesh.shape["data"]
    n, d, k = ndev * 512, 64, 10
    docs = _unit(rng, n, d)
    q = _unit(rng, 8, d)
    corpus = jax.device_put(jnp.asarray(docs), dcn_corpus_sharding(mesh))
    sizes = jnp.full((ndev,), n // ndev, jnp.int32)
    s, ids = sharded_topk(jnp.asarray(q), corpus, k, mesh=mesh,
                          sizes=sizes, axis=("dcn", "data"))
    oracle = np.argsort(-(q @ docs.T), axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(ids), oracle)


def test_sharded_dense_missing_slots_use_inf_convention(rng):
    """Kernels mask dead rows with the FINITE sentinel -1e30; the index
    must normalize those to -inf / id=-1 (the convention every other
    index uses), or consumers treating finite scores as valid hits see
    ghost matches when a shard holds fewer live rows than k."""
    mesh = make_mesh(data=8)
    idx = ShardedDenseIndex(dim=16, mesh=mesh, capacity_block=8 * 256,
                            tile=256)
    docs = _unit(rng, 10, 16)          # 10 rows over 8 shards, k=10
    idx.add(docs)
    scores, ids = idx.search(docs[:2], k=10)
    live = ids >= 0
    assert np.isfinite(scores[live]).all()
    assert (scores[~live] == -np.inf).all(), scores[~live]
    assert (scores > -1e29).sum(axis=1).max() <= 10
    assert ids[0, 0] == 0 and ids[1, 0] == 1      # real hits still first
