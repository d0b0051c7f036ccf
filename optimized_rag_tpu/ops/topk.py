"""Dense top-k retrieval: fused matmul + k-selection.

This replaces the reference's pgvector nearest-neighbour SQL
(`ORDER BY embedding <=> query LIMIT k`, rag/document_store.py:448-460;
database/operations.py:126-137) with on-TPU kernels.

Three implementations, all returning ``(scores [B,k], indices [B,k])``:

  * ``exact_topk``   — one matmul + ``lax.top_k``. Best for N up to a few
                       hundred thousand where the [B,N] score matrix fits.
  * ``chunked_topk`` — ``lax.scan`` over corpus chunks carrying a running
                       top-k; memory is O(B*(chunk+k)) so N can be tens of
                       millions. Pure XLA; the matmul rides the MXU and the
                       merge is a small sort per chunk.
  * ``pallas_topk``  — two-stage Pallas kernel: stage 1 computes per-tile
                       scores in VMEM and extracts the tile-local top-k with
                       an unrolled k-step masked argmax (scores never touch
                       HBM); stage 2 is a tiny ``lax.top_k`` over the
                       ``tiles*k`` survivors. This is the speed-of-light
                       path: HBM traffic is exactly one read of the corpus.

Corpora are stored padded to a static capacity (index/dense.py); ``size``
masks out padding rows so growth never triggers recompilation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _mask_padding(scores: jax.Array, base: int | jax.Array, size) -> jax.Array:
    """Set score columns whose global row index >= size to -inf."""
    n = scores.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, scores.ndim - 1)
    return jnp.where(col + base < size, scores, NEG_INF)


@functools.partial(jax.jit, static_argnames=("k",))
def exact_topk(queries: jax.Array, corpus: jax.Array, k: int,
               size: jax.Array | int | None = None,
               row_scale: jax.Array | None = None):
    """Brute-force fused matmul+top-k. queries [B,D], corpus [N,D].

    ``row_scale`` [N]: per-row dequantization scales for an integer
    corpus (ops/quantize.py), applied as one fused broadcast multiply.
    """
    scores = jnp.dot(queries.astype(jnp.float32), corpus.astype(jnp.float32).T,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    if row_scale is not None:
        scores = scores * row_scale[None, :].astype(jnp.float32)
    if size is not None:
        scores = _mask_padding(scores, 0, size)
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def chunked_topk(queries: jax.Array, corpus: jax.Array, k: int,
                 size: jax.Array | int | None = None, chunk: int = 65536,
                 row_scale: jax.Array | None = None):
    """Streaming top-k over corpus chunks; memory O(B*(chunk+k)).

    The corpus is reshaped to [T, chunk, D] and scanned, carrying the
    running (scores, indices). N need not be a multiple of ``chunk``:
    the remainder tail (n % chunk rows, a static shape) is scored with
    one extra matmul and merged into the carry — no host-side padding
    copy for awkward shard capacities (e.g. 12.5M rows rounded to a
    tile multiple, not a chunk multiple).

    ``row_scale`` [N]: per-row dequantization scales for an integer
    corpus (ops/quantize.py); applied to each chunk's scores in-scan.
    """
    n, d = corpus.shape
    b = queries.shape[0]
    t = n // chunk
    rem = n - t * chunk
    q = queries.astype(jnp.float32)
    corpus3 = corpus[:t * chunk].reshape(t, chunk, d)
    scale3 = (None if row_scale is None
              else row_scale[:t * chunk].astype(jnp.float32)
              .reshape(t, chunk))
    size_ = jnp.asarray(n if size is None else size, jnp.int32)

    def score_rows(rows, scale_row):
        s = jnp.dot(q, rows.astype(jnp.float32).T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)     # [B, rows]
        return s if scale_row is None else s * scale_row[None, :]

    def step(carry, inp):
        best_s, best_i = carry
        tile_idx, tile, scale_row = inp
        s = score_rows(tile, scale_row)                      # [B, chunk]
        base = tile_idx * chunk
        s = _mask_padding(s, base, size_)
        cand_s = jnp.concatenate([best_s, s], axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1) + base
        cand_i = jnp.concatenate([best_i, col], axis=1)
        top_s, pos = jax.lax.top_k(cand_s, k)
        top_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return (top_s, top_i), None

    if scale3 is None:
        def step_unscaled(carry, inp):
            tile_idx, tile = inp
            return step(carry, (tile_idx, tile, None))
        scan_fn, xs = step_unscaled, (jnp.arange(t, dtype=jnp.int32),
                                      corpus3)
    else:
        scan_fn, xs = step, (jnp.arange(t, dtype=jnp.int32), corpus3,
                             scale3)
    init = (jnp.full((b, k), NEG_INF), jnp.full((b, k), -1, jnp.int32))
    if t:
        (scores, idx), _ = jax.lax.scan(scan_fn, init, xs)
    else:
        scores, idx = init
    if rem:
        tail = corpus[t * chunk:]
        s = score_rows(tail, None if row_scale is None
                       else row_scale[t * chunk:].astype(jnp.float32))
        base = t * chunk
        s = _mask_padding(s, base, size_)
        cand_s = jnp.concatenate([scores, s], axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, (b, rem), 1) + base
        cand_i = jnp.concatenate([idx, col], axis=1)
        scores, pos = jax.lax.top_k(cand_s, k)
        idx = jnp.take_along_axis(cand_i, pos, axis=1)
    return scores, idx


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

def _tile_topk_kernel(size_ref, q_ref, c_ref, s_out, i_out, *, tile: int,
                      k: int, precision):
    """Stage 1: per-corpus-tile top-k, scores never leave VMEM.

    Grid is (num_tiles,). q_ref [B,D] (full, resident); c_ref [tile,D] is the
    current corpus tile; outputs are the tile-local top-k [1,k,B].
    (k-major: with B minor the block pads k up to the 8-sublane multiple
    only — the earlier [1,B,k] layout padded k=10 to the 128-lane width,
    a 12.8x HBM expansion that OOM'd a 32M-row corpus at B=1024, and
    every in-kernel write was a strided lane-column store.)
    Queries are cast to the corpus dtype (Mosaic wants matching operand
    dtypes); accumulation is always float32.
    """
    t = pl.program_id(0)
    scores = jax.lax.dot_general(
        q_ref[:].astype(c_ref.dtype), c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)                                  # [B, tile]
    _extract_tile_winners(scores, t * tile, size_ref[0], s_out, i_out, k)


def _extract_tile_winners(scores, base, size_val, s_out, i_out, k):
    """Shared stage-1 extraction: k-step masked argmax over [B, tile]
    scores into the k-major [1, k, B] winner blocks."""
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col + base < size_val, scores, NEG_INF)
    # Unrolled k-step masked argmax (k is small and static; VPU-friendly).
    for j in range(k):
        m = jnp.max(scores, axis=1)                           # [B]
        a = jnp.argmax(scores, axis=1).astype(jnp.int32)      # [B]
        s_out[0, j, :] = m
        i_out[0, j, :] = a + base
        scores = jnp.where(col == a[:, None], NEG_INF, scores)


def _tile_topk_scaled_kernel(size_ref, q_ref, c_ref, scale_ref, s_out,
                             i_out, *, tile: int, k: int, precision):
    """Stage 1 for per-row-scaled integer corpora (ops/quantize.py).

    c_ref [tile, D] is int8; scale_ref [1, tile] carries the per-row
    dequantization scale. Both operands run the MXU in bfloat16 (int8
    values <= 127 are exact in bf16; the f32->bf16 query cast is the
    only rounding, and the float32 rescore after oversampling restores
    final ranking), then one fused [B, tile] * [1, tile] broadcast
    applies the scales.
    """
    t = pl.program_id(0)
    scores = jax.lax.dot_general(
        q_ref[:].astype(jnp.bfloat16), c_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision) * scale_ref[:]                   # [B, tile]
    _extract_tile_winners(scores, t * tile, size_ref[0], s_out, i_out, k)


def _resolve_precision(corpus, precision):
    if precision is not None:
        return precision
    return (jax.lax.Precision.HIGHEST if corpus.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _tile_pass(queries, corpus, size, tile, tile_k, interpret, precision,
               row_scale=None):
    """Stage 1: run the per-tile extraction kernel.

    Returns (tile_s, tile_i), each [num_tiles, tile_k, B] — the tile-local
    top-``tile_k`` winners (k-major; see _tile_topk_kernel). With
    ``row_scale`` [N] (quantized corpus) the scaled kernel applies the
    per-row dequantization factor to each tile's scores in VMEM.
    """
    n, d = corpus.shape
    b = queries.shape[0]
    assert n % tile == 0, f"N={n} must be a multiple of tile={tile}"
    num_tiles = n // tile
    size_arr = jnp.asarray([n if size is None else size], jnp.int32)
    in_specs = [
        pl.BlockSpec((b, d), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, d), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [size_arr, queries.astype(jnp.float32), corpus]
    if row_scale is None:
        kernel = functools.partial(_tile_topk_kernel, tile=tile, k=tile_k,
                                   precision=precision)
    else:
        assert row_scale.shape == (n,), (row_scale.shape, n)
        in_specs.append(pl.BlockSpec((1, tile), lambda i, *_: (0, i),
                                     memory_space=pltpu.VMEM))
        operands.append(row_scale.astype(jnp.float32).reshape(1, n))
        kernel = functools.partial(_tile_topk_scaled_kernel, tile=tile,
                                   k=tile_k, precision=precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tile_k, b), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k, b), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, tile_k, b), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, tile_k, b), jnp.int32),
        ],
        # Large-tile/large-B shapes (e.g. tile=4096 at B=1024: a 16 MB
        # [B, tile] f32 score block) exceed the 16 MB default scoped-
        # VMEM cap; v5e has 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d, bytes_accessed=n * d * corpus.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*operands)


def _merge_tile_winners(tile_s, tile_i, k):
    """Stage 2: merge tile winners (tiny: [B, tiles*tile_k])."""
    t, tile_k, b = tile_s.shape
    cand_s = jnp.transpose(tile_s, (2, 0, 1)).reshape(b, t * tile_k)
    cand_i = jnp.transpose(tile_i, (2, 0, 1)).reshape(b, t * tile_k)
    top_s, pos = jax.lax.top_k(cand_s, k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return top_s, top_i


@functools.partial(jax.jit,
                   static_argnames=("k", "tile", "interpret", "precision",
                                    "tile_k"))
def pallas_topk(queries: jax.Array, corpus: jax.Array, k: int,
                size: jax.Array | int | None = None, tile: int = 1024,
                interpret: bool = False, precision=None,
                tile_k: int | None = None, row_scale: jax.Array | None = None):
    """Fused matmul+top-k via a two-stage Pallas kernel.

    queries [B,D] (pre-normalized), corpus [N,D] with N % tile == 0.
    ``precision`` defaults to HIGHEST for a float32 corpus (exact ranking)
    and DEFAULT for bfloat16 storage (half the HBM read; pair with
    ``rescore_topk`` oversampling when exactness matters).

    ``tile_k`` = winners extracted per corpus tile. The in-VMEM extraction
    costs tile_k masked-argmax passes over every score (tile_k*B*N VPU
    ops) — at large B it dominates the matmul, so big batches want
    tile_k < k. tile_k=k (the default) is exact; tile_k < k is
    APPROXIMATE: any tile holding more than tile_k true top-k rows drops
    results, and RAG corpora cluster same-document chunks contiguously.
    Use ``pallas_topk_verified`` for exactness at tile_k<k speed.

    ``row_scale`` [N]: per-row dequantization scales for an integer
    corpus (ops/quantize.py) — scores become (q . c8_row) * scale_row.
    """
    n, d = corpus.shape
    assert k <= tile
    tile_k = min(tile_k or k, k)
    assert (n // tile) * tile_k >= k, (n // tile, tile_k, k)
    precision = (jax.lax.Precision.DEFAULT if row_scale is not None
                 else _resolve_precision(corpus, precision))
    tile_s, tile_i = _tile_pass(queries, corpus, size, tile, tile_k,
                                interpret, precision, row_scale=row_scale)
    return _merge_tile_winners(tile_s, tile_i, k)


@functools.partial(jax.jit,
                   static_argnames=("k", "tile", "interpret", "precision",
                                    "tile_k", "mem_budget"))
def pallas_topk_verified(queries: jax.Array, corpus: jax.Array, k: int,
                         size: jax.Array | int | None = None,
                         tile: int = 1024, interpret: bool = False,
                         precision=None, tile_k: int = 2,
                         mem_budget: int = 1 << 26):
    """EXACT top-k at approximate-extraction speed.

    Runs the fast tile_k<k extraction, then closes the recall gap with a
    tau-bound rescan: let tau be the k-th best candidate score. Every
    non-extracted row of tile t is bounded by s_last[t] (the tile's
    tile_k-th extracted winner), so only tiles with s_last > tau can hide
    a true top-k row — and each such tile contributes tile_k candidates
    above tau, so there are at most R = floor((k-1)/tile_k) of them per
    query. Those R tiles are gathered and exactly rescored, and the merge
    is provably exact (up to float reduction-order ulps and ties).

    Typical cost over the fast pass: R*tile extra rows read per query
    (R=4 for k=10, tile_k=2) — a few percent of the corpus read at large
    batch, against a >=2x extraction saving versus tile_k=k.
    ``mem_budget`` caps the rescan gather bytes; larger batches are
    processed in query chunks under ``lax.map``.
    """
    n, d = corpus.shape
    b = queries.shape[0]
    tile_k = min(tile_k, k)
    r = (k - 1) // tile_k
    precision = _resolve_precision(corpus, precision)
    if r == 0:  # tile_k >= k is already exact
        return pallas_topk(queries, corpus, k, size, tile=tile,
                           interpret=interpret, precision=precision,
                           tile_k=tile_k)
    assert (n // tile) * tile_k >= k, (n // tile, tile_k, k)
    tile_s, tile_i = _tile_pass(queries, corpus, size, tile, tile_k,
                                interpret, precision)
    top_s, top_i = _merge_tile_winners(tile_s, tile_i, k)

    size_ = jnp.asarray(n if size is None else size, jnp.int32)
    tau = top_s[:, k - 1]                                   # [B]
    s_last = jnp.transpose(tile_s[:, tile_k - 1, :])        # [B, T]
    sus_val = jnp.where(s_last > tau[:, None], s_last, -jnp.inf)
    sus_sval, sus_t = jax.lax.top_k(sus_val, r)             # [B, r]

    itemsize = corpus.dtype.itemsize
    qc = max(1, min(b, mem_budget // max(r * tile * d * itemsize, 1)))
    while b % qc:
        qc -= 1

    def rescan(args):
        q_c, sus_t_c, sus_ok_c, top_s_c, top_i_c = args
        rows = (sus_t_c[:, :, None] * tile
                + jnp.arange(tile, dtype=jnp.int32)[None, None, :])
        rows = rows.reshape(qc, r * tile)                   # [qc, r*tile]
        cand = corpus[rows]                                 # [qc, r*tile, D]
        # Exact rescore via 2D dots — batched matvecs accumulate below
        # f32 on this backend (see _exact_rowwise_scores).
        sc = _exact_rowwise_scores(q_c, cand, corpus.dtype, precision)
        valid = jnp.repeat(sus_ok_c, tile, axis=1)          # real sus tile
        valid &= rows < size_                               # live rows only
        dup = (rows[:, :, None] == top_i_c[:, None, :]).any(-1)
        sc = jnp.where(valid & ~dup, sc, NEG_INF)
        m_s = jnp.concatenate([top_s_c, sc], axis=1)
        m_i = jnp.concatenate([top_i_c, rows], axis=1)
        out_s, pos = jax.lax.top_k(m_s, k)
        return out_s, jnp.take_along_axis(m_i, pos, axis=1)

    sus_ok = sus_sval > NEG_INF / 2
    args = (queries.astype(jnp.float32).reshape(b // qc, qc, d),
            sus_t.reshape(b // qc, qc, r),
            sus_ok.reshape(b // qc, qc, r),
            top_s.reshape(b // qc, qc, k),
            top_i.reshape(b // qc, qc, k))
    if b == qc:
        return rescan(tuple(a[0] for a in args))
    out_s, out_i = jax.lax.map(rescan, args)
    return out_s.reshape(b, k), out_i.reshape(b, k)


@functools.partial(jax.jit,
                   static_argnames=("k", "tile", "interpret", "precision",
                                    "tile_k", "union_tiles"))
def pallas_topk_verified_batch(queries: jax.Array, corpus: jax.Array,
                               k: int, size: jax.Array | int | None = None,
                               tile: int = 1024, interpret: bool = False,
                               precision=None, tile_k: int = 2,
                               union_tiles: int = 32):
    """Exact top-k with a BATCH-UNION rescan — the large-batch variant of
    ``pallas_topk_verified``.

    The per-query rescan gathers R*tile scattered rows per query (slow:
    XLA row-gather runs ~10ns/row). Here the rescan instead selects the
    ``union_tiles`` hottest suspicious tiles ACROSS the batch, reads them
    once contiguously, and rescores them against ALL queries on the MXU —
    O(U*tile) bytes + one [B, U*tile] matmul instead of O(B*R*tile)
    gathered rows.

    Exactness is certified per call: the returned ``ids`` carry an extra
    row whose first element counts (query, tile) suspicion pairs NOT
    covered by the union. 0 (the overwhelmingly common case — suspicious
    tiles are rare and shared) means the result is exact; callers treat
    nonzero as "rerun exactly" (dispatch_topk does this automatically).
    The count rides inside the ids buffer so remote-host callers pay no
    extra fetch round trip.

    union_tiles=32 is the measured sweet spot at 10M/tile=4096: 16-64 all
    certify exact on random AND cluster-structured corpora (suspicious
    tiles are rare and shared), and 32 is ~9% faster than 64; truly
    pathological batches overflow the union and take the certified
    exact-rerun path instead of returning wrong results.

    Returns (scores [B,k] f32, ids [B+1,k] int32) with
    ids[B, 0] = uncovered count.
    """
    n, d = corpus.shape
    b = queries.shape[0]
    tile_k = min(tile_k, k)
    precision = _resolve_precision(corpus, precision)
    num_tiles = n // tile
    u = min(union_tiles, num_tiles)
    assert num_tiles * tile_k >= k, (num_tiles, tile_k, k)
    tile_s, tile_i = _tile_pass(queries, corpus, size, tile, tile_k,
                                interpret, precision)
    top_s, top_i = _merge_tile_winners(tile_s, tile_i, k)
    size_ = jnp.asarray(n if size is None else size, jnp.int32)

    tau = top_s[:, k - 1]                                    # [B]
    s_last = jnp.transpose(tile_s[:, tile_k - 1, :])         # [B, T]
    sus = s_last > tau[:, None]                              # [B, T]
    # Hottest tiles across the batch, by worst-case hidden margin.
    priority = jnp.max(jnp.where(sus, s_last - tau[:, None], -jnp.inf),
                       axis=0)                               # [T]
    sel_pri, sel_tiles = jax.lax.top_k(priority, u)          # [U]
    sel_valid = sel_pri > -jnp.inf
    selected = jnp.zeros((num_tiles,), bool).at[sel_tiles].set(sel_valid)
    uncovered = jnp.sum(sus & ~selected[None, :]).astype(jnp.int32)

    # One contiguous read of the union tiles; MXU rescore vs every query.
    rows = (sel_tiles[:, None] * tile
            + jnp.arange(tile, dtype=jnp.int32)[None, :]).reshape(-1)
    # Contiguous slab reads, not a row-gather (see pallas_topk_certified).
    gathered = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(corpus, sel_tiles[j] * tile, tile, 0)
         for j in range(u)], axis=0)                         # [U*tile, D]
    sc = jnp.dot(queries.astype(corpus.dtype), gathered.T,
                 preferred_element_type=jnp.float32,
                 precision=precision)                        # [B, U*tile]
    row_ok = (jnp.repeat(sel_valid, tile) & (rows < size_))[None, :]
    sc = jnp.where(row_ok, sc, NEG_INF)
    r_s, r_pos = jax.lax.top_k(sc, k)
    r_i = jnp.take(rows, r_pos)

    # Candidates from selected tiles are fully re-found by the rescan —
    # mask them instead of deduplicating row ids.
    cand_in_sel = selected[jnp.clip(top_i // tile, 0, num_tiles - 1)]
    m_s = jnp.concatenate(
        [jnp.where(cand_in_sel, NEG_INF, top_s), r_s], axis=1)
    m_i = jnp.concatenate([top_i, r_i], axis=1)
    out_s, pos = jax.lax.top_k(m_s, k)
    out_i = jnp.take_along_axis(m_i, pos, axis=1)
    count_row = jnp.zeros((1, k), jnp.int32).at[0, 0].set(uncovered)
    return out_s, jnp.concatenate([out_i, count_row], axis=0)


# ---------------------------------------------------------------------------
# Round-3 certified kernel: single-pass packed extraction + unit rescue
# ---------------------------------------------------------------------------
#
# The r2 extraction loop paid tile_k*(max+argmax) = 4+ full reduction passes
# over every [B, tile] score block (VERDICT r2 weak #2: ~9% of the HBM
# streaming roofline, extraction-bound). This kernel gets per-tile winners in
# ~ONE pass over the scores:
#
#   * scores are shifted +2.0 (order-preserving: normalized vectors give
#     |score| <= ~1) so every live score is a POSITIVE float, whose int32
#     bitcast is monotone in the float value — no sortable-transform needed.
#   * the 3 low mantissa bits are replaced by the slice id g, and a G-way
#     tree max over aligned [B, tile/G] slices reduces the full block in
#     (G-1)/G of one pass, yielding per-UNIT winners that carry their slice
#     id. (Unit j = the G rows {g*(tile/G)+j}: strided, so contiguous
#     same-document chunk runs spread across units.)
#   * all argmax work then runs on the G-times-smaller unit array.
#
# Exactness (vs the same scoring function: corpus-dtype multiply, f32
# accumulate) is restored OUTSIDE the kernel by three certified covers:
#   c1: the top-R candidates by packed value are exactly rescored TOGETHER
#       WITH THEIR FULL UNITS (R*G gathered rows/query) — covering rows that
#       hide behind a winner inside its own unit;
#   c2: tiles whose 2nd-best-unit upper bound exceeds tau (the k-th exact
#       rescued score) are batch-union rescanned contiguously on the MXU,
#       as in r2 — covering rows in non-winner units;
#   c3: the best EXCLUDED candidate's upper bound must be <= tau — covering
#       winner units that did not make the rescue cut.
# Violations of c2/c3 increment the per-call uncovered counter carried in
# the ids buffer (row B); dispatch_topk reruns exactly when nonzero.
# Quantized bounds get a 2*G ulp cushion so reduction-order ulp drift
# between the MXU extraction pass and the XLA rescore cannot fake coverage.

def _packed_extract_kernel(size_ref, q_ref, c_ref, val_out, *,
                           tile: int, groups: int, precision,
                           n_winners: int = 2):
    """Per-tile top-2-unit winners, packed. Output [1, 2, B] float32:
    the f32 BITCAST of an int32 whose high bits are the quantized
    (score + 2.0) and whose low log2(tile) bits are the winner's column.
    Packed ints are non-negative (positive floats), so int order ==
    f32-bitcast order — which lets every reduction run as a plain f32
    max (Mosaic has no int32 argmax/index reductions). 0.0 = padding."""
    t = pl.program_id(0)
    scores = jax.lax.dot_general(
        q_ref[:].astype(c_ref.dtype), c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)                                  # [B, tile]
    _pack_tile_scores(scores, t * tile, size_ref[0], val_out, tile, groups,
                      n_winners)


def _packed_extract_scaled_kernel(size_ref, q_ref, c_ref, scale_ref,
                                  val_out, *, tile: int, groups: int,
                                  precision, n_winners: int = 2):
    """``_packed_extract_kernel`` for per-row-scaled integer corpora:
    both dot operands run bfloat16 (int8 codes are exact in bf16; the
    f32->bf16 query cast is the only extra rounding, and it is shared
    with the cover rescores, which score the SAME function), then the
    [1, tile] scale row dequantizes the block before packing."""
    t = pl.program_id(0)
    scores = jax.lax.dot_general(
        q_ref[:].astype(jnp.bfloat16), c_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision) * scale_ref[:]                   # [B, tile]
    _pack_tile_scores(scores, t * tile, size_ref[0], val_out, tile, groups,
                      n_winners)


def _packed_extract_int8_kernel(size_ref, q_ref, c_ref, scale_ref, qs_ref,
                                val_out, *, tile: int, groups: int,
                                n_winners: int = 2):
    """``_packed_extract_scaled_kernel`` with an INT8-NATIVE MXU dot.

    q_ref [B, D] int8 (per-row quantized queries), c_ref [tile, D] int8:
    ``dot_general(..., preferred_element_type=int32)`` runs the MXU at
    its 2x int8 rate and accumulates EXACTLY in int32 — the round-4
    int8 path's in-kernel int8->bf16 operand conversion (which ate the
    bandwidth win, RESULTS_r4 §11a) disappears. Scores are dequantized
    by one fused broadcast per operand side:

        score = (i32 * corpus_scale_row) * query_scale_row

    The same float multiply ORDER is reproduced by every cover rescore
    (certification demands bit-identical scoring); int32 accumulation
    itself has no reduction-order ulps at all.
    """
    t = pl.program_id(0)
    scores_i = jax.lax.dot_general(
        q_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                     # [B, tile]
    scores = (scores_i.astype(jnp.float32) * scale_ref[:]) * qs_ref[:]
    _pack_tile_scores(scores, t * tile, size_ref[0], val_out, tile, groups,
                      n_winners)


def _pack_tile_scores(scores, base, size_val, val_out, tile, groups,
                      n_winners: int = 2):
    """Shared packing body: quantize+pack scores, tree-max to per-unit
    winners, emit the top-``n_winners`` packed unit winners.

    Single unconditional path. A pl.when full-tile/tail split (round-4
    experiment) duplicated the extraction body's temporaries across the
    two branches and pushed the kernel's scoped-VMEM demand from <=16M
    to 18.66M — the b1024/tile=4096 shape then failed to compile on the
    relay's AOT helper (16.00M scoped limit). The mask+clamp are cheap
    elementwise ops that fuse into the packing pass; the measured floor
    gap lives in the dispatch overhead and the covers, not here.

    Each extra winner past the first costs one max+mask over the
    G-times-smaller [B, tile/G] unit array. Every shipping path exports
    n_winners=2: the round-5 ANN experiment with n_winners=k measured
    SLOWER than the certified path (the scan is extraction-bound), so
    clustered-run recall is carried by the c1 unit expansion instead.
    """
    b = scores.shape[0]
    small = tile // groups
    col = jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
    sh = jnp.maximum(scores + 2.0, 0.0)                       # positive
    sh = jnp.where(col + base < size_val, sh, 0.0)            # pad -> 0
    p = jax.lax.bitcast_convert_type(sh, jnp.int32)           # monotone
    packed = jax.lax.bitcast_convert_type(
        (p & ~jnp.int32(tile - 1)) | col, jnp.float32)
    parts = [packed[:, g * small:(g + 1) * small]
             for g in range(groups)]
    while len(parts) > 1:                                     # tree max
        nxt = [jnp.maximum(parts[i], parts[i + 1])
               for i in range(0, len(parts) - 1, 2)]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    gw = parts[0]                                             # [B, small]
    # Packed values are unique in their low (column) bits, so exactly one
    # entry equals the running max — masking it exposes the next winner.
    for r in range(n_winners):
        w = jnp.max(gw, axis=1)                               # [B]
        val_out[0, r, :] = w
        if r + 1 < n_winners:
            gw = jnp.where(gw == w[:, None], 0.0, gw)


def _packed_pass(queries, corpus, size, tile, groups, interpret, precision,
                 row_scale=None, q_scale=None, n_winners: int = 2):
    """``q_scale`` [B] (with an int8 ``queries`` operand) selects the
    int8-native MXU kernel; ``row_scale`` alone keeps the bf16-operand
    scaled kernel (f32/bf16 queries against an int8 corpus)."""
    n, d = corpus.shape
    b = queries.shape[0]
    assert n % tile == 0, f"N={n} must be a multiple of tile={tile}"
    assert tile % groups == 0
    num_tiles = n // tile
    size_arr = jnp.asarray([n if size is None else size], jnp.int32)
    in_specs = [
        pl.BlockSpec((b, d), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, d), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    extra = {}
    if row_scale is None:
        operands = [size_arr, queries.astype(jnp.float32), corpus]
        kernel = functools.partial(_packed_extract_kernel, tile=tile,
                                   groups=groups, precision=precision,
                                   n_winners=n_winners)
    elif q_scale is not None:
        assert queries.dtype == jnp.int8 and corpus.dtype == jnp.int8
        assert row_scale.shape == (n,), (row_scale.shape, n)
        in_specs += [
            pl.BlockSpec((1, tile), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [size_arr, queries, corpus,
                    row_scale.astype(jnp.float32).reshape(1, n),
                    q_scale.astype(jnp.float32).reshape(b, 1)]
        kernel = functools.partial(_packed_extract_int8_kernel, tile=tile,
                                   groups=groups, n_winners=n_winners)
        extra = {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)}
    else:
        assert row_scale.shape == (n,), (row_scale.shape, n)
        in_specs.append(pl.BlockSpec((1, tile), lambda i, *_: (0, i),
                                     memory_space=pltpu.VMEM))
        operands = [size_arr, queries.astype(jnp.float32), corpus,
                    row_scale.astype(jnp.float32).reshape(1, n)]
        kernel = functools.partial(_packed_extract_scaled_kernel, tile=tile,
                                   groups=groups, precision=precision,
                                   n_winners=n_winners)
        # The bf16 operand copies + scale row push the b1024/tile=4096
        # shape past the 16 MB default scoped-VMEM cap; keep the default
        # (validated) compile config for the unscaled path untouched.
        extra = {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, n_winners, b), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, n_winners, b), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d, bytes_accessed=n * d * corpus.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
        **extra,
    )(*operands)


def _exact_rowwise_scores(queries, gathered, dtype, precision,
                          mem_cap: int = 1 << 22):
    """Per-query scores against per-query gathered rows — via 2D matmuls.

    queries [B, D]; gathered [B, n, D] (corpus rows); returns [B, n] f32.

    The obvious contraction ("bd,bnd->bn") is NOT safe on this backend:
    batched-matvec lowerings accumulate below f32 regardless of casts,
    einsum precision, or optimization barriers (~5e-4 relative error,
    hardware-measured — benchmarks/diag5_certified.py), which silently
    breaks exact-rescoring guarantees. Plain 2D dots with corpus-dtype
    operands and preferred_element_type=f32 ARE exact (8e-8 measured).
    So: per query-chunk, one 2D matmul of the chunk's queries against
    ALL the chunk's gathered rows, then block-diagonal extraction. The
    c-fold extra FLOPs are noise next to the main scan (<1%).
    """
    b, n, d = gathered.shape
    qd = queries.astype(dtype)
    c = max(1, min(b, mem_cap // max(n, 1)))
    while b % c:
        c -= 1

    def one(args):
        qc, gc = args                                    # [c,D], [c,n,D]
        full = jnp.dot(qc, gc.reshape(c * n, d).T,
                       preferred_element_type=jnp.float32,
                       precision=precision)              # [c, c*n]
        idx = jnp.arange(c)
        return full.reshape(c, c, n)[idx, idx]           # [c, n]

    if c == b:
        return one((qd, gathered))
    out = jax.lax.map(one, (qd.reshape(b // c, c, d),
                            gathered.reshape(b // c, c, n, d)))
    return out.reshape(b, n)


def _exact_rowwise_scores_int8(q8, gathered8, mem_cap: int = 1 << 22):
    """``_exact_rowwise_scores`` on the native s8xs8->s32 path: returns
    the RAW int32 dot as float32 (callers apply the scale folds in the
    kernel's exact multiply order). int32 accumulation of int8 products
    has no reduction-order ulps, so this matches the in-kernel dot
    bit-for-bit."""
    b, n, d = gathered8.shape
    c = max(1, min(b, mem_cap // max(n, 1)))
    while b % c:
        c -= 1

    def one(args):
        qc, gc = args                                    # [c,D], [c,n,D]
        full = jnp.dot(qc, gc.reshape(c * n, d).T,
                       preferred_element_type=jnp.int32)  # [c, c*n]
        idx = jnp.arange(c)
        return full.reshape(c, c, n)[idx, idx]           # [c, n]

    if c == b:
        return one((q8, gathered8)).astype(jnp.float32)
    out = jax.lax.map(one, (q8.reshape(b // c, c, d),
                            gathered8.reshape(b // c, c, n, d)))
    return out.reshape(b, n).astype(jnp.float32)


def _unpack_lb(vals, tile):
    """Quantized lower bound on the original score from a packed int32
    (low log2(tile) bits carry the column, not score bits)."""
    return jax.lax.bitcast_convert_type(
        vals & ~jnp.int32(tile - 1), jnp.float32) - 2.0


def _unpack_ub(vals, tile):
    """Upper bound: one quantization step, plus another step of cushion
    for reduction-order ulp drift between the extraction matmul and the
    XLA rescore paths."""
    return jax.lax.bitcast_convert_type(
        (vals & ~jnp.int32(tile - 1)) + 2 * tile, jnp.float32) - 2.0


@functools.partial(jax.jit,
                   static_argnames=("k", "tile", "groups", "interpret",
                                    "precision", "union_tiles", "pad_r",
                                    "int8_native", "covers"))
def pallas_topk_certified(queries: jax.Array, corpus: jax.Array, k: int,
                          size: jax.Array | int | None = None,
                          tile: int = 4096, groups: int = 8,
                          union_tiles: int = 32, pad_r: int | None = None,
                          interpret: bool = False, precision=None,
                          row_scale: jax.Array | None = None,
                          int8_native: bool = True, covers: bool = True):
    """EXACT top-k via single-pass packed extraction + certified covers.

    queries [B,D] pre-normalized (scores must lie in (-2, 2)); corpus [N,D]
    with N % tile == 0 and 2*(N/tile) > k. Returns (scores [B,k] f32,
    ids [B+1,k] int32) with ids[B,0] = uncovered certificate count — 0 means
    the result is exact w.r.t. corpus-dtype scoring (see module notes);
    callers rerun via ``pallas_topk`` otherwise (dispatch_topk automates
    this). Final scores always come from exact rescoring, never from the
    quantized extraction values.

    ``row_scale`` [N] (integer corpora, ops/quantize.py): with
    ``int8_native`` (the default for an int8 corpus), queries are
    per-row int8-quantized on device and the scan runs the MXU's native
    s8xs8->s32 path at its 2x int8 rate — the scan and every cover then
    score the same (i32 * corpus_scale) * query_scale function, whose
    int32 accumulation is ulp-exact. ``int8_native=False`` keeps the
    bf16-operand scaled scoring. Either way the certificate means exact
    w.r.t. THAT scoring — pair with a float32 ``rescore_topk`` when
    final scores must be dequantized-f32-exact.
    """
    n, d = corpus.shape
    b = queries.shape[0]
    small = tile // groups
    num_tiles = n // tile
    assert 2 * num_tiles > k, (num_tiles, k)
    precision = _resolve_precision(corpus, precision)
    size_ = jnp.asarray(n if size is None else size, jnp.int32)
    q_scale = None
    q_scan = queries
    if row_scale is not None and corpus.dtype == jnp.int8 and int8_native:
        from optimized_rag_tpu.ops.quantize import quantize_int8
        q_scan, q_scale = quantize_int8(queries.astype(jnp.float32))
    (w_packed,) = _packed_pass(q_scan, corpus, size, tile, groups,
                               interpret, precision,
                               row_scale=row_scale,
                               q_scale=q_scale)               # [T, 2, B]
    w_val = jax.lax.bitcast_convert_type(w_packed, jnp.int32)

    # Candidate set: 2 unit-winners per tile. Candidate (b, 2t+s) came
    # from tile t; its column rides in the packed low bits.
    vals = jnp.transpose(w_val, (2, 0, 1)).reshape(b, 2 * num_tiles)
    cand_tile = (jnp.arange(2 * num_tiles, dtype=jnp.int32) // 2)[None, :]
    rows = cand_tile * tile + (vals & jnp.int32(tile - 1))
    r_cnt = pad_r or min(k + max(k, 8), 2 * num_tiles - 1)
    assert r_cnt * groups >= k and r_cnt < 2 * num_tiles
    vtop, vpos = jax.lax.top_k(vals, r_cnt + 1)
    sel_rows = jnp.take_along_axis(jnp.broadcast_to(rows, vals.shape),
                                   vpos, axis=1)

    # c1: exact rescore of the top-R candidates plus their full units.
    r_rows = sel_rows[:, :r_cnt]
    r_tile = r_rows // tile
    r_unit = (r_rows - r_tile * tile) % small
    members = (r_tile[:, :, None] * tile + r_unit[:, :, None]
               + (jnp.arange(groups, dtype=jnp.int32) * small)[None, None, :])
    ukey = r_tile * small + r_unit                            # [B, R]
    ridx = jnp.arange(r_cnt, dtype=jnp.int32)
    dup = ((ukey[:, :, None] == ukey[:, None, :])
           & (ridx[None, :, None] > ridx[None, None, :])).any(axis=2)
    valid_cand = (vtop[:, :r_cnt] > 0) & ~dup
    if covers:
        flat = members.reshape(b, r_cnt * groups)
        okf = (valid_cand[:, :, None]
               & (members < size_)).reshape(b, r_cnt * groups)
    else:
        # ANN path: without the c2 union rescan, a CONTIGUOUS
        # same-document run inside one tile would surface only its top-2
        # unit winners (unit members are strided — they do NOT cover
        # column neighbors). Expand every candidate with its +-W column
        # window so contiguous runs ride the exact rescore, and mask
        # duplicate member rows pairwise (windows overlap; top-k ids
        # must stay distinct). Invalid slots get unique negative
        # sentinels so they can never claim a real row's slot.
        w_win = 4
        offs = jnp.concatenate([jnp.arange(-w_win, 0, dtype=jnp.int32),
                                jnp.arange(1, w_win + 1, dtype=jnp.int32)])
        win = jnp.clip(r_rows[:, :, None] + offs[None, None, :], 0, n - 1)
        members = jnp.concatenate([members, win], axis=2)     # [B,R,G+2W]
        m_per = groups + 2 * w_win
        flat = members.reshape(b, r_cnt * m_per)
        okf = (valid_cand[:, :, None]
               & (members < size_)).reshape(b, r_cnt * m_per)
        m_tot = r_cnt * m_per
        sent = -(jnp.arange(m_tot, dtype=jnp.int32) + 2)[None, :]
        flat = jnp.where(okf, flat, sent)
        midx = jnp.arange(m_tot, dtype=jnp.int32)
        dupm = ((flat[:, :, None] == flat[:, None, :])
                & (midx[None, :, None] > midx[None, None, :])).any(axis=2)
        okf = okf & ~dupm
    gathered = corpus[jnp.maximum(flat, 0)]                   # [B, M, D]
    # Exact rescore on the proven 2D-dot path (see _exact_rowwise_scores:
    # batched-matvec contractions accumulate below f32 on this backend).
    # Scaled mode mirrors the kernel's scoring exactly: bf16 operands,
    # f32 accumulation, then the f32 scale multiply.
    if row_scale is None:
        sc = _exact_rowwise_scores(queries, gathered, corpus.dtype,
                                   precision)
    elif q_scale is not None:
        # int8-native: int32-accumulated dots (ulp-exact), then the
        # kernel's exact float multiply order.
        sc = (_exact_rowwise_scores_int8(q_scan, gathered)
              * row_scale[jnp.maximum(flat, 0)].astype(jnp.float32)
              * q_scale[:, None].astype(jnp.float32))
    else:
        sc = (_exact_rowwise_scores(queries,
                                    gathered.astype(jnp.bfloat16),
                                    jnp.bfloat16, precision)
              * row_scale[jnp.maximum(flat, 0)].astype(jnp.float32))
    sc = jnp.where(okf, sc, NEG_INF)
    top_s, pos = jax.lax.top_k(sc, k)
    top_i = jnp.take_along_axis(flat, pos, axis=1)
    if not covers:
        # ANN fast path (VERDICT r4 next #5): scan + c1 unit-expanded
        # rescore only — no c2 union rescan, no c3 bound check, no
        # certificate row. The unit expansion (every candidate's G
        # strided unit members rescored exactly) is what keeps recall
        # high on clustered corpora: a contiguous same-document run
        # lands in consecutive, distinct units, and each rescued unit
        # drags its whole strided membership into the exact rescore.
        return top_s, top_i
    tau = top_s[:, k - 1]                                     # [B]

    # c3: the best excluded candidate must be provably below tau.
    c3_viol = _unpack_ub(vtop[:, r_cnt], tile) > tau

    # c2: suspicious tiles (2nd-unit upper bound above tau), covered by
    # an EXACT per-tile top-k extraction kernel over the union
    # (_extract_kernel reads the selected tiles in place via the
    # scalar-prefetch index map). A tile contributes at most k rows to a
    # global top-k, so exact top-k per selected tile covers every
    # possible contribution — and the [B, U*k] merge replaces the
    # [B, U*tile] wide sort of the round-3 slab rescan (~12 ms of the
    # 33 ms direct-hw budget; docs/RESULTS_r4.md §8).
    u = min(union_tiles, num_tiles)
    ub2 = jnp.transpose(_unpack_ub(w_val[:, 1, :], tile))     # [B, T]
    sus = ub2 > tau[:, None]
    priority = jnp.max(jnp.where(sus, ub2 - tau[:, None], -jnp.inf), axis=0)
    sel_pri, sel_tiles = jax.lax.top_k(priority, u)
    sel_valid = sel_pri > -jnp.inf
    selected = jnp.zeros((num_tiles,), bool).at[sel_tiles].set(sel_valid)
    uncovered = (jnp.sum(sus & ~selected[None, :]).astype(jnp.int32)
                 + jnp.sum(c3_viol).astype(jnp.int32))
    uval, ucol = _extract_pass(q_scan, corpus, size, tile, k, sel_tiles,
                               interpret, precision, row_scale=row_scale,
                               q_scale=q_scale)
    uc = jnp.where(sel_valid[None, :, None],
                   jnp.transpose(uval, (2, 0, 1)), NEG_INF)   # [B, U, k]
    urow_b = jnp.transpose(sel_tiles[:, None, None] * tile + ucol,
                           (2, 0, 1)).reshape(b, u * k)
    r_s, r_pos = jax.lax.top_k(uc.reshape(b, u * k), k)
    r_i = jnp.take_along_axis(urow_b, r_pos, axis=1)

    # Rescued rows inside selected tiles are re-found by the rescan — mask
    # the rescued copy instead of deduplicating row ids.
    in_sel = selected[jnp.clip(top_i // tile, 0, num_tiles - 1)]
    m_s = jnp.concatenate([jnp.where(in_sel, NEG_INF, top_s), r_s], axis=1)
    m_i = jnp.concatenate([top_i, r_i], axis=1)
    out_s, opos = jax.lax.top_k(m_s, k)
    out_i = jnp.take_along_axis(m_i, opos, axis=1)
    count_row = jnp.zeros((1, k), jnp.int32).at[0, 0].set(uncovered)
    return out_s, jnp.concatenate([out_i, count_row], axis=0)


@functools.partial(jax.jit,
                   static_argnames=("k", "sub_batch", "tile", "groups",
                                    "interpret", "precision",
                                    "union_tiles", "pad_r", "int8_native"))
def pallas_topk_certified_multi(queries: jax.Array, corpus: jax.Array,
                                k: int, size: jax.Array | int | None = None,
                                sub_batch: int = 1024, tile: int = 4096,
                                groups: int = 8, union_tiles: int = 32,
                                pad_r: int | None = None,
                                interpret: bool = False, precision=None,
                                row_scale: jax.Array | None = None,
                                int8_native: bool = True):
    """``pallas_topk_certified`` over M sub-batches in ONE dispatch.

    Through the tunneled runtime every dispatch pays a ~31 ms host
    round trip (docs/RESULTS_r3.md: 10M and 16.7M corpora both floor at
    ~31.5 ms/batch at B=512 — the relay, not compute, binds), and VMEM
    caps the per-call batch at ~1024. This variant runs an XLA-level
    ``lax.map`` over [M, sub_batch, D] query blocks inside one jit:
    VMEM usage stays at the sub-batch level while M blocks amortize a
    single dispatch. Returns the same ([M*B, k] scores,
    [M*B+1, k] ids-with-certificate-row) contract as the single-batch
    kernel; the certificate row sums uncovered counts across blocks
    (0 still means every block is proven exact).
    """
    mb, d = queries.shape
    assert mb % sub_batch == 0, (mb, sub_batch)
    m = mb // sub_batch

    def one(q):
        return pallas_topk_certified(
            q, corpus, k, size, tile=tile, groups=groups,
            union_tiles=union_tiles, pad_r=pad_r, interpret=interpret,
            precision=precision, row_scale=row_scale,
            int8_native=int8_native)

    s, i = jax.lax.map(one, queries.reshape(m, sub_batch, d))
    scores = s.reshape(mb, k)
    ids = i[:, :sub_batch, :].reshape(mb, k)
    uncovered = jnp.sum(i[:, sub_batch, 0]).astype(jnp.int32)
    count_row = jnp.zeros((1, k), jnp.int32).at[0, 0].set(uncovered)
    return scores, jnp.concatenate([ids, count_row], axis=0)


def _extract_kernel(size_ref, tiles_ref, q_ref, c_ref, val_out, col_out, *,
                    tile: int, rounds: int, precision):
    """Per-tile EXACT top-``rounds`` rows by iterative extraction.

    Grid step ``t`` scores corpus tile ``tiles_ref[t]`` and runs
    ``rounds`` max/argmax/mask iterations inside ONE ``fori_loop`` — the
    loop body is compiled once, keeping the Mosaic program small (an
    unrolled multi-unit export OOM-killed the AOT compile helper;
    docs/RESULTS_r4.md §8a). Exports:
      val_out [1, rounds, B] f32 — exact accumulator scores, rank order;
      col_out [1, rounds, B] i32 — tile-local columns of those rows.
    Rows at/after ``size`` score NEG_INF and sort away outside.

    Cost is ~3 elementwise passes over [B, tile] per round, so this is
    only for SMALL grids (the union pass: ``rounds=k`` over the
    suspicious tiles). The full-corpus main pass stays on the packed
    single-pass ``_packed_extract_kernel``.
    """
    t = pl.program_id(0)
    b = q_ref.shape[0]
    scores = jax.lax.dot_general(
        q_ref[:].astype(c_ref.dtype), c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)                                  # [B, tile]
    _extract_rounds(scores, tiles_ref[t] * tile, size_ref[0], val_out,
                    col_out, rounds)


def _extract_scaled_kernel(size_ref, tiles_ref, q_ref, c_ref, scale_ref,
                           val_out, col_out, *, tile: int, rounds: int,
                           precision):
    """``_extract_kernel`` for per-row-scaled integer corpora — same
    bf16 scoring + scale multiply as ``_packed_extract_scaled_kernel``
    (the c2 cover must score the SAME function as the main pass)."""
    t = pl.program_id(0)
    scores = jax.lax.dot_general(
        q_ref[:].astype(jnp.bfloat16), c_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision) * scale_ref[:]                   # [B, tile]
    _extract_rounds(scores, tiles_ref[t] * tile, size_ref[0], val_out,
                    col_out, rounds)


def _extract_int8_kernel(size_ref, tiles_ref, q_ref, c_ref, scale_ref,
                         qs_ref, val_out, col_out, *, tile: int,
                         rounds: int):
    """``_extract_kernel`` with the int8-native MXU dot — scores the
    SAME function as ``_packed_extract_int8_kernel`` (int32 accumulate,
    then (i32 * corpus_scale) * query_scale in that order)."""
    t = pl.program_id(0)
    scores_i = jax.lax.dot_general(
        q_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                     # [B, tile]
    scores = (scores_i.astype(jnp.float32) * scale_ref[:]) * qs_ref[:]
    _extract_rounds(scores, tiles_ref[t] * tile, size_ref[0], val_out,
                    col_out, rounds)


def _extract_rounds(scores, base, size_val, val_out, col_out, rounds):
    """Shared exact top-``rounds`` masked-argmax extraction body."""
    b = scores.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(iota + base < size_val, scores, NEG_INF)

    def body(r, sc):
        m = jnp.max(sc, axis=1)                               # [B]
        a = jnp.argmax(sc, axis=1).astype(jnp.int32)          # [B]
        val_out[0, pl.ds(r, 1), :] = m[None, :]
        col_out[0, pl.ds(r, 1), :] = a[None, :]
        return jnp.where(iota == a[:, None], NEG_INF, sc)

    jax.lax.fori_loop(0, rounds, body, scores)


def _extract_pass(queries, corpus, size, tile, rounds, tiles, interpret,
                  precision, row_scale=None, q_scale=None):
    """Run ``_extract_kernel`` over ``tiles`` (int32 [steps] tile ids).
    Returns (val [steps, rounds, B] f32, col [steps, rounds, B] i32).
    ``q_scale`` selects the int8-native kernel (see _packed_pass)."""
    n, d = corpus.shape
    b = queries.shape[0]
    assert n % tile == 0, f"N={n} must be a multiple of tile={tile}"
    steps = tiles.shape[0]
    size_arr = jnp.asarray([n if size is None else size], jnp.int32)
    in_specs = [
        pl.BlockSpec((b, d), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, d), lambda i, size_r, tiles_r: (tiles_r[i], 0),
                     memory_space=pltpu.VMEM),
    ]
    if row_scale is None:
        operands = [size_arr, tiles, queries.astype(jnp.float32), corpus]
        kernel = functools.partial(_extract_kernel, tile=tile,
                                   rounds=rounds, precision=precision)
    elif q_scale is not None:
        assert queries.dtype == jnp.int8 and corpus.dtype == jnp.int8
        assert row_scale.shape == (n,), (row_scale.shape, n)
        in_specs += [
            pl.BlockSpec((1, tile),
                         lambda i, size_r, tiles_r: (0, tiles_r[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [size_arr, tiles, queries, corpus,
                    row_scale.astype(jnp.float32).reshape(1, n),
                    q_scale.astype(jnp.float32).reshape(b, 1)]
        kernel = functools.partial(_extract_int8_kernel, tile=tile,
                                   rounds=rounds)
    else:
        assert row_scale.shape == (n,), (row_scale.shape, n)
        in_specs.append(pl.BlockSpec(
            (1, tile), lambda i, size_r, tiles_r: (0, tiles_r[i]),
            memory_space=pltpu.VMEM))
        operands = [size_arr, tiles, queries.astype(jnp.float32), corpus,
                    row_scale.astype(jnp.float32).reshape(1, n)]
        kernel = functools.partial(_extract_scaled_kernel, tile=tile,
                                   rounds=rounds, precision=precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, rounds, b), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rounds, b), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((steps, rounds, b), jnp.float32),
            jax.ShapeDtypeStruct((steps, rounds, b), jnp.int32),
        ],
        # The fori_loop carry double-buffers the [B, tile] f32 score
        # block (2 x 8 MB at B=1024, tile=2048), overflowing the 16 MB
        # default scoped-VMEM cap; v5e has 128 MB, so raise it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * steps * tile * d,
            bytes_accessed=steps * tile * d * corpus.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# Round-5 ANN fast path: the certified kernel MINUS its covers
# (VERDICT r4 next #5). The first ANN attempt widened the packed scan to
# per-tile top-k unit winners — the k-1 extra in-kernel max+mask rounds
# plus the [B, k*num_tiles] host-side top_k made it SLOWER than the
# certified path (11.5k vs 26.5k qps, docs/results_r5/bench_validation).
# The scan is extraction/VPU-bound, so the approximate path must REMOVE
# work from the certified pipeline, not add it: reuse the identical
# 2-winner packed scan + c1 unit-expanded exact rescore and skip only
# the c2 union rescan, the c3 bound check, and the certificate merge
# (``covers=False``). Clustered-run recall rides the unit EXPANSION:
# each rescued candidate's G strided unit members are exactly rescored,
# so contiguous same-document runs surface through the rescore even
# when only 2 unit winners leave the kernel.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("k", "tile", "groups", "interpret",
                                    "precision", "oversample", "n_winners"))
def pallas_topk_ann(queries: jax.Array, corpus: jax.Array, k: int,
                    size: jax.Array | int | None = None, tile: int = 4096,
                    groups: int = 8, oversample: int = 32,
                    n_winners: int | None = None,
                    interpret: bool = False, precision=None,
                    row_scale: jax.Array | None = None):
    """Approximate top-k at near-scan speed (packed scan + one exact
    candidate rescore; no covers, no certificate).

    queries [B,D] pre-normalized; corpus [N,D], N % tile == 0. Returns
    (scores [B,k] f32 — exact rescores — and ids [B,k] i32). ``oversample``
    bounds the rescued-candidate count (r = max(oversample, k+8) unit
    winners, each expanded to its full G-row unit). ``n_winners`` is
    accepted for API compatibility and ignored (the scan always exports
    2 winners/tile — measured faster AND more accurate via expansion).
    """
    del n_winners
    num_tiles = corpus.shape[0] // tile
    r = min(max(oversample, k + 8), 2 * num_tiles - 1)
    return pallas_topk_certified(
        queries, corpus, k, size, tile=tile, groups=groups,
        pad_r=r, interpret=interpret, precision=precision,
        row_scale=row_scale, covers=False)


@functools.partial(jax.jit,
                   static_argnames=("k", "sub_batch", "tile", "groups",
                                    "interpret", "precision", "oversample"))
def pallas_topk_ann_multi(queries: jax.Array, corpus: jax.Array, k: int,
                          size: jax.Array | int | None = None,
                          sub_batch: int = 1024, tile: int = 4096,
                          groups: int = 8, oversample: int = 32,
                          interpret: bool = False, precision=None,
                          row_scale: jax.Array | None = None):
    """``pallas_topk_ann`` over M sub-batches in ONE dispatch (same
    rationale as ``pallas_topk_certified_multi``)."""
    mb, d = queries.shape
    assert mb % sub_batch == 0, (mb, sub_batch)
    m = mb // sub_batch

    def one(q):
        return pallas_topk_ann(q, corpus, k, size, tile=tile,
                               groups=groups, oversample=oversample,
                               interpret=interpret, precision=precision,
                               row_scale=row_scale)

    s, i = jax.lax.map(one, queries.reshape(m, sub_batch, d))
    return s.reshape(mb, k), i.reshape(mb, k)


@functools.partial(jax.jit, static_argnames=("k",))
def rescore_topk(queries: jax.Array, corpus: jax.Array,
                 cand_ids: jax.Array, k: int,
                 row_scale: jax.Array | None = None):
    """Exact float32 rescoring of an oversampled candidate set.

    queries [B,D]; cand_ids [B,C] (C >= k) from a fast low-precision scan.
    Gathers the C candidate rows per query and recomputes scores at
    HIGHEST precision — restores exact ranking after a bfloat16 first
    pass for a cost of O(B*C*D) ≪ O(B*N*D). ``row_scale`` dequantizes
    gathered integer rows (ops/quantize.py).
    """
    safe = jnp.maximum(cand_ids, 0)
    cand = corpus[safe].astype(jnp.float32)                 # [B, C, D]
    if row_scale is not None:
        cand = cand * row_scale[safe][..., None].astype(jnp.float32)
    # Exact f32 rescore via 2D dots — batched matvecs accumulate below
    # f32 on this backend (see _exact_rowwise_scores).
    scores = _exact_rowwise_scores(queries.astype(jnp.float32), cand,
                                   jnp.float32,
                                   jax.lax.Precision.HIGHEST)
    scores = jnp.where(cand_ids >= 0, scores, NEG_INF)
    top_s, pos = jax.lax.top_k(scores, k)
    top_i = jnp.take_along_axis(cand_ids, pos, axis=1)
    return top_s, top_i


def certificate_uncovered(ids) -> int:
    """Uncovered-certificate count from a FETCHED [B+1, k] ids array
    (``pallas_topk_certified`` / deferred dispatch). 0 = exact."""
    import numpy as _np
    return int(_np.asarray(ids)[-1, 0])


def dispatch_topk(queries, corpus, k, size=None, *, prefer_pallas=None,
                  tile=1024, chunk=65536, approx_tile_k=None,
                  defer_certificate=False, row_scale=None):
    """Pick the right top-k implementation for the backend / problem size.

    EXACT by default at every scale: large corpora route to
    ``pallas_topk_certified`` (single-pass packed extraction + certified
    rescue/rescan covers), small ones to the plain exact kernel.

    Precondition for the certified path: cosine-normalized inputs
    (every |score| <= ~1). The packed kernel shifts scores by +2.0 and
    clamps at 0, so a row scoring <= -2.0 would alias the padding value
    and be silently excluded while the certificate still reads exact.
    Every in-repo caller normalizes (DenseIndex, retriever, encoder
    outputs); pass raw unnormalized embeddings at your own risk or use
    ``approx_tile_k=None, prefer_pallas=False`` for the plain path. Pass
    ``approx_tile_k`` (e.g. 2) to explicitly opt into unverified
    approximate extraction — recall can drop when >approx_tile_k true
    top-k rows share one corpus tile, which is the common case for
    clustered RAG corpora, not the tail.

    ``defer_certificate=True`` (certified path only) skips the synchronous
    host fetch of the exactness counter and returns ids of shape [B+1, k]:
    callers that materialize ids anyway check
    ``certificate_uncovered(ids) == 0`` themselves and rerun via
    ``pallas_topk`` on the (rare) failure — saving one device->host round
    trip per call on the serving path (VERDICT r2 weak #4).
    """
    n = corpus.shape[0]
    on_tpu = jax.default_backend() == "tpu"
    if prefer_pallas is None:
        prefer_pallas = on_tpu and n % tile == 0 and k <= 128
    if prefer_pallas:
        if approx_tile_k is not None:
            # Feasibility clamp: tiles*tile_k winners must cover k (an
            # oversampling caller on a SMALL corpus — e.g. the int8
            # 4x-oversample search at 8k rows — would otherwise trip the
            # kernel's candidate-count assert).
            eff_tile_k = max(approx_tile_k, -(-k // max(n // tile, 1)))
            return pallas_topk(queries, corpus, k, size, tile=tile,
                               tile_k=eff_tile_k, interpret=not on_tpu,
                               row_scale=row_scale)
        if n // tile >= 64 * k:
            # Extraction-bound regime: packed single-pass extraction with
            # certified exactness; counter rides in the ids buffer.
            # Very large query batches run M sub-batches inside ONE
            # dispatch (VMEM caps a single call at ~1k queries; the
            # per-dispatch round trip is the binding cost through a
            # tunneled runtime).
            b = queries.shape[0]
            if b > 1024:
                # VMEM caps a single certified call at ~1024 queries
                # ([B, tile] f32 score block); anything larger MUST go
                # through the multi-dispatch, padded to a whole number of
                # sub-batches. Pad rows REPEAT the first query: a zero
                # pad row scores 0 everywhere, making its tau 0 and every
                # tile's upper bound "suspicious" — the certificate then
                # reads uncovered>0 on every padded call and the exact
                # result is silently recomputed (measured: uncovered
                # 0 -> 34 with one zero row). A duplicated real query
                # certifies exactly like its original.
                pad = (-b) % 1024
                q_run = (jnp.concatenate(
                    [queries, jnp.broadcast_to(
                        queries[:1], (pad, queries.shape[1]))], axis=0)
                    if pad else queries)
                scores, packed = pallas_topk_certified_multi(
                    q_run, corpus, k, size, sub_batch=1024, tile=tile,
                    interpret=not on_tpu, row_scale=row_scale)
                if pad:
                    scores = scores[:b]
                    packed = jnp.concatenate([packed[:b], packed[-1:]],
                                             axis=0)
            else:
                scores, packed = pallas_topk_certified(
                    queries, corpus, k, size, tile=tile,
                    interpret=not on_tpu, row_scale=row_scale)
            if defer_certificate:
                return scores, packed
            if certificate_uncovered(packed) == 0:
                return scores, packed[:-1]
            # Rare cover overflow: rerun with the certain-exact kernel.
            return pallas_topk(queries, corpus, k, size, tile=tile,
                               interpret=not on_tpu, row_scale=row_scale)
        return pallas_topk(queries, corpus, k, size, tile=tile,
                           interpret=not on_tpu, row_scale=row_scale)
    if n > chunk:
        # chunked_topk scores any remainder tail with one extra merged
        # matmul, so non-multiple corpus sizes (e.g. tile-rounded shard
        # capacities) stream in O(B*(chunk+k)) instead of materializing
        # the full [B, N] score matrix in exact_topk.
        return chunked_topk(queries, corpus, k, size, chunk=chunk,
                            row_scale=row_scale)
    return exact_topk(queries, corpus, k, size, row_scale=row_scale)
