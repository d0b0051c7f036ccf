"""Headline benchmark: dense retrieval QPS/chip at 10M chunks.

The BASELINE.json north star: recall@10 parity with exact search and
>10x QPS/chip over the CPU pipeline at 10M chunks. Headline = the
EXACT certified kernel (ops/topk.pallas_topk_certified — round-3
single-pass packed extraction + certified rescue/rescan covers, the
dispatch/DenseIndex default at this shape) at batch 1024, with a
per-call certification counter proving coverage. Batch 512 is reported
alongside for round-1/2 comparability, as is the explicitly approximate
ANN mode (tile_k=2 extraction, no rescan) with measured recall, and a
driver-captured serving probe (encoder + micro-batching dispatcher,
VERDICT r2 missing #5).

Protocol notes (see docs/RESULTS_r1.md):
  * the corpus is GENERATED ON DEVICE — nothing large crosses the
    host<->device link (which is a network tunnel here)
  * timing forces host materialization per iteration because
    block_until_ready does not synchronize under this runtime; numbers
    therefore include transfer
  * throughput (the headline) uses a depth-2 pipeline — dispatch batch
    j+1, then fetch batch j — so result transfer overlaps the next
    batch's compute, exactly as a serving loop runs; every result is
    still materialized on the host. Per-batch SYNC latency (one batch in
    flight end-to-end) is reported separately as p50_batch_ms.
  * round-3 finding: at B=512 every kernel variant converges to a
    ~31 ms/batch pipelined floor at 10M AND 16M rows — the dispatch
    path, not compute, binds; B=1024 amortizes it (the r2 kernel cannot
    even compile B=1024 — its [B, tile] extraction state overflows the
    16 MB VMEM budget; the packed kernel fits).
  * the CPU baseline runs the same workload shape on a host-side corpus:
    a fast N/8-subsample estimate (cache-favorable LOWER bound on CPU
    latency) plus one slow FULL-corpus confirmation (r1 protocol).

Prints ONE JSON line on stdout; diagnostics on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Cap BLAS threads at the actual core count BEFORE numpy loads its BLAS:
# oversubscribed OpenBLAS spin-waits (sched_yield storms) make the CPU
# baseline ~50x slower on small hosts (observed: 1 core, 8 BLAS threads,
# stime 10x utime).
_cores = os.cpu_count() or 1
os.environ.setdefault("OPENBLAS_NUM_THREADS", str(_cores))
os.environ.setdefault("OMP_NUM_THREADS", str(_cores))

import threading

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


_emit_once = threading.Lock()


def emit_and_exit(payload: dict, code: int = 0) -> None:
    """Print the ONE parseable JSON line and hard-exit.

    os._exit, not sys.exit: a probe thread blocked inside jax backend
    init is non-daemon, so a normal exit joins it forever — exactly how
    round 3's outage run went rc=124 AFTER printing its failure line
    (VERDICT r3 weak #1). Stdout is flushed first; nothing else matters.
    The lock keeps the watchdog and the main thread from interleaving
    two lines; whoever prints first wins and the process dies there.
    """
    _emit_once.acquire()  # never released — one line per process, ever
    print(json.dumps(payload), flush=True)
    sys.stderr.flush()
    os._exit(code)


FAIL_STUB = {"metric": "dense_topk_qps_10M_128d_b1024", "value": 0.0,
             "unit": "qps/chip", "vs_baseline": 0.0,
             "backend": "unavailable"}

# Measurements land here as they complete, so a mid-run device stall
# still reports everything measured before the freeze.
_PARTIAL: dict = {}

# Wall-clock budget shared by the optional round-5 sections: each checks
# remaining time before starting so a slow compile can't push the whole
# run past the watchdog.
_DEADLINE_AT = [float("inf")]


def time_left() -> float:
    return _DEADLINE_AT[0] - time.monotonic()


def start_watchdog(deadline_s: float) -> None:
    """Emit whatever has been measured and exit 0 at ``deadline_s``.

    A relay stall AFTER the claim is granted blocks inside a device call
    and never raises (observed today: a training step frozen >1 h at 0%%
    CPU) — without this, the driver's window closes on rc=124 and the
    round loses its number even if the headline was already measured.
    """
    def fire():
        payload = {**FAIL_STUB, **_PARTIAL}
        payload["error"] = (f"watchdog: run exceeded {deadline_s:.0f}s "
                            f"(device stalled mid-run); fields reported "
                            f"were measured before the stall")
        emit_and_exit(payload)
    t = threading.Timer(deadline_s, fire)
    t.daemon = True
    t.start()


def wait_for_device(budget_s: float) -> bool:
    """Standing-claim wait, bounded by ``budget_s``.

    The relay grants the chip to the first op of a process 1-10 min
    after the previous holder exits; the first blocked backend init IS
    a standing claim, so the right strategy is one long wait, not
    discrete front-loaded retries (round 3 burned 16 of its 24 driver
    minutes on 8x120s probes). Fast-failing probes (relay port down)
    are retried on a short sleep; a blocked init just keeps waiting.
    """
    from optimized_rag_tpu.utils.health import check_device_health
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 5:
            return False
        attempt += 1
        health = check_device_health(timeout_s=min(150.0, remaining))
        if health.get("healthy"):
            log(f"device healthy after {attempt} probe(s): {health}")
            return True
        log(f"device not ready (attempt {attempt}, "
            f"{remaining:.0f}s left): {health}")
        # An errored (vs timed-out) probe means the relay answered and
        # refused — back off briefly before re-claiming. A timed-out
        # probe's thread still blocks in init and the next probe simply
        # re-checks it, so no sleep is needed there.
        if "did not respond" not in str(health.get("error", "")):
            time.sleep(min(30.0, max(0.0, deadline - time.monotonic())))


def main() -> None:
    # ~12 min claim budget: tolerates the normal 1-10 min claim wait and
    # still leaves half the driver's ~24 min window for the measurement;
    # the failure path emits the parseable line and exits 0 immediately.
    # The watchdog bounds the WHOLE process (claim wait + measurement)
    # below the driver's ~24 min window.
    deadline_s = float(os.environ.get("ORAG_BENCH_DEADLINE_S", "1260"))
    start_watchdog(deadline_s)
    _DEADLINE_AT[0] = time.monotonic() + deadline_s - 30.0
    budget = float(os.environ.get("ORAG_BENCH_PROBE_BUDGET_S", "720"))
    if not wait_for_device(budget):
        emit_and_exit({**FAIL_STUB,
                       "error": f"device unavailable: no claim granted "
                                f"within {budget:.0f}s (relay down or "
                                f"chip held elsewhere)"})

    import jax
    import jax.numpy as jnp
    from benchmarks.common import make_corpus_device
    from optimized_rag_tpu.ops.topk import (
        chunked_topk, pallas_topk, pallas_topk_ann, pallas_topk_ann_multi,
        pallas_topk_certified, pallas_topk_certified_multi)

    try:  # persistent XLA cache: later runs (incl. the driver's) skip
        from optimized_rag_tpu.config import Settings
        from optimized_rag_tpu.utils.compile_cache import (
            setup_compilation_cache)
        setup_compilation_cache(Settings())
    except Exception as exc:
        log(f"compile cache unavailable: {exc!r}")

    N, D, K = 10 * (1 << 20), 128, 10
    B_HEAD, B_CMP = 1024, 512
    TILE = 4096
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    log(f"backend={backend} corpus={N}x{D} bf16, k={K}, "
        f"batch headline={B_HEAD} (b{B_CMP} + ANN alongside)")

    t0 = time.perf_counter()
    corpus = make_corpus_device(N, D, clusters=4096, dtype=jnp.bfloat16)
    corpus.block_until_ready()
    log(f"on-device corpus ready in {time.perf_counter() - t0:.0f}s")

    rng = np.random.default_rng(0)

    def qbatches(b, n=4):
        out = []
        for _ in range(n):
            qq = rng.standard_normal((b, D)).astype(np.float32)
            qq /= np.linalg.norm(qq, axis=1, keepdims=True)
            out.append(jax.device_put(jnp.asarray(qq)))
        return out

    q512 = qbatches(B_CMP)
    q1024 = qbatches(B_HEAD)

    def exact_sub(qq, sub_batch):
        """Certified-exact kernel; returns (s, ids, counter_row).

        ``sub_batch`` < len(qq) routes through the single-dispatch
        multi-batch wrapper — same kernel, same certificate, smaller
        per-call VMEM. The relay's AOT compile helper enforces a 16M
        scoped-VMEM cap that has shifted between rounds (round 4: the
        b1024/tile=4096 shape stopped compiling until a kernel revert);
        the sub-batched route is the fallback that always fits.
        """
        if on_tpu:
            if sub_batch < qq.shape[0]:
                s, packed = pallas_topk_certified_multi(
                    qq, corpus, K, sub_batch=sub_batch, tile=TILE, groups=8)
            else:
                s, packed = pallas_topk_certified(qq, corpus, K, tile=TILE,
                                                  groups=8)
            return s, packed[:-1], packed[-1:]
        s, i = chunked_topk(qq, corpus, K, chunk=1 << 17)
        return s, i, None

    # Probe-compile the headline shape; on a compile failure fall back to
    # 2x512 sub-batches in one dispatch rather than losing the round.
    head_sub = B_HEAD
    if on_tpu:
        try:
            np.asarray(exact_sub(q1024[0], head_sub)[2])
        except Exception as exc:
            log(f"b{B_HEAD} certified compile failed ({exc!r:.200}); "
                f"falling back to sub_batch=512 single-dispatch")
            head_sub = 512
            _PARTIAL["headline_sub_batch"] = head_sub

    def exact(qq):
        return exact_sub(qq, head_sub if qq.shape[0] == B_HEAD else
                         qq.shape[0])

    def fast(qq):
        """ANN fast path (round-5): packed scan + candidate rescore, no
        certification covers (ops/topk.pallas_topk_ann; VERDICT r4 #5)."""
        if on_tpu:
            return pallas_topk_ann(qq, corpus, K, tile=TILE, groups=8,
                                   oversample=32)
        return chunked_topk(qq, corpus, K, chunk=1 << 17)

    # recall of the approximate mode vs the certified-exact kernel
    # (device oracle — the corpus never leaves the device).
    _, i_exact, cover = exact(q512[0])
    uncovered512 = int(np.asarray(cover)[0, 0]) if cover is not None else 0
    _, i_exact1k, cover1k = exact(q1024[0])
    uncovered = int(np.asarray(cover1k)[0, 0]) if cover1k is not None else 0
    log(f"exactness certification: uncovered b512={uncovered512} "
        f"b1024={uncovered} (0 = exact)")
    i_exact1k = np.asarray(i_exact1k)
    s, i = fast(q1024[0])
    i_np = np.asarray(i)
    recall = float(np.mean([len(set(i_np[r]) & set(i_exact1k[r])) / K
                            for r in range(B_HEAD)]))
    log(f"ANN fast-path recall@{K} vs exact kernel (b{B_HEAD}): "
        f"{recall:.4f}")

    def timed_sync(fn, qjs, iters=10):
        t0 = time.perf_counter()
        for j in range(iters):
            out = fn(qjs[j % len(qjs)])
            _ = np.asarray(out[1])
        return (time.perf_counter() - t0) / iters

    def timed_pipe(fn, qjs, iters=20, depth=2):
        pend = []
        t0 = time.perf_counter()
        for j in range(iters):
            pend.append(fn(qjs[j % len(qjs)]))
            if len(pend) >= depth:
                _ = np.asarray(pend.pop(0)[1])
        while pend:
            _ = np.asarray(pend.pop(0)[1])
        return (time.perf_counter() - t0) / iters

    # HEADLINE: certified-exact kernel, pipelined throughput at B=1024.
    sync_s = timed_sync(exact, q1024)
    dev_s = timed_pipe(exact, q1024)
    dev_qps = B_HEAD / dev_s
    log(f"EXACT b{B_HEAD}: sync {sync_s * 1e3:.2f} ms/batch "
        f"({B_HEAD / sync_s:.0f} qps); pipelined {dev_s * 1e3:.2f} ms/batch"
        f" -> {dev_qps:.0f} qps "
        f"({N * D * 2 / dev_s / 1e9:.0f} GB/s effective)")
    _PARTIAL.update({
        "value": round(dev_qps, 1), "backend": backend,
        "mode": "exact (certified: rescue+rescan covers, counter-verified)",
        "exactness_uncovered": uncovered,
        "recall_at_10": 1.0 if uncovered == 0 else None,
        "p50_batch_ms": round(sync_s * 1e3, 2),
        "pipelined_batch_ms": round(dev_s * 1e3, 2),
        "b1024_qps": round(B_HEAD / dev_s, 1),
        "b1024_uncovered": uncovered,
        "corpus": f"{N}x{D} bf16"})

    # Multi-batch single-dispatch probe: lax.map over M sub-batches of
    # B_HEAD inside ONE jit call — VMEM stays at the sub-batch level
    # while M blocks amortize the ~31 ms tunnel dispatch floor (the
    # round-3 binding constraint). If it wins certified-exact, it IS
    # the headline: same kernel, same certificate, better dispatch
    # amortization.
    b_eff, eff_sync_s, eff_dev_s, eff_unc = B_HEAD, sync_s, dev_s, uncovered
    multi: dict = {}
    if on_tpu:
        try:
            from optimized_rag_tpu.ops.topk import (
                pallas_topk_certified_multi)
            M = 4
            qmb = qbatches(M * B_HEAD, n=2)

            def exact_multi(qq):
                s, packed = pallas_topk_certified_multi(
                    qq, corpus, K, sub_batch=head_sub, tile=TILE, groups=8)
                return s, packed[:-1], packed[-1:]

            _, _, cov_m = exact_multi(qmb[0])
            unc_m = int(np.asarray(cov_m)[0, 0])
            sync_m = timed_sync(exact_multi, qmb, iters=6)
            pipe_m = timed_pipe(exact_multi, qmb, iters=12)
            multi_qps = M * B_HEAD / pipe_m
            log(f"EXACT multi m={M} (b{M * B_HEAD} single-dispatch): sync "
                f"{sync_m * 1e3:.2f} ms; pipelined {pipe_m * 1e3:.2f} ms "
                f"-> {multi_qps:.0f} qps, uncovered={unc_m}")
            multi = {"multi_m": M,
                     "multi_qps": round(multi_qps, 1),
                     "multi_pipelined_batch_ms": round(pipe_m * 1e3, 2),
                     "multi_uncovered": unc_m}
            if unc_m == 0 and multi_qps > dev_qps:
                b_eff = M * B_HEAD
                eff_sync_s, eff_dev_s, eff_unc = sync_m, pipe_m, unc_m
                dev_qps = multi_qps
                log(f"headline -> multi-batch config b{b_eff}")
                _PARTIAL.update({
                    "metric": f"dense_topk_qps_10M_{D}d_b{b_eff}",
                    "value": round(dev_qps, 1),
                    "exactness_uncovered": unc_m,
                    "p50_batch_ms": round(sync_m * 1e3, 2),
                    "pipelined_batch_ms": round(pipe_m * 1e3, 2)})
            _PARTIAL.update(multi)
        except Exception as exc:   # never sink the single-batch metric
            log(f"multi-batch probe failed: {exc!r}")

    # Comparability: same kernel at the round-1/2 batch size.
    sync512_s = timed_sync(exact, q512)
    dev512_s = timed_pipe(exact, q512)
    log(f"EXACT b{B_CMP}: sync {sync512_s * 1e3:.2f} ms/batch; pipelined "
        f"{dev512_s * 1e3:.2f} ms/batch -> {B_CMP / dev512_s:.0f} qps")

    # ANN fast path at the headline batch shapes (VERDICT r4 #5 wants
    # b1024 AND b4096 like the exact path).
    ann_sync_s = timed_sync(fast, q1024)
    ann_s = timed_pipe(fast, q1024)
    ann_qps = B_HEAD / ann_s
    log(f"ANN mode b{B_HEAD}: sync {ann_sync_s * 1e3:.2f} ms/batch; "
        f"pipelined {ann_s * 1e3:.2f} ms/batch -> {ann_qps:.0f} qps "
        f"at measured recall {recall:.4f}")
    ann4096: dict = {}
    if on_tpu and time_left() > 300:
        try:
            qmb_a = qbatches(4 * B_HEAD, n=2)

            def fast_multi(qq):
                return pallas_topk_ann_multi(qq, corpus, K,
                                             sub_batch=B_HEAD, tile=TILE,
                                             groups=8, oversample=32)

            np.asarray(fast_multi(qmb_a[0])[1])      # compile probe
            a_sync = timed_sync(fast_multi, qmb_a, iters=6)
            a_pipe = timed_pipe(fast_multi, qmb_a, iters=12)
            a_qps = 4 * B_HEAD / a_pipe
            log(f"ANN multi b{4 * B_HEAD}: sync {a_sync * 1e3:.2f} ms; "
                f"pipelined {a_pipe * 1e3:.2f} ms -> {a_qps:.0f} qps")
            ann4096 = {"ann_b4096_qps": round(a_qps, 1),
                       "ann_b4096_pipelined_batch_ms":
                           round(a_pipe * 1e3, 2)}
            if a_qps > ann_qps:
                ann_qps = a_qps
            _PARTIAL.update(ann4096)
        except Exception as exc:
            log(f"ANN b4096 probe failed: {exc!r}")

    # CPU exact baseline (pgvector-equivalent brute force), same D/k.
    # (a) fast N/8-subsample estimate — linear scaling, cache-favorable
    # LOWER bound on true latency, so vs_baseline stays conservative;
    # (b) one slow full-corpus confirmation (round-1 protocol) so the
    # scaling claim is re-anchored every round (VERDICT r2 weak #3).
    bc = 16
    sub = 8
    n_cpu = N // sub
    cpu_q = rng.standard_normal((bc, D)).astype(np.float32)
    cpu_q /= np.linalg.norm(cpu_q, axis=1, keepdims=True)
    cpu_corpus = rng.standard_normal((n_cpu, D), dtype=np.float32)
    cpu_corpus /= np.linalg.norm(cpu_corpus, axis=1, keepdims=True)
    _ = cpu_q[:2] @ cpu_corpus.T  # touch every page
    best = float("inf")
    for _rep in range(2):
        t0 = time.perf_counter()
        scores = cpu_q @ cpu_corpus.T
        part = np.argpartition(-scores, K, axis=1)[:, :K]
        _ = np.take_along_axis(scores, part, axis=1)
        best = min(best, (time.perf_counter() - t0) / bc)
    cpu_est_s = best * sub
    log(f"cpu subsample at {n_cpu} rows: {best:.3f} s/query x{sub} "
        f"-> {cpu_est_s:.2f} s/query estimated")
    # full-corpus confirmation: stream all N rows slab by slab (each slab
    # is 670 MB — far beyond cache, so this measures RAM-streaming exact
    # scan like r1's protocol) and time only the scoring work.
    full_s = None
    try:
        fq = cpu_q[:2]
        scan_t = 0.0
        best_parts = []
        for slab in range(sub):
            sc = (cpu_corpus if slab == 0 else
                  np.random.default_rng(slab).standard_normal(
                      (n_cpu, D)).astype(np.float32))
            if slab:
                sc /= np.linalg.norm(sc, axis=1, keepdims=True)
            t0 = time.perf_counter()
            scores = fq @ sc.T
            part = np.argpartition(-scores, K, axis=1)[:, :K]
            best_parts.append(np.take_along_axis(scores, part, axis=1))
            scan_t += time.perf_counter() - t0
        _ = np.sort(np.concatenate(best_parts, axis=1), axis=1)[:, -K:]
        full_s = scan_t / len(fq)
        log(f"cpu full-corpus confirm: {full_s:.2f} s/query "
            f"(streamed {sub} slabs, scoring time only)")
    except MemoryError:
        log("cpu full-corpus confirm skipped (RAM)")
    cpu_s = cpu_est_s
    cpu_qps = 1.0 / cpu_s
    log(f"cpu exact: {cpu_s:.2f} s/query -> {cpu_qps:.2f} qps")
    _PARTIAL.update({
        "vs_baseline": round(dev_qps / cpu_qps, 1),
        "cpu_baseline_qps": round(cpu_qps, 3),
        "b512_qps": round(B_CMP / dev512_s, 1),
        "ann_mode_qps": round(ann_qps, 1),
        "ann_mode_recall_at_10": round(recall, 4)})

    # Serving probe (VERDICT r2 missing #5): trained encoder + DenseIndex
    # behind the micro-batching QueryServer, 5-second client storm.
    serving = {}
    try:
        serving = _serving_probe(log)
    except Exception as exc:  # never let the probe sink the kernel metric
        log(f"serving probe failed: {exc!r}")

    # Warm agent-turn probe (VERDICT r4 next #7): the stale round-2
    # 188 ms p50 gets a driver-captured replacement. Runs BEFORE the
    # expensive capacity probes — the overnight round-5 validation run
    # spent its whole deadline in the 48M int8 corpus build and never
    # reached this (docs/results_r5/bench_validation.json has no turn
    # fields); the cheap probes must not sit behind the expensive ones.
    turn = {}
    if time_left() > 240:
        try:
            turn = _turn_probe(log)
            _PARTIAL.update(turn)
        except Exception as exc:
            log(f"turn probe failed: {exc!r}")

    # Round-5 extended capacity configs (VERDICT r4 next #2): int8 at
    # 48M rows and the bf16 single-chip ceiling at 28M, both previously
    # builder-run only. The 10M corpus is explicitly freed first (the
    # closures above keep it referenced; .delete() releases the HBM).
    int8_fields: dict = {}
    ceiling_fields: dict = {}
    if on_tpu:
        for name, probe, floor_s in (("int8", _int8_probe, 420.0),
                                     ("ceiling", _ceiling_probe, 300.0)):
            if time_left() <= floor_s:
                log(f"{name} probe skipped ({time_left():.0f}s left)")
                continue
            if corpus is not None:
                corpus.delete()
                corpus = None
            try:
                fields = probe(log, qbatches, K)
                _PARTIAL.update(fields)
                if name == "int8":
                    int8_fields = fields
                else:
                    ceiling_fields = fields
            except Exception as exc:
                log(f"{name} probe failed: {exc!r}")

    emit_and_exit({
        "metric": f"dense_topk_qps_10M_{D}d_b{b_eff}",
        "value": round(dev_qps, 1),
        "unit": "qps/chip",
        "vs_baseline": round(dev_qps / cpu_qps, 1),
        "mode": "exact (certified: rescue+rescan covers, counter-verified)",
        "exactness_uncovered": eff_unc,
        "recall_at_10": 1.0 if eff_unc == 0 else None,
        "p50_batch_ms": round(eff_sync_s * 1e3, 2),
        "pipelined_batch_ms": round(eff_dev_s * 1e3, 2),
        "sync_qps": round(b_eff / eff_sync_s, 1),
        "b1024_qps": round(B_HEAD / dev_s, 1),
        "b1024_pipelined_batch_ms": round(dev_s * 1e3, 2),
        "b1024_uncovered": uncovered,
        "b512_qps": round(B_CMP / dev512_s, 1),
        "b512_pipelined_batch_ms": round(dev512_s * 1e3, 2),
        "b512_uncovered": uncovered512,
        "ann_mode_qps": round(ann_qps, 1),
        "ann_mode_recall_at_10": round(recall, 4),
        "ann_b1024_qps": round(B_HEAD / ann_s, 1),
        "ann_mode_p50_batch_ms": round(ann_sync_s * 1e3, 2),
        "cpu_baseline_qps": round(cpu_qps, 3),
        "cpu_full_corpus_s_per_query": round(full_s, 2) if full_s else None,
        "corpus": f"{N}x{D} bf16",
        "backend": backend,
        **multi,
        **ann4096,
        **int8_fields,
        **ceiling_fields,
        **serving,
        **turn,
    })


def _int8_probe(log, qbatches, k: int) -> dict:
    """Certified-exact int8 retrieval at 48M rows (6.1 GB + scales).

    Round 4 measured this point builder-side only, on the bf16-operand
    scaled kernel (5,889 qps — the in-kernel int8->bf16 conversion ate
    the bandwidth win, RESULTS_r4 §11a). This probe runs the round-5
    int8-NATIVE MXU path (s8xs8->s32, ops/topk._packed_extract_int8_kernel)
    and lands the numbers in the driver capture (VERDICT r4 next #2).
    """
    import numpy as np

    from benchmarks.common import make_corpus_device_int8
    from optimized_rag_tpu.ops.topk import pallas_topk_certified_multi

    n8, d, b = 48 * (1 << 20), 128, 1024
    t0 = time.perf_counter()
    codes, scale = make_corpus_device_int8(n8, d)
    codes.block_until_ready()
    gb = n8 * (d + 4) / 1e9
    log(f"int8 corpus [{n8},{d}] ({gb:.1f} GB incl. scales) on device in "
        f"{time.perf_counter() - t0:.0f}s")
    qs = qbatches(2 * b, n=2)

    def certified(qq):
        # union_tiles/pad_r widened vs the bf16 defaults: int8 scores
        # take DISCRETE levels, so at 12288 tiles the 2nd-unit upper
        # bound ties tau far more often than in bf16 — the overnight
        # round-5 run measured uncovered=1 with the default 32-tile
        # union (docs/results_r5/bench_validation.json).
        s, packed = pallas_topk_certified_multi(
            qq, codes, k, size=n8, sub_batch=b, tile=4096, groups=8,
            union_tiles=64, pad_r=26, row_scale=scale, int8_native=True)
        return s, packed[:-1], packed[-1:]

    _, _, cov = certified(qs[0])
    unc = int(np.asarray(cov)[0, 0])

    def timed_pipe(fn, qjs, iters=10, depth=2):
        pend = []
        t0 = time.perf_counter()
        for j in range(iters):
            pend.append(fn(qjs[j % len(qjs)]))
            if len(pend) >= depth:
                _ = np.asarray(pend.pop(0)[2])
        while pend:
            _ = np.asarray(pend.pop(0)[2])
        return (time.perf_counter() - t0) / iters

    pipe_s = timed_pipe(certified, qs)
    qps = 2 * b / pipe_s
    # each dispatch scans the int8 corpus once per sub-batch (m=2)
    gbps = 2 * n8 * d / pipe_s / 1e9
    log(f"int8-native certified b{2 * b} at {n8 >> 20}M rows: "
        f"{pipe_s * 1e3:.1f} ms/batch -> {qps:.0f} qps, uncovered={unc} "
        f"({gbps:.0f} GB/s effective)")
    out = {"int8_qps": round(qps, 1), "int8_rows": n8,
           "int8_uncovered": unc,
           "int8_pipelined_batch_ms": round(pipe_s * 1e3, 2),
           "int8_effective_gb_s": round(gbps, 1)}
    codes.delete()
    scale.delete()
    return out


def _ceiling_probe(log, qbatches, k: int) -> dict:
    """bf16 single-chip capacity ceiling: 28M rows (7.2 GB), certified
    exact — the round-4 builder-measured ceiling (RESULTS_r4 §10),
    driver-captured here (VERDICT r4 next #2)."""
    import numpy as np
    import jax.numpy as jnp

    from benchmarks.common import make_corpus_device
    from optimized_rag_tpu.ops.topk import pallas_topk_certified

    nc, d, b = 28 * (1 << 20), 128, 1024
    t0 = time.perf_counter()
    corpus = make_corpus_device(nc, d, clusters=4096, dtype=jnp.bfloat16)
    corpus.block_until_ready()
    log(f"ceiling corpus [{nc},{d}] bf16 "
        f"({nc * d * 2 / 1e9:.1f} GB) on device in "
        f"{time.perf_counter() - t0:.0f}s")
    qs = qbatches(b, n=2)

    def certified(qq):
        s, packed = pallas_topk_certified(qq, corpus, k, size=nc,
                                          tile=4096, groups=8)
        return s, packed[:-1], packed[-1:]

    _, _, cov = certified(qs[0])
    unc = int(np.asarray(cov)[0, 0])
    pend = []
    t0 = time.perf_counter()
    iters = 10
    for j in range(iters):
        pend.append(certified(qs[j % len(qs)]))
        if len(pend) >= 2:
            _ = np.asarray(pend.pop(0)[2])
    while pend:
        _ = np.asarray(pend.pop(0)[2])
    pipe_s = (time.perf_counter() - t0) / iters
    qps = b / pipe_s
    log(f"bf16 ceiling b{b} at {nc >> 20}M rows: {pipe_s * 1e3:.1f} "
        f"ms/batch -> {qps:.0f} qps, uncovered={unc} "
        f"({nc * d * 2 / pipe_s / 1e9:.0f} GB/s effective)")
    out = {"ceiling_rows": nc, "ceiling_qps": round(qps, 1),
           "ceiling_uncovered": unc,
           "ceiling_pipelined_batch_ms": round(pipe_s * 1e3, 2)}
    corpus.delete()
    return out


def _turn_probe(log) -> dict:
    """Compact warm agent-turn latency: the full 16-node pipeline with
    the deterministic offline LLM (LLM latency ~0 isolates the
    framework), bundled trained encoder/cross-encoder, fused-turn
    dispatches. Replaces the stale round-2 builder number with a
    driver capture (VERDICT r4 next #7)."""
    import tempfile

    import numpy as np

    from optimized_rag_tpu.agent.agent import RAGAgent
    from optimized_rag_tpu.agent.llm import DeterministicLLM
    from optimized_rag_tpu.config import Settings
    from optimized_rag_tpu.eval.synthetic import make_dataset

    n_docs, warmup, turns = 128, 4, 16
    settings = Settings()
    settings.data_dir = tempfile.mkdtemp(prefix="orag_bench_turn_")
    agent = RAGAgent(settings, llm=DeterministicLLM())
    ds = make_dataset(num_docs=n_docs, num_topics=10,
                      num_queries=warmup + turns, seed=11)
    t0 = time.perf_counter()
    for i in range(0, len(ds.texts), 64):
        agent.ingestor.ingest_text("\n".join(ds.texts[i:i + 64]),
                                   filename=f"doc{i}.txt")
    log(f"turn probe: ingested {n_docs} docs in "
        f"{time.perf_counter() - t0:.0f}s")
    for q in ds.queries[:warmup]:
        agent.chat(q)
    times = []
    for q in ds.queries[warmup:warmup + turns]:
        t0 = time.perf_counter()
        resp = agent.chat(q)
        times.append(time.perf_counter() - t0)
        assert resp.answer
    times = np.sort(np.asarray(times))
    out = {"turn_p50_ms": round(float(times[len(times) // 2]) * 1e3, 1),
           "turn_p99_ms": round(float(times[int(len(times) * .99)]) * 1e3,
                                1),
           "turn_docs": n_docs, "turn_count": turns}
    log(f"turn probe: {out}")
    return out


def _serving_probe(log) -> dict:
    """5-second QueryServer storm: real encoder forward + index search
    through the micro-batching dispatcher. Returns serving_* fields."""
    import threading

    from optimized_rag_tpu.index.dense import DenseIndex
    from optimized_rag_tpu.models import pretrain
    from optimized_rag_tpu.models.encoder import EmbeddingService
    from optimized_rag_tpu.serving import QueryServer

    try:  # reuse compiled encoder executables across bench runs
        from optimized_rag_tpu.config import Settings
        from optimized_rag_tpu.utils.compile_cache import (
            setup_compilation_cache)
        setup_compilation_cache(Settings())
    except Exception:
        pass
    repo = os.path.dirname(os.path.abspath(__file__))
    loaded = pretrain.load_pretrained(
        os.path.join(repo, "checkpoints", "pretrained"), "biencoder")
    if loaded is None:
        log("serving probe skipped: no bundled checkpoint")
        return {}
    cfg, params = loaded
    svc = EmbeddingService(
        cfg, params=params, max_len=64, cache_size=0,
        tokenizer=pretrain.load_tokenizer(
            os.path.join(repo, "checkpoints", "pretrained"),
            cfg.vocab_size, 64))
    docs = [f"document {i} covers topic {i % 97} in technical depth "
            f"with details about subsystem {i % 13}" for i in range(8192)]
    idx = DenseIndex(dim=svc.dim, capacity_block=1 << 13, tile=1024)
    t0 = time.perf_counter()
    for i in range(0, len(docs), 512):
        idx.add(svc.encode(docs[i:i + 512]))
    log(f"serving probe: indexed {len(docs)} docs in "
        f"{time.perf_counter() - t0:.0f}s")
    b = 1
    while b <= 64:  # warm every pow2 bucket (encode AND search programs)
        idx.search(svc.encode([f"warm {j}" for j in range(b)]), k=10)
        b *= 2
    server = QueryServer(svc.encode, idx, max_batch=64, max_wait_ms=5.0,
                         workers=2)
    server.start()
    futs = [server.submit(f"warm storm {i}") for i in range(256)]
    for f in futs:
        f.result(timeout=300)

    # Callback-driven closed loop: 64 requests stay in flight with ZERO
    # client threads — each completion records its latency and resubmits
    # from the dispatcher's callback. Round 3's 8 client threads on the
    # 1-core build host GIL-thrashed the measurement itself (p99 3,026 ms
    # vs p50 99 ms — scheduling noise, not server queueing; VERDICT r3
    # weak #4): a thread that finished future.result() waited tens of ms
    # for the GIL before it could even timestamp, and seconds to resubmit.
    window = 64
    stop_at = time.perf_counter() + 5.0
    lat: list = []
    lock = threading.Lock()
    done = threading.Event()
    state = {"inflight": 0, "seq": 0, "n": 0}

    def submit_one():
        with lock:
            j = state["seq"]
            state["seq"] += 1
            state["inflight"] += 1
        fut = server.submit(f"query number {j} about topic {j % 97}", k=10)
        t0 = time.perf_counter()
        fut.add_done_callback(lambda f, t0=t0: complete(f, t0))

    def complete(fut, t0):
        now = time.perf_counter()
        ok = fut.exception() is None
        with lock:
            if ok:
                lat.append((now - t0) * 1e3)
                state["n"] += 1
            state["inflight"] -= 1
            drained = state["inflight"] == 0
        if now < stop_at and ok:
            submit_one()
        elif drained:
            done.set()

    t0 = time.perf_counter()
    for _ in range(window):
        submit_one()
    done.wait(timeout=120)
    wall = time.perf_counter() - t0
    server.stop()
    n = state["n"]
    lat.sort()
    out = {
        "serving_qps": round(n / wall, 1),
        "serving_clients": window,
        "serving_p50_ms": round(lat[len(lat) // 2], 1) if lat else None,
        "serving_p99_ms": round(lat[int(len(lat) * .99)], 1) if lat else None,
        "serving_avg_batch": round(server.get_stats()["avg_batch"], 1),
    }
    log(f"serving probe: {out}")
    return out


if __name__ == "__main__":
    try:
        main()
    except BaseException as exc:  # one parseable line, no matter what
        import traceback
        traceback.print_exc(file=sys.stderr)
        emit_and_exit({**FAIL_STUB, "error": f"bench crashed: {exc!r}"})
