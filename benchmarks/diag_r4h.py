"""Round-4h: device-trace attribution of pallas_topk_certified.

The extract-union graft measured performance-NEUTRAL (sweep_r4f.jsonl)
even though §8's standalone attribution priced the c2 sort it replaced
at ~12 ms — standalone cost is evidently not critical-path cost. This
captures a perfetto trace of the certified kernel at the headline
shape and sums device-track slice durations by op, giving the real
per-op schedule instead of subtraction games.

Run: python -u -m benchmarks.diag_r4h [--n MIB] [--iters I]
Writes /tmp/diag_r4h_trace/ and prints a JSON cost table.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import sys
import time

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10, help="corpus MiB-rows")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from benchmarks.common import make_corpus_device
    from optimized_rag_tpu.ops import topk as T

    log(f"backend={jax.default_backend()}")
    n, d, b, k = args.n * (1 << 20), 128, 1024, 10
    corpus = make_corpus_device(n, d, clusters=4096, dtype=jnp.bfloat16)
    corpus.block_until_ready()
    log("corpus on device")
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q1 = jnp.asarray(q)

    def step():
        s, i = T.pallas_topk_certified(q1, corpus, k, size=n)
        return np.asarray(i[-1:])

    step()  # compile + warm
    step()
    log("warm; tracing")
    tdir = "/tmp/diag_r4h_trace"
    with jax.profiler.trace(tdir, create_perfetto_trace=True):
        for _ in range(args.iters):
            step()
    log("trace done; parsing")

    paths = sorted(glob.glob(f"{tdir}/**/*.json.gz", recursive=True))
    if not paths:
        log("NO perfetto trace produced")
        return 1
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"] if isinstance(tr, dict) else tr

    # Identify device-side tracks (TPU/device in the process/thread name).
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") in ("process_name",
                                                    "thread_name"):
            key = (e.get("pid"), e.get("tid") if e["name"] == "thread_name"
                   else None)
            names[key] = e["args"].get("name", "")
    dev_pids = {pid for (pid, tid), nm in names.items()
                if tid is None and ("TPU" in nm or "/device" in nm.lower())}
    log(f"tracks: {sorted(set(names.values()))[:20]}")

    per_op = collections.Counter()
    per_op_n = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        per_op[e["name"]] += e["dur"]
        per_op_n[e["name"]] += 1
    total = sum(per_op.values())
    rows = [{"op": op, "ms_per_iter": round(us / 1e3 / args.iters, 3),
             "count": per_op_n[op]}
            for op, us in per_op.most_common(25)]
    print(json.dumps({"device_tracks": bool(dev_pids),
                      "total_ms_per_iter": round(total / 1e3 / args.iters, 2),
                      "ops": rows}, indent=1), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
