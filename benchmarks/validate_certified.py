"""Final validation of the barrier fix.

(1) standalone probes of the two score paths fed by a REAL gather inside
    jit (the configuration XLA was demoting);
(2) full certified-vs-r2 agreement at 10M with host-f64 spot checks.
"""

from __future__ import annotations

import time

import numpy as np

from benchmarks.common import log, make_corpus_device


def main() -> None:
    import jax
    import jax.numpy as jnp
    from optimized_rag_tpu.ops.topk import (
        pallas_topk_certified, pallas_topk_verified_batch)
    from optimized_rag_tpu.utils.health import check_device_health

    for _ in range(6):
        if check_device_health(timeout_s=150).get("healthy"):
            break
        time.sleep(60)

    N, D, B, K = 10 * (1 << 20), 128, 512, 10
    corpus = make_corpus_device(N, D, clusters=4096, dtype=jnp.bfloat16)
    corpus.block_until_ready()
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qj = jnp.asarray(q)
    qbf64 = np.asarray(qj.astype(jnp.bfloat16).astype(jnp.float32)
                       ).astype(np.float64)

    # ---- probe 1: gather-fed mulsum WITH barrier (the rescue path).
    # corpus passed as an ARGUMENT — closing over it captures 2.68 GB as
    # a lowering constant pushed through the tunnel.
    flat = jnp.asarray(rng.integers(0, N, (8, 160)), jnp.int32)

    from optimized_rag_tpu.ops.topk import _exact_rowwise_scores

    @jax.jit
    def rescue_like(c, qq, flat):
        g = c[flat]
        return _exact_rowwise_scores(qq, g, c.dtype, None)

    got = np.asarray(rescue_like(corpus, qj[:8], flat))
    rows64 = np.asarray(corpus[flat].astype(jnp.float32)).astype(np.float64)
    ref = np.einsum("bd,bnd->bn", qbf64[:8], rows64)
    log(f"probe rescue(2D-dot helper): max_err={np.abs(got - ref).max():.3e}")

    # ---- probe 2: union-rescan style 2D dot on contiguous gather
    urows = jnp.arange(32 * 4096, dtype=jnp.int32)

    @jax.jit
    def rescan_like(c, qq, urows):
        gu = c[urows]
        return jnp.dot(qq.astype(c.dtype), gu.T,
                       preferred_element_type=jnp.float32)

    got2 = np.asarray(rescan_like(corpus, qj[:8], urows))
    gu64 = np.asarray(corpus[urows].astype(jnp.float32)).astype(np.float64)
    ref2 = qbf64[:8] @ gu64.T
    log(f"probe rescan(bf16 2D dot):   max_err={np.abs(got2 - ref2).max():.3e}")

    # ---- full agreement
    s2, p2 = pallas_topk_verified_batch(qj, corpus, K, tile=4096, tile_k=2)
    s3, p3 = pallas_topk_certified(qj, corpus, K, tile=4096, groups=8)
    s2, i2 = np.asarray(s2), np.asarray(p2)[:-1]
    s3, i3 = np.asarray(s3), np.asarray(p3)[:-1]
    log(f"uncovered r2={np.asarray(p2)[-1, 0]} r3={np.asarray(p3)[-1, 0]}")
    rec = np.mean([len(set(i3[b]) & set(i2[b])) / K for b in range(B)])
    log(f"recall r3 vs r2: {rec:.6f}")

    def host_scores(b, ids):
        rows = np.asarray(corpus[jnp.asarray(np.asarray(ids, np.int64))]
                          .astype(jnp.float32)).astype(np.float64)
        return rows @ qbf64[b]

    h3 = host_scores(0, i3[0])
    log("q0 r3 claimed-vs-host: "
        + " ".join(f"{a - b:.2e}" for a, b in zip(s3[0], h3)))
    bad = 0
    for b in range(B):
        only2 = sorted(set(i2[b]) - set(i3[b]))
        only3 = sorted(set(i3[b]) - set(i2[b]))
        if only2 and host_scores(b, only2).max() > \
                host_scores(b, only3).min() + 1e-9:
            bad += 1
    log(f"queries where r3 selection is strictly worse (host f64): {bad}")


if __name__ == "__main__":
    main()
