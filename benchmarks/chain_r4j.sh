#!/bin/bash
# Chip-gated round-4j chain: wait out a claim outage, verify the
# k-major kernel layout on the real chip, then run the 32M (fallback
# 24M) single-chip capacity sweep. Every python step is bounded and
# exits via os._exit (a hung axon claim leaves non-daemon threads that
# block normal interpreter exit). Run detached:
#   bash benchmarks/chain_r4j.sh > /tmp/chain_r4j.log 2>&1 & echo $! > /tmp/chain_r4j.pid
set -u
cd /root/repo

probe() {
  timeout 200 python -c "
import os, sys
sys.path.insert(0, '/root/repo')
from optimized_rag_tpu.utils.health import check_device_health
h = check_device_health(timeout_s=150)
print(h, flush=True)
os._exit(0 if h.get('healthy') else 1)
"
}

echo "[chain_r4j] waiting for chip ($(date -u +%H:%M:%S))"
deadline=$((SECONDS + 10800))   # 3h outage budget
until probe; do
  if [ $SECONDS -ge $deadline ]; then
    echo "[chain_r4j] chip never came back; giving up"
    exit 1
  fi
  sleep 60
done
echo "[chain_r4j] chip healthy ($(date -u +%H:%M:%S))"

echo "[chain_r4j] step 1: layout verify on chip"
timeout 900 python - <<'EOF'
import os, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from optimized_rag_tpu import ops
assert jax.default_backend() == "tpu", jax.default_backend()
rng = np.random.default_rng(7)
c = ops.normalize(jnp.asarray(rng.standard_normal((65536, 128), dtype=np.float32))).astype(jnp.bfloat16)
q = ops.normalize(jnp.asarray(rng.standard_normal((256, 128), dtype=np.float32)))
s, i = ops.pallas_topk(q, c, 10)
# Oracle must mirror the kernel's query cast to the corpus dtype
# (bf16 here), else ~3% of top-10 indices flip on ~1e-3 score ties.
s2, i2 = ops.exact_topk(q.astype(jnp.bfloat16).astype(jnp.float32),
                        c.astype(jnp.float32), 10)
ok1 = (np.asarray(i) == np.asarray(i2)).mean()
sv, iv = ops.pallas_topk_verified(q, c, 10)
ok2 = (np.asarray(iv) == np.asarray(i2)).mean()
print(f"layout verify: pallas match={ok1:.4f} verified match={ok2:.4f}", flush=True)
os._exit(0 if ok1 == 1.0 and ok2 == 1.0 else 1)
EOF
rc=$?
echo "[chain_r4j] step 1 rc=$rc"
[ $rc -ne 0 ] && exit $rc

echo "[chain_r4j] step 2: 32M sweep"
out=docs/results_r4/sweep_r4j.jsonl
if timeout 1800 python -u -m benchmarks.sweep_r4j --rows-mib 32 > "$out"; then
  echo "[chain_r4j] 32M sweep done"
else
  echo "[chain_r4j] 32M failed (rc=$?); trying 24M"
  timeout 1800 python -u -m benchmarks.sweep_r4j --rows-mib 24 > "$out" \
    || { echo "[chain_r4j] 24M also failed"; exit 1; }
fi
cat "$out"
echo "[chain_r4j] done ($(date -u +%H:%M:%S))"
