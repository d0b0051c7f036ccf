#!/bin/bash
# Chip-gated round-5 chain: runs AFTER the grounded retrain frees the
# chip. Serialized (one TPU process at a time through the relay):
#   1. qa_sheet --local-lm         (grounded generator, held-out gate)
#   2. encoder gauntlet baseline   (bundled xl2 encoder)
#   3. xl3 cross-lingual retrain   (+gates, --swap on pass)
#   4. qa_sheet --no-translation-xl (proof: retrieval, not translation)
#   5. bench.py validation run     (prewarms the driver's compile cache
#                                   incl. int8-native 48M + ANN shapes)
# Every step is bounded; failures don't stop later steps. Run detached:
#   bash benchmarks/chain_r5.sh > /tmp/chain_r5.log 2>&1 & echo $! > /tmp/chain_r5.pid
set -u
cd /root/repo
mkdir -p docs/results_r5

wait_pid_file=/tmp/grounded_train.pid
if [ -f "$wait_pid_file" ]; then
  pid=$(cat "$wait_pid_file")
  while kill -0 "$pid" 2>/dev/null; do
    echo "[chain_r5] training pid $pid still running ($(date -u +%H:%M:%S))"
    sleep 60
  done
fi

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

echo "[chain_r5] waiting for chip ($(date -u +%H:%M:%S))"
deadline=$((SECONDS + 10800))
until probe; do
  if [ $SECONDS -ge $deadline ]; then
    echo "[chain_r5] chip never came back; giving up"
    exit 1
  fi
  sleep 60
done

echo "[chain_r5] step 1: qa_sheet --local-lm ($(date -u +%H:%M:%S))"
ORAG_LOCAL_LM_CKPT=/root/repo/checkpoints/grounded_r5 \
  timeout 3600 python -m optimized_rag_tpu.eval.qa_sheet --local-lm \
  --json docs/results_r5/qa_local_lm.json \
  2>&1 | tail -40

echo "[chain_r5] step 2: encoder gauntlet baseline ($(date -u +%H:%M:%S))"
timeout 2400 python -m optimized_rag_tpu.eval.encoder_gauntlet \
  --json docs/results_r5/gauntlet.json 2>&1 | tail -15

echo "[chain_r5] step 3: xl3 cross-lingual retrain ($(date -u +%H:%M:%S))"
timeout 7200 python benchmarks/retrain_biencoder_xl3.py --swap \
  --json docs/results_r5/xl3.json 2>&1 | tail -25

echo "[chain_r5] step 4: gauntlet on xl3 + no-translation QA ($(date -u +%H:%M:%S))"
timeout 2400 python -m optimized_rag_tpu.eval.encoder_gauntlet \
  --json docs/results_r5/gauntlet_xl3.json 2>&1 | tail -8
timeout 5400 python -m optimized_rag_tpu.eval.qa_sheet --no-translation-xl \
  --json docs/results_r5/qa_full.json 2>&1 | tail -45

echo "[chain_r5] step 5: bench.py validation ($(date -u +%H:%M:%S))"
ORAG_BENCH_DEADLINE_S=3000 ORAG_BENCH_PROBE_BUDGET_S=900 \
  timeout 3200 python bench.py > docs/results_r5/bench_validation.json \
  2> docs/results_r5/bench_validation.log
tail -5 docs/results_r5/bench_validation.log
cat docs/results_r5/bench_validation.json

echo "[chain_r5] done ($(date -u +%H:%M:%S))"
