#!/bin/bash
# Tenth real-chip agenda (round 3): clean A/Bs after the working-tree
# races of agenda9 — interp slice vs matmul, unrolled jspeech, default
# bench variance.
#   nohup bash perf/tpu_agenda10.sh > /tmp/tpu_agenda10.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== gate $(date +%H:%M:%S)"
ok=0
for attempt in $(seq 1 ${AGENDA_GATE_TRIES:-12}); do
    if PERF_TIMEOUT_S=600 python perf/tpu_warm.py; then ok=1; break; fi
    echo "gate attempt $attempt failed $(date +%H:%M:%S); retrying"
    sleep 120
done
[ "$ok" = 1 ] || { echo "AGENDA10 ABORT: TPU not answering"; exit 1; }

echo "=== back-half interp A/B (slice default vs matmul) $(date +%H:%M:%S)"
PERF_ONLY=step python perf/fused_breakdown.py
TETRAEAR_BH_INTERP=matmul PERF_ONLY=step python perf/fused_breakdown.py

echo "=== voice chain ladder C=4096 (unrolled jspeech) $(date +%H:%M:%S)"
PERF_CARRIERS=4096 python perf/voice_chain_probe.py

echo "=== voice C=10240 (unrolled) $(date +%H:%M:%S)"
BENCH_MODE=voice BENCH_TIMEOUT_S=2400 python bench.py

echo "=== default bench x2 (variance) $(date +%H:%M:%S)"
BENCH_TIMEOUT_S=2400 python bench.py
BENCH_TIMEOUT_S=2400 python bench.py

echo "=== agenda10 done $(date +%H:%M:%S)"
