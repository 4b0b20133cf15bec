#!/bin/bash
# Ninth real-chip agenda (round 3):
#   1. voice bisect with the gather-free jspeech
#   2. voice-chain stage ladder at C=4096
#   3. confirm the group-32 back-half default; band_synth group sweep
#   4. full default bench (e2e + voice) — BENCH_r03 preview
#   nohup bash perf/tpu_agenda9.sh > /tmp/tpu_agenda9.log 2>&1 &
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
[ "$ok" = 1 ] || { echo "AGENDA9 ABORT: TPU not answering"; exit 1; }

echo "=== voice bisect (gather-free jspeech) $(date +%H:%M:%S)"
for c in 1024 4096 10240; do
    echo "--- BENCH_MODE=voice C=$c $(date +%H:%M:%S)"
    BENCH_MODE=voice BENCH_CARRIERS=$c BENCH_TIMEOUT_S=2400 python bench.py
done

echo "=== voice chain stage ladder C=4096 $(date +%H:%M:%S)"
PERF_CARRIERS=4096 python perf/voice_chain_probe.py

echo "=== back-half step: fused vs split placement $(date +%H:%M:%S)"
PERF_ONLY=step python perf/fused_breakdown.py
TETRAEAR_BH_PLACE=split PERF_ONLY=step python perf/fused_breakdown.py

echo "=== band_synth group sweep $(date +%H:%M:%S)"
for g in 16 32; do
    echo "--- BS_GROUP=$g $(date +%H:%M:%S)"
    TETRAEAR_BS_GROUP=$g PERF_ONLY=synth python perf/fused_breakdown.py
done

echo "=== full default bench (BENCH_r03 preview) $(date +%H:%M:%S)"
BENCH_TIMEOUT_S=2400 python bench.py

echo "=== agenda9 done $(date +%H:%M:%S)"
