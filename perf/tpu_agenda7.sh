#!/bin/bash
# Seventh real-chip agenda (round 3): localize the fused back-half cost.
#   1. HBM streaming bandwidth calibration (roofline model term)
#   2. bench.py default — now fft2p-default + voice in both-mode
#   3. full fused_breakdown (fft2p default-on path)
#   4. back-half ablation ladder (TETRAEAR_BH_ABLATE) + group sweep
#   nohup bash perf/tpu_agenda7.sh > /tmp/tpu_agenda7.log 2>&1 &
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
[ "$ok" = 1 ] || { echo "AGENDA7 ABORT: TPU not answering"; exit 1; }

echo "=== hbm bandwidth probe $(date +%H:%M:%S)"
PERF_MB=1024 PERF_STEPS=16 python perf/hbm_bw_probe.py

echo "=== bench default (fft2p on, voice in both) $(date +%H:%M:%S)"
BENCH_TIMEOUT_S=2400 python bench.py

echo "=== fused breakdown (fft2p default) $(date +%H:%M:%S)"
python perf/fused_breakdown.py

echo "=== back-half ablation ladder $(date +%H:%M:%S)"
for ab in none nocorr nosplice noW nopc hp place scan; do
    echo "--- ablate=$ab $(date +%H:%M:%S)"
    env=""
    [ "$ab" != none ] && export TETRAEAR_BH_ABLATE="$ab"
    PERF_ONLY=step python perf/fused_breakdown.py
    unset TETRAEAR_BH_ABLATE
done

echo "=== back-half group sweep (with fft2p) $(date +%H:%M:%S)"
for g in 16 32; do
    echo "--- BH_GROUP=$g $(date +%H:%M:%S)"
    TETRAEAR_BH_GROUP=$g PERF_ONLY=step python perf/fused_breakdown.py
done

echo "=== agenda7 done $(date +%H:%M:%S)"
