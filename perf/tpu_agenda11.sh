#!/bin/bash
# Eleventh real-chip agenda (round 3): fft2p grid-block width sweep.
#   nohup bash perf/tpu_agenda11.sh > /tmp/tpu_agenda11.log 2>&1 &
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
[ "$ok" = 1 ] || { echo "AGENDA11 ABORT: TPU not answering"; exit 1; }

echo "=== fft2p block-width sweep $(date +%H:%M:%S)"
for cfg in "128 128" "256 128" "512 128" "128 256" "256 256" "512 512"; do
    set -- $cfg
    echo "--- COLS=$1 ROWS2=$2 $(date +%H:%M:%S)"
    TETRAEAR_FFT2P_COLS=$1 TETRAEAR_FFT2P_ROWS2=$2 \
        PERF_ONLY=planes2p python perf/fused_breakdown.py
done

echo "=== agenda11 done $(date +%H:%M:%S)"
