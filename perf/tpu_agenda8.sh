#!/bin/bash
# Eighth real-chip agenda (round 3):
#   1. HBM bandwidth probe (fixed fetch)
#   2. bank the e2e headline with fft2p default-on (voice opt-out)
#   3. bisect the voice-chain TPU worker crash by carrier count
#   4. fft2p ablation ladder (transposes / twiddle / precision)
#   nohup bash perf/tpu_agenda8.sh > /tmp/tpu_agenda8.log 2>&1 &
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
[ "$ok" = 1 ] || { echo "AGENDA8 ABORT: TPU not answering"; exit 1; }

echo "=== hbm bandwidth probe $(date +%H:%M:%S)"
PERF_MB=1024 PERF_STEPS=16 python perf/hbm_bw_probe.py

echo "=== bench e2e only (fft2p default, no voice) $(date +%H:%M:%S)"
BENCH_VOICE=0 BENCH_TIMEOUT_S=2400 python bench.py

echo "=== voice bisect $(date +%H:%M:%S)"
for c in 1024 4096 10240; do
    echo "--- BENCH_MODE=voice C=$c $(date +%H:%M:%S)"
    BENCH_MODE=voice BENCH_CARRIERS=$c BENCH_TIMEOUT_S=2400 python bench.py
done

echo "=== fft2p ablation ladder $(date +%H:%M:%S)"
for ab in none hp notw noxpose noxpose2 noxpose,noxpose2 \
          hp,notw,noxpose,noxpose2; do
    echo "--- fft2p ablate=$ab $(date +%H:%M:%S)"
    [ "$ab" != none ] && export TETRAEAR_FFT2P_ABLATE="$ab"
    PERF_ONLY=planes2p python perf/fused_breakdown.py
    unset TETRAEAR_FFT2P_ABLATE
done

echo "=== agenda8 done $(date +%H:%M:%S)"
