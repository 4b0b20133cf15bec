#!/bin/bash
# Follow-up real-chip measurement agenda (after perf/tpu_agenda.sh):
# the segmented-FFT frontend A/B plus any first-agenda steps that were
# lost to the relay wedge.  Same discipline: in-process watchdogs only,
# one client at a time, run detached:
#   nohup bash perf/tpu_agenda2.sh > /tmp/tpu_agenda2.log 2>&1 &
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
[ "$ok" = 1 ] || { echo "AGENDA2 ABORT: TPU not answering"; exit 1; }

echo "=== bench full default (driver's exact config FIRST) $(date +%H:%M:%S)"
python bench.py

echo "=== bench e2e FFTSEG=8 (segmented wideband FFT) $(date +%H:%M:%S)"
TETRAEAR_FFTSEG=8 BENCH_MODE=e2e python bench.py

echo "=== bench e2e FFTSEG=16 $(date +%H:%M:%S)"
TETRAEAR_FFTSEG=16 BENCH_MODE=e2e python bench.py

echo "=== bench e2e B (batched band synth) $(date +%H:%M:%S)"
TETRAEAR_BS_BATCHED=1 BENCH_MODE=e2e python bench.py

echo "=== bench e2e C (six-step FFT) $(date +%H:%M:%S)"
TETRAEAR_FFT6=1 BENCH_MODE=e2e python bench.py

echo "=== bench e2e D (natural_planes transpose kernel) $(date +%H:%M:%S)"
TETRAEAR_PALLAS_XPOSE=1 BENCH_MODE=e2e python bench.py

echo "=== fft4step probe $(date +%H:%M:%S)"
PERF_STEPS=4 python perf/fft4step_probe.py

echo "=== place probe $(date +%H:%M:%S)"
python perf/place_probe.py

echo "=== agenda2 done $(date +%H:%M:%S)"
