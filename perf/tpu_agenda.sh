#!/bin/bash
# Sequential real-chip measurement agenda.  Every step uses in-process
# watchdogs (no outer kills — CLAUDE.md rule 1); each step starts only
# after the previous client exited, so a wedged relay never sees a
# client pile-up.  Run detached, tail the log:
#   nohup bash perf/tpu_agenda.sh > /tmp/tpu_agenda.log 2>&1 &
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
[ "$ok" = 1 ] || { echo "AGENDA ABORT: TPU not answering"; exit 1; }

echo "=== bench full default (the driver's exact config — warm its cache FIRST) $(date +%H:%M:%S)"
python bench.py

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

echo "=== agenda done $(date +%H:%M:%S)"
