#!/bin/bash
# Sixth real-chip agenda: re-runs after the agenda5 fixes —
# the s-major band_synth layout (FFTSEG=8 OOMed on lane padding) and
# the fleet probe's sample-rate family (choose_decim rejected 25k*C).
# Plus an FFT6 repeat: agenda5 measured 22,181 vs default 21,906
# (+1.3%), inside plausible run-to-run variance — confirm before
# flipping any default.
#   nohup bash perf/tpu_agenda6.sh > /tmp/tpu_agenda6.log 2>&1 &
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
[ "$ok" = 1 ] || { echo "AGENDA6 ABORT: TPU not answering"; exit 1; }

echo "=== bench e2e FFTSEG=8 (s-major layout) $(date +%H:%M:%S)"
TETRAEAR_FFTSEG=8 BENCH_MODE=e2e python bench.py

echo "=== fleet decode A/B dense vs sparse C=10240 $(date +%H:%M:%S)"
PERF_MODE=both python perf/fleet_decode_probe.py

echo "=== fleet decode A/B with soft planes (voice fleets) $(date +%H:%M:%S)"
PERF_SOFT=1 PERF_MODE=both python perf/fleet_decode_probe.py

echo "=== bench e2e default repeat (variance ref) $(date +%H:%M:%S)"
BENCH_MODE=e2e python bench.py

echo "=== bench e2e FFT6 repeat $(date +%H:%M:%S)"
TETRAEAR_FFT6=1 BENCH_MODE=e2e python bench.py

echo "=== bench e2e FFTSEG=8 repeat $(date +%H:%M:%S)"
TETRAEAR_FFTSEG=8 BENCH_MODE=e2e python bench.py

echo "=== agenda6 done $(date +%H:%M:%S)"
