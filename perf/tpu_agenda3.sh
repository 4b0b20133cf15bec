#!/bin/bash
# Third real-chip agenda: the sparse hit-fetch A/B (fleet decode
# wall-clock, dense verdict planes vs packed top-K hit keys) plus the
# streaming-pipeline spot check.  Run AFTER tpu_agenda2.sh finishes
# (one client at a time on the relay):
#   nohup bash perf/tpu_agenda3.sh > /tmp/tpu_agenda3.log 2>&1 &
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
[ "$ok" = 1 ] || { echo "AGENDA3 ABORT: TPU not answering"; exit 1; }

echo "=== fleet decode A/B dense vs sparse C=10240 $(date +%H:%M:%S)"
PERF_MODE=both python perf/fleet_decode_probe.py

echo "=== fleet decode A/B at C=2048 $(date +%H:%M:%S)"
PERF_CARRIERS=2048 PERF_MODE=both python perf/fleet_decode_probe.py

echo "=== fleet decode A/B with soft planes (voice fleets) $(date +%H:%M:%S)"
PERF_SOFT=1 PERF_MODE=both python perf/fleet_decode_probe.py

echo "=== agenda3 done $(date +%H:%M:%S)"
