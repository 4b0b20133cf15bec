#!/bin/bash
# Fourth real-chip agenda: device speech-synthesis A/B
# (perf/jspeech_probe.py — batched jspeech decoder vs the host C
# thread-pool path) at several fleet batch sizes.  Run AFTER
# tpu_agenda3.sh finishes (one client at a time on the relay):
#   nohup bash perf/tpu_agenda4.sh > /tmp/tpu_agenda4.log 2>&1 &
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
[ "$ok" = 1 ] || { echo "AGENDA4 ABORT: TPU not answering"; exit 1; }

echo "=== device speech synthesis B=64,256,1024 $(date +%H:%M:%S)"
python perf/jspeech_probe.py

echo "=== larger fleets + longer calls $(date +%H:%M:%S)"
PERF_BATCHES=4096 PERF_FRAMES=4 PERF_ITERS=10 python perf/jspeech_probe.py

echo "=== agenda4 done $(date +%H:%M:%S)"
