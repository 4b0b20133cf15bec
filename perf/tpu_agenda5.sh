#!/bin/bash
# Fifth real-chip agenda: prioritized union of the pending A/Bs
# (agenda2/3/4 were queued but never ran — the machine slice hosting
# their logs was recycled before a TPU window opened).  Ordered so the
# highest-value results land first if the window closes early:
#   1. full default bench (headline + warms the compile cache)
#   2. segmented-FFT frontend e2e A/B (FFTSEG=8/16)
#   3. sparse hit-fetch fleet A/B (dense planes vs packed top-K keys)
#   4. device speech-synthesis A/B
#   5. leftover agenda2 variants (band synth, six-step, transpose)
# Same discipline as the earlier agendas: in-process watchdogs only,
# one relay client at a time, run detached:
#   nohup bash perf/tpu_agenda5.sh > /tmp/tpu_agenda5.log 2>&1 &
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
[ "$ok" = 1 ] || { echo "AGENDA5 ABORT: TPU not answering"; exit 1; }

echo "=== bench full default (driver's exact config FIRST) $(date +%H:%M:%S)"
python bench.py

echo "=== bench e2e FFTSEG=8 (segmented wideband FFT) $(date +%H:%M:%S)"
TETRAEAR_FFTSEG=8 BENCH_MODE=e2e python bench.py

echo "=== fleet decode A/B dense vs sparse C=10240 $(date +%H:%M:%S)"
PERF_MODE=both python perf/fleet_decode_probe.py

echo "=== device speech synthesis B=64,256,1024 $(date +%H:%M:%S)"
python perf/jspeech_probe.py

echo "=== bench e2e FFTSEG=16 $(date +%H:%M:%S)"
TETRAEAR_FFTSEG=16 BENCH_MODE=e2e python bench.py

echo "=== fleet decode A/B with soft planes (voice fleets) $(date +%H:%M:%S)"
PERF_SOFT=1 PERF_MODE=both python perf/fleet_decode_probe.py

echo "=== fleet decode A/B at C=2048 $(date +%H:%M:%S)"
PERF_CARRIERS=2048 PERF_MODE=both python perf/fleet_decode_probe.py

echo "=== bench e2e B (batched band synth) $(date +%H:%M:%S)"
TETRAEAR_BS_BATCHED=1 BENCH_MODE=e2e python bench.py

echo "=== bench e2e C (six-step FFT) $(date +%H:%M:%S)"
TETRAEAR_FFT6=1 BENCH_MODE=e2e python bench.py

echo "=== bench e2e D (natural_planes transpose kernel) $(date +%H:%M:%S)"
TETRAEAR_PALLAS_XPOSE=1 BENCH_MODE=e2e python bench.py

echo "=== larger voice fleets + longer calls $(date +%H:%M:%S)"
PERF_BATCHES=4096 PERF_FRAMES=4 PERF_ITERS=10 python perf/jspeech_probe.py

echo "=== agenda5 done $(date +%H:%M:%S)"
