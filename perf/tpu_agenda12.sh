#!/bin/bash
# Round-4 A/B ladder: band_synth h1-resident table, fft2p matmul
# precision, and the post-batching back-half / fft2p ablation refresh.
# Each config is an isolated subprocess (a TPU worker crash in one must
# not corrupt the rest); results land in perf/out_agenda12/.
# Run AFTER perf/agenda.py run-all (serial chip access through the
# relay): PYTHONPATH=/root/repo:/root/.axon_site bash perf/tpu_agenda12.sh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=perf/out_agenda12
mkdir -p "$OUT"

echo "=== liveness gate $(date -u +%H:%M:%S)"
ok=0
for attempt in $(seq 1 ${AGENDA_GATE_TRIES:-12}); do
    if PERF_TIMEOUT_S=600 python perf/tpu_warm.py; then ok=1; break; fi
    echo "gate attempt $attempt failed $(date -u +%H:%M:%S); retrying"
    sleep 120
done
[ "$ok" = 1 ] || { echo "AGENDA12 ABORT: TPU not answering"; exit 1; }

run() { # name, env pairs..., -- script args...
  local name="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $name $(date -u +%H:%M:%S)"
  env "${envs[@]}" python "$@" > "$OUT/$name.log" 2>&1
  echo "--- rc=$? $(grep -h '^{' "$OUT/$name.log" | tail -1)"
}

# 1. band_synth h1-resident VMEM table (vs per-carrier HBM DMA)
run h1vmem_synth TETRAEAR_BS_H1VMEM=1 PERF_ONLY=planes2p,synth,step \
    -- perf/fused_breakdown.py

# 2. fft2p precision HIGH (3-pass) vs HIGHEST (6-pass): accuracy first
run prec_high_acc TETRAEAR_FFT2P_PREC=high -- perf/fft2p_prec_probe.py
run prec_high_time TETRAEAR_FFT2P_PREC=high PERF_ONLY=planes2p,step \
    -- perf/fused_breakdown.py

# 3. back-half ablation refresh at HEAD (batched stage A)
for ab in nocorr noW nopc scan place; do
  run bh_$ab TETRAEAR_BH_ABLATE=$ab PERF_ONLY=step \
      -- perf/fused_breakdown.py
done

# 4. fft2p structural ablations (transposes / twiddle / precision)
for ab in noxpose noxpose2 notw hp; do
  run fft2p_$ab TETRAEAR_FFT2P_ABLATE=$ab PERF_ONLY=planes2p \
      -- perf/fused_breakdown.py
done

# 5. fft2p grid-block widths (the agenda11 sweep, never executed in
# round 3 — wider blocks lengthen the strided HBM runs)
for cfg in "256 128" "128 256" "256 256"; do
  set -- $cfg
  run fft2p_w${1}x${2} TETRAEAR_FFT2P_COLS=$1 TETRAEAR_FFT2P_ROWS2=$2 \
      PERF_ONLY=planes2p -- perf/fused_breakdown.py
done

echo "=== done $(date -u +%H:%M:%S)"
grep -h '^{' "$OUT"/*.log | tail -40
