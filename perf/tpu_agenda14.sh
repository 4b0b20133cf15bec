#!/bin/bash
# agenda14: fine-grained back-half residual attribution (round 4).
# step-chain timing with one stage ablated at a time (WRONG VALUES,
# timing only) — attributes the ~7 ms of back-half cost that the
# agenda12 ablations (scan/place/W/corr) left unexplained.
# Run AFTER the evidence bundle (chip must be free).
cd "$(dirname "$0")/.." || exit 1
OUT=perf/out_agenda14
mkdir -p $OUT
for ab in nointerp nodq notails noloopc; do
  PYTHONPATH=/root/repo:/root/.axon_site TETRAEAR_BH_ABLATE=$ab \
    PERF_ONLY=step PERF_TIMEOUT_S=2400 \
    python perf/fused_breakdown.py > $OUT/bh_$ab.log 2>&1
done
PYTHONPATH=/root/repo:/root/.axon_site PERF_ONLY=step PERF_TIMEOUT_S=2400 \
  python perf/fused_breakdown.py > $OUT/bh_base.log 2>&1
grep -H '"step"' $OUT/*.log
