#!/bin/bash
# Round-3 on-device A/B batch: run as soon as the axon relay is healthy.
# Judges each variant by device-busy ms from analyze_trace.py (ab wall has
# ±3 ms relay noise — see CLAUDE.md measurement protocol). Serial on purpose:
# the remote compile queue is serial anyway, and killed clients leave jobs
# queued server-side.
#
# Usage: bash scripts/r3_ab.sh [outdir]   (default /tmp/r3_ab)
set -u
OUT=${1:-/tmp/r3_ab}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site

run_trace () {  # name, env pairs...
  local name=$1; shift
  echo "=== trace $name ($*) $(date +%H:%M:%S) ===" | tee -a "$OUT/log"
  rm -rf /tmp/jaxtrace
  env "$@" timeout 900 python scripts/trace_step.py \
      > "$OUT/trace_$name.out" 2>&1
  python scripts/analyze_trace.py /tmp/jaxtrace --n-fwd 2 \
      > "$OUT/analyze_$name.txt" 2>&1
  tail -25 "$OUT/analyze_$name.txt" | tee -a "$OUT/log"
}

# 1. attention MXU-lsum on (new default) vs off (r2 behavior)
run_trace mxu_lsum_on  IDMVTON_FLASH_MXU_LSUM=1
run_trace mxu_lsum_off IDMVTON_FLASH_MXU_LSUM=0

# 2. conv padded-acc formulation vs baseline taps (both with winning lsum)
run_trace padacc_on  IDMVTON_CONV_PADACC=1
# (baseline conv is the mxu_lsum_on trace above)

echo "=== full bench $(date +%H:%M:%S) ===" | tee -a "$OUT/log"
timeout 1500 python bench.py > "$OUT/bench.out" 2>&1
tail -5 "$OUT/bench.out" | tee -a "$OUT/log"
echo "done $(date +%H:%M:%S)" | tee -a "$OUT/log"
