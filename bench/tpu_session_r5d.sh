#!/bin/bash
# Round-5d TPU session: close the last corpus holes found by the r5
# review passes.
#   1. large_20000 bsr with the REWORKED width-tiled vendor fallback
#      (fori_loop + in-place slab accumulate: the first lax.map design
#      stacked reshaped copies of B and C and RESOURCE_EXHAUSTED).
#   2. small_210 bsr + ell — the only groups still at the pre-densify
#      engine rev (the r5c step refreshed coo, which the r5 queue had
#      already refreshed; bsr/ell were the ones missing kernel 7/8).
#   3. splice both into the corpus artifact ONLY when the sweeps
#      exited 0 — an unconditional splice could replace a green group
#      with a partial capture.
#
# No kills/timeouts on TPU steps (tunnel-wedge discipline, CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5d_tpu_session.log}
echo "[$(date)] r5d TPU session runner started" | tee "$LOG"

python -m bench.await_tpu --budget 43200 --sleep 180 >> "$LOG" 2>&1 || {
  echo "[$(date)] tunnel never recovered within budget" | tee -a "$LOG"
  exit 1
}
echo "[$(date)] TUNNEL UP" >> "$LOG"

step() {
  echo "[$(date)] step: $*" >> "$LOG"
  "$@" 2>> "$LOG"
  local rc=$?
  echo "[$(date)] rc=$rc" >> "$LOG"
  return $rc
}

ok=1
step python -m bench.sweep_formats --repeats 5 --fresh --isolate \
    --dirs large_20000 --formats bsr --out /tmp/r5d_l20k.jsonl || ok=0
step python -m bench.sweep_formats --repeats 5 --fresh --isolate \
    --dirs small_210 --formats bsr,ell --out /tmp/r5d_s210.jsonl || ok=0

if [ "$ok" = "1" ]; then
  cat /tmp/r5d_l20k.jsonl /tmp/r5d_s210.jsonl > /tmp/r5d_resweep.jsonl
  step python -m bench.splice_sweep --into results/formats_full.jsonl \
      --part /tmp/r5d_resweep.jsonl > /tmp/r5d_splice.json
else
  echo "[$(date)] sweeps failed — NOT splicing" | tee -a "$LOG"
fi

echo "[$(date)] r5d TPU session DONE" | tee -a "$LOG"
