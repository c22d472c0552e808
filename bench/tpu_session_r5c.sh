#!/bin/bash
# Round-5c TPU session — run AFTER bench/tpu_session_r5b.sh: settle the
# f32 pruned-LLM panel outliers (0.62/1.77/10.8 ms across sparsity
# levels in the 14:14 capture vs flat 0.60 at 12:17 and flat 0.31 in
# the bf16 pass — same matrices, same geometry machinery, neighbouring
# kernels matching to 2%: transient-suspect).  One fresh f32 capture;
# the committed artifact keeps whichever pair of captures agrees.
#
# No kills/timeouts on TPU steps (tunnel-wedge discipline, CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5c_tpu_session.log}
echo "[$(date)] r5c TPU session runner started" | tee "$LOG"

python -m bench.await_tpu --budget 43200 --sleep 180 >> "$LOG" 2>&1 || {
  echo "[$(date)] tunnel never recovered within budget" | tee -a "$LOG"
  exit 1
}
echo "[$(date)] TUNNEL UP" >> "$LOG"

step() {
  echo "[$(date)] step: $*" >> "$LOG"
  "$@" 2>> "$LOG"
  local rc=$?
  # NB $? must be captured BEFORE any $(...) substitution — the
  # substitution's own exit status clobbers it (every rc= line logged by
  # earlier rounds' runbooks was vacuously 0; artifacts were verified
  # directly, but the logs lied)
  echo "[$(date)] rc=$rc" >> "$LOG"
  return $rc
}

# repo-resident output: the capture must survive a host reboot /tmp wipe
step python -m bench.pruned_llm --repeats 12 \
    > results/pruned_llm_f32_recheck.jsonl

# re-drive large_20000 bsr with the width-tiled vendor fallback: the
# last errored record in the corpus (persistent whole-width
# remote-compile 500) should now serve as bcoo_tiledN and splice green
step python -m bench.sweep_formats --repeats 5 --fresh --isolate \
    --dirs large_20000 --formats bsr --out /tmp/r5c_l20k.jsonl
# ... and refresh the only corpus groups swept before the densify
# variant landed (small_210 ran at 12:3x, the registry gained
# coo/bsr/ell densify at 12:5x) so every group reflects one engine rev
step python -m bench.sweep_formats --repeats 5 --fresh --isolate \
    --dirs small_210 --formats coo --out /tmp/r5c_s210.jsonl
cat /tmp/r5c_l20k.jsonl /tmp/r5c_s210.jsonl > /tmp/r5c_resweep.jsonl
step python -m bench.splice_sweep --into results/formats_full.jsonl \
    --part /tmp/r5c_resweep.jsonl > /tmp/r5c_splice.json

echo "[$(date)] r5c TPU session DONE" | tee -a "$LOG"
