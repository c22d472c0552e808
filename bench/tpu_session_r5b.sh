#!/bin/bash
# Round-5b TPU session — run AFTER bench/tpu_session_r5.sh: the profiler
# capture of the headline kernel (VERDICT r4 #6) and the headline
# recapture with provenance (VERDICT r4 #8).
#
# No kills/timeouts on TPU steps (tunnel-wedge discipline, CLAUDE.md).
#
# Usage:  bash bench/tpu_session_r5b.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5b_tpu_session.log}
echo "[$(date)] r5b TPU session runner started" | tee "$LOG"

gate() {
  python -m bench.await_tpu --budget 43200 --sleep 180 >> "$LOG" 2>&1 || {
    echo "[$(date)] tunnel never recovered within budget" | tee -a "$LOG"
    exit 1
  }
  echo "[$(date)] TUNNEL UP" >> "$LOG"
}

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

gate
# 0. re-run the pruned-LLM bench with the round-5 cached-densify
#    variant (BSR kernel 7) in the field — the first r5 capture predates
#    it, and uniformly-scattered 4x4 pruning is plan-dense, so the dense
#    MXU matmul on the cached densified operand should beat the 0.6 ms
#    panel serve several-fold
step python -m bench.pruned_llm --repeats 12 > results/pruned_llm.jsonl
step python -m bench.pruned_llm --repeats 12 --b-dtype bf16 \
    >> results/pruned_llm.jsonl
# ... and regenerate the sparsity artifact with the current engine in
#     one generation: the committed f32 records carry the pre-cache
#     densify times (per-call scatter) and no COO densify at all, and
#     the r5 queue's bf16 step appended to that stale base
step python -m bench.sweep_sparsity --formats csr,coo --repeats 5 \
    --fresh --out results/sparsity.jsonl
step python -m bench.sweep_sparsity --densities 0.3,0.6,0.9 \
    --formats csr,coo --repeats 5 --b-dtype bf16 \
    --out results/sparsity.jsonl

# 1. profiler trace of the served headline kernel (pallas_panel_split =
#    CSR kernel 8) on the headline matrix, then the occupancy summary
rm -rf /tmp/panel_trace
step python -m tpuspmm.cli --csr -d data/large_25605 --width 256 \
    --kernel 8 --repeats 16 --trace /tmp/panel_trace \
    > /tmp/r5b_trace_run.out
step python -m bench.trace_report /tmp/panel_trace \
    --out results/trace_report.json

# 2. headline recapture with geometry provenance (BENCH_r05 staging)
gate
step python bench.py > /tmp/r5b_bench.json
cp /tmp/r5b_bench.json results/bench_r5_capture.json

echo "[$(date)] r5b TPU session DONE" | tee -a "$LOG"
