#!/bin/bash
# Round-4c TPU measurement session — run AFTER bench/tpu_session_r4b.sh:
# the serving-mode and scaling artifacts that extend the corpus evidence:
# a full bf16-ingested engine run of the headline matrix, the pruned-LLM
# BSR bench on chip (f32 + bf16 activations), and width scaling of the
# headline matrix at the reference sweep's width.
#
# No kills/timeouts on TPU steps — killing a client mid-compile wedges
# the tunnel for hours.
#
# Usage:  bash bench/tpu_session_r4c.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4c_tpu_session.log}
echo "[$(date)] r4c TPU session runner started" | tee "$LOG"

python -m bench.await_tpu --budget 43200 --sleep 180 >> "$LOG" 2>&1 || {
  echo "[$(date)] tunnel never recovered within budget" | tee -a "$LOG"
  exit 1
}
echo "[$(date)] TUNNEL UP" | tee -a "$LOG"

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

# 0. k-slab staged-B on-chip verification (re-drive after the scoped-VMEM
#    admission fix: the first attempt OOM'd scoped vmem at slab_k 640)
step python -m tpuspmm.cli --csr -d data/medium_2048 --kernel 3 \
    --repeats 2 > /tmp/r4c_kslab.out
step python -m tpuspmm.cli --ell -d data/medium_1484 --kernel 6 \
    --repeats 2 > /tmp/r4c_kslab_ell.out

# 1. full engine run of the headline dir under bf16 ingestion: every
#    variant + vendor gated against the f64-of-bf16 oracle, bDtype tagged
rm -f results/bf16_serving.jsonl
step python -m tpuspmm.cli --csr -d data/large_25605 --width 256 \
    --b-dtype bf16 --repeats 8 --out results/bf16_serving.jsonl

# 2. pruned-LLM BSR bench (BASELINE.json config 4) on chip, both
#    activation dtypes
step python -m bench.pruned_llm --repeats 12 > results/pruned_llm.jsonl
step python -m bench.pruned_llm --repeats 12 --b-dtype bf16 \
    >> results/pruned_llm.jsonl

# 3. width scaling of the headline matrix: the reference sparsity sweep
#    used width 1024, the headline uses 256 — capture 512 and 1024
step python -m bench.sweep_formats --dirs large_25605 --formats csr \
    --synth-b --width 512 --repeats 5 --fresh --isolate \
    --out results/width_scaling.jsonl
step python -m bench.sweep_formats --dirs large_25605 --formats csr \
    --synth-b --width 1024 --repeats 5 --isolate \
    --out results/width_scaling.jsonl

echo "[$(date)] r4c TPU session DONE" | tee -a "$LOG"
