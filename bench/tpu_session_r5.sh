#!/bin/bash
# Round-5 TPU measurement session: land every artifact the round-4
# verdict flagged as missing (the committed r4b/r4c queues that never
# ran), highest-value first so a mid-session tunnel wedge costs the
# least:
#   1. chip verification of the round-5 code changes (CLI small_32x32)
#   2. weak-scaling stand-in, BOTH modes (BASELINE target #2's number)
#   3. pruned-LLM BSR bench, f32 + bf16 (the reference's motivating case)
#   4. k-slab staged-B on-chip drives (medium_2048 CSR k3, medium_1484 ELL k6)
#   5. sweep-group repair (small_210 csr/coo, large_20000 bsr) + medium
#      CSR/ELL refresh under the widened k-slab admission, spliced in
#   6. full bf16-ingested engine run of the headline dir
#   7. width scaling of the headline at 512/1024
#   8. bf16 sparsity-sweep generation (2-3 densities, appended)
#
# No kills/timeouts on TPU steps — killing a client mid-compile wedges
# the tunnel for hours (observed rounds 2 and 4).  await_tpu gates
# between phases so a wedge stalls the queue instead of poisoning it.
#
# Usage:  bash bench/tpu_session_r5.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5_tpu_session.log}
echo "[$(date)] r5 TPU session runner started" | tee "$LOG"

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
# 1. compile+verify every variant end-to-end on the chip with the
#    round-5 code (provenance fields, fits_vmem tile_k term, whole-B
#    grid-constant map), f32 then bf16-ingested
step python -m tpuspmm.cli --csr --coo --bsr --ell -d data/small_32x32 \
    --repeats 1 > /tmp/r5_cli_f32.out
step python -m tpuspmm.cli --csr --coo --bsr --ell -d data/small_32x32 \
    --repeats 1 --b-dtype bf16 > /tmp/r5_cli_bf16.out

# 2. single-chip weak-scaling stand-in, BOTH modes: replicated =
#    constant per-shard work (the BASELINE "replicated 8x" config),
#    strong = the shrinking-shard split curve
gate
step python -m bench.weak_scaling_standin --case large_25605 \
    --counts 1,2,4,8 --repeats 16 --mode replicated \
    > results/weak_scaling_standin.jsonl
step python -m bench.weak_scaling_standin --case large_25605 \
    --counts 1,2,4,8 --repeats 16 --mode strong \
    >> results/weak_scaling_standin.jsonl

# 3. pruned-LLM BSR bench (BASELINE.json config 4) on chip, both
#    activation dtypes
gate
step python -m bench.pruned_llm --repeats 12 > results/pruned_llm.jsonl
step python -m bench.pruned_llm --repeats 12 --b-dtype bf16 \
    >> results/pruned_llm.jsonl

# 4. k-slab staged-B on-chip verification where whole-B staging is
#    inadmissible (medium corpus)
gate
step python -m tpuspmm.cli --csr -d data/medium_2048 --kernel 3 \
    --repeats 2 > /tmp/r5_kslab_csr.out
step python -m tpuspmm.cli --ell -d data/medium_1484 --kernel 6 \
    --repeats 2 > /tmp/r5_kslab_ell.out

# 5. repair the transiently-faulted sweep groups and refresh the medium
#    CSR/ELL groups under the widened k-slab admission, then splice
gate
step python -m bench.sweep_formats --repeats 5 --fresh --isolate \
    --dirs small_210 --formats csr,coo --out /tmp/r5_part1.jsonl
step python -m bench.sweep_formats --repeats 5 --fresh --isolate \
    --dirs large_20000 --formats bsr --out /tmp/r5_part2.jsonl
step python -m bench.sweep_formats --repeats 5 --fresh --isolate \
    --dirs medium_1484,medium_2048,medium_2880,medium_4000,medium_4096 \
    --formats csr,ell --out /tmp/r5_part3.jsonl
cat /tmp/r5_part1.jsonl /tmp/r5_part2.jsonl /tmp/r5_part3.jsonl \
    > /tmp/r5_resweep.jsonl
step python -m bench.splice_sweep --into results/formats_full.jsonl \
    --part /tmp/r5_resweep.jsonl > /tmp/r5_splice.json

# 6. full engine run of the headline dir under bf16 ingestion: every
#    variant + vendor gated against the f64-of-bf16 oracle, bDtype tagged
gate
rm -f results/bf16_serving.jsonl
step python -m tpuspmm.cli --csr -d data/large_25605 --width 256 \
    --b-dtype bf16 --repeats 8 --out results/bf16_serving.jsonl

# 7. width scaling of the headline matrix: the reference sparsity sweep
#    used width 1024, the headline uses 256 — capture 512 and 1024
gate
step python -m bench.sweep_formats --dirs large_25605 --formats csr \
    --synth-b --width 512 --repeats 5 --fresh --isolate \
    --out results/width_scaling.jsonl
step python -m bench.sweep_formats --dirs large_25605 --formats csr \
    --synth-b --width 1024 --repeats 5 --isolate \
    --out results/width_scaling.jsonl

# 8. bf16 generation of the sparsity sweep at three densities, appended
#    to the committed artifact (records carry bDtype=bf16 + provenance,
#    summarize groups them separately)
gate
step python -m bench.sweep_sparsity --densities 0.3,0.6,0.9 \
    --formats csr,coo --repeats 5 --b-dtype bf16 \
    --out results/sparsity.jsonl

echo "[$(date)] r5 TPU session DONE" | tee -a "$LOG"
