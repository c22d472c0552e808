#!/bin/bash
# Round-4b TPU measurement session: the REMAINING on-chip queue after the
# main round-4 session (bench/tpu_session.sh) — transient-fault group
# repair, the widened k-slab staged-B records, weak-scaling stand-in in
# both modes, bf16-ingested serving, and the headline recapture.
#
# No kills/timeouts on TPU steps — killing a client mid-compile wedges
# the tunnel for hours (observed again this round: a 560 s timeout killed
# the stand-in mid-compile and the tunnel stayed dead for ~1 h).
#
# Usage:  bash bench/tpu_session_r4b.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4b_tpu_session.log}
echo "[$(date)] r4b TPU session runner started" | tee "$LOG"

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

# 1. compile+verify every variant end-to-end on the chip, f32 then the
#    bf16-ingested serving mode (gates vs the f64 oracle OF the bf16
#    values; records carry bDtype=bf16)
step python -m tpuspmm.cli --csr --coo --bsr --ell -d data/small_32x32 \
    --repeats 1 > /tmp/r4b_cli_f32.out
step python -m tpuspmm.cli --csr --coo --bsr --ell -d data/small_32x32 \
    --repeats 1 --b-dtype bf16 > /tmp/r4b_cli_bf16.out

# 2. k-slab staged-B on-chip verification where whole-B staging was
#    inadmissible (medium corpus): CSR kernel 3 on medium_2048
step python -m tpuspmm.cli --csr -d data/medium_2048 --kernel 3 \
    --repeats 2 > /tmp/r4b_kslab.out

# 3. repair the transiently-faulted sweep groups (small_210 csr/coo died
#    on a TPU UNAVAILABLE, large_20000 bsr's vendor on a remote-compile
#    500) and refresh the medium CSR/ELL groups where staged-B admission
#    widened — then splice the part file into the artifact
step python -m bench.sweep_formats --repeats 5 --fresh --isolate \
    --dirs small_210 --formats csr,coo --out /tmp/r4b_part1.jsonl
step python -m bench.sweep_formats --repeats 5 --fresh --isolate \
    --dirs large_20000 --formats bsr --out /tmp/r4b_part2.jsonl
step python -m bench.sweep_formats --repeats 5 --fresh --isolate \
    --dirs medium_1484,medium_2048,medium_2880,medium_4000,medium_4096 \
    --formats csr,ell --out /tmp/r4b_part3.jsonl
cat /tmp/r4b_part1.jsonl /tmp/r4b_part2.jsonl /tmp/r4b_part3.jsonl \
    > /tmp/r4b_resweep.jsonl
step python -m bench.splice_sweep --into results/formats_full.jsonl \
    --part /tmp/r4b_resweep.jsonl > /tmp/r4b_splice.json

# 4. single-chip weak-scaling stand-in, BOTH modes: replicated =
#    constant per-shard work (the BASELINE "replicated 8x" config),
#    strong = the shrinking-shard split curve
step python -m bench.weak_scaling_standin --case large_25605 \
    --counts 1,2,4,8 --repeats 16 --mode replicated \
    > results/weak_scaling_standin.jsonl
step python -m bench.weak_scaling_standin --case large_25605 \
    --counts 1,2,4,8 --repeats 16 --mode strong \
    >> results/weak_scaling_standin.jsonl

# 5. headline recapture (now also measures the bf16-ingested serving
#    field and records geometry provenance)
step python bench.py > /tmp/r4b_bench.json

echo "[$(date)] r4b TPU session DONE" | tee -a "$LOG"
