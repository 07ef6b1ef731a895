#!/bin/bash
# Round-4 follow-up TPU session — run AFTER r4_tpu_session.sh, informed by
# its data. Second-wave perf levers toward the 4.3x single-chip gate:
#  - fg_crop trimming (quadratic march-work lever; needs its own oracle gate)
#  - best-combination bench repeats ahead of any default flip
#  - AOT memory analysis of the full-shape per-device program (VERDICT weak
#    #3 evidence)
# Edit the FG_CROP / combo lines per r4_tpu_session results before running.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/results
LOG=experiments/results/r4_followup.log
: > "$LOG"
run() {
  echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
  timeout 3000 "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

run python experiments/mem_analysis.py experiments/results/mem_analysis.json

# fg_crop trimming: march work scales with fg_crop^2 (128 -> 112 = -23%).
run env D2R_BENCH_FG_CROP=112 python bench.py
run env D2R_BENCH_FG_CROP=96 python bench.py

# candidate new default stack (edit per session-1 data), bench x2 + the
# oracle quality gates at the SAME operating point (fresh dirs: fg_crop
# affects cached renders).
COMBO="D2R_ATTN_FUSED_LN=1 D2R_CROP_SAMPLES=24 D2R_FG_CROP=112"
run env $COMBO D2R_BENCH_FG_CROP=112 python bench.py
run env $COMBO D2R_BENCH_FG_CROP=112 python bench.py
run env $COMBO python experiments/validate_synth_argmax.py /tmp/d2r_val_combo
run env $COMBO python experiments/validate_synth_argmax.py /tmp/d2r_val_combo_rect --rect

echo "FOLLOWUP DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
