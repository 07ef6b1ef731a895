#!/bin/bash
# Round-4 TPU session RESUME — the host restarted mid r4_tpu_session.sh
# (log ends inside the D2R_RENDER_BATCH=2 run). This picks up from there and
# folds in the r4_followup.sh items so everything runs in one serialized
# pass. Results append to the same r4_tpu_session.log.
#
# Data already banked (r4_tpu_session.log lines 1-85):
#   default x3: 216.1 / 218.1 / 217.2          (mean 217.1)
#   FUSED_LN=1 x3: 223.8 / 225.0 / 224.5       (+3.3% — flip candidate)
#   CROP_SAMPLES=24: 241.9 (+11.4%)  CROP_SAMPLES=28: 226.3
#   RENDER_BATCH=8: 219.5 (neutral)
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/results
LOG=experiments/results/r4_tpu_session.log
echo "===== RESUME $(date -u +%H:%M:%S) after host restart =====" | tee -a "$LOG"
run() {
  echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
  timeout 3000 "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

for i in $(seq 1 24); do
  if python -c "
from dream2real_tpu.utils.health import wait_tpu_healthy
import sys; sys.exit(0 if wait_tpu_healthy(600.0) else 1)"; then
    echo "TPU healthy at $(date -u +%H:%M:%S) (round $i)" | tee -a "$LOG"
    break
  fi
  echo "still wedged at $(date -u +%H:%M:%S) (round $i)" | tee -a "$LOG"
done

# --- stage A: remaining benches (decide the new default stack) ---
run env D2R_RENDER_BATCH=2 python bench.py
run env D2R_ATTN_FUSED_LN=1 D2R_CROP_SAMPLES=24 python bench.py
run env D2R_ATTN_FUSED_LN=1 D2R_CROP_SAMPLES=24 python bench.py
# fg_crop trimming (march work ~ fg_crop^2; 128 -> 112 = -23% march px).
run env D2R_BENCH_FG_CROP=112 python bench.py
run env D2R_BENCH_FG_CROP=96 python bench.py
# full candidate stack x2:
run env D2R_ATTN_FUSED_LN=1 D2R_CROP_SAMPLES=24 D2R_BENCH_FG_CROP=112 python bench.py
run env D2R_ATTN_FUSED_LN=1 D2R_CROP_SAMPLES=24 D2R_BENCH_FG_CROP=112 python bench.py
# AOT per-device HBM footprint of the full-shape program (VERDICT weak #3).
run python experiments/mem_analysis.py experiments/results/mem_analysis.json

echo "STAGE_A_DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"

# --- stage B: oracle validation gates ---
run python experiments/validate_synth_argmax.py /tmp/d2r_val_xyz
run python experiments/validate_synth_argmax.py /tmp/d2r_val_rect --rect --ablate
run python experiments/validate_synth_argmax.py /tmp/d2r_val_rect25 --rect --res 25
run python experiments/validate_synth_argmax.py /tmp/d2r_val_dist --distort
# quality gates at the candidate-default operating point:
run env D2R_CROP_SAMPLES=24 python experiments/validate_synth_argmax.py /tmp/d2r_val_cs24
run env D2R_ATTN_FUSED_LN=1 D2R_CROP_SAMPLES=24 D2R_FG_CROP=112 \
    python experiments/validate_synth_argmax.py /tmp/d2r_val_combo
run env D2R_ATTN_FUSED_LN=1 D2R_CROP_SAMPLES=24 D2R_FG_CROP=112 \
    python experiments/validate_synth_argmax.py /tmp/d2r_val_combo_rect --rect

echo "STAGE_B_DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"

# --- stage C: extrinsics A/B at 1/5/10 deg + reference-scale 70k ---
run python experiments/extr_grad_ab.py 4000 experiments/results/extr_grad_ab.json
run python experiments/run_refscale.py experiments/results/refscale_70k.json
run env D2R_REFSCALE_SAVE=1 python experiments/run_refscale.py experiments/results/refscale_70k_save.json

echo "SESSION DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
