#!/bin/bash
# Round-4 confirm session — after the default flips (D2R_ATTN_FUSED_LN=1,
# D2R_CROP_SAMPLES=24) and the save_renders writer-backlog fix:
#  A. bench x3 at the NEW defaults (BENCH_r04 protocol: fg_crop=128, 512
#     poses) — expect ~250 poses/s (r4_tpu_session.log combo runs).
#  B. CS=20 probe: bench x2 + both oracle gates. Flip only if gates pass
#     AND the bench gains hold.
#  C. refscale save_renders rerun with the backlog fix (the first attempt
#     OOMed; see PERF.md round-4 section).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/results
LOG=experiments/results/r4_confirm.log
: > "$LOG"
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

# --- A: new defaults, 3 repeats ---
run python bench.py
run python bench.py
run python bench.py

# --- B: CS=20 probe ---
run env D2R_CROP_SAMPLES=20 python bench.py
run env D2R_CROP_SAMPLES=20 python bench.py
run env D2R_CROP_SAMPLES=20 python experiments/validate_synth_argmax.py /tmp/d2r_val_cs20
run env D2R_CROP_SAMPLES=20 python experiments/validate_synth_argmax.py /tmp/d2r_val_cs20_rect --rect

# --- C: save_renders at reference scale, post-fix ---
run env D2R_REFSCALE_SAVE=1 python experiments/run_refscale.py experiments/results/refscale_70k_save.json

echo "CONFIRM DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
