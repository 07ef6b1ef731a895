#!/bin/bash
# Round-4 confirm session RESUME — the first r4_confirm.sh run was cut off
# mid "CS=20 bench #2" (r4_confirm.log ends at 10:04:57 with no exit line).
# Completed before the cut: bench x3 at new defaults (249.9/247.7/248.0)
# and CS=20 bench #1 (262.6). This script re-runs the unfinished step and
# everything after it, appending to the same log, then runs the noisy-scan
# rehearsal (r4_noise_session.sh's payload) so one serialized TPU session
# covers the rest.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/results
LOG=experiments/results/r4_confirm.log
echo "=== RESUME $(date -u +%H:%M:%S) (prior run cut off mid CS=20 bench #2)" | tee -a "$LOG"
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

# --- B (rest): CS=20 probe ---
run env D2R_CROP_SAMPLES=20 python bench.py
run env D2R_CROP_SAMPLES=20 python experiments/validate_synth_argmax.py /tmp/d2r_val_cs20
run env D2R_CROP_SAMPLES=20 python experiments/validate_synth_argmax.py /tmp/d2r_val_cs20_rect --rect

# --- C: save_renders at reference scale, post-fix ---
run env D2R_REFSCALE_SAVE=1 python experiments/run_refscale.py experiments/results/refscale_70k_save.json

echo "CONFIRM DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"

# --- D: noisy-scan rehearsal (extrinsics opt ON against jittered poses) ---
NLOG=experiments/results/r4_noise_session.log
: > "$NLOG"
runn() {
  echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$NLOG"
  timeout 3000 "$@" >> "$NLOG" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" | tee -a "$NLOG"
}
runn python experiments/validate_synth_argmax.py /tmp/d2r_val_noise --noise
echo "NOISE SESSION DONE $(date -u +%H:%M:%S)" | tee -a "$NLOG"
