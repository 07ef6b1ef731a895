#!/bin/bash
# Round-4 TPU measurement session.
# Produces experiments/results/r4_tpu_session.log with:
#  - bench.py repeats: default vs D2R_ATTN_FUSED_LN=1 (r3 showed +1.6%; flip
#    the default if it holds across repeats) and the crop-sample /
#    render-batch tuning knobs
#  - oracle validation: xyz (trainer-refactor regression gate), rect 6-DoF
#    (+ denser --res 25 grid for the smoothing rank-fidelity study),
#    and --distort (Brown-Conrady end-to-end)
#  - extrinsics approximate-vs-exact A/B at 1/5/10 deg init error
#  - reference-scale 70k-pose run through the production optimise_pose_grid
#    (slab/pending/writer machinery), with artifact streaming on
# Each python entry point health-gates internally (utils/health.py).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/results
LOG=experiments/results/r4_tpu_session.log
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

# 1. end-to-end bench: default x3 vs fused-LN x3 (decide the default), then
#    the tuning knobs one at a time.
run python bench.py
run python bench.py
run python bench.py
run env D2R_ATTN_FUSED_LN=1 python bench.py
run env D2R_ATTN_FUSED_LN=1 python bench.py
run env D2R_ATTN_FUSED_LN=1 python bench.py
run env D2R_CROP_SAMPLES=24 python bench.py
run env D2R_CROP_SAMPLES=28 python bench.py
run env D2R_RENDER_BATCH=8 python bench.py
run env D2R_RENDER_BATCH=2 python bench.py
# combined candidate default (individual winners may compose):
run env D2R_ATTN_FUSED_LN=1 D2R_CROP_SAMPLES=24 python bench.py
run env D2R_ATTN_FUSED_LN=1 D2R_CROP_SAMPLES=24 python bench.py

# 2. oracle validation gates (regression for the trainer/mesh refactor,
#    smoothing study, distortion end-to-end).
run python experiments/validate_synth_argmax.py /tmp/d2r_val_xyz
run python experiments/validate_synth_argmax.py /tmp/d2r_val_rect --rect --ablate
run python experiments/validate_synth_argmax.py /tmp/d2r_val_rect25 --rect --res 25
run python experiments/validate_synth_argmax.py /tmp/d2r_val_dist --distort
# quality gate for the march-trim candidate default (24 uniform samples):
run env D2R_CROP_SAMPLES=24 python experiments/validate_synth_argmax.py /tmp/d2r_val_cs24

# 3. extrinsics gradient A/B at 1/5/10 deg init error (6 trainings).
run python experiments/extr_grad_ab.py 4000 experiments/results/extr_grad_ab.json

# 4. reference-scale 70k through production optimise_pose_grid: first the
#    demo-default fused no-artifact path (proves slab/pending machinery even
#    if the writer variant times out), then with the cb_render writer thread
#    streaming ~24 GB of PNGs (D2H over the tunnel is the risk, hence 2nd).
run python experiments/run_refscale.py experiments/results/refscale_70k.json
run env D2R_REFSCALE_SAVE=1 python experiments/run_refscale.py experiments/results/refscale_70k_save.json

echo "SESSION DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
