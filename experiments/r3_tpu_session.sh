#!/bin/bash
# Round-3 TPU measurement session: run once the axon worker recovers.
# Produces experiments/results/r3_tpu_session.log with:
#  - verify drive (NGP selftest --small) for the attention/mlp refactor
#  - attention layer-level A/B (fused LN+qkv+attn vs split pipeline)
#  - march compaction A/B (production crop-render workload)
#  - end-to-end bench.py under each experimental gate combo
#  - extrinsics approximate-vs-exact gradient A/B
# Each python entry point health-gates internally (utils/health.py), so the
# script simply runs them in sequence; the wait burns wall-clock, not TPU.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/results
LOG=experiments/results/r3_tpu_session.log
: > "$LOG"
run() {
  echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

# Bounded wait for worker health before burning any entry point's internal
# budget (selftest has no gate of its own). Proceed anyway after ~4 h.
for i in $(seq 1 24); do
  if python -c "
from dream2real_tpu.utils.health import wait_tpu_healthy
import sys; sys.exit(0 if wait_tpu_healthy(600.0) else 1)"; then
    echo "TPU healthy at $(date -u +%H:%M:%S) (round $i)" | tee -a "$LOG"
    break
  fi
  echo "still wedged at $(date -u +%H:%M:%S) (round $i)" | tee -a "$LOG"
done

# 0. verify drive: exercises the refactored attention/mlp kernels end-to-end
#    (CLIP tower scoring inside the selftest) on the real TPU.
run python -m dream2real_tpu.cli.selftest --small
run python -m dream2real_tpu.cli.selftest --clip-load-dryrun

# 1. kernel-level A/Bs
run python experiments/bench_attention.py --layer-only
run python experiments/bench_march.py 64 5

# 2. end-to-end gate combos (512-pose default)
run python bench.py
run env D2R_ATTN_FUSED_LN=1 python bench.py
run env D2R_ATTN_FUSED_LN=2 python bench.py
run env D2R_MLP_FUSED=1 python bench.py
run env D2R_ATTN_FUSED_LN=2 D2R_MLP_FUSED=1 python bench.py
run env D2R_MARCH_COMPACT=1 python bench.py

# 3. extrinsics gradient quality A/B (longest: two 4000-step trainings)
run python experiments/extr_grad_ab.py 4000 experiments/results/extr_grad_ab.json

echo "SESSION DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
