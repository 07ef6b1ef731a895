#!/usr/bin/env bash
# Install dream2real_tpu (parity surface: reference install.sh, minus the
# conda env / instant-ngp cmake build / dataset downloads — JAX wheels replace
# the CUDA toolchain and the synthetic dataset generator replaces the
# HuggingFace demo-data pulls for hermetic runs).
set -euo pipefail
cd "$(dirname "$0")"

echo "[1/3] Python package (editable)"
pip install -e . 2>/dev/null || echo "  (pip install skipped — add repo root to PYTHONPATH instead)"

echo "[2/3] Native runtime (PNG codec + dataset ingest)"
make -C dream2real_tpu/native || echo "  (native build failed — PIL fallback will be used)"

echo "[3/3] Smoke test"
python -m pytest tests/test_se3.py tests/test_native.py -q

cat <<'EONOTE'
Done. Optional external checkpoints (set env vars to local paths):
  D2R_CLIP_PATH   openai/clip-vit-large-patch14-336 (scoring)
  D2R_BLIP2_PATH  Salesforce/blip2-opt-2.7b-coco    (captioning)
Generate a demo dataset:  python -m dream2real_tpu.data.synth /tmp/scene
Run the demo:             python demo.py /tmp/scene /tmp/out configs/synth_demo.json "put the red box on the green box"
EONOTE
