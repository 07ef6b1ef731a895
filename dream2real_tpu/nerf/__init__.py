"""TPU-native Instant-NGP-class NeRF backend.

Replaces the reference's `pyngp` C++/CUDA engine (reference
reconstruction/train_ngp.py, reconstruction/ngp_visual_model.py,
reconstruction/combined_rendering.py; API surface catalogued in SURVEY.md
§2b.1) with a JAX/XLA implementation:

- :mod:`dream2real_tpu.nerf.hashgrid` — multiresolution hash-grid encoding
- :mod:`dream2real_tpu.nerf.model` — fused density/color MLPs + SH directions
- :mod:`dream2real_tpu.nerf.render` — hierarchical ray marcher / compositor
- :mod:`dream2real_tpu.nerf.trainer` — training loop with learnable per-image
  extrinsics and the reference's dynamic-time-extension convergence governor
- :mod:`dream2real_tpu.nerf.snapshot` — snapshot save/load (replaces `.ingp`)
- :mod:`dream2real_tpu.nerf.combined` — batched fg/bg combined renderer
  (replaces the per-pose Python loop at combined_rendering.py:117-155 with one
  vmapped, device-sharded program)
"""

from dream2real_tpu.nerf.model import NGPConfig, init_ngp_params  # noqa: F401
