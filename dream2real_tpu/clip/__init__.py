"""Batched JAX CLIP (ViT image tower + text tower) for render scoring.

Replaces the reference's HF PyTorch CLIPModel on the hot path (reference
clip_scoring.py:150-185, hot loop #5 in SURVEY.md §3.1). The image tower runs
as one batched, bf16, pjit-shardable program fused behind the combined
renderer — no disk round-trip, no CPU<->GPU ping-pong, no model residency
hand-off (the reference frees the NeRFs to fit CLIP in 24GB,
clip_scoring.py:143; v5e HBM fits both).
"""

from dream2real_tpu.clip.model import CLIPConfig, init_clip_params  # noqa: F401
