"""dream2real_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of Dream2Real.

Dream2Real (reference: /root/reference, FlyCole/Dream2Real, ICRA 2024) takes an
RGB-D scan of a scene plus a natural-language instruction, builds per-object
visual (NeRF) and physical (TSDF) models, then *imagines* thousands of candidate
placements of the movable object by re-rendering the scene with the object at
each pose and scoring each render with CLIP against an LLM-derived goal caption.

This package re-designs that pipeline TPU-first:

- the Instant-NGP CUDA backend (reference reconstruction/train_ngp.py) becomes a
  multiresolution hash-grid NeRF with a Pallas-accelerated encoder and an
  XLA-compiled hierarchical ray marcher (`dream2real_tpu.nerf`);
- the per-pose Python render loop (reference
  reconstruction/combined_rendering.py:117-155) becomes one vmapped, pjit-sharded
  imagine-and-score program (`dream2real_tpu.nerf.renderer`,
  `dream2real_tpu.scoring`);
- the sequential CPU PyBullet validity loop (reference
  vision_3d/physics_utils.py:308-370) becomes on-device batched SDF overlap
  tests (`dream2real_tpu.physics`);
- CLIP scoring (reference clip_scoring.py) runs as a batched JAX ViT
  (`dream2real_tpu.clip`);
- pose-batch data parallelism is expressed with `jax.sharding.Mesh` + ICI
  collectives (`dream2real_tpu.parallel`).
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA compilation cache (D2R_COMPILE_CACHE=0 disables).

    First-compile latency dominates small runs (~90-120 s of a 5-min demo);
    the cache round-trips on the axon TPU backend including pallas kernels
    (measured 2.2 s -> 0.4 s warm). Must run before the first compile, hence
    at package import. Default dir: ~/.cache/dream2real_tpu/xla."""
    import os

    if os.environ.get("D2R_COMPILE_CACHE", "1") != "1":
        return
    path = os.environ.get(
        "D2R_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "dream2real_tpu", "xla"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimisation; never block import


_enable_compilation_cache()

from dream2real_tpu.cfg import Config  # noqa: F401
