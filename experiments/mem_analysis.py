"""AOT per-device HBM footprint of the full-shape imagine-and-score program.

VERDICT r3 weak #3 asked for evidence of the per-device memory behavior of
the REAL-shape program (336-px crop render + CLIP ViT-L/14-336, clip_batch
32, 256-pose dispatch) under the data-parallel mesh. Under pure pose-batch DP
the per-device executable is identical to the single-chip program (only a
few-KB score all-gather differs), so compiling it on the one real v5e chip
and reading XLA's memory analysis IS the per-device footprint.

This script AOT-lowers + compiles the exact bench.py program (no training,
no execution — random weights have the same footprint) and prints
`compiled.memory_analysis()`: argument/output/temp/generated-code bytes.
Gate: temp+args must fit comfortably in v5e HBM (16 GB).

Usage: python experiments/mem_analysis.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dream2real_tpu.utils.health import wait_tpu_healthy


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    wait_tpu_healthy(1800.0)
    import jax
    import jax.numpy as jnp

    from dream2real_tpu.clip.model import CLIPConfig, init_clip_params
    from dream2real_tpu.data import synth
    from dream2real_tpu.nerf.combined import BackgroundView
    from dream2real_tpu.nerf.model import NGPConfig, init_ngp_params
    from dream2real_tpu.nerf.render import RenderSettings
    from dream2real_tpu.ops import cameras
    from dream2real_tpu.parallel.imagine import make_imagine_and_score

    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    res = 336
    scene = synth.default_scene()
    f = 0.9 * res
    K = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]])
    ngp_cfg = NGPConfig(aabb_min=(0.0, -0.6, -0.1), aabb_max=(1.1, 0.6, 0.9))
    settings = RenderSettings(n_coarse=32, n_fine=32, near=0.05, far=2.0)
    dirs_cam = cameras.pixel_dirs(res, res, jnp.asarray(K))
    fg_params = init_ngp_params(jax.random.PRNGKey(0), ngp_cfg)

    clip_cfg = CLIPConfig()
    clip_params = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    txt_emb = jnp.zeros((2, clip_cfg.projection_dim), jnp.float32)

    b0 = scene.boxes[0]
    pad = 0.03
    obj_aabb = (tuple(np.asarray(b0.lo) - pad), tuple(np.asarray(b0.hi) + pad))
    clip_batch = int(os.environ.get("D2R_BENCH_CLIP_BATCH", "32"))
    dispatch_poses = int(os.environ.get("D2R_BENCH_DISPATCH", "256"))
    score_fn = make_imagine_and_score(
        ngp_cfg, clip_cfg, settings, dirs_cam, n_norm_captions=1,
        clip_batch=clip_batch, obj_aabb=obj_aabb,
        fg_crop=int(os.environ.get("D2R_BENCH_FG_CROP", "128")),
        intrinsics=K,
    )
    T_WO = jnp.eye(4)
    T_WC = jnp.asarray(
        synth.orbit_poses(scene.centre, 1, radius=0.5, height=0.4)[0]
        .astype(np.float32))
    bg = BackgroundView(
        rgb=jnp.zeros((res, res, 3)), alpha=jnp.ones((res, res)),
        depth=jnp.ones((res, res)))
    poses = jnp.tile(jnp.eye(4)[None], (dispatch_poses, 1, 1))

    t0 = time.time()
    lowered = score_fn.lower(fg_params, clip_params, T_WO, T_WC, bg,
                             txt_emb, poses)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    out = {
        "dispatch_poses": dispatch_poses,
        "clip_batch": clip_batch,
        "compile_s": round(time.time() - t0, 1),
        "argument_mb": round(mem.argument_size_in_bytes / 2**20, 1),
        "output_mb": round(mem.output_size_in_bytes / 2**20, 1),
        "temp_mb": round(mem.temp_size_in_bytes / 2**20, 1),
        "code_mb": round(mem.generated_code_size_in_bytes / 2**20, 1),
        "alias_mb": round(mem.alias_size_in_bytes / 2**20, 1),
        "total_mb": round(
            (mem.argument_size_in_bytes + mem.output_size_in_bytes
             + mem.temp_size_in_bytes + mem.generated_code_size_in_bytes)
            / 2**20, 1),
        "hbm_gb": 16,
    }
    print(json.dumps(out), flush=True)
    assert out["total_mb"] < 14 * 1024, out
    if out_path:
        json.dump(out, open(out_path, "w"), indent=1)
        print(f"# wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
