"""Production-shape sharded slab on the virtual CPU mesh (VERDICT r4 weak #5).

Round 4 proved sharded == single-device bit-exact at TOY shapes (112 px tiny
ViT, tests/test_pipeline.py) and covered the production 336 px ViT-L program
only by AOT memory analysis. This experiment EXECUTES one production-shape
slab sharded over n=2 virtual CPU devices — full ViT-L/14-336 widths, the
flagship freq-MLP field, 128 px crop fast path, clip_batch 32, 64-pose slab
(the per-device quantum) — and compares per-pose scores against the
single-device program on the same inputs.

This is the strongest multi-chip proxy available without TPU slice hardware:
the same shard_map program the TPU mesh runs (parallel/imagine.py), at the
real shapes, actually executing (not just compiling). Slow on the 1-core
host (~tens of minutes): run as a banked experiment, not a test.

Usage: python experiments/sharded_slab_prodshape.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dream2real_tpu.clip.model import CLIPConfig, init_clip_params
from dream2real_tpu.nerf.combined import BackgroundView
from dream2real_tpu.nerf.model import NGPConfig, init_ngp_params
from dream2real_tpu.nerf.render import RenderSettings
from dream2real_tpu.ops import cameras
from dream2real_tpu.parallel import imagine
from dream2real_tpu.parallel.mesh import data_mesh


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "results", "sharded_slab_prodshape.json"
    )
    res = 336
    key = jax.random.PRNGKey(0)
    ngp_cfg = NGPConfig(aabb_min=(0.0, -0.6, -0.1), aabb_max=(1.1, 0.6, 0.9))
    fg_params = init_ngp_params(key, ngp_cfg)
    clip_cfg = CLIPConfig()  # stock ViT-L/14-336
    clip_params = init_clip_params(key, clip_cfg)
    settings = RenderSettings(n_coarse=32, n_fine=32, near=0.05, far=2.0)
    crop_settings = RenderSettings(
        n_coarse=int(os.environ.get("D2R_CROP_SAMPLES", "20")), n_fine=0,
        near=0.05, far=2.0,
    )
    f = 0.9 * res
    K = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]])
    dirs_cam = cameras.pixel_dirs(res, res, jnp.asarray(K))
    rng = np.random.default_rng(7)
    bg = BackgroundView(
        rgb=jnp.asarray(rng.uniform(size=(res, res, 3)).astype(np.float32)),
        alpha=jnp.ones((res, res)),
        depth=jnp.full((res, res), 0.9),
    )
    T_WC = jnp.asarray(np.array(
        [[1, 0, 0, 0.5], [0, -1, 0, 0.0], [0, 0, -1, 0.6], [0, 0, 0, 1]],
        np.float32,
    ))
    T_WO = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.5, 0.0, 0.05]))
    txt = jnp.asarray(rng.normal(size=(2, clip_cfg.projection_dim)), jnp.float32)
    obj_aabb = (np.array([0.42, -0.08, 0.0]), np.array([0.58, 0.08, 0.14]))
    kwargs = dict(
        n_norm_captions=1, clip_batch=32, obj_aabb=obj_aabb, fg_crop=128,
        crop_settings=crop_settings, intrinsics=jnp.asarray(K), row_chunk=56,
    )
    n_poses = 64  # one slab = n_dev * clip_batch (the per-device quantum)
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (n_poses, 1, 1))
    poses[:, 0, 3] = np.linspace(0.38, 0.62, n_poses)
    poses[:, 1, 3] = np.tile(np.linspace(-0.12, 0.12, 8), n_poses // 8)
    poses[:, 2, 3] = 0.06
    args = (fg_params, clip_params, T_WO, T_WC, bg, txt, jnp.asarray(poses))

    mesh = data_mesh(2)
    print(f"# devices: {jax.devices()}; mesh {mesh}", flush=True)
    sharded = imagine.make_imagine_and_score(
        ngp_cfg, clip_cfg, settings, dirs_cam, mesh=mesh, **kwargs
    )
    t0 = time.time()
    s2 = np.asarray(sharded(*args), np.float64)
    t_sharded = time.time() - t0
    print(f"# sharded slab executed: {t_sharded:.1f}s", flush=True)

    single = imagine.make_imagine_and_score(
        ngp_cfg, clip_cfg, settings, dirs_cam, **kwargs
    )
    t0 = time.time()
    s1 = np.asarray(single(*args), np.float64)
    t_single = time.time() - t0
    print(f"# single-device slab executed: {t_single:.1f}s", flush=True)

    rel = np.abs(s2 - s1) / np.maximum(np.abs(s1), 1e-12)
    out = {
        "n_poses": n_poses,
        "n_devices": 2,
        "res": res,
        "clip": "ViT-L/14-336 (full widths, random init)",
        "fg_crop": 128,
        "crop_samples": crop_settings.n_coarse,
        "max_abs_diff": float(np.abs(s2 - s1).max()),
        "max_rel_diff": float(rel.max()),
        "scores_finite": bool(np.isfinite(s2).all()),
        "scores_nonconstant": bool(np.std(s2) > 0),
        "wall_s_sharded": round(t_sharded, 1),
        "wall_s_single": round(t_single, 1),
    }
    print(json.dumps(out, indent=1), flush=True)
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"# wrote {out_path}")
    assert out["scores_finite"] and out["scores_nonconstant"], out
    assert out["max_rel_diff"] <= 1e-5, out  # same program, same rounding


if __name__ == "__main__":
    main()
