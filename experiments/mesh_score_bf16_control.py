"""Control experiment: is the sharded-vs-single score difference bf16 rounding?

The engine-level mesh pipeline test observed ~0.8% relative per-pose score
differences between the 8-device and single-device fused score programs on
the CPU test mesh (same NeRF params, same poses). Hypothesis: the CLIP tower
runs in bf16 (clip/model.py) and XLA truncates to bf16 at different fusion
boundaries in the shard_map vs plain program, so rounding differs; the
plumbing (pose->score mapping, padding, gather) is exact.

This builds the PIPELINE-shaped program (crop fast path: obj_aabb + fg_crop +
crop_settings, 112 px ViT like tests/test_pipeline.py's tiny CLIP) and
compares sharded vs single scores twice: stock bf16, then with encode_image
forced to f32. bf16-rounding hypothesis predicts: f32 diff collapses by
orders of magnitude.

Run on the CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python experiments/mesh_score_bf16_control.py
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dream2real_tpu.clip import model as clip_model
from dream2real_tpu.clip.model import CLIPConfig, init_clip_params
from dream2real_tpu.nerf.combined import BackgroundView
from dream2real_tpu.nerf.model import NGPConfig, init_ngp_params
from dream2real_tpu.nerf.render import RenderSettings
from dream2real_tpu.ops import cameras
from dream2real_tpu.parallel import imagine
from dream2real_tpu.parallel.mesh import data_mesh


def build(res=112):
    key = jax.random.PRNGKey(3)
    ngp_cfg = NGPConfig(
        mlp_width=48, mlp_depth=3, skip_layer=2, posenc_deg=5,
        aabb_min=(0.0, -0.6, -0.1), aabb_max=(1.1, 0.6, 0.9),
    )
    fg_params = init_ngp_params(key, ngp_cfg)
    clip_cfg = CLIPConfig(
        image_size=res, patch_size=16, vision_width=48, vision_layers=2,
        vision_heads=4, text_width=48, text_layers=2, text_heads=4,
        projection_dim=32,
    )
    clip_params = init_clip_params(key, clip_cfg)
    settings = RenderSettings(n_coarse=16, n_fine=16, near=0.05, far=2.0)
    crop_settings = RenderSettings(n_coarse=24, n_fine=0, near=0.05, far=2.0)
    f = 0.9 * res
    K = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]])
    dirs_cam = cameras.pixel_dirs(res, res, jnp.asarray(K))
    bg = BackgroundView(
        rgb=jnp.zeros((res, res, 3)),
        alpha=jnp.ones((res, res)),
        depth=jnp.full((res, res), 1.0),
    )
    T_WC = jnp.asarray(np.array(
        [[1, 0, 0, 0.5], [0, -1, 0, 0.0], [0, 0, -1, 0.6], [0, 0, 0, 1]],
        np.float32,
    ))
    T_WO = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.5, 0.0, 0.05]))
    txt = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, clip_cfg.projection_dim)),
        jnp.float32,
    )
    obj_aabb = (np.array([0.45, -0.05, 0.0]), np.array([0.55, 0.05, 0.1]))
    kwargs = dict(
        n_norm_captions=1, clip_batch=2, obj_aabb=obj_aabb, fg_crop=48,
        crop_settings=crop_settings, intrinsics=jnp.asarray(K), row_chunk=56,
    )
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (32, 1, 1))
    poses[:, 0, 3] = np.linspace(0.35, 0.65, 32)
    poses[:, 1, 3] = np.tile(np.linspace(-0.1, 0.1, 8), 4)
    poses[:, 2, 3] = 0.05
    args = (fg_params, clip_params, T_WO, T_WC, bg, txt, jnp.asarray(poses))
    return ngp_cfg, clip_cfg, settings, dirs_cam, kwargs, args


def compare(tag):
    ngp_cfg, clip_cfg, settings, dirs_cam, kwargs, args = build()
    single = imagine.make_imagine_and_score(
        ngp_cfg, clip_cfg, settings, dirs_cam, **kwargs
    )
    sharded = imagine.make_imagine_and_score(
        ngp_cfg, clip_cfg, settings, dirs_cam, mesh=data_mesh(8), **kwargs
    )
    s1 = np.asarray(single(*args), np.float64)
    s8 = np.asarray(sharded(*args), np.float64)
    rel = np.abs(s8 - s1) / np.maximum(np.abs(s1), 1e-12)
    out = {
        "tag": tag,
        "max_abs": float(np.abs(s8 - s1).max()),
        "max_rel": float(rel.max()),
        "mean_rel": float(rel.mean()),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    res = [compare("bf16_stock")]
    orig = imagine.encode_image
    imagine.encode_image = functools.partial(
        clip_model.encode_image, dtype=jnp.float32
    )
    try:
        res.append(compare("clip_f32"))
    finally:
        imagine.encode_image = orig
    path = os.path.join(
        os.path.dirname(__file__), "results", "mesh_score_bf16_control.json"
    )
    json.dump(res, open(path, "w"), indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
