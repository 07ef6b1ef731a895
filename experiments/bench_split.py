"""Split-profile the fused imagine-and-score hot loop: render vs CLIP.

bench.py measures the fused program end-to-end (~265 poses/s at round-4
defaults). To find the NEXT lever this script times, at the same shapes and
dispatch protocol (256-pose dispatches, timed via D2H of an on-device
reduction per CLAUDE.md):

  A. full fused render+score      (the bench program)
  B. render-only                  (same cropped-march + composite scan,
                                   reduced to a scalar — no CLIP)
  C. CLIP-only                    (rot90 + preprocess + ViT-L encode + logits
                                   from PRERENDERED u8 frames)

A ~= B + C validates the split; the bigger of B/C is where the next round of
kernel work goes. Reference hot loops: combined_rendering.py:117-155 (render)
+ clip_scoring.py:167-185 (score).

Usage: python experiments/bench_split.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dream2real_tpu.utils.health import wait_tpu_healthy

    wait_tpu_healthy(1800.0)
    import jax
    import jax.numpy as jnp

    from dream2real_tpu.clip.model import (
        CLIPConfig, encode_image, init_clip_params, logits_per_image,
        preprocess_images,
    )
    from dream2real_tpu.clip.scorer import reduce_logits
    from dream2real_tpu.data import synth
    from dream2real_tpu.nerf.combined import (
        BackgroundView, background_only_image, render_pose_cropped,
    )
    from dream2real_tpu.nerf.model import NGPConfig
    from dream2real_tpu.nerf.render import RenderSettings, render_image
    from dream2real_tpu.nerf.trainer import (
        TrainConfig, init_train_state, make_train_chunk, train_with_governor,
    )
    from dream2real_tpu.ops import cameras
    from dream2real_tpu.parallel.imagine import make_imagine_and_score
    from dream2real_tpu.sampling import sample_poses_grid

    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)

    # ---- Same setup as bench.py (field fidelity irrelevant; density
    # distribution matters for the march's early-out behavior).
    res = 336
    scene = synth.default_scene()
    f = 0.9 * res
    K = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]])
    cams = synth.orbit_poses(scene.centre, 16, radius=0.5, height=0.4)
    rgbs, depths = [], []
    for i in range(len(cams)):
        rgb, depth, _ = synth.render_scene(scene, cams[i], K, res, res)
        rgbs.append(rgb), depths.append(depth)
    rgba = jnp.asarray(np.concatenate(
        [np.stack(rgbs), np.full((len(cams), res, res, 1), 255, np.uint8)], -1))
    ngp_cfg = NGPConfig(aabb_min=(0.0, -0.6, -0.1), aabb_max=(1.1, 0.6, 0.9))
    tc = TrainConfig(n_steps=int(os.environ.get("D2R_BENCH_TRAIN_STEPS", "600")),
                     batch_rays=8192, poll_steps=250,
                     dynamic_time_extension=False)
    settings = RenderSettings(n_coarse=32, n_fine=32, near=0.05, far=2.0)
    dirs_cam = cameras.pixel_dirs(res, res, jnp.asarray(K))
    state = init_train_state(ngp_cfg, tc, n_images=rgba.shape[0])
    chunk = make_train_chunk(ngp_cfg, tc, settings, rgba,
                             jnp.asarray(cams.astype(np.float32)), dirs_cam,
                             depths=jnp.asarray(np.stack(depths)))
    state, losses = train_with_governor(chunk, state, tc)
    fg_params = state["params"]["field"]
    print(f"# field trained: loss {losses[-1]:.5f}", file=sys.stderr, flush=True)

    T_WC = jnp.asarray(cams[0].astype(np.float32))
    bg_out = jax.jit(lambda p, T: render_image(
        p, ngp_cfg, T, dirs_cam, settings, row_chunk=56))(fg_params, T_WC)
    bg = BackgroundView(rgb=bg_out["rgb"], alpha=jnp.ones_like(bg_out["alpha"]),
                        depth=bg_out["depth"])

    clip_cfg = CLIPConfig()
    clip_params = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    txt_emb = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, clip_cfg.projection_dim)).astype(np.float32))
    clip_batch = int(os.environ.get("D2R_BENCH_CLIP_BATCH", "32"))
    b0 = scene.boxes[0]
    pad = 0.03
    obj_aabb = (tuple(np.asarray(b0.lo) - pad), tuple(np.asarray(b0.hi) + pad))
    fg_crop = int(os.environ.get("D2R_BENCH_FG_CROP", "128"))
    crop_settings = settings._replace(
        n_coarse=int(os.environ.get("D2R_CROP_SAMPLES", "20")), n_fine=0)

    T_WO = jnp.eye(4).at[:3, 3].set(jnp.asarray(list(scene.centre)))
    n_poses = int(os.environ.get("D2R_BENCH_POSES", "512"))
    n_poses = max(clip_batch, n_poses // clip_batch * clip_batch)
    grid = sample_poses_grid(scene.centre, [16, max(n_poses // 16, 1), 1, 1, 1, 1],
                             scene_type=3)
    poses = jnp.asarray(np.tile(np.asarray(grid).reshape(-1, 4, 4),
                                (max(1, n_poses // len(grid) + 1), 1, 1))[:n_poses])
    dispatch = int(os.environ.get("D2R_BENCH_DISPATCH", "256"))
    dispatch = max(clip_batch, dispatch // clip_batch * clip_batch)

    # ---- A: full fused (the bench program).
    score_fn = make_imagine_and_score(
        ngp_cfg, clip_cfg, settings, dirs_cam, n_norm_captions=1,
        clip_batch=clip_batch, obj_aabb=obj_aabb, fg_crop=fg_crop, intrinsics=K)

    def time_dispatches(fn, *args_per_dispatch):
        """Warm once, then time n_poses/dispatch launches, syncing via a D2H
        of each launch's scalar/array output (block_until_ready is a no-op
        on axon)."""
        outs = fn(*args_per_dispatch[0])
        _ = float(np.asarray(jax.tree.leaves(outs)[0]).sum())
        t0 = time.time()
        acc = 0.0
        for a in args_per_dispatch:
            outs = fn(*a)
            acc += float(np.asarray(jax.tree.leaves(outs)[0]).sum())
        return time.time() - t0, acc

    slabs = [poses[s:s + dispatch] for s in range(0, n_poses, dispatch)]

    dt_a, _ = time_dispatches(
        score_fn,
        *[(fg_params, clip_params, T_WO, T_WC, bg, txt_emb, p) for p in slabs])

    # ---- B: render-only. Same per-pose cropped render (incl. the composite
    # paste), same scan structure and render_batch vmap, reduced on-device.
    Kj = jnp.asarray(K)
    rb = int(os.environ.get("D2R_RENDER_BATCH", "4"))
    rv = rb if clip_batch % max(rb, 1) == 0 else 1

    @jax.jit
    def render_only(fg_params, T_WO_1, T_WC_1, bg, poses):
        bg_only = background_only_image(bg)
        groups = poses.reshape(-1, clip_batch, 4, 4)

        def group_body(carry, pose_group):
            sub = pose_group.reshape(clip_batch // rv, rv, 4, 4)

            def r_body(c, Ts):
                imgs = jax.vmap(lambda T: render_pose_cropped(
                    fg_params, ngp_cfg, crop_settings, dirs_cam, Kj, obj_aabb,
                    fg_crop, T_WO_1, T_WC_1, bg, bg_only, T))(Ts)
                return c + jnp.sum(imgs.astype(jnp.float32)), 0.0

            c2, _ = jax.lax.scan(r_body, 0.0, sub)
            return carry + c2, 0.0

        acc, _ = jax.lax.scan(group_body, 0.0, groups)
        return acc

    dt_b, _ = time_dispatches(
        render_only, *[(fg_params, T_WO, T_WC, bg, p) for p in slabs])

    # ---- C: CLIP-only from prerendered u8 frames (includes the rot90 +
    # preprocess that the fused program runs between render and encode).
    render_fn = make_imagine_and_score(
        ngp_cfg, clip_cfg, settings, dirs_cam, n_norm_captions=1,
        clip_batch=clip_batch, obj_aabb=obj_aabb, fg_crop=fg_crop,
        intrinsics=K, return_renders=True)
    _, frames = render_fn(fg_params, clip_params, T_WO, T_WC, bg, txt_emb,
                          poses[:dispatch])
    frames = jax.device_put(np.asarray(frames))  # (dispatch, res, res, 3) u8

    @jax.jit
    def clip_only(clip_params, txt_emb, frames):
        groups = frames.reshape(-1, clip_batch, *frames.shape[1:])

        def group_body(carry, renders_u8):
            imgs = jnp.rot90(renders_u8, k=1, axes=(1, 2))
            pixels = preprocess_images(imgs, clip_cfg)
            emb = encode_image(clip_params, clip_cfg, pixels)
            lg = logits_per_image(clip_params, emb, txt_emb)
            return carry, reduce_logits(lg, 1, False)

        _, scores = jax.lax.scan(group_body, 0, groups)
        return scores.reshape(-1)

    dt_c, _ = time_dispatches(
        clip_only, *[(clip_params, txt_emb, frames) for _ in slabs])

    out = {
        "n_poses": n_poses, "dispatch": dispatch, "clip_batch": clip_batch,
        "fg_crop": fg_crop, "crop_samples": crop_settings.n_coarse,
        "full_s": round(dt_a, 3), "render_only_s": round(dt_b, 3),
        "clip_only_s": round(dt_c, 3),
        "full_poses_per_s": round(n_poses / dt_a, 1),
        "render_ms_per_pose": round(1e3 * dt_b / n_poses, 3),
        "clip_ms_per_pose": round(1e3 * dt_c / n_poses, 3),
        "sum_vs_full": round((dt_b + dt_c) / dt_a, 3),
    }
    print(json.dumps(out), flush=True)
    if len(sys.argv) > 1:
        json.dump(out, open(sys.argv[1], "w"), indent=1)
        print(f"# wrote {sys.argv[1]}", flush=True)


if __name__ == "__main__":
    main()
