"""End-to-end NGP selftest on the current default JAX platform.

Usage: python -m dream2real_tpu.cli.selftest [--small] [--views N] [--steps N]
       python -m dream2real_tpu.cli.selftest --clip-load-dryrun

Trains the flagship MLP field on the analytic synthetic tabletop scene and
reports steps/s, render latency, PSNR and depth error. This is the standing
verification drive for the NeRF backend (see .claude/skills/verify/SKILL.md).

--clip-load-dryrun instead exercises the production CLIP checkpoint load
path (clip_scoring.py:150-151 parity): it writes a random-weight checkpoint
with the REAL openai/clip-vit-large-patch14-336 tensor names/shapes/file
layout, loads it through `load_clip()` (the same code a robot host runs on
the actual download), and scores one full-size 336x336 image on the device.
After this, the only untested step for real scoring is the weight values.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def clip_load_dryrun(ckpt_dir: str | None = None) -> int:
    import os
    import shutil
    import tempfile

    from dream2real_tpu.clip.convert import load_clip, write_random_hf_checkpoint
    from dream2real_tpu.clip.model import (
        encode_image,
        encode_text,
        logits_per_image,
        preprocess_images,
    )

    cleanup = ckpt_dir is None
    if ckpt_dir is None:
        ckpt_dir = tempfile.mkdtemp(prefix="d2r_clip_dryrun_")
    try:
        if not os.path.isfile(os.path.join(ckpt_dir, "model.safetensors")):
            t0 = time.time()
            write_random_hf_checkpoint(ckpt_dir)
            print(f"wrote full-layout checkpoint in {time.time()-t0:.1f}s "
                  f"({ckpt_dir})", flush=True)
        t0 = time.time()
        os.environ["D2R_CLIP_PATH"] = ckpt_dir
        params, cfg = load_clip()
        print(f"load_clip: {time.time()-t0:.1f}s; vision {cfg.vision_layers}L/"
              f"{cfg.vision_width}w, text {cfg.text_layers}L/{cfg.text_width}w,"
              f" image {cfg.image_size}px", flush=True)
        assert cfg.image_size == 336 and cfg.vision_layers == 24

        img = jnp.zeros((1, 336, 336, 3), jnp.uint8)
        ids = np.zeros((2, 77), np.int32)
        ids[:, 0] = 49406
        ids[0, 1:3] = [320, 49407]
        ids[1, 1:4] = [320, 525, 49407]
        f = jax.jit(
            lambda p, im, i: logits_per_image(
                p,
                encode_image(p, cfg, preprocess_images(im, cfg)),
                encode_text(p, cfg, i),
            )
        )
        t0 = time.time()
        lg = np.asarray(f(params, img, jnp.asarray(ids)), np.float32)
        print(f"336px scoring forward (compile+run): {time.time()-t0:.1f}s; "
              f"logits {lg.ravel()}", flush=True)
        ok = lg.shape == (1, 2) and np.isfinite(lg).all()
        print("CLIP LOAD DRYRUN", "PASS" if ok else "FAIL", flush=True)
        return 0 if ok else 1
    finally:
        if cleanup:
            shutil.rmtree(ckpt_dir, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="64x64, fewer steps")
    ap.add_argument("--views", type=int, default=36)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--out", type=str, default="/tmp/d2r_selftest")
    ap.add_argument(
        "--clip-load-dryrun", action="store_true",
        help="full-layout ViT-L/14-336 checkpoint load + one 336px forward",
    )
    ap.add_argument("--clip-ckpt-dir", type=str, default=None)
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)

    if args.clip_load_dryrun:
        return clip_load_dryrun(args.clip_ckpt_dir)

    from dream2real_tpu.data import synth
    from dream2real_tpu.nerf.model import NGPConfig
    from dream2real_tpu.nerf.render import RenderSettings, render_image
    from dream2real_tpu.nerf.trainer import (
        TrainConfig,
        init_train_state,
        make_train_chunk,
        train_with_governor,
    )
    from dream2real_tpu.ops import cameras
    from dream2real_tpu.ops.image import linear_to_srgb

    scene = synth.default_scene()
    h = w = 64 if args.small else 336
    f = 0.9 * w
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    poses = synth.orbit_poses(scene.centre, args.views, radius=0.5, height=0.4)
    rgbs, depths = [], []
    for i in range(len(poses)):
        rgb, depth, _ = synth.render_scene(scene, poses[i], K, h, w)
        rgbs.append(rgb)
        depths.append(depth)
    rgba = jnp.asarray(
        np.concatenate(
            [np.stack(rgbs), np.full((len(poses), h, w, 1), 255, np.uint8)], axis=-1
        )
    )
    print(f"dataset ready ({args.views} views {h}x{w})", flush=True)

    cfg = NGPConfig(aabb_min=(0.0, -0.6, -0.1), aabb_max=(1.1, 0.6, 0.9))
    # 400 steps leaves the 64x64 field ~14.5 dB (threshold 15); 1200 clears
    # it with margin while keeping the small drive under a minute on TPU.
    steps = 1200 if args.small else args.steps
    tc = TrainConfig(
        n_steps=steps,
        batch_rays=2048 if args.small else 8192,
        poll_steps=100 if args.small else 250,
        dynamic_time_extension=False,
    )
    # Product training default (reconstruction.build_vis_model): 32+32
    # hierarchical (see the thin-object note there).
    settings = RenderSettings(n_coarse=32, n_fine=32, near=0.05, far=2.0)
    dirs_cam = cameras.pixel_dirs(h, w, jnp.asarray(K))
    state = init_train_state(cfg, tc, n_images=rgba.shape[0])
    chunk = make_train_chunk(
        cfg, tc, settings, rgba, jnp.asarray(poses.astype(np.float32)), dirs_cam,
        depths=jnp.asarray(np.stack(depths)),
    )
    t0 = time.time()
    state, loss = chunk(state)
    print(
        f"chunk0 (compile+{tc.poll_steps} steps): {time.time()-t0:.1f}s "
        f"loss={float(loss):.5f}",
        flush=True,
    )
    assert np.isfinite(float(loss)), "NaN/inf loss on first chunk"
    t0 = time.time()
    state, losses = train_with_governor(chunk, state, tc)
    dt = time.time() - t0
    n_done = int(np.asarray(state["step"])) - tc.poll_steps
    print(
        f"{n_done} steps in {dt:.1f}s = {n_done/max(dt,1e-9):.0f} steps/s; "
        f"final loss {losses[-1]:.5f}",
        flush=True,
    )

    jr = jax.jit(lambda p, T: render_image(p, cfg, T, dirs_cam, settings))
    out = jr(state["params"]["field"], jnp.asarray(poses[1].astype(np.float32)))
    _ = float(np.asarray(out["alpha"]).sum())
    t0 = time.time()
    n_r = 10
    for i in range(n_r):
        out = jr(state["params"]["field"], jnp.asarray(poses[1 + i % 5].astype(np.float32)))
        _ = float(np.asarray(out["depth"][0, 0]))
    print(f"{h}x{w} render: {(time.time()-t0)/n_r*1000:.0f} ms/img (incl host sync)", flush=True)

    i_view = 1 + (n_r - 1) % 5
    alpha = np.asarray(out["alpha"])[..., None]
    rgb = np.where(alpha > 0, np.asarray(out["rgb"]) / np.maximum(alpha, 1e-6), 0)
    img = (np.asarray(linear_to_srgb(jnp.asarray(rgb))) * 255).astype(np.uint8)
    gt = np.asarray(rgba[i_view, :, :, :3])
    mse = np.mean((img.astype(np.float64) - gt.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255**2 / mse)
    d_err = np.abs(np.asarray(out["depth"]) - depths[i_view])
    print(f"PSNR view{i_view}: {psnr:.2f} dB; median |depth err|: {np.median(d_err)*1000:.1f} mm", flush=True)

    try:
        from PIL import Image

        import os
        os.makedirs(args.out, exist_ok=True)
        Image.fromarray(img).save(f"{args.out}/render.png")
        Image.fromarray(gt).save(f"{args.out}/gt.png")
        print(f"saved {args.out}/render.png", flush=True)
    except Exception as e:  # pragma: no cover
        print("image save skipped:", e)

    ok = psnr > (15 if args.small else 22) and np.median(d_err) < 0.05
    print("SELFTEST", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
