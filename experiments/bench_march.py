"""March-only microbench: tile-major empty-space-skip variants.

Times `render_pose_cropped` (the imagination loop's render half) on the real
chip for several D2R_MARCH_TILE settings, chained inside one jit per variant
(per-dispatch tunnel overhead ~3 ms swamps ms-scale ops — CLAUDE.md). The
env var is read at TRACE time, so one process builds every variant.

Variants probe WHERE the r4 16x16-tile regression came from:
  0      flat order, block=2048 (16-row bands; the round-3 baseline)
  2x128  row-major contiguous 256-ray blocks — NO data movement; isolates
         pure grid-cell-count overhead (64 cells vs 8)
  16x128 tile path but blocks == flat's row bands — isolates transpose cost
  16x16  square tiles, 64 cells (the r4 first attempt)
  32x32  square tiles, 16 cells
  32x64  2D regions at flat's OWN cell count (8) — transpose cost only

Usage: python experiments/bench_march.py [n_poses] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ["0", "2x128", "16x128", "16x16", "32x32", "32x64"]


def main():
    from dream2real_tpu.utils.health import wait_tpu_healthy

    wait_tpu_healthy(1800.0)
    import jax
    import jax.numpy as jnp

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
    from dream2real_tpu.sampling import sample_poses_grid

    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    res = 336
    scene = synth.default_scene()
    f = 0.9 * res
    K = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]])
    cams = synth.orbit_poses(scene.centre, 8, radius=0.5, height=0.4)
    rgbs, depths = [], []
    for i in range(len(cams)):
        rgb, depth, _ = synth.render_scene(scene, cams[i], K, res, res)
        rgbs.append(rgb), depths.append(depth)
    rgba = jnp.asarray(np.concatenate(
        [np.stack(rgbs), np.full((len(cams), res, res, 1), 255, np.uint8)], -1))
    ngp_cfg = NGPConfig(aabb_min=(0.0, -0.6, -0.1), aabb_max=(1.1, 0.6, 0.9))
    tc = TrainConfig(n_steps=300, batch_rays=8192, poll_steps=150,
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
    bg_only = background_only_image(bg)

    b0 = scene.boxes[0]
    pad = 0.03
    obj_aabb = (tuple(np.asarray(b0.lo) - pad), tuple(np.asarray(b0.hi) + pad))
    crop = int(os.environ.get("D2R_BENCH_FG_CROP", "128"))
    crop_settings = settings._replace(
        n_coarse=int(os.environ.get("D2R_CROP_SAMPLES", "20")), n_fine=0)
    Kj = jnp.asarray(K)
    T_WO = jnp.eye(4).at[:3, 3].set(jnp.asarray(list(scene.centre)))

    grid = sample_poses_grid(scene.centre, [16, max(n_poses // 16, 1), 1, 1, 1, 1],
                             scene_type=3)
    poses = jnp.asarray(np.asarray(grid).reshape(-1, 4, 4)[:n_poses]
                        .astype(np.float32))
    n_poses = int(poses.shape[0])

    def build(tile_env: str):
        os.environ["D2R_MARCH_TILE"] = tile_env

        @jax.jit
        def run(fg_params, T_WO_1, T_WC_1, bg, poses):
            def body(c, T):
                img = render_pose_cropped(
                    fg_params, ngp_cfg, crop_settings, dirs_cam, Kj, obj_aabb,
                    crop, T_WO_1, T_WC_1, bg, bg_only, T)
                return c + jnp.sum(img.astype(jnp.float32)), 0.0

            acc, _ = jax.lax.scan(body, 0.0, poses)
            return acc

        return run

    results = {}
    acc0 = None
    for tile_env in VARIANTS:
        run = build(tile_env)
        acc = float(run(fg_params, T_WO, T_WC, bg, poses))  # compile+warm
        t0 = time.time()
        acc = float(run(fg_params, T_WO, T_WC, bg, poses))  # timed (D2H sync)
        dt = time.time() - t0
        results[tile_env] = round(1e3 * dt / n_poses, 3)
        if acc0 is None:
            acc0 = acc
        exact = "bitexact" if acc == acc0 else f"ACC MISMATCH {acc} vs {acc0}"
        print(f"tile {tile_env:>7}: {results[tile_env]:7.3f} ms/pose ({exact})",
              flush=True)

    out = {"n_poses": n_poses, "crop": crop,
           "crop_samples": crop_settings.n_coarse, "ms_per_pose": results}
    print(json.dumps(out), flush=True)
    if len(sys.argv) > 2:
        json.dump(out, open(sys.argv[2], "w"), indent=1)
        print(f"# wrote {sys.argv[2]}", flush=True)


if __name__ == "__main__":
    main()
