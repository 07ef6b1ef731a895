"""March-only microbench: empty-space / early-exit variants.

Times `render_pose_cropped` (the imagination loop's render half) on the real
chip, chained inside one jit per variant (per-dispatch tunnel overhead ~3 ms
swamps ms-scale ops — CLAUDE.md). Env knobs are read at TRACE time, so one
process builds every variant.

Round-5 history (results/bench_march_tiles.json, 256 poses x 3 reps,
crop 128 / 20 samples): the r4 tile-major ray reorder LOST at every shape —
flat 1.25 / 32x64 1.40 / 32x32 1.28 / 16x16 1.63 / 2x128 2.07 ms/pose (grid-
cell-count overhead dominates any skip win; the r4 32x64 default was a ~4%
end-to-end regression) — and the tile path was deleted from combined.py.
The early-transmittance exit (D2R_MARCH_EARLY, exact) WON: 1.235-1.266
stable vs flat's noisy 1.25-1.88, and is default-on. This script now sweeps
the surviving knob.

Usage: python experiments/bench_march.py [n_poses] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [("flat", "0"), ("flat", "1")]


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

    def build(_tag: str, early_env: str = "0"):
        os.environ["D2R_MARCH_EARLY"] = early_env

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
    n_reps = int(os.environ.get("D2R_BENCH_MARCH_REPS", "2"))
    for tag, early_env in VARIANTS:
        key = tag + ("+early" if early_env == "1" else "")
        run = build(tag, early_env)
        acc = float(run(fg_params, T_WO, T_WC, bg, poses))  # compile+warm
        times = []
        for _ in range(n_reps):
            t0 = time.time()
            acc = float(run(fg_params, T_WO, T_WC, bg, poses))  # timed (D2H)
            times.append(time.time() - t0)
        results[key] = [round(1e3 * t / n_poses, 3) for t in times]
        if acc0 is None:
            acc0 = acc
        exact = "bitexact" if acc == acc0 else f"ACC MISMATCH {acc} vs {acc0}"
        print(f"tile {key:>13}: {results[key]} ms/pose ({exact})",
              flush=True)

    out = {"n_poses": n_poses, "crop": crop,
           "crop_samples": crop_settings.n_coarse, "ms_per_pose": results}
    print(json.dumps(out), flush=True)
    if len(sys.argv) > 2:
        json.dump(out, open(sys.argv[2], "w"), indent=1)
        print(f"# wrote {sys.argv[2]}", flush=True)


if __name__ == "__main__":
    main()
