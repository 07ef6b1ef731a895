"""A/B the march kernel's hits-first ray compaction on the real TPU.

`march_rays_fused(compact=True)` (gate D2R_MARCH_COMPACT, default OFF —
see march_kernel.py:298) permutes rays hits-first so fully-miss tail
blocks take the kernel's empty-space skip, at the price of O(R) XLA
gathers on the inputs/outputs. This bench runs the PRODUCTION per-pose
crop-render path (combined.py::render_pose_cropped minus the composite:
virtual-pose compose -> crop window -> dir rotation -> fused march) over a
scoring-style pose grid, chained inside ONE jit dispatch per timing rep —
per-dispatch tunnel overhead (~3 ms) otherwise swamps ms-scale ops
(CLAUDE.md timing protocol; D2H of a reduction as the sync point).

Usage: python experiments/bench_march.py [n_poses_per_chain] [reps]
Knobs: D2R_BENCH_TRAIN_STEPS (default 300), D2R_BENCH_FG_CROP (128),
D2R_BENCH_RES / D2R_BENCH_VIEWS / D2R_BENCH_BATCH (shrink for CPU smoke).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dream2real_tpu.utils.health import wait_tpu_healthy


def main():
    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    wait_tpu_healthy(900.0)

    import jax
    import jax.numpy as jnp

    from dream2real_tpu.data import synth
    from dream2real_tpu.nerf.combined import crop_window
    from dream2real_tpu.nerf.march_kernel import march_rays_fused
    from dream2real_tpu.nerf.model import NGPConfig
    from dream2real_tpu.nerf.render import RenderSettings
    from dream2real_tpu.nerf.trainer import (
        TrainConfig, init_train_state, make_train_chunk, train_with_governor,
    )
    from dream2real_tpu.ops import cameras
    from dream2real_tpu.ops.se3 import convert_virtual_pose
    from dream2real_tpu.sampling import sample_poses_grid

    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)

    # Same synthetic workload as bench.py:34-96 (field fidelity irrelevant,
    # but a trained field gives a realistic density distribution).
    res = int(os.environ.get("D2R_BENCH_RES", "336"))
    scene = synth.default_scene()
    f = 0.9 * res
    K = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]])
    cams = synth.orbit_poses(
        scene.centre, int(os.environ.get("D2R_BENCH_VIEWS", "16")),
        radius=0.5, height=0.4)
    rgbs, depths = [], []
    for i in range(len(cams)):
        rgb, depth, _ = synth.render_scene(scene, cams[i], K, res, res)
        rgbs.append(rgb)
        depths.append(depth)
    rgba = jnp.asarray(np.concatenate(
        [np.stack(rgbs), np.full((len(cams), res, res, 1), 255, np.uint8)], -1))
    ngp_cfg = NGPConfig(aabb_min=(0.0, -0.6, -0.1), aabb_max=(1.1, 0.6, 0.9))
    tc = TrainConfig(
        n_steps=int(os.environ.get("D2R_BENCH_TRAIN_STEPS", "300")),
        batch_rays=int(os.environ.get("D2R_BENCH_BATCH", "8192")),
        poll_steps=150, dynamic_time_extension=False,
    )
    settings = RenderSettings(n_coarse=32, n_fine=32, near=0.05, far=2.0)
    dirs_cam = cameras.pixel_dirs(res, res, jnp.asarray(K))
    state = init_train_state(ngp_cfg, tc, n_images=rgba.shape[0])
    chunk = make_train_chunk(
        ngp_cfg, tc, settings, rgba, jnp.asarray(cams.astype(np.float32)),
        dirs_cam, depths=jnp.asarray(np.stack(depths)))
    state, losses = train_with_governor(chunk, state, tc)
    fg_params = state["params"]["field"]
    print(f"# field trained: loss {losses[-1]:.5f}", file=sys.stderr, flush=True)

    b0 = scene.boxes[0]
    pad = 0.03
    obj_aabb = (tuple(np.asarray(b0.lo) - pad), tuple(np.asarray(b0.hi) + pad))
    crop = int(os.environ.get("D2R_BENCH_FG_CROP", "128"))
    T_WC_1 = jnp.asarray(cams[0].astype(np.float32))
    T_WO_1 = jnp.eye(4).at[:3, 3].set(jnp.asarray(list(scene.centre)))
    Kj = jnp.asarray(K, jnp.float32)

    grid = np.asarray(sample_poses_grid(
        scene.centre, [16, max(n_poses // 16, 1), 1, 1, 1, 1], scene_type=3)
    ).reshape(-1, 4, 4)
    poses = jnp.asarray(np.tile(grid, (int(np.ceil(n_poses / len(grid))), 1, 1))
                        [:n_poses].astype(np.float32))

    def chain(compact):
        def render_one(acc, T_WO_2):
            T_WC_2 = convert_virtual_pose(T_WO_1, T_WO_2, T_WC_1)
            v0, u0 = crop_window(T_WC_2, obj_aabb, Kj, res, crop)
            d_crop = jax.lax.dynamic_slice(dirs_cam, (v0, u0, 0), (crop, crop, 3))
            dirs = jnp.einsum("ij,hwj->hwi", T_WC_2[:3, :3], d_crop)
            out = march_rays_fused(
                fg_params, ngp_cfg, T_WC_2[:3, 3], dirs.reshape(-1, 3),
                obj_aabb, settings, compact=compact)
            return acc + jnp.sum(out["rgb"]) + jnp.sum(out["alpha"]), None

        def run(ps):
            acc, _ = jax.lax.scan(render_one, jnp.float32(0.0), ps)
            return acc

        return jax.jit(run)

    # Hit-fraction diagnostic: how much of the crop window the projected
    # object blob actually covers (drives the compaction headroom).
    from dream2real_tpu.nerf.render import ray_aabb
    T_WC_2 = convert_virtual_pose(T_WO_1, poses[0], T_WC_1)
    v0, u0 = crop_window(T_WC_2, obj_aabb, Kj, res, crop)
    d = jnp.einsum(
        "ij,hwj->hwi", T_WC_2[:3, :3],
        jax.lax.dynamic_slice(dirs_cam, (v0, u0, 0), (crop, crop, 3)),
    ).reshape(-1, 3)
    t0, t1 = ray_aabb(T_WC_2[:3, 3], d.astype(jnp.float32),
                      jnp.asarray(obj_aabb[0], jnp.float32),
                      jnp.asarray(obj_aabb[1], jnp.float32))
    hit_frac = float(jnp.mean((t1 > jnp.maximum(t0, settings.near)) * 1.0))
    print(f"# crop {crop}x{crop}, pose-0 hit fraction {hit_frac:.3f}",
          file=sys.stderr, flush=True)

    results = {}
    for name, compact in [("compact_off", False), ("compact_on", True)]:
        fn = chain(compact)
        acc = float(fn(poses))  # compile + warm
        t0 = time.time()
        for _ in range(reps):
            acc = float(fn(poses))
        dt = (time.time() - t0) / (reps * n_poses)
        results[name] = dt
        print(f"{name:12s}: {dt*1e3:7.3f} ms/pose (chain acc {acc:.4g})",
              flush=True)

    off, on = results["compact_off"], results["compact_on"]
    print(f"compaction speedup: {off/on:.3f}x "
          f"({(off-on)*1e3:+.3f} ms/pose)", flush=True)


if __name__ == "__main__":
    main()
