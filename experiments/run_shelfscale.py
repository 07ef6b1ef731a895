"""Shelf-shaped 2.2M-pose 6-DoF run on one chip (VERDICT r4 missing #1).

The reference's largest workload is the shelf demo: sample_res 60x16x36 x
4x4x4 = 2,211,840 candidate poses with orientation dedup + regrasp gating +
per-pose physics, then CLIP scoring of the valid subset
(/root/reference/configs/shelf_demo.json; flow clip_scoring.py:87-128,
physics_utils.py:260-302). Its per-pose PyBullet loop makes this the
pathological case for the reference; here the dedup/regrasp masks are array
ops over the full grid and the geometric check streams fixed-size chunks
through one compiled launch each (collision.py::check).

This experiment drives that exact workload SHAPE hermetically on one chip:
- full 2,211,840-pose 6-DoF grid (shelf orientation ranges, tabletop
  translation bounds for the synth scene);
- orientation dedup + regrasp (embodied) + chunked collision/support/
  stability over ALL poses;
- production slab scoring (optimise_pose_grid) over the valid subset,
  subsampled to D2R_SHELF_SCORE_CAP (default 65536) if larger — the physics
  must see all 2.2M, scoring wall-clock is reported per pose either way.

Records dedup/regrasp/valid fractions, physics + scoring wall-clock, peak
device memory. Usage: python experiments/run_shelfscale.py [out.json]
Knobs: D2R_SHELF_GRID="60,16,36,4,4,4", D2R_PHYS_CHUNK, D2R_SHELF_SCORE_CAP.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dream2real_tpu.utils.health import wait_tpu_healthy


class _Obj:
    pass


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    wait_tpu_healthy(1800.0)

    import jax
    import jax.numpy as jnp

    from dream2real_tpu import scoring
    from dream2real_tpu.clip.model import CLIPConfig, init_clip_params
    from dream2real_tpu.clip.scorer import ClipScorer
    from dream2real_tpu.clip.tokenizer import ClipTokenizer
    from dream2real_tpu.data import synth
    from dream2real_tpu.nerf.combined import CombinedRenderer
    from dream2real_tpu.nerf.model import NGPConfig
    from dream2real_tpu.nerf.render import RenderSettings
    from dream2real_tpu.nerf.trainer import (
        TrainConfig, init_train_state, make_train_chunk, train_with_governor,
    )
    from dream2real_tpu.ops import cameras
    from dream2real_tpu.physics.collision import (
        make_unsupcol_check, orientation_dedup_mask, regrasp_mask,
    )
    from dream2real_tpu.physics.models import get_phys_models
    from dream2real_tpu.sampling import sample_poses_grid

    dev = jax.devices()[0]
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    grid_res = [int(v) for v in
                os.environ.get("D2R_SHELF_GRID", "60,16,36,4,4,4").split(",")]
    score_cap = int(os.environ.get("D2R_SHELF_SCORE_CAP", "65536"))

    # ---- Scene + brief field training (density realism, like bench.py).
    res = 336
    scene = synth.default_scene()
    f = 0.9 * res
    K = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]])
    cams = synth.orbit_poses(scene.centre, 10, radius=0.55, height=0.45)
    rgbs, depths, insts = [], [], []
    for i in range(len(cams)):
        rgb, depth, inst = synth.render_scene(scene, cams[i], K, res, res)
        rgbs.append(rgb), depths.append(depth), insts.append(inst)
    rgba = jnp.asarray(np.concatenate(
        [np.stack(rgbs), np.full((len(cams), res, res, 1), 255, np.uint8)], -1))
    ngp_cfg = NGPConfig(aabb_min=(0.0, -0.6, -0.1), aabb_max=(1.1, 0.6, 0.9))
    tc = TrainConfig(n_steps=500, batch_rays=8192, poll_steps=250,
                     dynamic_time_extension=False)
    settings = RenderSettings(n_coarse=32, n_fine=32, near=0.05, far=2.0)
    dirs_cam = cameras.pixel_dirs(res, res, jnp.asarray(K))
    state = init_train_state(ngp_cfg, tc, n_images=rgba.shape[0])
    chunk = make_train_chunk(
        ngp_cfg, tc, settings, rgba, jnp.asarray(cams.astype(np.float32)),
        dirs_cam, depths=jnp.asarray(np.stack(depths)))
    state, losses = train_with_governor(chunk, state, tc)
    fg_params = state["params"]["field"]
    print(f"# field trained: loss {losses[-1]:.5f}", file=sys.stderr, flush=True)

    # ---- Physics models from the scan (bg = table + other boxes).
    masks = np.stack([np.where(i == 1, 1, 0).astype(np.uint8) for i in insts])
    scene_bounds = ((0.0, -0.45, -0.06), (1.0, 0.45, 0.45))
    t0 = time.time()
    handles, init_poses = get_phys_models(
        np.stack(depths), list(cams.astype(np.float32)), K, masks,
        num_objs=2, scene_bounds=scene_bounds, save_dir=None, use_cache=False,
        voxel_size=0.004,
    )
    t_models = time.time() - t0
    bg_phys, fg_phys = handles
    init_pose = init_poses[1]
    print(f"# phys models fused in {t_models:.1f}s", file=sys.stderr, flush=True)

    # ---- The 2.2M grid: shelf orientation ranges (sampling.py scene_type=1),
    # tabletop translation bounds for this scene.
    import math

    sample_res = grid_res
    bounds = ((-0.19, 0.15), (-0.25, 0.10), (0.0, 0.35),
              (-math.pi, math.pi / 2), (-math.pi, math.pi / 2),
              (-math.pi, math.pi / 2))
    t0 = time.time()
    pose_batch = np.asarray(
        sample_poses_grid(scene.centre, sample_res, bounds_override=bounds)
    )
    n = len(pose_batch)
    t_grid = time.time() - t0
    print(f"# grid sampled: {n} poses in {t_grid:.1f}s", file=sys.stderr,
          flush=True)

    # ---- Masks + chunked geometric check over ALL poses.
    oris_per_pos = sample_res[3] * sample_res[4] * sample_res[5]
    poses44 = jnp.asarray(pose_batch.reshape(-1, 4, 4))
    dedup = np.asarray(orientation_dedup_mask(poses44, oris_per_pos))
    regrasp = np.asarray(regrasp_mask(poses44, oris_per_pos))
    check = make_unsupcol_check(
        bg_phys.tsdf, fg_phys.points, init_pose, scene.centre, sample_res,
        disallow_regrasp=True,  # embodied, like the reference shelf flow
    )
    t0 = time.time()
    is_valid = np.asarray(check(poses44))
    t_phys = time.time() - t0
    mem = dev.memory_stats() or {}
    peak_hbm_gb = mem.get("peak_bytes_in_use", 0) / 2**30
    print(
        f"# physics over {n} poses: {t_phys:.1f}s "
        f"({n / t_phys:.0f} poses/s); dedup keep {dedup.mean():.3f}, "
        f"regrasp keep {regrasp.mean():.3f}, valid {is_valid.mean():.4f} "
        f"({int(is_valid.sum())}); peak HBM {peak_hbm_gb:.2f} GB",
        file=sys.stderr, flush=True,
    )

    # ---- Production slab scoring over the valid subset (subsampled to cap).
    n_valid = int(is_valid.sum())
    scored_mask = is_valid
    subsampled = False
    if n_valid > score_cap:
        subsampled = True
        vidx = np.flatnonzero(is_valid)
        sel = vidx[(np.arange(score_cap) * (n_valid / score_cap)).astype(int)]
        scored_mask = np.zeros(n, bool)
        scored_mask[sel] = True
        print(f"# scoring subsampled {score_cap}/{n_valid} valid poses",
              file=sys.stderr, flush=True)

    ccfg = CLIPConfig()
    scorer = ClipScorer(init_clip_params(jax.random.PRNGKey(0), ccfg), ccfg)
    tokenizer = ClipTokenizer(context_length=ccfg.context_length,
                              vocab_size=ccfg.vocab_size)
    b0 = scene.boxes[0]
    pad = 0.06  # rotated-candidate projections swing wider than the AABB
    obj_aabb = (tuple(np.asarray(b0.lo) - pad), tuple(np.asarray(b0.hi) + pad))
    data_dir = tempfile.mkdtemp(prefix="d2r_shelfscale_")
    renderer = CombinedRenderer(
        fg_params, ngp_cfg, fg_params, ngp_cfg, settings=settings, res=res,
        intrinsics=K, obj_aabb=obj_aabb, fg_crop=160,
        out_render_path=os.path.join(data_dir, "cb_render"),
    )
    tm = _Obj()
    tm.goal_caption = "a red box on the top shelf"
    tm.norm_captions = ["a red box and a green box"]
    sm = _Obj()
    sm.scene_centre = list(scene.centre)
    sm.opt_cam_poses = [cams[0].astype(np.float32)]
    tm.scene_model = sm
    tm.movable_obj = _Obj()
    tm.movable_obj.pose = init_pose
    tm.movable_masks = np.stack([insts[0] != 1])
    tm.free_visual_models = lambda: None

    t0 = time.time()
    best_pose, pb, pose_scores = scoring.optimise_pose_grid(
        renderer, np.stack([depths[0]]), [0], tm, data_dir,
        sample_res=sample_res,
        phys_check=lambda p: jnp.asarray(scored_mask),
        scene_type=1, bounds_override=bounds,
        clip_scorer=scorer, tokenizer=tokenizer, save_renders=False,
    )
    t_score = time.time() - t0
    n_scored = int(scored_mask.sum())
    mem = dev.memory_stats() or {}
    peak_hbm_gb = max(peak_hbm_gb, mem.get("peak_bytes_in_use", 0) / 2**30)

    out = {
        "n_poses": n,
        "grid": sample_res,
        "oris_per_pos": oris_per_pos,
        "dedup_keep_frac": round(float(dedup.mean()), 4),
        "regrasp_keep_frac": round(float(regrasp.mean()), 4),
        "valid_frac": round(float(is_valid.mean()), 5),
        "n_valid": n_valid,
        "phys_wall_s": round(t_phys, 1),
        "phys_poses_per_s": round(n / t_phys, 1),
        "phys_chunk": int(os.environ.get("D2R_PHYS_CHUNK", "16384")),
        "n_scored": n_scored,
        "score_subsampled": subsampled,
        "score_wall_s": round(t_score, 1),
        "score_poses_per_s": round(n_scored / t_score, 1),
        "peak_hbm_gb": round(peak_hbm_gb, 2),
        "scores_nonzero": int((pose_scores != 0).sum()),
        "best_pose_t": [round(float(v), 4) for v in best_pose[:3, 3]],
        "fg_crop_final": renderer.fg_crop,
    }
    print(json.dumps(out), flush=True)
    assert pb.shape == (n, 16)
    assert np.isfinite(pose_scores).all()
    import shutil

    shutil.rmtree(data_dir, ignore_errors=True)
    if out_path:
        json.dump(out, open(out_path, "w"), indent=1)
        print(f"# wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
