"""Reference-scale scoring run through the PRODUCTION optimise_pose_grid.

The shopping demo's full grid is 100x100x7 = 70,000 candidate poses
(/root/reference/configs/shopping_demo.json sample_res); the reference scores
it with a sequential render loop + chunked CLIP batches
(clip_scoring.py:167-185). bench.py already sustains this scale through the
raw score_fn (PERF.md round 2: 152 poses/s over 69,984); THIS script instead
drives `scoring.optimise_pose_grid` — the slab dispatcher, pending-bytes cap,
writer thread, score scatter, smoothing and argmax that demo.py actually runs
— at the same scale on the real chip, and records wall-clock, sustained
poses/s, peak pending render MB and the smoothing/argmax tail cost.

Usage: python experiments/run_refscale.py [out.json]
Knobs: D2R_REFSCALE_GRID="100,100,7" (default), D2R_REFSCALE_SAVE=1 to
stream cb_render PNGs through the writer thread (needs ~24 GB free in /tmp
at full scale — default off -> fused no-artifact path, the demo default for
save_renders=false configs).
"""

from __future__ import annotations

import json
import os
import shutil
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

    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    grid_res = [int(v) for v in
                os.environ.get("D2R_REFSCALE_GRID", "100,100,7").split(",")]
    sample_res = grid_res + [1] * (6 - len(grid_res))
    save_renders = os.environ.get("D2R_REFSCALE_SAVE", "0") == "1"

    # ---- Train the flagship field briefly (fidelity irrelevant; realistic
    # density distribution matters), exactly like bench.py.
    res = 336
    scene = synth.default_scene()
    f = 0.9 * res
    K = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]])
    cams = synth.orbit_poses(scene.centre, 8, radius=0.5, height=0.4)
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

    # ---- Production renderer + ViT-L-shaped scorer (random weights: no
    # checkpoint in this environment; FLOP/layout-identical to real scoring).
    b0 = scene.boxes[0]
    pad = 0.03
    obj_aabb = (tuple(np.asarray(b0.lo) - pad), tuple(np.asarray(b0.hi) + pad))
    T_WO_1 = np.eye(4, dtype=np.float32)
    T_WO_1[:3, 3] = (np.asarray(b0.lo) + np.asarray(b0.hi)) / 2
    data_dir = tempfile.mkdtemp(prefix="d2r_refscale_")
    renderer = CombinedRenderer(
        fg_params, ngp_cfg, fg_params, ngp_cfg, settings=settings, res=res,
        intrinsics=K, obj_aabb=obj_aabb, fg_crop=128,
        out_render_path=os.path.join(data_dir, "cb_render"),
    )
    ccfg = CLIPConfig()
    scorer = ClipScorer(init_clip_params(jax.random.PRNGKey(0), ccfg), ccfg)
    tokenizer = ClipTokenizer(context_length=ccfg.context_length,
                              vocab_size=ccfg.vocab_size)

    tm = _Obj()
    tm.goal_caption = "a red box on top of the green box"
    tm.norm_captions = ["a red box and a green box"]
    sm = _Obj()
    sm.scene_centre = list(scene.centre)
    sm.opt_cam_poses = [cams[0].astype(np.float32)]
    tm.scene_model = sm
    tm.movable_obj = _Obj()
    tm.movable_obj.pose = T_WO_1
    tm.movable_masks = np.stack([insts[0] != 1])
    tm.free_visual_models = lambda: None

    n = int(np.prod(sample_res))
    print(f"# grid {sample_res} = {n} poses; save_renders={save_renders}",
          file=sys.stderr, flush=True)
    t0 = time.time()
    best_pose, pose_batch, pose_scores = scoring.optimise_pose_grid(
        renderer,
        np.stack([depths[0]]),
        [0],
        tm,
        data_dir,
        sample_res=sample_res,
        phys_check=None,  # all-valid: the point is throughput at full scale
        scene_type=3,
        bounds_override=((-0.2, 0.2), (-0.2, 0.2), (0.0, 0.12),
                         (0.0, 0.0), (0.0, 0.0), (0.0, 0.0)),
        clip_scorer=scorer,
        tokenizer=tokenizer,
        save_renders=save_renders,
    )
    dt = time.time() - t0
    info = dict(scoring.LAST_RUN_INFO)
    out = {
        "n_poses": n,
        "wall_s": round(dt, 1),
        "poses_per_s_sustained": round(n / dt, 1),
        "mesh_devices": info.get("mesh_devices"),
        "slab": info.get("slab"),
        "peak_pending_mb": info.get("peak_pending_mb"),
        "save_renders": save_renders,
        "scores_nonzero": int((pose_scores != 0).sum()),
        "best_pose_t": [round(float(v), 4) for v in best_pose[:3, 3]],
        "grid": sample_res,
        "stage_s": info.get("stage_s"),
        "dispatch_s": info.get("dispatch_s"),
        "drain_s": info.get("drain_s"),
        "n_slabs": info.get("n_slabs"),
    }
    print(json.dumps(out), flush=True)
    assert np.isfinite(pose_scores).all()
    assert pose_batch.shape == (n, 16)
    if save_renders:
        n_files = len(os.listdir(os.path.join(data_dir, "cb_render")))
        assert n_files == n, (n_files, n)
    shutil.rmtree(data_dir, ignore_errors=True)
    if out_path:
        json.dump(out, open(out_path, "w"), indent=1)
        print(f"# wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
