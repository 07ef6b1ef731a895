"""Grid pose optimisation: sample -> physics mask -> render -> CLIP -> argmax.

Parity target: clip_scoring.py:71-235 (`optimise_pose_grid`). Flow and
artifacts match the reference: cached-render replay from cb_render/ +
pose_scores.txt (89-104), physics-only random-valid baseline (119-125),
goal/norm logit ratio (196-203), score scatter into the full grid (205-209),
spatial smoothing (211-216), argmax + best_render.png (218-223).

TPU-first differences: the physics check is one batched launch, the renderer
is a compiled scan (no per-pose Python), CLIP runs fused batches, and nothing
round-trips through disk unless artifact saving is requested.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from dream2real_tpu.sampling import get_virtual_cam_poses, sample_poses_grid
from dream2real_tpu.smoothing import spatially_smooth_heatmap


def optimise_pose_grid(
    renderer,
    depths_gt,
    render_cam_pose_idx,
    task_model,
    data_dir: str,
    sample_res=None,
    phys_check=None,
    use_templates: bool = False,
    scene_type: int = 0,
    use_vis_pcds: bool = False,
    use_cache_renders: bool = False,
    smoothing: bool = True,
    physics_only: bool = False,
    clip_scorer=None,
    tokenizer=None,
    bounds_override=None,
    seed: int = 0,
):
    """Returns (best_pose (4,4) np, pose_batch (N,16) np, pose_scores (N,) np)."""
    if sample_res is None:
        sample_res = [40, 40, 1, 1, 1, 1]
    scene_model = task_model.scene_model
    pose_batch = np.asarray(
        sample_poses_grid(
            scene_model.scene_centre, sample_res, scene_type=scene_type,
            bounds_override=bounds_override,
        )
    )
    n = pose_batch.shape[0]

    if use_cache_renders:
        print("Using cached renders")
        old_scores = np.loadtxt(os.path.join(data_dir, "pose_scores.txt"))
        valid_idxs = np.nonzero(old_scores)[0]
        valid_poses = pose_batch[valid_idxs]
        render_dir = os.path.join(data_dir, "cb_render")
        from PIL import Image

        renders = np.stack(
            [
                np.asarray(Image.open(os.path.join(render_dir, f)).convert("RGB"))
                for f in sorted(os.listdir(render_dir))
            ]
        )
        assert len(renders) == len(valid_poses), (
            f"Expected {len(valid_poses)} renders, got {len(renders)}. "
            "Try running without use_cache_renders."
        )
    else:
        print("Running pre-render checks...")
        if phys_check is not None:
            is_valid = np.asarray(phys_check(jnp.asarray(pose_batch)))
        else:
            is_valid = np.ones(n, bool)
        valid_idxs = np.nonzero(is_valid)[0]
        valid_poses = pose_batch[valid_idxs]
        print(
            f"Of {n} sampled poses, {len(valid_idxs)} passed pre-render checks "
            f"({100 * len(valid_idxs) / n:.2f}%)."
        )
        if len(valid_idxs) == 0:
            raise Exception("No poses passed pre-render checks. Exiting.")

        if physics_only:
            print("Physics only method")
            ridx = np.random.default_rng(seed).integers(len(valid_idxs))
            best = valid_poses[ridx].reshape(4, 4)
            return best, pose_batch, np.ones(n, np.float32)

        render_poses = get_virtual_cam_poses(
            scene_model.opt_cam_poses, render_cam_pose_idx
        )
        print(f"Rendering {len(valid_poses)} imagined scenes...")
        renders = renderer.render(
            valid_poses,
            render_poses,
            render_cam_pose_idx,
            depths_gt=depths_gt,
            movable_masks=np.asarray(task_model.movable_masks)[
                list(render_cam_pose_idx)
            ],
            T_WO_1=np.asarray(task_model.movable_obj.pose),
            save=True,
        )

    task_model.free_visual_models()  # lifecycle parity (clip_scoring.py:143)

    print("Evaluating rendered images using CLIP...")
    scores_valid = clip_scorer.score(
        renders,
        task_model.goal_caption,
        task_model.norm_captions,
        tokenizer,
        use_templates=use_templates,
    )

    pose_scores = np.zeros(n, np.float32)
    pose_scores[valid_idxs] = scores_valid
    render_idxs = np.zeros(n, np.int64)
    render_idxs[valid_idxs] = np.arange(len(valid_idxs))

    if smoothing:
        print("Applying spatial smoothing...")
        pose_scores = np.asarray(
            spatially_smooth_heatmap(jnp.asarray(pose_scores), sample_res)
        )

    best_pose_idx = int(np.argmax(pose_scores))
    best_render = renders[render_idxs[best_pose_idx]]
    best_pose = valid_poses[render_idxs[best_pose_idx]]

    from PIL import Image

    Image.fromarray(np.asarray(best_render)).save(
        os.path.join(data_dir, "best_render.png")
    )
    return best_pose.reshape(4, 4), pose_batch, pose_scores
