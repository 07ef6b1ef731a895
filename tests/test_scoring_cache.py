"""optimise_pose_grid cached-render replay + physics-only baseline paths."""

import os

import numpy as np
import jax
import pytest
from PIL import Image

from dream2real_tpu.clip.model import CLIPConfig, init_clip_params
from dream2real_tpu.clip.scorer import ClipScorer
from dream2real_tpu.scoring import optimise_pose_grid


class _Scene:
    scene_centre = [0.5, 0.0, 0.035]
    opt_cam_poses = [np.eye(4, dtype=np.float32)]


class _Movable:
    pose = np.eye(4)
    mask_idx = 1


class _TaskBg:
    vis_model = object()


class _TM:
    goal_caption = "g"
    norm_captions = ["n"]
    scene_model = _Scene()
    movable_obj = _Movable()
    task_bground_obj = _TaskBg()
    movable_masks = np.ones((1, 8, 8), bool)

    def free_visual_models(self):
        self.task_bground_obj.vis_model = None


def _tok(texts):
    ids = np.zeros((len(texts), 16), np.int32)
    ids[:, 0] = 1
    for r, t in enumerate(texts):
        ids[r, 1] = 2 + (hash(t) % 100)
        ids[r, 2] = 127
    return ids


def test_cached_render_replay(tmp_path, rng):
    """use_cache_renders: scores/renders replayed from disk
    (clip_scoring.py:89-104 parity, incl. the count assert)."""
    d = str(tmp_path)
    sample_res = [4, 4, 1, 1, 1, 1]
    old_scores = np.zeros(16)
    valid = [1, 5, 9, 13]
    old_scores[valid] = rng.uniform(0.5, 1.0, len(valid))
    np.savetxt(os.path.join(d, "pose_scores.txt"), old_scores)
    os.makedirs(os.path.join(d, "cb_render"))
    for i in range(len(valid)):
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(os.path.join(d, "cb_render", f"cb_rgb_{i:04d}.png"))

    cfg = CLIPConfig(
        eot_id=127, image_size=32, patch_size=8, vision_width=32,
        vision_layers=1, vision_heads=4, vocab_size=128, context_length=16,
        text_width=32, text_layers=1, text_heads=4, projection_dim=16,
    )
    scorer = ClipScorer(init_clip_params(jax.random.PRNGKey(0), cfg), cfg, batch_size=4)
    tm = _TM()
    best, batch, scores = optimise_pose_grid(
        renderer=None, depths_gt=None, render_cam_pose_idx=[0], task_model=tm,
        data_dir=d, sample_res=sample_res, use_cache_renders=True,
        smoothing=True, clip_scorer=scorer, tokenizer=_tok, scene_type=3,
    )
    assert best.shape == (4, 4)
    assert batch.shape == (16, 16)
    assert (scores[old_scores == 0] == 0).all()
    assert (scores[valid] != 0).all()
    assert os.path.exists(os.path.join(d, "best_render.png"))
    assert tm.task_bground_obj.vis_model is None  # freed (clip_scoring.py:143)

    # Count mismatch must raise (clip_scoring.py:104 assert).
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
        os.path.join(d, "cb_render", "cb_rgb_0099.png")
    )
    with pytest.raises(AssertionError):
        optimise_pose_grid(
            renderer=None, depths_gt=None, render_cam_pose_idx=[0],
            task_model=_TM(), data_dir=d, sample_res=sample_res,
            use_cache_renders=True, clip_scorer=scorer, tokenizer=_tok,
            scene_type=3,
        )


def test_physics_only_baseline(tmp_path):
    """physics_only: random valid pose, all-ones scores (clip_scoring.py:119-125)."""
    d = str(tmp_path)
    sample_res = [3, 3, 1, 1, 1, 1]

    def phys_check(batch):
        v = np.zeros(9, bool)
        v[[2, 4, 7]] = True
        return v

    tm = _TM()
    best, batch, scores = optimise_pose_grid(
        renderer=None, depths_gt=None, render_cam_pose_idx=[0], task_model=tm,
        data_dir=d, sample_res=sample_res, phys_check=phys_check,
        physics_only=True, scene_type=3, seed=0,
    )
    assert best.shape == (4, 4)
    np.testing.assert_array_equal(scores, np.ones(9))
    # The chosen pose is one of the valid ones.
    valid_poses = batch.reshape(-1, 4, 4)[[2, 4, 7]]
    assert any(np.allclose(best, p) for p in valid_poses)


def test_pcd_renderer_dispatch(tmp_path):
    """use_vis_pcds routes the unfused branch through the PointCloudRenderer
    signature (reference clip_scoring.py:131): render(render_pose, poses,
    task_model, hide_movable=False) -> list of images."""
    from dream2real_tpu.pcd.renderer import PointCloudRenderer
    from dream2real_tpu.pcd.visual_model import PointCloud

    tm = _TM()
    tm.movable_obj = _Movable()
    tm.movable_obj.vis_model = PointCloud(
        points=np.array([[0.5, 0.0, 0.05]], np.float32),
        colors=np.array([[200, 30, 30]], np.uint8),
    )
    tm.task_bground_obj = _TaskBg()
    tm.task_bground_obj.vis_model = PointCloud(
        points=np.array([[0.45, 0.0, 0.0]], np.float32),
        colors=np.array([[30, 200, 30]], np.uint8),
    )
    cam = np.eye(4, dtype=np.float32)
    cam[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    cam[:3, 3] = (0.5, 0.0, 0.8)
    tm.scene_model = _Scene()
    tm.scene_model.opt_cam_poses = [cam]

    class _Clip:
        # duck-typed: only .score is needed on the unfused path (no .params
        # attribute -> the fused gate stays off)
        def score(self, renders, goal, norms, tok, use_templates=False):
            renders = np.asarray(renders)
            assert renders.ndim == 4 and renders.shape[-1] == 3
            return np.linspace(0.2, 1.0, len(renders)).astype(np.float32)

    best, batch, scores = optimise_pose_grid(
        PointCloudRenderer(),
        None,
        [0],
        tm,
        str(tmp_path),
        sample_res=[3, 3, 1, 1, 1, 1],
        use_vis_pcds=True,
        smoothing=False,
        clip_scorer=_Clip(),
        tokenizer=_tok,
        save_renders=False,
    )
    assert best.shape == (4, 4)
    assert (scores > 0).sum() == 9  # all poses scored
