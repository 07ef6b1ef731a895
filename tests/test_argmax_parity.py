"""Golden argmax-parity replay: reference score->scatter->smooth->argmax math
(clip_scoring.py:109-220) transliterated in numpy/torch as the oracle, run
against `optimise_pose_grid` on IDENTICAL synthetic logits.

This validates the end-to-end pose-selection math (the reference's actual
output, goal_pose.txt semantics at clip_scoring.py:218-220 / dream2real.py:356)
without real CLIP weights: both sides consume the same per-render logits
matrix, so any divergence in reduction, scatter, smoothing, or argmax shows up
as a different best pose.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dream2real_tpu.clip.scorer import CLIP_TEMPLATES, build_captions, reduce_logits
from dream2real_tpu.sampling import sample_poses_grid
from dream2real_tpu.scoring import optimise_pose_grid

from tests.test_sampling_smoothing import _torch_reference_smooth


# ---------------------------------------------------------------------------
# Oracle: clip_scoring.py:109-220 transliterated (numpy, float64).


def _oracle_optimise(
    pose_batch, is_valid, all_logits, n_norm, use_templates, smoothing,
    sample_res,
):
    """Returns (best_pose (4,4), pose_scores (N,)) by the reference's math."""
    valid_idxs = np.nonzero(is_valid)[0]                 # line 111
    valid_poses = pose_batch[valid_idxs]                 # line 112
    all_logits = np.asarray(all_logits, np.float64)

    if use_templates:                                    # lines 187-195
        n_t = len(CLIP_TEMPLATES)
        if n_norm == 0:
            logits = all_logits.mean(axis=1)
        else:
            goal_logits = all_logits[:, :n_t].mean(axis=1)
            norm_logits = all_logits[:, n_t:].mean(axis=1)
            logits = goal_logits / norm_logits
    else:                                                # lines 196-203
        if n_norm == 0:
            logits = all_logits[:, 0]
        else:
            goal_logits = all_logits[:, 0]
            norm_logits = all_logits[:, 1:].mean(axis=1)
            logits = goal_logits / norm_logits

    pose_scores = np.zeros(pose_batch.shape[0])          # lines 205-206
    pose_scores[valid_idxs] = logits
    render_idxs = np.zeros(pose_batch.shape[0], np.int64)  # lines 208-209
    render_idxs[valid_idxs] = np.arange(len(valid_idxs))

    if smoothing:                                        # lines 212-215
        pose_scores = _torch_reference_smooth(pose_scores, sample_res)

    best_pose_idx = int(np.argmax(pose_scores))          # lines 218-220
    best_pose = valid_poses[render_idxs[best_pose_idx]]
    return best_pose.reshape(4, 4), pose_scores


# ---------------------------------------------------------------------------
# Implementation-under-test harness: stubs that feed optimise_pose_grid the
# SAME logits the oracle consumed.


class _FakeClipScorer:
    """Produces the given per-render logits, then applies the production
    reduction (reduce_logits) exactly as ClipScorer.score does."""

    def __init__(self, all_logits):
        self.all_logits = np.asarray(all_logits, np.float32)

    def score(self, renders, goal_caption, norm_captions, tokenizer,
              use_templates=False):
        captions = build_captions(goal_caption, norm_captions, use_templates)
        assert self.all_logits.shape == (len(renders), len(captions))
        n_norm = 0 if norm_captions is None else len(norm_captions)
        return np.asarray(
            reduce_logits(jnp.asarray(self.all_logits), n_norm, use_templates)
        )


class _FakeRenderer:
    def render(self, valid_poses, render_poses, render_cam_pose_idx,
               depths_gt=None, movable_masks=None, T_WO_1=None, save=True):
        return np.full((len(valid_poses), 8, 8, 3), 128, np.uint8)


class _Obj:
    def __init__(self):
        self.pose = np.eye(4, dtype=np.float32)


class _SceneModel:
    def __init__(self, centre):
        self.scene_centre = centre
        self.opt_cam_poses = [np.eye(4, dtype=np.float32)]


class _TaskModel:
    def __init__(self, centre, norm_captions):
        self.scene_model = _SceneModel(centre)
        self.goal_caption = "a red box on a green box"
        self.norm_captions = norm_captions
        self.movable_obj = _Obj()
        self.movable_masks = np.zeros((1, 8, 8), bool)

    def free_visual_models(self):
        pass


CASES = [
    # (sample_res, use_templates, n_norm, smoothing)
    ([6, 5, 1, 1, 1, 1], False, 0, True),
    ([6, 5, 1, 1, 1, 1], False, 2, True),
    ([6, 5, 1, 1, 1, 1], True, 0, False),
    ([5, 4, 1, 1, 1, 1], True, 2, True),
    # shelf-style 6-DoF grid with multiple orientations (scene_type 1 bounds).
    ([4, 3, 2, 1, 1, 3], False, 2, True),
    ([3, 3, 2, 2, 1, 2], True, 1, True),
]


@pytest.mark.parametrize("sample_res,use_templates,n_norm,smoothing", CASES)
def test_argmax_parity(tmp_path, rng, sample_res, use_templates, n_norm, smoothing):
    centre = [0.5, 0.0, 0.035]
    scene_type = 0 if sample_res[3] * sample_res[4] * sample_res[5] == 1 else 1
    pose_batch = np.asarray(
        sample_poses_grid(centre, sample_res, scene_type=scene_type)
    )
    n = pose_batch.shape[0]

    # Deterministic validity pattern with some invalid poses.
    is_valid = (np.arange(n) % 3) != 1

    norm_captions = (
        None if n_norm == 0 else [f"norm caption {i}" for i in range(n_norm)]
    )
    n_captions = len(build_captions("g", norm_captions, use_templates))
    all_logits = rng.uniform(10.0, 30.0, size=(int(is_valid.sum()), n_captions))

    best_ref, scores_ref = _oracle_optimise(
        pose_batch, is_valid, all_logits, n_norm, use_templates, smoothing,
        sample_res,
    )

    valid_jnp = jnp.asarray(is_valid)
    best_impl, batch_impl, scores_impl = optimise_pose_grid(
        _FakeRenderer(),
        None,
        [0],
        _TaskModel(centre, norm_captions),
        str(tmp_path),
        sample_res=sample_res,
        phys_check=lambda poses: valid_jnp,
        use_templates=use_templates,
        scene_type=scene_type,
        smoothing=smoothing,
        clip_scorer=_FakeClipScorer(all_logits),
        tokenizer=None,
    )

    np.testing.assert_allclose(batch_impl, pose_batch, atol=0)
    # Scores match the oracle (f32 pipeline vs f64 oracle).
    np.testing.assert_allclose(scores_impl, scores_ref, rtol=2e-4, atol=1e-4)
    # Same winning pose (THE output of the system).
    assert int(np.argmax(scores_impl)) == int(np.argmax(scores_ref))
    np.testing.assert_allclose(best_impl, best_ref, atol=0)
