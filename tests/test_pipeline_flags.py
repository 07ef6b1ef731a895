"""Pipeline-level flag coverage (VERDICT r2 #8).

The reference treats flag ordering/consistency as a first-class contract
(demo.py:27-29: every per-stage ``use_cache_*`` flag can be flipped
independently to resume a run mid-pipeline). `test_pipeline.py` covers the
all-fresh and all-cached extremes; here every per-stage cache flag is
exercised SINGLY against a seeded artifact directory, plus the engine
branches only reachable through special configs: ``embodied=True`` (the
regrasp orientation gate, physics_utils.py:282-302), ``use_vis_pcds`` (the
point-cloud ablation renderer) and ``physics_only``.

All runs after the seeding run reuse cached stages where the flag under test
allows, so each case costs seconds, not a retrain.
"""

import json
import math
import os

import numpy as np
import pytest

import test_pipeline as tp

from dream2real_tpu.cfg import Config
from dream2real_tpu.data import synth

INSTR = "put the red box on the green box"

NGP_OVERRIDES = {
    "field": dict(mlp_width=48, mlp_depth=3, skip_layer=2, posenc_deg=5),
    "train": dict(n_steps=100, batch_rays=512, poll_steps=50,
                  dynamic_time_extension=False),
}


def _run(cfg_path, data_dir, cfg_edit=None, embodied=False,
         caption_backend=None, keep_tm=None):
    from dream2real_tpu.engine import ImaginationEngine

    cfg = Config(cfg_path, data_dir)
    for k, v in (cfg_edit or {}).items():
        setattr(cfg, k, v)
    eng = ImaginationEngine(
        cfg, llm_backend=tp._fake_llm, clip_loader=tp._tiny_clip_loader,
        ngp_overrides=NGP_OVERRIDES, embodied=embodied,
        caption_backend=caption_backend,
    )
    eng.build_scene_model()
    tm = eng.interpret_user_instr(INSTR)
    if keep_tm is not None:
        keep_tm.append(tm)
    best = eng.dream_best_pose(tm, vis_cost_vol=False)
    return eng, best


@pytest.fixture(scope="module")
def seeded(tmp_path_factory):
    """One all-fresh pipeline run that seeds every cache artifact."""
    base = tmp_path_factory.mktemp("flags")
    data_dir = str(base / "scene")
    synth.write_dataset(data_dir, n_views=8, h=120, w=160)
    json.dump(
        ["__background__", "a red box", "a green box", "a blue box"],
        open(os.path.join(data_dir, "captions.json"), "w"),
    )
    cfg_path = str(base / "cfg.json")
    tp._write_cfg(cfg_path, data_dir)
    _, best = _run(cfg_path, data_dir)
    assert best.shape == (4, 4) and np.isfinite(best).all()
    scores = np.loadtxt(os.path.join(data_dir, "pose_scores.txt"))
    batch = np.loadtxt(os.path.join(data_dir, "pose_batch.txt"))
    return dict(cfg_path=cfg_path, data_dir=data_dir, best=best,
                scores=scores, batch=batch)


CACHE_FLAGS = [
    "use_cache_dynamic_masks",
    "use_cache_segs",
    "use_cache_cam_poses",
    "use_cache_phys",
    "use_cache_vis",
    "use_cache_renders",
]

# With every cache warm, flip flags OFF one at a time isn't the contract —
# the reference resumes by turning caches ON stage by stage (demo.py:27-29).
ALL_CACHED = {f: True for f in CACHE_FLAGS}


# Flags whose replayed artifact is bit-exact (masks, poses, phys grids):
# the rerun must reproduce the seeded pose exactly. use_cache_vis
# round-trips field weights through the snapshot file and
# use_cache_renders re-scores u8 PNGs — both perturb the random-CLIP
# scores at the 4th decimal, which can flip a near-tied argmax to an
# equivalent neighbour; those assert an equivalent winner instead.
EXACT_FLAGS = {
    "use_cache_dynamic_masks", "use_cache_segs", "use_cache_cam_poses",
    "use_cache_phys",
}


@pytest.mark.slow
@pytest.mark.parametrize("flag", CACHE_FLAGS)
def test_cache_flag_singly(seeded, flag):
    """Each use_cache_* alone must complete and reproduce the seeded result
    (exactly for bit-exact replays; equivalent-winner otherwise)."""
    _, best = _run(
        seeded["cfg_path"], seeded["data_dir"], cfg_edit={flag: True}
    )
    if flag in EXACT_FLAGS:
        np.testing.assert_allclose(best, seeded["best"], atol=1e-4)
        return
    # Equivalent-winner check: the chosen pose must be a seeded-score
    # near-maximum, and the new score vector must rank like the seeded one.
    flat = np.asarray(best, np.float32).reshape(16)
    idx = int(np.argmin(np.abs(seeded["batch"] - flat[None]).max(axis=1)))
    np.testing.assert_allclose(seeded["batch"][idx], flat, atol=1e-4)
    smax = seeded["scores"].max()
    assert seeded["scores"][idx] >= 0.99 * smax, (
        seeded["scores"][idx], smax)
    new_scores = np.loadtxt(
        os.path.join(seeded["data_dir"], "pose_scores.txt"))
    both = (new_scores != 0) & (seeded["scores"] != 0)
    cc = np.corrcoef(new_scores[both], seeded["scores"][both])[0, 1]
    assert cc > 0.95, cc


@pytest.mark.slow
def test_embodied_regrasp_gate(seeded):
    """embodied=True end-to-end: candidates whose z-axis leaves the
    +z / -y grasp cone (cos > 0.9) must be rejected by the pre-render check
    while the same grid passes more poses when not embodied."""
    # Pitch sweep: +-pi/2 tips the object z-axis to +-x, outside the cone.
    # (Fresh scoring, NOT cached renders: the grid differs from the seeded
    # one, and the gate under test runs in the pre-render check.)
    edit = dict(
        ALL_CACHED,
        use_cache_renders=False,
        sample_res=[3, 3, 1, 1, 3, 1],
        sample_bounds=[
            [-0.10, 0.10], [-0.10, 0.10], [0.0, 0.10],
            [0.0, 0.0], [-math.pi / 2, math.pi / 2], [0.0, 0.0],
        ],
    )
    eng_free, best_free = _run(seeded["cfg_path"], seeded["data_dir"],
                               cfg_edit=edit)
    scores_free = np.loadtxt(
        os.path.join(seeded["data_dir"], "pose_scores.txt"))
    eng_emb, best_emb = _run(seeded["cfg_path"], seeded["data_dir"],
                             cfg_edit=edit, embodied=True)
    scores_emb = np.loadtxt(
        os.path.join(seeded["data_dir"], "pose_scores.txt"))
    assert np.isfinite(best_emb).all()
    free_n = (scores_free != 0).sum()
    emb_n = (scores_emb != 0).sum()
    # The tilted orientations (2 of every 3 grid entries) must be gated out.
    assert 0 < emb_n < free_n, (emb_n, free_n)
    batch = np.loadtxt(os.path.join(seeded["data_dir"], "pose_batch.txt"))
    tilted = np.abs(batch.reshape(-1, 4, 4)[:, 2, 2] - 1.0) > 0.1
    assert not (tilted & (scores_emb != 0)).any(), "gate leaked a tilted pose"


@pytest.mark.slow
def test_pcd_ablation_pipeline(seeded):
    """use_vis_pcds=True: the point-cloud ablation renderer drives the whole
    imagine loop (configs/synth/pcd.json path) on cached upstream stages."""
    # use_cache_vis off: the seeded caches are NeRF snapshots, not pcds.
    edit = dict(ALL_CACHED, use_cache_renders=False, use_cache_vis=False,
                use_vis_pcds=True, pcds_type=0)
    eng, best = _run(seeded["cfg_path"], seeded["data_dir"], cfg_edit=edit)
    assert best.shape == (4, 4) and np.isfinite(best).all()
    scores = np.loadtxt(os.path.join(seeded["data_dir"], "pose_scores.txt"))
    assert (scores != 0).sum() > 0
    # use_vis_pcds runs skip NeRF rendering entirely.
    assert eng.renderer is None or not hasattr(eng.renderer, "fg_cfg")


@pytest.mark.slow
def test_physics_only_pipeline(seeded):
    """physics_only=True: pre-render checks pick the pose, no CLIP scoring
    (configs/synth/physics_only.json path)."""
    edit = dict(ALL_CACHED, use_cache_renders=False, physics_only=True,
                gui=True)
    _, best = _run(seeded["cfg_path"], seeded["data_dir"], cfg_edit=edit)
    assert best.shape == (4, 4) and np.isfinite(best).all()
    # The chosen pose must be inside the sampling bounds (a valid candidate).
    assert 0.0 <= best[2, 3] <= 0.35
    # gui=True exports the headless-friendly interactive viewer (the
    # reference's Open3D-window path, geometry_utils.py:137-249).
    viewer = os.path.join(seeded["data_dir"], "viewer.html")
    assert os.path.exists(viewer)
    html = open(viewer).read()
    assert "movable" in html and '"frame"' in html


@pytest.mark.slow
def test_multiview_captioning_pipeline(seeded):
    """caption=True + multi_view_captions=True: the BLIP-2 orchestration
    (per-view masked thumbnails, LLM aggregation, captions.json write —
    caption.py:55-177) runs end-to-end with an injected caption backend."""
    data_dir = seeded["data_dir"]
    cache = os.path.join(data_dir, "captions.json")
    orig = open(cache).read()
    calls = []

    def backend(imgs):
        calls.append(len(imgs))
        assert all(im.ndim == 3 and im.dtype == np.uint8 for im in imgs)
        return [f"a box (view {i})" for i in range(len(imgs))]

    edit = dict(ALL_CACHED, use_cache_renders=False, caption=True,
                multi_view_captions=True)
    try:
        eng, best = _run(seeded["cfg_path"], data_dir, cfg_edit=edit,
                         caption_backend=backend)
        assert best.shape == (4, 4) and np.isfinite(best).all()
        # Every non-background object must contribute >=1 thumbnail.
        assert calls and sum(calls) >= 3, calls
        agg = json.load(open(cache))
        assert agg[0] == "__background__"
        # Multi-view aggregation routes through the LLM (-> "a box").
        assert all(c == "a box" for c in agg[1:]), agg
        assert [o.name for o in eng.scene_model.objs] == agg
    finally:
        open(cache, "w").write(orig)


@pytest.mark.slow
def test_single_view_captioning_pipeline(seeded):
    """multi_view_captions=False: one thumbnail per object from
    single_view_idx, caption used verbatim (no LLM aggregation)."""
    data_dir = seeded["data_dir"]
    cache = os.path.join(data_dir, "captions.json")
    orig = open(cache).read()

    def backend(imgs):
        return [f"obj seen once #{i}" for i in range(len(imgs))]

    edit = dict(ALL_CACHED, use_cache_renders=False, caption=True,
                multi_view_captions=False)
    try:
        eng, best = _run(seeded["cfg_path"], data_dir, cfg_edit=edit,
                         caption_backend=backend)
        assert np.isfinite(best).all()
        agg = json.load(open(cache))
        assert agg[0] == "__background__"
        assert all(c.startswith("obj seen once") for c in agg[1:]), agg
    finally:
        open(cache, "w").write(orig)


@pytest.mark.slow
def test_render_distractors_pipeline(seeded):
    """render_distractors=True: distractor objects stay IN the task
    background (scene_model.py:60-96 via engine.py:373) — only the movable
    object is masked out of the bg task NeRF."""
    tms = []
    edit = dict(ALL_CACHED, use_cache_vis=False, use_cache_renders=False,
                render_distractors=True)
    eng, best = _run(seeded["cfg_path"], seeded["data_dir"], cfg_edit=edit,
                     keep_tm=tms)
    assert best.shape == (4, 4) and np.isfinite(best).all()
    tm = tms[0]
    masks = np.asarray(eng.scene_model.masks)
    oob = np.asarray(eng.out_scene_bound_masks).astype(bool)
    movable_idx = tm.movable_obj.mask_idx
    bg = np.asarray(tm.task_bground_masks).astype(bool)
    # Movable pixels masked out of the background...
    assert bg[masks == movable_idx].all()
    # ...while the distractor (fake LLM marks object 3) and every other
    # in-bounds object pixel stays renderable in the bg model.
    keep = (masks != movable_idx) & ~oob
    assert movable_idx != 3 and keep[masks == 3].any()
    assert not bg[keep].any()
