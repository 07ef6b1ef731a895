"""Scoring-setup prefetch (prefetch.py): overlap correctness.

Runs the engine pipeline twice on the same synthetic scene — once with the
prefetch disabled (serial path) and once with warm-ups forced — and checks
the prefetched renderer/score program/physics mask were actually reused AND
produce the identical goal pose and scores. Covers VERDICT r2 #2's "prefetch
during the task-NeRF stage" without needing TPU timing.
"""

import json
import os

import numpy as np
import pytest

import test_pipeline as tp

from dream2real_tpu.cfg import Config
from dream2real_tpu.data import synth


def _build_engine(cfg_path, data_dir):
    from dream2real_tpu.engine import ImaginationEngine

    cfg = Config(cfg_path, data_dir)
    ngp_overrides = {
        "field": dict(mlp_width=48, mlp_depth=3, skip_layer=2, posenc_deg=5),
        "train": dict(n_steps=120, batch_rays=512, poll_steps=50,
                      dynamic_time_extension=False),
    }
    return ImaginationEngine(
        cfg, llm_backend=tp._fake_llm, clip_loader=tp._tiny_clip_loader,
        ngp_overrides=ngp_overrides,
    )


@pytest.mark.slow
def test_prefetch_reuse_and_determinism(tmp_path, monkeypatch):
    data_dir = str(tmp_path / "scene")
    synth.write_dataset(data_dir, n_views=10, h=120, w=160)
    json.dump(
        ["__background__", "a red box", "a green box", "a blue box"],
        open(os.path.join(data_dir, "captions.json"), "w"),
    )
    cfg_path = str(tmp_path / "cfg.json")
    tp._write_cfg(cfg_path, data_dir)

    instr = "put the red box on the green box"

    # --- Serial reference run.
    monkeypatch.setenv("D2R_PREFETCH", "0")
    eng0 = _build_engine(cfg_path, data_dir)
    eng0.build_scene_model()
    tm0 = eng0.interpret_user_instr(instr)
    assert eng0._score_prefetch is None
    best0 = eng0.dream_best_pose(tm0, vis_cost_vol=False)
    scores0 = np.loadtxt(os.path.join(data_dir, "pose_scores.txt"))

    # --- Prefetched run (warm-ups forced even on the CPU mesh).
    monkeypatch.setenv("D2R_PREFETCH", "1")
    monkeypatch.setenv("D2R_PREFETCH_WARM", "1")
    eng1 = _build_engine(cfg_path, data_dir)
    eng1.build_scene_model()
    tm1 = eng1.interpret_user_instr(instr)
    assert eng1._score_prefetch is not None
    out = eng1._score_prefetch.result()
    assert out is not None, "prefetch thread failed"
    # Everything the thread can prepare must be there.
    for key in ("phys_check", "is_valid", "pose_batch", "clip_scorer", "txt",
                "renderer", "score_fn", "score_fn_key"):
        assert key in out, key
    best1 = eng1.dream_best_pose(tm1, vis_cost_vol=False)

    # The predicted renderer must have been adopted (config prediction held)
    # and the trained weights swapped in.
    assert eng1.renderer is out["renderer"], "prefetched renderer not reused"
    assert eng1.renderer.fg_params is tm1.movable_obj.vis_model.params

    # Identical outcome to the serial path.
    np.testing.assert_allclose(best1, best0, atol=1e-5)
    scores1 = np.loadtxt(os.path.join(data_dir, "pose_scores.txt"))
    np.testing.assert_allclose(scores1, scores0, atol=1e-5)
