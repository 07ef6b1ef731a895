"""Engine entry guards: missing external-model weights must fail LOUDLY.

Without a real CLIP checkpoint the pipeline would otherwise run to completion
and write a semantically meaningless goal_pose.txt (the scorer is the
reference's openai/clip-vit-large-patch14-336, clip_scoring.py:150-151).
"""

import numpy as np
import pytest

from dream2real_tpu.engine import ImaginationEngine


def _bare_engine():
    """Engine instance with only the fields _get_clip_locked touches."""
    import threading

    eng = ImaginationEngine.__new__(ImaginationEngine)
    eng.clip_loader = None
    eng._clip_scorer = None
    eng._tokenizer = None
    eng._clip_lock = threading.Lock()
    eng.clip_batch = 8
    return eng


def test_missing_clip_checkpoint_is_hard_error(monkeypatch):
    monkeypatch.delenv("D2R_CLIP_PATH", raising=False)
    monkeypatch.delenv("D2R_ALLOW_RANDOM_CLIP", raising=False)
    # Ensure the HF-cache fallback also misses.
    monkeypatch.setenv("HF_HOME", "/nonexistent-hf-home")
    eng = _bare_engine()
    with pytest.raises(RuntimeError, match="D2R_ALLOW_RANDOM_CLIP"):
        eng._get_clip()


def test_random_clip_opt_in(monkeypatch):
    monkeypatch.delenv("D2R_CLIP_PATH", raising=False)
    monkeypatch.setenv("HF_HOME", "/nonexistent-hf-home")
    monkeypatch.setenv("D2R_ALLOW_RANDOM_CLIP", "1")
    eng = _bare_engine()
    scorer, tokenizer = eng._get_clip()
    assert scorer.batch_size == 8
    ids = np.asarray(tokenizer(["a red box"]))
    assert ids.ndim == 2


def test_inpaint_holes_wiring():
    """cfg.inpaint_holes gates ImaginationEngine.inpaint_images: off =
    bit-exact passthrough, on = white scan holes get filled (telea fallback
    when no SD-2 checkpoint is present). The reference constructs its
    inpainter under this flag but never calls it (dream2real.py:84-87)."""
    from dream2real_tpu.utils.profiling import StageTimer

    rgb = np.full((2, 48, 48, 3), 90, np.uint8)
    rgb[:, 20:28, 20:28] = 255  # white hole (reference diffusion.py:24-27)

    eng = ImaginationEngine.__new__(ImaginationEngine)
    eng.stage_timer = StageTimer()
    eng.inpaint_holes = False
    assert np.array_equal(eng.inpaint_images(rgb), rgb)

    eng.inpaint_holes = True
    out = eng.inpaint_images(rgb)
    assert out.shape == rgb.shape and out.dtype == np.uint8
    hole = out[:, 20:28, 20:28]
    assert not np.all(hole > 200), "hole pixels must be filled"
    # Non-hole pixels untouched by the classical fill.
    assert np.array_equal(out[:, :10, :10], rgb[:, :10, :10])
