"""Live-path orchestration of Segmentor with injected (scripted) backends.

Covers the SAM-on-frame-0 + propagate flow (XMem_infer.py:97-149) and the
dense-video segment_associate flow (XMem_infer.py:151-244) without needing
the external SAM/XMem checkpoints: the backends are pluggable.
"""

import os

import cv2
import numpy as np
import pytest

from dream2real_tpu.perception.segmentation import (
    Segmentor,
    load_cached_masks,
)


def _blob(h, w, r0, r1, c0, c1):
    m = np.zeros((h, w), bool)
    m[r0:r1, c0:c1] = True
    return m


class ScriptedGenerator:
    """Returns fixed instance masks for whatever image size it is shown."""

    def __init__(self):
        self.calls = []

    def __call__(self, img):
        self.calls.append(np.asarray(img).shape)
        h, w = img.shape[:2]
        # Two keepable objects (> 20px min side, < 30% area) + one sliver
        # that post-proc must drop.
        s = 24
        return [
            _blob(h, w, 2, 2 + s, 2, 2 + s),
            _blob(h, w, h - 2 - s, h - 2, w - 2 - s, w - 2),
            _blob(h, w, 1, 3, 1, 3),
        ]


class ScriptedPropagator:
    """Deterministic drift: each step shifts the current mask 2px right."""

    def __init__(self):
        self.mask = None
        self.steps = 0

    def start(self, rgb, id_mask):
        self.mask = np.asarray(id_mask, np.uint8)
        return self.mask

    def step(self, rgb):
        self.steps += 1
        self.mask = np.roll(self.mask, 2, axis=1)
        return self.mask

    def free(self):
        self.freed = True


def test_segment_live_with_backends(tmp_path):
    h, w, n = 64, 80, 3
    rgbs = np.full((n, h, w, 3), 127, np.uint8)
    gen = ScriptedGenerator()
    prop = ScriptedPropagator()
    seg = Segmentor(mask_generator=gen, propagator=prop)

    masks = seg.segment(rgbs, None, str(tmp_path))
    assert masks.shape == (n, h, w)
    # frame 0: background 0 + two surviving objects (sliver suppressed).
    assert set(np.unique(masks[0])) == {0, 1, 2}
    assert prop.steps == n - 1
    # drift: frame 2 is frame 0 rolled 4px.
    assert (masks[2] == np.roll(masks[0], 4, axis=1)).all()
    # cache artifacts written + replayable.
    for i in range(n):
        assert os.path.isfile(tmp_path / "XMem_masks" / f"rgb_{i:04d}.png")
        assert os.path.isfile(tmp_path / "XMem_vis_masks" / f"rgb_{i:04d}.png")
    replay = load_cached_masks(str(tmp_path), n)
    assert (replay == masks).all()
    seg.free()
    assert prop.freed


def test_segment_single_frame_needs_no_propagator(tmp_path):
    rgbs = np.full((1, 48, 48, 3), 50, np.uint8)
    seg = Segmentor(mask_generator=ScriptedGenerator())
    masks = seg.segment(rgbs, None, str(tmp_path))
    assert masks.shape == (1, 48, 48)
    assert seg.propagator is None


def test_segment_live_unavailable_raises(tmp_path):
    rgbs = np.full((2, 32, 32, 3), 50, np.uint8)
    with pytest.raises((RuntimeError, FileNotFoundError)):
        Segmentor().segment(rgbs, None, str(tmp_path))


def test_segment_associate_live(tmp_path):
    h, w = 64, 48  # portrait video; SAM sees the rot90'd landscape image
    n_video, keyframes = 5, [1, 3]
    video = tmp_path / "seg_images"
    video.mkdir()
    for i in range(n_video):
        cv2.imwrite(str(video / f"frame_{i:04d}.png"), np.full((h, w, 3), 90, np.uint8))
    with open(tmp_path / "associate_index.txt", "w") as f:
        f.write("\n".join(str(k) for k in keyframes))

    # Scene-bound masks for the 2 keyframes: 255 = outside (border strip).
    out_sb = np.zeros((2, h, w), np.uint8)
    out_sb[:, :4, :] = 255
    depths = np.full((2, h, w), 0.5, np.float32)
    T_WC = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]])

    gen = ScriptedGenerator()
    prop = ScriptedPropagator()
    seg = Segmentor(mask_generator=gen, propagator=prop)
    refined = seg.segment_associate(
        str(video), depths, T_WC, K, str(tmp_path),
        out_scene_bound_masks=out_sb, scene_centre=np.zeros(3),
    )

    # The generator ran once, on the ROTATED first associated frame.
    assert gen.calls == [(w, h, 3)]
    # Propagation started at keyframe[0]=1, stepped through frames 2..4.
    assert prop.steps == n_video - 1 - keyframes[0]
    assert len(refined) == len(keyframes)
    for m in refined:
        assert m.shape == (h, w)
        # scene-bound overwrite applied.
        assert (m[:4, :] == 255).all()
    # Object ids present in the first refined keyframe (bg + 2 objects).
    assert {0, 1, 2} <= set(np.unique(refined[0]))
    # Keyframe cache written under the keyframe INDEX, not the video index.
    for idx in range(len(keyframes)):
        assert os.path.isfile(tmp_path / "XMem_masks" / f"rgb_{idx:04d}.png")
    replay = seg.segment_associate(
        str(video), depths, T_WC, K, str(tmp_path), use_cache=True,
    )
    assert (np.stack(replay) == np.stack(refined)).all()
