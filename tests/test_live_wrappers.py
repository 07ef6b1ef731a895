"""Contract tests for the live external-model wrappers, via injected fake
modules — no checkpoints needed.

The reference runs real SAM vit_h (segmentation/sam_seg.py:20-23), XMem
(segmentation/XMem_infer.py:34-37), BLIP-2 (caption.py:20-25) and CLIP
ViT-L/14-336 (clip_scoring.py:150-151). Those checkpoints cannot be
downloaded in CI, so these tests install fakes in ``sys.modules`` (SAM,
XMem) or monkeypatch ``transformers`` attributes (BLIP-2) and execute the
wrapper bodies end-to-end: checkpoint-name -> model_type inference,
generator-parameter forwarding, ann-dict conversion, the XMem resize/mask-
mapper/prob->argmax protocol, BLIP-2 batching, and a full-HF-file-layout
``load_clip`` round trip. A wrapper API bug should surface here, not on the
robot host.
"""

import sys
import types

import cv2
import numpy as np
import pytest

from dream2real_tpu.perception.segmentation import (
    SAM_GENERATOR_PARAMS,
    SamMaskGenerator,
    XMemPropagator,
)

# ---------------------------------------------------------------------------
# SAM (sam_seg.py:17-32 contract)
# ---------------------------------------------------------------------------


class _FakeSam:
    def __init__(self, model_type, checkpoint):
        self.model_type = model_type
        self.checkpoint = checkpoint
        self.device = None

    def to(self, device):
        self.device = device
        return self


class _FakeAutoGenerator:
    """Mimics SamAutomaticMaskGenerator: records params, returns ann dicts
    in the upstream format (a list of dicts with a boolean 'segmentation'
    plus metadata keys the wrapper must ignore)."""

    last = None

    def __init__(self, model=None, **params):
        self.model = model
        self.params = params
        _FakeAutoGenerator.last = self

    def generate(self, img):
        assert img.dtype == np.uint8 and img.flags["C_CONTIGUOUS"]
        h, w = img.shape[:2]
        # Two blobs sized to survive the orchestration post-proc (> 20 px
        # min side, < 30% of the image) on 64px+ frames.
        s = min(h, w) * 3 // 8
        m1 = np.zeros((h, w), bool)
        m1[2 : 2 + s, 2 : 2 + s] = True
        m2 = np.zeros((h, w), bool)
        m2[h - 2 - s : h - 2, w - 2 - s : w - 2] = True
        return [
            {"segmentation": m1, "area": int(m1.sum()), "bbox": [2, 2, s, s],
             "predicted_iou": 0.99, "stability_score": 0.97},
            {"segmentation": m2, "area": int(m2.sum()),
             "bbox": [w - 2 - s, h - 2 - s, s, s],
             "predicted_iou": 0.98, "stability_score": 0.96},
        ]


@pytest.fixture
def fake_segment_anything(monkeypatch):
    mod = types.ModuleType("segment_anything")
    built = {}

    def _builder(model_type):
        def build(checkpoint=None):
            sam = _FakeSam(model_type, checkpoint)
            built["sam"] = sam
            return sam

        return build

    mod.sam_model_registry = {t: _builder(t) for t in ("vit_h", "vit_l", "vit_b")}
    mod.SamAutomaticMaskGenerator = _FakeAutoGenerator
    monkeypatch.setitem(sys.modules, "segment_anything", mod)
    return built


def test_sam_wrapper_infers_model_type_and_forwards_params(
    fake_segment_anything, tmp_path
):
    ckpt = tmp_path / "sam_vit_b_01ec64.pth"
    ckpt.write_bytes(b"fake")
    gen = SamMaskGenerator(checkpoint=str(ckpt), device="cpu")
    sam = fake_segment_anything["sam"]
    # model_type inferred from the checkpoint filename (sam_seg.py:19-23).
    assert sam.model_type == "vit_b"
    assert sam.checkpoint == str(ckpt)
    assert sam.device == "cpu"
    # The reference's tuned generator params forwarded verbatim.
    assert _FakeAutoGenerator.last.params == SAM_GENERATOR_PARAMS
    assert _FakeAutoGenerator.last.model is sam

    masks = gen(np.zeros((32, 32, 3), np.uint8))
    assert len(masks) == 2
    assert all(m.dtype == bool and m.shape == (32, 32) for m in masks)
    assert masks[0][5, 5] and not masks[0][15, 15]
    gen.free()  # must not raise after deleting the handles


def test_sam_wrapper_default_vit_h_and_overrides(fake_segment_anything, tmp_path):
    ckpt = tmp_path / "checkpoint_final.pth"  # no vit_* marker in the name
    ckpt.write_bytes(b"fake")
    SamMaskGenerator(checkpoint=str(ckpt), points_per_side=16)
    assert fake_segment_anything["sam"].model_type == "vit_h"
    params = _FakeAutoGenerator.last.params
    assert params["points_per_side"] == 16  # override wins
    assert params["pred_iou_thresh"] == SAM_GENERATOR_PARAMS["pred_iou_thresh"]

    # Explicit model_type beats filename inference.
    ckpt2 = tmp_path / "sam_vit_b_x.pth"
    ckpt2.write_bytes(b"fake")
    SamMaskGenerator(checkpoint=str(ckpt2), model_type="vit_l")
    assert fake_segment_anything["sam"].model_type == "vit_l"


def test_sam_wrapper_env_checkpoint_and_errors(
    fake_segment_anything, tmp_path, monkeypatch
):
    monkeypatch.delenv("D2R_SAM_PATH", raising=False)
    with pytest.raises(FileNotFoundError, match="D2R_SAM_PATH"):
        SamMaskGenerator()
    ckpt = tmp_path / "sam_vit_l_0b3195.pth"
    ckpt.write_bytes(b"fake")
    monkeypatch.setenv("D2R_SAM_PATH", str(ckpt))
    SamMaskGenerator()
    assert fake_segment_anything["sam"].model_type == "vit_l"


def test_sam_wrapper_missing_package_raises_runtimeerror():
    # segment_anything is genuinely not installed in this image.
    assert "segment_anything" not in sys.modules
    with pytest.raises(RuntimeError, match="segment_anything"):
        SamMaskGenerator(checkpoint="/nonexistent.pth")


# ---------------------------------------------------------------------------
# XMem (XMem_infer.py:27-95 contract)
# ---------------------------------------------------------------------------


class _FakeMaskMapper:
    """Mimics inference.data.mask_mapper.MaskMapper: convert_mask maps raw
    instance ids to a compact 1..K one-hot stack and records remappings."""

    def __init__(self):
        self.remappings = {}
        self.calls = []

    def convert_mask(self, mask):
        self.calls.append(mask.shape)
        labels = [int(l) for l in np.unique(mask) if l != 0]
        self.remappings = {l: i + 1 for i, l in enumerate(labels)}
        onehot = np.stack([(mask == l).astype(np.float32) for l in labels])
        return onehot, list(self.remappings.values())


class _FakeInferenceCore:
    """Mimics inference.inference_core.InferenceCore: step() consumes a CHW
    float image in [0,1] (plus the one-hot seed mask on frame 0) and returns
    a (K+1, h, w) prob tensor at the model's working resolution. Propagation
    drifts the stored mask 2 px right per step."""

    def __init__(self, network, config=None):
        self.network = network
        self.config = config
        self.labels = None
        self._mask = None  # (K, h, w) float

    def set_all_labels(self, labels):
        self.labels = list(labels)

    def step(self, rgb_t, msk, labels, end=False):
        import torch

        assert rgb_t.ndim == 3 and rgb_t.shape[0] == 3
        assert float(rgb_t.max()) <= 1.0 + 1e-6
        h, w = rgb_t.shape[1:]
        if msk is not None:
            assert labels is not None
            self._mask = np.asarray(msk.cpu(), np.float32)
            assert self._mask.shape[1:] == (h, w)
        else:
            self._mask = np.roll(self._mask, 2, axis=2)
        bg = 1.0 - self._mask.sum(axis=0, keepdims=True).clip(0, 1)
        return torch.from_numpy(
            np.concatenate([bg * 0.9, self._mask], axis=0)
        ).float()


@pytest.fixture
def fake_xmem(monkeypatch, tmp_path):
    built = {}

    class _FakeXMemNet:
        def __init__(self, cfg, checkpoint, map_location=None):
            built["cfg"] = cfg
            built["checkpoint"] = checkpoint
            built["map_location"] = map_location

        def to(self, device):
            built["device"] = device
            return self

        def eval(self):
            built["eval"] = True
            return self

        def cpu(self):
            return self

    def _mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        monkeypatch.setitem(sys.modules, name, m)
        return m

    inference = _mod("inference")
    inference.__path__ = []
    _mod("inference.data").__path__ = []
    _mod("inference.data.mask_mapper", MaskMapper=_FakeMaskMapper)
    _mod("inference.inference_core", InferenceCore=_FakeInferenceCore)
    model_pkg = _mod("model")
    model_pkg.__path__ = []
    _mod("model.network", XMem=_FakeXMemNet)

    ckpt = tmp_path / "XMem.pth"
    ckpt.write_bytes(b"fake")
    monkeypatch.setenv("D2R_XMEM_PATH", str(ckpt))
    monkeypatch.delenv("D2R_XMEM_REPO", raising=False)
    return built


def test_xmem_wrapper_full_protocol(fake_xmem):
    from dream2real_tpu.perception.segmentation import XMEM_DEFAULT_CONFIG

    prop = XMemPropagator(device="cpu", config={"size": 60})
    # Construction contract: merged config, checkpoint path, eval mode.
    assert fake_xmem["checkpoint"].endswith("XMem.pth")
    assert fake_xmem["eval"] and fake_xmem["device"] == "cpu"
    assert fake_xmem["cfg"]["size"] == 60
    assert fake_xmem["cfg"]["top_k"] == XMEM_DEFAULT_CONFIG["top_k"]
    assert prop._core.labels == list(range(1, 11))  # set_all_labels on init

    # Seed frame: raw ids {0, 3, 7} -> mapper compacts to {1, 2}; output back
    # at full res with compact ids.
    h, w = 48, 96  # shorter side 48 -> 60: resize protocol must upscale
    rgb = np.zeros((h, w, 3), np.uint8)
    seed = np.zeros((h, w), np.uint8)
    seed[8:20, 8:30] = 3
    seed[28:44, 60:90] = 7
    out0 = prop.start(rgb, seed)
    assert out0.shape == (h, w) and out0.dtype == np.uint8
    assert set(np.unique(out0)) <= {0, 1, 2}
    assert out0[14, 19] == 1 and out0[36, 75] == 2
    # set_all_labels re-called with the mapper's remapped values.
    assert prop._core.labels == [1, 2]
    # The core saw the working-resolution image (shorter side == size).
    assert min(prop._core._mask.shape[1:]) == 60

    # Propagation: fake core drifts 2 px right at size-60 resolution ->
    # ~1.6 px at full res; centre of mass must move right, ids preserved.
    out1 = prop.step(rgb)
    assert out1.shape == (h, w) and set(np.unique(out1)) <= {0, 1, 2}
    com0 = np.argwhere(out0 == 1).mean(axis=0)
    com1 = np.argwhere(out1 == 1).mean(axis=0)
    assert com1[1] > com0[1] + 0.5 and abs(com1[0] - com0[0]) < 1.0

    prop.free()  # must not raise


def test_xmem_wrapper_missing_checkpoint(fake_xmem, monkeypatch):
    monkeypatch.delenv("D2R_XMEM_PATH", raising=False)
    with pytest.raises(FileNotFoundError, match="D2R_XMEM_PATH"):
        XMemPropagator(device="cpu")


def test_xmem_wrapper_missing_package_raises_runtimeerror(monkeypatch):
    for name in list(sys.modules):
        assert not name.startswith("inference")  # fakes cleaned up
    monkeypatch.setenv("D2R_XMEM_PATH", "/nonexistent.pth")
    with pytest.raises(RuntimeError, match="XMem"):
        XMemPropagator(device="cpu")


def test_segmentor_resolves_live_backends(fake_segment_anything, fake_xmem,
                                           tmp_path, monkeypatch):
    """Segmentor._resolve_backends must construct the REAL wrapper classes
    (not just accept injected ones) — end-to-end over the fake modules."""
    from dream2real_tpu.perception.segmentation import Segmentor

    ckpt = tmp_path / "sam_vit_h_4b8939.pth"
    ckpt.write_bytes(b"fake")
    monkeypatch.setenv("D2R_SAM_PATH", str(ckpt))
    seg = Segmentor(device="cpu")
    rgbs = np.zeros((3, 64, 64, 3), np.uint8)
    out_dir = str(tmp_path / "out")
    masks = seg.segment(rgbs, None, out_dir)
    assert masks.shape == (3, 64, 64)
    assert isinstance(seg.mask_generator, SamMaskGenerator)
    assert isinstance(seg.propagator, XMemPropagator)
    seg.free()


# ---------------------------------------------------------------------------
# BLIP-2 (caption.py:20-49 contract)
# ---------------------------------------------------------------------------


class _FakeBatch(dict):
    def to(self, device):
        return self


def test_blip2_backend_batching_and_decode(monkeypatch, tmp_path):
    import torch

    calls = {"from_pretrained": [], "generate": []}

    class _FakeProcessor:
        @classmethod
        def from_pretrained(cls, path, local_files_only=None):
            calls["from_pretrained"].append(("processor", path, local_files_only))
            return cls()

        def __call__(self, images=None, return_tensors=None):
            assert return_tensors == "pt"
            assert all(isinstance(i, np.ndarray) for i in images)
            return _FakeBatch(
                pixel_values=torch.zeros((len(images), 3, 4, 4))
            )

        def batch_decode(self, ids, skip_special_tokens=None):
            assert skip_special_tokens
            return [f"  caption {int(i)} " for i in ids]

    class _FakeModel:
        @classmethod
        def from_pretrained(cls, path, local_files_only=None):
            calls["from_pretrained"].append(("model", path, local_files_only))
            return cls()

        def to(self, device):
            return self

        def eval(self):
            return self

        def generate(self, pixel_values=None, **kw):
            n = pixel_values.shape[0]
            start = sum(calls["generate"])
            calls["generate"].append(n)
            return torch.arange(start, start + n)

    # transformers is a _LazyModule whose attribute cache ignores setattr
    # overrides after first access; swap the whole sys.modules entry instead
    # (blip2_backend does `from transformers import ...` at call time).
    fake_transformers = types.ModuleType("transformers")
    fake_transformers.Blip2Processor = _FakeProcessor
    fake_transformers.Blip2ForConditionalGeneration = _FakeModel
    monkeypatch.setitem(sys.modules, "transformers", fake_transformers)
    from dream2real_tpu.perception.captioner import blip2_backend

    monkeypatch.setenv("D2R_BLIP2_PATH", str(tmp_path / "blip2"))
    backend = blip2_backend(batch_size=2)
    # local_files_only must be set (robot hosts are offline, caption.py:21).
    assert all(c[2] is True for c in calls["from_pretrained"])
    assert all(c[1] == str(tmp_path / "blip2") for c in calls["from_pretrained"])

    imgs = [np.zeros((8, 8, 3), np.uint8) for _ in range(5)]
    caps = backend(imgs)
    # Batching: 5 images at batch_size=2 -> 3 generate calls, order kept,
    # captions stripped.
    assert calls["generate"] == [2, 2, 1]
    assert caps == [f"caption {i}" for i in range(5)]


# ---------------------------------------------------------------------------
# CLIP checkpoint file-layout round trip (clip_scoring.py:150-151 contract)
# ---------------------------------------------------------------------------


def test_load_clip_from_real_hf_file_layout(tmp_path, monkeypatch, rng):
    """Write a random-weight checkpoint through the genuine HF disk layout
    (config.json + model.safetensors, real tensor names) at reduced depth,
    point D2R_CLIP_PATH at the directory, and check load_clip reproduces the
    HF CLIPModel logits loaded from the same files."""
    import torch
    import transformers

    from dream2real_tpu.clip.convert import load_clip, write_random_hf_checkpoint
    from dream2real_tpu.clip.model import encode_image, encode_text, logits_per_image

    hf_cfg = transformers.CLIPConfig(
        projection_dim=768,
        text_config_dict=dict(
            hidden_size=768, intermediate_size=3072, num_hidden_layers=2,
            num_attention_heads=12, max_position_embeddings=77,
            vocab_size=49408, hidden_act="quick_gelu", eos_token_id=49407,
        ),
        vision_config_dict=dict(
            hidden_size=1024, intermediate_size=4096, num_hidden_layers=2,
            num_attention_heads=16, image_size=336, patch_size=14,
            hidden_act="quick_gelu",
        ),
    )
    ckpt_dir = write_random_hf_checkpoint(str(tmp_path / "clip"), hf_cfg)
    monkeypatch.setenv("D2R_CLIP_PATH", ckpt_dir)

    params, cfg = load_clip()  # resolves via D2R_CLIP_PATH
    assert cfg.image_size == 336 and cfg.vision_width == 1024
    assert cfg.eot_id == 49407

    pixels = rng.normal(size=(1, 336, 336, 3)).astype(np.float32)
    ids = np.zeros((2, 77), np.int64)
    ids[:, 0] = 49406
    ids[0, 1:4] = [320, 1125, 49407]
    ids[1, 1:6] = [320, 2368, 525, 320, 49407]

    hf_model = transformers.CLIPModel.from_pretrained(
        ckpt_dir, local_files_only=True
    ).eval()
    with torch.no_grad():
        ref = hf_model(
            pixel_values=torch.tensor(pixels).permute(0, 3, 1, 2),
            input_ids=torch.tensor(ids),
            attention_mask=torch.ones_like(torch.tensor(ids)),
        ).logits_per_image.numpy()

    import jax.numpy as jnp

    img_emb = encode_image(params, cfg, jnp.asarray(pixels), dtype=jnp.float32)
    txt_emb = encode_text(
        params, cfg, jnp.asarray(ids.astype(np.int32)), dtype=jnp.float32
    )
    ours = np.asarray(logits_per_image(params, img_emb, txt_emb))
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=1e-3)


def test_load_clip_missing_checkpoint(monkeypatch, tmp_path):
    monkeypatch.setenv("D2R_CLIP_PATH", str(tmp_path / "nope"))
    from dream2real_tpu.clip.convert import load_clip

    with pytest.raises(FileNotFoundError):
        load_clip()


@pytest.mark.slow
def test_load_clip_full_vit_l_336_layout(tmp_path, monkeypatch):
    """FULL-size dry run: the real openai/clip-vit-large-patch14-336 tensor
    names AND shapes (24+12 layers, ~428M params) written to disk, loaded
    through the production load_clip path, one 336-pixel image + text
    forward. The only untested step left for real scoring is the weight
    values themselves. TPU variant: `cli.selftest --clip-load-dryrun`."""
    import jax.numpy as jnp

    from dream2real_tpu.clip.convert import load_clip, write_random_hf_checkpoint
    from dream2real_tpu.clip.model import encode_image, encode_text, logits_per_image

    ckpt_dir = write_random_hf_checkpoint(str(tmp_path / "clip_full"))
    monkeypatch.setenv("D2R_CLIP_PATH", ckpt_dir)
    params, cfg = load_clip()
    assert cfg.vision_layers == 24 and cfg.text_layers == 12
    assert params["v_patch_w"].shape == (14, 14, 3, 1024)
    assert params["t_tok_emb"].shape == (49408, 768)

    pixels = np.zeros((1, 336, 336, 3), np.float32)
    ids = np.zeros((1, 77), np.int32)
    ids[:, 0] = 49406
    ids[0, 1:3] = [320, 49407]
    img_emb = encode_image(params, cfg, jnp.asarray(pixels), dtype=jnp.float32)
    txt_emb = encode_text(params, cfg, jnp.asarray(ids), dtype=jnp.float32)
    lg = np.asarray(logits_per_image(params, img_emb, txt_emb))
    assert lg.shape == (1, 1) and np.isfinite(lg).all()
