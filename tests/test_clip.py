"""CLIP tower tests: shapes, HF-parity via converter, scoring math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dream2real_tpu.clip.model import (
    CLIPConfig,
    encode_image,
    encode_text,
    init_clip_params,
    logits_per_image,
    preprocess_images,
)
from dream2real_tpu.clip.scorer import CLIP_TEMPLATES, build_captions, reduce_logits

TINY = CLIPConfig(
    eot_id=127,
    image_size=32,
    patch_size=8,
    vision_width=32,
    vision_layers=2,
    vision_heads=4,
    vocab_size=128,
    context_length=16,
    text_width=32,
    text_layers=2,
    text_heads=4,
    projection_dim=24,
)


def test_clip_shapes_and_finite(rng):
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    imgs = jnp.asarray(rng.integers(0, 255, size=(3, 32, 32, 3), dtype=np.uint8))
    pixels = preprocess_images(imgs, TINY)
    emb = encode_image(params, TINY, pixels)
    assert emb.shape == (3, 24)
    ids = np.zeros((2, 16), np.int32)
    ids[:, 0] = 1
    ids[0, 1:4] = [5, 9, 127]
    ids[1, 1:3] = [44, 127]
    temb = encode_text(params, TINY, jnp.asarray(ids))
    assert temb.shape == (2, 24)
    lg = logits_per_image(params, emb, temb)
    assert lg.shape == (3, 2)
    assert np.isfinite(np.asarray(lg)).all()


def test_clip_matches_hf_transformers(rng):
    """Converter + forward must reproduce HF CLIPModel logits on a small
    random model (validates the architecture against the reference's scorer,
    clip_scoring.py:150-181)."""
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.CLIPConfig(
        projection_dim=24,
        text_config_dict=dict(
            hidden_size=32, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, max_position_embeddings=16, vocab_size=128,
            hidden_act="quick_gelu", eos_token_id=127,
        ),
        vision_config_dict=dict(
            hidden_size=32, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
            hidden_act="quick_gelu",
        ),
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(hf_cfg).eval()

    from dream2real_tpu.clip.convert import config_from_hf, params_from_hf_state_dict

    cfg = config_from_hf(hf_cfg)
    params = params_from_hf_state_dict(model.state_dict(), cfg)

    pixels = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ids = np.zeros((3, 16), np.int64)
    ids[:, 0] = 1
    ids[0, 1:4] = [5, 9, 127]
    ids[1, 1:3] = [44, 127]
    ids[2, 1:6] = [3, 4, 5, 6, 127]

    with torch.no_grad():
        out = model(
            pixel_values=torch.tensor(pixels).permute(0, 3, 1, 2),
            input_ids=torch.tensor(ids),
            attention_mask=torch.ones_like(torch.tensor(ids)),
        )
    ref = out.logits_per_image.numpy()

    img_emb = encode_image(params, cfg, jnp.asarray(pixels), dtype=jnp.float32)
    txt_emb = encode_text(params, cfg, jnp.asarray(ids.astype(np.int32)), dtype=jnp.float32)
    ours = np.asarray(logits_per_image(params, img_emb, txt_emb))
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_clip_matches_hf_at_production_widths(rng):
    """Converter parity at the REAL ViT-L/14-336 widths (hidden 1024/768,
    16/12 heads, projection 768, 336px/14px patches, vocab 49408) with the
    layer count cut to 2 so it runs on the CPU host. Validates that
    `load_clip` on an actual openai/clip-vit-large-patch14-336 checkpoint
    (clip_scoring.py:150-151) would reproduce HF logits — the only scale
    difference left is num_hidden_layers."""
    torch = pytest.importorskip("torch")
    import transformers

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
    torch.manual_seed(0)
    model = transformers.CLIPModel(hf_cfg).eval()

    from dream2real_tpu.clip.convert import config_from_hf, params_from_hf_state_dict

    cfg = config_from_hf(hf_cfg)
    assert cfg.vision_width == 1024 and cfg.projection_dim == 768
    assert cfg.image_size == 336 and cfg.patch_size == 14
    params = params_from_hf_state_dict(model.state_dict(), cfg)

    pixels = rng.normal(size=(1, 336, 336, 3)).astype(np.float32)
    ids = np.zeros((2, 77), np.int64)
    ids[:, 0] = 49406
    ids[0, 1:4] = [320, 1125, 49407]
    ids[1, 1:6] = [320, 2368, 525, 320, 49407]

    with torch.no_grad():
        out = model(
            pixel_values=torch.tensor(pixels).permute(0, 3, 1, 2),
            input_ids=torch.tensor(ids),
            attention_mask=torch.ones_like(torch.tensor(ids)),
        )
    ref = out.logits_per_image.numpy()

    img_emb = encode_image(params, cfg, jnp.asarray(pixels), dtype=jnp.float32)
    txt_emb = encode_text(
        params, cfg, jnp.asarray(ids.astype(np.int32)), dtype=jnp.float32
    )
    ours = np.asarray(logits_per_image(params, img_emb, txt_emb))
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=1e-3)


def test_build_captions_and_reduce_logits(rng):
    caps = build_captions("an apple on a plate", ["an apple and a plate"], use_templates=False)
    assert caps == ["an apple on a plate", "an apple and a plate"]
    caps_t = build_captions("g", ["n1", "n2"], use_templates=True)
    assert len(caps_t) == 27 and caps_t[1] == "a photo of g"

    # no templates, with norm captions: goal / mean(norm)  (clip_scoring.py:200-203)
    lg = jnp.asarray(rng.uniform(1, 10, size=(5, 3)).astype(np.float32))
    out = np.asarray(reduce_logits(lg, n_norm=2, use_templates=False))
    ref = np.asarray(lg[:, 0]) / np.asarray(lg[:, 1:]).mean(axis=1)
    np.testing.assert_allclose(out, ref, rtol=1e-6)

    # templates, no norm: mean across templates (clip_scoring.py:189-190)
    lg9 = jnp.asarray(rng.uniform(1, 10, size=(4, 9)).astype(np.float32))
    out9 = np.asarray(reduce_logits(lg9, n_norm=0, use_templates=True))
    np.testing.assert_allclose(out9, np.asarray(lg9).mean(axis=1), rtol=1e-6)

    # templates with norm: mean(goal templates) / mean(norm templates) (192-195)
    lg18 = jnp.asarray(rng.uniform(1, 10, size=(4, 18)).astype(np.float32))
    out18 = np.asarray(reduce_logits(lg18, n_norm=1, use_templates=True))
    ref18 = np.asarray(lg18[:, :9]).mean(1) / np.asarray(lg18[:, 9:]).mean(1)
    np.testing.assert_allclose(out18, ref18, rtol=1e-6)


def test_scorer_end_to_end_tiny(rng):
    from dream2real_tpu.clip.scorer import ClipScorer
    from dream2real_tpu.clip.tokenizer import ClipTokenizer

    params = init_clip_params(jax.random.PRNGKey(1), TINY)
    tok = ClipTokenizer(context_length=16, vocab_size=128)
    # Force the hash fallback with ids in range.
    tok._tok = None
    renders = rng.integers(0, 255, size=(7, 32, 32, 3), dtype=np.uint8)
    scorer = ClipScorer(params, TINY, batch_size=4)

    def tok_small(texts):
        ids = tok(texts)
        return np.clip(ids % 128, 0, 127).astype(np.int32)[:, :16]

    scores = scorer.score(renders, "goal", ["norm"], tok_small)
    assert scores.shape == (7,)
    assert np.isfinite(scores).all()
    # Deterministic across calls.
    scores2 = scorer.score(renders, "goal", ["norm"], tok_small)
    np.testing.assert_allclose(scores, scores2, atol=1e-5)
