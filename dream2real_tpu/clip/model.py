"""CLIP dual-tower model in pure JAX (pytree params, bf16 MXU compute).

Architecture matches openai/clip-vit-large-patch14-336 (the scorer the
reference loads at clip_scoring.py:150-151) so that converted HF weights
reproduce its logits; `CLIPConfig` also scales down for hermetic tests.

Layout notes (TPU-first):
- all heavy math is batched matmul/einsum in bf16 with f32 accumulation;
- image batches of renders feed straight from the combined renderer without
  leaving HBM;
- parameters are a flat dict pytree -> trivially shardable/replicated with
  jax.sharding.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class CLIPConfig(NamedTuple):
    # Vision tower (ViT-L/14-336 defaults).
    image_size: int = 336
    patch_size: int = 14
    vision_width: int = 1024
    vision_layers: int = 24
    vision_heads: int = 16
    # Text tower.
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 768
    text_layers: int = 12
    text_heads: int = 12
    # Joint embedding.
    projection_dim: int = 768
    # EOT/EOS token id for text pooling (HF pools the hidden state at the
    # FIRST occurrence of eos_token_id; 49407 for the openai checkpoints).
    eot_id: int = 49407

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


def _init_linear(key, d_in, d_out, scale=None):
    scale = scale if scale is not None else d_in**-0.5
    return {
        "w": jax.random.normal(key, (d_in, d_out)) * scale,
        "b": jnp.zeros((d_out,)),
    }


def _init_block(key, width, mlp_ratio=4):
    ks = jax.random.split(key, 4)
    return {
        "ln1_g": jnp.ones((width,)), "ln1_b": jnp.zeros((width,)),
        "qkv": _init_linear(ks[0], width, 3 * width),
        "proj": _init_linear(ks[1], width, width),
        "ln2_g": jnp.ones((width,)), "ln2_b": jnp.zeros((width,)),
        "fc1": _init_linear(ks[2], width, mlp_ratio * width),
        "fc2": _init_linear(ks[3], mlp_ratio * width, width),
    }


def init_clip_params(key: jax.Array, cfg: CLIPConfig) -> dict[str, Any]:
    ks = jax.random.split(key, 8 + cfg.vision_layers + cfg.text_layers)
    n_patches = cfg.grid * cfg.grid
    p: dict[str, Any] = {
        # Vision.
        "v_patch_w": jax.random.normal(ks[0], (cfg.patch_size, cfg.patch_size, 3, cfg.vision_width)) * 0.02,
        "v_class_emb": jax.random.normal(ks[1], (cfg.vision_width,)) * 0.02,
        "v_pos_emb": jax.random.normal(ks[2], (n_patches + 1, cfg.vision_width)) * 0.02,
        "v_ln_pre_g": jnp.ones((cfg.vision_width,)), "v_ln_pre_b": jnp.zeros((cfg.vision_width,)),
        "v_ln_post_g": jnp.ones((cfg.vision_width,)), "v_ln_post_b": jnp.zeros((cfg.vision_width,)),
        "v_proj": jax.random.normal(ks[3], (cfg.vision_width, cfg.projection_dim)) * cfg.vision_width**-0.5,
        # Text.
        "t_tok_emb": jax.random.normal(ks[4], (cfg.vocab_size, cfg.text_width)) * 0.02,
        "t_pos_emb": jax.random.normal(ks[5], (cfg.context_length, cfg.text_width)) * 0.01,
        "t_ln_final_g": jnp.ones((cfg.text_width,)), "t_ln_final_b": jnp.zeros((cfg.text_width,)),
        "t_proj": jax.random.normal(ks[6], (cfg.text_width, cfg.projection_dim)) * cfg.text_width**-0.5,
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }
    for i in range(cfg.vision_layers):
        p[f"v_blk{i}"] = _init_block(ks[8 + i], cfg.vision_width)
    for i in range(cfg.text_layers):
        p[f"t_blk{i}"] = _init_block(ks[8 + cfg.vision_layers + i], cfg.text_width)
    return p


def _ln(x, g, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def _attn(x, blk, n_heads, mask=None, dtype=jnp.bfloat16, causal=False):
    """mask semantics: None (bidirectional, vision tower) or causal=True
    (text tower). An explicit additive `mask` forces the XLA fallback."""
    B, T, W = x.shape
    qkv = jnp.dot(x, blk["qkv"]["w"].astype(dtype), preferred_element_type=jnp.float32)
    qkv = (qkv + blk["qkv"]["b"]).astype(dtype)
    if mask is None and not causal and _use_pallas_attn():
        # Fused VMEM-resident attention consuming the projection layout
        # directly: (B, H, T, 64) blocks put head_dim on the 128-lane axis
        # (half-empty tiles -> DMA-bound at ~15% HBM bandwidth); streaming
        # the (T, 3W) qkv keeps tiles full — measured 2x on the scoring
        # shape (experiments/bench_attention.py). Also skips the two XLA
        # head transposes.
        from dream2real_tpu.ops.attention import mha_qkv

        out = mha_qkv(qkv, n_heads).astype(dtype)
        out = jnp.dot(out, blk["proj"]["w"].astype(dtype),
                      preferred_element_type=jnp.float32)
        return (out + blk["proj"]["b"]).astype(dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = W // n_heads

    def heads(t):
        return t.reshape(B, T, n_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    if mask is None and _use_pallas_attn():
        # Causal (text tower): the head-split kernel with in-kernel causal
        # masking; cost is negligible at T=77.
        from dream2real_tpu.ops.attention import mha

        out = mha(q, k, v, causal=causal).astype(dtype)
    else:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits * (hd**-0.5)
        if causal:
            cm = jnp.full((T, T), -jnp.inf, jnp.float32)
            mask = jnp.triu(cm, k=1)[None, None] if mask is None else mask
        if mask is not None:
            logits = logits + mask
        w = jax.nn.softmax(logits, axis=-1).astype(dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v, preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, W).astype(dtype)
    out = jnp.dot(out, blk["proj"]["w"].astype(dtype), preferred_element_type=jnp.float32)
    return (out + blk["proj"]["b"]).astype(dtype)


def _use_pallas_attn() -> bool:
    import os

    return os.environ.get("D2R_PALLAS_ATTN", "1") != "0"


def _fused_ln_attn_mode() -> str:
    # "1" (default): LN1+qkv+attention in one pallas kernel
    # (attention.py::mha_ln_qkv); "0": split XLA LN + qkv matmul + mha_qkv.
    # Flipped default-on in round 4: "1" benched 223.8/225.0/224.5 vs
    # 216.1/218.1/217.2 poses/s for "0" (3x each, r4_tpu_session.log) and
    # the oracle validation gates pass with it on (rho 0.986 xyz / 0.938
    # rect-6dof — both >= the split path's 0.985 / 0.927). Two sibling
    # fusions were measured LOSING and deleted in round 4: folding the
    # out-projection + residual in-kernel too ("mode 2", 217.0 — the W x W
    # matmul starves the MXU per-image) and a fused LN2+fc1+GELU+fc2 MLP
    # sub-block (205.6 — XLA's batched 18k-row MLP matmuls at 79% MFU beat
    # per-image pallas tiles).
    import os

    mode = os.environ.get("D2R_ATTN_FUSED_LN", "1")
    if mode == "2":
        # "2" was the deleted out-proj-fused mode; stale round-3 settings
        # should keep the surviving fused-LN win, not silently fall back to
        # the split path.
        global _WARNED_MODE2
        if not _WARNED_MODE2:
            print("# D2R_ATTN_FUSED_LN=2 (removed mode) -> using 1 (fused LN)")
            _WARNED_MODE2 = True
        return "1"
    if mode not in ("0", "1"):
        raise ValueError(f"D2R_ATTN_FUSED_LN={mode!r}: expected 0 or 1")
    return mode


_WARNED_MODE2 = False


def _mlp_block(x, blk, dtype=jnp.bfloat16):
    h = jnp.dot(x, blk["fc1"]["w"].astype(dtype), preferred_element_type=jnp.float32)
    # Round to bf16 BEFORE the activation: the (tokens, 4096) f32
    # intermediate is ~300 MB of HBM traffic per layer at scoring batch;
    # QuickGELU (x * sigmoid(1.702 x)) is insensitive to the rounding.
    h = (h + blk["fc1"]["b"]).astype(dtype)
    h = h * jax.nn.sigmoid(1.702 * h.astype(jnp.float32)).astype(dtype)
    h = jnp.dot(h, blk["fc2"]["w"].astype(dtype), preferred_element_type=jnp.float32)
    return (h + blk["fc2"]["b"]).astype(dtype)


def _block(x, blk, n_heads, mask=None, dtype=jnp.bfloat16, causal=False):
    mode = _fused_ln_attn_mode() if mask is None and not causal else "0"
    if _use_pallas_attn() and mode == "1":
        from dream2real_tpu.ops.attention import mha_ln_qkv

        a = mha_ln_qkv(
            x.astype(dtype), blk["qkv"]["w"].astype(dtype),
            blk["qkv"]["b"], blk["ln1_g"], blk["ln1_b"], n_heads,
        ).astype(dtype)
        a = jnp.dot(a, blk["proj"]["w"].astype(dtype),
                    preferred_element_type=jnp.float32)
        x = x + (a + blk["proj"]["b"]).astype(dtype)
    else:
        x = x + _attn(
            _ln(x, blk["ln1_g"], blk["ln1_b"]), blk, n_heads, mask, dtype,
            causal,
        )
    x = x + _mlp_block(_ln(x, blk["ln2_g"], blk["ln2_b"]), blk, dtype)
    return x


def encode_image(params, cfg: CLIPConfig, pixels: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """pixels: (B, H, W, 3) float32 normalized (CLIP mean/std) -> (B, D) UNnormalized embeddings."""
    B = pixels.shape[0]
    g, ps, W = cfg.grid, cfg.patch_size, cfg.vision_width
    # Patchify as a reshaped matmul (a conv with stride=kernel==patch).
    x = pixels.reshape(B, g, ps, g, ps, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, g * g, ps * ps * 3).astype(dtype)
    pw = params["v_patch_w"].reshape(ps * ps * 3, W).astype(dtype)
    x = jnp.dot(x, pw, preferred_element_type=jnp.float32).astype(dtype)
    cls = jnp.broadcast_to(params["v_class_emb"].astype(dtype), (B, 1, W))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["v_pos_emb"].astype(dtype)
    x = _ln(x, params["v_ln_pre_g"], params["v_ln_pre_b"])
    for i in range(cfg.vision_layers - 1):
        x = _block(x, params[f"v_blk{i}"], cfg.vision_heads, dtype=dtype)
    # Final block: only the CLS row feeds ln_post/pooling, so its proj, MLP
    # and attention-query run for token 0 alone (exact same math — attention
    # keys/values still cover every token).
    blk = params[f"v_blk{cfg.vision_layers - 1}"]
    x_cls = x[:, :1] + _attn_cls(x, blk, cfg.vision_heads, dtype)
    x_cls = x_cls + _mlp_block(_ln(x_cls, blk["ln2_g"], blk["ln2_b"]), blk, dtype)
    x = _ln(x_cls[:, 0], params["v_ln_post_g"], params["v_ln_post_b"])
    return jnp.dot(
        x.astype(jnp.float32), params["v_proj"], precision=jax.lax.Precision.DEFAULT
    )


def _attn_cls(x, blk, n_heads, dtype=jnp.bfloat16):
    """Attention output for the CLS (first) token only, (B, T, W) -> (B, 1, W).

    k/v come from every token; q/proj only from token 0. Einsum path: the
    (B, H, 1, T) logits are tiny, no kernel needed."""
    B, T, W = x.shape
    xn = _ln(x, blk["ln1_g"], blk["ln1_b"])
    qkv = jnp.dot(xn, blk["qkv"]["w"].astype(dtype), preferred_element_type=jnp.float32)
    qkv = (qkv + blk["qkv"]["b"]).astype(dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = W // n_heads

    def heads(t):
        return t.reshape(B, -1, n_heads, hd).transpose(0, 2, 1, 3)

    q = heads(q[:, :1])  # (B, H, 1, hd)
    k, v = heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits * (hd**-0.5), axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v, preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(B, 1, W).astype(dtype)
    out = jnp.dot(out, blk["proj"]["w"].astype(dtype), preferred_element_type=jnp.float32)
    return (out + blk["proj"]["b"]).astype(dtype)


def encode_text(params, cfg: CLIPConfig, ids: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """ids: (B, T) int32 padded to context_length -> (B, D) UNnormalized embeddings.

    Pools the representation at the first occurrence of cfg.eot_id, matching
    HF CLIPTextModel (for the openai vocab this is the EOT token; the
    reference relies on the same pooling via CLIPModel, clip_scoring.py:180).
    """
    B, T = ids.shape
    x = params["t_tok_emb"][ids].astype(dtype)
    x = x + params["t_pos_emb"][:T].astype(dtype)
    # causal=True (not an explicit additive mask) so the fused pallas causal
    # attention path in _attn stays reachable; the XLA fallback builds the
    # same upper-triangular mask itself.
    for i in range(cfg.text_layers):
        x = _block(
            x, params[f"t_blk{i}"], cfg.text_heads, dtype=dtype, causal=True
        )
    x = _ln(x, params["t_ln_final_g"], params["t_ln_final_b"])
    eot = jnp.argmax((ids == cfg.eot_id).astype(jnp.int32), axis=-1)
    x = x[jnp.arange(B), eot]
    return jnp.dot(x.astype(jnp.float32), params["t_proj"])


def logits_per_image(params, img_emb: jnp.ndarray, txt_emb: jnp.ndarray) -> jnp.ndarray:
    """(N, D), (M, D) -> (N, M) similarity logits, matching HF CLIPModel."""
    ie = img_emb / jnp.linalg.norm(img_emb, axis=-1, keepdims=True)
    te = txt_emb / jnp.linalg.norm(txt_emb, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    return scale * ie @ te.T


# CLIPProcessor normalization constants (HF CLIPImageProcessor defaults).
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_images(images_u8: jnp.ndarray, cfg: CLIPConfig) -> jnp.ndarray:
    """(B, H, W, 3) uint8 sRGB -> normalized float pixels for encode_image.

    The renders are already CLIP_RES x CLIP_RES so the processor's
    resize/center-crop are identity; only rescale + normalize apply
    (reference relies on CLIPProcessor, clip_scoring.py:177).
    """
    x = images_u8.astype(jnp.float32) / 255.0
    if x.shape[1] != cfg.image_size or x.shape[2] != cfg.image_size:
        from dream2real_tpu.ops.image import center_crop_square, resize_image

        x = jax.vmap(
            lambda im: resize_image(center_crop_square(im), (cfg.image_size, cfg.image_size))
        )(x)
    return (x - IMAGE_MEAN) / IMAGE_STD
