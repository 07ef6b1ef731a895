"""HF transformers CLIPModel -> JAX params converter.

Lets the scorer load openai/clip-vit-large-patch14-336 (the checkpoint the
reference uses, clip_scoring.py:150) from a local HF checkpoint directory or
an in-memory torch model. No network access is assumed: pass a path via
``D2R_CLIP_PATH`` or a loaded ``transformers.CLIPModel``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from dream2real_tpu.clip.model import CLIPConfig


def config_from_hf(hf_cfg) -> CLIPConfig:
    v, t = hf_cfg.vision_config, hf_cfg.text_config
    return CLIPConfig(
        image_size=v.image_size,
        patch_size=v.patch_size,
        vision_width=v.hidden_size,
        vision_layers=v.num_hidden_layers,
        vision_heads=v.num_attention_heads,
        vocab_size=t.vocab_size,
        context_length=t.max_position_embeddings,
        text_width=t.hidden_size,
        text_layers=t.num_hidden_layers,
        text_heads=t.num_attention_heads,
        projection_dim=hf_cfg.projection_dim,
        eot_id=t.eos_token_id,
    )


def _linear(sd, prefix):
    return {
        "w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T),
        "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"])),
    }


def _qkv(sd, prefix):
    # HF stores q/k/v separately; our layout is one fused qkv matrix.
    qw = np.asarray(sd[f"{prefix}.q_proj.weight"])
    kw = np.asarray(sd[f"{prefix}.k_proj.weight"])
    vw = np.asarray(sd[f"{prefix}.v_proj.weight"])
    qb = np.asarray(sd[f"{prefix}.q_proj.bias"])
    kb = np.asarray(sd[f"{prefix}.k_proj.bias"])
    vb = np.asarray(sd[f"{prefix}.v_proj.bias"])
    return {
        "w": jnp.asarray(np.concatenate([qw, kw, vw], axis=0).T),
        "b": jnp.asarray(np.concatenate([qb, kb, vb], axis=0)),
    }


def _block(sd, prefix):
    return {
        "ln1_g": jnp.asarray(np.asarray(sd[f"{prefix}.layer_norm1.weight"])),
        "ln1_b": jnp.asarray(np.asarray(sd[f"{prefix}.layer_norm1.bias"])),
        "qkv": _qkv(sd, f"{prefix}.self_attn"),
        "proj": _linear(sd, f"{prefix}.self_attn.out_proj"),
        "ln2_g": jnp.asarray(np.asarray(sd[f"{prefix}.layer_norm2.weight"])),
        "ln2_b": jnp.asarray(np.asarray(sd[f"{prefix}.layer_norm2.bias"])),
        "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
        "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
    }


def params_from_hf_state_dict(sd: dict, cfg: CLIPConfig) -> dict[str, Any]:
    """Convert a transformers CLIPModel state_dict (torch tensors or numpy)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v) for k, v in sd.items()}
    p: dict[str, Any] = {}
    vm = "vision_model"
    # (W, 3, ps, ps) conv kernel -> (ps, ps, 3, W).
    patch = np.asarray(sd[f"{vm}.embeddings.patch_embedding.weight"])
    p["v_patch_w"] = jnp.asarray(patch.transpose(2, 3, 1, 0))
    p["v_class_emb"] = jnp.asarray(np.asarray(sd[f"{vm}.embeddings.class_embedding"]))
    p["v_pos_emb"] = jnp.asarray(np.asarray(sd[f"{vm}.embeddings.position_embedding.weight"]))
    p["v_ln_pre_g"] = jnp.asarray(np.asarray(sd[f"{vm}.pre_layrnorm.weight"]))
    p["v_ln_pre_b"] = jnp.asarray(np.asarray(sd[f"{vm}.pre_layrnorm.bias"]))
    p["v_ln_post_g"] = jnp.asarray(np.asarray(sd[f"{vm}.post_layernorm.weight"]))
    p["v_ln_post_b"] = jnp.asarray(np.asarray(sd[f"{vm}.post_layernorm.bias"]))
    p["v_proj"] = jnp.asarray(np.asarray(sd["visual_projection.weight"]).T)
    for i in range(cfg.vision_layers):
        p[f"v_blk{i}"] = _block(sd, f"{vm}.encoder.layers.{i}")

    tm = "text_model"
    p["t_tok_emb"] = jnp.asarray(np.asarray(sd[f"{tm}.embeddings.token_embedding.weight"]))
    p["t_pos_emb"] = jnp.asarray(np.asarray(sd[f"{tm}.embeddings.position_embedding.weight"]))
    p["t_ln_final_g"] = jnp.asarray(np.asarray(sd[f"{tm}.final_layer_norm.weight"]))
    p["t_ln_final_b"] = jnp.asarray(np.asarray(sd[f"{tm}.final_layer_norm.bias"]))
    p["t_proj"] = jnp.asarray(np.asarray(sd["text_projection.weight"]).T)
    for i in range(cfg.text_layers):
        p[f"t_blk{i}"] = _block(sd, f"{tm}.encoder.layers.{i}")
    p["logit_scale"] = jnp.asarray(np.asarray(sd["logit_scale"]), jnp.float32)
    return p


def vit_l_336_hf_config():
    """The REAL openai/clip-vit-large-patch14-336 architecture as a
    transformers CLIPConfig (clip_scoring.py:150-151's checkpoint). Built
    locally — no network access."""
    import transformers

    return transformers.CLIPConfig(
        projection_dim=768,
        text_config_dict=dict(
            hidden_size=768, intermediate_size=3072, num_hidden_layers=12,
            num_attention_heads=12, max_position_embeddings=77,
            vocab_size=49408, hidden_act="quick_gelu", eos_token_id=49407,
        ),
        vision_config_dict=dict(
            hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
            num_attention_heads=16, image_size=336, patch_size=14,
            hidden_act="quick_gelu",
        ),
    )


def write_random_hf_checkpoint(out_dir: str, hf_config=None, seed: int = 0) -> str:
    """Write a random-weight HF CLIP checkpoint with the REAL tensor
    names/shapes/file layout (config.json + model.safetensors), so
    `load_clip` can be dry-run exactly as it would consume the production
    openai/clip-vit-large-patch14-336 download. Shapes are taken from a
    meta-device CLIPModel instantiation (no full-size torch init needed);
    values are N(0, 0.02) — valid for exercising the load path, useless for
    scoring. Returns out_dir."""
    import os

    import torch
    import transformers
    from safetensors.torch import save_file

    if hf_config is None:
        hf_config = vit_l_336_hf_config()
    with torch.device("meta"):
        shapes = {
            k: tuple(v.shape)
            for k, v in transformers.CLIPModel(hf_config).state_dict().items()
        }
    rng = np.random.default_rng(seed)
    sd = {
        k: torch.from_numpy(rng.normal(0.0, 0.02, s).astype(np.float32))
        for k, s in shapes.items()
    }
    os.makedirs(out_dir, exist_ok=True)
    hf_config.save_pretrained(out_dir)
    save_file(sd, os.path.join(out_dir, "model.safetensors"))
    return out_dir


def load_clip(path_or_model=None) -> tuple[dict, CLIPConfig]:
    """Load CLIP weights from a local HF checkpoint dir / CLIPModel instance.

    Resolution order: explicit arg -> $D2R_CLIP_PATH -> HF cache. Raises
    FileNotFoundError when no checkpoint is reachable (callers fall back to
    random weights for smoke runs).
    """
    import os

    if path_or_model is None:
        path_or_model = os.environ.get("D2R_CLIP_PATH")
    if path_or_model is None:
        path_or_model = "openai/clip-vit-large-patch14-336"

    if hasattr(path_or_model, "state_dict"):  # a torch CLIPModel
        model = path_or_model
    else:
        from transformers import CLIPModel

        try:
            model = CLIPModel.from_pretrained(path_or_model, local_files_only=True)
        except Exception as e:
            raise FileNotFoundError(
                f"No local CLIP checkpoint at {path_or_model!r}: {e}"
            ) from e
    cfg = config_from_hf(model.config)
    return params_from_hf_state_dict(model.state_dict(), cfg), cfg
