"""CLIP render scoring: batched logits + the reference's normalisation math.

Parity target: clip_scoring.py:144-209 —
- renders rotated 90 deg before CLIP (line 145: np.rot90 k=1 over (H, W));
- text = goal caption + normalising captions, optionally expanded with the 9
  CLIP_TEMPLATES (lines 155-163, clip_text_templates.py);
- score = goal logit / mean(norm logits) (lines 196-203);
- scores scattered back into the full pose grid (lines 205-209).

TPU-first: the image tower runs in one jitted scan over fixed-size batches,
optionally sharded over a device mesh along the image axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dream2real_tpu.clip.model import (
    CLIPConfig,
    encode_image,
    encode_text,
    logits_per_image,
    preprocess_images,
)

# clip_text_templates.py:1-11, verbatim.
CLIP_TEMPLATES = [
    "{}",
    "a photo of {}",
    "a bad photo of {}",
    "a good photo of {}",
    "a low resolution photo of {}",
    "a cropped photo of {}",
    "a bright photo of {}",
    "a dark photo of {}",
    "a painting of {}",
]


def build_captions(
    goal_caption: str,
    norm_captions: Optional[Sequence[str]],
    use_templates: bool = False,
) -> list[str]:
    """Caption list layout matching clip_scoring.py:155-163."""
    if use_templates:
        captions = [t.format(goal_caption) for t in CLIP_TEMPLATES]
        if norm_captions is not None:
            for nc in norm_captions:
                captions += [t.format(nc) for t in CLIP_TEMPLATES]
        return captions
    return [goal_caption] if norm_captions is None else [goal_caption] + list(norm_captions)


def reduce_logits(
    all_logits: jnp.ndarray,
    n_norm: int,
    use_templates: bool,
) -> jnp.ndarray:
    """(N, n_captions) -> (N,) scores. Parity: clip_scoring.py:187-203."""
    if use_templates:
        n_t = len(CLIP_TEMPLATES)
        if n_norm == 0:
            return all_logits.mean(axis=1)
        goal = all_logits[:, :n_t].mean(axis=1)
        norm = all_logits[:, n_t:].mean(axis=1)
        return goal / norm
    if n_norm == 0:
        return all_logits[:, 0]
    goal = all_logits[:, 0]
    norm = all_logits[:, 1:].mean(axis=1)
    return goal / norm


class ClipScorer:
    def __init__(
        self,
        params,
        cfg: CLIPConfig,
        batch_size: int = 256,
        image_sharding=None,
    ):
        self.params = params
        self.cfg = cfg
        self.batch_size = batch_size
        self.image_sharding = image_sharding
        self._encode_batch = jax.jit(self._make_encode())
        self._encode_text = jax.jit(
            lambda p, ids: encode_text(p, self.cfg, ids)
        )

    def _make_encode(self):
        cfg = self.cfg

        def encode(params, images_u8):
            # Rotate 90 deg like the reference feeds CLIP (clip_scoring.py:145
            # uses np.rot90 k=1 over (H, W) == transpose + flip rows).
            imgs = jnp.rot90(images_u8, k=1, axes=(1, 2))
            if self.image_sharding is not None:
                imgs = jax.lax.with_sharding_constraint(imgs, self.image_sharding)
            pixels = preprocess_images(imgs, cfg)
            return encode_image(params, cfg, pixels)

        return encode

    def text_embeddings(self, ids: np.ndarray) -> jnp.ndarray:
        return self._encode_text(self.params, jnp.asarray(ids))

    def logits(self, renders_u8, ids: np.ndarray) -> np.ndarray:
        """renders_u8: (N, res, res, 3) -> (N, n_captions) logits_per_image."""
        txt = self.text_embeddings(ids)
        n = renders_u8.shape[0]
        bs = self.batch_size
        outs = []
        for start in range(0, n, bs):
            batch = jnp.asarray(renders_u8[start : start + bs])
            pad = 0
            if batch.shape[0] < bs:
                pad = bs - batch.shape[0]
                batch = jnp.concatenate(
                    [batch, jnp.zeros((pad,) + batch.shape[1:], batch.dtype)], axis=0
                )
            emb = self._encode_batch(self.params, batch)
            lg = logits_per_image(self.params, emb, txt)
            outs.append(np.asarray(lg[: bs - pad]))
        return np.concatenate(outs, axis=0)

    def score(
        self,
        renders_u8,
        goal_caption: str,
        norm_captions: Optional[Sequence[str]],
        tokenizer,
        use_templates: bool = False,
    ) -> np.ndarray:
        captions = build_captions(goal_caption, norm_captions, use_templates)
        ids = tokenizer(captions)
        all_logits = self.logits(renders_u8, ids)
        n_norm = 0 if norm_captions is None else len(norm_captions)
        return np.asarray(
            reduce_logits(jnp.asarray(all_logits), n_norm, use_templates)
        )
