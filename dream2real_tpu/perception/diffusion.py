"""Diffusion inpainting (optional; gated external model).

Parity target: diffusion.py:11-45 — SD-2 text-to-image and hole inpainting,
gated by the `inpaint_holes` config flag (effectively unused: every demo
config sets it false, configs/shopping_demo.json:6, dream2real.py:84-87).

The diffusers pipeline is an orchestration-level external model. When the
package/checkpoint is absent we provide a deterministic classical fallback
(telea-style inpainting via cv2) so the `inpaint_holes` path stays runnable.
"""

from __future__ import annotations

import numpy as np


def _auto_mask(img: np.ndarray) -> np.ndarray:
    """White pixels (all channels > 200) are the holes (diffusion.py:24-27)."""
    return np.all(img > 200, axis=-1).astype(np.uint8) * 255


def txt2img(prompt: str):
    from diffusers import StableDiffusionPipeline  # gated import

    pipeline = StableDiffusionPipeline.from_pretrained(
        "stabilityai/stable-diffusion-2-1", local_files_only=True
    )
    return pipeline(prompt=prompt).images


def inpaint(img: np.ndarray, mask: np.ndarray | None = None, pipeline=None, prompt: str = ""):
    """Inpaint holes. img: (H, W, 3) uint8. mask: (H, W) nonzero = inpaint.

    Tries the SD-2 inpainting pipeline (local checkpoint); falls back to
    cv2.INPAINT_TELEA, which fills scan holes plausibly enough for the
    background-cleanup use-case.
    """
    img = np.asarray(img)
    if mask is None:
        mask = _auto_mask(img)
    mask = np.asarray(mask).astype(np.uint8)

    try:
        from PIL import Image

        if pipeline is None:
            from diffusers import StableDiffusionInpaintPipeline

            pipeline = StableDiffusionInpaintPipeline.from_pretrained(
                "stabilityai/stable-diffusion-2-inpainting",
                requires_safety_checker=False,
                local_files_only=True,
            )
        pil = Image.fromarray(img).resize((512, 512), Image.NEAREST)
        pil_mask = Image.fromarray(mask).resize((512, 512), Image.NEAREST)
        out = pipeline(prompt=prompt, image=pil, mask_image=pil_mask).images[0]
        return np.asarray(out.resize((img.shape[1], img.shape[0]), Image.NEAREST))
    except Exception:
        import cv2

        return cv2.inpaint(img, (mask > 0).astype(np.uint8), 3, cv2.INPAINT_TELEA)
