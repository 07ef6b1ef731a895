"""Small vis helpers. Parity: vis_utils.py:15-51 (pastel palette, visimg)."""

from __future__ import annotations

import numpy as np

# vis_utils.py:15-26 palette (object coloring in mesh/seg visualisations).
pastel_colors = np.array(
    [
        [255, 179, 186],
        [255, 223, 186],
        [255, 255, 186],
        [186, 255, 201],
        [186, 225, 255],
        [201, 186, 255],
        [255, 186, 255],
        [255, 186, 201],
        [186, 255, 255],
        [222, 186, 255],
    ]
)


def visimg(img, path: str | None = None):
    """Save (or return) a tensor/array as an image. The reference pops up an
    interactive window (vis_utils.py:29-51); headless hosts save to disk."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8) if arr.max() <= 1.0 else arr.astype(np.uint8)
    if path is not None:
        from PIL import Image

        Image.fromarray(arr).save(path)
    return arr


def seg_overlay(rgb: np.ndarray, mask: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """Colorize an instance mask over an RGB image (visseg equivalent)."""
    out = rgb.astype(np.float32).copy()
    for idx in np.unique(mask):
        if idx in (0, 255):
            continue
        col = pastel_colors[idx % len(pastel_colors)]
        sel = mask == idx
        out[sel] = (1 - alpha) * out[sel] + alpha * col
    return out.astype(np.uint8)
