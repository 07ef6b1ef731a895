"""Legacy 2D image compositor (pre-NeRF baseline path).

Parity target: clip_scoring.py:28-63 (`composite_images`) — paste object
crops onto a background crop at normalized 2D positions, used by the early 2D
experiments and kept for completeness. Pure numpy.
"""

from __future__ import annotations

import numpy as np


def _ensure_rgba(img: np.ndarray) -> np.ndarray:
    if img.shape[-1] == 4:
        return img.copy()
    a = np.full(img.shape[:2] + (1,), 255, img.dtype)
    return np.concatenate([img, a], axis=-1)


def composite_images(objs, bground_idx: int) -> np.ndarray:
    """objs: list of ObjectModel2D (obj_crop (H,W,3|4) u8, pos (x,y) in
    [-1,1]). Returns the composite RGBA (channels-first like the reference's
    CHW output is NOT kept — we return HWC)."""
    bground = objs[bground_idx]
    others = [o for i, o in enumerate(objs) if i != bground_idx]
    comp = _ensure_rgba(np.asarray(bground.obj_crop))
    bh, bw = comp.shape[:2]

    for obj in others:
        crop = _ensure_rgba(np.asarray(obj.obj_crop))
        ch, cw = crop.shape[:2]
        # Centre placement + normalized pose offset (clip_scoring.py:52-58:
        # +x right, +y up -> row offset is negated).
        tx = int(obj.pos[0] * bw // 2) + (bw // 2 - cw // 2)
        ty = int(-1 * obj.pos[1] * bh // 2) + (bh // 2 - ch // 2)
        x0, y0 = max(tx, 0), max(ty, 0)
        x1, y1 = min(tx + cw, bw), min(ty + ch, bh)
        if x0 >= x1 or y0 >= y1:
            continue
        src = crop[y0 - ty : y1 - ty, x0 - tx : x1 - tx]
        dst = comp[y0:y1, x0:x1]
        opaque = src[..., 3] > 229  # alpha > 0.9 * 255 (clip_scoring.py:61)
        dst[..., :3][opaque] = src[..., :3][opaque]
    return comp


def normalise_tensor(x: np.ndarray) -> np.ndarray:
    """Min-max normalize (clip_scoring.py:66-69)."""
    x = np.asarray(x, np.float64).copy()
    x -= x.min()
    x /= max(x.max(), 1e-12)
    return x
