"""Spatial smoothing of the pose-score heatmap.

Parity target: vision_3d/geometry_utils.py:252-269 (`spatially_smooth_heatmap`):
scores reshaped to an (x, y) image batch per (z, orientation) slice, invalid
(zero-score) poses temporarily filled with the min nonzero score, padded by one
pixel with that fill value, blurred with a 3x3 gaussian (sigma 0.7), unpadded,
and invalid entries re-zeroed (so smoothing never leaks score into physically
invalid poses, clip_scoring.py:205-216).

TPU note: this is a tiny elementwise+conv op; it runs fused at the end of the
scoring program, on-device, instead of the reference's CPU round-trip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dream2real_tpu.ops.image import gaussian_blur


def spatially_smooth_heatmap(
    pose_scores: jnp.ndarray, sample_res, sigma: float = 0.7
) -> jnp.ndarray:
    """pose_scores: (prod(sample_res),) -> smoothed scores, same shape.

    Jitted into ONE program: the eager op chain paid ~15 separate device
    dispatches over the tunneled runtime (~10 s at reference scale even with
    every mini-program compile-cached, refscale_opt_r5.json); as one cached
    executable the warmed call is a single dispatch + one tiny D2H.
    """
    return _smooth_jit(pose_scores, tuple(int(r) for r in sample_res), sigma)


@partial(jax.jit, static_argnums=(1, 2))
def _smooth_jit(pose_scores: jnp.ndarray, sample_res, sigma) -> jnp.ndarray:
    res = [int(r) for r in sample_res]
    n_xy = res[0] * res[1]
    n_rest = res[2] * res[3] * res[4] * res[5]

    zero_mask = pose_scores == 0
    # Min over nonzero entries (geometry_utils.py:254). If everything is zero
    # the reference would crash; we return zeros.
    big = jnp.max(jnp.abs(pose_scores)) + 1.0
    min_nonzero = jnp.min(jnp.where(zero_mask, big, pose_scores))
    filled = jnp.where(zero_mask, min_nonzero, pose_scores)

    # (res0*res1, rest) -> (rest, res0, res1): for torch.cartesian_prod order,
    # the first axis of the (n_xy, n_rest) view enumerates (x, y) and the
    # second the remaining dims (geometry_utils.py:257-260).
    imgs = filled.reshape(n_xy, n_rest).swapaxes(0, 1).reshape(n_rest, res[0], res[1])

    # Constant pad of 1 px with min_nonzero (geometry_utils.py:261).
    imgs = jnp.pad(imgs, ((0, 0), (1, 1), (1, 1)), constant_values=min_nonzero)

    smoothed = gaussian_blur(imgs, kernel_size=3, sigma=sigma)
    smoothed = smoothed[:, 1:-1, 1:-1]

    out = smoothed.reshape(n_rest, n_xy).swapaxes(0, 1).reshape(-1)
    return jnp.where(zero_mask, 0.0, out)
