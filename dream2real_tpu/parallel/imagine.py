"""Sharded imagine-and-score: the fused multi-chip hot loop.

One program: pose batch sharded over the mesh; per device, a scan renders each
candidate pose (virtual-camera trick -> fg march -> depth composite) and
scores it with the CLIP image tower against precomputed text embeddings. The
only cross-device communication is the implicit all-gather of the (K,) score
vector at the end — scores ride ICI, renders never leave their device.

This collapses the reference's hot loops #4 and #5 (SURVEY §3.1) into a
single launch spanning the slice.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dream2real_tpu.clip.model import (
    CLIPConfig,
    encode_image,
    logits_per_image,
    preprocess_images,
)
from dream2real_tpu.clip.scorer import reduce_logits
from dream2real_tpu.nerf.combined import composite_one
from dream2real_tpu.nerf.model import NGPConfig
from dream2real_tpu.nerf.render import RenderSettings, render_image
from dream2real_tpu.ops.se3 import convert_virtual_pose
from dream2real_tpu.parallel.mesh import DATA_AXIS


def make_imagine_and_score(
    fg_cfg: NGPConfig,
    clip_cfg: CLIPConfig,
    settings: RenderSettings,
    dirs_cam: jnp.ndarray,
    n_norm_captions: int,
    use_templates: bool = False,
    mesh: Optional[Mesh] = None,
    clip_batch: int = 8,
    row_chunk: int = 56,
    obj_aabb=None,
    fg_crop: int = 0,
    crop_settings: Optional[RenderSettings] = None,
    intrinsics=None,
    render_batch: int = 4,
    return_renders: bool = False,
):
    """Build score_fn(fg_params, clip_params, T_WO_1, T_WC_1, bg, txt_emb,
    poses (K, 4, 4)) -> (K,) scores.

    With a mesh, poses shard over DATA_AXIS (K must divide by mesh size);
    without, it is the single-chip fused program.

    return_renders=True additionally returns the (K, res, res, 3) u8
    composites (pre-rot90, i.e. the cb_render/ artifact orientation) so the
    caller can stream them to disk without leaving the fused path.
    """

    res = dirs_cam.shape[0]
    rc = row_chunk if res % max(row_chunk, 1) == 0 else 0
    use_crop = bool(fg_crop) and obj_aabb is not None
    if use_crop:
        from dream2real_tpu.nerf.combined import (
            background_only_image,
            render_pose_cropped,
        )

        import os

        # Uniform sampling: tight march range makes hierarchical resampling
        # pure overhead (~19ms/pose for the pdf machinery on v5e).
        # D2R_CROP_SAMPLES tunes the per-ray sample count (default 20 since
        # round 4 — measurements + oracle gates in combined.CombinedRenderer).
        crop_settings = crop_settings or settings._replace(
            n_coarse=int(os.environ.get("D2R_CROP_SAMPLES", "20")), n_fine=0
        )
        K = jnp.asarray(intrinsics)

    def render_one(fg_params, T_WO_1, T_WC_1, bg, bg_only, T_WO_2):
        if use_crop:
            # Fast path: march only the object's projected crop window with a
            # tight t-range; paste over the precomputed background frame.
            return render_pose_cropped(
                fg_params, fg_cfg, crop_settings, dirs_cam, K, obj_aabb,
                fg_crop, T_WO_1, T_WC_1, bg, bg_only, T_WO_2,
            )
        T_WC_2 = convert_virtual_pose(T_WO_1, T_WO_2, T_WC_1)
        # Row-chunked march bounds peak activation memory (a full 336^2 x 64
        # sample render would hold multi-GB MLP activations at once).
        out = render_image(fg_params, fg_cfg, T_WC_2, dirs_cam, settings, row_chunk=rc)
        return composite_one(out["rgb"], out["alpha"], out["depth"], bg)

    def score_local(fg_params, clip_params, T_WO_1, T_WC_1, bg, txt_emb, poses):
        # poses: (k_local, 4, 4). Scan in clip_batch-sized sub-batches so the
        # ViT runs with a batch dimension (MXU efficiency) while renders stay
        # one-at-a-time (each render already fills the chip).
        k = poses.shape[0]
        assert k % clip_batch == 0, (k, clip_batch)
        groups = poses.reshape(k // clip_batch, clip_batch, 4, 4)
        bg_only = background_only_image(bg) if use_crop else None

        import os

        rb = int(os.environ.get("D2R_RENDER_BATCH", str(render_batch)))
        # rb <= 0 (e.g. D2R_RENDER_BATCH=0) means "no render batching".
        rv = rb if use_crop and rb >= 1 and clip_batch % rb == 0 else 1

        def group_body(carry, pose_group):
            # vmap `rv` cropped renders per step: one 128^2 x 32-sample march
            # underfills the chip; a few in parallel restore MXU occupancy.
            sub = pose_group.reshape(clip_batch // rv, rv, 4, 4)

            def r_body(c, Ts):
                imgs = jax.vmap(
                    lambda T: render_one(fg_params, T_WO_1, T_WC_1, bg, bg_only, T)
                )(Ts)
                return c, imgs

            _, imgs = jax.lax.scan(r_body, 0, sub)
            renders_u8 = imgs.reshape(clip_batch, *imgs.shape[2:])  # (B, res, res, 3)
            imgs = jnp.rot90(renders_u8, k=1, axes=(1, 2))  # clip_scoring.py:145
            pixels = preprocess_images(imgs, clip_cfg)
            emb = encode_image(clip_params, clip_cfg, pixels)
            lg = logits_per_image(clip_params, emb, txt_emb)
            scores = reduce_logits(lg, n_norm_captions, use_templates)
            if return_renders:
                return carry, (scores, renders_u8)
            return carry, scores

        _, out = jax.lax.scan(group_body, 0, groups)
        if return_renders:
            scores, renders = out
            return scores.reshape(-1), renders.reshape(-1, *renders.shape[2:])
        return out.reshape(-1)

    if mesh is None:
        return jax.jit(score_local)

    sharded = jax.shard_map(
        score_local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)) if return_renders else P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(sharded)
