"""Batched fg/bg combined renderer — the imagination hot loop.

Replaces reference reconstruction/combined_rendering.py:54-263. The reference
loops over candidate poses in Python, crossing the Python->CUDA boundary twice
per pose (Shade + Depth) and compositing in numpy on the CPU
(combined_rendering.py:117-155, hot loop #4 in SURVEY.md §3.1). Here the whole
thing is ONE compiled program: a lax.scan over the pose batch where each
iteration renders Shade+Depth in a single ray march and composites on-device;
pose batches can additionally be sharded across a device mesh (see
dream2real_tpu.parallel).

Semantics parity (combined_rendering.py:95-155):
- bg rendered once per render view with opaque black background;
- bg depth comes from GT depth rectified to the CLIP view with movable-object
  pixels pushed to depth 100 (rectify_depth/rectify_mask, lines 107-110),
  falling back to the bg NeRF's rendered depth;
- per pose: virtual-camera trick (T_WC2 = f(T_WO1, T_WO2, T_WC1), lines
  250-263), fg Shade+Depth render, per-pixel depth test (<0.05 -> 100 guard),
  composite, alpha-unpremultiply, linear->sRGB, u8, alpha<130 -> black.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dream2real_tpu.nerf.model import NGPConfig
from dream2real_tpu.nerf.render import RenderSettings, render_image
from dream2real_tpu.ops import cameras
from dream2real_tpu.ops.image import linear_to_srgb, rectify_depth, rectify_mask
from dream2real_tpu.ops.se3 import convert_virtual_pose

CLIP_RES = 336  # reference clip_scoring.py:25


def _use_march_kernel(cfg, settings, crop: int) -> bool:
    if os.environ.get("D2R_PALLAS_MARCH", "1") == "0":
        return False
    from dream2real_tpu.nerf.march_kernel import supports

    # Any crop size works: the kernel pads rays to a block multiple.
    return supports(cfg, settings)


class BackgroundView(NamedTuple):
    """Per-render-view precomputed background (amortised over all poses)."""

    rgb: jnp.ndarray  # (res, res, 3) premultiplied linear
    alpha: jnp.ndarray  # (res, res)
    depth: jnp.ndarray  # (res, res) z-depth with movable pushed far


def composite_one(fg_rgb, fg_alpha, fg_depth, bg: BackgroundView) -> jnp.ndarray:
    """Depth-composite one fg render over the background -> u8 RGB.

    Parity: combined_rendering.py:132-155.
    """
    fg_d = jnp.where(fg_depth < 0.05, 100.0, fg_depth)
    bg_d = jnp.where(bg.depth < 0.05, 100.0, bg.depth)
    near = fg_d < bg_d  # (res, res)

    rgb = jnp.where(near[..., None], fg_rgb, bg.rgb)
    alpha = jnp.where(near, fg_alpha, bg.alpha)

    # Unpremultiply (divide where alpha != 0), linear->sRGB, u8.
    safe_a = jnp.where(alpha == 0, 1.0, alpha)
    rgb = jnp.where(alpha[..., None] == 0, 0.0, rgb / safe_a[..., None])
    img = jnp.clip(linear_to_srgb(rgb), 0.0, 1.0)
    img_u8 = (img * 255.0 + 0.5).astype(jnp.uint8)
    alpha_u8 = (jnp.clip(alpha, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    # Pixels with alpha < 130 -> black (combined_rendering.py:153).
    return jnp.where(alpha_u8[..., None] < 130, jnp.uint8(0), img_u8)


def crop_window(T_WC_2, obj_aabb, intrinsics, res: int, crop: int):
    """Pixel window (v0, u0) of a crop x crop box centred on the projected
    object AABB. The fg object occupies a small screen region; rendering only
    this window (with a tight march range) is the main imagination-loop
    speedup over the reference's full-frame fg renders."""
    lo = jnp.asarray(obj_aabb[0])
    hi = jnp.asarray(obj_aabb[1])
    corners = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.where(i & 1, hi[0], lo[0]),
                    jnp.where(i & 2, hi[1], lo[1]),
                    jnp.where(i & 4, hi[2], lo[2]),
                ]
            )
            for i in range(8)
        ]
    )  # (8, 3)
    from dream2real_tpu.ops.se3 import pose_inverse

    T_CW = pose_inverse(T_WC_2)
    cam = corners @ T_CW[:3, :3].T + T_CW[:3, 3]
    z = jnp.maximum(cam[:, 2], 1e-2)
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    u = cam[:, 0] / z * fx + cx
    v = cam[:, 1] / z * fy + cy
    uc = (u.min() + u.max()) * 0.5
    vc = (v.min() + v.max()) * 0.5
    u0 = jnp.clip(jnp.round(uc - crop / 2).astype(jnp.int32), 0, res - crop)
    v0 = jnp.clip(jnp.round(vc - crop / 2).astype(jnp.int32), 0, res - crop)
    return v0, u0


def crop_extents(obj_aabb, intrinsics, res: int, T_WO_1, T_WC_1, poses):
    """Per-candidate-pose projected extent of the movable AABB, in pixels.

    Vectorised numpy replica of `crop_window`'s projection for a (K, 4, 4)
    candidate batch: returns (ext_u, ext_v), each (K,), the IN-FRAME pixel
    extent of the 8 projected AABB corners under the virtual-camera trick.
    Off-frame overhang is excluded — the full-frame render clips it too, so
    no crop size can (or needs to) recover it. A crop window of size
    >= ceil(extent) is guaranteed to cover the in-frame projection (the
    window clamp at the frame border only re-centres, never cuts, once the
    extent fits)."""
    lo = np.asarray(obj_aabb[0], np.float64)
    hi = np.asarray(obj_aabb[1], np.float64)
    corners = np.stack(
        [[hi[0] if i & 1 else lo[0],
          hi[1] if i & 2 else lo[1],
          hi[2] if i & 4 else lo[2]] for i in range(8)]
    )  # (8, 3)
    poses = np.asarray(poses, np.float64).reshape(-1, 4, 4)
    T_WO_1 = np.asarray(T_WO_1, np.float64)
    T_WC_1 = np.asarray(T_WC_1, np.float64)

    # Host-side numpy throughout: this guard runs once over the FULL candidate
    # batch before scoring, and the former eager-vmap version paid two device
    # round-trips of (K, 4, 4) each way over the tunnel (~20 s of the 70k
    # refscale run, refscale_opt_r5.json). Plain 4x4 algebra vectorises fine.
    def _inv(T):  # rigid inverse, (..., 4, 4)
        Rt = np.swapaxes(T[..., :3, :3], -1, -2)
        out = np.zeros_like(T)
        out[..., :3, :3] = Rt
        out[..., :3, 3] = -np.einsum("...ij,...j->...i", Rt, T[..., :3, 3])
        out[..., 3, 3] = 1.0
        return out

    # Virtual camera per candidate (ops/se3.py::convert_virtual_pose,
    # combined_rendering.py:250-263): T_WC_2 = T_WO_1 @ inv(T_WO_2) @ T_WO_1
    # @ inv(T_WO_1) @ T_WC_1 = T_WO_1 @ inv(T_WO_2) @ T_WC_1.
    T_WC_2 = np.einsum(
        "ij,kjl,lm->kim", T_WO_1, _inv(poses), T_WC_1
    )
    T_CW = _inv(T_WC_2)
    cam = np.einsum("kij,cj->kci", T_CW[:, :3, :3], corners) + T_CW[:, None, :3, 3]
    z = np.maximum(cam[..., 2], 1e-2)
    K = np.asarray(intrinsics, np.float64)
    u = np.clip(cam[..., 0] / z * K[0, 0] + K[0, 2], 0.0, res)
    v = np.clip(cam[..., 1] / z * K[1, 1] + K[1, 2], 0.0, res)
    return (u.max(axis=1) - u.min(axis=1)), (v.max(axis=1) - v.min(axis=1))


def required_crop(obj_aabb, intrinsics, res: int, T_WO_1, render_poses,
                  poses) -> int:
    """Smallest crop window (px) covering the movable object's in-frame
    projection for EVERY candidate pose from every render view.

    The reference renders full 336² frames unconditionally
    (combined_rendering.py:121-130), so its candidates never lose pixels; the
    cropped fast path here must not silently clip either. The +2 absorbs the
    window-centre rounding in `crop_window`; rounded up to a multiple of 16
    so crop*crop stays a lane multiple (the march kernel pads rays to its
    block size either way). Free function so the engine can predict the
    final window size BEFORE training (the scoring prefetch compiles the
    score program at that size)."""
    render_poses = np.asarray(render_poses).reshape(-1, 4, 4)
    need = 0.0
    for T_WC_1 in render_poses:
        ext_u, ext_v = crop_extents(
            obj_aabb, intrinsics, res, T_WO_1, T_WC_1, poses
        )
        need = max(need, float(ext_u.max()), float(ext_v.max()))
    return min(int(-(-(int(np.ceil(need)) + 2) // 16) * 16), res)


def background_only_image(bg: BackgroundView) -> jnp.ndarray:
    """Full-frame postprocessed background (what every pixel outside the fg
    crop shows): composite with an empty foreground."""
    res = bg.rgb.shape[0]
    empty = jnp.zeros((res, res))
    return composite_one(jnp.zeros((res, res, 3)), empty, empty, bg)


def render_pose_cropped(
    fg_params,
    fg_cfg: NGPConfig,
    settings: RenderSettings,
    dirs_cam: jnp.ndarray,
    intrinsics: jnp.ndarray,
    obj_aabb,
    crop: int,
    T_WO_1,
    T_WC_1,
    bg: BackgroundView,
    bg_only_u8: jnp.ndarray,
    T_WO_2,
) -> jnp.ndarray:
    """Fast-path single-pose render: fg marched only inside the object's
    projected crop window with a tight t-range, composited into the
    precomputed background frame. Returns (res, res, 3) u8."""
    from dream2real_tpu.nerf.render import render_rays
    from dream2real_tpu.ops.se3 import convert_virtual_pose

    T_WC_2 = convert_virtual_pose(T_WO_1, T_WO_2, T_WC_1)
    v0, u0 = crop_window(T_WC_2, obj_aabb, intrinsics, dirs_cam.shape[0], crop)
    d_crop = jax.lax.dynamic_slice(dirs_cam, (v0, u0, 0), (crop, crop, 3))
    R = T_WC_2[:3, :3]
    t = T_WC_2[:3, 3]
    dirs = jnp.einsum("ij,hwj->hwi", R, d_crop)
    if _use_march_kernel(fg_cfg, settings, crop):
        # Fused pallas march: per-sample activations never leave VMEM
        # (XLA lowering of the march is HBM-layout-bound, ~24% MFU measured).
        # Rays go in flat row-major order (2048-ray row-band blocks): a
        # tile-major reorder aimed at the kernel's block-level empty-space
        # skip was swept in round 5 and LOST at every shape (32x64 1.40 /
        # 32x32 1.28 / 16x16 1.63 vs flat 1.25 ms/pose — experiments/
        # results/bench_march_tiles.json) and was deleted; the winning
        # miss-ray lever is the kernel's early-transmittance exit
        # (march_kernel.py, flat+early 1.24 ms/pose, default on).
        from dream2real_tpu.nerf.march_kernel import march_rays_fused

        out = march_rays_fused(
            fg_params, fg_cfg, t, dirs.reshape(-1, 3), obj_aabb, settings,
        )
        out = {
            k: v.reshape((crop, crop) + v.shape[1:]) for k, v in out.items()
        }
    else:
        origins = jnp.broadcast_to(t, dirs.shape)
        out = render_rays(
            fg_params, fg_cfg, origins, dirs, settings, march_aabb=obj_aabb
        )
    bg_crop = BackgroundView(
        rgb=jax.lax.dynamic_slice(bg.rgb, (v0, u0, 0), (crop, crop, 3)),
        alpha=jax.lax.dynamic_slice(bg.alpha, (v0, u0), (crop, crop)),
        depth=jax.lax.dynamic_slice(bg.depth, (v0, u0), (crop, crop)),
    )
    img_crop = composite_one(out["rgb"], out["alpha"], out["depth"], bg_crop)
    return jax.lax.dynamic_update_slice(bg_only_u8, img_crop, (v0, u0, 0))


class CombinedRenderer:
    """Foreground/background NeRF combined renderer.

    fg/bg are (params, NGPConfig) pairs — the task-specific movable-object and
    task-background fields (reference scene_model.py:98-113, 60-96). All camera
    poses are in the accio/OpenCV convention; no NGP axis flips anywhere.
    """

    def __init__(
        self,
        fg_params,
        fg_cfg: NGPConfig,
        bg_params,
        bg_cfg: NGPConfig,
        settings: RenderSettings = RenderSettings(),
        res: int = CLIP_RES,
        intrinsics: Optional[np.ndarray] = None,
        out_render_path: Optional[str] = None,
        poses_per_dispatch: int = 64,
        row_chunk: int = 56,
        obj_aabb=None,
        fg_crop: int = 0,
        crop_settings: Optional[RenderSettings] = None,
    ):
        self.fg_params, self.fg_cfg = fg_params, fg_cfg
        self.bg_params, self.bg_cfg = bg_params, bg_cfg
        self.settings = settings
        self.res = res
        if intrinsics is None:
            intrinsics = cameras.INTRINSICS_CLIP_VIEW
        self.intrinsics = np.asarray(intrinsics)
        self.dirs_cam = cameras.pixel_dirs(res, res, jnp.asarray(self.intrinsics))
        self.out_render_path = out_render_path
        self.poses_per_dispatch = poses_per_dispatch
        self.row_chunk = row_chunk if res % max(row_chunk, 1) == 0 else 0
        # Fast path: march the fg only inside the object's projected crop
        # window with a tight t-range (obj_aabb = movable object's world
        # bounds at its initial pose — static for all candidate poses thanks
        # to the virtual-camera trick).
        self.obj_aabb = obj_aabb
        self.fg_crop = min(fg_crop, res) if fg_crop else 0
        self.crop_settings = crop_settings or settings._replace(
            # Uniform sampling: the march range is already tight (the object
            # AABB), so hierarchical resampling costs more than it saves
            # (~19ms/pose measured on v5e for the pdf machinery alone).
            # D2R_CROP_SAMPLES tunes the per-ray sample count (the t-range is
            # per-ray box entry/exit, so 20 samples over a ~10-17 cm span is
            # ~6-9 mm spacing; quality vs count is gated by the oracle
            # validation, experiments/validate_synth_argmax.py). Default 20
            # since round 4: benched 262.6/263.8 vs 248 poses/s at 24 and the
            # oracle gates PASS with argmax exact (rho 0.987 xyz, 0.937
            # rect-6dof — r4_confirm.log; 24-vs-32 history in
            # r4_tpu_session.log).
            n_coarse=int(os.environ.get("D2R_CROP_SAMPLES", "20")), n_fine=0
        )
        self._render_chunk = None
        self._bg_render_jit = None

    # ------------------------------------------------------------ crop guard

    def crop_required(self, T_WO_1, render_poses, poses) -> int:
        """See `required_crop`; returns 0 when no crop is configured."""
        if not self.fg_crop or self.obj_aabb is None:
            return 0
        return required_crop(
            self.obj_aabb, self.intrinsics, self.res, T_WO_1, render_poses,
            poses,
        )

    def bump_crop(self, crop: int) -> None:
        """Grow the crop window (guard found candidates that would clip) and
        invalidate every compiled program that baked the old static size."""
        self.fg_crop = min(int(crop), self.res)
        self._render_chunk = None

    # ---------------------------------------------------------------- bg

    def render_background(
        self,
        T_WC: jnp.ndarray,
        gt_depth: Optional[jnp.ndarray] = None,
        movable_mask: Optional[jnp.ndarray] = None,
    ) -> BackgroundView:
        """Render the task background once for a view (lines 95-113).

        gt_depth: (H, W) metres; movable_mask: (H, W) nonzero outside the
        movable object (reference movable_masks semantics,
        scene_model.py:55).
        """
        # Jitted + row-chunked: an eager full-res march materializes every
        # intermediate (multi-GB) and OOMs the chip. The jitted wrapper is
        # cached on the instance so repeat calls (and prefetch warm-ups)
        # reuse the traced executable instead of retracing.
        if self._bg_render_jit is None:
            self._bg_render_jit = jax.jit(
                lambda p, T: render_image(
                    p, self.bg_cfg, T, self.dirs_cam, self.settings,
                    row_chunk=self.row_chunk,
                )
            )
        out = self._bg_render_jit(self.bg_params, jnp.asarray(T_WC))
        # Opaque black background (combined_rendering.py:99): alpha -> 1,
        # premultiplied rgb unchanged (black contributes nothing).
        rgb = out["rgb"]
        alpha = jnp.ones_like(out["alpha"])
        if gt_depth is not None:
            depth = rectify_depth(jnp.asarray(gt_depth), self.res)
            if movable_mask is not None:
                m = rectify_mask(jnp.asarray(movable_mask), self.res)
                depth = jnp.where(m == 0, 100.0, depth)
        else:
            depth = out["depth"]
        return BackgroundView(rgb=rgb, alpha=alpha, depth=depth)

    # ---------------------------------------------------------------- fg

    def _build_render_chunk(self):
        settings, fg_cfg, dirs_cam = self.settings, self.fg_cfg, self.dirs_cam
        rc = self.row_chunk
        use_crop = self.fg_crop and self.obj_aabb is not None
        crop = self.fg_crop
        crop_settings = self.crop_settings
        obj_aabb = self.obj_aabb
        K = jnp.asarray(self.intrinsics)

        def render_one(carry, T_WO_2):
            fg_params, T_WO_1, T_WC_1, bg, bg_only = carry
            if use_crop:
                img = render_pose_cropped(
                    fg_params, fg_cfg, crop_settings, dirs_cam, K, obj_aabb,
                    crop, T_WO_1, T_WC_1, bg, bg_only, T_WO_2,
                )
            else:
                T_WC_2 = convert_virtual_pose(T_WO_1, T_WO_2, T_WC_1)
                out = render_image(
                    fg_params, fg_cfg, T_WC_2, dirs_cam, settings, row_chunk=rc
                )
                img = composite_one(out["rgb"], out["alpha"], out["depth"], bg)
            return carry, img

        @jax.jit
        def render_chunk(fg_params, T_WO_1, poses, T_WC_1, bg: BackgroundView):
            bg_only = background_only_image(bg)
            carry = (fg_params, T_WO_1, T_WC_1, bg, bg_only)
            _, imgs = jax.lax.scan(render_one, carry, poses)
            return imgs  # (P, res, res, 3) u8

        return render_chunk

    def render(
        self,
        valid_poses,  # (K, 4, 4) or (K, 16) candidate world poses (accio)
        render_poses,  # (L, 4, 4) camera poses for the render views (accio)
        render_cam_pose_idx,  # list of view indices (for parity/logging)
        depths_gt=None,  # (L, H, W) GT depths for the render views
        movable_masks=None,  # (L, H, W) nonzero outside movable obj
        T_WO_1=None,  # movable object's current pose (4, 4)
        save: bool = False,
    ) -> np.ndarray:
        """Render every candidate pose from every render view.

        Returns (K * L, res, res, 3) uint8 RGB images, ordered view-major like
        the reference (combined_rendering.py:95-155 appends per view, then per
        pose). Writes cb_render/cb_rgb_%04d.png when save=True (line 157-159).
        """
        valid_poses = jnp.asarray(valid_poses).reshape(-1, 4, 4)
        render_poses = jnp.asarray(render_poses).reshape(-1, 4, 4)
        if T_WO_1 is None:
            raise ValueError("T_WO_1 (movable object pose) is required")
        T_WO_1 = jnp.asarray(T_WO_1).reshape(4, 4)
        if self._render_chunk is None:
            self._render_chunk = self._build_render_chunk()

        k = valid_poses.shape[0]
        p = min(self.poses_per_dispatch, max(k, 1))
        all_imgs = []
        for view_i in range(render_poses.shape[0]):
            bg = self.render_background(
                render_poses[view_i],
                None if depths_gt is None else depths_gt[view_i],
                None if movable_masks is None else movable_masks[view_i],
            )
            for start in range(0, k, p):
                chunk = valid_poses[start : start + p]
                pad = 0
                if chunk.shape[0] < p:
                    pad = p - chunk.shape[0]
                    chunk = jnp.concatenate(
                        [chunk, jnp.tile(jnp.eye(4)[None], (pad, 1, 1))], axis=0
                    )
                imgs = self._render_chunk(
                    self.fg_params, T_WO_1, chunk, render_poses[view_i], bg
                )
                imgs = np.asarray(imgs)
                if pad:
                    imgs = imgs[:-pad]
                all_imgs.append(imgs)
        renders = np.concatenate(all_imgs, axis=0)

        if save and self.out_render_path:
            from PIL import Image

            import shutil

            if os.path.exists(self.out_render_path):
                shutil.rmtree(self.out_render_path)
            os.makedirs(self.out_render_path)
            # Reference saves only view 0's renders (render_idx == 0 guard,
            # combined_rendering.py:157).
            for i in range(min(k, renders.shape[0])):
                Image.fromarray(renders[i]).save(
                    os.path.join(self.out_render_path, f"cb_rgb_{i:04d}.png")
                )
        return renders
