"""RGB-D dataset loader + dynamic (out-of-scene-bounds) mask generation.

Parity target: data_loader.py:18-129.
- load_rgbds: poses.txt (stacked 4x4) + images/rgb_%04d.png +
  depth/depth_%04d.png (mm uint16 -> metres float) (lines 38-69);
- remove_background: per frame, back-project depth to world points and mark
  pixels outside scene_phys_bounds (z > -0.40 guard, bounds z_min forced to
  -100), then dilate+erode 50 px; cached as dynamic_mask_rgb_%04d.png
  (lines 71-122).

The back-projection + bounds test + morphology run as one jitted JAX program
scanned over frames (the reference does this per frame in Open3D on the CPU).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from dream2real_tpu.ops.image import dilate, erode


def _imread(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path))


def _imwrite(path: str, arr: np.ndarray):
    from PIL import Image

    Image.fromarray(arr).save(path)


class D2RDataLoader:
    """Loads a Dream2Real scan directory. rgb output is HWC uint8 (RGB)."""

    def __init__(self, cfg):
        self.root_dir = cfg.data_dir
        self.rgb_dir = os.path.join(self.root_dir, "images")
        self.depth_dir = os.path.join(self.root_dir, "depth")
        self.traj_file = os.path.join(self.root_dir, "poses.txt")
        self.width = cfg.width
        self.height = cfg.height
        self.size = None
        self.rgb_data = None
        self.depth_data = None
        self.T_WC_data = None
        self.dynamic_masks = None

    def load_rgbds(self):
        T_WC = np.loadtxt(self.traj_file).reshape([-1, 4, 4])
        size = len(T_WC)
        self.size = size
        # Fast path: native C++ batch ingest (PNG decode + mm->m in one call,
        # dream2real_tpu/native). Falls back to PIL per frame.
        from dream2real_tpu import native

        loaded = native.load_rgbd_dataset(self.root_dir, size, self.height, self.width)
        if loaded is not None:
            rgbs, depths = loaded
        else:
            rgbs = np.empty((size, self.height, self.width, 3), np.uint8)
            depths = np.empty((size, self.height, self.width), np.float32)
            for idx in range(size):
                rgb = _imread(os.path.join(self.rgb_dir, f"rgb_{idx:04d}.png"))
                rgbs[idx] = rgb[..., :3]
                depth = _imread(os.path.join(self.depth_dir, f"depth_{idx:04d}.png"))
                depths[idx] = depth.astype(np.float32) / 1000.0  # mm -> metres
        self.rgb_data = jnp.asarray(rgbs)
        self.depth_data = jnp.asarray(depths)
        self.T_WC_data = jnp.asarray(T_WC.astype(np.float32))
        return self.rgb_data, self.depth_data, self.T_WC_data

    def remove_background(self, intrinsics, scene_phys_bounds, use_cache: bool = False,
                          distortion=None):
        """Dynamic masks: 255 where a valid-depth pixel back-projects OUTSIDE
        the scene physical bounds, then dilate+erode 50px. 0 = inside scene.

        distortion: optional Brown-Conrady coefficients (k1,k2,p1,p2,k3,k4);
        back-projection then uses undistorted per-pixel rays.
        """
        out_path = os.path.join(self.root_dir, "images")
        if use_cache:
            masks = np.empty((self.size, self.height, self.width), np.uint8)
            for idx in range(self.size):
                masks[idx] = _imread(
                    os.path.join(out_path, f"dynamic_mask_rgb_{idx:04d}.png")
                )
            self.dynamic_masks = jnp.asarray(masks)
            return self.dynamic_masks

        bounds = np.asarray(scene_phys_bounds, np.float64).copy()
        bounds[0][2] = -100.0  # data_loader.py:84
        masks = compute_dynamic_masks(
            self.depth_data,
            self.T_WC_data,
            jnp.asarray(np.asarray(intrinsics, np.float32)),
            bounds,
            distortion=distortion,
        )
        masks_np = np.asarray(masks)
        for idx in range(self.size):
            _imwrite(
                os.path.join(out_path, f"dynamic_mask_rgb_{idx:04d}.png"),
                masks_np[idx],
            )
        self.dynamic_masks = masks
        return masks


def compute_dynamic_masks(depths, T_WC, intrinsics, scene_phys_bounds,
                          distortion=None) -> jnp.ndarray:
    """(N, H, W) depths -> (N, H, W) uint8 dynamic masks, jitted.

    Parity: data_loader.py:86-111 (incl. the world-z > -0.40 pre-filter and
    the 50 px dilate-then-erode closing). With `distortion`, per-pixel rays
    are iteratively undistorted (same model as training rays, ops/cameras.py).
    """
    from dream2real_tpu.ops import cameras

    lo = jnp.asarray(scene_phys_bounds[0], jnp.float32)
    hi = jnp.asarray(scene_phys_bounds[1], jnp.float32)
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    h, w = depths.shape[1:3]
    distortion = cameras.normalize_distortion(distortion)
    if distortion is not None:
        # Non-separable per-pixel rays (snap_to_pixel_centers=False keeps the
        # pinhole branch's arange-cx convention).
        dirs = cameras.pixel_dirs(
            h, w, intrinsics, jnp.asarray(distortion),
            snap_to_pixel_centers=False,
        )
        us_map, vs_map = dirs[..., 0], dirs[..., 1]
    else:
        us = (jnp.arange(w, dtype=jnp.float32) - cx) / fx
        vs = (jnp.arange(h, dtype=jnp.float32) - cy) / fy
        us_map = jnp.broadcast_to(us[None, :], (h, w))
        vs_map = jnp.broadcast_to(vs[:, None], (h, w))

    @jax.jit
    def one(depth, T):
        # Open3D create_from_depth_image uses extrinsic = T_cw and builds
        # points in WORLD frame as inv(T_cw) applied... the reference passes
        # T_cw = inv(T_WC), so points land in the world frame.
        x_cam = depth * us_map
        y_cam = depth * vs_map
        z_cam = depth
        R, t = T[:3, :3], T[:3, 3]
        px = R[0, 0] * x_cam + R[0, 1] * y_cam + R[0, 2] * z_cam + t[0]
        py = R[1, 0] * x_cam + R[1, 1] * y_cam + R[1, 2] * z_cam + t[1]
        pz = R[2, 0] * x_cam + R[2, 1] * y_cam + R[2, 2] * z_cam + t[2]
        above_floor = pz > -0.40
        outside = (
            (px < lo[0]) | (px > hi[0])
            | (py < lo[1]) | (py > hi[1])
            | (pz < lo[2]) | (pz > hi[2])
        )
        m = above_floor & outside & (depth != 0)
        m = m.astype(jnp.float32) * 255.0
        m = erode(dilate(m, 50), 50)
        return m.astype(jnp.uint8)

    return jax.vmap(lambda d, T: one(d, T))(depths, T_WC)
