"""Camera models: intrinsics constants, pixel<->ray math, lens distortion.

Parity targets: vision_3d/camera_info.py:3-13 (constants),
vision_3d/geometry_utils.py:127-135 (pix_to_world), and instant-ngp's
render_with_lens_distortion path (reference reconstruction/train_ngp.py:70)
which we reproduce as an iterative Brown-Conrady undistortion when generating
training rays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# RealSense D455 at 1280x720 (vision_3d/camera_info.py:3-7).
INTRINSICS_REALSENSE_1280 = np.array(
    [
        [924.66912, 0.0, 654.51953],
        [0.0, 926.49735, 355.18523],
        [0.0, 0.0, 1.0],
    ]
)

# Derived 336x336 "CLIP view" intrinsics (vision_3d/camera_info.py:9-13).
INTRINSICS_CLIP_VIEW = np.array(
    [
        [436.01158022, 0.0, 168.0],
        [0.0, 435.90814372, 168.0],
        [0.0, 0.0, 1.0],
    ]
)


def normalize_distortion(distortion):
    """None for absent or all-zero coefficient arrays, so pinhole code paths
    stay numerically identical when a config carries k1..p2 = 0 (every synth
    config does; reference camera block, cfg.py:101-112)."""
    if distortion is None:
        return None
    d = np.asarray(distortion, np.float32)
    if not np.any(d):
        return None
    return d


def distort_coords(x, y, distortion):
    """Forward Brown-Conrady: normalized pinhole coords -> distorted coords
    (the model whose inverse pixel_dirs iterates; coefficient order
    k1, k2, p1, p2, k3, k4 matching cfg.distortion_array)."""
    k1, k2, p1, p2, k3, _k4 = [distortion[i] for i in range(6)]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return xd, yd


def pixel_dirs(
    h: int,
    w: int,
    intrinsics: jnp.ndarray,
    distortion: jnp.ndarray | None = None,
    snap_to_pixel_centers: bool = True,
) -> jnp.ndarray:
    """Unit-less camera-frame ray directions for every pixel.

    Returns (h, w, 3) directions in the OpenCV camera convention
    (+x right, +y down, +z forward), z-normalized (dir_z == 1) so that
    ``t`` along the ray equals z-depth.

    If ``distortion`` (k1, k2, p1, p2, k3, k4 — Brown-Conrady, cfg.py:103-110)
    is given, applies iterative undistortion like instant-ngp's
    render_with_lens_distortion.
    """
    off = 0.5 if snap_to_pixel_centers else 0.0
    ys = jnp.arange(h, dtype=jnp.float32) + off
    xs = jnp.arange(w, dtype=jnp.float32) + off
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    x = (grid_x - cx) / fx
    y = (grid_y - cy) / fy

    if distortion is not None:
        k1, k2, p1, p2, k3, _k4 = [distortion[i] for i in range(6)]

        def undistort_step(_, xy):
            xd, yd = xy
            r2 = xd * xd + yd * yd
            radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
            dx = 2.0 * p1 * xd * yd + p2 * (r2 + 2.0 * xd * xd)
            dy = p1 * (r2 + 2.0 * yd * yd) + 2.0 * p2 * xd * yd
            return ((x - dx) / radial, (y - dy) / radial)

        xu, yu = jax.lax.fori_loop(0, 4, undistort_step, (x, y))
        x, y = xu, yu

    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def rays_from_pose(
    T_WC: jnp.ndarray, dirs_cam: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World-frame ray origins/directions from a camera-to-world pose.

    T_WC: (..., 4, 4) in the OpenCV ("accio") convention.
    dirs_cam: (h, w, 3) from :func:`pixel_dirs`.
    Returns origins (..., 1, 1, 3) broadcastable and dirs (..., h, w, 3),
    z-normalized (|d . cam_z| == 1) so t == z-depth.
    """
    R = T_WC[..., :3, :3]
    t = T_WC[..., :3, 3]
    dirs = jnp.einsum("...ij,hwj->...hwi", R, dirs_cam)
    origins = t[..., None, None, :]
    return origins, dirs


def pix_to_world(
    row: jnp.ndarray,
    col: jnp.ndarray,
    img_height: int,
    depth: jnp.ndarray,
    cam_pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
) -> jnp.ndarray:
    """Pixel + depth -> world point.

    Parity: vision_3d/geometry_utils.py:127-135 (including its u = height-row
    convention quirk).
    """
    u = img_height - row
    v = col
    K_inv = jnp.linalg.inv(intrinsics)
    cam = K_inv @ (depth * jnp.array([u, v, 1.0]))
    cam_h = jnp.append(cam, 1.0)
    world = cam_pose @ cam_h
    return (world / world[3])[:3]


def project_points(
    points_w: jnp.ndarray, T_CW: jnp.ndarray, intrinsics: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World points -> pixel coords + camera-frame z.

    points_w: (..., 3). T_CW: world-to-camera (4, 4).
    Returns ((..., 2) [col, row] pixel coords, (...,) z).
    Used by TSDF fusion (physics) and dynamic-mask generation.
    """
    R = T_CW[:3, :3]
    t = T_CW[:3, 3]
    cam = points_w @ R.T + t
    z = cam[..., 2]
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    zc = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam[..., 0] / zc * fx + cx
    v = cam[..., 1] / zc * fy + cy
    return jnp.stack([u, v], axis=-1), z


def clip_view_intrinsics_like(intrinsics: np.ndarray, src_hw: tuple[int, int], res: int = 336) -> np.ndarray:
    """Derive CLIP-view intrinsics from source intrinsics by center-crop-square
    + resize-to-res (this is how INTRINSICS_CLIP_VIEW relates to the 1280x720
    RealSense intrinsics in the reference)."""
    h, w = src_hw
    side = min(h, w)
    scale = res / side
    crop_x = (w - side) / 2
    crop_y = (h - side) / 2
    out = intrinsics.copy().astype(np.float64)
    out[0, 0] *= scale
    out[1, 1] *= scale
    out[0, 2] = (intrinsics[0, 2] - crop_x) * scale
    out[1, 2] = (intrinsics[1, 2] - crop_y) * scale
    return out
