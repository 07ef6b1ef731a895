"""Grasp-pose math from depth + normals (robot-facing API).

Parity target: vision_3d/geometry_utils.py:58-123 — grasp orientation from a
surface normal with pseudo-up disambiguation, rotation about the normal,
depth-image hole patching, pixel -> grasp pose. No Open3D: back-projection is
explicit and normals come from dream2real_tpu.registration.
"""

from __future__ import annotations

import numpy as np


def get_grasp_pose(pos: np.ndarray, normal: np.ndarray) -> np.ndarray:
    """Gripper pose with z pointing INTO the surface (geometry_utils.py:58-80)."""
    pseudo_up = np.array([0.0, 1.0, 0.0])
    if abs(np.dot(normal, pseudo_up)) > 0.99:
        pseudo_up = np.array([0.0, 0.0, 1.0])
    z_axis = -1 * np.asarray(normal, np.float64)
    x_axis = pseudo_up
    y_axis = np.cross(z_axis, x_axis)
    x_axis = -1 * np.cross(z_axis, y_axis)
    T = np.eye(4)
    T[:3, 0] = x_axis / np.linalg.norm(x_axis)
    T[:3, 1] = y_axis / np.linalg.norm(y_axis)
    T[:3, 2] = z_axis / np.linalg.norm(z_axis)
    T[:3, 3] = pos
    return T


def rotate_grasp_about_normal(grasp_pose, normal_axis, angle_deg: float) -> np.ndarray:
    """Rotate the grasp clockwise about the normal (geometry_utils.py:83-90)."""
    from scipy.spatial.transform import Rotation as R

    rot = R.from_rotvec(np.asarray(normal_axis, np.float64) * np.deg2rad(angle_deg)).as_matrix()
    out = np.eye(4)
    out[:3, :3] = rot @ np.asarray(grasp_pose)[:3, :3]
    out[:3, 3] = np.asarray(grasp_pose)[:3, 3]
    return out


def normalise_angle(angle_deg):
    """Wrap to (-180, 180] (geometry_utils.py:92-94)."""
    return np.rad2deg(np.arctan2(np.sin(np.deg2rad(angle_deg)), np.cos(np.deg2rad(angle_deg))))


def patch_up_depth(depth_img: np.ndarray) -> np.ndarray:
    """Inpaint zero/NaN depth holes (geometry_utils.py:96-103)."""
    import cv2

    depth_img = depth_img.copy()
    hole = (np.isnan(depth_img) | (depth_img == 0)).astype(np.uint8)
    patched = cv2.inpaint(depth_img.astype(np.float32), hole, 3, cv2.INPAINT_NS)
    depth_img[hole == 1] = patched[hole == 1]
    depth_img[np.isnan(depth_img)] = 0
    return depth_img


def get_grasp_pose_from_pix(
    row: int, col: int, depth_img: np.ndarray, intrinsics: np.ndarray,
    cam_pose: np.ndarray,
):
    """Pixel + depth image -> world grasp pose (geometry_utils.py:106-123).

    Like the reference, the final normal is overridden to straight-down +z
    (line 117) — the PCA normal is computed for API parity/debugging only.
    """
    if depth_img[row, col] == 0:
        raise ValueError("Attempted grasp at pixel with zero depth value.")
    K = np.asarray(intrinsics, np.float64)
    z = float(depth_img[row, col])
    x = (col - K[0, 2]) / K[0, 0] * z
    y = (row - K[1, 2]) / K[1, 1] * z
    cam = np.array([x, y, z, 1.0])
    world = np.asarray(cam_pose, np.float64) @ cam
    pos = world[:3] / world[3]
    normal = np.array([0.0, 0.0, 1.0])  # geometry_utils.py:117
    return get_grasp_pose(pos, normal), normal
