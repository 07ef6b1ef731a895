"""SE(3) candidate-pose grid sampling.

Parity target: vision_3d/obj_pose_opt.py:8-55 (`sample_poses_grid`) and
vision_3d/virtual_cam_pose_sample.py:5-8 (`get_virtual_cam_poses`).

The flattened-grid ordering matters downstream (spatial smoothing reshapes by
sample_res, and pose_batch.txt is a bit-compat artifact): torch.cartesian_prod
ordering = last axis fastest, i.e. index = ((((ix*NY+iy)*NZ+iz)*NXO+ixo)*NYO+iyo)*NZO+izo.

The reference hardcodes per-scene-type bounds in code (obj_pose_opt.py:16-36);
we keep those values for bit-compat but also allow a config override
(``engine.sample_bounds``) since that hardcoding is a known wart (SURVEY §5).
"""

from __future__ import annotations

import math

import numpy as np

# Per-scene-type sampling bounds relative to scene_centre:
# ((x_lo, x_hi), (y_lo, y_hi), (z_lo, z_hi), 3x orientation ranges).
# Values from vision_3d/obj_pose_opt.py:16-36.
SCENE_TYPE_BOUNDS = {
    0: (  # Pool table
        (-0.12, 0.04), (-0.10, 0.06), (0.00, 0.085),
        (0.0, 0.0), (0.0, 0.0), (0.0, 0.0),
    ),
    1: (  # Shelf
        (-0.15, 0.20), (0.40, 0.44), (0.04, 0.41),
        (-math.pi, math.pi / 2), (-math.pi, math.pi / 2), (-math.pi, math.pi / 2),
    ),
    3: (  # Shopping
        (-0.19, 0.15), (-0.25, 0.10), (0.00, 0.14),
        (0.0, 0.0), (0.0, 0.0), (0.0, 0.0),
    ),
}


def sample_poses_grid(
    scene_centre,
    sample_res=(40, 40, 1, 1, 1, 1),
    scene_type: int = 0,
    bounds_override=None,
) -> np.ndarray:
    """6-DoF grid of candidate world-frame poses for the movable object.

    Returns (prod(sample_res), 16) float32 — flattened homogeneous matrices,
    matching obj_pose_opt.py:47-53 element-for-element. Positions are absolute
    world poses (not relative transforms).
    """
    if bounds_override is not None:
        bounds = bounds_override
        x_rng, y_rng, z_rng = bounds[0], bounds[1], bounds[2]
        ori_rngs = bounds[3:6]
    else:
        if scene_type not in SCENE_TYPE_BOUNDS:
            raise NotImplementedError(f"scene_type {scene_type} not implemented")
        b = SCENE_TYPE_BOUNDS[scene_type]
        x_rng, y_rng, z_rng = b[0], b[1], b[2]
        ori_rngs = b[3:6]

    cx, cy, cz = (float(scene_centre[i]) for i in range(3))
    # Host-side numpy on purpose: this is setup work, and the eager-jnp
    # version paid device dispatch + a (N, 16) D2H round-trip over the
    # tunnel (measured 12-21 s at 70k poses, minutes at the 2.2M shelf
    # grid). float64 compute cast to float32 stays within the parity
    # tolerance vs torch.linspace/pytorch3d (tests/test_sampling_smoothing.py).
    axes = [
        np.linspace(x_rng[0] + cx, x_rng[1] + cx, int(sample_res[0])),
        np.linspace(y_rng[0] + cy, y_rng[1] + cy, int(sample_res[1])),
        np.linspace(z_rng[0] + cz, z_rng[1] + cz, int(sample_res[2])),
        np.linspace(ori_rngs[0][0], ori_rngs[0][1], int(sample_res[3])),
        np.linspace(ori_rngs[1][0], ori_rngs[1][1], int(sample_res[4])),
        np.linspace(ori_rngs[2][0], ori_rngs[2][1], int(sample_res[5])),
    ]
    # torch.cartesian_prod semantics: last axis fastest (obj_pose_opt.py:47).
    grids = np.meshgrid(*axes, indexing="ij")
    combos = np.stack([g.reshape(-1) for g in grids], axis=-1)
    n = combos.shape[0]
    rot = _np_euler_xyz_to_matrix(combos[:, 3], combos[:, 4], combos[:, 5])
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (n, 1, 1))
    poses[:, :3, :3] = rot.astype(np.float32)
    poses[:, :3, 3] = combos[:, :3].astype(np.float32)
    return poses.reshape(-1, 16)


def _np_euler_xyz_to_matrix(a, b, c):
    """Batched R = Rx(a) @ Ry(b) @ Rz(c), pytorch3d "XYZ" convention.

    Mirrors ops.se3.euler_angles_to_matrix (parity-tested against pytorch3d)
    but in host numpy — closed form of the Rx@Ry@Rz product.
    """
    ca, sa = np.cos(a), np.sin(a)
    cb, sb = np.cos(b), np.sin(b)
    cc, sc = np.cos(c), np.sin(c)
    rot = np.empty(a.shape + (3, 3), dtype=np.float64)
    rot[..., 0, 0] = cb * cc
    rot[..., 0, 1] = -cb * sc
    rot[..., 0, 2] = sb
    rot[..., 1, 0] = sa * sb * cc + ca * sc
    rot[..., 1, 1] = -sa * sb * sc + ca * cc
    rot[..., 1, 2] = -sa * cb
    rot[..., 2, 0] = -ca * sb * cc + sa * sc
    rot[..., 2, 1] = ca * sb * sc + sa * cc
    rot[..., 2, 2] = ca * cb
    return rot


def get_virtual_cam_poses(opt_cam_poses, render_cam_pose_idx) -> np.ndarray:
    """Select the render-view camera poses from the (optimised) training views.

    Parity: vision_3d/virtual_cam_pose_sample.py:5-8. opt_cam_poses is a
    sequence of (4, 4) arrays; returns (L, 4, 4).
    """
    return np.stack([np.asarray(opt_cam_poses[i]) for i in render_cam_pose_idx], axis=0)
