"""Batched pose-validity checks: collision, support, stability, dedup, regrasp.

Replaces the reference's sequential PyBullet loop
(vision_3d/physics_utils.py:232-377, `create_unsupcol_check`): one PyBullet
set_pose + pairwise_collision per candidate pose on the CPU. Here every check
is an array op vmapped over the whole pose batch in a single launch, testable
on the virtual CPU mesh and shardable over TPU cores (SURVEY.md §2c: the pose
batch is the parallel axis of this system).

Geometry model: the movable object is a fixed-size point set sampled from its
TSDF's occupied voxels; the static world is the background TSDF occupancy
grid. Collision == any transformed movable point lands in an occupied
background voxel (trilinear-sampled), replacing Bullet's convex-mesh tests
with voxel overlap at matching semantics:

- duplicate-orientation dedup over the first `sampled_oris_per_pos` block,
  repeated across positions (physics_utils.py:260-278);
- regrasp gate: object z-axis must face +z or -y within 0.9 cos
  (physics_utils.py:282-302, embodied only);
- collision: movable at candidate pose must NOT hit the static world
  (physics_utils.py:316-321);
- support: lowered by `unsup_thresh` (2 cm) it MUST hit something, or the
  pose is below table level (physics_utils.py:328-341);
- stability: all four 4 cm lateral perturbations of the lowered pose must
  still hit (physics_utils.py:350-365).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from dream2real_tpu.ops.se3 import pose_inverse
from dream2real_tpu.physics.tsdf import TSDFGrid

GRAVITY_DIRECTION = np.array([0.0, 0.0, -1.0])  # physics_utils.py:18


def sample_occupancy(grid_occ, origin, voxel_size, points) -> jnp.ndarray:
    """Trilinear-sample a float occupancy grid at world points.

    grid_occ: (X, Y, Z) float; points: (..., 3). Out-of-grid -> 0.
    """
    X, Y, Z = grid_occ.shape
    g = (points - origin) / voxel_size  # in voxel units, center-aligned
    g0 = jnp.floor(g).astype(jnp.int32)
    frac = g - g0

    def gather(ox, oy, oz):
        ix = jnp.clip(g0[..., 0] + ox, 0, X - 1)
        iy = jnp.clip(g0[..., 1] + oy, 0, Y - 1)
        iz = jnp.clip(g0[..., 2] + oz, 0, Z - 1)
        return grid_occ[ix, iy, iz]

    c = 0.0
    for ox in (0, 1):
        wx = frac[..., 0] if ox else 1.0 - frac[..., 0]
        for oy in (0, 1):
            wy = frac[..., 1] if oy else 1.0 - frac[..., 1]
            for oz in (0, 1):
                wz = frac[..., 2] if oz else 1.0 - frac[..., 2]
                c = c + gather(ox, oy, oz) * wx * wy * wz
    inside = jnp.all((g >= 0) & (g <= jnp.asarray([X - 1, Y - 1, Z - 1])), axis=-1)
    return jnp.where(inside, c, 0.0)


def orientation_dedup_mask(pose_batch: jnp.ndarray, sampled_oris_per_pos: int, atol: float = 0.01) -> jnp.ndarray:
    """Mask deduplicating identical rotations within the per-position
    orientation block (physics_utils.py:260-278).

    pose_batch: (N, 4, 4). Returns (N,) bool (True = keep).
    """
    n = pose_batch.shape[0]
    o = sampled_oris_per_pos
    first = pose_batch[:o, :3, :3]  # (o, 3, 3)
    # pairwise closeness over the block; keep i if no j<i is close.
    diff = jnp.abs(first[:, None] - first[None, :]).max(axis=(-1, -2))  # (o, o)
    close = diff <= atol
    lower = jnp.tril(jnp.ones((o, o), bool), k=-1)
    dup = jnp.any(close & lower, axis=1)
    keep_block = ~dup
    reps = n // o
    return jnp.tile(keep_block, reps)


def regrasp_mask(pose_batch: jnp.ndarray, sampled_oris_per_pos: int) -> jnp.ndarray:
    """Orientation gate for embodied runs (physics_utils.py:282-302):
    the object z-axis must face +z or -y within cos > 0.9."""
    n = pose_batch.shape[0]
    o = sampled_oris_per_pos
    z_axis = pose_batch[:o, :3, 2]
    up = z_axis @ jnp.asarray([0.0, 0.0, 1.0]) > 0.9
    neg_y = z_axis @ jnp.asarray([0.0, -1.0, 0.0]) > 0.9
    keep_block = up | neg_y
    return jnp.tile(keep_block, n // o)


def make_unsupcol_check(
    bg_grid: TSDFGrid,
    movable_points: np.ndarray,  # (M, 4) world pts at init pose + valid flag
    movable_init_pose: np.ndarray,  # (4, 4)
    scene_centre,
    sample_res,
    unsup_thresh: float = 0.02,
    disallow_regrasp: bool = False,
    stability_check: bool = True,
    occ_thresh: float = 0.5,
    tsdf_occ_thresh: float = -0.5,
    pose_sharding=None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build the batched validity check. Returns check(pose_batch (N, 16)) ->
    (N,) bool, one compiled launch for the entire grid.

    tsdf_occ_thresh: voxels count as solid only when the TSDF is this far
    BEHIND the surface (in truncation units). Surface voxels (tsdf ~ 0) must
    not read as solid, else an object resting ON the table registers as
    colliding — Bullet's pairwise_collision fires on penetration, not contact.
    """
    if pose_sharding is None:
        # Production default: shard the pose batch over all visible devices
        # (replaces the reference's sequential per-pose CPU loop,
        # physics_utils.py:308-370). The occupancy grid replicates; only the
        # (N,) validity vector gathers.
        from dream2real_tpu.parallel.mesh import auto_mesh
        from dream2real_tpu.parallel.mesh import pose_sharding as _ps

        mesh = auto_mesh()
        if mesh is not None:
            pose_sharding = _ps(mesh)

    occ = bg_grid.occupancy(tsdf_occ_thresh).astype(jnp.float32)
    origin = jnp.asarray(bg_grid.origin)
    voxel = bg_grid.voxel_size
    pts = jnp.asarray(movable_points[:, :3])
    pt_valid = jnp.asarray(movable_points[:, 3] > 0)
    init_inv = pose_inverse(jnp.asarray(movable_init_pose, jnp.float32))
    table_z = float(scene_centre[2])
    oris_per_pos = int(sample_res[3] * sample_res[4] * sample_res[5])
    grav = jnp.asarray(GRAVITY_DIRECTION, jnp.float32)

    def hits_world(points):  # (..., M, 3) -> (...,) bool
        s = sample_occupancy(occ, origin, voxel, points)
        s = jnp.where(pt_valid, s, 0.0)
        return jnp.any(s > occ_thresh, axis=-1)

    @partial(jax.jit, static_argnames=())
    def geom_check(poses: jnp.ndarray) -> jnp.ndarray:
        """Collision/support/stability over a fixed-size (C, 4, 4) chunk."""
        if pose_sharding is not None:
            poses = jax.lax.with_sharding_constraint(poses, pose_sharding)
        # Per-pose transform applied to the movable points
        # (physics_utils.py:252-253: transform = pose @ inv(init_pose)).
        tf = jnp.matmul(poses, init_inv, precision=jax.lax.Precision.HIGHEST)
        R = tf[:, :3, :3]
        t = tf[:, :3, 3]
        pw = jnp.einsum("nij,mj->nmi", R, pts) + t[:, None, :]  # (C, M, 3)

        valid = ~hits_world(pw)

        # Support: lower by unsup_thresh along gravity; must collide, OR the
        # (absolute) pose is below table level (physics_utils.py:328-341).
        # NOTE the reference's below_table tests the UNlowered absolute pose
        # z ("abs_lower_pos" is pose_batch[idx,:3,3] despite the name,
        # physics_utils.py:334-336) — no unsup_thresh offset here.
        low = pw + unsup_thresh * grav
        below_table = poses[:, 2, 3] < table_z
        supported = below_table | hits_world(low)
        valid &= supported

        if stability_check:
            p_dist = 0.04
            stable = jnp.ones(poses.shape[0], bool)
            for vec in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0)):
                pert = low + p_dist * jnp.asarray(vec, jnp.float32)
                stable &= hits_world(pert)
            valid &= below_table | stable

        return valid

    def check(pose_batch: jnp.ndarray) -> jnp.ndarray:
        poses = jnp.asarray(pose_batch).reshape(-1, 4, 4)
        n = poses.shape[0]
        valid = orientation_dedup_mask(poses, oris_per_pos)
        if disallow_regrasp:
            valid &= regrasp_mask(poses, oris_per_pos)

        # Shelf-scale grids (2.2M poses, /root/reference/configs/
        # shelf_demo.json sample_res) cannot run the point-overlap test in
        # one launch — the (N, M, 3) transformed-point tensor alone would be
        # ~100 GB — so the geometric check streams fixed-size chunks.
        # Orientation dedup/regrasp above already killed most poses (the
        # reference's loop skips those too, physics_utils.py:312-313):
        # COMPACT to survivors first, then scatter chunk results back.
        import os

        # 16384 measured: a 32768 chunk OOMs XLA compile at shelf scale on
        # 16 GB v5e HBM (19.15 GB of HLO temps requested, 2026-08 run log);
        # halving fits with headroom and the launch stays ms-scale.
        chunk = max(int(os.environ.get("D2R_PHYS_CHUNK", "16384")), 1)
        keep_idx = np.flatnonzero(np.asarray(valid))
        if len(keep_idx) == 0:
            return valid
        if n <= chunk and len(keep_idx) == n:
            return geom_check(poses) & valid  # small all-live batch: one launch
        survivors = poses[jnp.asarray(keep_idx)]
        k = len(keep_idx)
        if pose_sharding is not None:
            # Chunks must fill the mesh quantum so every device gets rows.
            chunk = -(-chunk // pose_sharding.mesh.size) * pose_sharding.mesh.size
        geo = np.empty(k, bool)
        for s in range(0, k, chunk):
            part = survivors[s : s + chunk]
            pad = chunk - part.shape[0]
            if pad:
                part = jnp.concatenate(
                    [part,
                     jnp.tile(jnp.eye(4, dtype=part.dtype)[None], (pad, 1, 1))]
                )
            res = np.asarray(geom_check(part))
            geo[s : s + chunk - pad] = res[: chunk - pad]
        out = np.asarray(valid).copy()
        out[keep_idx] = geo
        return jnp.asarray(out)

    return check
