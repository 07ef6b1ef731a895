"""Physics model construction: per-object TSDF -> mesh artifacts + handles.

Parity target: vision_3d/physics_utils.py:25-228 (`get_phys_models`):
- per-object TSDF with bg/fg mask erosion (20 px obj 0 / 8 px others,
  lines 77-83), mesh extraction, scene-bounds crop, small-cluster removal
  (2% rule, 106-109);
- artifacts: save_dir/mesh_concave_{i}.obj + init_pose_{i}.txt (117-119,
  172-177); the VHACD convex decomposition step (185-193) is intentionally
  absent — Bullet needed convex parts, the SDF overlap test does not, so
  mesh_{i}.obj is written as a copy of the concave mesh for path compat;
- init_pose = identity with translation at the mesh center (113-115).

Returned handles additionally carry the TSDF grid + fixed-size collision
point set consumed by physics/collision.py.
"""

from __future__ import annotations

import dataclasses
import os
import shutil
from typing import Optional

import jax.numpy as jnp
import numpy as np

from dream2real_tpu.physics import mesh as mesh_ops
from dream2real_tpu.physics.tsdf import (
    TSDFGrid,
    fuse_tsdf,
    grid_centroid,
    occupied_points,
)


@dataclasses.dataclass
class PhysModel:
    """Physics handle: mesh path (artifact/vis compat) + collision state."""

    mesh_path: str
    tsdf: Optional[TSDFGrid]
    points: Optional[np.ndarray]  # (M, 4) shell points for the movable

    def __fspath__(self):  # let it be used anywhere a path is expected
        return self.mesh_path

    def __str__(self):
        return self.mesh_path


def get_phys_models(
    depths,
    cam_poses,
    intrinsics,
    masks,
    num_objs: int,
    scene_bounds,
    embodied: bool = False,
    save_dir: Optional[str] = None,
    vis: bool = False,
    use_cache: bool = True,
    use_phys_tsdf: bool = True,
    use_vis_pcds: bool = False,
    single_view_idx: int = 0,
    voxel_size: float = 0.004,
    max_points: int = 4096,
    pcd_mask_erosion: int = 15,
    distortion=None,
):
    """Build physics models for objects 0..num_objs-1 (0 = background).

    Returns (handles: list[PhysModel], init_poses: list[np.ndarray (4,4)]).
    """
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)

    depths = jnp.asarray(depths)
    poses_arr = jnp.asarray(np.stack([np.asarray(p) for p in cam_poses]).astype(np.float32))
    K = jnp.asarray(np.asarray(intrinsics, np.float32))
    masks_np = np.asarray(masks)

    if use_cache and save_dir is not None:
        ok = all(
            os.path.exists(os.path.join(save_dir, f"tsdf_{i}.npz"))
            for i in range(num_objs)
        )
        if ok:
            print("Using cached physics models")
            handles, init_poses = [], []
            for i in range(num_objs):
                z = np.load(os.path.join(save_dir, f"tsdf_{i}.npz"))
                grid = TSDFGrid(
                    tsdf=jnp.asarray(z["tsdf"]),
                    weight=jnp.asarray(z["weight"]),
                    origin=jnp.asarray(z["origin"]),
                    voxel_size=float(z["voxel_size"]),
                )
                pts = z["points"]
                handles.append(
                    PhysModel(os.path.join(save_dir, f"mesh_{i}.obj"), grid, pts)
                )
                init_poses.append(
                    np.loadtxt(os.path.join(save_dir, f"init_pose_{i}.txt")).astype(
                        np.float32
                    )
                )
            return handles, init_poses

    print("Creating physics models...")
    if not use_phys_tsdf:
        return _get_phys_models_pcd(
            np.asarray(depths), np.asarray(poses_arr), np.asarray(K),
            masks_np, num_objs, scene_bounds, save_dir, max_points,
            mask_erosion=pcd_mask_erosion, distortion=distortion,
        )

    if use_vis_pcds:
        frame_sel = np.asarray([single_view_idx] * 4)  # physics_utils.py:64-65
        depths_used = depths[frame_sel]
        poses_used = poses_arr[frame_sel]
        masks_used = masks_np[frame_sel]
    else:
        depths_used, poses_used, masks_used = depths, poses_arr, masks_np

    # Bullet-contact parity: the reference's support/stability tests fire on
    # penetration of the SURFACE meshes — including the tabletop
    # (physics_utils.py:330-341, pairwise_collision after lowering by
    # unsup_thresh). The SDF equivalent needs solid voxels BEHIND that
    # surface, but configs put scene_bounds z_min AT table level, cutting
    # the table's behind-surface band out of the grid entirely (measured:
    # support collapsed to ~1% valid on the synth validation grids, where
    # ~38% is correct). Fuse the PHYSICS grids with the z floor dropped by
    # one truncation band (3 voxels) + the 2 cm unsup_thresh so lowered
    # contact points land inside the solid shell; meshes/points are still
    # cropped to the caller's bounds, so artifacts are unchanged.
    z_pad = 3.0 * voxel_size + 0.02 + voxel_size  # trunc + unsup + margin
    fuse_bounds = [
        [scene_bounds[0][0], scene_bounds[0][1], scene_bounds[0][2] - z_pad],
        list(scene_bounds[1]),
    ]

    handles, init_poses = [], []
    for obj_id in range(num_objs):
        erosion = 20 if obj_id == 0 else 8  # physics_utils.py:77-80
        grid = fuse_tsdf(
            depths_used,
            jnp.asarray(masks_used == obj_id),
            poses_used,
            K,
            fuse_bounds,
            voxel_size=voxel_size,
            erosion_kernel=erosion,
            distortion=distortion,
        )
        verts, faces = mesh_ops.extract_mesh(grid)
        verts, faces = mesh_ops.crop_mesh(verts, faces, scene_bounds)
        verts, faces = mesh_ops.remove_small_clusters(verts, faces, 0.02)

        init_pose = np.eye(4, dtype=np.float32)
        if len(verts):
            init_pose[:3, 3] = mesh_ops.mesh_center(verts)
        else:
            init_pose[:3, 3] = grid_centroid(grid)

        pts = occupied_points(
            grid,
            max_points if obj_id else max_points * 4,
            mode="shell",
            bounds=scene_bounds,
        )

        mesh_path = None
        if save_dir is not None:
            concave = os.path.join(save_dir, f"mesh_concave_{obj_id}.obj")
            mesh_ops.save_obj(concave, verts, faces)
            mesh_path = os.path.join(save_dir, f"mesh_{obj_id}.obj")
            shutil.copyfile(concave, mesh_path)  # no VHACD step; see module doc
            np.savetxt(os.path.join(save_dir, f"init_pose_{obj_id}.txt"), init_pose)
            np.savez(
                os.path.join(save_dir, f"tsdf_{obj_id}.npz"),
                tsdf=np.asarray(grid.tsdf),
                weight=np.asarray(grid.weight),
                origin=np.asarray(grid.origin),
                voxel_size=grid.voxel_size,
                points=pts,
            )
        handles.append(PhysModel(mesh_path, grid, pts))
        init_poses.append(init_pose)

    print("Physics models created.")
    return handles, init_poses


def _pad_points(pts: np.ndarray, max_points: int) -> np.ndarray:
    """(N, 3) -> (max_points, 4) [x, y, z, valid], stride-downsampled /
    zero-padded (fixed-size so the collision check stays static-shaped)."""
    out = np.zeros((max_points, 4), np.float32)
    n = len(pts)
    if n == 0:
        return out
    if n > max_points:
        sel = (np.arange(max_points) * (n / max_points)).astype(int)
        pts = pts[sel]
        n = max_points
    out[:n, :3] = pts
    out[:n, 3] = 1.0
    return out


def _get_phys_models_pcd(
    depths, cam_poses, K, masks, num_objs, scene_bounds, save_dir, max_points,
    mask_erosion: int = 15, distortion=None,
):
    """The ``use_phys_tsdf=False`` path (physics_utils.py:121-167 + 381-401):
    per-object point cloud -> statistical outlier removal -> Poisson
    indicator grid (mesh artifact + collision SDF). Artifacts: obj_{i}.pcd,
    mesh_concave_{i}.obj / mesh_{i}.obj, init_pose_{i}.txt, tsdf_{i}.npz
    (the indicator grid, so cached replay is path-identical to the TSDF
    branch)."""
    import cv2

    from dream2real_tpu.physics import mesh as mesh_ops
    from dream2real_tpu.physics.poisson import (
        oriented_normals,
        poisson_indicator,
        poisson_mesh,
        remove_statistical_outliers,
        write_pcd,
    )

    lo = np.asarray(scene_bounds[0], np.float32)
    hi = np.asarray(scene_bounds[1], np.float32)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    from dream2real_tpu.ops import cameras

    distortion = cameras.normalize_distortion(distortion)
    dirs_map = None
    if distortion is not None:
        h_img, w_img = np.asarray(depths[0]).shape
        dirs_map = np.asarray(
            cameras.pixel_dirs(
                h_img, w_img, np.asarray(K), jnp.asarray(distortion),
                snap_to_pixel_centers=False,
            )
        )
    # physics_utils.py:129-131 (15 px at reference resolution; parameterised
    # so low-res tests/synth scenes don't erode small objects away entirely).
    kernel = np.ones((mask_erosion, mask_erosion), np.uint8)

    handles, init_poses = [], []
    for obj_id in range(num_objs):
        all_pts, all_views = [], []
        for frame_id in range(len(depths)):
            mask = (masks[frame_id] == obj_id).astype(np.uint8)
            mask = cv2.erode(mask, kernel, iterations=1).astype(bool)
            depth = np.asarray(depths[frame_id])
            vs, us = np.nonzero(mask & (depth > 0))
            if len(vs) == 0:
                continue
            z = depth[vs, us]
            if dirs_map is not None:
                cam = dirs_map[vs, us] * z[:, None]
            else:
                cam = np.stack(
                    [(us - cx) / fx * z, (vs - cy) / fy * z, z], axis=-1
                )
            T = np.asarray(cam_poses[frame_id])
            pts = (cam @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
            inb = ((pts >= lo) & (pts <= hi)).all(axis=1)  # crop_bbox crop
            pts = pts[inb]
            # 2 mm per-frame voxel downsample (frame_voxel_size).
            key = np.floor(pts / 0.002).astype(np.int64)
            _, idx = np.unique(key, axis=0, return_index=True)
            all_pts.append(pts[idx])
            all_views.append(
                np.broadcast_to(T[:3, 3].astype(np.float32), pts[idx].shape)
            )
        pts = (
            np.concatenate(all_pts)
            if all_pts
            else np.zeros((0, 3), np.float32)
        )
        views = (
            np.concatenate(all_views)
            if all_views
            else np.zeros((0, 3), np.float32)
        )

        if len(pts):
            inl = remove_statistical_outliers(pts)  # 30 nbrs / 1.05 std
            pts, views = pts[inl], views[inl]
            # obj_voxel_size downsample after outlier removal.
            key = np.floor(pts / 0.002).astype(np.int64)
            _, idx = np.unique(key, axis=0, return_index=True)
            pts, views = pts[idx], views[idx]

        init_pose = np.eye(4, dtype=np.float32)
        if len(pts):
            init_pose[:3, 3] = pts.mean(axis=0)  # pcd.get_center()
            normals = oriented_normals(pts, views)
            grid = poisson_indicator(pts, normals)
            verts, faces = poisson_mesh(grid, pts)
        else:
            grid = TSDFGrid(
                tsdf=jnp.ones((8, 8, 8), jnp.float32),
                weight=jnp.zeros((8, 8, 8), jnp.float32),
                origin=jnp.asarray(lo),
                voxel_size=0.004,
            )
            verts = np.zeros((0, 3), np.float32)
            faces = np.zeros((0, 3), np.int32)

        pcd_pts = _pad_points(pts, max_points if obj_id else max_points * 4)

        mesh_path = None
        if save_dir is not None:
            write_pcd(os.path.join(save_dir, f"obj_{obj_id}.pcd"), pts)
            concave = os.path.join(save_dir, f"mesh_concave_{obj_id}.obj")
            mesh_ops.save_obj(concave, verts, faces)
            mesh_path = os.path.join(save_dir, f"mesh_{obj_id}.obj")
            shutil.copyfile(concave, mesh_path)
            np.savetxt(os.path.join(save_dir, f"init_pose_{obj_id}.txt"), init_pose)
            np.savez(
                os.path.join(save_dir, f"tsdf_{obj_id}.npz"),
                tsdf=np.asarray(grid.tsdf),
                weight=np.asarray(grid.weight),
                origin=np.asarray(grid.origin),
                voxel_size=grid.voxel_size,
                points=pcd_pts,
            )
        handles.append(PhysModel(mesh_path, grid, pcd_pts))
        init_poses.append(init_pose)

    print("Physics models created.")
    return handles, init_poses
