"""Point-splat renderer for the pcd ablation path.

Parity target: vision_3d/pcd_visual_model.py:99-155 (`PointCloudRenderer`):
336x336 CLIP-view renders of bg pcd + movable pcd transformed per pose, with
white-ish pixels (all channels > 220) blacked out afterwards (line 147-148).

Implementation: z-buffer point splatting with a 3x3 footprint (reference uses
point_size 3.0), vectorized per pose in numpy/JAX — no Open3D/OpenGL.
"""

from __future__ import annotations

import numpy as np

from dream2real_tpu.ops.cameras import INTRINSICS_CLIP_VIEW

CLIP_RES = 336


def splat(points, colors, T_WC, K, res=CLIP_RES, point_px: int = 3, bg=255):
    """z-buffer splat of one point cloud. Returns (res,res,3) u8 + zbuf."""
    T_CW = np.linalg.inv(T_WC)
    cam = points @ T_CW[:3, :3].T + T_CW[:3, 3]
    z = cam[:, 2]
    front = z > 1e-6
    cam, z, cols = cam[front], z[front], colors[front]
    u = np.round(cam[:, 0] / z * K[0, 0] + K[0, 2]).astype(np.int64)
    v = np.round(cam[:, 1] / z * K[1, 1] + K[1, 2]).astype(np.int64)
    img = np.full((res, res, 3), bg, np.uint8)
    zbuf = np.full((res, res), np.inf, np.float64)
    half = point_px // 2
    order = np.argsort(-z)  # far to near: nearest written last
    u, v, z, cols = u[order], v[order], z[order], cols[order]
    for dy in range(-half, half + 1):
        for dx in range(-half, half + 1):
            uu = u + dx
            vv = v + dy
            ok = (uu >= 0) & (uu < res) & (vv >= 0) & (vv < res)
            img[vv[ok], uu[ok]] = cols[ok]
            zbuf[vv[ok], uu[ok]] = z[ok]
    return img, zbuf


class PointCloudRenderer:
    def __init__(self, task_model=None, intrinsics=None):
        self.K = np.asarray(intrinsics if intrinsics is not None else INTRINSICS_CLIP_VIEW)

    def render(self, render_pose, pose_batch, task_model, hide_movable: bool = False):
        """One render per movable pose. Returns list of (336,336,3) u8 RGB.

        hide_movable=True renders the task background WITHOUT the movable
        object (one identical frame per requested pose, so the return shape
        contract holds). The reference declares this parameter but its own
        branch raises NotImplementedError (pcd_visual_model.py:152-153, the
        signature is at :111); this implements the declared intent.
        """
        bg_pcd = task_model.task_bground_obj.vis_model
        pose_batch = np.asarray(pose_batch).reshape(-1, 4, 4)
        if hide_movable:
            img, _ = splat(
                bg_pcd.points, bg_pcd.colors,
                np.asarray(render_pose, np.float64), self.K,
            )
            img[np.all(img > 220, axis=-1)] = 0
            return [img.copy() for _ in range(len(pose_batch))]
        mv_pcd = task_model.movable_obj.vis_model
        old_pose = np.asarray(task_model.movable_obj.pose, np.float64).reshape(4, 4)

        out = []
        for pose in pose_batch:
            tf = pose @ np.linalg.inv(old_pose)
            moved = mv_pcd.transformed(tf)
            pts = np.concatenate([bg_pcd.points, moved.points])
            cols = np.concatenate([bg_pcd.colors, moved.colors])
            img, _ = splat(pts, cols, np.asarray(render_pose, np.float64), self.K)
            # White background -> black (pcd_visual_model.py:147-148).
            img[np.all(img > 220, axis=-1)] = 0
            out.append(img)
        return out
