"""Cost-volume visualisation as offline exports.

Replaces the reference's interactive Open3D voxel-box heatmap + transparent
multiverse ghosts (vision_3d/geometry_utils.py:137-249) with matplotlib
renders saved to disk — TPU hosts are headless, and the exported images are
what experiment reports need anyway.
"""

from __future__ import annotations

import numpy as np


def export_cost_volume(pose_scores, sample_res, pose_batch, out_path: str, exp: bool = True):
    """Top-down (x, y) heatmap of max-over-z/orientation scores.

    Normalisation parity with vis_cost_volume (geometry_utils.py:139-151):
    10**(10*s) exaggeration over nonzero scores, min-max normalize, then max
    over all non-(x,y) dims.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    scores = np.asarray(pose_scores, np.float64).copy()
    nz = scores != 0
    if not nz.any():
        return
    if exp:
        scores[nz] = 10 ** (scores[nz] * 10)
    mn = scores[nz].min()
    mx = scores[nz].max()
    scores[nz] = (scores[nz] - mn) / max(mx - mn, 1e-12)

    res = [int(r) for r in sample_res]
    vol = scores.reshape(res[0], res[1], -1).max(axis=-1)

    pose_batch = np.asarray(pose_batch).reshape(-1, 4, 4)
    xs = pose_batch[:, 0, 3].reshape(res[0], res[1], -1)[:, 0, 0]
    ys = pose_batch[:, 1, 3].reshape(res[0], res[1], -1)[0, :, 0]

    fig, ax = plt.subplots(figsize=(6, 6))
    im = ax.pcolormesh(xs, ys, vol.T, cmap="viridis", shading="auto")
    best = np.unravel_index(np.argmax(vol), vol.shape)
    ax.plot(xs[best[0]], ys[best[1]], "r*", markersize=16)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_title("pose score cost volume (max over z, orientation)")
    fig.colorbar(im, ax=ax)
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    plt.close(fig)


def export_multiverse(
    pose_scores, pose_batch, movable_points, movable_init_pose, out_path: str,
    stride: int = 7, bground_points=None,
):
    """Ghost-overlay of candidate placements weighted by score.

    Offline replacement for vis_multiverse (geometry_utils.py:209-249): every
    `stride`-th scored pose draws the movable object's collision points (top
    view), alpha = normalized score; the static scene is drawn in grey.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    scores = np.asarray(pose_scores, np.float64).copy()
    nz = scores != 0
    if not nz.any():
        return
    mn = scores[nz].min()
    mx = scores[nz].max()
    scores[nz] = (scores[nz] - mn) / max(mx - mn, 1e-12)

    poses = np.asarray(pose_batch).reshape(-1, 4, 4)
    pts = np.asarray(movable_points)
    pts = pts[pts[:, 3] > 0, :3] if pts.shape[1] == 4 else pts
    init_inv = np.linalg.inv(np.asarray(movable_init_pose).reshape(4, 4))

    fig, ax = plt.subplots(figsize=(7, 7))
    if bground_points is not None:
        bp = np.asarray(bground_points)
        bp = bp[bp[:, 3] > 0, :3] if bp.shape[1] == 4 else bp
        ax.scatter(bp[:, 0], bp[:, 1], s=1, c="0.6", alpha=0.4, linewidths=0)
    sub = pts[:: max(len(pts) // 200, 1)]
    for i in range(0, len(poses), max(stride, 1)):
        s = scores[i]
        if s == 0:
            continue
        tf = poses[i] @ init_inv
        moved = sub @ tf[:3, :3].T + tf[:3, 3]
        ax.scatter(
            moved[:, 0], moved[:, 1], s=2, c=[[0.55, 0.98, 0.55]],
            alpha=float(0.05 + 0.9 * s), linewidths=0,
        )
    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_title("multiverse: candidate placements (alpha = score)")
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    plt.close(fig)
