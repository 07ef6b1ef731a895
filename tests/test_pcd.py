"""Point-cloud ablation path: splat renderer + pcd helpers (PARITY row 11)."""

import numpy as np

from dream2real_tpu.pcd.renderer import PointCloudRenderer, splat
from dream2real_tpu.pcd.visual_model import PointCloud, voxel_downsample


def _look_down_pose(height=0.8, centre=(0.5, 0.0, 0.0)):
    """Camera straight above `centre` looking down (accio: +z forward)."""
    T = np.eye(4)
    T[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    T[:3, 3] = (centre[0], centre[1], centre[2] + height)
    return T


K = np.array([[400.0, 0, 168.0], [0, 400.0, 168.0], [0, 0, 1.0]])


def test_splat_zbuffer_nearest_wins():
    # Two points on the same ray: the NEARER one must own the pixel.
    pts = np.array([[0.5, 0.0, 0.0], [0.5, 0.0, 0.4]])  # 0.4 is nearer the cam
    cols = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    img, zbuf = splat(pts, cols, _look_down_pose(), K, res=336)
    assert tuple(img[168, 168]) == (0, 255, 0)
    assert np.isclose(zbuf[168, 168], 0.4)


def test_splat_projection_position():
    # A point offset +x by 0.1 m at depth 0.8 lands fx*0.1/0.8 = 50 px right.
    pts = np.array([[0.6, 0.0, 0.0]])
    cols = np.array([[10, 20, 30]], np.uint8)
    img, _ = splat(pts, cols, _look_down_pose(), K, res=336)
    assert tuple(img[168, 218]) == (10, 20, 30)


def test_voxel_downsample_dedup():
    pts = np.array([[0.0, 0.0, 0.0], [0.001, 0.001, 0.0], [0.1, 0.0, 0.0]],
                   np.float32)
    cols = np.tile(np.array([[1, 2, 3]], np.uint8), (3, 1))
    p2, c2 = voxel_downsample(pts, cols, voxel=0.01)
    assert len(p2) == 2 and len(c2) == 2


def test_pointcloud_renderer_moves_object():
    class _Obj:
        pass

    class _TM:
        pass

    bg = PointCloud(
        points=np.array([[0.4, 0.0, 0.0]], np.float32),
        colors=np.array([[0, 0, 200]], np.uint8),
    )
    mv = PointCloud(
        points=np.array([[0.5, 0.0, 0.1]], np.float32),
        colors=np.array([[200, 0, 0]], np.uint8),
    )
    tm = _TM()
    tm.task_bground_obj = _Obj()
    tm.task_bground_obj.vis_model = bg
    tm.movable_obj = _Obj()
    tm.movable_obj.vis_model = mv
    tm.movable_obj.pose = np.eye(4)

    # With old_pose == I the applied transform equals the commanded pose, so
    # a +0.1 m x translation moves the point from 0.5 to 0.6.
    r = PointCloudRenderer(intrinsics=K)
    mv_pose2 = np.eye(4)
    mv_pose2[0, 3] = 0.1
    imgs = r.render(_look_down_pose(), np.stack([np.eye(4), mv_pose2]), tm)
    # Identity pose: red point projects at its original place in both...
    locs = [tuple(np.argwhere((im == [200, 0, 0]).all(-1)).mean(0).astype(int))
            for im in imgs]
    # ...and the moved pose shifts the red splat +x in image space.
    assert locs[1][1] > locs[0][1] + 30
    # The blue bg point is identical across poses.
    for im in imgs:
        assert (im == [0, 0, 200]).all(-1).any()


def test_pointcloud_renderer_hide_movable():
    """hide_movable=True: bg-only frames, one per requested pose (the
    reference declares the flag but never implemented its branch,
    pcd_visual_model.py:152-153)."""
    class _Obj:
        pass

    class _TM:
        pass

    bg = PointCloud(
        points=np.array([[0.4, 0.0, 0.0]], np.float32),
        colors=np.array([[0, 0, 200]], np.uint8),
    )
    mv = PointCloud(
        points=np.array([[0.5, 0.0, 0.1]], np.float32),
        colors=np.array([[200, 0, 0]], np.uint8),
    )
    tm = _TM()
    tm.task_bground_obj = _Obj()
    tm.task_bground_obj.vis_model = bg
    tm.movable_obj = _Obj()
    tm.movable_obj.vis_model = mv
    tm.movable_obj.pose = np.eye(4)

    r = PointCloudRenderer(intrinsics=K)
    imgs = r.render(
        _look_down_pose(), np.stack([np.eye(4), np.eye(4)]), tm,
        hide_movable=True,
    )
    assert len(imgs) == 2
    for im in imgs:
        assert (im == [0, 0, 200]).all(-1).any()      # bg point present
        assert not (im == [200, 0, 0]).all(-1).any()  # movable hidden
    np.testing.assert_array_equal(imgs[0], imgs[1])
