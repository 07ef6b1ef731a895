"""SAM post-proc suite, XMem pruning, 2D compositor, grasp math tests."""

import numpy as np

from dream2real_tpu.compositor2d import composite_images, normalise_tensor
from dream2real_tpu.grasp import (
    get_grasp_pose,
    get_grasp_pose_from_pix,
    normalise_angle,
    patch_up_depth,
    rotate_grasp_about_normal,
)
from dream2real_tpu.perception.segmentation import (
    build_background_mask,
    disconnected_components_suppression,
    disconnected_prune,
    duplicate_prune,
    integrate_masks,
    large_obj_suppression,
    postprocess_sam_masks,
    small_obj_suppression,
    subpart_suppression,
)
from dream2real_tpu.scene_model import ObjectModel2D


def _blob(h, w, r0, r1, c0, c1):
    m = np.zeros((h, w), bool)
    m[r0:r1, c0:c1] = True
    return m


def test_sam_postproc_suite():
    h, w = 100, 120
    big = _blob(h, w, 0, 90, 0, 110)          # 82% of image -> large suppression
    a = _blob(h, w, 10, 40, 10, 40)           # keep
    sub = _blob(h, w, 12, 25, 12, 25)         # subpart of a -> suppressed
    tiny = _blob(h, w, 50, 53, 50, 53)        # 9 px -> small suppression
    two_islands = _blob(h, w, 60, 90, 60, 90) | _blob(h, w, 5, 9, 100, 118)

    masks = postprocess_sam_masks([big, a, sub, tiny, two_islands], (h, w))
    # bground + 'a' only survive.
    assert len(masks) == 2
    assert (masks[1] == a).all()
    # bground excludes the inflated object.
    assert not masks[0][25, 25]
    assert masks[0][99, 0]


def test_suppression_units():
    h, w = 50, 50
    a = _blob(h, w, 5, 25, 5, 25)
    b = _blob(h, w, 20, 30, 20, 30)  # overlaps a; smaller -> dropped
    out = subpart_suppression([a, b])
    assert len(out) == 1 and (out[0] == a).all()
    assert large_obj_suppression([_blob(h, w, 0, 45, 0, 45)], (h, w)) == []
    assert small_obj_suppression([_blob(h, w, 0, 2, 0, 40)]) == []  # sliver
    islands = _blob(h, w, 0, 10, 0, 10) | _blob(h, w, 30, 40, 30, 40)
    assert disconnected_components_suppression([islands]) == []


def test_integrate_and_prune(rng):
    h, w = 60, 80
    m1 = _blob(h, w, 5, 20, 5, 20)
    m2 = _blob(h, w, 30, 50, 30, 60)
    inst = integrate_masks([np.zeros((h, w), bool), m1, m2])
    assert set(np.unique(inst)) == {0, 1, 2}
    assert (inst[6, 6] == 1) and (inst[35, 35] == 2)

    # disconnected_prune keeps only the largest component per id.
    dup = inst.copy()
    dup[2:8, 60:75] = 2  # 90-px spurious second blob for id 2... (>200? no: 6*15=90 <200 -> dropped entirely)
    dup[40:55, 5:25] = 1  # second blob for id 1 (300 px, larger than orig 225)
    pruned = disconnected_prune(dup)
    assert pruned[45, 10] == 1 and pruned[6, 6] == 0  # larger blob kept
    assert (pruned[2:8, 60:75] != 2).all()  # small blob dropped

    # duplicate_prune keeps the component nearest the scene centre.
    depth = np.full((h, w), 1.0, np.float32)
    K = np.array([[60.0, 0, 40], [0, 60.0, 30], [0, 0, 1.0]])
    T_WC = np.eye(4)
    # two blobs of id 1: one centred (projects near origin+z), one at corner.
    m = np.zeros((h, w), np.uint8)
    m[25:45, 30:50] = 1   # central (400 px, above the 200-px floor)
    m[0:15, 0:15] = 1     # corner (225 px)
    scene_centre = [0.0, 0.0, 1.0]  # straight ahead
    refined = duplicate_prune(m, depth, T_WC, K, scene_centre)
    assert refined[30, 40] == 1 and refined[5, 5] == 0


def test_composite_images():
    bg = np.full((40, 40, 3), 100, np.uint8)
    obj = np.zeros((10, 10, 4), np.uint8)
    obj[..., 0] = 200
    obj[..., 3] = 255
    o = ObjectModel2D("o", obj, None, (0.0, 0.0), None)
    b = ObjectModel2D("bg", bg, None, (0, 0), None)
    out = composite_images([b, o], 0)
    assert out.shape == (40, 40, 4)
    assert out[20, 20, 0] == 200  # object pasted at centre
    assert out[2, 2, 0] == 100

    # pose offset moves it (+y is up -> lower row index).
    o2 = ObjectModel2D("o", obj, None, (0.5, 0.5), None)
    out2 = composite_images([b, o2], 0)
    assert out2[10, 30, 0] == 200

    n = normalise_tensor(np.array([2.0, 4.0, 6.0]))
    np.testing.assert_allclose(n, [0, 0.5, 1.0])


def test_grasp_math(rng):
    T = get_grasp_pose(np.array([0.1, 0.2, 0.3]), np.array([0, 0, 1.0]))
    # z axis points into the surface (down).
    np.testing.assert_allclose(T[:3, 2], [0, 0, -1], atol=1e-9)
    np.testing.assert_allclose(T[:3, 3], [0.1, 0.2, 0.3])
    # Rotation matrix orthonormal.
    np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3), atol=1e-9)

    T2 = rotate_grasp_about_normal(T, np.array([0, 0, 1.0]), 90)
    np.testing.assert_allclose(T2[:3, 3], T[:3, 3])
    assert abs(normalise_angle(270) - (-90)) < 1e-9

    depth = np.full((20, 20), 0.8, np.float32)
    depth[5, 5] = 0
    patched = patch_up_depth(depth)
    assert patched[5, 5] > 0.5

    K = np.array([[20.0, 0, 10], [0, 20.0, 10], [0, 0, 1.0]])
    pose, normal = get_grasp_pose_from_pix(10, 10, np.full((20, 20), 0.5, np.float32), K, np.eye(4))
    np.testing.assert_allclose(pose[:3, 3], [0, 0, 0.5], atol=1e-6)
    np.testing.assert_allclose(normal, [0, 0, 1])
