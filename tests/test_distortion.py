"""Brown-Conrady lens model: forward/inverse consistency and end-to-end
consumers (synth generation, dynamic masks, TSDF fusion).

Reference camera block: cfg.py:101-112 (k1, k2, p1, p2, k3, k4); instant-ngp
applies the model via render_with_lens_distortion (train_ngp.py:70).
"""

import jax.numpy as jnp
import numpy as np

from dream2real_tpu.data import synth
from dream2real_tpu.ops import cameras

DIST = np.asarray(synth.DEFAULT_DISTORTION, np.float32)


def test_normalize_distortion():
    assert cameras.normalize_distortion(None) is None
    assert cameras.normalize_distortion(np.zeros(6)) is None
    d = cameras.normalize_distortion(DIST)
    np.testing.assert_allclose(d, DIST)


def test_undistort_roundtrip():
    """pixel_dirs' iterative undistortion inverts distort_coords: distorting
    the undistorted ray coords must land back on the pixel grid."""
    h, w = 60, 80
    f = 0.9 * w
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    dirs = np.asarray(cameras.pixel_dirs(h, w, jnp.asarray(K), jnp.asarray(DIST)))
    xd, yd = cameras.distort_coords(dirs[..., 0], dirs[..., 1], DIST)
    u = xd * f + w / 2
    v = yd * f + h / 2
    gu, gv = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    assert np.abs(u - gu).max() < 0.05  # px
    assert np.abs(v - gv).max() < 0.05


def test_synth_distorted_render_differs_at_edges_only():
    scene = synth.default_scene()
    h, w = 90, 120
    f = 0.9 * w
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    T = synth.orbit_poses(scene.centre, 1)[0]
    rgb_p, depth_p, _ = synth.render_scene(scene, T, K, h, w)
    rgb_d, depth_d, _ = synth.render_scene(scene, T, K, h, w, distortion=DIST)
    # Center pixel: (near-)identical (r^2 ~ 0 -> no distortion).
    cy, cx = h // 2, w // 2
    np.testing.assert_allclose(
        rgb_d[cy - 1 : cy + 2, cx - 1 : cx + 2],
        rgb_p[cy - 1 : cy + 2, cx - 1 : cx + 2],
    )
    # The images differ (the lens model did something) — only object/plane
    # EDGE pixels can change on this mostly-uniform scene, so the differing
    # fraction is small but must be nonzero.
    assert (rgb_d != rgb_p).mean() > 5e-4
    # Barrel distortion (k1 < 0): edge content shifts; depth maps differ at
    # the boundary rows but not at the exact center.
    assert np.abs(depth_d[0] - depth_p[0]).max() > 1e-3
    assert abs(float(depth_d[cy, cx] - depth_p[cy, cx])) < 1e-5


def test_dynamic_masks_undistort():
    """A distorted depth map back-projected WITH the lens model must give the
    same dynamic mask as the pinhole depth map with pinhole projection."""
    from dream2real_tpu.data.loader import compute_dynamic_masks

    scene = synth.default_scene()
    h, w = 90, 120
    f = 0.9 * w
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    T = synth.orbit_poses(scene.centre, 2)
    depths_p = np.stack(
        [synth.render_scene(scene, T[i], K, h, w)[1] for i in range(2)]
    )
    depths_d = np.stack(
        [synth.render_scene(scene, T[i], K, h, w, distortion=DIST)[1]
         for i in range(2)]
    )
    bounds = np.array([[0.2, -0.35, -100.0], [0.85, 0.35, 0.35]])
    m_p = np.asarray(compute_dynamic_masks(
        jnp.asarray(depths_p), jnp.asarray(T.astype(np.float32)),
        jnp.asarray(K, jnp.float32), bounds,
    ))
    m_d = np.asarray(compute_dynamic_masks(
        jnp.asarray(depths_d), jnp.asarray(T.astype(np.float32)),
        jnp.asarray(K, jnp.float32), bounds, distortion=DIST,
    ))
    # Same scene geometry -> near-identical masks (morphology absorbs the
    # sub-pixel resampling differences; allow a small boundary band).
    assert (m_p != m_d).mean() < 0.02


def test_tsdf_fusion_distorted_matches_pinhole_geometry():
    """Fusing DISTORTED depth with the forward lens model must recover the
    same object geometry as fusing pinhole depth pinhole-projected."""
    from dream2real_tpu.physics.tsdf import fuse_tsdf, grid_centroid

    scene = synth.default_scene()
    h, w = 90, 120
    f = 0.9 * w
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    T = synth.orbit_poses(scene.centre, 6)
    depth_p, inst_p, depth_d, inst_d = [], [], [], []
    for i in range(len(T)):
        _, dp, ip = synth.render_scene(scene, T[i], K, h, w)
        _, dd, idd = synth.render_scene(scene, T[i], K, h, w, distortion=DIST)
        depth_p.append(dp), inst_p.append(ip)
        depth_d.append(dd), inst_d.append(idd)
    bounds = ((0.30, -0.25, -0.02), (0.80, 0.25, 0.25))
    common = dict(
        cam_poses=jnp.asarray(T.astype(np.float32)),
        intrinsics=jnp.asarray(K, jnp.float32),
        bounds=bounds, voxel_size=0.008, erosion_kernel=2,
    )
    # Movable (red box) masks, instance id 1.
    g_p = fuse_tsdf(
        jnp.asarray(np.stack(depth_p)),
        jnp.asarray(np.stack(inst_p) == 1), **common,
    )
    g_d = fuse_tsdf(
        jnp.asarray(np.stack(depth_d)),
        jnp.asarray(np.stack(inst_d) == 1), distortion=DIST, **common,
    )
    c_p = np.asarray(grid_centroid(g_p))
    c_d = np.asarray(grid_centroid(g_d))
    # Same object -> centroids agree within ~a voxel.
    assert np.linalg.norm(c_p - c_d) < 0.012, (c_p, c_d)
    # Control: fusing distorted depth WITHOUT the lens model must be worse
    # than with it (proves the forward model is actually doing the work).
    g_wrong = fuse_tsdf(
        jnp.asarray(np.stack(depth_d)),
        jnp.asarray(np.stack(inst_d) == 1), **common,
    )
    c_wrong = np.asarray(grid_centroid(g_wrong))
    assert np.linalg.norm(c_p - c_d) < np.linalg.norm(c_p - c_wrong), (
        c_p, c_d, c_wrong,
    )
