"""Registration (ICP/pose graph), association, and aux tool tests."""

import numpy as np
from scipy.spatial.transform import Rotation as R

from dream2real_tpu.registration import (
    estimate_normals,
    full_registration,
    optimize_pose_graph,
    pairwise_registration,
    point_to_plane_icp,
)


def _plane_cloud(rng, n=2000):
    """Two perpendicular planes + a bump (well-constrained for ICP)."""
    a = np.stack([rng.uniform(0, 1, n), rng.uniform(0, 1, n), np.zeros(n)], -1)
    b = np.stack([rng.uniform(0, 1, n // 2), np.zeros(n // 2), rng.uniform(0, 0.5, n // 2)], -1)
    c = np.stack(
        [rng.uniform(0.4, 0.6, n // 4), rng.uniform(0.4, 0.6, n // 4), rng.uniform(0, 0.2, n // 4)],
        -1,
    )
    return np.concatenate([a, b, c]).astype(np.float64)


def test_normals_on_plane(rng):
    pts = np.stack([rng.uniform(0, 1, 500), rng.uniform(0, 1, 500), np.zeros(500)], -1)
    n = estimate_normals(pts, camera_location=[0.5, 0.5, 1.0])
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-6)
    assert (n[:, 2] > 0).all()  # oriented towards the camera


def test_icp_recovers_transform(rng):
    src = _plane_cloud(rng)
    T_true = np.eye(4)
    T_true[:3, :3] = R.from_euler("xyz", [0.02, -0.015, 0.03]).as_matrix()
    T_true[:3, 3] = [0.01, -0.008, 0.005]
    target = src @ T_true[:3, :3].T + T_true[:3, 3]
    T_est, fitness, rmse = point_to_plane_icp(src, target, max_correspondence_distance=0.05)
    np.testing.assert_allclose(T_est, T_true, atol=2e-3)
    assert fitness > 0.9 and rmse < 0.01


def test_multiway_pose_graph(rng):
    base = _plane_cloud(rng, n=1200)
    # Three frames along a known camera trajectory (cloud observed in frame i
    # coords: p_i = T_i_inv(p_world)).
    steps = [np.eye(4)]
    for k in range(2):
        T = np.eye(4)
        T[:3, :3] = R.from_euler("z", 0.02 * (k + 1)).as_matrix()
        T[:3, 3] = [0.02 * (k + 1), 0.01, 0]
        steps.append(T)
    pcds = [base @ np.linalg.inv(T)[:3, :3].T + np.linalg.inv(T)[:3, 3] for T in steps]
    graph = full_registration(pcds, voxel_size=0.01)
    assert len(graph.nodes) == 3
    assert any(e[4] for e in graph.edges)  # loop closure present
    opt = optimize_pose_graph(graph)
    # Optimised relative node poses should match the true trajectory.
    rel = np.linalg.inv(opt[0]) @ opt[1]
    # node poses are world_from_frame up to gauge; compare relative motion.
    rel_true = np.linalg.inv(steps[0]) @ steps[1]
    np.testing.assert_allclose(rel[:3, 3], rel_true[:3, 3], atol=5e-3)


def test_associate(tmp_path):
    from dream2real_tpu.data.associate import associate

    d = str(tmp_path)
    with open(f"{d}/rgb_timestamps.txt", "w") as f:
        f.write("1.0\n2.0\n3.1\n")
    with open(f"{d}/seg_timestamps.txt", "w") as f:
        f.write("0.5\n1.1\n1.9\n3.0\n")
    assert associate(d) == [1, 2, 3]
    with open(f"{d}/associate_index.txt", "w") as f:
        f.write("0\n2\n3\n")
    assert associate(d) == [0, 2, 3]


def test_diffusion_inpaint_fallback(rng):
    from dream2real_tpu.perception.diffusion import inpaint

    img = rng.integers(0, 200, (32, 32, 3), dtype=np.uint8)
    img[10:15, 10:15] = 255  # white hole
    out = inpaint(img)
    assert out.shape == img.shape
    # Hole filled with non-white content.
    assert out[12, 12].max() < 250
