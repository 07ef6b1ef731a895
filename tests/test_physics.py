"""Physics: TSDF fusion accuracy, mesh extraction, batched validity checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dream2real_tpu.data import synth
from dream2real_tpu.physics.collision import (
    make_unsupcol_check,
    orientation_dedup_mask,
    regrasp_mask,
    sample_occupancy,
)
from dream2real_tpu.physics.mesh import (
    extract_mesh,
    largest_cluster,
    mesh_center,
    remove_small_clusters,
    save_obj,
    load_obj,
)
from dream2real_tpu.physics.tsdf import (
    TSDFGrid,
    fuse_tsdf,
    grid_centroid,
    occupied_points,
)


@pytest.fixture(scope="module")
def fused_scene():
    scene = synth.default_scene()
    h, w = 96, 128
    f = 0.8 * w
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    poses = synth.orbit_poses(scene.centre, 10, radius=0.55, height=0.5)
    depths, insts = [], []
    for i in range(len(poses)):
        _, depth, inst = synth.render_scene(scene, poses[i], K, h, w)
        depths.append(depth)
        insts.append(inst)
    return {
        "scene": scene,
        "depths": jnp.asarray(np.stack(depths)),
        "insts": np.stack(insts),
        "poses": jnp.asarray(poses.astype(np.float32)),
        "K": jnp.asarray(K),
        "bounds": ((0.2, -0.35, -0.05), (0.85, 0.35, 0.3)),
    }


def test_tsdf_fusion_movable_object(fused_scene):
    d = fused_scene
    # Object 1 = the red movable box at (0.42..0.50, -0.12..-0.04, 0..0.10).
    masks = jnp.asarray(d["insts"] == 1)
    grid = fuse_tsdf(
        d["depths"], masks, d["poses"], d["K"], d["bounds"],
        voxel_size=0.01, erosion_kernel=1,
    )
    centroid = grid_centroid(grid)
    gt_box = d["scene"].boxes[0]
    gt_centre = (np.asarray(gt_box.lo) + np.asarray(gt_box.hi)) / 2
    # TSDF only sees surfaces visible from the cameras; the centroid should
    # still land inside the box.
    assert (centroid > np.asarray(gt_box.lo) - 0.02).all(), centroid
    assert (centroid < np.asarray(gt_box.hi) + 0.02).all(), centroid

    pts = occupied_points(grid, 512)
    valid_pts = pts[pts[:, 3] > 0, :3]
    assert len(valid_pts) > 20
    # All occupied voxels within the (dilated) GT box.
    assert (valid_pts > np.asarray(gt_box.lo) - 0.03).all()
    assert (valid_pts < np.asarray(gt_box.hi) + 0.03).all()


def test_tsdf_background_excludes_movable(fused_scene):
    d = fused_scene
    # Background = everything except object 1 (fg/bg split,
    # scene_model.py:119).
    masks = jnp.asarray(d["insts"] != 1)
    grid = fuse_tsdf(
        d["depths"], masks, d["poses"], d["K"], d["bounds"],
        voxel_size=0.01, erosion_kernel=3,
    )
    pts = occupied_points(grid, 4096)
    valid_pts = pts[pts[:, 3] > 0, :3]
    gt_box = d["scene"].boxes[0]
    inside_movable = (
        (valid_pts > np.asarray(gt_box.lo) + 0.015) & (valid_pts < np.asarray(gt_box.hi) - 0.015)
    ).all(axis=1)
    assert inside_movable.mean() < 0.05  # movable body carved out of bg


def _sphere_grid(r=0.1, voxel=0.01):
    n = 32
    origin = np.array([-0.16, -0.16, -0.16], np.float32) + voxel / 2
    xs = origin[0] + voxel * np.arange(n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    dist = np.linalg.norm(g, axis=-1) - r
    return TSDFGrid(
        tsdf=jnp.asarray(np.clip(dist / (3 * voxel), -1, 1).astype(np.float32)),
        weight=jnp.ones((n, n, n), jnp.float32),
        origin=jnp.asarray(origin),
        voxel_size=voxel,
    )


def test_marching_tets_sphere():
    grid = _sphere_grid()
    verts, faces = extract_mesh(grid)
    assert len(verts) > 100 and len(faces) > 100
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.1, atol=0.005)
    assert radii.std() < 0.005
    np.testing.assert_allclose(mesh_center(verts), [0, 0, 0], atol=0.005)
    v2, f2 = largest_cluster(verts, faces)
    assert len(f2) == len(faces)  # single component already


def test_mesh_cluster_pruning_and_obj_roundtrip(tmp_path):
    grid = _sphere_grid()
    # Inject a tiny second blob into the tsdf.
    tsdf = np.asarray(grid.tsdf).copy()
    tsdf[2:4, 2:4, 2:4] = -0.5
    tsdf[1:5, 1:5, 1:5] = np.minimum(tsdf[1:5, 1:5, 1:5], 0.9)
    grid2 = grid._replace(tsdf=jnp.asarray(tsdf))
    verts, faces = extract_mesh(grid2)
    v2, f2 = remove_small_clusters(verts, faces, keep_ratio=0.02)
    assert len(f2) < len(faces)
    p = str(tmp_path / "mesh_concave_0.obj")
    save_obj(p, v2, f2)
    lv, lf = load_obj(p)
    assert lv.shape == v2.shape and lf.shape == f2.shape
    np.testing.assert_allclose(lv, v2, atol=1e-5)


def test_sample_occupancy_trilinear():
    occ = jnp.zeros((4, 4, 4)).at[2, 2, 2].set(1.0)
    origin = jnp.zeros(3)
    v = sample_occupancy(occ, origin, 1.0, jnp.asarray([[2.0, 2.0, 2.0]]))
    np.testing.assert_allclose(np.asarray(v), [1.0], atol=1e-6)
    v2 = sample_occupancy(occ, origin, 1.0, jnp.asarray([[2.5, 2.0, 2.0]]))
    np.testing.assert_allclose(np.asarray(v2), [0.5], atol=1e-6)
    # Outside the grid -> 0.
    v3 = sample_occupancy(occ, origin, 1.0, jnp.asarray([[-5.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(v3), [0.0], atol=1e-6)


def test_orientation_dedup_and_regrasp():
    from dream2real_tpu.ops.se3 import euler_angles_to_matrix, make_pose

    # 4 orientations: 0, 0 (dup), pi/2, pi about z; 2 positions.
    eulers = jnp.asarray([[0, 0, 0], [0, 0, 1e-5], [0, 0, np.pi / 2], [0, 0, np.pi]])
    R = euler_angles_to_matrix(eulers)
    poses = make_pose(R, jnp.zeros((4, 3)))
    batch = jnp.concatenate([poses, poses.at[:, 2, 3].add(0.1)], axis=0)
    keep = np.asarray(orientation_dedup_mask(batch, 4))
    np.testing.assert_array_equal(keep, [1, 0, 1, 1, 1, 0, 1, 1])

    # Regrasp: identity (z up) ok; x-flip by pi (z down) not; rot by pi/2
    # about x maps z -> ... check +z / -y rule.
    e2 = jnp.asarray([[0, 0, 0], [np.pi, 0, 0], [np.pi / 2, 0, 0]])
    p2 = make_pose(euler_angles_to_matrix(e2), jnp.zeros((3, 3)))
    rk = np.asarray(regrasp_mask(p2, 3))
    # Rx(pi) maps z to -z -> rejected; Rx(pi/2) maps z to -y -> allowed
    # (the -y facing is explicitly permitted, physics_utils.py:293-295).
    np.testing.assert_array_equal(rk, [1, 0, 1])


def test_unsupcol_check_semantics(fused_scene):
    d = fused_scene
    scene = d["scene"]
    bg_masks = jnp.asarray(d["insts"] != 1)
    bg_grid = fuse_tsdf(
        d["depths"], bg_masks, d["poses"], d["K"], d["bounds"],
        voxel_size=0.01, erosion_kernel=1,
    )
    fg_masks = jnp.asarray(d["insts"] == 1)
    fg_grid = fuse_tsdf(
        d["depths"], fg_masks, d["poses"], d["K"], d["bounds"],
        voxel_size=0.01, erosion_kernel=1,
    )
    pts = occupied_points(
        fg_grid, 256, mode="shell", bounds=((0.2, -0.35, 0.0), (0.85, 0.35, 0.3))
    )
    init_pose = np.eye(4, dtype=np.float32)
    init_pose[:3, 3] = grid_centroid(fg_grid)

    check = make_unsupcol_check(
        bg_grid, pts, init_pose, scene.centre, [8, 1, 1, 1, 1, 1],
        stability_check=False,
    )

    def pose_at(x, y, z):
        p = np.eye(4, dtype=np.float32)
        p[:3, 3] = [x, y, z]
        return p

    c = init_pose[:3, 3]
    poses = np.stack(
        [
            init_pose,                     # 0: at rest on table -> valid
            pose_at(c[0], c[1], c[2] + 0.15),  # 1: floating -> unsupported
            pose_at(0.615, 0.115, c[2]),   # 2: inside the green box -> collision
            pose_at(c[0] + 0.2, c[1], c[2]),   # 3: elsewhere on the table -> valid
            # 4: resting ON the green box (top z=0.06; movable bottom sits at
            # c[2]-0.045, so +0.06 puts it on the lid) -> valid
            pose_at(0.615, 0.115, c[2] + 0.06),
            pose_at(c[0], c[1], c[2] + 0.15),  # 5-7: repeats (grid padding)
            pose_at(c[0], c[1], c[2] + 0.15),
            pose_at(c[0], c[1], c[2] + 0.15),
        ]
    ).reshape(8, 16)
    valid = np.asarray(check(jnp.asarray(poses)))
    assert valid[0], "init pose should be valid"
    assert not valid[1], "floating pose should be unsupported"
    assert not valid[2], "pose inside another object should collide"
    assert valid[3], "free table spot should be valid"
    assert valid[4], "stacked on the green box should be valid"


def test_unsupcol_check_chunked_matches_single_launch(fused_scene, monkeypatch):
    """Shelf-scale batches stream the geometric check in chunks after
    dedup/regrasp compaction (collision.py::check); a chunk size smaller than
    the survivor count must produce identical decisions to one launch."""
    d = fused_scene
    scene = d["scene"]
    bg_grid = fuse_tsdf(
        d["depths"], jnp.asarray(d["insts"] != 1), d["poses"], d["K"],
        d["bounds"], voxel_size=0.01, erosion_kernel=1,
    )
    fg_grid = fuse_tsdf(
        d["depths"], jnp.asarray(d["insts"] == 1), d["poses"], d["K"],
        d["bounds"], voxel_size=0.01, erosion_kernel=1,
    )
    pts = occupied_points(
        fg_grid, 256, mode="shell", bounds=((0.2, -0.35, 0.0), (0.85, 0.35, 0.3))
    )
    init_pose = np.eye(4, dtype=np.float32)
    init_pose[:3, 3] = grid_centroid(fg_grid)

    from dream2real_tpu.ops.se3 import euler_angles_to_matrix, make_pose

    # 2 orientations per position (one duplicated -> dedup kills it), 24
    # positions spanning valid/colliding/floating.
    rng = np.random.default_rng(0)
    c = init_pose[:3, 3]
    t = c[None] + np.concatenate(
        [rng.uniform(-0.2, 0.2, (24, 2)), rng.uniform(-0.02, 0.15, (24, 1))], 1
    ).astype(np.float32)
    eul = jnp.asarray([[0, 0, 0], [0, 0, 1e-6]])
    R = euler_angles_to_matrix(jnp.tile(eul, (24, 1)))
    batch = np.asarray(
        make_pose(R, jnp.asarray(np.repeat(t, 2, axis=0)))
    ).reshape(-1, 16)

    check = make_unsupcol_check(
        bg_grid, pts, init_pose, scene.centre, [24, 1, 1, 2, 1, 1],
    )
    monkeypatch.setenv("D2R_PHYS_CHUNK", "7")  # << survivors (24): 4 chunks
    chunked = np.asarray(check(jnp.asarray(batch)))
    monkeypatch.setenv("D2R_PHYS_CHUNK", "32768")
    single = np.asarray(check(jnp.asarray(batch)))
    np.testing.assert_array_equal(chunked, single)
    assert chunked[1::2].sum() == 0, "duplicated orientations must dedup"
    assert 0 < chunked.sum() < len(batch), "batch must exercise both outcomes"


def test_statistical_outlier_removal():
    from dream2real_tpu.physics.poisson import remove_statistical_outliers

    rng = np.random.default_rng(0)
    dense = rng.uniform(0, 0.05, (500, 3)).astype(np.float32)
    outliers = np.array([[1.0, 1.0, 1.0], [-0.8, 0.3, 2.0]], np.float32)
    pts = np.concatenate([dense, outliers])
    inl = remove_statistical_outliers(pts)
    assert not inl[-1] and not inl[-2], "distant points must be rejected"
    assert inl[:500].mean() > 0.9, "bulk of the dense cloud must be kept"


def test_poisson_indicator_sphere():
    """Indicator grid must be negative inside / positive outside a sampled
    sphere, and the mesh it yields must sit near the true surface."""
    from dream2real_tpu.physics.poisson import poisson_indicator, poisson_mesh

    rng = np.random.default_rng(1)
    n = 4000
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    centre = np.array([0.5, 0.0, 0.1], np.float32)
    r = 0.06
    pts = (centre + r * dirs).astype(np.float32)
    grid = poisson_indicator(pts, dirs.astype(np.float32))

    # Grid spans centre +- ~0.09 (radius + 25% pad); outside probes must
    # stay in-grid since out-of-grid sampling returns 0.
    q = np.stack([centre,                       # inside
                  centre + [0.0, 0.0, 0.082],   # outside, in-grid
                  centre + [0.082, 0.0, 0.0]])  # outside, in-grid
    vals = np.asarray(
        sample_occupancy(grid.tsdf, grid.origin, grid.voxel_size, jnp.asarray(q))
    )
    assert vals[0] < 0, f"centre should be inside, tsdf={vals[0]}"
    assert vals[1] > 0 and vals[2] > 0, f"outside should be positive: {vals}"

    verts, faces = poisson_mesh(grid, pts)
    assert len(verts) > 50 and len(faces) > 50
    err = np.abs(np.linalg.norm(verts - centre, axis=1) - r)
    assert np.median(err) < 0.01, f"median surface error {np.median(err):.4f}"


def test_phys_models_pcd_path(fused_scene, tmp_path):
    """use_phys_tsdf=False (physics_utils.py:121-167): pcd + Poisson models
    must produce artifacts, sane init poses, and a collision grid that the
    validity check consumes; cached replay must round-trip."""
    from dream2real_tpu.physics.models import get_phys_models

    d = fused_scene
    save_dir = str(tmp_path / "phys")
    handles, init_poses = get_phys_models(
        d["depths"], list(np.asarray(d["poses"])), np.asarray(d["K"]),
        d["insts"], num_objs=2, scene_bounds=d["bounds"],
        save_dir=save_dir, use_cache=False, use_phys_tsdf=False,
        max_points=512, pcd_mask_erosion=3,
    )
    assert len(handles) == 2 and len(init_poses) == 2
    import os
    for i in range(2):
        for name in (f"obj_{i}.pcd", f"mesh_concave_{i}.obj",
                     f"mesh_{i}.obj", f"init_pose_{i}.txt", f"tsdf_{i}.npz"):
            assert os.path.exists(os.path.join(save_dir, name)), name

    # Red movable box at (0.46, -0.08), z span 0..0.10. The pcd centre is
    # the mean of VISIBLE surface points (top-biased, like the reference's
    # pcd.get_center()), so z sits above the volumetric centre.
    c = init_poses[1][:3, 3]
    assert np.allclose(c[:2], [0.46, -0.08], atol=0.02), c
    assert 0.03 < c[2] < 0.1, c
    g1 = handles[1].tsdf
    inside = np.asarray(
        sample_occupancy(g1.tsdf, g1.origin, g1.voxel_size, jnp.asarray(c[None]))
    )[0]
    assert inside < 0, f"object centre should be inside its model, {inside}"
    pts = handles[1].points
    assert pts.shape == (512, 4) and pts[:, 3].sum() > 0

    # Cached replay round-trips grids and points.
    handles2, init_poses2 = get_phys_models(
        d["depths"], list(np.asarray(d["poses"])), np.asarray(d["K"]),
        d["insts"], num_objs=2, scene_bounds=d["bounds"],
        save_dir=save_dir, use_cache=True, use_phys_tsdf=False,
        max_points=512, pcd_mask_erosion=3,
    )
    np.testing.assert_allclose(init_poses2[1], init_poses[1], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(handles2[1].tsdf.tsdf), np.asarray(handles[1].tsdf.tsdf),
        atol=1e-6,
    )
    np.testing.assert_allclose(handles2[1].points, pts, atol=1e-6)
