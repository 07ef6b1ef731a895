"""Offline visualisation exports + vis utils (PARITY rows 15/23)."""

import os

import numpy as np

from dream2real_tpu.vis.cost_volume import export_cost_volume, export_multiverse
from dream2real_tpu.vis.utils import seg_overlay, visimg


def _grid(nx=6, ny=5, nz=2):
    xs = np.linspace(0.3, 0.7, nx)
    ys = np.linspace(-0.2, 0.2, ny)
    zs = np.linspace(0.0, 0.1, nz)
    poses = []
    for x in xs:
        for y in ys:
            for z in zs:
                T = np.eye(4)
                T[:3, 3] = (x, y, z)
                poses.append(T)
    return np.stack(poses), [nx, ny, nz, 1, 1, 1]


def test_export_cost_volume(tmp_path):
    poses, res = _grid()
    scores = np.zeros(len(poses))
    scores[17] = 0.9
    scores[18] = 0.5  # a couple of valid poses, rest invalid (zero)
    out = os.path.join(tmp_path, "cv.png")
    export_cost_volume(scores, res, poses.reshape(-1, 16), out)
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_export_cost_volume_all_invalid_is_noop(tmp_path):
    poses, res = _grid()
    out = os.path.join(tmp_path, "cv.png")
    export_cost_volume(np.zeros(len(poses)), res, poses.reshape(-1, 16), out)
    assert not os.path.exists(out)


def test_export_multiverse(tmp_path):
    poses, res = _grid()
    scores = np.random.default_rng(0).uniform(0.1, 1.0, len(poses))
    pts = np.concatenate(
        [np.random.default_rng(1).uniform(-0.05, 0.05, (40, 3)),
         np.ones((40, 1))], axis=1
    )
    out = os.path.join(tmp_path, "mv.png")
    export_multiverse(scores, poses.reshape(-1, 16), pts, np.eye(4), out)
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_seg_overlay_and_visimg(tmp_path):
    rgb = np.random.default_rng(2).integers(0, 255, (32, 48, 3)).astype(np.uint8)
    mask = np.zeros((32, 48), np.uint8)
    mask[8:20, 10:30] = 1
    mask[4:8, 40:44] = 2
    over = seg_overlay(rgb, mask)
    assert over.shape == rgb.shape and over.dtype == np.uint8
    # Background pixels pass through; object pixels get tinted.
    assert np.array_equal(over[0, 0], rgb[0, 0])
    assert not np.array_equal(over[10, 15], rgb[10, 15])
    p = os.path.join(tmp_path, "im.png")
    visimg(rgb, p)
    assert os.path.exists(p)


def test_export_scene_html(tmp_path):
    """Interactive HTML viewer: layers embedded, caps honoured, file is a
    standalone document (no external resources)."""
    import json
    import re

    from dream2real_tpu.vis.viewer import MAX_POINTS, export_scene_html

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (MAX_POINTS + 500, 3))
    cols = rng.uniform(0, 1, (MAX_POINTS + 500, 3))
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    T = np.eye(4)
    path = export_scene_html(
        str(tmp_path / "viewer.html"),
        points=[(pts, cols, "cloud")],
        meshes=[(verts, faces, "#44cc88", "tet")],
        frames=[(T, "goal")],
        title="test scene",
    )
    html = open(path).read()
    assert "<canvas" in html and "test scene" in html
    assert "http://" not in html and "https://" not in html  # standalone
    data = json.loads(re.search(r"const DATA = (\{.*?\});\n", html).group(1))
    kinds = [layer["kind"] for layer in data["layers"]]
    assert kinds == ["points", "mesh", "frame"]
    assert len(data["layers"][0]["pts"]) == MAX_POINTS  # subsample cap
    assert len(data["layers"][0]["cols"]) == MAX_POINTS
    assert max(c for f in data["layers"][1]["faces"] for c in f) < len(
        data["layers"][1]["verts"])
