"""Reconstruction IO: poses.txt <-> transforms.json round-trip, snapshots."""

import json
import os

import numpy as np
from PIL import Image
from scipy.spatial.transform import Rotation as R

from dream2real_tpu.cfg import Config
from dream2real_tpu.reconstruction import (
    export_task_transforms,
    load_transforms_dataset,
    raw_poses_convert,
)


def _write_min_cfg(path, data_dir, w=8, h=6):
    cfg = {
        "dataset": {"files": "transforms.json"},
        "trainer": {
            "train": True, "train_device": "tpu", "data_device": "tpu",
            "scale": 1000.0, "load_snapshot": False, "n_steps": 1,
            "save_snapshot": False, "near_distance": 0.05,
            "optimize_extrinsics": True,
        },
        "render": {"depth_range": [0.0, 3.0]},
        "camera": {
            "fx": 10.0, "fy": 11.0, "k1": 0.1, "k2": 0, "k3": 0, "k4": 0,
            "p1": 0, "p2": 0, "is_fisheye": False, "cx": 4.0, "cy": 3.0,
            "w": w, "h": h, "aabb_scale": 2, "scale": 1,
            "offset": [0, 0, 0], "mw": 0, "mh": 0,
        },
        "vis": {"gui": False},
    }
    json.dump(cfg, open(path, "w"))


def test_raw_poses_convert_roundtrip(tmp_path, rng):
    d = str(tmp_path)
    os.makedirs(f"{d}/images")
    n = 3
    poses = np.stack([np.eye(4)] * n)
    for i in range(n):
        poses[i, :3, :3] = R.from_euler("xyz", rng.uniform(-1, 1, 3)).as_matrix()
        poses[i, :3, 3] = rng.normal(size=3)
        Image.fromarray(
            rng.integers(0, 255, (6, 8, 3), dtype=np.uint8)
        ).save(f"{d}/images/rgb_{i:04d}.png")
    np.savetxt(f"{d}/poses.txt", poses.reshape(-1, 4))

    cfg_path = str(tmp_path / "cfg.json")
    _write_min_cfg(cfg_path, d)
    cfg = Config(cfg_path, d)
    raw_poses_convert(cfg, f"{d}/transforms.json")

    imgs, loaded, K, dist = load_transforms_dataset(f"{d}/transforms.json", d)
    assert imgs.shape == (n, 6, 8, 4)
    # NGP flip applied on write and undone on read -> accio round-trip.
    np.testing.assert_allclose(loaded, poses.astype(np.float32), atol=1e-6)
    assert K[0, 0] == 10.0 and K[1, 2] == 3.0
    assert dist is not None and dist[0] == 0.1

    # fg/bg transforms export (train_ngp.py:165-242): same round-trip via
    # images_fg file paths.
    os.makedirs(f"{d}/images_fg")
    os.makedirs(f"{d}/images_bg")
    for i in range(n):
        for tag in ("fg", "bg"):
            Image.fromarray(
                rng.integers(0, 255, (6, 8, 4), dtype=np.uint8)
            ).save(f"{d}/images_{tag}/rgb_{i:04d}.png")
    export_task_transforms(cfg, poses)
    for tag in ("fg", "bg"):
        _, loaded2, _, _ = load_transforms_dataset(f"{d}/{tag}_transforms.json", d)
        np.testing.assert_allclose(loaded2, poses.astype(np.float32), atol=1e-6)
        meta = json.load(open(f"{d}/{tag}_transforms.json"))
        assert meta["frames"][0]["file_path"].startswith(f"./images_{tag}/")
        assert meta["aabb_scale"] == 1  # train_ngp.py:184
