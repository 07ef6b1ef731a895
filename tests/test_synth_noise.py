"""Real-scan rehearsal dataset (synth.write_dataset(noise=...)).

The noise preset corrupts what a real capture corrupts — RGB shot noise,
range-dependent depth error + holes, SLAM-grade SE(3) pose jitter on the
WRITTEN poses while images render from the true poses — and the loader must
consume the result exactly like a clean scan (layout parity is unchanged).
"""

import json
import os

import numpy as np
from PIL import Image

from dream2real_tpu.data import synth


def test_noise_dataset_properties(tmp_path):
    clean = str(tmp_path / "clean")
    noisy = str(tmp_path / "noisy")
    synth.write_dataset(clean, n_views=4, h=60, w=80)
    meta = synth.write_dataset(
        noisy, n_views=4, h=60, w=80, noise=synth.DEFAULT_NOISE
    )
    assert meta["noise"]["pose_rot_deg"] == synth.DEFAULT_NOISE["pose_rot_deg"]

    # Written poses carry the jitter; poses_true.txt records the render poses
    # (== the clean dataset's poses) and nothing else differs in layout.
    p_noisy = np.loadtxt(os.path.join(noisy, "poses.txt")).reshape(-1, 4, 4)
    p_true = np.loadtxt(os.path.join(noisy, "poses_true.txt")).reshape(-1, 4, 4)
    p_clean = np.loadtxt(os.path.join(clean, "poses.txt")).reshape(-1, 4, 4)
    np.testing.assert_allclose(p_true, p_clean, atol=1e-12)
    d_rot = np.stack([q[:3, :3] @ t[:3, :3].T for q, t in zip(p_noisy, p_true)])
    ang = np.degrees(np.arccos(np.clip(
        (np.trace(d_rot, axis1=1, axis2=2) - 1) / 2, -1, 1)))
    trans_mm = 1e3 * np.linalg.norm(p_noisy[:, :3, 3] - p_true[:, :3, 3], axis=1)
    assert 0.05 < ang.mean() < 3.0, ang          # jitter present, small
    assert 0.5 < trans_mm.mean() < 25.0, trans_mm
    # Still valid rotations.
    for T in p_noisy:
        np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3), atol=1e-9)
        assert abs(np.linalg.det(T[:3, :3]) - 1) < 1e-9

    # transforms.json frames match poses.txt (NGP column flips applied).
    tf = json.load(open(os.path.join(noisy, "transforms.json")))
    c2w = np.asarray(tf["frames"][0]["transform_matrix"])
    expect = p_noisy[0].copy()
    expect[:3, 1] *= -1
    expect[:3, 2] *= -1
    np.testing.assert_allclose(c2w, expect, atol=1e-12)

    # Images: same scene, visibly perturbed but close; masks identical
    # (rendered from the true poses, pixel-aligned with the images).
    rgb_c = np.asarray(Image.open(os.path.join(clean, "images", "rgb_0000.png")))
    rgb_n = np.asarray(Image.open(os.path.join(noisy, "images", "rgb_0000.png")))
    diff = np.abs(rgb_c.astype(int) - rgb_n.astype(int))
    assert 0.5 < diff.mean() < 12.0, diff.mean()
    m_c = np.asarray(Image.open(os.path.join(clean, "masks", "mask_0000.png")))
    m_n = np.asarray(Image.open(os.path.join(noisy, "masks", "mask_0000.png")))
    np.testing.assert_array_equal(m_c, m_n)

    # Depth: holes (0 = invalid, trainer skips) at ~the dropout rate, and
    # nonzero values perturbed by a range-dependent error.
    d_c = np.asarray(Image.open(os.path.join(clean, "depth", "depth_0000.png")))
    d_n = np.asarray(Image.open(os.path.join(noisy, "depth", "depth_0000.png")))
    holes = (d_n == 0) & (d_c != 0)
    rate = holes.sum() / max((d_c != 0).sum(), 1)
    assert 0.005 < rate < 0.08, rate
    both = (d_n != 0) & (d_c != 0)
    err_mm = np.abs(d_n[both].astype(int) - d_c[both].astype(int))
    assert 0.5 < err_mm.mean() < 20.0, err_mm.mean()

    # Clean path unchanged: no poses_true.txt, meta noise None.
    assert not os.path.exists(os.path.join(clean, "poses_true.txt"))
    meta_c = json.load(open(os.path.join(clean, "synth_meta.json")))
    assert meta_c["noise"] is None
