"""Pose-grid sampling + spatial smoothing parity tests vs torch/torchvision."""

import numpy as np
import jax.numpy as jnp
import torch

from dream2real_tpu.sampling import sample_poses_grid
from dream2real_tpu.smoothing import spatially_smooth_heatmap


def _torch_reference_smooth(pose_scores, sample_res, sigma=0.7):
    """Golden re-statement of geometry_utils.py:252-269 semantics using torch
    + scipy (torchvision.gaussian_blur == scipy gaussian_filter mode='mirror'
    with radius=ksize//2; torchvision is not installed in this image)."""
    from scipy.ndimage import gaussian_filter

    pose_scores = torch.tensor(pose_scores).clone()
    min_nonzero = torch.min(pose_scores[pose_scores != 0]).item()
    zero_idxs = torch.nonzero(pose_scores == 0, as_tuple=True)
    pose_scores[zero_idxs] = min_nonzero
    pose_scores = pose_scores.view(
        sample_res[0] * sample_res[1],
        sample_res[2] * sample_res[3] * sample_res[4] * sample_res[5],
    )
    pose_scores = pose_scores.swapaxes(0, 1).unsqueeze(1)
    pose_scores = pose_scores.view(-1, 1, sample_res[0], sample_res[1])
    # torchvision.functional.pad(padding=1, fill=min_nonzero, 'constant'):
    padded = np.pad(
        pose_scores.numpy(),
        ((0, 0), (0, 0), (1, 1), (1, 1)),
        constant_values=min_nonzero,
    )
    smoothed = np.stack(
        [
            gaussian_filter(p[0], sigma=sigma, radius=1, mode="mirror")[None]
            for p in padded
        ]
    )
    smoothed = torch.tensor(smoothed[:, :, 1:-1, 1:-1])
    smoothed = smoothed.reshape(-1, 1, sample_res[0] * sample_res[1]).squeeze(1)
    smoothed = smoothed.swapaxes(0, 1).reshape(-1)
    smoothed[zero_idxs] = 0
    return smoothed.numpy()


def test_smoothing_matches_torchvision(rng):
    sample_res = [7, 6, 2, 1, 1, 1]
    n = int(np.prod(sample_res))
    scores = rng.uniform(0.5, 2.0, size=n).astype(np.float32)
    scores[rng.uniform(size=n) < 0.3] = 0.0
    ours = np.asarray(spatially_smooth_heatmap(jnp.asarray(scores), sample_res))
    ref = _torch_reference_smooth(scores, sample_res)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_smoothing_preserves_invalid_zeros(rng):
    sample_res = [5, 5, 1, 1, 1, 1]
    scores = rng.uniform(1.0, 2.0, size=25).astype(np.float32)
    scores[[0, 7, 13]] = 0.0
    out = np.asarray(spatially_smooth_heatmap(jnp.asarray(scores), sample_res))
    assert (out[[0, 7, 13]] == 0).all()
    assert (out[scores != 0] > 0).all()


def _torch_reference_grid(scene_centre, sample_res, scene_type):
    """Golden re-statement of obj_pose_opt.py:8-55 using torch + scipy."""
    from scipy.spatial.transform import Rotation as R

    bounds = {
        0: [(-0.12, 0.04), (-0.10, 0.06), (0.00, 0.085), (0, 0), (0, 0), (0, 0)],
        3: [(-0.19, 0.15), (-0.25, 0.10), (0.00, 0.14), (0, 0), (0, 0), (0, 0)],
        1: [
            (-0.15, 0.20), (0.40, 0.44), (0.04, 0.41),
            (-np.pi, np.pi / 2), (-np.pi, np.pi / 2), (-np.pi, np.pi / 2),
        ],
    }[scene_type]
    axes = []
    for d in range(6):
        lo, hi = bounds[d]
        off = scene_centre[d] if d < 3 else 0.0
        axes.append(torch.linspace(lo + off, hi + off, sample_res[d]))
    combos = torch.cartesian_prod(*axes)
    if combos.ndim == 1:
        combos = combos.unsqueeze(-1)
    n = combos.shape[0]
    out = torch.eye(4).repeat(n, 1, 1)
    out[:, :3, 3] = combos[:, :3]
    rots = R.from_euler("XYZ", combos[:, 3:].numpy()).as_matrix()
    out[:, :3, :3] = torch.tensor(rots, dtype=torch.float32)
    return out.reshape(-1, 16).numpy()


def test_sample_poses_grid_matches_reference_shopping():
    centre = [0.5, 0.0, 0.035]
    res = [5, 4, 3, 1, 1, 1]
    ours = np.asarray(sample_poses_grid(centre, res, scene_type=3))
    ref = _torch_reference_grid(centre, res, 3)
    assert ours.shape == (60, 16)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_sample_poses_grid_matches_reference_shelf_6dof():
    centre = [0.1, -0.2, 0.3]
    res = [3, 2, 2, 2, 2, 2]
    ours = np.asarray(sample_poses_grid(centre, res, scene_type=1))
    ref = _torch_reference_grid(centre, res, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sample_poses_grid_bounds_override():
    centre = [0.0, 0.0, 0.0]
    bounds = [(-1, 1), (-2, 2), (0, 0), (0, 0), (0, 0), (0, 0)]
    out = np.asarray(
        sample_poses_grid(centre, [3, 3, 1, 1, 1, 1], scene_type=99, bounds_override=bounds)
    ).reshape(-1, 4, 4)
    assert out[:, 0, 3].min() == -1 and out[:, 0, 3].max() == 1
    assert out[:, 1, 3].min() == -2 and out[:, 1, 3].max() == 2
