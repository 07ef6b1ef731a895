"""Integration: train a tiny NGP on the analytic synthetic scene; PSNR + depth.

This is the TPU-build equivalent of validating against cached `.ingp` renders
(SURVEY.md §7 step 2): the synthetic scene gives exact color/depth ground
truth without external data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dream2real_tpu.data import synth
from dream2real_tpu.nerf.hashgrid import HashGridConfig
from dream2real_tpu.nerf.model import NGPConfig
from dream2real_tpu.nerf.render import RenderSettings, render_image
from dream2real_tpu.nerf.trainer import (
    TrainConfig,
    init_train_state,
    make_train_chunk,
    train_with_governor,
)
from dream2real_tpu.ops import cameras
from dream2real_tpu.ops.image import linear_to_srgb


@pytest.fixture(scope="module")
def tiny_scene_data():
    scene = synth.default_scene()
    h, w = 64, 64
    f = 0.9 * w
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    poses = synth.orbit_poses(scene.centre, 12, radius=0.5, height=0.4)
    rgbs, depths = [], []
    for i in range(len(poses)):
        rgb, depth, _ = synth.render_scene(scene, poses[i], K, h, w)
        rgbs.append(rgb)
        depths.append(depth)
    rgba = np.concatenate(
        [np.stack(rgbs), np.full((len(poses), h, w, 1), 255, np.uint8)], axis=-1
    )
    return {
        "rgba": jnp.asarray(rgba),
        "depths": np.stack(depths),
        "poses": jnp.asarray(poses.astype(np.float32)),
        "K": K,
        "hw": (h, w),
    }


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse)


def test_train_synthetic_scene(tiny_scene_data):
    d = tiny_scene_data
    h, w = d["hw"]
    cfg = NGPConfig(
        field_type="mlp", mlp_width=96, mlp_depth=4, skip_layer=2,
        posenc_deg=6, geo_feat_dim=7,
        aabb_min=(0.0, -0.6, -0.1),
        aabb_max=(1.1, 0.6, 0.9),
    )
    tc = TrainConfig(n_steps=600, batch_rays=1024, poll_steps=100,
                     dynamic_time_extension=False, optimize_extrinsics=False)
    settings = RenderSettings(n_coarse=24, n_fine=24, near=0.05, far=2.0)
    dirs_cam = cameras.pixel_dirs(h, w, jnp.asarray(d["K"]))
    state = init_train_state(cfg, tc, n_images=d["rgba"].shape[0])
    chunk = make_train_chunk(
        cfg, tc, settings, d["rgba"], d["poses"], dirs_cam,
        depths=jnp.asarray(d["depths"]),
    )
    state, losses = train_with_governor(chunk, state, tc)
    assert losses[-1] < losses[0] * 0.5, losses

    # Render a held-in view and compare to GT.
    out = render_image(state["params"]["field"], cfg, d["poses"][0], dirs_cam, settings)
    rgb_lin = np.asarray(out["rgb"])
    alpha = np.asarray(out["alpha"])[..., None]
    rgb = np.where(alpha > 0, rgb_lin / np.maximum(alpha, 1e-6), 0.0)
    img = (np.asarray(linear_to_srgb(jnp.asarray(rgb))) * 255).astype(np.uint8)
    gt = np.asarray(d["rgba"][0, :, :, :3])
    psnr = _psnr(img, gt)
    assert psnr > 16.0, f"PSNR too low: {psnr:.2f}"

    # Depth at image centre should be near GT z-depth.
    gt_depth = d["depths"][0]
    pred_depth = np.asarray(out["depth"])
    centre = (slice(h // 2 - 8, h // 2 + 8), slice(w // 2 - 8, w // 2 + 8))
    err = np.abs(pred_depth[centre] - gt_depth[centre])
    assert np.median(err) < 0.05, float(np.median(err))


def test_extrinsics_optimisation_recovers_perturbation(tiny_scene_data):
    """Perturb one camera pose; optimize_extrinsics should reduce loss below
    the frozen-extrinsics baseline (pyngp optimize_extrinsics parity,
    train_ngp.py:66)."""
    d = tiny_scene_data
    h, w = d["hw"]
    cfg = NGPConfig(
        field_type="mlp", mlp_width=64, mlp_depth=3, skip_layer=2,
        posenc_deg=6, geo_feat_dim=7,
        aabb_min=(0.0, -0.6, -0.1),
        aabb_max=(1.1, 0.6, 0.9),
    )
    poses = np.asarray(d["poses"]).copy()
    # Rotate camera 0 by ~2 degrees about z and shift 1.5 cm.
    c, s = np.cos(0.035), np.sin(0.035)
    Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    poses[0, :3, :3] = poses[0, :3, :3] @ Rz
    poses[0, :3, 3] += np.array([0.015, 0, 0], np.float32)
    dirs_cam = cameras.pixel_dirs(h, w, jnp.asarray(d["K"]))
    settings = RenderSettings(n_coarse=16, n_fine=16, near=0.05, far=2.0)

    def rot_err_deg(Ra, Rb):
        cos = (np.trace(Ra.T @ Rb) - 1) / 2
        return np.degrees(np.arccos(np.clip(cos, -1, 1)))

    true_pose = np.asarray(d["poses"][0])
    init_err = rot_err_deg(poses[0, :3, :3], true_pose[:3, :3])

    tc = TrainConfig(n_steps=500, batch_rays=768, poll_steps=100,
                     dynamic_time_extension=False,
                     optimize_extrinsics=True, ext_start_step=100,
                     ext_lr=5e-4, seed=1)
    state = init_train_state(cfg, tc, n_images=len(poses))
    chunk = make_train_chunk(cfg, tc, settings, d["rgba"], jnp.asarray(poses), dirs_cam)
    state, losses = train_with_governor(chunk, state, tc)
    assert losses[-1] < losses[0] * 0.5, losses  # training still converges

    from dream2real_tpu.nerf.trainer import optimized_poses

    opt = np.asarray(optimized_poses(state["params"], jnp.asarray(poses)))
    final_err = rot_err_deg(opt[0, :3, :3], true_pose[:3, :3])
    # The 11 consistent cameras anchor the field; camera 0's 2-degree
    # perturbation must shrink measurably.
    assert final_err < init_err * 0.75, (init_err, final_err)


def test_freespace_carving_masked_fg_field(tiny_scene_data):
    """Regression: a masked task-field must reconstruct the object at its
    observed DEPTH, not as per-camera near shells ("billboards").

    The combined noise+distortion rehearsal collapsed exactly this way: the
    movable fg field put all its density at t~0.16 (gt ~0.75) — satisfying
    RGB at the masked pixels while the magnitude-capped huber depth gradient
    tolerated it — and rendered EMPTY inside the crop renderer's march box.
    Free-space carving (TrainConfig.freespace_weight) makes that minimum
    expensive; this pins (a) density in front of the surface ~0 and (b)
    rendered depth at masked pixels near GT.
    """
    d = tiny_scene_data
    h, w = d["hw"]
    scene = synth.default_scene()
    poses = np.asarray(d["poses"])
    rgba = np.asarray(d["rgba"]).copy()
    fg_px = []
    for i in range(len(poses)):
        _, _, seg = synth.render_scene(scene, poses[i], d["K"], h, w)
        m = seg == 1  # the red box = movable object
        rgba[i, :, :, 3] = np.where(m, 255, 0)
        ys, xs = np.nonzero(m)
        fg_px.append(np.stack([np.full_like(ys, i), ys, xs], axis=1))
    fg_px = np.concatenate(fg_px).astype(np.int32)

    cfg = NGPConfig(
        field_type="mlp", mlp_width=96, mlp_depth=4, skip_layer=2,
        posenc_deg=6, geo_feat_dim=7,
        aabb_min=(0.0, -0.6, -0.1),
        aabb_max=(1.1, 0.6, 0.9),
    )
    tc = TrainConfig(n_steps=600, batch_rays=1024, poll_steps=100,
                     dynamic_time_extension=False)
    settings = RenderSettings(n_coarse=24, n_fine=24, near=0.05, far=2.0)
    dirs_cam = cameras.pixel_dirs(h, w, jnp.asarray(d["K"]))
    state = init_train_state(cfg, tc, n_images=len(poses))
    chunk = make_train_chunk(
        cfg, tc, settings, jnp.asarray(rgba), d["poses"], dirs_cam,
        depths=jnp.asarray(d["depths"]), fg_pixels=jnp.asarray(fg_px),
    )
    state, losses = train_with_governor(chunk, state, tc)
    assert losses[-1] < losses[0] * 0.5, losses

    # Probe camera 0's masked rays: density strictly before the surface must
    # be carved out, and the rendered depth must sit at the observed surface.
    from dream2real_tpu.nerf.model import density_fn
    from dream2real_tpu.nerf.render import render_rays

    # Probe INTERIOR masked pixels only (erode 1) across several cameras:
    # on the 64x64 fixture the box is ~10 px wide, and at this tiny training
    # budget (600 steps, 24+24 samples) box-EDGE rays legitimately render a
    # blurred silhouette whose depth mixes object and background — the
    # billboard regression this test pins shows up as interior rays at the
    # wrong depth, not edge blur.
    from scipy.ndimage import binary_erosion

    sel_parts = []
    for ci in range(0, 8, 2):
        _, _, seg_c = synth.render_scene(scene, poses[ci], d["K"], h, w)
        ysc, xsc = np.nonzero(binary_erosion(seg_c == 1, iterations=1))
        sel_parts.append(
            np.stack([np.full_like(ysc, ci), ysc, xsc], axis=1)
        )
    sel = np.concatenate(sel_parts).astype(np.int32)
    assert len(sel) >= 30, f"probe set too small: {len(sel)}"
    gt_d = np.asarray(d["depths"])[sel[:, 0], sel[:, 1], sel[:, 2]]
    d_cam = np.asarray(dirs_cam)[sel[:, 1], sel[:, 2]]
    R = poses[sel[:, 0], :3, :3]
    wd = np.einsum("nij,nj->ni", R, d_cam).astype(np.float32)
    o = poses[sel[:, 0], :3, 3].astype(np.float32)
    # Free span: [near + eps, 0.75 * gt_d] along each masked ray.
    fr = np.linspace(0.1, 0.75, 8, dtype=np.float32)
    t_free = settings.near + fr[None, :] * (0.75 * gt_d[:, None] - settings.near)
    pts = o[:, None, :] + wd[:, None, :] * t_free[..., None]
    sigma, _ = density_fn(state["params"]["field"], jnp.asarray(pts), cfg)
    occ = 1.0 - np.exp(-np.asarray(sigma, np.float32) * 0.02)
    assert float(occ.mean()) < 0.05, f"free-space occupancy {occ.mean():.3f}"

    out = render_rays(
        state["params"]["field"], cfg, jnp.asarray(o), jnp.asarray(wd), settings
    )
    alpha = np.asarray(out["alpha"], np.float32)
    depth = np.asarray(out["depth"], np.float32)
    assert float(alpha.mean()) > 0.7, f"masked rays under-opaque {alpha.mean():.3f}"
    # Depth gates target the BILLBOARD mode specifically (density at
    # ~0.2x the observed depth): the rendered depth must sit at the
    # surface scale, and a solid fraction of interior rays must be
    # depth-accurate. At this 600-step budget some azimuths render
    # through an underfit face to the table (~+0.33 m, bounded) — that is
    # small-budget blur, not collapse, so a tight global median is NOT
    # asserted.
    sel_d = depth[alpha > 0.5]
    sel_gt = gt_d[alpha > 0.5]
    assert float(np.median(sel_d)) > 0.8 * float(np.median(sel_gt)), (
        np.median(sel_d), np.median(sel_gt))
    err = np.abs(sel_d - sel_gt)
    frac_good = float((err < 0.06).mean())
    assert frac_good >= 0.3, f"depth-accurate fraction {frac_good:.2f}"
