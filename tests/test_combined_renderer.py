"""Combined renderer: compositing semantics + cropped fast path parity."""

import jax
import jax.numpy as jnp
import numpy as np

from dream2real_tpu.data import synth
from dream2real_tpu.nerf.combined import (
    BackgroundView,
    CombinedRenderer,
    background_only_image,
    composite_one,
    crop_window,
)
from dream2real_tpu.nerf.model import NGPConfig
from dream2real_tpu.nerf.render import RenderSettings
from dream2real_tpu.nerf.trainer import (
    TrainConfig,
    init_train_state,
    make_train_chunk,
    train_with_governor,
)
from dream2real_tpu.ops import cameras


def test_composite_one_semantics():
    res = 8
    bg = BackgroundView(
        rgb=jnp.full((res, res, 3), 0.25),
        alpha=jnp.ones((res, res)),
        depth=jnp.full((res, res), 1.0),
    )
    fg_rgb = jnp.full((res, res, 3), 0.5)
    # fg nearer in the top half, farther in the bottom half; bottom-left fg
    # depth < 0.05 -> pushed to 100 (combined_rendering.py:134).
    fg_depth = jnp.concatenate(
        [jnp.full((res // 2, res), 0.5), jnp.full((res // 2, res), 2.0)]
    )
    fg_depth = fg_depth.at[-1, 0].set(0.01)
    fg_alpha = jnp.ones((res, res))
    img = np.asarray(composite_one(fg_rgb, fg_alpha, fg_depth, bg))
    # Top half shows fg (0.5 linear -> srgb ~ 0.735 -> 188).
    assert abs(int(img[0, 0, 0]) - 188) <= 1
    # Bottom half shows bg (0.25 -> srgb ~ 0.537 -> 137).
    assert abs(int(img[-1, 4, 0]) - 137) <= 1
    # Depth<0.05 guard: that pixel falls back to bg.
    assert abs(int(img[-1, 0, 0]) - 137) <= 1

    # Low alpha -> black (alpha_u8 < 130 rule).
    img2 = np.asarray(
        composite_one(fg_rgb * 0.3, fg_alpha * 0.3, fg_depth, bg._replace(alpha=jnp.zeros((res, res))))
    )
    assert (img2[0] == 0).all()

    # background_only_image == composite with empty fg.
    bg_only = np.asarray(background_only_image(bg))
    assert abs(int(bg_only[0, 0, 0]) - 137) <= 1


def test_crop_window_basics():
    res, crop = 64, 24
    K = jnp.asarray([[64.0, 0, 32.0], [0, 64.0, 32.0], [0, 0, 1.0]])
    # Camera at origin looking +z; object box centred on the axis at z=1.
    T = jnp.eye(4)
    aabb = ((-0.05, -0.05, 0.9), (0.05, 0.05, 1.1))
    v0, u0 = crop_window(T, aabb, K, res, crop)
    assert abs(int(u0) - (32 - 12)) <= 1
    assert abs(int(v0) - (32 - 12)) <= 1
    # Object far to the side -> window clamps inside the frame.
    aabb2 = ((5.0, -0.05, 0.9), (5.1, 0.05, 1.1))
    v02, u02 = crop_window(T, aabb2, K, res, crop)
    assert int(u02) == res - crop and 0 <= int(v02) <= res - crop


def test_cropped_render_matches_full(tmp_path):
    """The fast path must produce (nearly) the same images as the full-frame
    path when the object fits inside the crop window."""
    scene = synth.default_scene()
    res = 64
    f = 0.9 * res
    K = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]])
    cams = synth.orbit_poses(scene.centre, 8, radius=0.5, height=0.4)
    rgba, depths = [], []
    for i in range(len(cams)):
        rgb, depth, inst = synth.render_scene(scene, cams[i], K, res, res)
        a = np.where(inst == 1, 255, 0).astype(np.uint8)  # movable-only alpha
        rgba.append(np.concatenate([rgb, a[..., None]], -1))
        depths.append(depth)
    rgba = jnp.asarray(np.stack(rgba))

    cfg = NGPConfig(
        field_type="mlp", mlp_width=48, mlp_depth=3, skip_layer=2, posenc_deg=5,
        geo_feat_dim=7, aabb_min=(0.0, -0.6, -0.1), aabb_max=(1.1, 0.6, 0.9),
    )
    tc = TrainConfig(n_steps=200, batch_rays=512, poll_steps=100,
                     dynamic_time_extension=False)
    settings = RenderSettings(n_coarse=24, n_fine=24, near=0.05, far=2.0)
    dirs_cam = cameras.pixel_dirs(res, res, jnp.asarray(K))
    state = init_train_state(cfg, tc, n_images=len(cams))
    alpha = np.asarray(rgba[..., 3])
    fg_pixels = jnp.asarray(np.argwhere(alpha > 127).astype(np.int32))
    chunk = make_train_chunk(
        cfg, tc, settings, rgba, jnp.asarray(cams.astype(np.float32)), dirs_cam,
        depths=jnp.asarray(np.stack(depths)), fg_pixels=fg_pixels,
    )
    state, _ = train_with_governor(chunk, state, tc)
    fg_params = state["params"]["field"]

    b0 = scene.boxes[0]
    obj_aabb = (tuple(np.asarray(b0.lo) - 0.03), tuple(np.asarray(b0.hi) + 0.03))
    T_WO_1 = np.eye(4, dtype=np.float32)
    T_WO_1[:3, 3] = (np.asarray(b0.lo) + np.asarray(b0.hi)) / 2
    # Candidate poses: stay + shift.
    poses = np.stack([T_WO_1, T_WO_1.copy()])
    poses[1][:3, 3] += [0.1, 0.05, 0]

    common = dict(
        settings=settings, res=res, intrinsics=K, row_chunk=16,
    )
    full = CombinedRenderer(fg_params, cfg, fg_params, cfg, **common)
    cropped = CombinedRenderer(
        fg_params, cfg, fg_params, cfg, obj_aabb=obj_aabb, fg_crop=40,
        crop_settings=settings, **common,
    )
    args = dict(
        render_poses=cams[:1].astype(np.float32),
        render_cam_pose_idx=[0],
        depths_gt=np.stack(depths[:1]),
        movable_masks=None,
        T_WO_1=T_WO_1,
        save=False,
    )
    imgs_full = full.render(poses, **args)
    imgs_crop = cropped.render(poses, **args)
    assert imgs_full.shape == imgs_crop.shape == (2, res, res, 3)
    # The renders must actually CONTAIN the red movable object (an empty
    # field would trivially 'match'): red-dominant pixels present in both.
    for imgs in (imgs_full, imgs_crop):
        red = (imgs[0, :, :, 0].astype(int) - imgs[0, :, :, 1]) > 40
        assert red.sum() > 10, f"movable object missing from render ({red.sum()})"
    # The full path undersamples (48 samples span the whole scene depth; the
    # crop path spans only the object box), so allow a loose pixel tolerance
    # but require structural agreement: the object lands in the same place.
    diff = np.abs(imgs_full.astype(int) - imgs_crop.astype(int))
    assert np.mean(diff) < 15.0, np.mean(diff)
    for p in range(2):
        rf = np.argwhere((imgs_full[p, :, :, 0].astype(int) - imgs_full[p, :, :, 1]) > 40)
        rc = np.argwhere((imgs_crop[p, :, :, 0].astype(int) - imgs_crop[p, :, :, 1]) > 40)
        if len(rf) > 10 and len(rc) > 10:
            assert np.linalg.norm(rf.mean(0) - rc.mean(0)) < 6.0
    # The two candidate poses must produce visibly different renders.
    assert np.abs(imgs_crop[0].astype(int) - imgs_crop[1].astype(int)).max() > 50

    # ---- fg_crop clipping guard (VERDICT r2 #7): a candidate pulled toward
    # the camera projects larger than the window; crop_required must detect
    # it and the bumped window must match the full-frame render.
    cam_pos = np.asarray(cams[0][:3, 3])
    near_pose = T_WO_1.copy()
    # 0.82 toward the camera (was 0.78): free-space carving tightened the
    # trained fg field enough that the old pose's projection only barely
    # overflowed the window and the "old window demonstrably clips" check
    # below stopped having margin.
    near_pose[:3, 3] = 0.82 * cam_pos + 0.18 * T_WO_1[:3, 3]
    poses3 = np.stack([T_WO_1, poses[1], near_pose])

    need = cropped.crop_required(T_WO_1, cams[:1].astype(np.float32), poses3)
    assert need > cropped.fg_crop, (need, cropped.fg_crop)
    # The in-crop poses alone must NOT trigger the guard.
    assert cropped.crop_required(
        T_WO_1, cams[:1].astype(np.float32), poses
    ) <= 40

    # Reference render: the crop machinery with a window covering the WHOLE
    # frame (fg_crop == res) — same tight-march semantics, zero possible
    # clipping. (The full-frame path is not a fair oracle here: at the
    # near-camera virtual pose it marches through never-trained regions of
    # the fg field and renders fog the tight march correctly skips.)
    uncropped = CombinedRenderer(
        fg_params, cfg, fg_params, cfg, obj_aabb=obj_aabb, fg_crop=res,
        crop_settings=settings, **common,
    )
    imgs_ref = uncropped.render(poses3, **args)
    imgs_small = cropped.render(poses3, **args)  # un-bumped: clips
    cropped.bump_crop(need)
    assert cropped.fg_crop == need and cropped._render_chunk is None
    imgs_big = cropped.render(poses3, **args)

    def red_px(img):
        return (img[:, :, 0].astype(int) - img[:, :, 1]) > 40

    # The bumped window recovers (nearly) all of the uncropped render's
    # object pixels; the old window demonstrably lost some (the guard caught
    # a real clip, not a no-op).
    n_ref = red_px(imgs_ref[2]).sum()
    n_small = red_px(imgs_small[2]).sum()
    n_big = red_px(imgs_big[2]).sum()
    assert n_ref > 50, n_ref
    assert n_small < 0.9 * n_ref, (n_small, n_ref)
    assert n_big > 0.95 * n_ref, (n_big, n_ref)
    diff3 = np.abs(imgs_ref[2].astype(int) - imgs_big[2].astype(int))
    assert np.mean(diff3) < 3.0, np.mean(diff3)
