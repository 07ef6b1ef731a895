"""Sharded fused imagine-and-score: single-device vs 8-device-mesh equality.

The multi-chip program (parallel/imagine.py shard_map over the pose axis)
must be numerically identical to the single-chip fused program — the only
collective is the final all-gather of scores, which cannot change values.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dream2real_tpu.clip.model import CLIPConfig, init_clip_params
from dream2real_tpu.nerf.combined import BackgroundView
from dream2real_tpu.nerf.model import NGPConfig, init_ngp_params
from dream2real_tpu.nerf.render import RenderSettings
from dream2real_tpu.ops import cameras
from dream2real_tpu.parallel.imagine import make_imagine_and_score
from dream2real_tpu.parallel.mesh import data_mesh


def _tiny_stack(res=32):
    key = jax.random.PRNGKey(0)
    ngp_cfg = NGPConfig(
        mlp_width=32, mlp_depth=3, skip_layer=2, posenc_deg=4, geo_feat_dim=7,
        aabb_min=(0.0, -0.6, -0.1), aabb_max=(1.1, 0.6, 0.9),
    )
    fg_params = init_ngp_params(key, ngp_cfg)
    clip_cfg = CLIPConfig(
        image_size=res, patch_size=8, vision_width=32, vision_layers=2,
        vision_heads=4, text_width=32, text_layers=2, text_heads=4,
        projection_dim=16,
    )
    clip_params = init_clip_params(key, clip_cfg)
    settings = RenderSettings(n_coarse=8, n_fine=8, near=0.05, far=2.0)
    f = 0.9 * res
    K = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]])
    dirs_cam = cameras.pixel_dirs(res, res, jnp.asarray(K))
    bg = BackgroundView(
        rgb=jnp.zeros((res, res, 3)),
        alpha=jnp.ones((res, res)),
        depth=jnp.full((res, res), 1.0),
    )
    T_WC = jnp.asarray(
        np.array(
            [[1, 0, 0, 0.5], [0, -1, 0, 0.0], [0, 0, -1, 0.6], [0, 0, 0, 1]],
            np.float32,
        )
    )
    T_WO = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.5, 0.0, 0.05]))
    txt = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, clip_cfg.projection_dim)),
        jnp.float32,
    )
    return ngp_cfg, clip_cfg, fg_params, clip_params, settings, dirs_cam, bg, T_WC, T_WO, txt


def _poses(k):
    p = np.tile(np.eye(4, dtype=np.float32)[None], (k, 1, 1))
    p[:, 0, 3] = np.linspace(0.4, 0.6, k)
    p[:, 2, 3] = 0.05
    return jnp.asarray(p)


def test_sharded_matches_single_device():
    (ngp_cfg, clip_cfg, fg_params, clip_params, settings, dirs_cam, bg,
     T_WC, T_WO, txt) = _tiny_stack()
    kwargs = dict(n_norm_captions=1, use_templates=False, clip_batch=2)

    single = make_imagine_and_score(
        ngp_cfg, clip_cfg, settings, dirs_cam, **kwargs
    )
    mesh = data_mesh(8)
    sharded = make_imagine_and_score(
        ngp_cfg, clip_cfg, settings, dirs_cam, mesh=mesh, **kwargs
    )

    poses = _poses(16)  # 2 per device
    s1 = np.asarray(single(fg_params, clip_params, T_WO, T_WC, bg, txt, poses))
    s8 = np.asarray(sharded(fg_params, clip_params, T_WO, T_WC, bg, txt, poses))
    assert s1.shape == s8.shape == (16,)
    assert np.isfinite(s1).all()
    np.testing.assert_allclose(s8, s1, rtol=1e-5, atol=1e-5)
    assert np.std(s1) > 0  # not a constant function of pose


def test_return_renders_same_scores():
    (ngp_cfg, clip_cfg, fg_params, clip_params, settings, dirs_cam, bg,
     T_WC, T_WO, txt) = _tiny_stack()
    kwargs = dict(n_norm_captions=1, use_templates=False, clip_batch=2)
    plain = make_imagine_and_score(ngp_cfg, clip_cfg, settings, dirs_cam, **kwargs)
    with_renders = make_imagine_and_score(
        ngp_cfg, clip_cfg, settings, dirs_cam, return_renders=True, **kwargs
    )
    poses = _poses(4)
    s = np.asarray(plain(fg_params, clip_params, T_WO, T_WC, bg, txt, poses))
    s2, renders = with_renders(fg_params, clip_params, T_WO, T_WC, bg, txt, poses)
    np.testing.assert_allclose(np.asarray(s2), s, rtol=1e-6, atol=1e-6)
    renders = np.asarray(renders)
    assert renders.shape == (4, 32, 32, 3)
    assert renders.dtype == np.uint8


def test_sharded_train_chunk_matches_single():
    """dp-sharded training step (ray batch over the mesh) vs single device:
    same key -> same sampled batch -> same loss and same updated params (to
    f32 cross-device reduction-order tolerance)."""
    from dream2real_tpu.nerf.trainer import (
        TrainConfig, init_train_state, make_train_chunk,
    )
    from dream2real_tpu.parallel.mesh import pose_sharding

    ngp_cfg = NGPConfig(
        mlp_width=32, mlp_depth=3, skip_layer=2, posenc_deg=4, geo_feat_dim=7,
        aabb_min=(0.0, -0.6, -0.1), aabb_max=(1.1, 0.6, 0.9),
    )
    tc = TrainConfig(
        n_steps=2, batch_rays=64, poll_steps=2,
        optimize_extrinsics=False, dynamic_time_extension=False,
    )
    settings = RenderSettings(n_coarse=4, n_fine=4, near=0.05, far=2.0)
    h = w = 16
    f = 0.9 * w
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    dirs_cam = cameras.pixel_dirs(h, w, jnp.asarray(K))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (4, h, w, 4), dtype=np.uint8))
    poses_cam = jnp.tile(jnp.eye(4)[None], (4, 1, 1))
    depths = jnp.ones((4, h, w)) * 0.5

    mesh = data_mesh(8)
    common = dict(depths=depths)
    chunk_single = make_train_chunk(
        ngp_cfg, tc, settings, images, poses_cam, dirs_cam, **common)
    chunk_sharded = make_train_chunk(
        ngp_cfg, tc, settings, images, poses_cam, dirs_cam,
        ray_sharding=pose_sharding(mesh), **common)

    s0 = init_train_state(ngp_cfg, tc, n_images=4)
    s1, loss1 = chunk_single(s0)
    s2, loss2 = chunk_sharded(s0)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    p1 = np.asarray(s1["params"]["field"]["trunk_w0"])
    p2 = np.asarray(s2["params"]["field"]["trunk_w0"])
    np.testing.assert_allclose(p1, p2, atol=2e-5, rtol=1e-4)


def test_shard_map_pallas_train_chunk(monkeypatch):
    """Fused-kernel training under ray sharding lowers to shard_map (GSPMD
    cannot partition a pallas custom_call): one step on the 8-dev CPU mesh in
    interpret mode must run, produce a finite loss, and update the field."""
    import pytest

    pytest.importorskip("jax.experimental.pallas")
    monkeypatch.setenv("D2R_PALLAS_TRAIN", "1")
    from dream2real_tpu.nerf.trainer import (
        TrainConfig, init_train_state, make_train_chunk,
    )
    from dream2real_tpu.parallel.mesh import pose_sharding

    ngp_cfg = NGPConfig(aabb_min=(0.0, -0.6, -0.1), aabb_max=(1.1, 0.6, 0.9))
    tc = TrainConfig(
        n_steps=1, batch_rays=64, poll_steps=1,
        optimize_extrinsics=False, dynamic_time_extension=False,
    )
    settings = RenderSettings(n_coarse=8, n_fine=8, near=0.05, far=2.0)
    h = w = 16
    f = 0.9 * w
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    dirs_cam = cameras.pixel_dirs(h, w, jnp.asarray(K))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (2, h, w, 4), dtype=np.uint8))
    poses_cam = jnp.tile(jnp.eye(4)[None], (2, 1, 1))

    mesh = data_mesh(8)
    chunk = make_train_chunk(
        ngp_cfg, tc, settings, images, poses_cam, dirs_cam,
        ray_sharding=pose_sharding(mesh),
    )
    s0 = init_train_state(ngp_cfg, tc, n_images=2)
    s1, loss = chunk(s0)
    assert np.isfinite(float(loss))
    w0_before = np.asarray(s0["params"]["field"]["trunk_w0"])
    w0_after = np.asarray(s1["params"]["field"]["trunk_w0"])
    assert not np.allclose(w0_before, w0_after)
