"""Fused pallas march kernel vs render_rays (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dream2real_tpu.nerf.march_kernel import march_rays_fused, supports
from dream2real_tpu.nerf.model import NGPConfig, init_ngp_params
from dream2real_tpu.nerf.render import RenderSettings, render_rays

CFG = NGPConfig(aabb_min=(0.0, -0.6, -0.5), aabb_max=(1.1, 0.6, 0.9))
SETTINGS = RenderSettings(n_coarse=32, n_fine=0, near=0.05, far=2.0)


def _rays(R, origin, lo, hi, seed=1):
    targets = jax.random.uniform(
        jax.random.PRNGKey(seed), (R, 3), minval=jnp.asarray(lo), maxval=jnp.asarray(hi)
    )
    d = targets - origin
    return d / d[:, 2:3]  # z-normalized


def test_supports_gate():
    assert supports(CFG, SETTINGS)
    assert not supports(CFG._replace(field_type="hashgrid"), SETTINGS)
    assert not supports(CFG, SETTINGS._replace(n_fine=32))
    assert not supports(CFG._replace(mlp_width=128), SETTINGS)


def test_march_kernel_matches_render_rays():
    params = init_ngp_params(jax.random.PRNGKey(0), CFG)
    R = 256
    origin = jnp.asarray([0.5, 0.0, -0.4])
    lo, hi = [0.3, -0.2, 0.0], [0.7, 0.2, 0.3]
    d = _rays(R, origin, lo, hi)
    march = (jnp.asarray(lo), jnp.asarray(hi))
    ref = render_rays(
        params, CFG, jnp.broadcast_to(origin, (R, 3)), d, SETTINGS, march_aabb=march
    )
    out = march_rays_fused(params, CFG, origin, d, march, SETTINGS, block_rays=128)
    np.testing.assert_allclose(
        np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["alpha"]), np.asarray(ref["alpha"]), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["depth"]), np.asarray(ref["depth"]), atol=5e-3
    )


def test_march_kernel_non_multiple_ray_count():
    """Ray counts that don't divide the block size pad internally; outputs
    must equal the unpadded reference exactly (crop 168 product-path case)."""
    params = init_ngp_params(jax.random.PRNGKey(0), CFG)
    R = 300
    origin = jnp.asarray([0.5, 0.0, -0.4])
    lo, hi = [0.3, -0.2, 0.0], [0.7, 0.2, 0.3]
    d = _rays(R, origin, lo, hi, seed=7)
    march = (jnp.asarray(lo), jnp.asarray(hi))
    ref = render_rays(
        params, CFG, jnp.broadcast_to(origin, (R, 3)), d, SETTINGS, march_aabb=march
    )
    out = march_rays_fused(params, CFG, origin, d, march, SETTINGS, block_rays=128)
    assert out["rgb"].shape == (R, 3)
    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["alpha"]), np.asarray(ref["alpha"]), atol=5e-3)


def test_march_kernel_miss_rays_zero():
    """Rays that miss the march box must return exact zeros (valid mask)."""
    params = init_ngp_params(jax.random.PRNGKey(0), CFG)
    origin = jnp.asarray([0.5, 0.0, -0.4])
    # Point far away from the box: all rays miss.
    d = _rays(128, origin, [5.0, 5.0, 1.0], [6.0, 6.0, 2.0])
    march = (jnp.asarray([0.3, -0.2, 0.0]), jnp.asarray([0.7, 0.2, 0.3]))
    out = march_rays_fused(params, CFG, origin, d, march, SETTINGS, block_rays=128)
    assert float(jnp.abs(out["rgb"]).max()) == 0.0
    assert float(jnp.abs(out["alpha"]).max()) == 0.0

def test_march_kernel_density_masked_outside_field_aabb():
    """March box poking outside the field aabb: density there must be 0,
    matching density_fn's in_aabb masking."""
    params = init_ngp_params(jax.random.PRNGKey(0), CFG)
    origin = jnp.asarray([0.5, 0.0, -0.4])
    lo, hi = [0.3, -0.2, 0.0], [0.7, 0.2, 1.2]  # z beyond field aabb (0.9)
    d = _rays(256, origin, lo, hi)
    march = (jnp.asarray(lo), jnp.asarray(hi))
    ref = render_rays(
        params, CFG, jnp.broadcast_to(origin, (256, 3)), d, SETTINGS, march_aabb=march
    )
    out = march_rays_fused(params, CFG, origin, d, march, SETTINGS, block_rays=128)
    np.testing.assert_allclose(
        np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["depth"]), np.asarray(ref["depth"]), atol=5e-3
    )

def test_march_kernel_early_exit_bitexact():
    """Early-transmittance exit (D2R_MARCH_EARLY) must be BIT-EXACT vs the
    fixed-count loop: skipped samples all have zero composite weight. Mixed
    block of hit + miss rays so the live-lane mask is exercised (miss rays
    never decay transmittance and must not hold the loop open), and a high
    min_transmittance so the exit actually fires mid-loop."""
    params = init_ngp_params(jax.random.PRNGKey(0), CFG)
    origin = jnp.asarray([0.5, 0.0, -0.4])
    lo, hi = [0.3, -0.2, 0.0], [0.7, 0.2, 0.3]
    d_hit = _rays(96, origin, lo, hi)
    d_miss = _rays(32, origin, [5.0, 5.0, 1.0], [6.0, 6.0, 2.0])
    d = jnp.concatenate([d_hit, d_miss])
    march = (jnp.asarray(lo), jnp.asarray(hi))
    st = SETTINGS._replace(min_transmittance=0.9)
    base = march_rays_fused(
        params, CFG, origin, d, march, st, block_rays=128, early_exit=False
    )
    fast = march_rays_fused(
        params, CFG, origin, d, march, st, block_rays=128, early_exit=True
    )
    for k in ("rgb", "alpha", "depth"):
        np.testing.assert_array_equal(np.asarray(base[k]), np.asarray(fast[k]))
    # Default settings too (exit may or may not fire; equality must hold).
    base = march_rays_fused(
        params, CFG, origin, d, march, SETTINGS, block_rays=128, early_exit=False
    )
    fast = march_rays_fused(
        params, CFG, origin, d, march, SETTINGS, block_rays=128, early_exit=True
    )
    for k in ("rgb", "alpha", "depth"):
        np.testing.assert_array_equal(np.asarray(base[k]), np.asarray(fast[k]))


def test_crop_render_early_exit_bitexact(monkeypatch):
    """`render_pose_cropped` runs the march kernel with the round-5 default
    early-transmittance exit; the render must equal the fixed-count loop's
    BIT-EXACTLY. (The tile-major ray reorder this test used to cover was
    measured losing and deleted in round 5 — bench_march_tiles.json.)"""
    from dream2real_tpu.nerf.combined import (
        BackgroundView, background_only_image, render_pose_cropped,
    )

    params = init_ngp_params(jax.random.PRNGKey(2), CFG)
    res, crop = 64, 32
    f = 0.9 * res
    K = jnp.asarray(
        np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]]))
    from dream2real_tpu.ops import cameras

    dirs_cam = cameras.pixel_dirs(res, res, K)
    settings = SETTINGS._replace(n_coarse=8)
    # Small object box: its projection covers a fraction of the crop window
    # so some 16x16 tiles are all-miss (the skip path actually executes).
    obj_aabb = ((0.45, -0.06, 0.02), (0.58, 0.06, 0.12))
    T_WC_1 = jnp.asarray(np.array(
        [[1, 0, 0, 0.5], [0, -1, 0, 0.0], [0, 0, -1, 0.7], [0, 0, 0, 1]],
        np.float32))
    T_WO_1 = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.5, 0.0, 0.06]))
    T_WO_2 = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.52, 0.015, 0.06]))
    rng = np.random.default_rng(0)
    bg = BackgroundView(
        rgb=jnp.asarray(rng.uniform(size=(res, res, 3)).astype(np.float32)),
        alpha=jnp.ones((res, res)),
        depth=jnp.full((res, res), 0.8),
    )
    bg_only = background_only_image(bg)

    outs = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("D2R_MARCH_EARLY", mode)
        outs[mode] = np.asarray(render_pose_cropped(
            params, CFG, settings, dirs_cam, K, obj_aabb, crop,
            T_WO_1, T_WC_1, bg, bg_only, T_WO_2))
    assert outs["1"].shape == (res, res, 3)
    np.testing.assert_array_equal(outs["1"], outs["0"])
    # The render must contain actual foreground (non-background pixels).
    assert (outs["1"] != np.asarray(bg_only)).any()
