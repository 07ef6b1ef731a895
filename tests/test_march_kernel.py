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
