"""Fused training kernels vs render_rays + XLA autodiff (interpret on CPU).

Covers the gradient contract documented in nerf/train_kernel.py: exact
parity wrt field params, dominant-term parity wrt origins/dirs, zero
outputs/grads for rays that miss the aabb, and padding for ray counts
that don't divide the block size.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dream2real_tpu.nerf.model import NGPConfig, init_ngp_params
from dream2real_tpu.nerf.render import RenderSettings, render_rays
from dream2real_tpu.nerf.train_kernel import (
    density_weights_fused,
    render_rays_train,
    render_train_fused,
    supports_training,
)

CFG = NGPConfig(aabb_min=(0.0, -0.6, -0.5), aabb_max=(1.1, 0.6, 0.9))
SETTINGS = RenderSettings(n_coarse=8, n_fine=8, near=0.05, far=2.0)


def _train_rays(R, seed=1):
    """Rays from several 'cameras' toward the aabb interior (per-ray o)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    origins = jax.random.uniform(
        k1, (R, 3),
        minval=jnp.asarray([0.2, -0.3, -1.2]),
        maxval=jnp.asarray([0.9, 0.3, -0.8]),
    )
    targets = jax.random.uniform(
        k2, (R, 3),
        minval=jnp.asarray([0.2, -0.4, -0.2]),
        maxval=jnp.asarray([0.9, 0.4, 0.6]),
    )
    d = targets - origins
    return origins, d / d[:, 2:3]  # z-normalized


def _ref_render_with_ts(params, o, d, ts):
    """XLA reference at EXPLICIT sample positions (same math as
    render.render_rays' main pass, minus the resampler)."""
    from dream2real_tpu.nerf.model import field_fn
    from dream2real_tpu.nerf.render import _composite

    d_norm = jnp.linalg.norm(d, axis=-1)
    unit = d / d_norm[:, None]
    pos = o[:, None, :] + d[:, None, :] * ts[..., None]
    sh_dirs = jnp.broadcast_to(unit[:, None, :], pos.shape)
    sigma, rgb = field_fn(params, pos, sh_dirs, CFG)
    comp_rgb, acc, depth, _ = _composite(
        sigma, rgb, ts, d_norm, SETTINGS.min_transmittance
    )
    return {"rgb": comp_rgb, "alpha": acc, "depth": depth}


def _fixed_ts(R, seed=21, S=16):
    """Sorted, slightly irregular per-ray sample positions."""
    u = jax.random.uniform(jax.random.PRNGKey(seed), (R, S))
    return 0.3 + 1.3 * jnp.sort(u, axis=-1)


def test_forward_matches_reference_same_ts():
    params = init_ngp_params(jax.random.PRNGKey(0), CFG)
    R = 256
    o, d = _train_rays(R)
    ts = _fixed_ts(R)
    ref = _ref_render_with_ts(params, o, d, ts)
    out = render_train_fused(params, CFG, o, d, ts, 1e-4, 128, None)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(ref["rgb"]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               np.asarray(ref["alpha"]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), atol=5e-3)


def test_forward_full_wrapper_close():
    """Hierarchical wrapper vs render_rays: ts grids can differ by bf16
    noise in the resampler, so compare loosely (integration smoke)."""
    params = init_ngp_params(jax.random.PRNGKey(0), CFG)
    R = 256
    o, d = _train_rays(R)
    ref = render_rays(params, CFG, o, d, SETTINGS, key=None)
    out = render_rays_train(params, CFG, o, d, SETTINGS, key=None,
                            block_rays=128)
    assert float(jnp.abs(out["rgb"] - ref["rgb"]).mean()) < 2e-2
    assert float(jnp.abs(out["alpha"] - ref["alpha"]).mean()) < 2e-2


def test_density_weights_match_composite():
    from dream2real_tpu.nerf.model import density_fn
    from dream2real_tpu.nerf.render import _composite, ray_aabb

    params = init_ngp_params(jax.random.PRNGKey(0), CFG)
    R = 200  # also exercises ray padding (200 % 128 != 0)
    o, d = _train_rays(R, seed=3)
    t0, t1 = ray_aabb(o, d, CFG.aabb_min, CFG.aabb_max)
    t0 = jnp.maximum(t0, SETTINGS.near)
    t1 = jnp.where(t1 > t0, jnp.minimum(t1, SETTINGS.far), t0 + 1e-3)
    nc = 8
    ts = t0[:, None] + (t1 - t0)[:, None] * (jnp.arange(nc) + 0.5) / nc
    pos = o[:, None, :] + d[:, None, :] * ts[..., None]
    sigma, _ = density_fn(params, pos, CFG)
    d_norm = jnp.linalg.norm(d, axis=-1)
    _, _, _, w_ref = _composite(
        sigma, jnp.zeros(sigma.shape + (3,)), ts, d_norm,
        SETTINGS.min_transmittance,
    )
    w = density_weights_fused(params, CFG, o, d, ts,
                              SETTINGS.min_transmittance, block_rays=128)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=5e-3)


def _probes(R, seed=9, depth_scale=0.1):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (
        jax.random.normal(ks[0], (R, 3)),
        jax.random.normal(ks[1], (R,)),
        jax.random.normal(ks[2], (R,)) * depth_scale,
    )


def _loss_via(out, probes):
    p_rgb, p_a, p_d = probes
    return (
        jnp.sum(out["rgb"] * p_rgb)
        + jnp.sum(out["alpha"] * p_a)
        + jnp.sum(out["depth"] * p_d)
    )


def test_param_grads_match_autodiff():
    params = init_ngp_params(jax.random.PRNGKey(0), CFG)
    R = 256
    o, d = _train_rays(R, seed=5)
    ts = _fixed_ts(R, seed=23)
    probes = _probes(R)

    g_ref = jax.grad(
        lambda p: _loss_via(_ref_render_with_ts(p, o, d, ts), probes)
    )(params)
    g_fus = jax.grad(
        lambda p: _loss_via(
            render_train_fused(p, CFG, o, d, ts, 1e-4, 128, None), probes
        )
    )(params)
    for name in g_ref:
        a = np.asarray(g_ref[name]).ravel()
        b = np.asarray(g_fus[name]).ravel()
        scale = max(np.abs(a).max(), 1e-6)
        # bf16 matmuls round differently in the two backward paths (XLA
        # autodiff vs recompute kernel): entries agree to ~bf16 noise and
        # the direction is essentially exact (measured cos >= 0.998).
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos > 0.995, (name, cos)
        np.testing.assert_allclose(
            b, a, atol=8e-2 * scale, rtol=0.0,
            err_msg=f"param grad mismatch: {name}",
        )


def test_no_ray_grads_param_grads_identical():
    """need_ray_grads=False (extrinsics frozen) must leave parameter
    gradients bit-identical to the full backward and return exact-zero
    origin/dir cotangents — the flag only removes ray-grad-only work."""
    params = init_ngp_params(jax.random.PRNGKey(0), CFG)
    R = 256
    o, d = _train_rays(R, seed=5)
    ts = _fixed_ts(R, seed=23)
    probes = _probes(R)

    def grads(need):
        return jax.grad(
            lambda p, oo, dd: _loss_via(
                render_train_fused(p, CFG, oo, dd, ts, 1e-4, 128, None, need),
                probes,
            ),
            argnums=(0, 1, 2),
        )(params, o, d)

    g_full, go_full, _ = grads(True)
    g_slim, go_slim, gd_slim = grads(False)
    for name in g_full:
        np.testing.assert_array_equal(
            np.asarray(g_full[name]), np.asarray(g_slim[name]), err_msg=name
        )
    assert float(jnp.abs(go_full).max()) > 0.0  # full path is non-trivial
    assert float(jnp.abs(go_slim).max()) == 0.0
    assert float(jnp.abs(gd_slim).max()) == 0.0


def test_ray_grads_dominant_term():
    """d origins / d dirs carry the geometric path only (the |d| and SH
    paths are dropped); require strong directional + magnitude agreement
    with full autodiff at identical ts."""
    params = init_ngp_params(jax.random.PRNGKey(0), CFG)
    R = 256
    o, d = _train_rays(R, seed=7)
    ts = _fixed_ts(R, seed=29)
    probes = _probes(R, seed=11, depth_scale=0.0)

    go_ref, gd_ref = jax.grad(
        lambda oo, dd: _loss_via(_ref_render_with_ts(params, oo, dd, ts),
                                 probes),
        argnums=(0, 1),
    )(o, d)
    go_fus, gd_fus = jax.grad(
        lambda oo, dd: _loss_via(
            render_train_fused(params, CFG, oo, dd, ts, 1e-4, 128, None),
            probes,
        ),
        argnums=(0, 1),
    )(o, d)
    for a, b, nm in ((go_ref, go_fus, "origins"), (gd_ref, gd_fus, "dirs")):
        a = np.asarray(a).ravel()
        b = np.asarray(b).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        ratio = float(np.linalg.norm(b) / (np.linalg.norm(a) + 1e-12))
        assert cos > 0.95, (nm, cos)
        assert 0.7 < ratio < 1.3, (nm, ratio)


def test_miss_rays_zero_output_and_grad():
    params = init_ngp_params(jax.random.PRNGKey(0), CFG)
    R = 128
    o = jnp.broadcast_to(jnp.asarray([0.5, 0.0, 5.0]), (R, 3))  # above box
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (R, 3))  # away from it
    out = render_rays_train(params, CFG, o, d, SETTINGS, key=None,
                            block_rays=128)
    assert float(jnp.abs(out["rgb"]).max()) == 0.0
    assert float(jnp.abs(out["alpha"]).max()) == 0.0

    g = jax.grad(
        lambda p: jnp.sum(render_rays_train(p, CFG, o, d, SETTINGS, key=None,
                                            block_rays=128)["rgb"])
    )(params)
    for name, v in g.items():
        assert float(jnp.abs(v).max()) == 0.0, name


def test_nonmultiple_ray_count_padding():
    params = init_ngp_params(jax.random.PRNGKey(0), CFG)
    R = 300
    o, d = _train_rays(R, seed=13)
    ts = jnp.broadcast_to(jnp.linspace(0.3, 1.6, 12), (R, 12))
    full = render_train_fused(params, CFG, o, d, ts, 1e-4, 128, None)
    solo = render_train_fused(params, CFG, o[:128], d[:128], ts[:128],
                              1e-4, 128, None)
    np.testing.assert_allclose(np.asarray(full["rgb"][:128]),
                               np.asarray(solo["rgb"]), atol=1e-5)


def test_supports_training_gate():
    assert supports_training(CFG)
    assert not supports_training(CFG._replace(field_type="hashgrid"))
    assert not supports_training(CFG._replace(mlp_width=128))


def test_fused_sampler_distribution():
    """density_sample_fused draws sorted positions whose empirical mass per
    coarse bin matches the defensive-mixture CDF built from the same field."""
    from dream2real_tpu.nerf.render import _composite, ray_aabb
    from dream2real_tpu.nerf.model import density_fn
    from dream2real_tpu.nerf.train_kernel import density_sample_fused

    params = init_ngp_params(jax.random.PRNGKey(0), CFG)
    R, S_c, n_draw = 256, 8, 64
    o, d = _train_rays(R, seed=31)
    t0, t1 = ray_aabb(o, d, CFG.aabb_min, CFG.aabb_max)
    t0 = jnp.maximum(t0, SETTINGS.near)
    t1 = jnp.where(t1 > t0, jnp.minimum(t1, SETTINGS.far), t0 + 1e-3)
    ts_c = t0[:, None] + (t1 - t0)[:, None] * (jnp.arange(S_c) + 0.5) / S_c
    exp_draws = -jnp.log(
        jax.random.uniform(jax.random.PRNGKey(7), (R, n_draw + 1),
                           minval=1e-12, maxval=1.0)
    )
    ts_f = np.asarray(
        density_sample_fused(params, CFG, o, d, ts_c, exp_draws,
                             n_fine=n_draw, min_transmittance=1e-4,
                             block_rays=128)
    )
    assert ts_f.shape == (R, n_draw)
    # Sorted by construction, inside the coarse range.
    assert np.all(np.diff(ts_f, axis=1) >= -1e-6)
    assert np.all(ts_f >= np.asarray(ts_c)[:, :1] - 1e-5)
    assert np.all(ts_f <= np.asarray(ts_c)[:, -1:] + 1e-5)

    # Reference mixture CDF from the same coarse weights (XLA path).
    pos = o[:, None, :] + d[:, None, :] * ts_c[..., None]
    sigma, _ = density_fn(params, pos, CFG)
    d_norm = jnp.linalg.norm(d, axis=-1)
    _, _, _, w = _composite(sigma, jnp.zeros(sigma.shape + (3,)), ts_c,
                            d_norm, 1e-4)
    mix = 0.25
    w_def = np.asarray(w) + (mix / (1 - mix)) * np.asarray(w).mean(
        axis=1, keepdims=True
    ) + 1e-8
    p_ref = w_def / w_def.sum(axis=1, keepdims=True)
    mids = 0.5 * (np.asarray(ts_c)[:, 1:] + np.asarray(ts_c)[:, :-1])
    edges = np.concatenate(
        [np.asarray(ts_c)[:, :1], mids, np.asarray(ts_c)[:, -1:]], axis=1
    )
    # Aggregate over all rays: empirical bin mass vs expected (n_draw * R
    # samples -> tight CLT bounds at the 0.03 level).
    emp = np.zeros(S_c)
    exp_mass = p_ref.mean(axis=0)
    for r in range(R):
        idx = np.clip(np.searchsorted(edges[r], ts_f[r]) - 1, 0, S_c - 1)
        emp += np.bincount(idx, minlength=S_c)
    emp /= emp.sum()
    np.testing.assert_allclose(emp, exp_mass, atol=0.03)
