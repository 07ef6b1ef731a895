"""Unit tests for NeRF building blocks: hash grid, SH, marcher, compositor."""

import jax
import jax.numpy as jnp
import numpy as np

from dream2real_tpu.nerf.hashgrid import HashGridConfig, hash_encode, init_hash_table
from dream2real_tpu.nerf.model import (
    NGPConfig,
    density_fn,
    init_ngp_params,
    sh_encode_deg4,
    trunc_exp,
)
from dream2real_tpu.nerf.render import (
    RenderSettings,
    _composite,
    ray_aabb,
    render_rays,
    sample_pdf,
)
from dream2real_tpu.nerf.snapshot import load_snapshot, save_snapshot

TINY_GRID = HashGridConfig(
    n_levels=4, n_features=2, log2_hashmap_size=12, base_resolution=4, max_resolution=32
)


def test_hash_encode_shape_and_grad(rng):
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, TINY_GRID)
    pos = jnp.asarray(rng.uniform(size=(33, 3)).astype(np.float32))
    out = hash_encode(pos, table, TINY_GRID)
    assert out.shape == (33, TINY_GRID.out_dim)

    def f(tbl):
        return hash_encode(pos, tbl, TINY_GRID).sum()

    g = jax.grad(f)(table)
    assert g.shape == table.shape
    # Gradient mass: each sample contributes trilinear weights summing to 1
    # per level -> total grad sum == n_samples * n_levels * n_features? No:
    # d(sum)/d(table) sums weights per feature, so total = N * 8corners'
    # weights (sum 1) per level per feature.
    total = float(jnp.sum(g))
    assert abs(total - 33 * TINY_GRID.n_levels * TINY_GRID.n_features) < 1e-2


def test_hash_encode_trilinear_consistency():
    """At exact grid corners the encoding must equal the corner feature."""
    cfg = HashGridConfig(n_levels=1, n_features=2, log2_hashmap_size=10,
                         base_resolution=4, max_resolution=4)
    table = init_hash_table(jax.random.PRNGKey(1), cfg)
    # Position exactly at grid corner (2, 1, 3) of a 4-res grid => x = corner/4.
    pos = jnp.array([[2 / 4, 1 / 4, 3 / 4]])
    out = hash_encode(pos, table, cfg)
    # Dense indexing (res+1=5 <= 1024): idx = x + 5y + 25z.
    idx = 2 + 5 * 1 + 25 * 3
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(table[0, idx]), atol=1e-6)


def test_hash_encode_continuity():
    """Encoding is continuous across cell boundaries."""
    table = init_hash_table(jax.random.PRNGKey(2), TINY_GRID)
    eps = 1e-5
    p = jnp.array([[0.5 - eps, 0.3, 0.7], [0.5 + eps, 0.3, 0.7]])
    out = hash_encode(p, table, TINY_GRID)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]), atol=1e-3)


def test_sh_encode_deg4_properties(rng):
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    sh = np.asarray(sh_encode_deg4(jnp.asarray(d)))
    assert sh.shape == (256, 16)
    # Band 0 is constant.
    np.testing.assert_allclose(sh[:, 0], 0.28209479, atol=1e-6)
    # Orthonormality under uniform sphere sampling: E[Y_i Y_j] ~ delta_ij/(4pi).
    M = (sh.T @ sh) / len(sh)
    diag = np.diag(M)
    np.testing.assert_allclose(diag, 1.0 / (4 * np.pi), rtol=0.25)
    off = M - np.diag(diag)
    assert np.abs(off).max() < 0.02


def test_trunc_exp():
    x = jnp.array([-20.0, 0.0, 20.0])
    y = trunc_exp(x)
    assert np.isfinite(np.asarray(y)).all()
    g = jax.grad(lambda v: trunc_exp(v).sum())(x)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g[1]), 1.0, atol=1e-6)


def test_ray_aabb():
    o = jnp.array([[-2.0, 0.5, 0.5], [0.5, 0.5, 0.5], [-2.0, 5.0, 0.5]])
    d = jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    t0, t1 = ray_aabb(o, d, (0, 0, 0), (1, 1, 1))
    assert abs(float(t0[0]) - 2.0) < 1e-5 and abs(float(t1[0]) - 3.0) < 1e-5
    assert abs(float(t0[1]) + 0.5) < 1e-5 and abs(float(t1[1]) - 0.5) < 1e-5
    assert float(t1[2]) < float(t0[2])  # miss


def test_sample_pdf_concentrates():
    ts = jnp.linspace(0.0, 1.0, 16)[None].repeat(4, axis=0)
    w = jnp.zeros((4, 16)).at[:, 8].set(1.0)
    new = np.asarray(sample_pdf(ts, w, 32))
    # Nearly all new samples near ts[8] ~ 0.533.
    frac_near = (np.abs(new - 8 / 15) < 0.1).mean()
    assert frac_near > 0.9


def test_composite_opaque_surface():
    """A single very dense sample behaves like an opaque surface at its depth."""
    S = 16
    ts = jnp.linspace(0.1, 2.0, S)[None]
    sigma = jnp.zeros((1, S)).at[0, 7].set(1e4)
    rgb = jnp.zeros((1, S, 3)).at[0, 7].set(jnp.array([0.2, 0.5, 0.8]))
    d_norm = jnp.ones((1,))
    comp, acc, depth, w = _composite(sigma, rgb, ts, d_norm, 1e-4)
    np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(comp[0]), [0.2, 0.5, 0.8], atol=1e-3)
    np.testing.assert_allclose(float(depth[0]), float(ts[0, 7]), atol=1e-3)


def test_composite_empty_space():
    S = 8
    ts = jnp.linspace(0.1, 2.0, S)[None]
    comp, acc, depth, w = _composite(
        jnp.zeros((1, S)), jnp.zeros((1, S, 3)), ts, jnp.ones((1,)), 1e-4
    )
    assert float(acc[0]) < 1e-6
    assert float(depth[0]) < 1e-6


def test_render_rays_runs_and_snapshot_roundtrip(tmp_path):
    cfg = NGPConfig(field_type="hashgrid", grid=TINY_GRID, hidden_dim=16,
                    geo_feat_dim=7,
                    aabb_min=(0.0, 0.0, 0.0), aabb_max=(1.0, 1.0, 1.0))
    params = init_ngp_params(jax.random.PRNGKey(0), cfg)
    o = jnp.array([[-0.5, 0.5, 0.5]] * 4)
    d = jnp.array([[1.0, 0.01, 0.01]] * 4)
    out = render_rays(params, cfg, o, d, RenderSettings(n_coarse=8, n_fine=8, far=3.0))
    assert out["rgb"].shape == (4, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()

    p = str(tmp_path / "fg_base.ingp")
    save_snapshot(p, params, cfg, extra={"note": "test"})
    params2, cfg2, extra = load_snapshot(p)
    assert cfg2 == cfg
    assert extra["note"] == "test"
    out2 = render_rays(params2, cfg2, o, d, RenderSettings(n_coarse=8, n_fine=8, far=3.0))
    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(out2["rgb"]), atol=1e-6)


def test_mlp_field_eval_and_posenc():
    from dream2real_tpu.nerf.model import field_fn, posenc

    cfg = NGPConfig(field_type="mlp", mlp_width=32, mlp_depth=3, skip_layer=2,
                    posenc_deg=4, geo_feat_dim=7,
                    aabb_min=(0.0, 0.0, 0.0), aabb_max=(1.0, 1.0, 1.0))
    params = init_ngp_params(jax.random.PRNGKey(0), cfg)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (17, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (17, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    sigma, rgb = field_fn(params, pos, dirs, cfg)
    assert sigma.shape == (17,) and rgb.shape == (17, 3)
    assert np.isfinite(np.asarray(sigma)).all()
    assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()
    # Outside-aabb density must be exactly zero.
    sigma_out, _ = field_fn(params, pos + 5.0, dirs, cfg)
    assert (np.asarray(sigma_out) == 0).all()
    # posenc shape: 3 + 6*deg.
    pe = posenc(pos, 4)
    assert pe.shape == (17, 27)
    # Gradients flow and are finite.
    g = jax.grad(lambda p: field_fn(p, pos, dirs, cfg)[1].sum())(params)
    for k, v in g.items():
        assert np.isfinite(np.asarray(v)).all(), k
