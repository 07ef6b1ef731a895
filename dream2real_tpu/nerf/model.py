"""NGP-class NeRF field, TPU-native.

Replaces the network inside the reference's pyngp engine (SURVEY.md §2b.1).
Two interchangeable field backends:

- ``field_type="mlp"`` (DEFAULT, the TPU-first design): frequency-encoded
  positions -> width x depth MLP trunk -> (log-density, geo features), plus an
  SH-conditioned color head. 100% MXU work — zero per-sample table lookups.
  Rationale: instant-ngp's multiresolution hash grid is a *GPU* optimisation
  (it trades FLOPs for random memory access, which GPUs hide with massive
  latency tolerance). On TPU, XLA gathers pad (T, 2) rows to full 128-lane
  tiles and scatter-adds run at ~20M updates/s, measured ~300ms per level per
  step on v5e — while the equivalent-quality MLP step is ~1.4ms of pure MXU.
  Fast NGP-like convergence is recovered with RGB-D depth supervision
  (the reference's scans are RGB-D anyway, data_loader.py:58).

- ``field_type="hashgrid"``: faithful multiresolution hash encoding
  (nerf/hashgrid.py) for parity experiments and non-TPU backends.

Coordinates: the field lives in world space; ``aabb`` bounds it (samples
outside get density 0). instant-ngp instead bakes scale/offset into camera
matrices — keeping world space everywhere avoids the reference's NGP/accio
axis gymnastics.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dream2real_tpu.nerf.hashgrid import HashGridConfig, hash_encode, init_hash_table


class NGPConfig(NamedTuple):
    field_type: str = "mlp"  # "mlp" | "hashgrid"
    # mlp field
    posenc_deg: int = 10
    mlp_width: int = 256
    mlp_depth: int = 5  # trunk layers
    skip_layer: int = 3  # concat input again before this trunk layer (0=off)
    # hashgrid field
    grid: HashGridConfig = HashGridConfig()
    hidden_dim: int = 64  # hashgrid-field MLP width
    n_density_layers: int = 2
    n_color_layers: int = 3
    # shared heads
    geo_feat_dim: int = 15
    color_width: int = 64
    sh_degree: int = 4  # 16 coefficients
    # World-space axis-aligned bounding box of the field.
    aabb_min: tuple = (-1.0, -1.0, -1.0)
    aabb_max: tuple = (1.0, 1.0, 1.0)

    @property
    def sh_dim(self) -> int:
        return self.sh_degree**2

    @property
    def posenc_dim(self) -> int:
        return 3 + 2 * 3 * self.posenc_deg


def sh_encode_deg4(d: jnp.ndarray) -> jnp.ndarray:
    """Real spherical harmonics basis up to degree 4 (16 coeffs).

    d: (..., 3) unit direction -> (..., 16). Same basis tiny-cuda-nn's SH
    encoder evaluates.
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    return jnp.stack(
        [
            jnp.full_like(x, 0.28209479177387814),
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * zz - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (xx - yy),
            0.59004358992664352 * y * (-3.0 * xx + yy),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * zz),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * zz),
            1.4453057213202769 * z * (xx - yy),
            0.59004358992664352 * x * (-xx + 3.0 * yy),
        ],
        axis=-1,
    )


def posenc(p: jnp.ndarray, deg: int) -> jnp.ndarray:
    """NeRF frequency encoding: (..., 3) -> (..., 3 + 6*deg)."""
    freqs = (2.0 ** jnp.arange(deg)) * jnp.pi
    ang = p[..., None, :] * freqs[:, None]  # (..., deg, 3)
    flat = ang.reshape(ang.shape[:-2] + (-1,))
    return jnp.concatenate([p, jnp.sin(flat), jnp.cos(flat)], axis=-1)


@jax.custom_jvp
def trunc_exp(x):
    """exp with clamped input (instant-ngp's density activation)."""
    return jnp.exp(jnp.clip(x, -15.0, 15.0))


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = jnp.exp(jnp.clip(x, -15.0, 15.0))
    return y, y * dx


def _dense_init(key, in_dim, out_dim):
    bound = np.sqrt(6.0 / in_dim)
    return jax.random.uniform(key, (in_dim, out_dim), minval=-bound, maxval=bound)


def init_ngp_params(key: jax.Array, cfg: NGPConfig) -> dict[str, Any]:
    """Initialise field parameters as a flat pytree dict."""
    keys = jax.random.split(key, 16)
    p: dict[str, Any] = {}
    if cfg.field_type == "hashgrid":
        g = cfg.grid
        p["table"] = init_hash_table(keys[0], g)
        dims = (
            [g.out_dim]
            + [cfg.hidden_dim] * (cfg.n_density_layers - 1)
            + [1 + cfg.geo_feat_dim]
        )
        for i in range(len(dims) - 1):
            p[f"sigma_w{i}"] = _dense_init(keys[1 + i], dims[i], dims[i + 1])
    elif cfg.field_type == "mlp":
        in_dim = cfg.posenc_dim
        d = in_dim
        for i in range(cfg.mlp_depth):
            if cfg.skip_layer and i == cfg.skip_layer:
                d += in_dim
            out = cfg.mlp_width if i < cfg.mlp_depth - 1 else 1 + cfg.geo_feat_dim
            p[f"trunk_w{i}"] = _dense_init(keys[1 + i], d, out)
            p[f"trunk_b{i}"] = jnp.zeros((out,), jnp.float32)
            d = out
    else:
        raise ValueError(cfg.field_type)

    cdims = (
        [cfg.geo_feat_dim + cfg.sh_dim]
        + [cfg.color_width] * (cfg.n_color_layers - 1)
        + [3]
    )
    for i in range(len(cdims) - 1):
        p[f"color_w{i}"] = _dense_init(keys[10 + i], cdims[i], cdims[i + 1])
    return p


def world_to_unit(positions: jnp.ndarray, cfg: NGPConfig) -> jnp.ndarray:
    lo = jnp.asarray(cfg.aabb_min)
    hi = jnp.asarray(cfg.aabb_max)
    return (positions - lo) / (hi - lo)


def in_aabb(positions: jnp.ndarray, cfg: NGPConfig) -> jnp.ndarray:
    lo = jnp.asarray(cfg.aabb_min)
    hi = jnp.asarray(cfg.aabb_max)
    return jnp.all((positions >= lo) & (positions <= hi), axis=-1)


def _mlp(x, params, prefix, n_layers, compute_dtype):
    for i in range(n_layers):
        w = params[f"{prefix}_w{i}"].astype(compute_dtype)
        x = jnp.dot(x, w, preferred_element_type=jnp.float32)
        if i < n_layers - 1:
            x = jax.nn.relu(x)
        x = x.astype(compute_dtype)
    return x


def density_fn(
    params, positions: jnp.ndarray, cfg: NGPConfig, compute_dtype=jnp.bfloat16
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """positions (..., 3) world -> (sigma (...,), geo_feat (..., geo_feat_dim)).

    Out-of-aabb positions get sigma == 0 (replaces instant-ngp's aabb clipping
    inside the CUDA ray marcher).
    """
    pos01 = world_to_unit(positions, cfg)
    if cfg.field_type == "hashgrid":
        enc = hash_encode(pos01, params["table"], cfg.grid).astype(compute_dtype)
        h = _mlp(enc, params, "sigma", cfg.n_density_layers, compute_dtype)
    else:
        # Encode in [-1, 1] for symmetric frequencies.
        enc0 = posenc(pos01 * 2.0 - 1.0, cfg.posenc_deg).astype(compute_dtype)
        h = enc0
        for i in range(cfg.mlp_depth):
            if cfg.skip_layer and i == cfg.skip_layer:
                h = jnp.concatenate([h, enc0], axis=-1)
            w = params[f"trunk_w{i}"].astype(compute_dtype)
            b = params[f"trunk_b{i}"].astype(compute_dtype)
            h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
            if i < cfg.mlp_depth - 1:
                h = jax.nn.relu(h)
            h = h.astype(compute_dtype)
    sigma = trunc_exp(h[..., 0].astype(jnp.float32))
    sigma = jnp.where(in_aabb(positions, cfg), sigma, 0.0)
    return sigma, h[..., 1:]


def color_fn(
    params, geo_feat: jnp.ndarray, dirs: jnp.ndarray, cfg: NGPConfig,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """(geo_feat (..., G), unit dirs (..., 3)) -> linear RGB (..., 3)."""
    sh = sh_encode_deg4(dirs).astype(compute_dtype)
    x = jnp.concatenate([geo_feat.astype(compute_dtype), sh], axis=-1)
    rgb = _mlp(x, params, "color", cfg.n_color_layers, compute_dtype)
    return jax.nn.sigmoid(rgb.astype(jnp.float32))


def field_fn(
    params, positions: jnp.ndarray, dirs: jnp.ndarray, cfg: NGPConfig,
    compute_dtype=jnp.bfloat16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full field eval: world positions + unit view dirs -> (sigma, rgb)."""
    sigma, geo = density_fn(params, positions, cfg, compute_dtype)
    rgb = color_fn(params, geo, dirs, cfg, compute_dtype)
    return sigma, rgb
