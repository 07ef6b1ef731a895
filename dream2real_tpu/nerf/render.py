"""Hierarchical volumetric ray marcher + compositor.

TPU-native replacement for instant-ngp's occupancy-grid CUDA ray marcher
(SURVEY.md §2b.1, "hard parts"). Early-termination marching is GPU-shaped;
on TPU we use fixed-size two-pass sampling (static shapes, no data-dependent
control flow): a cheap density-only coarse pass, then importance resampling
of the full field. All shapes static => XLA tiles everything onto MXU/VPU.

Conventions:
- ray directions are z-normalized in the camera frame (ops/cameras.pixel_dirs)
  so the marching parameter t equals z-depth; metric path length uses |d|.
- returned RGB is premultiplied-alpha *linear* radiance, matching pyngp's
  ``render(..., linear=True)`` output that combined_rendering.py consumes
  (reference combined_rendering.py:105,127 then unpremultiply+sRGB at 147-154).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dream2real_tpu.nerf.model import NGPConfig, density_fn, field_fn


class RenderSettings(NamedTuple):
    n_coarse: int = 32
    n_fine: int = 32
    near: float = 0.05
    far: float = 4.0
    # Minimum transmittance: marching contribution below this is dropped by
    # instant-ngp (pyngp render_min_transmittance, combined_rendering.py:49).
    min_transmittance: float = 1e-4
    # bf16 MLP evals feed the MXU at full rate; compositing stays f32.
    compute_dtype: jnp.dtype = jnp.bfloat16


def ray_aabb(
    origins: jnp.ndarray, dirs: jnp.ndarray, aabb_min, aabb_max
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Slab test. origins/dirs (..., 3) -> (t_near, t_far), t_far < t_near if miss."""
    lo = (jnp.asarray(aabb_min) - origins) / jnp.where(jnp.abs(dirs) < 1e-9, 1e-9, dirs)
    hi = (jnp.asarray(aabb_max) - origins) / jnp.where(jnp.abs(dirs) < 1e-9, 1e-9, dirs)
    t0 = jnp.minimum(lo, hi).max(axis=-1)
    t1 = jnp.maximum(lo, hi).min(axis=-1)
    return t0, t1


def sample_pdf(
    ts: jnp.ndarray, weights: jnp.ndarray, n_samples: int, key=None
) -> jnp.ndarray:
    """Inverse-CDF importance sampling (NeRF hierarchical sampling).

    ts: (..., S) sorted sample positions; weights: (..., S) >= 0.
    Returns (..., n_samples) new positions inside [ts[0], ts[-1]].
    Deterministic midpoints of CDF quantiles when key is None (rendering);
    jittered when a PRNG key is given (training).
    """
    mids = 0.5 * (ts[..., 1:] + ts[..., :-1])  # (..., S-1) bin edges
    bin_lo = jnp.concatenate([ts[..., :1], mids], axis=-1)
    bin_hi = jnp.concatenate([mids, ts[..., -1:]], axis=-1)
    w = weights + 1e-5
    pdf = w / w.sum(axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., S+1)

    if key is None:
        u = (jnp.arange(n_samples) + 0.5) / n_samples
        u = jnp.broadcast_to(u, ts.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, ts.shape[:-1] + (n_samples,))

    # Bin selection + reads as one-hot CONTRACTIONS instead of gathers:
    # XLA's batched take_along_axis on TPU cost ~15 ms at training shapes
    # (8192 x 32), the dense one-hot einsum is ~0.3 ms with identical output
    # (S is small, so the (n, S) selector is cheap VPU work).
    below = (cdf[..., None, :] <= u[..., :, None]).astype(jnp.float32)
    sel = below[..., :-1] * (1.0 - below[..., 1:])  # (..., n, S) one-hot bin
    # Clamp u >= cdf[-1] into the last bin (where `below` is all ones).
    sel = sel.at[..., -1].add(below[..., -1])

    def read(vals):  # (..., S) -> (..., n)
        return jnp.einsum("...ns,...s->...n", sel, vals)

    cdf_lo = read(cdf[..., :-1])
    cdf_hi = read(cdf[..., 1:])
    lo = read(bin_lo)
    hi = read(bin_hi)
    denom = jnp.where(cdf_hi - cdf_lo < 1e-8, 1.0, cdf_hi - cdf_lo)
    frac = (u - cdf_lo) / denom
    return lo + frac * (hi - lo)


def _composite(sigma, rgb, ts, d_norm, min_transmittance):
    """Front-to-back compositing. sigma (..., S), rgb (..., S, 3), ts (..., S).

    Returns premultiplied linear rgb (..., 3), alpha (...,), z-depth (...,),
    per-sample weights (..., S).
    """
    deltas = jnp.diff(ts, axis=-1)
    # Final segment: closed with a large delta so opaque content terminates.
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[..., :1], 1e2)], axis=-1
    )
    alpha = 1.0 - jnp.exp(-sigma * deltas * d_norm[..., None])
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    weights = alpha * trans
    # instant-ngp stops marching below min transmittance: zero those weights.
    weights = jnp.where(trans < min_transmittance, 0.0, weights)
    comp_rgb = (weights[..., None] * rgb).sum(axis=-2)
    acc = weights.sum(axis=-1)
    depth = (weights * ts).sum(axis=-1)
    return comp_rgb, acc, depth, weights


def render_rays(
    params,
    cfg: NGPConfig,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    settings: RenderSettings,
    key=None,
    march_aabb=None,
):
    """March rays through the field.

    origins (..., 3) world; dirs (..., 3) world, z-normalized (not unit).
    Returns dict with premultiplied linear 'rgb' (..., 3), 'alpha' (...,),
    'depth' (...,) (z-depth), 'weights'/'ts' for training losses.

    march_aabb: optional (lo, hi) tighter box to march (e.g. the movable
    object's bounds in the imagination loop): the t-range comes from this box
    and density outside it is zeroed (suppresses field floaters AND lets a
    small fixed sample count cover the box densely).
    """
    d_norm = jnp.linalg.norm(dirs, axis=-1)
    unit_dirs = dirs / d_norm[..., None]

    box_lo, box_hi = (
        (cfg.aabb_min, cfg.aabb_max) if march_aabb is None else march_aabb
    )
    t0, t1 = ray_aabb(origins, dirs, box_lo, box_hi)
    t0 = jnp.maximum(t0, settings.near)
    t1 = jnp.minimum(t1, settings.far)
    valid = t1 > t0
    t1 = jnp.where(valid, t1, t0 + 1e-3)

    # Coarse pass: stratified (train) or midpoint (render) uniform samples.
    nc = settings.n_coarse
    frac = (jnp.arange(nc) + 0.5) / nc
    if key is not None:
        key, sub = jax.random.split(key)
        jitter = (jax.random.uniform(sub, origins.shape[:-1] + (nc,)) - 0.5) / nc
        frac = frac + jitter
    ts_c = t0[..., None] + (t1 - t0)[..., None] * frac  # (..., nc)

    # Fine pass: importance-sample from (detached) coarse weights, then
    # evaluate the full field on the sorted union of coarse+fine samples.
    # The density-only coarse eval exists ONLY to drive this resampler: when
    # n_fine == 0 (the imagination crop fast path) it would re-run the trunk
    # MLP — ~97% of field FLOPs — on the exact samples the full pass below
    # evaluates anyway, so it is skipped entirely.
    if settings.n_fine > 0:
        pos_c = origins[..., None, :] + dirs[..., None, :] * ts_c[..., None]
        sigma_c, _ = density_fn(params, pos_c, cfg, settings.compute_dtype)
        _, _, _, w_c = _composite(
            sigma_c, jnp.zeros(sigma_c.shape + (3,)), ts_c, d_norm,
            settings.min_transmittance,
        )
        sub = None
        if key is not None:
            key, sub = jax.random.split(key)
        ts_f = sample_pdf(ts_c, jax.lax.stop_gradient(w_c), settings.n_fine, sub)
        ts_all = jnp.sort(jnp.concatenate([ts_c, ts_f], axis=-1), axis=-1)
    else:
        ts_all = ts_c

    pos = origins[..., None, :] + dirs[..., None, :] * ts_all[..., None]
    sh_dirs = jnp.broadcast_to(unit_dirs[..., None, :], pos.shape)
    sigma, rgb = field_fn(params, pos, sh_dirs, cfg, settings.compute_dtype)
    if march_aabb is not None:
        inbox = jnp.all(
            (pos >= jnp.asarray(box_lo)) & (pos <= jnp.asarray(box_hi)), axis=-1
        )
        sigma = jnp.where(inbox, sigma, 0.0)
    comp_rgb, acc, depth, weights = _composite(
        sigma, rgb, ts_all, d_norm, settings.min_transmittance
    )
    # Rays that miss the AABB contribute nothing.
    comp_rgb = jnp.where(valid[..., None], comp_rgb, 0.0)
    acc = jnp.where(valid, acc, 0.0)
    depth = jnp.where(valid, depth, 0.0)
    return {
        "rgb": comp_rgb,
        "alpha": acc,
        "depth": depth,
        "weights": weights,
        "ts": ts_all,
    }


def render_image(
    params,
    cfg: NGPConfig,
    T_WC: jnp.ndarray,
    dirs_cam: jnp.ndarray,
    settings: RenderSettings,
    row_chunk: int = 0,
):
    """Render a full image from camera pose T_WC (accio convention, 4x4).

    dirs_cam: (H, W, 3) z-normalized pixel dirs (ops/cameras.pixel_dirs).
    Returns dict with 'rgb' (H, W, 3) premultiplied linear, 'alpha', 'depth'.
    Equivalent of pyngp Testbed.render(w, h, spp=1, linear=True)
    (combined_rendering.py:105,127-130) — Shade and Depth in ONE march.

    row_chunk > 0 bounds peak memory by scanning over row blocks.
    """
    h = dirs_cam.shape[0]
    R = T_WC[:3, :3]
    t = T_WC[:3, 3]
    dirs = jnp.einsum("ij,hwj->hwi", R, dirs_cam)
    origins = jnp.broadcast_to(t, dirs.shape)

    if row_chunk and row_chunk < h:
        assert h % row_chunk == 0, (h, row_chunk)
        dirs_b = dirs.reshape(h // row_chunk, row_chunk, *dirs.shape[1:])
        orig_b = origins.reshape(h // row_chunk, row_chunk, *origins.shape[1:])

        def body(args):
            o, d = args
            out = render_rays(params, cfg, o, d, settings)
            return {k: out[k] for k in ("rgb", "alpha", "depth")}

        out = jax.lax.map(body, (orig_b, dirs_b))
        return {k: v.reshape((h,) + v.shape[2:]) for k, v in out.items()}

    out = render_rays(params, cfg, origins, dirs, settings)
    return {k: out[k] for k in ("rgb", "alpha", "depth")}
