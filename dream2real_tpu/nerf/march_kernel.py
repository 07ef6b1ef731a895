"""Fused pallas ray-march kernel for the imagination-loop crop renderer.

Replaces the XLA lowering of ``render_rays`` for the hot configuration
(mlp field, n_fine=0 uniform sampling, tight march box). Why: XLA lays the
per-SAMPLE tensors of the marcher out in HBM — (poses, crop, crop, S, C)
activations with C in {3, 30, 63, 256}, where trailing dims of 3/30 pad to
the 128-lane tile (measured 4.3-42.7x memory expansion on v5e) and the
trunk-MLP hidden states alone are ~1 GB per render group. The march is
therefore HBM-bound at ~24% MFU. This kernel keeps EVERYTHING per-sample
in VMEM: per grid cell (one block of rays) it runs the S-step march as a
fori_loop — positional encoding, 5-layer trunk, SH color head, and the
sequential front-to-back composite — with the field weights VMEM-resident.
HBM traffic per pose drops from gigabytes to rays x (dirs in + rgbad out)
~= 0.9 MB.

Layout: everything inside the kernel is FEATURE-MAJOR (C, R) — features in
sublanes, rays across the 128-lane dim. Ray-major (R, C) puts C in {1, 3,
30} on the lane axis, padding every VPU op up to 42x; feature-major wastes
at most the sublane remainder (<= 2.7x) and shrinks the compositing loop
carries from megabytes to (1..3, R) vectors. Weights are passed
pre-transposed/pre-padded in bf16 so matmuls are w^T @ x with rays as the
MXU N dimension.

Encoding trick: with uniform samples, pos01*2-1 = a + b*t per ray, so the
frequency encoding angles are ang_s = A + B*t_s with per-block A, B
computed once; each sample step is just a VPU mul-add + sin/cos.

Numerics mirror nerf/model.py::density_fn/color_fn exactly (bf16 matmuls
with f32 accumulation, bf16 inter-layer casts, f32 trunc_exp/sigmoid/
composite) — parity-tested against render_rays in tests/test_march_kernel.py.

Reference: the CUDA analogue is instant-ngp's fused marching kernel the
reference drives through pyngp (SURVEY.md §2b.1); this is its TPU-native
counterpart.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dream2real_tpu.nerf.model import NGPConfig
from dream2real_tpu.nerf.render import RenderSettings, ray_aabb


def _sh16_rows(u):
    """deg-4 real SH basis, feature-major: (3, R) unit dirs -> (16, R).
    Mirrors model.sh_encode_deg4 coefficient-for-coefficient."""
    x, y, z = u[0:1], u[1:2], u[2:3]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    rows = [
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
    ]
    return jnp.concatenate(rows, axis=0)


def _march_kernel(
    o_ref, d_ref, t0_ref, t1_ref, box_ref,
    w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    wm_ref, bm_ref, csh_ref, cw1_ref, cw2_ref,
    rgb_ref, alpha_ref, depth_ref,
    *, n_samples: int, min_transmittance: float, early_exit: bool,
):
    o = o_ref[:]             # (3, 1) camera centre (shared by the block)
    d = d_ref[0]             # (3, R) world dirs, z-normalized
    t0 = t0_ref[0]           # (1, R)
    t1 = t1_ref[0]
    R = d.shape[1]

    # Empty-space skip (instant-ngp's occupancy culling, block-granular): the
    # crop window is fixed-size while the object's projection often covers a
    # fraction of it — blocks whose rays ALL miss the march box write zeros
    # and skip the S-step march entirely. Exact: missed rays composite to
    # zero anyway (the caller also re-masks by t1 > t0).
    any_hit = jnp.sum((t1 > t0).astype(jnp.int32)) > 0

    @pl.when(jnp.logical_not(any_hit))
    def _skip():
        rgb_ref[0] = jnp.zeros_like(rgb_ref[0])
        alpha_ref[0] = jnp.zeros_like(alpha_ref[0])
        depth_ref[0] = jnp.zeros_like(depth_ref[0])

    @pl.when(any_hit)
    def _march():
        _march_block(
            o, d, t0, t1, box_ref,
            w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            wm_ref, bm_ref, csh_ref, cw1_ref, cw2_ref,
            rgb_ref, alpha_ref, depth_ref,
            n_samples=n_samples, min_transmittance=min_transmittance,
            early_exit=early_exit,
        )


def _march_block(
    o, d, t0, t1, box_ref,
    w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    wm_ref, bm_ref, csh_ref, cw1_ref, cw2_ref,
    rgb_ref, alpha_ref, depth_ref,
    *, n_samples: int, min_transmittance: float, early_exit: bool,
):
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    R = d.shape[1]
    deg = 10

    dn = jnp.sqrt(jnp.sum(d * d, axis=0, keepdims=True))  # (1, R) |d|
    dt = (t1 - t0) / n_samples

    # box_ref rows: [field_lo | field_hi | march_lo | march_hi] as (3, 4).
    lo_f, hi_f = box_ref[:, 0:1], box_ref[:, 1:2]
    lo_m, hi_m = box_ref[:, 2:3], box_ref[:, 3:4]
    lo_i = jnp.maximum(lo_f, lo_m)  # (3, 1) intersection for density mask
    hi_i = jnp.minimum(hi_f, hi_m)
    scale = 2.0 / (hi_f - lo_f)                            # (3, 1)
    a3 = o * scale + (-2.0 * lo_f / (hi_f - lo_f) - 1.0)   # (3, 1)
    b3 = d * scale                                         # (3, R)
    # Frequency angles as affine functions of t: ang_s = A + B * t_s, built
    # per frequency band by stacking scaled copies along sublanes (the
    # equivalent of posenc's freq-major [f0xyz f1xyz ...] flattening).
    freqs = [(2.0**j) * np.pi for j in range(deg)]
    A = jnp.concatenate([a3 * f for f in freqs], axis=0)   # (3deg, 1)
    B = jnp.concatenate([b3 * f for f in freqs], axis=0)   # (3deg, R)

    # SH color basis: constant across samples (dirs don't change along a
    # ray) — so its whole color-layer contribution csh @ sh hoists out of
    # the sample loop (one (64, 16) matmul per BLOCK instead of a (64, 31)
    # one per SAMPLE).
    sh = _sh16_rows(d / dn).astype(bf16)                   # (16, R)

    zeros1 = jnp.zeros((1, R), f32)

    w0, w1, w2, w3 = w0_ref[:], w1_ref[:], w2_ref[:], w3_ref[:]
    wm, cw1, cw2 = wm_ref[:], cw1_ref[:], cw2_ref[:]
    b0, b1, b2 = b0_ref[:], b1_ref[:], b2_ref[:]
    b3b, bm = b3_ref[:], bm_ref[:]
    sh_term = jnp.dot(csh_ref[:], sh, preferred_element_type=f32)  # (64, R)

    def body(s, carry):
        trans, acc_rgb, acc_a, acc_d = carry
        ts = t0 + (s + 0.5) * dt                           # (1, R)
        ang = A + B * ts                                   # (3deg, R) f32
        p2 = a3 + b3 * ts                                  # (3, R) in [-1, 1]
        # enc = [p2 | sin | cos | 0] along sublanes -> (64, R) for deg=10.
        enc = jnp.concatenate([p2, jnp.sin(ang), jnp.cos(ang), zeros1], 0)
        enc = enc.astype(bf16)

        h = jnp.dot(w0, enc, preferred_element_type=f32) + b0   # (256, R)
        h = jnp.maximum(h, 0.0).astype(bf16)
        h = jnp.dot(w1, h, preferred_element_type=f32) + b1
        h = jnp.maximum(h, 0.0).astype(bf16)
        h = jnp.dot(w2, h, preferred_element_type=f32) + b2
        h = jnp.maximum(h, 0.0).astype(bf16)
        h = jnp.concatenate([h, enc], 0)                        # (320, R)
        h = jnp.dot(w3, h, preferred_element_type=f32) + b3b
        h = jnp.maximum(h, 0.0).astype(bf16)
        # Folded head: wm = [w4 sigma row; cw0_geo @ w4_geo] computes sigma
        # AND the color layer's geo contribution in ONE full-rate (72, 256)
        # matmul — the separate w4 (M=16, 1/8 MXU by shape) and cw0 (K=31,
        # 1/4 by shape) matmuls this replaces ran at fractional rate.
        hm = jnp.dot(wm, h, preferred_element_type=f32) + bm    # (72, R)

        # Row order [geo 0:64 | sigma 64] keeps both slices 8-sublane-tile
        # aligned (no relayout copies).
        sigma = jnp.exp(jnp.clip(hm[64:65], -15.0, 15.0))       # (1, R)
        # Zero density outside field aabb / march box (model.density_fn +
        # render_rays march_aabb masking).
        pos = o + d * ts                                        # (3, R) world
        inside = jnp.all((pos >= lo_i) & (pos <= hi_i), axis=0, keepdims=True)
        sigma = jnp.where(inside, sigma, 0.0)

        c = hm[0:64] + sh_term                                  # (64, R) f32
        c = jnp.maximum(c, 0.0).astype(bf16)
        c = jnp.dot(cw1, c, preferred_element_type=f32)
        c = jnp.maximum(c, 0.0).astype(bf16)
        c = jnp.dot(cw2, c, preferred_element_type=f32)         # (8, R) f32
        rgb = jax.nn.sigmoid(c[:3])                             # (3, R)

        # Front-to-back composite (render.py::_composite, sequentialised).
        delta = jnp.where(s == n_samples - 1, 1e2, dt)
        a = 1.0 - jnp.exp(-sigma * delta * dn)                  # (1, R)
        w = jnp.where(trans < min_transmittance, 0.0, a * trans)
        acc_rgb = acc_rgb + w * rgb
        acc_a = acc_a + w
        acc_d = acc_d + w * ts
        trans = trans * (1.0 - a + 1e-10)
        return trans, acc_rgb, acc_a, acc_d

    init = (
        jnp.ones((1, R), f32),
        jnp.zeros((3, R), f32),
        jnp.zeros((1, R), f32),
        jnp.zeros((1, R), f32),
    )
    if early_exit:
        # Early-transmittance exit (exact): once every LIVE ray's
        # transmittance has dropped below min_transmittance, every remaining
        # sample's weight is zero for every lane — live saturated rays get
        # w = where(trans < min, 0, ...) = 0, and miss rays (t1 < t0, routed
        # beyond far) have density masked to 0 so w = 0 regardless. Exiting
        # the loop there changes no accumulator bit. Miss rays never decay
        # trans, so they must not hold the loop open: the continue condition
        # only consults live lanes.
        live0 = t0 < t1  # (1, R)

        def cond(carry):
            s, trans = carry[0], carry[1]
            alive = jnp.sum(
                (live0 & (trans >= min_transmittance)).astype(jnp.int32)
            )
            return jnp.logical_and(s < n_samples, alive > 0)

        def wbody(carry):
            s = carry[0]
            out = body(s, carry[1:])
            return (s + 1,) + out

        out = jax.lax.while_loop(cond, wbody, (jnp.int32(0),) + init)
        _, acc_rgb, acc_a, acc_d = out[1:]
    else:
        _, acc_rgb, acc_a, acc_d = jax.lax.fori_loop(0, n_samples, body, init)
    rgb_ref[0] = acc_rgb
    alpha_ref[0] = acc_a[0]
    depth_ref[0] = acc_d[0]


def _pad_params(params, cfg: NGPConfig):
    """Transpose + sublane-pad the mlp-field weights for the feature-major
    kernel, cast to bf16 (pure; jit-safe). Kernel computes w^T @ x."""
    bf = jnp.bfloat16
    enc_dim = cfg.posenc_dim  # 63
    w0 = params["trunk_w0"].T  # (256, 63)
    w0p = jnp.pad(w0, ((0, 0), (0, 64 - enc_dim)))  # zero col x enc pad row
    w3 = params["trunk_w3"].T  # (256, 319): [trunk 256 | enc 63]
    # Kernel concatenates [h(256) | enc64(64)] -> pad one zero column for
    # enc's 64th (always-zero) lane.
    w3p = jnp.concatenate(
        [w3[:, :256], w3[:, 256:], jnp.zeros((w3.shape[0], 1), w3.dtype)], axis=1
    )
    w4 = params["trunk_w4"].T   # (16, 256): [sigma row | 15 geo rows]
    b4 = params["trunk_b4"]     # (16,)
    cw0 = params["color_w0"].T  # (64, 31): [geo 15 | sh 16] columns
    # Folded sigma+color head (see _march_block): the color layer's geo
    # contribution composes linearly with the geo head, so cw0_geo @ w4_geo
    # pre-contracts to a (64, 256) matrix evaluated at FULL MXU rate; the
    # w4 (M=16) and cw0 (K=31) matmuls it replaces ran at 1/8 / 1/4 rate by
    # shape. Rows: [geo-color 0:64 | sigma 64], padded to 72 sublanes.
    wm = jnp.concatenate([cw0[:, :15] @ w4[1:16], w4[0:1]], axis=0)  # (65, 256)
    bm = jnp.concatenate([cw0[:, :15] @ b4[1:16], b4[0:1]])[:, None]
    cw2 = params["color_w2"].T  # (3, 64) -> pad M to 8 sublanes
    cw2p = jnp.pad(cw2, ((0, 5), (0, 0)))
    return {
        "w0": w0p.astype(bf), "b0": params["trunk_b0"][:, None],
        "w1": params["trunk_w1"].T.astype(bf), "b1": params["trunk_b1"][:, None],
        "w2": params["trunk_w2"].T.astype(bf), "b2": params["trunk_b2"][:, None],
        "w3": w3p.astype(bf), "b3": params["trunk_b3"][:, None],
        # Folded render-head layout (used by march_rays_fused)...
        "wm": jnp.pad(wm, ((0, 7), (0, 0))).astype(bf),
        "bm": jnp.pad(bm, ((0, 7), (0, 0))),
        "csh": cw0[:, 15:31].astype(bf),
        # ...and the unfolded heads (train_kernel.py's backward needs the
        # separate w4/cw0 to accumulate their gradients).
        "w4": w4.astype(bf), "b4": b4[:, None],
        "cw0": cw0.astype(bf),
        "cw1": params["color_w1"].T.astype(bf),
        "cw2": cw2p.astype(bf),
    }


def supports(cfg: NGPConfig, settings: RenderSettings) -> bool:
    """Kernel covers the imagination-loop configuration (the only hot one)."""
    return (
        cfg.field_type == "mlp"
        and settings.n_fine == 0
        and cfg.posenc_deg == 10
        and cfg.mlp_width == 256
        and cfg.mlp_depth == 5
        and cfg.skip_layer == 3
        and cfg.geo_feat_dim == 15
        and cfg.color_width == 64
        and cfg.n_color_layers == 3
        and cfg.sh_degree == 4
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "settings", "block_rays", "interpret",
                     "early_exit"),
)
def march_rays_fused(
    params,
    cfg: NGPConfig,
    origin: jnp.ndarray,   # (3,) camera centre (crop rays share it)
    dirs: jnp.ndarray,     # (R, 3) world dirs, z-normalized
    march_aabb,            # (lo, hi) arrays/tuples
    settings: RenderSettings,
    block_rays: int = 2048,
    interpret: bool | None = None,
    early_exit: bool | None = None,
):
    """Fused-march equivalent of render_rays(...)['rgb'/'alpha'/'depth'] for
    flat rays sharing one origin. Returns dict rgb (R,3), alpha (R,), depth (R,).

    NOTE (round 3/4): a hits-first ray-compaction variant (permute rays so
    fully-miss blocks skip marching) was built and measured LOSING on TPU —
    bench 211.5 vs 219.3 poses/s (experiments/results/r3_tpu_session.log) —
    the XLA row-gathers cost more than the skipped march work at the crop
    shapes. Deleted in round 4; the in-kernel `any_hit` block skip (below)
    keeps the cheap part of the win without any reordering.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if early_exit is None:
        # Default ON since round 5: bit-exact (tests/test_march_kernel.py)
        # and benched 1.24 vs 1.25-1.88 ms/pose flat with much lower
        # variance (experiments/results/bench_march_tiles.json).
        import os

        early_exit = os.environ.get("D2R_MARCH_EARLY", "1") == "1"
    n_rays = dirs.shape[0]
    block_rays = min(block_rays, max(128, n_rays))
    S = settings.n_coarse

    origin = origin.astype(jnp.float32)
    dirs = dirs.astype(jnp.float32)
    lo_m = jnp.asarray(march_aabb[0], jnp.float32)
    hi_m = jnp.asarray(march_aabb[1], jnp.float32)
    t0, t1 = ray_aabb(origin, dirs, lo_m, hi_m)
    t0 = jnp.maximum(t0, settings.near)
    t1 = jnp.minimum(t1, settings.far)
    valid = t1 > t0
    # Route miss rays beyond `far`, exactly like the padding rays below:
    # their composite is zero either way (density is masked outside the
    # march box), but a DESCENDING t-range is what the kernel's block-level
    # empty-space skip tests for — an ascending epsilon range here would
    # make every miss ray look live and defeat the skip.
    t0 = jnp.where(valid, t0, settings.far + 1.0)
    t1 = jnp.where(valid, t1, settings.far + 0.5)

    # Pad the ray set to a block multiple: padded rays march entirely beyond
    # `far` (outside every box -> zero density -> exact zero outputs) and a
    # fully-padded block short-circuits via the empty-space skip.
    r_pad = -n_rays % block_rays
    if r_pad:
        dirs = jnp.concatenate(
            [dirs, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (r_pad, 3))]
        )
        t0 = jnp.concatenate([t0, jnp.full((r_pad,), settings.far + 1.0)])
        t1 = jnp.concatenate([t1, jnp.full((r_pad,), settings.far + 0.5)])
    R = n_rays + r_pad
    nblk = R // block_rays

    box = jnp.stack(
        [
            jnp.asarray(cfg.aabb_min, jnp.float32),
            jnp.asarray(cfg.aabb_max, jnp.float32),
            lo_m, hi_m,
        ],
        axis=1,
    )  # (3, 4) feature-major
    p = _pad_params(params, cfg)

    def spec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    rep2 = lambda i: (0, 0)

    in_specs = [
        spec((3, 1), rep2),                                 # origin
        spec((1, 3, block_rays), lambda i: (0, 0, i)),      # dirs
        spec((1, block_rays), lambda i: (0, i)),            # t0
        spec((1, block_rays), lambda i: (0, i)),            # t1
        spec(box.shape, rep2),                              # boxes
    ] + [
        spec(p[k].shape, rep2)
        for k in ("w0", "b0", "w1", "b1", "w2", "b2", "w3", "b3", "wm", "bm",
                  "csh", "cw1", "cw2")
    ]

    out_shape = [
        jax.ShapeDtypeStruct((1, 3, R), jnp.float32),
        jax.ShapeDtypeStruct((1, R), jnp.float32),
        jax.ShapeDtypeStruct((1, R), jnp.float32),
    ]
    out_specs = [
        spec((1, 3, block_rays), lambda i: (0, 0, i)),
        spec((1, block_rays), lambda i: (0, i)),
        spec((1, block_rays), lambda i: (0, i)),
    ]

    kernel = functools.partial(
        _march_kernel,
        n_samples=S,
        min_transmittance=settings.min_transmittance,
        early_exit=bool(early_exit),
    )
    n_mac = R * S * (64 * 256 + 2 * 256 * 256 + 320 * 256 + 256 * 16
                     + 32 * 64 + 64 * 64 + 64 * 8)
    rgb, alpha, depth = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_mac,
            bytes_accessed=R * (3 + 3 + 2) * 4 + R * 5 * 4,
            transcendentals=R * S * (60 + 2),
        ),
        interpret=bool(interpret),
    )(
        origin[:, None], dirs.T[None], t0[None], t1[None], box,
        p["w0"], p["b0"], p["w1"], p["b1"], p["w2"], p["b2"],
        p["w3"], p["b3"], p["wm"], p["bm"], p["csh"], p["cw1"], p["cw2"],
    )
    rgb = jnp.where(valid[:, None], rgb[0].T[:n_rays], 0.0)
    alpha = jnp.where(valid, alpha[0][:n_rays], 0.0)
    depth = jnp.where(valid, depth[0][:n_rays], 0.0)
    return {"rgb": rgb, "alpha": alpha, "depth": depth}
