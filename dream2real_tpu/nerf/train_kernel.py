"""Fused pallas kernels for NeRF TRAINING (forward + custom-VJP backward).

Why: the XLA lowering of the training render is HBM-bound at ~21% MFU —
per-sample activations (batch_rays, S, C) round-trip HBM between every MLP
layer, and the cost is superlinear in S (measured 3.6 ms/step at S=32 vs
11.0 ms at S=64, b=4096, v5e). The imagination-loop march kernel
(march_kernel.py) proved the fix: keep everything per-sample in VMEM in a
feature-major (C, rays) layout. Training needs two extra pieces the render
kernel doesn't have:

1. per-ray origins + an arbitrary precomputed sample vector ts (R, S) —
   training rays come from many cameras and hierarchical sampling produces
   non-uniform sorted sample positions;
2. gradients. The backward kernel uses instant-ngp's recompute trick
   (no stored activations): it re-marches forward, recomputing each
   sample's activations in VMEM, and closes the composite backward in the
   SAME forward-ordered pass via
       dL/da_s = m_s T_s g_s - (G_total - P_s) / (1 - a_s + eps),
   where g_s = dC.rgb_s + dA + dD t_s, P_s is the running prefix of
   w_j g_j, and G_total = dC.C + dA.A + dD.D comes from the saved forward
   outputs. Weight gradients accumulate in f32 VMEM accumulators (~1 MB)
   carried through the sample loop and are summed across ray blocks by a
   sequential grid that revisits the same output block.

Gradient contract (parity-tested in tests/test_train_kernel.py):
- exact (to bf16-accumulation tolerance) wrt all field params;
- approximate wrt origins/dirs: the geometric path through sample
  positions is included; the paths through ts (ray-aabb ends), |d|
  (delta scaling) and the SH color basis are dropped, and d ts gets
  zeros. Field-only training (the fg/bg task NeRFs train with
  optimize_extrinsics=False) therefore sees exact gradients; joint
  extrinsics refinement sees the dominant term.

Numerics mirror model.field_fn / render._composite: bf16 matmuls with f32
accumulation, bf16 inter-layer casts, f32 trunc_exp/sigmoid/composite;
trunc_exp's custom JVP is y*dx (no clip mask, model.py:112-116),
reproduced here.

Reference: the CUDA analogue is instant-ngp's fused training step
(SURVEY.md §2b.1) the reference drives through pyngp Testbed.train()
(reconstruction/train_ngp.py:90-143); this is its TPU-native counterpart.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dream2real_tpu.nerf.march_kernel import _pad_params, _sh16_rows
from dream2real_tpu.nerf.model import NGPConfig

DEG = 10
_F32 = jnp.float32
_BF16 = jnp.bfloat16

_WEIGHT_NAMES = ("w0", "b0", "w1", "b1", "w2", "b2", "w3", "b3", "w4", "b4",
                 "cw0", "cw1", "cw2")
# Gradient accumulator shapes, matching _pad_params' padded layouts.
_GRAD_SHAPES = (
    (256, 64), (256, 1), (256, 256), (256, 1), (256, 256), (256, 1),
    (256, 320), (256, 1), (16, 256), (16, 1), (64, 31), (64, 64), (8, 64),
)


def _freqs():
    return [(2.0**j) * np.pi for j in range(DEG)]


def _enc_affine(o, d, box_ref):
    """Per-ray affine encoding: ang_s = A + B*t_s, p2 = a3 + b3*t_s.

    o, d: (3, R) f32; box_ref (3, 2) = [aabb_lo | aabb_hi] columns."""
    lo_f, hi_f = box_ref[:, 0:1], box_ref[:, 1:2]
    scale = 2.0 / (hi_f - lo_f)  # (3, 1)
    a3 = o * scale + (-2.0 * lo_f / (hi_f - lo_f) - 1.0)  # (3, R)
    b3 = d * scale  # (3, R)
    A = jnp.concatenate([a3 * f for f in _freqs()], axis=0)  # (30, R)
    B = jnp.concatenate([b3 * f for f in _freqs()], axis=0)
    return a3, b3, A, B, lo_f, hi_f, scale


def _sample_geom(o, d, ts_row, a3, b3, A, B, lo_f, hi_f):
    """Encoding + inside-aabb mask for one sample row ts_row (1, R)."""
    ang = A + B * ts_row  # (30, R)
    p2 = a3 + b3 * ts_row  # (3, R)
    zeros1 = jnp.zeros((1, ts_row.shape[-1]), _F32)
    enc = jnp.concatenate([p2, jnp.sin(ang), jnp.cos(ang), zeros1], 0)
    pos = o + d * ts_row
    inside = jnp.all((pos >= lo_f) & (pos <= hi_f), axis=0, keepdims=True)
    return enc.astype(_BF16), ang, inside


def _field_sample(enc, sh, weights):
    """One sample's full field eval, feature-major. Returns (sigma_raw
    (1,R) f32 pre-mask, rgb (3,R) f32, acts) with post-activation layer
    values for backward."""
    (w0, b0, w1, b1, w2, b2, w3, b3b, w4, b4b, cw0, cw1, cw2) = weights
    h0 = jnp.dot(w0, enc, preferred_element_type=_F32) + b0
    h0 = jnp.maximum(h0, 0.0).astype(_BF16)
    h1 = jnp.dot(w1, h0, preferred_element_type=_F32) + b1
    h1 = jnp.maximum(h1, 0.0).astype(_BF16)
    h2 = jnp.dot(w2, h1, preferred_element_type=_F32) + b2
    h2 = jnp.maximum(h2, 0.0).astype(_BF16)
    hcat = jnp.concatenate([h2, enc], 0)  # (320, R)
    h3 = jnp.dot(w3, hcat, preferred_element_type=_F32) + b3b
    h3 = jnp.maximum(h3, 0.0).astype(_BF16)
    h4 = (jnp.dot(w4, h3, preferred_element_type=_F32) + b4b).astype(_BF16)

    sigma_raw = jnp.exp(jnp.clip(h4[0:1].astype(_F32), -15.0, 15.0))

    cin = jnp.concatenate([h4[1:16], sh], 0)  # (31, R) bf16
    c0 = jnp.dot(cw0, cin, preferred_element_type=_F32)
    c0 = jnp.maximum(c0, 0.0).astype(_BF16)
    c1 = jnp.dot(cw1, c0, preferred_element_type=_F32)
    c1 = jnp.maximum(c1, 0.0).astype(_BF16)
    c2 = jnp.dot(cw2, c1, preferred_element_type=_F32)  # (8, R) f32
    rgb = jax.nn.sigmoid(c2[:3])
    acts = (h0, h1, h2, h3, hcat, cin, c0, c1)
    return sigma_raw, rgb, acts


def _train_fwd_kernel(
    o_ref, d_ref, ts_ref, dl_ref, box_ref,
    w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    w4_ref, b4_ref, cw0_ref, cw1_ref, cw2_ref,
    rgb_ref, alpha_ref, depth_ref,
    *, n_samples: int, min_transmittance: float,
):
    o = o_ref[0]  # (3, R)
    d = d_ref[0]
    R = d.shape[1]
    dn = jnp.sqrt(jnp.sum(d * d, axis=0, keepdims=True))
    a3, b3, A, B, lo_f, hi_f, _ = _enc_affine(o, d, box_ref)
    sh = _sh16_rows(d / dn).astype(_BF16)
    weights = tuple(r[:] for r in (
        w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
        w4_ref, b4_ref, cw0_ref, cw1_ref, cw2_ref,
    ))

    def body(s, carry):
        trans, acc_rgb, acc_a, acc_d = carry
        # Mosaic supports dynamic slicing on REFS (sublane dim), not values.
        ts_row = ts_ref[0, pl.ds(s, 1)]
        dl_row = dl_ref[0, pl.ds(s, 1)]
        enc, _, inside = _sample_geom(o, d, ts_row, a3, b3, A, B, lo_f, hi_f)
        sigma_raw, rgb, _ = _field_sample(enc, sh, weights)
        sigma = jnp.where(inside, sigma_raw, 0.0)
        a = 1.0 - jnp.exp(-sigma * dl_row * dn)
        w = jnp.where(trans < min_transmittance, 0.0, a * trans)
        acc_rgb = acc_rgb + w * rgb
        acc_a = acc_a + w
        acc_d = acc_d + w * ts_row
        trans = trans * (1.0 - a + 1e-10)
        return trans, acc_rgb, acc_a, acc_d

    init = (
        jnp.ones((1, R), _F32),
        jnp.zeros((3, R), _F32),
        jnp.zeros((1, R), _F32),
        jnp.zeros((1, R), _F32),
    )
    _, acc_rgb, acc_a, acc_d = jax.lax.fori_loop(0, n_samples, body, init)
    rgb_ref[0] = acc_rgb
    alpha_ref[:] = acc_a
    depth_ref[:] = acc_d


def _density_weights_kernel(
    o_ref, d_ref, ts_ref, dl_ref, box_ref,
    w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    w4_ref, b4_ref,
    w_out_ref,
    *, n_samples: int, min_transmittance: float,
):
    """Coarse pass: per-sample composite weights only (drives sample_pdf).
    No color head, no gradients (the resampler is stop-gradient)."""
    o = o_ref[0]
    d = d_ref[0]
    R = d.shape[1]
    dn = jnp.sqrt(jnp.sum(d * d, axis=0, keepdims=True))
    a3, b3, A, B, lo_f, hi_f, _ = _enc_affine(o, d, box_ref)
    w0, b0 = w0_ref[:], b0_ref[:]
    w1, b1 = w1_ref[:], b1_ref[:]
    w2, b2 = w2_ref[:], b2_ref[:]
    w3, b3b = w3_ref[:], b3_ref[:]
    w4, b4b = w4_ref[:], b4_ref[:]

    def body(s, trans):
        ts_row = ts_ref[0, pl.ds(s, 1)]
        dl_row = dl_ref[0, pl.ds(s, 1)]
        enc, _, inside = _sample_geom(o, d, ts_row, a3, b3, A, B, lo_f, hi_f)
        h = jnp.dot(w0, enc, preferred_element_type=_F32) + b0
        h = jnp.maximum(h, 0.0).astype(_BF16)
        h = jnp.dot(w1, h, preferred_element_type=_F32) + b1
        h = jnp.maximum(h, 0.0).astype(_BF16)
        h = jnp.dot(w2, h, preferred_element_type=_F32) + b2
        h = jnp.maximum(h, 0.0).astype(_BF16)
        h = jnp.concatenate([h, enc], 0)
        h = jnp.dot(w3, h, preferred_element_type=_F32) + b3b
        h = jnp.maximum(h, 0.0).astype(_BF16)
        # Only the sigma row of the last layer is needed: 8 sublane rows.
        x = (jnp.dot(w4[0:8], h, preferred_element_type=_F32) + b4b[0:8])
        x = x.astype(_BF16)
        sigma = jnp.exp(jnp.clip(x[0:1].astype(_F32), -15.0, 15.0))
        sigma = jnp.where(inside, sigma, 0.0)
        a = 1.0 - jnp.exp(-sigma * dl_row * dn)
        w = jnp.where(trans < min_transmittance, 0.0, a * trans)
        w_out_ref[0, pl.ds(s, 1)] = w
        trans = trans * (1.0 - a + 1e-10)
        return trans

    jax.lax.fori_loop(0, n_samples, body, jnp.ones((1, R), _F32))


def _train_bwd_kernel(
    o_ref, d_ref, ts_ref, dl_ref, box_ref,
    w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    w4_ref, b4_ref, cw0_ref, cw1_ref, cw2_ref,
    dC_ref, dA_ref, dD_ref, C_ref, A_ref, D_ref,
    dw0_ref, db0_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
    dw4_ref, db4_ref, dcw0_ref, dcw1_ref, dcw2_ref, *ray_refs,
    n_samples: int, min_transmittance: float, ray_grads: bool,
):
    if ray_grads:
        do_ref, dd_ref = ray_refs
    pid = pl.program_id(0)
    o = o_ref[0]
    d = d_ref[0]
    R = d.shape[1]
    dn = jnp.sqrt(jnp.sum(d * d, axis=0, keepdims=True))
    a3, b3, A, B, lo_f, hi_f, scale = _enc_affine(o, d, box_ref)
    sh = _sh16_rows(d / dn).astype(_BF16)
    weights = tuple(r[:] for r in (
        w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
        w4_ref, b4_ref, cw0_ref, cw1_ref, cw2_ref,
    ))
    (w0, _, w1, _, w2, _, w3, _, w4, _, cw0, cw1, cw2) = weights

    dC = dC_ref[0]  # (3, R)
    dA_cot = dA_ref[:]  # (1, R)
    dD = dD_ref[:]
    # G_total = sum_j w_j g_j, from the SAVED forward outputs.
    g_total = (
        jnp.sum(dC * C_ref[0], axis=0, keepdims=True)
        + dA_cot * A_ref[:]
        + dD * D_ref[:]
    )

    def body(s, carry):
        if ray_grads:
            trans, P, accs, do_acc, dd_acc = carry
        else:
            trans, P, accs = carry
        (dw0, db0, dw1, db1, dw2, db2, dw3, db3, dw4, db4,
         dcw0, dcw1, dcw2) = accs
        ts_row = ts_ref[0, pl.ds(s, 1)]
        dl_row = dl_ref[0, pl.ds(s, 1)]
        enc, ang, inside = _sample_geom(o, d, ts_row, a3, b3, A, B, lo_f, hi_f)
        sigma_raw, rgb, acts = _field_sample(enc, sh, weights)
        h0, h1, h2, h3, hcat, cin, c0, c1 = acts
        sigma = jnp.where(inside, sigma_raw, 0.0)
        a = 1.0 - jnp.exp(-sigma * dl_row * dn)
        m = (trans >= min_transmittance).astype(_F32)
        w = m * a * trans

        g = jnp.sum(dC * rgb, axis=0, keepdims=True) + dA_cot + dD * ts_row
        P = P + w * g
        U = g_total - P  # sum_{j>s} w_j g_j
        # dL/dsigma_s = [m T g - U/(1-a+eps)] * dl dn (1-a), folded so no
        # intermediate divides by the near-zero (1-a+eps) when a -> 1:
        # (1-a)/(1-a+eps) is bounded in [0, 1]. The guard is max(), not
        # (+eps): inside the kernel `(1.0 - a) + 1e-10` was measured to
        # reassociate to `(1.0 + 1e-10) - a` == 0 at a == 1, which divides
        # by zero; maximum() cannot be optimised away.
        one_m_a = 1.0 - a
        ratio = one_m_a / jnp.maximum(one_m_a, 1e-10)
        dsigma = dl_row * dn * (m * trans * g * one_m_a - U * ratio)
        # trunc_exp JVP is y*dx; the aabb where() gate rides the masked sigma.
        dx_sigma = dsigma * sigma  # (1, R) f32

        # Color head backward (no biases); rgb = sigmoid(c2[:3]).
        drgb = w * dC  # (3, R) f32
        dc2 = jnp.concatenate(
            [drgb * rgb * (1.0 - rgb), jnp.zeros((5, R), _F32)], 0
        )
        dc2b = dc2.astype(_BF16)
        dcw2 = dcw2 + jnp.dot(dc2b, c1.T, preferred_element_type=_F32)
        dc1 = jnp.dot(cw2.T, dc2b, preferred_element_type=_F32)
        dc1 = jnp.where(c1.astype(_F32) > 0.0, dc1, 0.0).astype(_BF16)
        dcw1 = dcw1 + jnp.dot(dc1, c0.T, preferred_element_type=_F32)
        dc0 = jnp.dot(cw1.T, dc1, preferred_element_type=_F32)
        dc0 = jnp.where(c0.astype(_F32) > 0.0, dc0, 0.0).astype(_BF16)
        dcw0 = dcw0 + jnp.dot(dc0, cin.T, preferred_element_type=_F32)
        dcin = jnp.dot(cw0.T, dc0, preferred_element_type=_F32)  # (31, R)

        # Trunk backward. h4 rows: [sigma_x | geo15]; cin rows [geo15 | sh16].
        dh4f = jnp.concatenate([dx_sigma, dcin[0:15]], 0)  # (16, R) f32
        dh4 = dh4f.astype(_BF16)
        dw4 = dw4 + jnp.dot(dh4, h3.T, preferred_element_type=_F32)
        db4 = db4 + jnp.sum(dh4f, axis=1, keepdims=True)
        dh3 = jnp.dot(w4.T, dh4, preferred_element_type=_F32)
        dh3 = jnp.where(h3.astype(_F32) > 0.0, dh3, 0.0)
        db3 = db3 + jnp.sum(dh3, axis=1, keepdims=True)
        dh3 = dh3.astype(_BF16)
        dw3 = dw3 + jnp.dot(dh3, hcat.T, preferred_element_type=_F32)
        dhcat = jnp.dot(w3.T, dh3, preferred_element_type=_F32)  # (320, R)
        dh2 = jnp.where(h2.astype(_F32) > 0.0, dhcat[0:256], 0.0)
        db2 = db2 + jnp.sum(dh2, axis=1, keepdims=True)
        dh2 = dh2.astype(_BF16)
        denc_skip = dhcat[256:320]  # (64, R)
        dw2 = dw2 + jnp.dot(dh2, h1.T, preferred_element_type=_F32)
        dh1 = jnp.dot(w2.T, dh2, preferred_element_type=_F32)
        dh1 = jnp.where(h1.astype(_F32) > 0.0, dh1, 0.0)
        db1 = db1 + jnp.sum(dh1, axis=1, keepdims=True)
        dh1 = dh1.astype(_BF16)
        dw1 = dw1 + jnp.dot(dh1, h0.T, preferred_element_type=_F32)
        dh0 = jnp.dot(w1.T, dh1, preferred_element_type=_F32)
        dh0 = jnp.where(h0.astype(_F32) > 0.0, dh0, 0.0)
        db0 = db0 + jnp.sum(dh0, axis=1, keepdims=True)
        dh0 = dh0.astype(_BF16)
        dw0 = dw0 + jnp.dot(dh0, enc.T, preferred_element_type=_F32)

        trans = trans * (1.0 - a + 1e-10)
        accs = (dw0, db0, dw1, db1, dw2, db2, dw3, db3, dw4, db4,
                dcw0, dcw1, dcw2)
        if not ray_grads:
            # Extrinsics frozen (the dominant fg/bg task-NeRF config):
            # dL/d(origins,dirs) is discarded upstream, so skip its whole
            # chain — the w0^T @ dh0 input-grad matmul and the sin/cos
            # re-evaluation below are ray-grad-only work.
            return trans, P, accs

        denc = jnp.dot(w0.T, dh0, preferred_element_type=_F32)  # (64, R)
        denc = denc + denc_skip

        # enc rows: [p2 (3) | sin(ang) (30) | cos(ang) (30) | pad]; the bf16
        # cast is treated as identity.
        dang = denc[3:33] * jnp.cos(ang) - denc[33:63] * jnp.sin(ang)
        dp2 = denc[0:3]
        for b_idx, f in enumerate(_freqs()):
            dp2 = dp2 + f * dang[3 * b_idx:3 * b_idx + 3]
        dpos = dp2 * scale  # world-space gradient (3, R)
        do_acc = do_acc + dpos
        dd_acc = dd_acc + dpos * ts_row

        return trans, P, accs, do_acc, dd_acc

    init = (
        jnp.ones((1, R), _F32),
        jnp.zeros((1, R), _F32),
        tuple(jnp.zeros(s, _F32) for s in _GRAD_SHAPES),
    )
    if ray_grads:
        init = init + (jnp.zeros((3, R), _F32), jnp.zeros((3, R), _F32))
        _, _, accs, do_acc, dd_acc = jax.lax.fori_loop(0, n_samples, body, init)
    else:
        _, _, accs = jax.lax.fori_loop(0, n_samples, body, init)

    grad_refs = (dw0_ref, db0_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                 dw3_ref, db3_ref, dw4_ref, db4_ref, dcw0_ref, dcw1_ref,
                 dcw2_ref)

    @pl.when(pid == 0)
    def _init():
        for ref, acc in zip(grad_refs, accs):
            ref[...] = acc

    @pl.when(pid != 0)
    def _accumulate():
        for ref, acc in zip(grad_refs, accs):
            ref[...] = ref[...] + acc

    if ray_grads:
        do_ref[0] = do_acc
        dd_ref[0] = dd_acc


def _prep(params, cfg, origins, dirs, ts):
    """Deltas + aabb box + packed weights (pure, jit-safe)."""
    R = dirs.shape[0]
    deltas = jnp.concatenate(
        [ts[:, 1:] - ts[:, :-1], jnp.full((R, 1), 1e2, _F32)], axis=1
    )
    box = jnp.stack(
        [jnp.asarray(cfg.aabb_min, _F32), jnp.asarray(cfg.aabb_max, _F32)],
        axis=1,
    )
    return deltas, box, _pad_params(params, cfg)


def _pad_rays(arrs, n_rays, block_rays, fill):
    """Pad axis 0 (rays) to a block multiple. Padded rays get ts=1e6 (far
    outside the aabb -> zero density -> exact zero outputs/grads)."""
    r_pad = -n_rays % block_rays
    if r_pad == 0:
        return arrs, n_rays
    out = []
    for a, f in zip(arrs, fill):
        pad_shape = (r_pad,) + a.shape[1:]
        out.append(jnp.concatenate([a, jnp.full(pad_shape, f, a.dtype)]))
    return out, n_rays + r_pad


def _ray_specs(S, block_rays):
    def spec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    ray3 = lambda i: (0, 0, i)
    row2 = lambda i: (0, i)
    rep2 = lambda i: (0, 0)
    base = [
        spec((1, 3, block_rays), ray3),  # o
        spec((1, 3, block_rays), ray3),  # d
        spec((1, S, block_rays), ray3),  # ts
        spec((1, S, block_rays), ray3),  # deltas
        spec((3, 2), rep2),              # field aabb
    ]
    return spec, base, ray3, row2, rep2


@functools.partial(
    jax.jit, static_argnames=("cfg", "min_transmittance", "block_rays",
                              "interpret")
)
def density_weights_fused(
    params, cfg: NGPConfig, origins, dirs, ts,
    min_transmittance: float,
    block_rays: int = 1024, interpret: bool | None = None,
):
    """Coarse-pass composite weights (R, S) for hierarchical resampling.
    origins/dirs (R, 3); ts (R, S) sorted. Forward-only."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_rays, S = ts.shape
    block_rays = min(block_rays, max(128, n_rays))
    origins = origins.astype(_F32)
    dirs = dirs.astype(_F32)
    ts = ts.astype(_F32)
    deltas, box, p = _prep(params, cfg, origins, dirs, ts)
    (o, d, t, dl), R = _pad_rays(
        [origins, dirs, ts, deltas], n_rays, block_rays, [0.0, 1.0, 1e6, 1e2]
    )
    spec, in_specs, ray3, _, rep2 = _ray_specs(S, block_rays)
    in_specs += [spec(p[k].shape, rep2) for k in _WEIGHT_NAMES[:10]]
    out = pl.pallas_call(
        functools.partial(
            _density_weights_kernel, n_samples=S,
            min_transmittance=min_transmittance,
        ),
        grid=(R // block_rays,),
        in_specs=in_specs,
        out_specs=[spec((1, S, block_rays), ray3)],
        out_shape=[jax.ShapeDtypeStruct((1, S, R), _F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=bool(interpret),
    )(
        o.T[None], d.T[None], t.T[None], dl.T[None], box,
        *[p[k] for k in _WEIGHT_NAMES[:10]],
    )[0]
    return out[0].T[:n_rays]  # (R, S)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5, 6, 7, 8))
def render_train_fused(
    params, cfg: NGPConfig, origins, dirs, ts,
    min_transmittance: float = 1e-4,
    block_rays: int = 1024, interpret: bool | None = None,
    need_ray_grads: bool = True,
):
    """Differentiable fused training render.

    origins/dirs (R, 3) world (dirs z-normalized, NOT unit); ts (R, S)
    sorted sample positions (constants in backward — d ts == 0). Returns
    dict rgb (R, 3) premultiplied linear, alpha (R,), depth (R,).

    need_ray_grads=False (extrinsics frozen) skips the dL/d(origins,dirs)
    chain in the backward kernel — the w0^T input-grad matmul and a full
    sin/cos re-evaluation per sample — and returns zero cotangents for
    origins/dirs. Parameter gradients are bit-identical either way."""
    out, _ = _train_fwd(params, cfg, origins, dirs, ts, min_transmittance,
                        block_rays, interpret, need_ray_grads)
    return out


def _train_fwd(params, cfg, origins, dirs, ts, min_transmittance,
               block_rays, interpret, need_ray_grads=True):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_rays, S = ts.shape
    block_rays = min(block_rays, max(128, n_rays))
    origins = origins.astype(_F32)
    dirs = dirs.astype(_F32)
    ts = ts.astype(_F32)
    deltas, box, p = _prep(params, cfg, origins, dirs, ts)
    (o, d, t, dl), R = _pad_rays(
        [origins, dirs, ts, deltas], n_rays, block_rays, [0.0, 1.0, 1e6, 1e2]
    )
    spec, in_specs, ray3, row2, rep2 = _ray_specs(S, block_rays)
    in_specs += [spec(p[k].shape, rep2) for k in _WEIGHT_NAMES]
    rgb, alpha, depth = pl.pallas_call(
        functools.partial(
            _train_fwd_kernel, n_samples=S,
            min_transmittance=min_transmittance,
        ),
        grid=(R // block_rays,),
        in_specs=in_specs,
        out_specs=[
            spec((1, 3, block_rays), ray3),
            spec((1, block_rays), row2),
            spec((1, block_rays), row2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 3, R), _F32),
            jax.ShapeDtypeStruct((1, R), _F32),
            jax.ShapeDtypeStruct((1, R), _F32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=bool(interpret),
    )(
        o.T[None], d.T[None], t.T[None], dl.T[None], box,
        *[p[k] for k in _WEIGHT_NAMES],
    )
    out = {
        "rgb": rgb[0].T[:n_rays],
        "alpha": alpha[0][:n_rays],
        "depth": depth[0][:n_rays],
    }
    res = (params, origins, dirs, ts, out["rgb"], out["alpha"], out["depth"])
    return out, res


def _train_bwd(cfg, min_transmittance, block_rays, interpret, need_ray_grads,
               res, cot):
    params, origins, dirs, ts, C, A_out, D = res
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_rays, S = ts.shape
    block_rays = min(block_rays, max(128, n_rays))
    deltas, box, p = _prep(params, cfg, origins, dirs, ts)
    dC = cot["rgb"].astype(_F32)  # (R, 3)
    dA_cot = cot["alpha"].astype(_F32)[:, None]  # (R, 1)
    dD = cot["depth"].astype(_F32)[:, None]
    (o, d, t, dl, dCp, dAp, dDp, Cp, Ap, Dp), R = _pad_rays(
        [origins, dirs, ts, deltas, dC, dA_cot, dD, C, A_out[:, None],
         D[:, None]],
        n_rays, block_rays,
        [0.0, 1.0, 1e6, 1e2, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    )
    spec, in_specs, ray3, row2, rep2 = _ray_specs(S, block_rays)
    in_specs += [spec(p[k].shape, rep2) for k in _WEIGHT_NAMES]
    in_specs += [
        spec((1, 3, block_rays), ray3),  # dC
        spec((1, block_rays), row2),     # dA
        spec((1, block_rays), row2),     # dD
        spec((1, 3, block_rays), ray3),  # C
        spec((1, block_rays), row2),     # A
        spec((1, block_rays), row2),     # D
    ]
    out_specs = [spec(s, rep2) for s in _GRAD_SHAPES]
    out_shape = [jax.ShapeDtypeStruct(s, _F32) for s in _GRAD_SHAPES]
    if need_ray_grads:
        out_specs += [
            spec((1, 3, block_rays), ray3),
            spec((1, 3, block_rays), ray3),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((1, 3, R), _F32),
            jax.ShapeDtypeStruct((1, 3, R), _F32),
        ]
    outs = pl.pallas_call(
        functools.partial(
            _train_bwd_kernel, n_samples=S,
            min_transmittance=min_transmittance,
            ray_grads=bool(need_ray_grads),
        ),
        grid=(R // block_rays,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # Sequential grid: weight-grad outputs revisit the same block
            # and accumulate across ray blocks.
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=bool(interpret),
    )(
        o.T[None], d.T[None], t.T[None], dl.T[None], box,
        *[p[k] for k in _WEIGHT_NAMES],
        dCp.T[None], dAp.T, dDp.T, Cp.T[None], Ap.T, Dp.T,
    )
    if need_ray_grads:
        (dw0, db0, dw1, db1, dw2, db2, dw3, db3, dw4, db4, dcw0, dcw1, dcw2,
         do_p, dd_p) = outs
    else:
        (dw0, db0, dw1, db1, dw2, db2, dw3, db3, dw4, db4, dcw0, dcw1,
         dcw2) = outs
    enc_dim = cfg.posenc_dim  # 63
    dparams = {
        "trunk_w0": dw0[:, :enc_dim].T,
        "trunk_b0": db0[:, 0],
        "trunk_w1": dw1.T,
        "trunk_b1": db1[:, 0],
        "trunk_w2": dw2.T,
        "trunk_b2": db2[:, 0],
        # w3 input rows: [trunk 256 | enc 63 | zero pad col].
        "trunk_w3": jnp.concatenate(
            [dw3[:, :256], dw3[:, 256:256 + enc_dim]], axis=1
        ).T,
        "trunk_b3": db3[:, 0],
        "trunk_w4": dw4.T,
        "trunk_b4": db4[:, 0],
        "color_w0": dcw0.T,
        "color_w1": dcw1.T,
        "color_w2": dcw2[:3].T,
    }
    if need_ray_grads:
        d_origins = do_p[0].T[:n_rays]
        d_dirs = dd_p[0].T[:n_rays]
    else:
        d_origins = jnp.zeros_like(origins)
        d_dirs = jnp.zeros_like(dirs)
    return dparams, d_origins, d_dirs, jnp.zeros_like(ts)


render_train_fused.defvjp(_train_fwd, _train_bwd)


def supports_training(cfg: NGPConfig) -> bool:
    """Fused-training coverage: the mlp field at its flagship architecture
    (same conditions as the render kernel, minus the n_fine gate)."""
    from dream2real_tpu.nerf.march_kernel import supports
    from dream2real_tpu.nerf.render import RenderSettings

    return supports(cfg, RenderSettings(n_fine=0))


def render_rays_train(
    params, cfg: NGPConfig, origins, dirs, settings, key=None,
    block_rays: int = 2048, interpret: bool | None = None,
    need_ray_grads: bool = True,
):
    """Fused-kernel equivalent of render.render_rays for TRAINING batches
    (flat (R, 3) rays, full-field march box, hierarchical sampling).

    Sampling math: with D2R_FUSED_SAMPLER=0 the XLA path (jittered coarse
    ts, stop-gradient inverse-CDF fine resampling, sorted union) is
    identical to render.render_rays:150-178; only the field evaluations
    move into the pallas kernels. The DEFAULT path (D2R_FUSED_SAMPLER=1)
    instead runs the in-kernel defensive-mixture sampler, which draws nc+nf
    fine positions from a 0.5-uniform-mixed CDF and discards the coarse
    union — a deliberately different sample distribution (rationale and
    quality gates in the comment block below / PERF.md). Returns dict
    rgb/alpha/depth (no per-sample weights/ts: the training loss doesn't
    consume them).
    """
    from dream2real_tpu.nerf.render import ray_aabb, sample_pdf

    origins = origins.astype(_F32)
    dirs = dirs.astype(_F32)
    t0, t1 = ray_aabb(origins, dirs, cfg.aabb_min, cfg.aabb_max)
    t0 = jnp.maximum(t0, settings.near)
    t1 = jnp.minimum(t1, settings.far)
    valid = t1 > t0
    t1 = jnp.where(valid, t1, t0 + 1e-3)

    nc = settings.n_coarse
    frac = (jnp.arange(nc) + 0.5) / nc
    if key is not None:
        key, sub = jax.random.split(key)
        jitter = (jax.random.uniform(sub, origins.shape[:-1] + (nc,)) - 0.5) / nc
        frac = frac + jitter
    ts_c = t0[..., None] + (t1 - t0)[..., None] * frac  # (R, nc)

    import os as _os

    fused_sampler = (
        key is not None and _os.environ.get("D2R_FUSED_SAMPLER", "1") == "1"
    )
    if settings.n_fine > 0 and fused_sampler:
        # One kernel: coarse density + defensive-mixture inverse-CDF draws,
        # SORTED by construction (order-statistics trick) — replaces the
        # XLA sample_pdf + union sort (~1.5 ms/step at b=4096). Draws
        # nc+nf positions so the main pass sees the same sample budget as
        # the union path. Entirely stop-gradient, like the XLA resampler.
        n_draw = settings.n_coarse + settings.n_fine
        mix = float(_os.environ.get("D2R_SAMPLER_MIX", "0.5"))
        key, sub = jax.random.split(key)
        exp_draws = -jnp.log(
            jax.random.uniform(
                sub, origins.shape[:-1] + (n_draw + 1,),
                minval=1e-12, maxval=1.0,
            )
        )
        ts_all = density_sample_fused(
            jax.lax.stop_gradient(params), cfg,
            jax.lax.stop_gradient(origins), jax.lax.stop_gradient(dirs),
            jax.lax.stop_gradient(ts_c), exp_draws,
            n_fine=n_draw, min_transmittance=settings.min_transmittance,
            mix=mix, block_rays=block_rays, interpret=interpret,
        )
    elif settings.n_fine > 0:
        # The whole resampler is stop-gradient (the XLA path's ts_c->ts_f
        # gradient path is one of the documented dropped terms).
        w_c = density_weights_fused(
            jax.lax.stop_gradient(params), cfg,
            jax.lax.stop_gradient(origins), jax.lax.stop_gradient(dirs),
            jax.lax.stop_gradient(ts_c),
            settings.min_transmittance, block_rays=block_rays,
            interpret=interpret,
        )
        sub = None
        if key is not None:
            key, sub = jax.random.split(key)
        ts_f = sample_pdf(
            ts_c, jax.lax.stop_gradient(w_c), settings.n_fine, sub
        )
        ts_all = jnp.sort(jnp.concatenate([ts_c, ts_f], axis=-1), axis=-1)
    else:
        ts_all = ts_c

    out = render_train_fused(
        params, cfg, origins, dirs, ts_all, settings.min_transmittance,
        block_rays, interpret, bool(need_ray_grads),
    )
    return {
        "rgb": jnp.where(valid[:, None], out["rgb"], 0.0),
        "alpha": jnp.where(valid, out["alpha"], 0.0),
        "depth": jnp.where(valid, out["depth"], 0.0),
    }


def _density_sampler_kernel(
    o_ref, d_ref, ts_ref, dl_ref, exp_ref, box_ref,
    w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    w4_ref, b4_ref,
    tsf_ref,
    w_scr,
    *, n_coarse: int, n_fine: int, min_transmittance: float, mix: float,
):
    """Coarse density pass + IN-KERNEL inverse-CDF resampling.

    Replaces the XLA sample_pdf + union sort (~1.5 ms/step at b=4096):
    computes the coarse composite weights like _density_weights_kernel,
    builds the per-ray CDF over a defensive mixture proposal
    (w + mix/(1-mix) * mean(w) per bin — ~`mix` of the samples land
    uniformly, so empty space keeps alpha supervision), and draws n_fine
    SORTED positions via the order-statistics trick: normalised prefix
    sums of iid exponentials are sorted U(0,1) draws with exactly the iid
    ensemble's marginals — no sort needed. exp_ref carries pre-drawn
    -log(uniform) rows ((n_fine+1), R). Mosaic notes: per-sample weight
    rows go to a VMEM scratch ref (value dynamic-update is not lowerable)
    and the CDF prefix-sum is a lower-triangular matmul.
    """
    o = o_ref[0]
    d = d_ref[0]
    R = d.shape[1]
    dn = jnp.sqrt(jnp.sum(d * d, axis=0, keepdims=True))
    a3, b3, A, B, lo_f, hi_f, _ = _enc_affine(o, d, box_ref)
    w0, b0 = w0_ref[:], b0_ref[:]
    w1, b1 = w1_ref[:], b1_ref[:]
    w2, b2 = w2_ref[:], b2_ref[:]
    w3, b3b = w3_ref[:], b3_ref[:]
    w4, b4b = w4_ref[:], b4_ref[:]

    def body(s, trans):
        ts_row = ts_ref[0, pl.ds(s, 1)]
        dl_row = dl_ref[0, pl.ds(s, 1)]
        enc, _, inside = _sample_geom(o, d, ts_row, a3, b3, A, B, lo_f, hi_f)
        h = jnp.dot(w0, enc, preferred_element_type=_F32) + b0
        h = jnp.maximum(h, 0.0).astype(_BF16)
        h = jnp.dot(w1, h, preferred_element_type=_F32) + b1
        h = jnp.maximum(h, 0.0).astype(_BF16)
        h = jnp.dot(w2, h, preferred_element_type=_F32) + b2
        h = jnp.maximum(h, 0.0).astype(_BF16)
        h = jnp.concatenate([h, enc], 0)
        h = jnp.dot(w3, h, preferred_element_type=_F32) + b3b
        h = jnp.maximum(h, 0.0).astype(_BF16)
        x = (jnp.dot(w4[0:8], h, preferred_element_type=_F32) + b4b[0:8])
        x = x.astype(_BF16)
        sigma = jnp.exp(jnp.clip(x[0:1].astype(_F32), -15.0, 15.0))
        sigma = jnp.where(inside, sigma, 0.0)
        a = 1.0 - jnp.exp(-sigma * dl_row * dn)
        w = jnp.where(trans < min_transmittance, 0.0, a * trans)
        w_scr[pl.ds(s, 1)] = w
        return trans * (1.0 - a + 1e-10)

    jax.lax.fori_loop(0, n_coarse, body, jnp.ones((1, R), _F32))

    # Defensive-mixture proposal + CDF over the coarse bins (sample_pdf's
    # w + 1e-5 floor replaced by a proportional floor so coverage does not
    # vanish as the field converges).
    ts_c = ts_ref[0]  # (S_c, R)
    w_rows = w_scr[...]
    w_mean = jnp.sum(w_rows, axis=0, keepdims=True) / n_coarse
    w_def = w_rows + (mix / (1.0 - mix)) * w_mean + 1e-8
    total = jnp.sum(w_def, axis=0, keepdims=True)
    pdf = w_def / total
    # Inclusive prefix sum along sublanes as a lower-triangular matmul.
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (n_coarse, n_coarse), 0)
        >= jax.lax.broadcasted_iota(jnp.int32, (n_coarse, n_coarse), 1)
    ).astype(_F32)
    cdf = jnp.dot(tri, pdf, preferred_element_type=_F32)  # (S_c, R)
    # Bin edges: sample_pdf's mids construction (render.py:60-62).
    mids = 0.5 * (ts_c[1:] + ts_c[:-1])
    bin_lo = jnp.concatenate([ts_c[0:1], mids], 0)  # (S_c, R)
    bin_hi = jnp.concatenate([mids, ts_c[-1:]], 0)
    cdf_lo = jnp.concatenate([jnp.zeros((1, R), _F32), cdf[:-1]], 0)
    last_row = (
        jax.lax.broadcasted_iota(jnp.int32, (n_coarse, R), 0) == n_coarse - 1
    ).astype(_F32)

    s_total = jnp.sum(exp_ref[0], axis=(0,), keepdims=False)[None, :]  # (1,R)

    def draw(i, s_prefix):
        s_prefix = s_prefix + exp_ref[0, pl.ds(i, 1)]
        u = s_prefix / s_total  # (1, R), ascending in i
        sel = ((cdf_lo <= u) & (u < cdf)).astype(_F32)  # one-hot (S_c, R)
        # u ~= 1 edge: nothing selected -> clamp into the last bin.
        miss = 1.0 - jnp.sum(sel, axis=0, keepdims=True)
        sel = sel + last_row * miss
        lo = jnp.sum(sel * bin_lo, axis=0, keepdims=True)
        hi = jnp.sum(sel * bin_hi, axis=0, keepdims=True)
        clo = jnp.sum(sel * cdf_lo, axis=0, keepdims=True)
        chi = jnp.sum(sel * cdf, axis=0, keepdims=True)
        denom = jnp.where(chi - clo < 1e-8, 1.0, chi - clo)
        tsf_ref[0, pl.ds(i, 1)] = lo + (u - clo) / denom * (hi - lo)
        return s_prefix

    jax.lax.fori_loop(0, n_fine, draw, jnp.zeros((1, R), _F32))


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_fine", "min_transmittance", "mix",
                              "block_rays", "interpret")
)
def density_sample_fused(
    params, cfg: NGPConfig, origins, dirs, ts_c, exp_draws,
    n_fine: int, min_transmittance: float, mix: float = 0.25,
    block_rays: int = 1024, interpret: bool | None = None,
):
    """Coarse pass + importance resampling in ONE kernel. Returns SORTED
    fine sample positions (R, n_fine). exp_draws: (R, n_fine + 1) iid
    Exp(1) draws (= -log U)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_rays, S = ts_c.shape
    block_rays = min(block_rays, max(128, n_rays))
    origins = origins.astype(_F32)
    dirs = dirs.astype(_F32)
    ts_c = ts_c.astype(_F32)
    deltas, box, p = _prep(params, cfg, origins, dirs, ts_c)
    (o, d, t, dl, e), R = _pad_rays(
        [origins, dirs, ts_c, deltas, exp_draws.astype(_F32)],
        n_rays, block_rays, [0.0, 1.0, 1e6, 1e2, 1.0],
    )
    spec, in_specs, ray3, _, rep2 = _ray_specs(S, block_rays)
    in_specs.insert(4, spec((1, n_fine + 1, block_rays), ray3))  # exp draws
    in_specs += [spec(p[k].shape, rep2) for k in _WEIGHT_NAMES[:10]]
    out = pl.pallas_call(
        functools.partial(
            _density_sampler_kernel, n_coarse=S, n_fine=n_fine,
            min_transmittance=min_transmittance, mix=mix,
        ),
        grid=(R // block_rays,),
        in_specs=in_specs,
        out_specs=[spec((1, n_fine, block_rays), ray3)],
        out_shape=[jax.ShapeDtypeStruct((1, n_fine, R), _F32)],
        scratch_shapes=[pltpu.VMEM((S, block_rays), _F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=bool(interpret),
    )(
        o.T[None], d.T[None], t.T[None], dl.T[None], e.T[None], box,
        *[p[k] for k in _WEIGHT_NAMES[:10]],
    )[0]
    return out[0].T[:n_rays]  # (R, n_fine)
