"""Pallas TPU attention kernel for the CLIP towers.

Why not XLA einsum attention: the ViT-L/14-336 vision tower runs T=577
tokens with head_dim=64. The unfused path materialises the (B, H, T, T)
f32 logits in HBM (B=32: ~680 MB written + read back per layer, x24
layers) — the per-pose CLIP cost is dominated by that softmax round-trip,
not the matmul FLOPs. This kernel keeps the whole (T, T) scores tile of
one (batch, head) cell in VMEM: QK^T -> masked f32 softmax -> PV without
touching HBM in between.

Why full-tile instead of online-softmax flash attention: at T<=640 the
f32 scores tile is 640*640*4 = 1.6 MB — it FITS in VMEM, so the flash
running-statistics machinery (guide §2-4) is pure overhead. Flash tiling
matters when T^2 doesn't fit; here the win is just "never spill scores".

Sequence padding: T is padded up to a multiple of 128 (the MXU/VPU lane
tile) with key positions >= n_valid masked to -0.7*f32_max before the
softmax (NaN-safe mask value, guide §5). Padded *query* rows produce
garbage rows that the caller slices off; they never contaminate valid
rows because attention only mixes information across the key axis.

Reference parity: replaces the torch scaled_dot_product_attention inside
HF CLIPModel (reference clip_scoring.py:150-151 loads it); numerics match
the XLA path to bf16 tolerance (tests/test_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int, causal: bool):
    # Refs are (1, 1, T, D) blocks for one (batch, head) grid cell.
    q = q_ref[0, 0]  # (T, D) bf16, pre-scaled by D**-0.5
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    t = q.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, T) f32, stays in VMEM
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    mask = col < n_valid
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        mask = mask & (col <= row)
    s = jnp.where(mask, s, _MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_valid", "causal", "interpret"))
def _attention_padded(q, k, v, n_valid: int, causal: bool, interpret: bool):
    B, H, T, D = q.shape
    spec = pl.BlockSpec(
        (1, 1, T, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_attn_kernel, n_valid=n_valid, causal=causal),
        grid=(B, H),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * T * D,
            bytes_accessed=4 * B * H * T * D * q.dtype.itemsize,
            transcendentals=B * H * T * T,
        ),
        interpret=interpret,
    )(q, k, v)


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Multi-head attention, (B, H, T, D) -> (B, H, T, D).

    Softmax scaling (D**-0.5) is applied in here. T and D are padded up to
    the 128-lane tile internally; the output is sliced back to T.
    """
    B, H, T, D = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t_pad = -T % 128
    q = q * (D**-0.5)
    if t_pad:
        pad = ((0, 0), (0, 0), (0, t_pad), (0, 0))
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    out = _attention_padded(q, k, v, n_valid=T, causal=causal, interpret=bool(interpret))
    return out[:, :, :T] if t_pad else out
