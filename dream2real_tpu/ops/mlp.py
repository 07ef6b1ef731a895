"""Fused LN2 + fc1 + QuickGELU + fc2 + residual pallas kernel for the CLIP
transformer MLP sub-block.

Why: XLA evaluates the two MLP matmuls as separate HLOs, so the (T, 4W)
QuickGELU intermediate round-trips HBM once per layer per image (~4.8 MB
bf16 each way at ViT-L scoring shape), and the LN/residual elementwise ops
each re-stream the (T, W) residual. One pallas cell per image keeps all of
it in VMEM: x is read once and the full sub-block x + fc2(gelu(fc1(LN(x))))
is written once. Weights use constant block indices so Mosaic keeps them
VMEM-resident across the image grid (fc1+fc2 = 16 MB bf16 at W=1024).

Numerics mirror clip/model.py::_mlp_block exactly: f32 LN (eps 1e-5), bf16
matmul inputs with f32 accumulation, bf16 rounding BEFORE the QuickGELU
(documented there), sigmoid argument in f32. Parity-tested through _block
in tests/test_attention.py.

Reference counterpart: the torch CLIP MLP the reference scores with
(clip_scoring.py:150-151 -> openai CLIP VisionTransformer residual block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, b_ref, o_ref):
    x = x_ref[0]
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    xn = ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * g_ref[0]
          + b_ref[0]).astype(x.dtype)
    h = jax.lax.dot_general(
        xn, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = (h + b1_ref[:]).astype(x.dtype)  # bf16 BEFORE the activation
    h = h * jax.nn.sigmoid(1.702 * h.astype(jnp.float32)).astype(x.dtype)
    out = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:]
    o_ref[0] = (x32 + out).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mlp_padded(x, w1, b1, w2, b2, g, b, interpret: bool):
    B, T, W = x.shape
    H = w1.shape[1]
    xspec = pl.BlockSpec((1, T, W), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda bb: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _mlp_kernel,
        grid=(B,),
        in_specs=[xspec, const((W, H)), const((1, H)), const((H, W)),
                  const((1, W)), const((1, W)), const((1, W))],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B, T, W), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * T * W * H,
            bytes_accessed=B * T * 2 * W * x.dtype.itemsize + 4 * W * H,
            transcendentals=B * T * H,
        ),
        interpret=interpret,
    )(x, w1, b1[None], w2, b2[None], g[None], b[None])


def mlp_ln(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    ln_g: jnp.ndarray,
    ln_b: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused MLP sub-block: returns x + fc2(quickgelu(fc1(LN(x)))).

    x: (B, T, W) residual stream (bf16); w1 (W, 4W) / w2 (4W, W) bf16;
    b1/b2/ln_g/ln_b f32. Gated by D2R_MLP_FUSED in clip/model.py::_block
    (default off until measured on TPU); composes with any
    D2R_ATTN_FUSED_LN attention mode and applies to the causal text tower
    too (the MLP is per-token)."""
    import os

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, W = x.shape
    t_pad = -T % 8
    if t_pad:
        x = jnp.pad(x, ((0, 0), (0, t_pad), (0, 0)))
    out = _mlp_padded(
        x, w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32),
        ln_g.astype(jnp.float32), ln_b.astype(jnp.float32),
        bool(interpret),
    )
    return out[:, :T] if t_pad else out
