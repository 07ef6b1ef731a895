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


def _attn_kernel2(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_heads: int):
    """Per-image cell: loop over heads with lean softmax.

    (T, T) passes per head: QK^T write (MXU) -> fused exp((s + bias) - m)
    read->write bf16 (one VPU pass; the key-pad mask is a broadcast bias row,
    not a (T, T) where) -> PV read (MXU). max/sum are VPU reduces; the 1/l
    normalisation happens on the (T, D) output, not the (T, T) weights. The
    per-head chains are independent so Mosaic can overlap head h's VPU
    softmax with head h+1's MXU matmuls."""

    bias = bias_ref[:]  # (1, T) 0 / -big at key pads

    def one_head(h, carry):
        q = q_ref[0, h]  # (T, D) bf16, pre-scaled
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (T, T) f32 in VMEM
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m).astype(q.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / l).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, n_heads, one_head, 0)


@functools.partial(jax.jit, static_argnames=("n_valid", "interpret"))
def _attention_padded2(q, k, v, n_valid: int, interpret: bool):
    B, H, Tq, D = q.shape
    T = k.shape[2]
    bias = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) < n_valid, 0.0, _MASK_VALUE
    ).astype(jnp.float32)
    qspec = pl.BlockSpec((1, H, Tq, D), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((1, H, T, D), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel2, n_heads=H),
        grid=(B,),
        in_specs=[qspec, spec, spec,
                  pl.BlockSpec((1, T), lambda b: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tq * T * D,
            bytes_accessed=2 * B * H * (T + Tq) * D * q.dtype.itemsize,
            transcendentals=B * H * Tq * T,
        ),
        interpret=interpret,
    )(q, k, v, bias)


def _attn_kernel3(qkv_ref, bias_ref, o_ref, *, n_heads: int, hd: int,
                  maxsub: bool):
    """Projection-layout cell: qkv (T, 3W) in, attention out (T, W).

    Why this layout wins 2x over the (B, H, T, 64) kernel above (measured,
    experiments/bench_attention.py): head_dim=64 on the 128-lane axis leaves
    every q/k/v VMEM tile half-empty, so the op is DMA-bound at ~15% of HBM
    bandwidth regardless of what the kernel computes. Streaming the qkv
    projection's natural (T, 3W) output keeps tiles full; the per-head
    (T, 64) column slices are cheap in-VMEM relayouts.

    maxsub=False replaces the per-row max-subtraction reduce with a fused
    constant clamp at 70: softmax is shift-invariant, so results are
    IDENTICAL unless a logit exceeds 70 (f32 exp overflows at ~88; CLIP
    attention logits are O(10) — and the clamp still prevents inf). One
    fewer (T, T) VPU pass per head: 0.84 -> 0.75 ms/op at the scoring shape.
    """
    qkv = qkv_ref[0]                    # (T, 3W) bf16
    bias = bias_ref[:]                  # (1, T) 0 / -1e9 at key pads
    W = n_heads * hd
    scale = hd**-0.5
    for h in range(n_heads):
        q = qkv[:, h * hd:(h + 1) * hd] * scale
        k = qkv[:, W + h * hd: W + (h + 1) * hd]
        v = qkv[:, 2 * W + h * hd: 2 * W + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) + bias                        # (T, T) f32 in VMEM
        if maxsub:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m).astype(qkv.dtype)
        else:
            p = jnp.exp(jnp.minimum(s, 70.0) - 70.0).astype(qkv.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, :, h * hd:(h + 1) * hd] = (o / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_heads", "n_valid", "maxsub", "interpret")
)
def _mha_qkv_padded(qkv, n_heads: int, n_valid: int, maxsub: bool,
                    interpret: bool):
    B, T, W3 = qkv.shape
    W = W3 // 3
    bias = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) < n_valid, 0.0, -1e9
    ).astype(jnp.float32)
    spec = pl.BlockSpec((1, T, W3), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, T, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel3, n_heads=n_heads, hd=W // n_heads,
                          maxsub=maxsub),
        grid=(B,),
        in_specs=[spec,
                  pl.BlockSpec((1, T), lambda b: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, T, W), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * n_heads * T * T * (W // n_heads),
            bytes_accessed=B * T * 4 * W * qkv.dtype.itemsize,
            transcendentals=B * n_heads * T * T,
        ),
        interpret=interpret,
    )(qkv, bias)


def _attn_kernel4(x_ref, wqkv_ref, bqkv_ref, g_ref, b_ref, bias_ref, o_ref,
                  *, n_heads: int, hd: int, maxsub: bool):
    """LN1 + qkv projection + attention fused in one cell: x (T, W) in,
    attention output (T, W) out. Wqkv (W, 3W) has a constant block index so
    it is DMA'd into VMEM once and reused across the batch grid; the
    (T, 3W) qkv never touches HBM.

    (A round-3 variant also folded the out-projection + residual in-kernel;
    it measured SLOWER end-to-end — 217.0 vs 222.9 poses/s, r3 session log —
    because the per-image (T, W) x (W, W) matmul starves the MXU vs XLA's
    batched (B*T, W) one. Deleted in round 4.)"""
    x = x_ref[0]
    W = n_heads * hd
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    xn = ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * g_ref[0]
          + b_ref[0]).astype(x.dtype)
    qkv = (jax.lax.dot_general(
        xn, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:]).astype(x.dtype)
    bias = bias_ref[:]
    scale = hd**-0.5
    for h in range(n_heads):
        q = qkv[:, h * hd:(h + 1) * hd] * scale
        k = qkv[:, W + h * hd: W + (h + 1) * hd]
        v = qkv[:, 2 * W + h * hd: 2 * W + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) + bias
        if maxsub:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m).astype(x.dtype)
        else:
            p = jnp.exp(jnp.minimum(s, 70.0) - 70.0).astype(x.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, :, h * hd:(h + 1) * hd] = (o / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_heads", "n_valid", "maxsub", "interpret")
)
def _mha_ln_qkv_padded(x, wqkv, bqkv, g, b, n_heads: int,
                       n_valid: int, maxsub: bool, interpret: bool):
    B, T, W = x.shape
    bias = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) < n_valid, 0.0, -1e9
    ).astype(jnp.float32)
    xspec = pl.BlockSpec((1, T, W), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda bb: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    in_specs = [xspec, const(wqkv.shape), const((1, 3 * W)),
                const((1, W)), const((1, W)), const((1, T))]
    args = [x, wqkv, bqkv[None], g[None], b[None], bias]
    return pl.pallas_call(
        functools.partial(_attn_kernel4, n_heads=n_heads, hd=W // n_heads,
                          maxsub=maxsub),
        grid=(B,),
        in_specs=in_specs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B, T, W), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * W * 3 * W + 4 * B * n_heads * T * T
            * (W // n_heads),
            bytes_accessed=B * T * 2 * W * x.dtype.itemsize + 3 * W * W * 2,
            transcendentals=B * n_heads * T * T,
        ),
        interpret=interpret,
    )(*args)


def mha_ln_qkv(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    ln_g: jnp.ndarray,
    ln_b: jnp.ndarray,
    n_heads: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused LN1 + qkv projection + bidirectional attention.

    x: (B, T, W) residual stream; wqkv (W, 3W) bf16; bqkv (3W,) f32;
    ln_g/ln_b (W,) f32. Returns (B, T, W) pre-out-projection attention
    output. Gated by D2R_ATTN_FUSED_LN=1 (see model._block); falls back to
    the split LN + matmul + mha_qkv pipeline when off."""
    import os

    B, T, W = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    maxsub = os.environ.get("D2R_ATTN_MAXSUB", "0") == "1"
    t_pad = -T % 8
    if t_pad:
        x = jnp.pad(x, ((0, 0), (0, t_pad), (0, 0)))
    out = _mha_ln_qkv_padded(
        x, wqkv, bqkv.astype(jnp.float32),
        ln_g.astype(jnp.float32), ln_b.astype(jnp.float32),
        n_heads, n_valid=T, maxsub=maxsub, interpret=bool(interpret),
    )
    return out[:, :T] if t_pad else out


def mha_qkv(
    qkv: jnp.ndarray,
    n_heads: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Bidirectional multi-head attention on projection-layout input.

    qkv: (B, T, 3W) — the qkv linear's output (bias added), heads packed as
    [q_0..q_H | k_0..k_H | v_0..v_H] along the last axis (HF CLIP layout
    after the standard reshape). Returns (B, T, W): per-token attention
    output ready for the out-projection. T is padded to the 8-sublane tile
    internally; padded keys are bias-masked.

    Softmax scaling (head_dim**-0.5) is applied inside. D2R_ATTN_MAXSUB=1
    restores exact per-row max-subtraction (see _attn_kernel3 — results
    differ only if logits exceed 70).
    """
    import os

    B, T, W3 = qkv.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    maxsub = os.environ.get("D2R_ATTN_MAXSUB", "0") == "1"
    t_pad = -T % 8
    if t_pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, t_pad), (0, 0)))
    out = _mha_qkv_padded(
        qkv, n_heads, n_valid=T, maxsub=maxsub, interpret=bool(interpret)
    )
    return out[:, :T] if t_pad else out


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
    if causal:
        if t_pad:
            pad = ((0, 0), (0, 0), (0, t_pad), (0, 0))
            q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
        out = _attention_padded(
            q, k, v, n_valid=T, causal=True, interpret=bool(interpret)
        )
        return out[:, :, :T] if t_pad else out
    # Bidirectional: keys/values pad to the 128-lane tile (they form the
    # scores' lane dim); query rows only to the 8-sublane tile.
    tq_pad = -T % 8
    if t_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, tq_pad), (0, 0)))
        pad = ((0, 0), (0, 0), (0, t_pad), (0, 0))
        k, v = (jnp.pad(x, pad) for x in (k, v))
    out = _attention_padded2(q, k, v, n_valid=T, interpret=bool(interpret))
    return out[:, :, :T] if t_pad or tq_pad else out
