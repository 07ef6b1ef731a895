"""Standalone microbench for the CLIP attention kernel variants (real TPU).

Times the production pallas attention op (`ops/attention.py::mha`) against
experimental variants at the exact scoring shape (B=32, H=16, T=584, D=64,
bf16) to attribute the residual ~0.3 ms/pose of attention overhead
(PERF.md roofline). Usage: python experiments/bench_attention.py [reps]

Timing protocol per CLAUDE.md: block via D2H of an on-device reduction
(block_until_ready does not wait on axon); warm-up call first.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


# ---------------------------------------------------------------- variants

def _kernel_unrolled(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_heads):
    """v1: python-unrolled head loop (no fori_loop carry chain) — gives the
    Mosaic scheduler freedom to overlap head h's VPU softmax with head
    h+1's MXU matmuls."""
    bias = bias_ref[:]
    for h in range(n_heads):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m).astype(q.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / l).astype(o_ref.dtype)


def _kernel_pipelined(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_heads):
    """v3: explicit 2-stage software pipeline — issue head h+1's QK^T
    before head h's softmax/PV so MXU and VPU work interleave."""
    bias = bias_ref[:]

    def logits(h):
        s = jax.lax.dot_general(
            q_ref[0, h], k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return s + bias

    s_prev = logits(0)
    for h in range(n_heads):
        s_next = logits(h + 1) if h + 1 < n_heads else None
        m = jnp.max(s_prev, axis=-1, keepdims=True)
        p = jnp.exp(s_prev - m).astype(q_ref.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jnp.dot(p, v_ref[0, h], preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / l).astype(o_ref.dtype)
        s_prev = s_next


def _kernel_nomax(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_heads):
    """v2: skip the max-subtraction VPU pass. Safe only when |logits| stays
    far below f32 exp overflow (~88); CLIP post-LN logits are O(10-30) —
    numerics to be validated separately before production use. The key-pad
    bias must then be a finite negative (exp -> 0), not -0.7*f32max."""
    bias = bias_ref[:]
    for h in range(n_heads):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(s + bias).astype(q.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / l).astype(o_ref.dtype)


def _call(kernel, q, k, v, *, finite_bias=False):
    B, H, Tq, D = q.shape
    T = k.shape[2]
    mask_val = -60.0 if finite_bias else _MASK_VALUE
    bias = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) < Tq, 0.0, mask_val
    ).astype(jnp.float32)
    qspec = pl.BlockSpec((1, H, Tq, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((1, H, T, D), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kernel, n_heads=H),
        grid=(B,),
        in_specs=[qspec, spec, spec,
                  pl.BlockSpec((1, T), lambda b: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k, v, bias)


def _pad(q, k, v):
    B, H, T, D = q.shape
    t_pad = -T % 128
    tq_pad = -T % 8
    q = q * (D**-0.5)
    if t_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, tq_pad), (0, 0)))
        k, v = (jnp.pad(x, ((0, 0), (0, 0), (0, t_pad), (0, 0)))
                for x in (k, v))
    return q, k, v, T


def _mha_v1_unrolled(q, k, v):
    q, k, v, T = _pad(q, k, v)
    return _call(_kernel_unrolled, q, k, v)[:, :, :T]


def _mha_v2_nomax(q, k, v):
    q, k, v, T = _pad(q, k, v)
    return _call(_kernel_nomax, q, k, v, finite_bias=True)[:, :, :T]


def _mha_v3_pipelined(q, k, v):
    q, k, v, T = _pad(q, k, v)
    return _call(_kernel_pipelined, q, k, v)[:, :, :T]


def _kernel_fused_layout(qkv_ref, o_ref, *, n_heads, hd):
    """v8: per-image cell consumes the PROJECTION-LAYOUT qkv (T, 3W) block —
    full 128-lane tiles stream at full HBM bandwidth; per-head (T, 64)
    slices are cheap VMEM relayouts. Output back in (T, W) layout."""
    qkv = qkv_ref[0]                      # (T, 3W) bf16
    T = qkv.shape[0]
    W = n_heads * hd
    scale = hd**-0.5
    for h in range(n_heads):
        q = qkv[:, h * hd:(h + 1) * hd] * scale
        k = qkv[:, W + h * hd: W + (h + 1) * hd]
        v = qkv[:, 2 * W + h * hd: 2 * W + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                  # (T, T)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m).astype(qkv.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, :, h * hd:(h + 1) * hd] = (o / l).astype(o_ref.dtype)


def _kernel_fused_nomax(qkv_ref, o_ref, *, n_heads, hd):
    """v9: v8 layout + no max pass (constant clamp at 70 fused into the
    scale): one fewer (T, T) VPU reduce per head."""
    qkv = qkv_ref[0]
    T = qkv.shape[0]
    W = n_heads * hd
    scale = hd**-0.5
    for h in range(n_heads):
        q = qkv[:, h * hd:(h + 1) * hd] * scale
        k = qkv[:, W + h * hd: W + (h + 1) * hd]
        v = qkv[:, 2 * W + h * hd: 2 * W + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(jnp.minimum(s, 70.0) - 70.0).astype(qkv.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, :, h * hd:(h + 1) * hd] = (o / l).astype(o_ref.dtype)


def _kernel_fused_pipelined(qkv_ref, o_ref, *, n_heads, hd):
    """v10: v8 layout + explicit 2-stage head pipeline."""
    qkv = qkv_ref[0]
    W = n_heads * hd
    scale = hd**-0.5

    def logits(h):
        q = qkv[:, h * hd:(h + 1) * hd] * scale
        k = qkv[:, W + h * hd: W + (h + 1) * hd]
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    s_prev = logits(0)
    for h in range(n_heads):
        s_next = logits(h + 1) if h + 1 < n_heads else None
        v = qkv[:, 2 * W + h * hd: 2 * W + (h + 1) * hd]
        m = jnp.max(s_prev, axis=-1, keepdims=True)
        p = jnp.exp(s_prev - m).astype(qkv.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, :, h * hd:(h + 1) * hd] = (o / l).astype(o_ref.dtype)
        s_prev = s_next


def _kernel_fused_nomax_pipe(qkv_ref, o_ref, *, n_heads, hd):
    """v11: v9 (nomax) + v10 (2-stage head pipeline)."""
    qkv = qkv_ref[0]
    W = n_heads * hd
    scale = hd**-0.5

    def logits(h):
        q = qkv[:, h * hd:(h + 1) * hd] * scale
        k = qkv[:, W + h * hd: W + (h + 1) * hd]
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    s_prev = logits(0)
    for h in range(n_heads):
        s_next = logits(h + 1) if h + 1 < n_heads else None
        v = qkv[:, 2 * W + h * hd: 2 * W + (h + 1) * hd]
        p = jnp.exp(jnp.minimum(s_prev, 70.0) - 70.0).astype(qkv.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, :, h * hd:(h + 1) * hd] = (o / l).astype(o_ref.dtype)
        s_prev = s_next


def _mha_v8_projlayout(qkv, n_heads=16, kernel=_kernel_fused_layout):
    B, T, W3 = qkv.shape
    W = W3 // 3
    spec = pl.BlockSpec((1, T, W3), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, T, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kernel, n_heads=n_heads, hd=W // n_heads),
        grid=(B,),
        in_specs=[spec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, T, W), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qkv)


def _kernel_block_fused(x_ref, wqkv_ref, bqkv_ref, g_ref, b_ref, o_ref, *,
                        n_heads, hd):
    """v12: LN1 + qkv projection + attention in ONE kernel. x (T, W) in,
    attention output (T, W) out; Wqkv (W, 3W) VMEM-resident (constant index
    map -> DMA'd once, reused across grid cells). The (T, 3W) qkv never
    touches HBM."""
    x = x_ref[0]                                   # (T, W) bf16
    W = n_heads * hd
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    xn = ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * g_ref[0]
          + b_ref[0]).astype(x.dtype)
    qkv = (jax.lax.dot_general(
        xn, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:]).astype(x.dtype)               # (T, 3W)
    scale = hd**-0.5
    for h in range(n_heads):
        q = qkv[:, h * hd:(h + 1) * hd] * scale
        k = qkv[:, W + h * hd: W + (h + 1) * hd]
        v = qkv[:, 2 * W + h * hd: 2 * W + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(jnp.minimum(s, 70.0) - 70.0).astype(x.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, :, h * hd:(h + 1) * hd] = (o / l).astype(o_ref.dtype)


def _kernel_block_fused_o(x_ref, wqkv_ref, bqkv_ref, g_ref, b_ref, wo_ref,
                          bo_ref, o_ref, acc_ref, *, n_heads, hd):
    """v13: LN1 + qkv + attention + out-projection + residual in ONE kernel.
    Per-head outputs accumulate into a VMEM scratch (T, W); one full-rate
    K=W matmul applies Wo; o_ref gets x + attn@Wo + bo. Removes the last
    attention-related HBM round-trip (the pre-projection (T, W) tensor)."""
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
    scale = hd**-0.5
    for h in range(n_heads):
        q = qkv[:, h * hd:(h + 1) * hd] * scale
        k = qkv[:, W + h * hd: W + (h + 1) * hd]
        v = qkv[:, 2 * W + h * hd: 2 * W + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(jnp.minimum(s, 70.0) - 70.0).astype(x.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        acc_ref[:, h * hd:(h + 1) * hd] = (o / l).astype(acc_ref.dtype)
    proj = jax.lax.dot_general(
        acc_ref[:], wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:]
    o_ref[0] = (x32 + proj).astype(o_ref.dtype)


def _block_fused_o(x, wqkv, bqkv, g, b, wo, bo, n_heads=16):
    B, T, W = x.shape
    xspec = pl.BlockSpec((1, T, W), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(wqkv.shape, lambda bb: (0, 0),
                         memory_space=pltpu.VMEM)
    w2spec = pl.BlockSpec(wo.shape, lambda bb: (0, 0),
                          memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, 3 * W), lambda bb: (0, 0),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((1, W), lambda bb: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_block_fused_o, n_heads=n_heads,
                          hd=W // n_heads),
        grid=(B,),
        in_specs=[xspec, wspec, vspec, gspec, gspec, w2spec, gspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B, T, W), x.dtype),
        scratch_shapes=[pltpu.VMEM((T, W), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, wqkv, bqkv[None], g[None], b[None], wo, bo[None])


def _block_fused(x, wqkv, bqkv, g, b, n_heads=16):
    B, T, W = x.shape
    xspec = pl.BlockSpec((1, T, W), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(wqkv.shape, lambda bb: (0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, 3 * W), lambda bb: (0, 0),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((1, W), lambda bb: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_block_fused, n_heads=n_heads,
                          hd=W // n_heads),
        grid=(B,),
        in_specs=[xspec, wspec, vspec, gspec, gspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B, T, W), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, wqkv, bqkv[None], g[None], b[None])


# ------------------------------------------------------------- floor probes

def _kernel_exponly(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_heads):
    """Floor probe: ONLY the exp pass (no matmuls, no reduces)."""
    for h in range(n_heads):
        q = q_ref[0, h]                       # (T, D)
        t = k_ref.shape[2]
        s = jnp.broadcast_to(q[:, :1], (q.shape[0], t)).astype(jnp.float32)
        p = jnp.exp(s).astype(q.dtype)
        o_ref[0, h] = p[:, : q.shape[1]].astype(o_ref.dtype)


def _kernel_softmaxonly(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_heads):
    """Floor probe: bias+max+exp+sum+div passes on a fabricated tile (no
    MXU work)."""
    bias = bias_ref[:]
    for h in range(n_heads):
        q = q_ref[0, h]
        t = k_ref.shape[2]
        s = jnp.broadcast_to(q[:, :1], (q.shape[0], t)).astype(jnp.float32)
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m).astype(q.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o_ref[0, h] = (p[:, : q.shape[1]].astype(jnp.float32) / l).astype(
            o_ref.dtype)


def _kernel_matmulonly(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_heads):
    """Floor probe: QK^T and PV matmuls only (softmax replaced by a cast)."""
    for h in range(n_heads):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = s.astype(q.dtype)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, h] = o.astype(o_ref.dtype)


def _probe(kernel):
    def run(q, k, v):
        qp, kp, vp, T = _pad(q, k, v)
        return _call(kernel, qp, kp, vp)[:, :, :T]
    return run


CHAIN = 24  # fold the op into one dispatch: per-dispatch overhead on the
# tunneled runtime (~3 ms) would otherwise swamp a ~1-3 ms kernel.


def chained(fn):
    def run(q, k, v):
        def body(_, x):
            return fn(x, k, v).astype(q.dtype)

        return jax.lax.fori_loop(0, CHAIN, body, q)

    return jax.jit(run)


def timeit(fn, *args, reps=5):
    """Returns seconds per single op application (CHAIN per dispatch)."""
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))  # warm-up + sync
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.time() - t0) / (reps * CHAIN)


def main():
    argn = [a for a in sys.argv[1:] if not a.startswith("-")]
    reps = int(argn[0]) if argn else 20
    layer_only = "--layer-only" in sys.argv
    print(jax.devices(), flush=True)
    B, H, T, D = 32, 16, 577, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, T, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, T, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, T, D), jnp.bfloat16)

    from dream2real_tpu.ops import attention as A

    if layer_only:
        _layer_bench(B, H, T, D, kq, kk, reps)
        return

    base = chained(A.mha)
    t = timeit(base, q, k, v, reps=reps)
    print(f"mha (production)        : {t*1e3:8.3f} ms/op "
          f"(x24 layers = {t*24*1e3:.1f} ms/b{B})", flush=True)

    one = jax.jit(lambda q, k, v: A.mha(q, k, v))
    ref = np.asarray(one(q, k, v), np.float32)
    for name, fn in [("v1_unrolled", _mha_v1_unrolled),
                     ("v2_nomax", _mha_v2_nomax),
                     ("v3_pipelined", _mha_v3_pipelined)]:
        jf = jax.jit(lambda q, k, v, fn=fn: fn(q, k, v))
        got = np.asarray(jf(q, k, v), np.float32)
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        tv = timeit(chained(fn), q, k, v, reps=reps)
        print(f"{name:24s}: {tv*1e3:8.3f} ms/op  "
              f"(x{t/tv:.2f} vs prod, maxrel {rel:.2e})", flush=True)

    for name, kern in [("probe_exp_only", _kernel_exponly),
                       ("probe_softmax_only", _kernel_softmaxonly),
                       ("probe_matmul_only", _kernel_matmulonly)]:
        tv = timeit(chained(_probe(kern)), q, k, v, reps=reps)
        print(f"{name:24s}: {tv*1e3:8.3f} ms/op", flush=True)

    # v8: projection-layout input (B, T, 3W), full-lane tiles. Chain by
    # writing the (T, W) output back over the qkv carry's first W columns
    # (in-place loop carry: avoids re-materialising a 3W concat per step).
    qkv0 = jax.random.normal(kq, (B, T, 3 * H * D), jnp.bfloat16)

    for name, kern in [("v8_projlayout", _kernel_fused_layout),
                       ("v9_proj_nomax", _kernel_fused_nomax),
                       ("v10_proj_pipelined", _kernel_fused_pipelined),
                       ("v11_nomax_pipelined", _kernel_fused_nomax_pipe)]:

        def chain8(qkv, kern=kern):
            def body(_, x):
                y = _mha_v8_projlayout(x, n_heads=H, kernel=kern)
                return jax.lax.dynamic_update_slice(x, y.astype(x.dtype),
                                                    (0, 0, 0))

            return jax.lax.fori_loop(0, CHAIN, body, qkv)

        jc8 = jax.jit(chain8)
        out = jc8(qkv0)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.time()
        for _ in range(reps):
            out = jc8(qkv0)
        float(jnp.sum(out.astype(jnp.float32)))
        tv = (time.time() - t0) / (reps * CHAIN)
        print(f"{name:24s}: {tv*1e3:8.3f} ms/op "
              f"(x{t/tv:.2f} vs prod)", flush=True)

    _layer_bench(B, H, T, D, kq, kk, reps)


def _layer_bench(B, H, T, D, kq, kk, reps):
    # --- v12: fused LN+qkv+attention vs (XLA LN + qkv matmul + v9 kernel).
    # Chains on the (T, W) residual stream like a real tower layer.
    W = H * D
    x0 = jax.random.normal(kq, (B, T, W), jnp.bfloat16)
    wqkv = (jax.random.normal(kk, (W, 3 * W)) * 0.02).astype(jnp.bfloat16)
    bqkv = jnp.zeros((3 * W,), jnp.float32)
    g = jnp.ones((W,), jnp.float32)
    bb = jnp.zeros((W,), jnp.float32)

    def ln(x):
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
        return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * g + bb).astype(x.dtype)

    def baseline_layer(x):
        qkv = (jnp.dot(ln(x), wqkv, preferred_element_type=jnp.float32)
               + bqkv).astype(x.dtype)
        return x + _mha_v8_projlayout(qkv, n_heads=H,
                                      kernel=_kernel_fused_nomax)

    def fused_layer(x):
        return x + _block_fused(x, wqkv, bqkv, g, bb, n_heads=H)

    # --- v13: also fold the out-projection + residual into the kernel.
    # Fair comparison: every variant below computes the FULL attention
    # sub-block x + proj(attn(LN(x))).
    wo = (jax.random.normal(kq, (W, W)) * 0.02).astype(jnp.bfloat16)
    bo = jnp.zeros((W,), jnp.float32)

    def baseline_subblock(x):
        qkv = (jnp.dot(ln(x), wqkv, preferred_element_type=jnp.float32)
               + bqkv).astype(x.dtype)
        a = _mha_v8_projlayout(qkv, n_heads=H, kernel=_kernel_fused_nomax)
        return x + (jnp.dot(a.astype(x.dtype), wo,
                            preferred_element_type=jnp.float32) + bo)

    def v12_subblock(x):
        a = _block_fused(x, wqkv, bqkv, g, bb, n_heads=H)
        return x + (jnp.dot(a.astype(x.dtype), wo,
                            preferred_element_type=jnp.float32) + bo)

    def v13_subblock(x):
        return _block_fused_o(x, wqkv, bqkv, g, bb, wo, bo, n_heads=H)

    # --- full transformer BLOCK: attention sub-block + MLP sub-block, the
    # unit production actually chains 24x.
    w1 = (jax.random.normal(kk, (W, 4 * W)) * 0.02).astype(jnp.bfloat16)
    b1 = jnp.zeros((4 * W,), jnp.float32)
    w2 = (jax.random.normal(kq, (4 * W, W)) * 0.02).astype(jnp.bfloat16)
    b2 = jnp.zeros((W,), jnp.float32)

    def xla_mlp(x):
        h = jnp.dot(ln(x), w1, preferred_element_type=jnp.float32)
        h = (h + b1).astype(x.dtype)
        h = h * jax.nn.sigmoid(1.702 * h.astype(jnp.float32)).astype(x.dtype)
        return x + (jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
                    ).astype(x.dtype)

    # (The fused pallas MLP sub-block probe was deleted in round 4 with
    # ops/mlp.py: it measured 3.628 vs 3.191 ms/layer for the XLA MLP — the
    # per-image (T, 4W) tiles starve the MXU vs XLA's batched matmuls.)

    def block_baseline(x):
        return xla_mlp(baseline_subblock(x).astype(x.dtype))

    def block_v13_xla_mlp(x):
        return xla_mlp(v13_subblock(x).astype(x.dtype))

    for name, layer in [("xla_ln_qkv + v9 kernel", baseline_layer),
                        ("v12_block_fused", fused_layer),
                        ("subblock: xla + v9", baseline_subblock),
                        ("subblock: v12 + xla_wo", v12_subblock),
                        ("subblock: v13 all-fused", v13_subblock),
                        ("block: xla+v9 | xla mlp", block_baseline),
                        ("block: v13 | xla mlp", block_v13_xla_mlp)]:
        jf = jax.jit(lambda x, layer=layer: jax.lax.fori_loop(
            0, CHAIN, lambda _, xx: layer(xx).astype(x.dtype), x))
        out = jf(x0)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.time()
        for _ in range(reps):
            out = jf(x0)
        float(jnp.sum(out.astype(jnp.float32)))
        tv = (time.time() - t0) / (reps * CHAIN)
        print(f"{name:24s}: {tv*1e3:8.3f} ms/layer-op", flush=True)

    # numeric cross-checks vs the composed baselines
    a = np.asarray(jax.jit(baseline_subblock)(x0), np.float32)
    c = np.asarray(jax.jit(v13_subblock)(x0), np.float32)
    print(f"v13 maxrel vs baseline: "
          f"{np.abs(a - c).max() / (np.abs(a).max() + 1e-9):.2e}", flush=True)
    a = np.asarray(jax.jit(block_baseline)(x0), np.float32)
    c = np.asarray(jax.jit(block_v13_xla_mlp)(x0), np.float32)
    print(f"full-block maxrel vs baseline: "
          f"{np.abs(a - c).max() / (np.abs(a).max() + 1e-9):.2e}", flush=True)


if __name__ == "__main__":
    main()
