"""Pallas CLIP attention kernel vs the XLA einsum path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dream2real_tpu.ops.attention import mha


def _ref_attn(q, k, v, causal):
    D = q.shape[-1]
    lg = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (D**-0.5)
    if causal:
        T = q.shape[2]
        lg = lg + jnp.triu(jnp.full((T, T), -jnp.inf, jnp.float32), k=1)[None, None]
    w = jax.nn.softmax(lg, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v, preferred_element_type=jnp.float32)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("T", [37, 128])  # 37 exercises the pad-to-128 path
def test_mha_matches_xla(causal, T):
    B, H, D = 2, 3, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (
        jax.random.normal(kk, (B, H, T, D)).astype(jnp.bfloat16) for kk in ks
    )
    out = mha(q, k, v, causal=causal)
    ref = _ref_attn(q, k, v, causal)
    assert out.shape == (B, H, T, D)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.02, rtol=0.05
    )


@pytest.mark.parametrize("T", [37, 128])
@pytest.mark.parametrize("maxsub", ["0", "1"])
def test_mha_qkv_matches_xla(T, maxsub, monkeypatch):
    """Projection-layout kernel vs the head-split XLA reference; both the
    clamped (default) and exact max-subtraction softmax variants."""
    monkeypatch.setenv("D2R_ATTN_MAXSUB", maxsub)
    from dream2real_tpu.ops.attention import mha_qkv

    B, H, D = 2, 4, 16
    W = H * D
    qkv = jax.random.normal(
        jax.random.PRNGKey(2), (B, T, 3 * W)
    ).astype(jnp.bfloat16)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, T, H, D).transpose(0, 2, 1, 3)

    ref = _ref_attn(heads(q), heads(k), heads(v), causal=False)
    ref = ref.transpose(0, 2, 1, 3).reshape(B, T, W)
    out = mha_qkv(qkv, H)
    assert out.shape == (B, T, W)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.02, rtol=0.05,
    )


def test_mha_qkv_clamp_matches_maxsub(monkeypatch):
    """The constant-clamp softmax is exactly shift-equivalent to the maxed
    one for logits below the clamp (the only regime CLIP produces)."""
    from dream2real_tpu.ops import attention as A

    B, H, D, T = 1, 2, 8, 24
    qkv = jax.random.normal(jax.random.PRNGKey(3), (B, T, 3 * H * D)) * 2.0
    qkv = qkv.astype(jnp.bfloat16)
    monkeypatch.setenv("D2R_ATTN_MAXSUB", "0")
    out0 = np.asarray(A.mha_qkv(qkv, H), np.float32)
    monkeypatch.setenv("D2R_ATTN_MAXSUB", "1")
    out1 = np.asarray(A.mha_qkv(qkv, H), np.float32)
    # Shift-equivalent up to bf16 rounding of the attention weights.
    np.testing.assert_allclose(out0, out1, atol=0.02, rtol=0.02)


def test_mha_ln_qkv_matches_split_pipeline(monkeypatch):
    """Fused LN+qkv+attention kernel vs the split (XLA LN + matmul +
    mha_qkv) pipeline, through the full vision _block."""
    import jax.numpy as jnp

    from dream2real_tpu.clip.model import _block, _init_block

    B, T, W, H = 2, 37, 64, 4
    blk = _init_block(jax.random.PRNGKey(5), W)
    blk = jax.tree.map(lambda t: t.astype(jnp.float32), blk)
    x = jax.random.normal(jax.random.PRNGKey(6), (B, T, W), jnp.bfloat16)
    monkeypatch.setenv("D2R_ATTN_FUSED_LN", "0")
    ref = np.asarray(_block(x, blk, H), np.float32)
    monkeypatch.setenv("D2R_ATTN_FUSED_LN", "1")
    out = np.asarray(_block(x, blk, H), np.float32)
    np.testing.assert_allclose(out, ref, atol=0.03, rtol=0.05)

def test_mha_padding_does_not_leak():
    """Valid-query outputs must be identical whether T is tile-aligned or not:
    padded keys are masked out, so appending rows cannot change them."""
    B, H, T, D = 1, 2, 100, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (B, H, T, D)) for kk in ks)
    out = mha(q, k, v)
    # Same data placed in a 128-token buffer with junk in the pad region.
    pad = ((0, 0), (0, 0), (0, 28), (0, 0))
    qp = jnp.pad(q, pad, constant_values=7.0)
    ref = _ref_attn(q, k, v, causal=False)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=1e-4, rtol=1e-4
    )
    assert qp.shape[2] == 128
