"""Pallas flash attention vs the XLA reference implementation.

Runs in interpret mode on CPU; the same kernel compiles on TPU (exercised by
bench/graft hooks there).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_plus_tpu.ops.attention import xla_attention
from llava_plus_tpu.ops.flash_attention import flash_attention


def _rand_qkv(B, T, H, D, Hkv=None, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    Hkv = Hkv or H
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), dtype)
    k = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), dtype)
    v = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [True, False])
def test_matches_xla(causal):
    q, k, v = _rand_qkv(2, 256, 2, 128)
    ref = xla_attention(q, k, v, causal=causal)
    got = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_segment_ids_padding():
    q, k, v = _rand_qkv(2, 256, 2, 128, seed=1)
    seg = np.ones((2, 256), np.int32)
    seg[0, 200:] = 0   # padding
    seg[1, :128] = 1   # packed sequences
    seg[1, 128:] = 2
    seg_j = jnp.asarray(seg)
    ref = xla_attention(q, k, v, causal=True, q_segment_ids=seg_j, kv_segment_ids=seg_j)
    got = flash_attention(
        q, k, v, causal=True, q_segment_ids=seg_j, kv_segment_ids=seg_j,
        block_q=128, block_k=128,
    )
    # compare only non-padding rows
    mask = seg != 0
    np.testing.assert_allclose(
        np.asarray(got)[mask], np.asarray(ref)[mask], atol=2e-5, rtol=1e-4
    )


def test_gqa():
    q, k, v = _rand_qkv(1, 256, 4, 128, Hkv=2, seed=2)
    ref = xla_attention(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_alibi():
    from llava_plus_tpu.models.mpt import alibi_bias_from_positions

    B, T, H, D = 1, 256, 4, 128
    q, k, v = _rand_qkv(B, T, H, D, seed=3)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    bias = alibi_bias_from_positions(pos, pos, H)
    ref = xla_attention(q, k, v, causal=True, bias=bias)
    got = flash_attention(q, k, v, causal=True, alibi_nheads=H,
                          block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_gradients_match_xla():
    q, k, v = _rand_qkv(1, 256, 2, 128, seed=4)
    seg = jnp.ones((1, 256), jnp.int32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=True, q_segment_ids=seg,
                            kv_segment_ids=seg, block_q=128, block_k=128)
        return jnp.sum(o * o)

    def loss_ref(q, k, v):
        o = xla_attention(q, k, v, causal=True, q_segment_ids=seg,
                          kv_segment_ids=seg)
        return jnp.sum(o * o)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize(
    "case", ["gqa", "alibi", "packed", "padded", "noncausal"]
)
def test_gradients_hard_cases(case):
    """The fused Pallas backward vs XLA autodiff across every feature the
    kernel supports (GQA head folding, ALiBi bias, packed segments, row
    padding, non-causal)."""
    from llava_plus_tpu.models.mpt import alibi_bias_from_positions

    B, T, H, D = 2, 256, 4, 128
    Hkv, alibi_nheads, causal = H, 0, True
    seg = np.ones((B, T), np.int32)
    if case == "gqa":
        Hkv = 2
    elif case == "alibi":
        alibi_nheads = H
    elif case == "packed":
        seg[0, 100:] = 2
        seg[1, 200:] = 0
    elif case == "padded":
        seg[:, 230:] = 0
    elif case == "noncausal":
        causal = False
    q, k, v = _rand_qkv(B, T, H, D, Hkv=Hkv, seed=7)
    seg_j = jnp.asarray(seg)

    bias = None
    if alibi_nheads:
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
        bias = alibi_bias_from_positions(pos, pos, H)

    rng = np.random.default_rng(11)
    # Cotangent masked at padding rows: the XLA reference gives fully-masked
    # rows a uniform softmax (output = mean(v)) while the kernel zeroes them;
    # real losses never read padding rows, so neither should the cotangent.
    g = jnp.asarray(
        rng.normal(size=(B, T, H, D)) * (seg != 0)[:, :, None, None],
        jnp.float32,
    )

    def loss_flash(q, k, v):
        o = flash_attention(
            q, k, v, causal=causal, q_segment_ids=seg_j, kv_segment_ids=seg_j,
            alibi_nheads=alibi_nheads, block_q=128, block_k=128,
        )
        return jnp.sum(o * g)

    def loss_ref(q, k, v):
        o = xla_attention(
            q, k, v, causal=causal, q_segment_ids=seg_j, kv_segment_ids=seg_j,
            bias=bias,
        )
        return jnp.sum(o * g)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch ({case})",
        )


def test_gradients_bf16_runs():
    q, k, v = _rand_qkv(1, 256, 2, 128, seed=9, dtype=jnp.bfloat16)

    def loss(q, k, v):
        o = flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert dq.dtype == jnp.bfloat16 and dk.dtype == jnp.bfloat16
    for a in (dq, dk, dv):
        assert np.isfinite(np.asarray(a, np.float32)).all()


def test_bf16_runs():
    q, k, v = _rand_qkv(1, 256, 2, 128, seed=5, dtype=jnp.bfloat16)
    got = flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
    assert got.dtype == jnp.bfloat16
    ref = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )
