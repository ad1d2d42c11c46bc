"""quant_cache_attention (folded int8-cache decode attention) must match
dequantize-then-attend (the _cache_read + xla_attention path it replaces)
up to bf16 score rounding: the scales are constant along each einsum's
contraction dim, so folding them is the same math reassociated."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_plus_tpu.ops.attention import quant_cache_attention, xla_attention


def _quantize(x):
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0 + 1e-8
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


@pytest.mark.parametrize("groups", [1, 4])
@pytest.mark.parametrize("tq", [1, 5])
def test_folded_matches_dequant(groups, tq):
    B, S, Hkv, D = 2, 64, 4, 32
    H = Hkv * groups
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, tq, H, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)) * 0.5, jnp.float32)
    kq, ks = _quantize(k)
    vq, vs = _quantize(v)
    ctx = 40  # valid prefix; the rest is padding
    seg = jnp.asarray((np.arange(S) < ctx)[None].repeat(B, 0), jnp.int32)
    pos = jnp.asarray(
        np.stack([np.arange(ctx - tq, ctx)] * B), jnp.int32
    )

    got = quant_cache_attention(
        q, kq, ks, vq, vs, kv_segment_ids=seg, q_positions=pos,
    )
    want = xla_attention(
        q,
        (kq.astype(jnp.float32) * ks),
        (vq.astype(jnp.float32) * vs),
        causal=True,
        q_segment_ids=jnp.ones((B, tq), jnp.int32),
        kv_segment_ids=seg,
        q_positions=pos,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_folded_bias_alibi():
    """Additive bias (MPT ALiBi) enters the folded scores identically."""
    B, S, Hkv, D, tq = 1, 32, 2, 16, 1
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, tq, Hkv, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    kq, ks = _quantize(k)
    vq, vs = _quantize(v)
    seg = jnp.ones((B, S), jnp.int32)
    pos = jnp.full((B, tq), S - 1, jnp.int32)
    bias = jnp.asarray(
        -np.abs(np.arange(S))[None, None, None, :]
        * np.array([0.25, 0.5])[None, :, None, None],
        jnp.float32,
    )
    got = quant_cache_attention(
        q, kq, ks, vq, vs, kv_segment_ids=seg, q_positions=pos, bias=bias,
    )
    want = xla_attention(
        q,
        (kq.astype(jnp.float32) * ks),
        (vq.astype(jnp.float32) * vs),
        causal=True, bias=bias,
        q_segment_ids=jnp.ones((B, tq), jnp.int32),
        kv_segment_ids=seg,
        q_positions=pos,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )
