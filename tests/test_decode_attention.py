"""Flash-decode attention kernel (ops/decode_attention.py) vs the XLA
reference, bf16 and int8 caches, GQA grouping, ragged fill levels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_plus_tpu.ops.attention import xla_attention
from llava_plus_tpu.ops.decode_attention import decode_attention


def _setup(B=3, S=256, H=8, Hkv=4, D=128, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)).astype(np.float32))
    # cache layout [B, Hkv, S, D] (models/llama.py KVCache per-layer slice)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
    fill = [min(100, S), min(37, S), S][:B] + [S] * max(B - 3, 0)
    seg = np.zeros((B, S), np.int32)
    for i, f in enumerate(fill):
        seg[i, :f] = 1
    qpos = jnp.asarray([[f - 1] for f in fill], jnp.int32)
    return q, k, v, jnp.asarray(seg), qpos


def _ref(q, k, v, seg, qpos):
    # xla reference expects [B, S, H, D]
    k = jnp.swapaxes(k, 1, 2)
    v = jnp.swapaxes(v, 1, 2)
    return xla_attention(
        q, k, v, causal=True,
        q_segment_ids=jnp.ones((q.shape[0], 1), jnp.int32),
        kv_segment_ids=seg, q_positions=qpos,
    )


def test_decode_kernel_matches_xla_bf16_cache():
    q, k, v, seg, qpos = _setup()
    ref = _ref(q, k, v, seg, qpos)
    got = decode_attention(q, k, v, seg, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_decode_kernel_matches_xla_int8_cache():
    q, k, v, seg, qpos = _setup(seed=1)

    def quant(x):
        s = jnp.maximum(jnp.max(jnp.abs(x), -1, keepdims=True), 1e-8) / 127.0
        return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s

    k8, ks = quant(k)
    v8, vs = quant(v)
    ref = _ref(q, (k8.astype(jnp.float32) * ks), (v8.astype(jnp.float32) * vs),
               seg, qpos)
    got = decode_attention(q, k8, v8, seg, ks, vs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_decode_kernel_mha_single_group():
    q, k, v, seg, qpos = _setup(H=4, Hkv=4, seed=2)
    ref = _ref(q, k, v, seg, qpos)
    got = decode_attention(q, k, v, seg, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
