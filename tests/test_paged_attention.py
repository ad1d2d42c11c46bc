"""Paged flash-decode kernel vs dense attention (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_plus_tpu.ops.attention import xla_attention
from llava_plus_tpu.ops.paged_attention import (
    paged_attention_reference,
    paged_decode_attention,
)

P = 128  # page size


def _setup(B=3, H=4, Hkv=2, D=128, maxp=4, n_extra_pages=3, seed=0,
           quantized=False):
    """Build a paged cache whose gathered content equals a dense cache."""
    rng = np.random.default_rng(seed)
    Np = B * maxp + n_extra_pages
    lengths = np.array([maxp * P, 2 * P - 17, P + 1][:B], np.int64)

    # page table: a scrambled assignment so indirection is actually tested
    perm = rng.permutation(Np)
    page_table = perm[: B * maxp].reshape(B, maxp).astype(np.int32)

    k_pages = rng.normal(size=(Np, Hkv, P, D)).astype(np.float32)
    v_pages = rng.normal(size=(Np, Hkv, P, D)).astype(np.float32)
    q = rng.normal(size=(B, 1, H, D)).astype(np.float32)

    ks = vs = None
    if quantized:
        def quant(pages):
            s = np.abs(pages).max(axis=-1, keepdims=True) / 127.0
            qv = np.clip(np.round(pages / s), -127, 127).astype(np.int8)
            return qv, s.astype(np.float32)

        k_pages, ks = quant(k_pages)
        v_pages, vs = quant(v_pages)

    args = (
        jnp.asarray(q),
        jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(page_table), jnp.asarray(lengths, jnp.int32),
    )
    return args + ((jnp.asarray(ks), jnp.asarray(vs)) if quantized
                   else (None, None))


def _dense_from_pages(k_pages, v_pages, page_table, lengths, ks, vs):
    B, maxp = page_table.shape
    Np, Hkv, P_, D = k_pages.shape

    def dense(pages, scale):
        g = np.asarray(pages)[np.asarray(page_table)]
        if scale is not None:
            g = g.astype(np.float32) * np.asarray(scale)[np.asarray(page_table)]
        return jnp.asarray(
            g.transpose(0, 1, 3, 2, 4).reshape(B, maxp * P_, Hkv, D),
            jnp.float32,
        )

    return dense(k_pages, ks), dense(v_pages, vs)


@pytest.mark.parametrize("quantized", [False, True])
def test_matches_dense_attention(quantized):
    q, k_pages, v_pages, pt, lengths, ks, vs = _setup(quantized=quantized)
    got = paged_decode_attention(q, k_pages, v_pages, pt, lengths, ks, vs)

    k_dense, v_dense = _dense_from_pages(k_pages, v_pages, pt, lengths, ks, vs)
    B = q.shape[0]
    S = k_dense.shape[1]
    kv_seg = (jnp.arange(S)[None] < lengths[:, None]).astype(jnp.int32)
    ref = xla_attention(
        q, k_dense.astype(q.dtype), v_dense.astype(q.dtype), causal=True,
        q_segment_ids=jnp.ones((B, 1), jnp.int32), kv_segment_ids=kv_seg,
        q_positions=(lengths - 1)[:, None],
    )
    atol = 2e-2 if quantized else 2e-5
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=atol, rtol=1e-2 if quantized else 1e-4)


def test_reference_helper_matches_kernel():
    q, k_pages, v_pages, pt, lengths, ks, vs = _setup(seed=3)
    got = paged_decode_attention(q, k_pages, v_pages, pt, lengths)
    ref = paged_attention_reference(q, k_pages, v_pages, pt, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_bf16_pool():
    q, k_pages, v_pages, pt, lengths, _, _ = _setup(seed=5)
    q16 = q.astype(jnp.bfloat16)
    got = paged_decode_attention(
        q16, k_pages.astype(jnp.bfloat16), v_pages.astype(jnp.bfloat16),
        pt, lengths,
    )
    ref = paged_attention_reference(q, k_pages, v_pages, pt, lengths)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=5e-2, rtol=5e-2
    )
