"""Paged decode attention: XLA reference path vs dense attention (CPU).

On CPU, ``paged_decode_attention`` routes to the gather-based reference —
the manual-DMA Pallas kernel has no interpret-mode emulation, so its
numerical parity vs this same reference is asserted on the TPU by
``test_kernel_matches_reference_on_tpu`` below (skipped off-TPU; run
``tools/bench_paged.py --verify`` on the chip for the same checks
standalone).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_plus_tpu.ops.attention import xla_attention
from llava_plus_tpu.ops.paged_attention import (
    gather_pages,
    paged_attention_reference,
    paged_decode_attention,
)

P = 128  # page size


def _setup(B=3, H=4, Hkv=2, D=128, maxp=4, n_extra_pages=3, seed=0,
           quantized=False):
    """Build a combined paged pool whose gathered content is a dense cache."""
    rng = np.random.default_rng(seed)
    Np = B * maxp + n_extra_pages
    lengths = np.array([maxp * P, 2 * P - 17, P + 1][:B], np.int64)

    # page table: a scrambled assignment so indirection is actually tested
    perm = rng.permutation(Np)
    page_table = perm[: B * maxp].reshape(B, maxp).astype(np.int32)

    kv_pages = rng.normal(size=(Np, 2, P, Hkv, D)).astype(np.float32)
    q = rng.normal(size=(B, 1, H, D)).astype(np.float32)

    kv_scale = None
    if quantized:
        s = np.abs(kv_pages).max(axis=-1) / 127.0   # [Np, 2, P, Hkv]
        kv_q = np.clip(
            np.round(kv_pages / s[..., None]), -127, 127
        ).astype(np.int8)
        # scale pages are head-major [Np, 2, Hkv, P] (see ops docstring)
        kv_pages, kv_scale = kv_q, s.transpose(0, 1, 3, 2).astype(np.float32)

    return (
        jnp.asarray(q), jnp.asarray(kv_pages), jnp.asarray(page_table),
        jnp.asarray(lengths, jnp.int32),
        None if kv_scale is None else jnp.asarray(kv_scale),
    )


def _dense_from_pages(kv_pages, page_table, kv_scale):
    k, v = gather_pages(kv_pages, page_table, kv_scale)
    return k.astype(jnp.float32), v.astype(jnp.float32)


@pytest.mark.parametrize("quantized", [False, True])
def test_matches_dense_attention(quantized):
    q, kv_pages, pt, lengths, kv_scale = _setup(quantized=quantized)
    got = paged_decode_attention(q, kv_pages, pt, lengths, kv_scale)

    k_dense, v_dense = _dense_from_pages(kv_pages, pt, kv_scale)
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


def test_reference_helper_consistent():
    q, kv_pages, pt, lengths, _ = _setup(seed=3)
    got = paged_decode_attention(q, kv_pages, pt, lengths)
    ref = paged_attention_reference(q, kv_pages, pt, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_bf16_pool():
    q, kv_pages, pt, lengths, _ = _setup(seed=5)
    q16 = q.astype(jnp.bfloat16)
    got = paged_decode_attention(
        q16, kv_pages.astype(jnp.bfloat16), pt, lengths,
    )
    ref = paged_attention_reference(q, kv_pages, pt, lengths)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=5e-2, rtol=5e-2
    )


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="Pallas manual-DMA kernel runs on TPU only",
)
@pytest.mark.parametrize("quantized", [False, True])
def test_kernel_matches_reference_on_tpu(quantized):
    q, kv_pages, pt, lengths, kv_scale = _setup(seed=7, quantized=quantized)
    got = paged_decode_attention(
        q, kv_pages, pt, lengths, kv_scale, interpret=False
    )
    ref = paged_attention_reference(q, kv_pages, pt, lengths, kv_scale)
    atol = 2e-2 if quantized else 1e-3
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=atol, rtol=1e-2)
