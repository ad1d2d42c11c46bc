"""Pallas TPU flash-decode attention over the (optionally int8) KV cache.

The missing half of the L0 kernel surface (SURVEY.md: "paged-KV decode
kernel"): prefill/training use ops/flash_attention.py; this kernel covers
the Tq == 1 decode step, where attention is a bandwidth problem — stream
the cache once, online-softmax in VMEM.

Why not XLA: with an int8 cache, XLA materializes the dequantized bf16
cache per layer in HBM (the convert does not fuse into its attention
einsum), tripling cache traffic. Here the int8 tensors are the only HBM
reads; scales are applied to the score/probability vectors (mathematically
identical to dequantizing K/V since scales are per (token, kv-head):
q·(k*s) = (q·k)*s and p·(v*s) = (p*s)·v).

Layouts: q [B, 1, H, D]; cache k/v [B, Hkv, S, D] (slot == position,
seg [B, S] with 0 = empty slot — exactly models/llama.py's KVCache per-layer
slice); scales [B, Hkv, S, 1] f32 or None. The (S, D) trailing layout makes
every sequence block a tile-aligned VMEM load. GQA/MQA: G = H // Hkv query
heads share each kv head.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _interpret_default() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True


def _kernel(q_ref, k_ref, v_ref, seg_ref, ks_ref, vs_ref,
            o_ref, m_s, l_s, acc_s, *, sm_scale: float, quantized: bool):
    sj = pl.program_id(2)

    @pl.when(sj == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    q = q_ref[0, 0].astype(jnp.float32)          # [G, D]
    k = k_ref[0, 0].astype(jnp.float32)          # [sblk, D]
    # HIGHEST: decode is HBM-bandwidth-bound, so full-f32 MXU passes are
    # free and keep the kernel as accurate as XLA's f32 decode matvec
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                             # [G, sblk]
    if quantized:
        scores = scores * ks_ref[0, 0, :, 0][None, :]
    scores = scores * sm_scale
    valid = (seg_ref[0, 0, :] > 0)[None, :]       # [1, sblk]
    scores = jnp.where(valid, scores, NEG_INF)

    m_prev = m_s[:]                               # [G, 1]
    m_cur = jnp.max(scores, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)                   # [G, sblk]
    l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_s[:] = m_new

    if quantized:
        p = p * vs_ref[0, 0, :, 0][None, :]
    v = v_ref[0, 0].astype(jnp.float32)           # [sblk, D]
    acc_s[:] = acc_s[:] * alpha + jnp.dot(
        p, v, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(sj == pl.num_programs(2) - 1)
    def _():
        o_ref[0, 0] = (acc_s[:] / jnp.maximum(l_s[:], 1e-9)).astype(o_ref.dtype)


def decode_attention(
    q: jax.Array,          # [B, 1, H, D]
    k_cache: jax.Array,    # [B, Hkv, S, D] bf16 or int8
    v_cache: jax.Array,
    seg: jax.Array,        # [B, S] int32, 0 = empty
    k_scale=None,          # [B, Hkv, S, 1] f32 when cache is int8
    v_scale=None,
    *,
    sm_scale: float | None = None,
    block_s: int = 512,
    interpret=None,
) -> jax.Array:
    """Single-step attention over the cache. Returns [B, 1, H, D]."""
    if interpret is None:
        interpret = _interpret_default()
    B, Tq, H, D = q.shape
    assert Tq == 1, q.shape
    Hkv, S = k_cache.shape[1], k_cache.shape[2]
    G = H // Hkv
    if sm_scale is None:
        sm_scale = D ** -0.5
    sblk = block_s
    while S % sblk and sblk > 128:
        sblk //= 2
    assert S % sblk == 0, (S, sblk)

    quantized = k_scale is not None
    qg = q[:, 0].reshape(B, Hkv, G, D)
    seg3 = seg[:, None, :]  # [B, 1, S] so the seg block is (1, 1, sblk)
    if quantized:
        ks, vs = k_scale, v_scale
    else:  # dummies (never read: `quantized` is static)
        ks = jnp.ones((B, 1, 1, 1), jnp.float32)
        vs = ks

    grid = (B, Hkv, S // sblk)
    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale, quantized=quantized),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, G, D), lambda b, h, s: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, sblk, D), lambda b, h, s: (b, h, s, 0)),
            pl.BlockSpec((1, 1, sblk, D), lambda b, h, s: (b, h, s, 0)),
            pl.BlockSpec((1, 1, sblk), lambda b, h, s: (b, 0, s)),
            pl.BlockSpec(
                (1, 1, sblk, 1) if quantized else (1, 1, 1, 1),
                (lambda b, h, s: (b, h, s, 0)) if quantized
                else (lambda b, h, s: (b, 0, 0, 0)),
            ),
            pl.BlockSpec(
                (1, 1, sblk, 1) if quantized else (1, 1, 1, 1),
                (lambda b, h, s: (b, h, s, 0)) if quantized
                else (lambda b, h, s: (b, 0, 0, 0)),
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, G, D), lambda b, h, s: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((G, 1), jnp.float32),
            pltpu.VMEM((G, 1), jnp.float32),
            pltpu.VMEM((G, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qg, k_cache, v_cache, seg3, ks, vs)
    return out.reshape(B, H, D)[:, None]