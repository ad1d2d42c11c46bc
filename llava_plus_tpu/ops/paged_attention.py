"""Pallas TPU paged flash-decode attention.

The paged half of the L0 kernel surface (BASELINE north star: "paged-KV
continuous-batched decode"). The KV cache lives as a pool of fixed-size
pages [Np, Hkv, P, D]; each serving slot owns a list of page ids
(``page_table`` [B, max_pages]). This kernel streams exactly the pages a
slot uses — the page-table indirection happens in the BlockSpec index maps
(``PrefetchScalarGridSpec`` makes the table available before the body runs),
so Mosaic's pipeline DMAs the right page while computing the previous one.

Unused trailing page steps map to the slot's last used page; Mosaic skips
the re-fetch for a revisited block and ``pl.when`` skips the compute, so the
cost of a slot is proportional to its own context length, not the pool max.

Quantized (int8) pools carry per-(token, head) scales [Np, Hkv, P, 1];
scales fold into the score/probability vectors exactly as in
ops/decode_attention.py.

Layouts: q [B, 1, H, D]; pools [Np, Hkv, P, D]; page_table [B, max_pages]
int32; lengths [B] int32 (tokens used per slot). GQA: G = H // Hkv.
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


def _kernel(
    pt_ref, used_ref,                    # scalar prefetch: [B, maxp], [B]
    q_ref, k_ref, v_ref, ks_ref, vs_ref,  # blocked tensors
    o_ref,
    m_s, l_s, acc_s,
    *, sm_scale: float, quantized: bool, page: int,
):
    b = pl.program_id(0)
    pj = pl.program_id(2)

    @pl.when(pj == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    used = used_ref[b]  # tokens used by this slot

    @pl.when(pj * page < used)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)          # [G, D]
        k = k_ref[0, 0].astype(jnp.float32)          # [page, D]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # [G, page]
        if quantized:
            scores = scores * ks_ref[0, 0, :, 0][None, :]
        scores = scores * sm_scale
        # mask the tail of the last used page
        tok = pj * page + jax.lax.broadcasted_iota(
            jnp.int32, (1, page), 1
        )
        scores = jnp.where(tok < used, scores, NEG_INF)

        m_prev = m_s[:]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_s[:] = m_new

        if quantized:
            p = p * vs_ref[0, 0, :, 0][None, :]
        v = v_ref[0, 0].astype(jnp.float32)
        acc_s[:] = acc_s[:] * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )

    @pl.when(pj == pl.num_programs(2) - 1)
    def _():
        o_ref[0, 0] = (acc_s[:] / jnp.maximum(l_s[:], 1e-9)).astype(o_ref.dtype)


def paged_decode_attention(
    q: jax.Array,            # [B, 1, H, D]
    k_pages: jax.Array,      # [Np, Hkv, P, D] bf16 or int8
    v_pages: jax.Array,
    page_table: jax.Array,   # [B, max_pages] int32
    lengths: jax.Array,      # [B] int32 tokens used per slot
    k_scale=None,            # [Np, Hkv, P, 1] f32 when int8
    v_scale=None,
    *,
    sm_scale: float | None = None,
    interpret=None,
) -> jax.Array:
    """Single-step attention over a paged cache. Returns [B, 1, H, D]."""
    if interpret is None:
        interpret = _interpret_default()
    B, Tq, H, D = q.shape
    assert Tq == 1, q.shape
    Np, Hkv, P, _ = k_pages.shape
    maxp = page_table.shape[1]
    G = H // Hkv
    if sm_scale is None:
        sm_scale = D ** -0.5

    quantized = k_scale is not None
    qg = q[:, 0].reshape(B, Hkv, G, D)
    pt = page_table.astype(jnp.int32)
    used = lengths.astype(jnp.int32)

    def page_index(b, h, pj, pt_ref, used_ref):
        # clamp trailing steps to the last used page: revisited block ids
        # skip the DMA, and the body's pl.when skips the compute.
        last = jnp.maximum((used_ref[b] - 1) // P, 0)
        j = jnp.minimum(pj, last)
        return (pt_ref[b, j], h, 0, 0)

    if quantized:
        ks, vs = k_scale, v_scale
        scale_spec = pl.BlockSpec((1, 1, P, 1), page_index)
    else:
        ks = jnp.ones((1, 1, 1, 1), jnp.float32)
        vs = ks
        scale_spec = pl.BlockSpec(
            (1, 1, 1, 1), lambda b, h, pj, pt_ref, used_ref: (0, 0, 0, 0)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv, maxp),
        in_specs=[
            pl.BlockSpec(
                (1, 1, G, D),
                lambda b, h, pj, pt_ref, used_ref: (b, h, 0, 0),
            ),
            pl.BlockSpec((1, 1, P, D), page_index),
            pl.BlockSpec((1, 1, P, D), page_index),
            scale_spec,
            scale_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G, D), lambda b, h, pj, pt_ref, used_ref: (b, h, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((G, 1), jnp.float32),
            pltpu.VMEM((G, 1), jnp.float32),
            pltpu.VMEM((G, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, sm_scale=sm_scale, quantized=quantized, page=P
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(pt, used, qg, k_pages, v_pages, ks, vs)
    return out.reshape(B, H, D)[:, None]


def paged_attention_reference(
    q, k_pages, v_pages, page_table, lengths, k_scale=None, v_scale=None,
    *, sm_scale=None,
):
    """Gather-based XLA reference (used by tests and as the CPU path)."""
    B = q.shape[0]
    Np, Hkv, P, D = k_pages.shape
    maxp = page_table.shape[1]

    def dense(pages, scale):
        g = pages[page_table]                       # [B, maxp, Hkv, P, D]
        if scale is not None:
            s = scale[page_table]                   # [B, maxp, Hkv, P, 1]
            g = g.astype(jnp.float32) * s
        # -> [B, S, Hkv, D]
        g = g.transpose(0, 1, 3, 2, 4).reshape(B, maxp * P, Hkv, D)
        return g.astype(q.dtype if scale is None else jnp.float32)

    k = dense(k_pages, k_scale).astype(jnp.float32)
    v = dense(v_pages, v_scale).astype(jnp.float32)

    from llava_plus_tpu.ops.attention import xla_attention

    S = maxp * P
    kv_seg = (jnp.arange(S)[None, :] < lengths[:, None]).astype(jnp.int32)
    q_seg = jnp.ones((B, 1), jnp.int32)
    q_positions = (lengths - 1)[:, None]
    return xla_attention(
        q, k.astype(q.dtype), v.astype(q.dtype),
        causal=True, q_segment_ids=q_seg, kv_segment_ids=kv_seg,
        q_positions=q_positions, softmax_scale=sm_scale,
    )
