"""Pallas TPU flash attention: fused fwd + bwd.

TPU-native replacement for the reference's native attention surface — the
Triton kernel (``llava/model/language_model/mpt/flash_attn_triton.py``) and
the CUDA flash-attn / xformers monkey patches (``llava/train/*_monkey_patch.py``).

Feature parity with that surface:
- causal masking,
- ALiBi bias (as per-head slopes, computed in-kernel from positions — the
  Triton kernel's vector-bias path),
- padding/packing via segment ids (the CUDA path's varlen/unpad equivalent),
- fused, recompute-free backward: the forward saves per-row logsumexp and
  the backward runs two Pallas passes — dk/dv (kv-block major, transposed
  compute) and dq (q-block major) — the TPU analogue of the Triton kernel's
  SEQUENCE_PARALLEL backward (`flash_attn_triton.py:303-400`).

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
    o_ref, lse_ref,                     # output blocks
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
        if mask is not None:
            # Zero masked probabilities explicitly: on fully-masked (padding)
            # rows m_new equals the mask value, so the exp above is 1, not 0.
            # With this, such rows get l == 0 and a clean all-zero output
            # (and the backward zeroes them through the same mask).
            p = jnp.where(mask, p, 0.0)

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
        # Per-row logsumexp, saved for the recompute-free backward. Rows
        # that saw only masked entries get a finite (garbage) value; the
        # backward re-applies the mask so it never contributes.
        lse = m_scratch[:, :1] + jnp.log(l_safe)
        lse_ref[0, 0, pl.ds(qi * block_q, block_q)] = lse[:, 0]


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
        # SMEM: the kernel does a dynamic per-head scalar read
        # (slopes_ref[0, bh % H]) — a VMEM lane index can't be proven
        # 128-aligned by Mosaic and fails to compile
        pl.BlockSpec(memory_space=pltpu.SMEM)
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
        out_specs=(
            pl.BlockSpec((1, block_q, D), lambda b, qi, kj: (b, qi, 0)),
            pl.BlockSpec((1, 1, T), lambda b, qi, kj: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, D), q.dtype),
            jax.ShapeDtypeStruct((BH, 1, T), jnp.float32),
        ),
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
# Backward kernels (recompute-free: replay softmax from the saved lse)
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(
    q_seg_ref, kv_seg_ref, slopes_ref, lse_ref, delta_ref,
    q_ref, do_ref, k_ref, v_ref,
    dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *, causal: bool, sm_scale: float, block_q: int, block_k: int,
    use_segments: bool, use_alibi: bool,
):
    """dk/dv pass: grid (BH, kv-block, q-block), q innermost. The compute is
    transposed ([block_k, block_q] tiles) so the accumulators dk/dv stay
    resident in VMEM across the whole q loop — one HBM write per kv block."""
    bh = pl.program_id(0)
    kj = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    q_start = qi * block_q
    k_start = kj * block_k

    def compute():
        q = q_ref[0, :, :]   # [block_q, D]
        k = k_ref[0, :, :]   # [block_k, D]
        v = v_ref[0, :, :]
        do = do_ref[0, :, :]

        # s^T = k q^T * scale  -> [block_k, block_q]
        s_t = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale

        k_pos = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, block_q), 0
        )
        q_pos = q_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, block_q), 1
        )
        if use_alibi:
            slope = slopes_ref[0, bh % slopes_ref.shape[1]]
            s_t = s_t - slope * jnp.abs((q_pos - k_pos).astype(jnp.float32))

        # Replay softmax: p^T = exp(s^T - lse[q]); mask AFTER the exp so
        # garbage lse on fully-masked (padding) q rows cannot leak in.
        lse = lse_ref[0, 0, pl.ds(q_start, block_q)]       # [block_q]
        p_t = jnp.exp(s_t - lse[None, :])

        mask = k_pos <= q_pos if causal else None
        if use_segments:
            q_seg = q_seg_ref[0, 0, pl.ds(q_start, block_q)]
            k_seg = kv_seg_ref[0, 0, pl.ds(k_start, block_k)]
            seg_ok = (
                (k_seg[:, None] == q_seg[None, :])
                & (k_seg[:, None] != 0)
                & (q_seg[None, :] != 0)
            )
            mask = seg_ok if mask is None else (mask & seg_ok)
        if mask is not None:
            p_t = jnp.where(mask, p_t, 0.0)

        dv_scratch[:] += jax.lax.dot_general(
            p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # dp^T = v do^T; ds^T = p^T * (dp^T - delta[q]) * scale
        dp_t = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = delta_ref[0, 0, pl.ds(q_start, block_q)]   # [block_q]
        ds_t = p_t * (dp_t - delta[None, :]) * sm_scale

        dk_scratch[:] += jax.lax.dot_general(
            ds_t.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        # q blocks entirely above the diagonal contribute nothing.
        pl.when(q_start + block_q - 1 >= k_start)(compute)
    else:
        compute()

    @pl.when(qi == pl.num_programs(2) - 1)
    def _finalize():
        dk_ref[0, :, :] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0, :, :] = dv_scratch[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_seg_ref, kv_seg_ref, slopes_ref, lse_ref, delta_ref,
    q_ref, do_ref, k_ref, v_ref,
    dq_ref,
    dq_scratch,
    *, causal: bool, sm_scale: float, block_q: int, block_k: int,
    use_segments: bool, use_alibi: bool,
):
    """dq pass: grid (BH, q-block, kv-block), kv innermost; dq accumulates in
    VMEM across the kv loop (the Triton SEQUENCE_PARALLEL dq analogue)."""
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    q_start = qi * block_q
    k_start = kj * block_k

    def compute():
        q = q_ref[0, :, :]
        k = k_ref[0, :, :]
        v = v_ref[0, :, :]
        do = do_ref[0, :, :]

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
            s = s - slope * jnp.abs((q_pos - k_pos).astype(jnp.float32))

        lse = lse_ref[0, 0, pl.ds(q_start, block_q)]
        p = jnp.exp(s - lse[:, None])

        mask = k_pos <= q_pos if causal else None
        if use_segments:
            q_seg = q_seg_ref[0, 0, pl.ds(q_start, block_q)]
            k_seg = kv_seg_ref[0, 0, pl.ds(k_start, block_k)]
            seg_ok = (
                (q_seg[:, None] == k_seg[None, :])
                & (k_seg[None, :] != 0)
                & (q_seg[:, None] != 0)
            )
            mask = seg_ok if mask is None else (mask & seg_ok)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = delta_ref[0, 0, pl.ds(q_start, block_q)]
        ds = p * (dp - delta[:, None]) * sm_scale

        dq_scratch[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        pl.when(q_start + block_q - 1 >= k_start)(compute)
    else:
        compute()

    @pl.when(kj == pl.num_programs(2) - 1)
    def _finalize():
        dq_ref[0, :, :] = dq_scratch[:].astype(dq_ref.dtype)


def _bwd(
    q, do, k, v, lse, delta, q_seg, kv_seg, slopes,
    *, causal, sm_scale, block_q, block_k, interpret,
):
    """q/do/k/v: [BH, T, D]; lse/delta: [BH, 1, T] f32. Returns dq, dk, dv."""
    BH, T, D = q.shape
    use_segments = q_seg is not None
    use_alibi = slopes is not None
    dummy = jnp.zeros((1, 1), jnp.int32)

    def small_specs():
        seg3 = pl.BlockSpec((1, 1, T), lambda b, i, j: (b, 0, 0))
        return [
            seg3 if use_segments else pl.BlockSpec(memory_space=pl.ANY),
            seg3 if use_segments else pl.BlockSpec(memory_space=pl.ANY),
            # SMEM: dynamic per-head scalar read (see _fwd)
            pl.BlockSpec(memory_space=pltpu.SMEM)
            if use_alibi else pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, T), lambda b, i, j: (b, 0, 0)),  # lse
            pl.BlockSpec((1, 1, T), lambda b, i, j: (b, 0, 0)),  # delta
        ]

    small_args = (
        q_seg[:, None, :] if use_segments else dummy,
        kv_seg[:, None, :] if use_segments else dummy,
        slopes if use_alibi else dummy,
        lse, delta,
    )

    kw = dict(causal=causal, sm_scale=sm_scale,
              block_q=block_q, block_k=block_k,
              use_segments=use_segments, use_alibi=use_alibi)

    # dk/dv pass: (BH, kv, q), q innermost.
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **kw),
        grid=(BH, T // block_k, T // block_q),
        in_specs=small_specs() + [
            pl.BlockSpec((1, block_q, D), lambda b, kj, qi: (b, qi, 0)),  # q
            pl.BlockSpec((1, block_q, D), lambda b, kj, qi: (b, qi, 0)),  # do
            pl.BlockSpec((1, block_k, D), lambda b, kj, qi: (b, kj, 0)),  # k
            pl.BlockSpec((1, block_k, D), lambda b, kj, qi: (b, kj, 0)),  # v
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, D), lambda b, kj, qi: (b, kj, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, kj, qi: (b, kj, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, D), k.dtype),
            jax.ShapeDtypeStruct((BH, T, D), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * BH * T * T * D,
            bytes_accessed=6 * BH * T * D * q.dtype.itemsize,
            transcendentals=BH * T * T,
        ),
    )(*small_args, q, do, k, v)

    # dq pass: (BH, q, kv), kv innermost.
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **kw),
        grid=(BH, T // block_q, T // block_k),
        in_specs=small_specs() + [
            pl.BlockSpec((1, block_q, D), lambda b, qi, kj: (b, qi, 0)),  # q
            pl.BlockSpec((1, block_q, D), lambda b, qi, kj: (b, qi, 0)),  # do
            pl.BlockSpec((1, block_k, D), lambda b, qi, kj: (b, kj, 0)),  # k
            pl.BlockSpec((1, block_k, D), lambda b, qi, kj: (b, kj, 0)),  # v
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, qi, kj: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, T, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * BH * T * T * D,
            bytes_accessed=5 * BH * T * D * q.dtype.itemsize,
            transcendentals=BH * T * T,
        ),
    )(*small_args, q, do, k, v)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public wrapper (+ autodiff via fused Pallas custom VJP)
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
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10)
)
def _flash(q, k, v, q_segment_ids, kv_segment_ids,
           causal, sm_scale, alibi_nheads, block_q, block_k, kv_heads):
    out, _ = _flash_fwd_rule(
        q, k, v, q_segment_ids, kv_segment_ids,
        causal, sm_scale, alibi_nheads, block_q, block_k, kv_heads,
    )
    return out


def _interpret_default() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True


def _alibi_slopes_arg(alibi_nheads):
    if not alibi_nheads:
        return None
    from llava_plus_tpu.models.mpt import alibi_slopes

    return alibi_slopes(alibi_nheads)[None, :]


def _pad_inputs(q, k, v, q_segment_ids, kv_segment_ids):
    """Pad T up to a 128 multiple; padded rows get segment id 0 so they are
    masked out. Always materializes segment ids (the backward masks on them)."""
    B, T = q.shape[:2]
    Tp = ((T + 127) // 128) * 128
    pad = Tp - T
    if q_segment_ids is None:
        q_segment_ids = jnp.ones((B, T), jnp.int32)
        kv_segment_ids = jnp.ones((B, T), jnp.int32)
    if pad:
        zpad3 = [(0, 0), (0, pad), (0, 0), (0, 0)]
        q = jnp.pad(q, zpad3)
        k = jnp.pad(k, zpad3)
        v = jnp.pad(v, zpad3)
        q_segment_ids = jnp.pad(q_segment_ids, [(0, 0), (0, pad)])
        kv_segment_ids = jnp.pad(kv_segment_ids, [(0, 0), (0, pad)])
    return q, k, v, q_segment_ids, kv_segment_ids, pad


def _flash_fwd_rule(q, k, v, q_segment_ids, kv_segment_ids,
                    causal, sm_scale, alibi_nheads, block_q, block_k,
                    kv_heads):
    B, T, H, D = q.shape
    slopes = _alibi_slopes_arg(alibi_nheads)

    qp, kp, vp, qseg, kseg, pad = _pad_inputs(
        q, k, v, q_segment_ids, kv_segment_ids
    )
    Tp = T + pad
    qt, kt, vt, qs, ks = _prep(qp, kp, vp, qseg, kseg)
    bq = _pick_block(Tp, block_q)
    bk = _pick_block(Tp, block_k)
    out, lse = _fwd(
        qt, kt, vt, qs, ks, slopes,
        causal=causal, sm_scale=sm_scale, block_q=bq, block_k=bk,
        interpret=_interpret_default(),
    )
    out_btHD = out.reshape(B, H, Tp, D).transpose(0, 2, 1, 3)
    if pad:
        out_btHD = out_btHD[:, :T]
    # Residuals stay padded in the flattened [B*H, Tp, D] kernel layout so
    # the backward feeds them straight back into the bwd kernels.
    residuals = (qt, kt, vt, qs, ks, out, lse)
    return out_btHD, residuals


def _flash_bwd_rule(causal, sm_scale, alibi_nheads, block_q, block_k,
                    kv_heads, residuals, g):
    """Fused Pallas backward: dk/dv pass + dq pass, recompute-free via the
    forward's saved logsumexp (TPU analogue of the reference Triton kernel's
    backward, ``flash_attn_triton.py:303-400``)."""
    qt, kt, vt, qs, ks, out, lse = residuals
    Hkv = kv_heads
    BH, Tp, D = qt.shape
    B, T, H, _ = g.shape
    pad = Tp - T
    slopes = _alibi_slopes_arg(alibi_nheads)

    if pad:
        g = jnp.pad(g, [(0, 0), (0, pad), (0, 0), (0, 0)])
    gt = g.transpose(0, 2, 1, 3).reshape(BH, Tp, D)

    # delta[i] = sum_d dO[i,d] * O[i,d] — cheap elementwise, fused by XLA.
    delta = jnp.sum(
        gt.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )[:, None, :]
    lse = lse.astype(jnp.float32)

    bq = _pick_block(Tp, block_q)
    bk = _pick_block(Tp, block_k)
    dq, dk, dv = _bwd(
        qt, gt, kt, vt, lse, delta, qs, ks, slopes,
        causal=causal, sm_scale=sm_scale, block_q=bq, block_k=bk,
        interpret=_interpret_default(),
    )

    dq = dq.reshape(B, H, Tp, D)
    dk = dk.reshape(B, H, Tp, D)
    dv = dv.reshape(B, H, Tp, D)
    if H != Hkv:
        # GQA: k/v were repeated to H query heads; fold the repeats back.
        groups = H // Hkv
        dk = dk.reshape(B, Hkv, groups, Tp, D).sum(axis=2)
        dv = dv.reshape(B, Hkv, groups, Tp, D).sum(axis=2)
    dq = dq.transpose(0, 2, 1, 3)[:, :T]
    dk = dk.transpose(0, 2, 1, 3)[:, :T]
    dv = dv.transpose(0, 2, 1, 3)[:, :T]
    return dq, dk, dv, None, None


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
        causal, scale, alibi_nheads, block_q, block_k, k.shape[2],
    )
