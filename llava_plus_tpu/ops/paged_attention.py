"""Pallas TPU paged flash-decode attention (manual-DMA design).

The paged half of the L0 kernel surface (BASELINE north star: "paged-KV
continuous-batched decode"). The KV cache lives in HBM as one combined pool
``kv_pages [NP, 2, P, Hkv, D]`` (dim 1: 0 = K, 1 = V) and never transits
VMEM wholesale: the kernel manually DMAs only the pages a slot actually
uses into a double-buffered VMEM scratch, prefetching the next block's
pages while computing the current one (the structure production TPU paged
kernels use — cf. jax.experimental.pallas.ops.tpu.paged_attention and the
vLLM ragged kernel; ours is decode-specialized and keeps per-(token, head)
int8 scales, which those kernels lack).

Why not BlockSpec indirection with grid (B, Hkv, maxp) (the first design):
that grid runs B*Hkv*maxp steps per layer — ~8k mostly-no-op steps per
layer at 7B MHA shapes, ~0.25 s of pure grid overhead per decode step
across 32 layers. Here a page block carries ALL heads, so the grid is
(B, ceil(maxp/ppcb)) — two orders of magnitude fewer steps — and trailing
blocks past a slot's length are skipped inside the kernel.

One pool serves every layer: page ids are FLAT (`layer * pages_per_layer +
page`), so the decoder's scan-over-layers just offsets the page table (a
[B, maxp] int32 add) instead of slicing a multi-GB pool per layer.

Deferred writes: the decoder does NOT scatter the current token into the
pool before attention (a per-layer scatter on a multi-GB operand costs
more than the attention itself). Instead the kernel takes the current
token's k/v (``cur_k``/``cur_v``) as a direct VMEM input and folds it in
as a final "self block"; the pool write happens ONCE per decode step for
all layers (see models/llama.py:_paged_write_all). ``lengths`` therefore
counts PAST tokens (tokens already in the pool), not including the
current one.

Layouts
- q [B, 1, H, D] (decode: one token per slot); GQA G = H // Hkv
- kv_pages [NP, 2, P, Hkv, D] bf16 or int8; one page = contiguous
  [2, P, Hkv, D] block (the DMA unit). Token-major within the page (P
  above Hkv): the decoder's deferred-write scatter then prefers XLA's
  DEFAULT layout (its (Hkv, D) windows are the minor dims), matching
  what this kernel requires — with heads-major pages the TPU scatter
  emitter instead demanded {5,3,4,2,1,0} and XLA inserted two whole-pool
  relayout copies into every decode step (measured: 6 GB HLO temp +
  ~12 GB/step of copy traffic on a 24-slot 7B pool, v5e round 4)
- kv_scale [NP, 2, Hkv, P] f32 when int8 (per-token, per-head scales).
  Scales stay HEAD-major: Mosaic DMA needs a lane-aligned (128) minor
  dim on the per-page slice — P qualifies, Hkv alone does not — and the
  scatter relayout this costs is on 1/(2*D)th of the kv pool's bytes
- page_ids [B, maxp] int32 flat page ids; lengths [B] int32 past tokens
- cur_k / cur_v [B, 1, Hkv, D] current token (attended, not yet written)
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


class _PageBlockCopy:
    """Async copy of `ppcb` (page-id-indexed) pages into one VMEM buffer."""

    def __init__(self, pool_hbm, scale_hbm, kv_buf, scale_buf, sem,
                 page_ids, start, ppcb):
        self._copies = []
        for i in range(ppcb):
            pid = page_ids[start + i]
            self._copies.append(pltpu.make_async_copy(
                pool_hbm.at[pid], kv_buf.at[i], sem
            ))
            if scale_hbm is not None:
                self._copies.append(pltpu.make_async_copy(
                    scale_hbm.at[pid], scale_buf.at[i], sem
                ))

    def start(self):
        for c in self._copies:
            c.start()

    def wait(self):
        for c in self._copies:
            c.wait()


def _kernel(
    # scalar prefetch
    lengths_ref,            # [B] PAST tokens per slot (pool-resident)
    page_ids_ref,           # [B * maxp] flat
    valid_ref,              # [B] valid chunk-token COUNT (0 = dead slot)
    # inputs
    q_ref,                  # [1, Hkv, G*Tq, D] (block over b)
    curk_ref,               # [1, Tq, Hkv, D]
    curv_ref,               # [1, Tq, Hkv, D]
    slopes_ref,             # [Hkv, G*Tq] ALiBi slopes (zeros if unused)
    pool_ref,               # [NP, 2, P, Hkv, D] in HBM (ANY)
    scale_ref,              # [NP, 2, Hkv, P] in HBM (ANY) or dummy —
    #                         scales stay HEAD-major: a token-major
    #                         [.., P, Hkv] page slice has minor dim
    #                         Hkv < 128, which Mosaic cannot DMA (lane
    #                         tiling); head-major keeps P minor (aligned)
    # outputs
    o_ref,                  # [1, Hkv, G*Tq, D]
    # scratch
    kv_bufs,                # [2, ppcb, 2, P, Hkv, D] VMEM
    scale_bufs,             # [2, ppcb, 2, Hkv, P] VMEM
    sems,                   # [2] DMA semaphores
    m_s, l_s, acc_s,        # [Hkv, G*Tq, 128] x2, [Hkv, G*Tq, D]
    buf_idx_ref,            # [1] SMEM: double-buffer index
    flag_ref,               # [1] SMEM: first-iteration flag
    *,
    sm_scale: float,
    quantized: bool,
    ppcb: int,
    batch: int,
    has_cur: bool,
    n_cur: int,
    has_alibi: bool,
):
    b, blk = pl.program_id(0), pl.program_id(1)
    NP, _, P, Hkv, D = pool_ref.shape
    T = ppcb * P
    # compute dtype for the dots: int8 pool values are EXACTLY
    # representable in bf16 (8 mantissa bits >= 7-bit magnitudes), and the
    # MXU runs bf16 at 4x its f32 rate with f32 accumulation either way;
    # f32 pools (CPU tests) keep full precision
    ct = (jnp.float32 if pool_ref.dtype == jnp.float32 else jnp.bfloat16)

    @pl.when((b == 0) & (blk == 0))
    def _init_smem():
        buf_idx_ref[0] = 0
        flag_ref[0] = 1

    length = lengths_ref[b]
    blocks_used = jnp.maximum(pl.cdiv(length, T), 1)

    maxp = pl.num_programs(1) * ppcb

    def copy_for(b_, blk_, slot):
        # page_ids is flat [B * maxp] (2D SMEM rows cannot be sliced)
        return _PageBlockCopy(
            pool_ref, scale_ref if quantized else None,
            kv_bufs.at[slot],
            scale_bufs.at[slot] if quantized else None,
            sems.at[slot],
            page_ids_ref, b_ * maxp + blk_ * ppcb, ppcb,
        )

    def next_indices(b_, blk_):
        # next (b, blk) pair that does real work, for cross-block prefetch
        last = blk_ + 1 >= jnp.maximum(pl.cdiv(lengths_ref[b_], T), 1)
        nb = jnp.where(last, b_ + 1, b_)
        nblk_ = jnp.where(last, 0, blk_ + 1)
        return nb, nblk_

    @pl.when(blk < blocks_used)
    def _work():
        slot = buf_idx_ref[0]

        @pl.when(flag_ref[0] == 1)
        def _first():
            # no prior iteration prefetched for us: start our own copy
            copy_for(b, blk, slot).start()
            flag_ref[0] = 0

        nb, nblk2 = next_indices(b, blk)

        @pl.when(nb < batch)
        def _prefetch():
            nxt = 1 - slot
            copy_for(nb, nblk2, nxt).start()
            buf_idx_ref[0] = nxt

        copy_for(b, blk, slot).wait()

        q = q_ref[0].astype(ct)                             # [Hkv, G, D]
        # token-major pages: merge (ppcb, P) -> T free, then move Hkv to
        # the batch position for the per-head dots. The transpose is a
        # real VMEM relayout (Hkv crosses the sublane dim) — at bf16 it
        # shuffles 2 x T*Hkv*D*2 bytes per block, far below the ~2 x
        # pool-size HBM relayout the heads-major pool cost per step
        # (see module docstring).
        k = kv_bufs[slot, :, 0].reshape(T, Hkv, D).astype(ct)
        v = kv_bufs[slot, :, 1].reshape(T, Hkv, D).astype(ct)
        k = k.transpose(1, 0, 2)                            # [Hkv, T, D]
        v = v.transpose(1, 0, 2)

        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                   # [Hkv, G, T]
        if quantized:
            # head-major scale pages: leading-dim move + trailing merge
            # only (layout-preserving)
            ks = scale_bufs[slot, :, 0].transpose(1, 0, 2).reshape(Hkv, T)
            scores = scores * ks[:, None, :]
        scores = scores * sm_scale

        tok = blk * T + jax.lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)
        if has_alibi:
            # ALiBi: bias = -slope_h * (q_pos - kv_pos). Pool pages hold
            # tokens in logical order, so kv_pos = blk*T + tok; query col
            # c = g*n_cur + t sits at q_pos = length + (c % n_cur). All
            # visible entries have kv_pos < length <= q_pos.
            qoff = jax.lax.broadcasted_iota(
                jnp.int32, (1, q_ref.shape[2], 1), 1
            ) % n_cur
            # without a current chunk the (single) query's own KV is
            # already pooled at position length-1 — match the XLA
            # reference's q_position there (has_cur is static)
            qbase = length if has_cur else length - 1
            dist = (qbase + qoff - tok).astype(jnp.float32)
            scores = scores - slopes_ref[...][:, :, None] * dist
        scores = jnp.where(tok < length, scores, NEG_INF)

        m_prev = jnp.where(blk == 0, jnp.full_like(m_s, NEG_INF), m_s[...])
        l_prev = jnp.where(blk == 0, jnp.zeros_like(l_s), l_s[...])
        m_cur = jnp.max(scores, axis=-1)[..., None]         # [Hkv, G, 1]
        m_cur = jnp.broadcast_to(m_cur, m_prev.shape)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new[..., :1])
        # p uses m_new directly, so no separate beta factor is needed; the
        # normalizer sums the UNSCALED numerators (v scales fold into the
        # weighted v-sum only)
        l_new = l_prev * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=-1)[..., None], l_prev.shape
        )
        if quantized:
            vs = scale_bufs[slot, :, 1].transpose(1, 0, 2).reshape(Hkv, T)
            p = p * vs[:, None, :]
        m_s[...] = m_new
        l_s[...] = l_new

        pv = jax.lax.dot_general(
            p.astype(ct), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                   # [Hkv, G, D]
        acc_prev = jnp.where(
            blk == 0, jnp.zeros_like(acc_s), acc_s[...]
        )
        acc_s[...] = acc_prev * alpha[..., :1] + pv

        @pl.when(blk == blocks_used - 1)
        def _finish():
            if has_cur:
                # fold the not-yet-written current chunk (n_cur tokens) in
                # as a final "self block": chunk token j sits at logical
                # position length + j; query g*n_cur + t attends chunk
                # entries j <= t (causal within the chunk), j < valid count
                G2 = q_ref.shape[2]                         # G * n_cur
                qf = q_ref[0].astype(ct)                    # [Hkv, G2, D]
                ck = curk_ref[0].transpose(1, 0, 2).astype(ct)
                cv = curv_ref[0].transpose(1, 0, 2).astype(ct)
                # [Hkv, Tq, D] each
                s_self = jax.lax.dot_general(
                    qf, ck, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * sm_scale                                # [Hkv, G2, Tq]
                qtok = jax.lax.broadcasted_iota(
                    jnp.int32, (1, G2, n_cur), 1
                ) % n_cur
                jtok = jax.lax.broadcasted_iota(
                    jnp.int32, (1, G2, n_cur), 2
                )
                if has_alibi:
                    # chunk tokens sit at positions length + j: the
                    # relative distance within the self block is q - j
                    dist = (qtok - jtok).astype(jnp.float32)
                    s_self = s_self - slopes_ref[...][:, :, None] * dist
                mask = (jtok <= qtok) & (jtok < valid_ref[b])
                s_self = jnp.where(mask, s_self, NEG_INF)
                m_cur2 = jnp.max(s_self, axis=-1)[..., None]
                m_fin = jnp.maximum(
                    m_s[...], jnp.broadcast_to(m_cur2, m_s.shape)
                )
                alpha_f = jnp.exp(m_s[...] - m_fin)
                p_self = jnp.exp(s_self - m_fin[..., :1])   # [Hkv, G2, Tq]
                l_fin = l_s[...] * alpha_f + jnp.broadcast_to(
                    jnp.sum(p_self, axis=-1)[..., None], l_s.shape
                )
                pv_self = jax.lax.dot_general(
                    p_self.astype(ct), cv, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )                                           # [Hkv, G2, D]
                acc_fin = acc_s[...] * alpha_f[..., :1] + pv_self
                o_ref[0] = (
                    acc_fin / jnp.maximum(l_fin[..., :1], 1e-9)
                ).astype(o_ref.dtype)
            else:
                o_ref[0] = (
                    acc_s[...] / jnp.maximum(l_s[..., :1], 1e-9)
                ).astype(o_ref.dtype)


def _kernel_decode1(
    # scalar prefetch
    lengths_ref,            # [B] PAST tokens per slot (pool-resident)
    page_ids_ref,           # [B * maxp] flat
    valid_ref,              # [B] 1 = live slot, 0 = dead
    # inputs
    q_ref,                  # [1, Hkv, 1, D] (block over b; G2 == 1)
    curk_ref,               # [1, 1, Hkv, D]
    curv_ref,               # [1, 1, Hkv, D]
    slopes_ref,             # [Hkv, 1] ALiBi slopes (zeros if unused)
    pool_ref,               # [NP, 2, P, Hkv, D] in HBM (ANY)
    scale_ref,              # [NP, 2, Hkv, P] in HBM (ANY) or dummy
    # outputs
    o_ref,                  # [1, Hkv, 1, D]
    # scratch
    kv_bufs,                # [2, ppcb, 2, P, Hkv, D] VMEM
    scale_bufs,             # [2, ppcb, 2, Hkv, P] VMEM
    sems,                   # [2] DMA semaphores
    m_s, l_s,               # [1, Hkv] f32 (LANE-oriented running max/sum)
    acc_s,                  # [Hkv, 1, D] f32
    buf_idx_ref,            # [1] SMEM: double-buffer index
    flag_ref,               # [1] SMEM: first-iteration flag
    *,
    sm_scale: float,
    quantized: bool,
    ppcb: int,
    batch: int,
    has_cur: bool,
    has_alibi: bool,
):
    """TOKEN-major decode kernel (the MHA Tq == 1 hot path).

    The general kernel transposes every DMA'd block to head-major
    ([ppcb, P, Hkv, D] -> [Hkv, T, D]) and then runs an Hkv-batched
    matvec — on v5e that measured 2.55 ms/layer at the 7B 24-slot shape
    (81 GB/s of pages, ~10x off roofline): the per-head matvecs use one
    MXU sublane row in eight and the relayout shuffles 16 MB of VMEM per
    block. Here the block stays token-major and the scores become ONE
    real matmul against a block-diagonal q:

        scores[t, h] = (K [T, Hkv*D]  @  Qbd [Hkv*D, Hkv])[t, h],
        Qbd[h*D + d, h'] = q[h, d] * (h == h')

    The Hkv-fold FLOP waste is free next to the matvec's idle MXU rows,
    no big tensor is ever transposed, and the weighted v-sum is a fused
    broadcast-multiply + axis-0 reduction. Flash running max/sum stay
    lane-oriented [1, Hkv]; only 32-element vectors ever change layout.
    """
    b, blk = pl.program_id(0), pl.program_id(1)
    NP, _, P, Hkv, D = pool_ref.shape
    T = ppcb * P
    ct = (jnp.float32 if pool_ref.dtype == jnp.float32 else jnp.bfloat16)

    @pl.when((b == 0) & (blk == 0))
    def _init_smem():
        buf_idx_ref[0] = 0
        flag_ref[0] = 1

    length = lengths_ref[b]
    blocks_used = jnp.maximum(pl.cdiv(length, T), 1)
    maxp = pl.num_programs(1) * ppcb

    def copy_for(b_, blk_, slot):
        return _PageBlockCopy(
            pool_ref, scale_ref if quantized else None,
            kv_bufs.at[slot],
            scale_bufs.at[slot] if quantized else None,
            sems.at[slot],
            page_ids_ref, b_ * maxp + blk_ * ppcb, ppcb,
        )

    def next_indices(b_, blk_):
        last = blk_ + 1 >= jnp.maximum(pl.cdiv(lengths_ref[b_], T), 1)
        return jnp.where(last, b_ + 1, b_), jnp.where(last, 0, blk_ + 1)

    @pl.when(blk < blocks_used)
    def _work():
        slot = buf_idx_ref[0]

        @pl.when(flag_ref[0] == 1)
        def _first():
            copy_for(b, blk, slot).start()
            flag_ref[0] = 0

        nb, nblk2 = next_indices(b, blk)

        @pl.when(nb < batch)
        def _prefetch():
            nxt = 1 - slot
            copy_for(nb, nblk2, nxt).start()
            buf_idx_ref[0] = nxt

        copy_for(b, blk, slot).wait()

        # ONE matmul for all heads: K stays token-major (reshape only).
        # The block-diagonal query expands in f32: Mosaic only supports
        # non-no-op minor-dim inserts (q1[:, :, None]) for 32-bit types —
        # the bf16 version fails to compile ("Insertion of minor dim that
        # is not a no-op only supported for 32-bit types", chipbench r5).
        kq = kv_bufs[slot, :, 0].reshape(T, Hkv * D).astype(ct)
        q1 = q_ref[0].astype(jnp.float32).reshape(Hkv, D)
        rh = jax.lax.broadcasted_iota(jnp.int32, (Hkv, D, Hkv), 0)
        chd = jax.lax.broadcasted_iota(jnp.int32, (Hkv, D, Hkv), 2)
        qbd = jnp.where(
            rh == chd, q1[:, :, None], 0.0
        ).reshape(Hkv * D, Hkv).astype(ct)
        s = jax.lax.dot_general(
            kq, qbd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # [T, Hkv]
        if quantized:
            ks = scale_bufs[slot, :, 0].transpose(0, 2, 1).reshape(T, Hkv)
            s = s * ks
        s = s * sm_scale
        tok = blk * T + jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        if has_alibi:
            # Tq == 1: the query sits at position `length` when its KV is
            # the (unwritten) current chunk, else at `length - 1` (already
            # pooled) — matching paged_attention_reference's q_position
            dist = ((length if has_cur else length - 1) - tok).astype(
                jnp.float32)                                # [T, 1]
            s = s - jnp.swapaxes(slopes_ref[...], 0, 1) * dist
        s = jnp.where(tok < length, s, NEG_INF)

        m_prev = jnp.where(blk == 0, jnp.full_like(m_s, NEG_INF), m_s[...])
        l_prev = jnp.where(blk == 0, jnp.zeros_like(l_s), l_s[...])
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)                     # [1, Hkv]
        p = jnp.exp(s - m_new)                              # [T, Hkv]
        l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)
        if quantized:
            vs = scale_bufs[slot, :, 1].transpose(0, 2, 1).reshape(T, Hkv)
            p = p * vs
        m_s[...] = m_new
        l_s[...] = l_new

        # weighted v-sum: broadcast-multiply + axis-0 reduce, no transpose
        v3 = kv_bufs[slot, :, 1].reshape(T, Hkv, D).astype(ct)
        pv = jnp.sum(
            v3.astype(jnp.float32) * p[:, :, None], axis=0
        )                                                   # [Hkv, D]
        acc_prev = jnp.where(blk == 0, jnp.zeros_like(acc_s), acc_s[...])
        alpha_c = jnp.swapaxes(alpha, 0, 1)[:, :, None]     # [Hkv, 1, 1]
        acc_s[...] = acc_prev * alpha_c + pv[:, None, :]

        @pl.when(blk == blocks_used - 1)
        def _finish():
            if has_cur:
                # fold the current (not-yet-written) token in as a final
                # single-entry block at position `length` (ALiBi dist 0)
                qf = q_ref[0].astype(jnp.float32).reshape(Hkv, D)
                ck = curk_ref[0, 0].astype(jnp.float32)     # [Hkv, D]
                cv = curv_ref[0, 0].astype(jnp.float32)
                s_self = jnp.sum(qf * ck, axis=1, keepdims=True) * sm_scale
                s_self = jnp.where(valid_ref[b] > 0, s_self, NEG_INF)
                s_l = jnp.swapaxes(s_self, 0, 1)            # [1, Hkv]
                m_fin = jnp.maximum(m_s[...], s_l)
                alpha_f = jnp.exp(m_s[...] - m_fin)
                p_self = jnp.exp(s_l - m_fin)               # [1, Hkv]
                l_fin = l_s[...] * alpha_f + p_self
                pv_self = cv * jnp.swapaxes(p_self, 0, 1)   # [Hkv, D]
                acc_fin = (acc_s[:, 0] * jnp.swapaxes(alpha_f, 0, 1)
                           + pv_self)
                l_c = jnp.swapaxes(l_fin, 0, 1)             # [Hkv, 1]
                o_ref[0] = (
                    acc_fin / jnp.maximum(l_c, 1e-9)
                )[:, None, :].astype(o_ref.dtype)
            else:
                l_c = jnp.swapaxes(l_s[...], 0, 1)
                o_ref[0] = (
                    acc_s[:, 0] / jnp.maximum(l_c, 1e-9)
                )[:, None, :].astype(o_ref.dtype)


def paged_decode_attention(
    q: jax.Array,            # [B, Tq, H, D] (Tq = 1 decode; > 1 verify)
    kv_pages: jax.Array,     # [NP, 2, P, Hkv, D] bf16 or int8
    page_ids: jax.Array,     # [B, maxp] int32 (flat ids)
    lengths: jax.Array,      # [B] int32 past tokens per slot
    kv_scale=None,           # [NP, 2, Hkv, P] f32 when int8 (head-major)
    cur_k=None,              # [B, Tq, Hkv, D] current chunk (not in pool)
    cur_v=None,
    cur_valid=None,          # [B] int32 count of VALID chunk tokens
    #                          (0 = dead slot; chunk validity is a prefix)
    *,
    sm_scale: float | None = None,
    alibi_slopes=None,       # [H] f32 per-head ALiBi slopes (MPT)
    pages_per_block: int = 8,
    interpret=None,
) -> jax.Array:
    """Attention over the paged pool + the current chunk's self block.

    Tq == 1 is the decode step; Tq > 1 is the speculative-verify /
    chunked-continuation step: chunk token j sits at logical position
    ``lengths[b] + j`` and queries attend the pool plus the causal prefix
    of the chunk. ``alibi_slopes`` adds the MPT bias
    ``-slope_h * (q_pos - kv_pos)`` (ref mpt/attention.py:258-300).
    Returns [B, Tq, H, D]."""
    if interpret is None:
        interpret = _interpret_default()
    if q.shape[-1] % 128 != 0:
        # Mosaic tiles the trailing VMEM dim at 128 lanes; an unaligned
        # head_dim cannot be sliced from the page buffers (production
        # llama/MPT heads are 128) — serve via the XLA reference instead
        interpret = True
    if interpret:
        # manual-DMA double buffering has no faithful interpret-mode
        # emulation; tests use the XLA reference on CPU
        out = paged_attention_reference(
            q, kv_pages, page_ids, lengths, kv_scale,
            cur_k=cur_k, cur_v=cur_v, cur_valid=cur_valid,
            sm_scale=sm_scale, alibi_slopes=alibi_slopes,
        )
        return out.astype(q.dtype)
    B, Tq, H, D = q.shape
    NP, two, P, Hkv, _ = kv_pages.shape
    assert two == 2, kv_pages.shape
    maxp = page_ids.shape[1]
    G = H // Hkv
    G2 = G * Tq
    if sm_scale is None:
        sm_scale = D ** -0.5
    # double-buffered kv scratch must fit VMEM: 2 * ppcb * page_bytes <= 8MB
    page_bytes = 2 * Hkv * P * D * kv_pages.dtype.itemsize
    ppcb = max(min(pages_per_block, maxp, (8 << 20) // (2 * page_bytes)), 1)
    while maxp % ppcb:
        ppcb -= 1

    quantized = kv_scale is not None
    has_cur = cur_k is not None
    # [B, Tq, H, D] -> [B, Hkv, G*Tq, D]; flattened col = g * Tq + t
    qg = (q.transpose(0, 2, 1, 3)
          .reshape(B, Hkv, G, Tq, D).reshape(B, Hkv, G2, D))
    if not has_cur:
        assert Tq == 1, "multi-token queries require the current chunk"
        cur_k = jnp.zeros((B, Tq, Hkv, D), q.dtype)
        cur_v = cur_k
    if cur_valid is None:
        cur_valid = jnp.full((B,), Tq, jnp.int32)
    has_alibi = alibi_slopes is not None
    if has_alibi:
        # [H] -> [Hkv, G2]: head h = hkv*G + g (the q reshape below is
        # Hkv-major), flattened col c = g*Tq + t shares g's slope
        slopes = jnp.repeat(
            jnp.asarray(alibi_slopes, jnp.float32).reshape(Hkv, G), Tq,
            axis=1,
        )
    else:
        slopes = jnp.zeros((Hkv, G2), jnp.float32)

    # the token-major fast kernel covers the MHA decode hot path (one
    # query per head); GQA/MQA and multi-token verify take the general
    # head-major kernel
    fast = G2 == 1
    scratch = [
        pltpu.VMEM((2, ppcb, 2, P, Hkv, D), kv_pages.dtype),
        # always allocated (256 KB); only DMA'd into when quantized.
        # Head-major (see _kernel signature).
        pltpu.VMEM((2, ppcb, 2, Hkv, P), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM((1, Hkv) if fast else (Hkv, G2, 128), jnp.float32),
        pltpu.VMEM((1, Hkv) if fast else (Hkv, G2, 128), jnp.float32),
        pltpu.VMEM((Hkv, G2, D), jnp.float32),
        pltpu.SMEM((1,), jnp.int32),
        pltpu.SMEM((1,), jnp.int32),
    ]
    if not quantized:
        kv_scale = jnp.zeros((1, 2, 1, 1), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, maxp // ppcb),
        in_specs=[
            pl.BlockSpec(
                (1, Hkv, G2, D), lambda b, j, *_: (b, 0, 0, 0)
            ),
            pl.BlockSpec((1, Tq, Hkv, D), lambda b, j, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, Tq, Hkv, D), lambda b, j, *_: (b, 0, 0, 0)),
            pl.BlockSpec((Hkv, G2), lambda b, j, *_: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, Hkv, G2, D), lambda b, j, *_: (b, 0, 0, 0)
        ),
        scratch_shapes=scratch,
    )
    if fast:
        kernel = functools.partial(
            _kernel_decode1, sm_scale=sm_scale, quantized=quantized,
            ppcb=ppcb, batch=B, has_cur=has_cur, has_alibi=has_alibi,
        )
    else:
        kernel = functools.partial(
            _kernel, sm_scale=sm_scale, quantized=quantized, ppcb=ppcb,
            batch=B, has_cur=has_cur, n_cur=Tq, has_alibi=has_alibi,
        )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G2, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(lengths.astype(jnp.int32), page_ids.astype(jnp.int32).reshape(-1),
      cur_valid.astype(jnp.int32),
      qg, cur_k.reshape(B, Tq, Hkv, D), cur_v.reshape(B, Tq, Hkv, D),
      slopes, kv_pages, kv_scale)
    # [B, Hkv, G*Tq, D] -> [B, Tq, H, D]
    return (out.reshape(B, Hkv, G, Tq, D)
            .transpose(0, 3, 1, 2, 4).reshape(B, Tq, H, D))


def gather_pages(kv_pages, page_ids, kv_scale=None, dtype=jnp.float32):
    """[NP, 2, P, Hkv, D] pool -> dense k, v [B, S, Hkv, D] (XLA gather).

    The CPU/test/multi-token path; S = maxp * P. Token-major pages make
    this transpose-free: pages concatenate directly into the dense
    [S, Hkv, D] order.
    """
    B, maxp = page_ids.shape
    NP, _, P, Hkv, D = kv_pages.shape
    g = kv_pages[page_ids]                      # [B, maxp, 2, P, Hkv, D]
    g = g.astype(dtype)
    if kv_scale is not None:
        # scales are head-major [NP, 2, Hkv, P] (see module docstring)
        s = kv_scale[page_ids].transpose(0, 1, 2, 4, 3)
        g = g * s[..., None]                    # [B, maxp, 2, P, Hkv, 1]
    # -> [2, B, S, Hkv, D]
    g = g.transpose(2, 0, 1, 3, 4, 5).reshape(2, B, maxp * P, Hkv, D)
    return g[0], g[1]


def paged_attention_reference(
    q, kv_pages, page_ids, lengths, kv_scale=None,
    cur_k=None, cur_v=None, cur_valid=None, *, sm_scale=None,
    alibi_slopes=None,
):
    """Gather-based XLA reference (tests and the CPU path).

    ``cur_valid`` is the count of valid chunk tokens per slot (a prefix);
    chunk token j sits at logical position ``lengths[b] + j``."""
    from llava_plus_tpu.ops.attention import xla_attention

    B, Tq = q.shape[:2]
    P = kv_pages.shape[2]
    maxp = page_ids.shape[1]
    k, v = gather_pages(kv_pages, page_ids, kv_scale)

    S = maxp * P
    kv_seg = (jnp.arange(S)[None, :] < lengths[:, None]).astype(jnp.int32)
    if cur_k is not None:
        # current chunk appended at logical positions lengths + j
        k = jnp.concatenate([k, cur_k.astype(k.dtype)], axis=1)
        v = jnp.concatenate([v, cur_v.astype(v.dtype)], axis=1)
        valid = (jnp.full((B,), Tq, jnp.int32) if cur_valid is None
                 else cur_valid.astype(jnp.int32))
        j = jnp.arange(Tq, dtype=jnp.int32)[None]
        kv_seg = jnp.concatenate(
            [kv_seg, (j < valid[:, None]).astype(jnp.int32)], axis=1
        )
        q_positions = lengths[:, None].astype(jnp.int32) + j
        kv_positions = jnp.concatenate([
            jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S)),
            lengths[:, None].astype(jnp.int32) + j,
        ], axis=1)
    else:
        assert Tq == 1
        q_positions = (lengths - 1)[:, None]
        kv_positions = None
    q_seg = jnp.ones((B, Tq), jnp.int32)
    bias = None
    if alibi_slopes is not None:
        kvp = (kv_positions if kv_positions is not None
               else jnp.broadcast_to(
                   jnp.arange(k.shape[1], dtype=jnp.int32)[None],
                   (B, k.shape[1])))
        dist = (q_positions[:, :, None] - kvp[:, None, :]).astype(
            jnp.float32
        )
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        bias = -jnp.abs(dist)[:, None, :, :] * slopes[None, :, None, None]
    return xla_attention(
        q, k.astype(q.dtype), v.astype(q.dtype),
        causal=True, bias=bias, q_segment_ids=q_seg, kv_segment_ids=kv_seg,
        q_positions=q_positions, kv_positions=kv_positions,
        softmax_scale=sm_scale,
    )
