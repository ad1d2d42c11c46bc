"""Attention entry point: one API, multiple backends.

Replaces the reference's three interchangeable attention impls and monkey
patches (``llava/model/language_model/mpt/attention.py:20-150``,
``llava/train/llama_flash_attn_monkey_patch.py``) with explicit dispatch:

- ``xla``:   reference implementation in pure jnp (runs anywhere; XLA already
             fuses the softmax chain well on TPU).
- ``pallas``: fused Pallas flash-attention kernel (TPU-only, the fast path —
             see ``ops/flash_attention.py``).

Layout: q [B, Tq, H, D]; k, v [B, Tkv, Hkv, D] with H % Hkv == 0 (GQA/MQA).
All masking is expressed through ``segment_ids`` (padding) + ``causal`` +
an optional additive ``bias`` (ALiBi), so every model variant in the
framework uses the same kernel surface.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    bias: Optional[jax.Array] = None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    q_positions: Optional[jax.Array] = None,
    kv_positions: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
) -> jax.Array:
    """Reference attention in pure jnp with fp32 softmax accumulation.

    ``q_positions`` [B, Tq]: absolute position of each query within the kv
    sequence (kv slot index == kv position). Used for KV-cache attention
    where Tq != Tkv or rows are padded. Defaults to suffix alignment
    (q[i] at position Tkv - Tq + i).
    ``kv_positions`` [B, Tkv]: absolute position of each kv entry; defaults
    to its slot index (iota). Used when the kv axis concatenates a cache
    view with the current chunk (deferred paged writes).
    """
    B, Tq, H, D = q.shape
    _, Tkv, Hkv, _ = k.shape
    assert H % Hkv == 0, (H, Hkv)
    groups = H // Hkv

    scale = softmax_scale if softmax_scale is not None else D ** -0.5

    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    if groups > 1:
        qf = qf.reshape(B, Tq, Hkv, groups, D)
        logits = jnp.einsum("btkgd,bskd->bkgts", qf, kf)
        logits = logits.reshape(B, H, Tq, Tkv)
    else:
        logits = jnp.einsum("bthd,bshd->bhts", qf, kf)

    if bias is not None:
        logits = logits + bias.astype(jnp.float32)

    mask = None
    if causal:
        if kv_positions is not None:
            qp = (q_positions if q_positions is not None
                  else jax.lax.broadcasted_iota(
                      jnp.int32, (B, Tq), 1) + (Tkv - Tq))
            causal_mask = kv_positions[:, None, :] <= qp[:, :, None]
            mask = causal_mask[:, None]  # [B, 1, Tq, Tkv]
        elif q_positions is not None:
            kv_pos = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tkv), 1)
            causal_mask = kv_pos[None] <= q_positions[:, :, None]
            mask = causal_mask[:, None]  # [B, 1, Tq, Tkv]
        else:
            kv_pos = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tkv), 1)
            q_pos = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tkv), 0)
            causal_mask = kv_pos <= q_pos + (Tkv - Tq)
            mask = causal_mask[None, None]
    if q_segment_ids is not None or kv_segment_ids is not None:
        assert q_segment_ids is not None and kv_segment_ids is not None
        seg = (
            (q_segment_ids[:, :, None] == kv_segment_ids[:, None, :])
            & (kv_segment_ids[:, None, :] != 0)
        )[:, None]  # [B, 1, Tq, Tkv]
        mask = seg if mask is None else (mask & seg)

    if mask is not None:
        logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)

    probs = jax.nn.softmax(logits, axis=-1)
    if groups > 1:
        probs_r = probs.reshape(B, Hkv, groups, Tq, Tkv)
        out = jnp.einsum("bkgts,bskd->btkgd", probs_r, vf)
        out = out.reshape(B, Tq, H, D)
    else:
        out = jnp.einsum("bhts,bshd->bthd", probs, vf)
    return out.astype(q.dtype)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    bias: Optional[jax.Array] = None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    q_positions: Optional[jax.Array] = None,
    kv_positions: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    impl: str = "auto",
) -> jax.Array:
    """Dispatching attention. ``impl`` in {"auto", "xla", "pallas"}."""
    if kv_positions is not None:
        impl = "xla"  # explicit kv positions are an XLA-path feature
    if impl == "auto":
        impl = "pallas" if _can_use_pallas(q, k, bias, q_positions) else "xla"
    if impl == "pallas" and bias is not None:
        # The fused kernel takes ALiBi via alibi_slopes, not an additive
        # bias tensor; an explicit impl="pallas" with bias (MPT ALiBi /
        # prefix-LM path) must compute the right logits, not silently drop
        # the bias on the shard_mapped multi-device branch below.
        impl = "xla"
    if impl == "pallas":
        from llava_plus_tpu.ops.flash_attention import flash_attention
        from llava_plus_tpu.parallel.mesh import active_mesh

        mesh = active_mesh()
        if mesh is not None and mesh.devices.size > 1:
            # pallas_call has no GSPMD partitioning rule: under a live
            # multi-device mesh the kernel must be explicitly shard_mapped
            # (batch over dp/fsdp, heads over tp; attention is pointwise
            # in both, so no collectives). Without this, compiling the
            # train step for a REAL TPU topology fails with "Mosaic
            # kernels cannot be automatically partitioned" — the virtual
            # CPU mesh never catches it because the kernel falls back to
            # the XLA reference off-TPU (found via v5e:2x4 chipless AOT
            # compile, round 4).
            wrapped = _shard_mapped_flash(mesh, q, k, causal, softmax_scale)
            if wrapped is not None:
                return wrapped(q, k, v, q_segment_ids, kv_segment_ids)
            impl = "xla"  # unshardable shape (heads/batch not divisible)
        else:
            return flash_attention(
                q, k, v,
                causal=causal,
                bias=bias,
                q_segment_ids=q_segment_ids,
                kv_segment_ids=kv_segment_ids,
                softmax_scale=softmax_scale,
            )
    return xla_attention(
        q, k, v,
        causal=causal, bias=bias,
        q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
        q_positions=q_positions, kv_positions=kv_positions,
        softmax_scale=softmax_scale,
    )


def _shard_mapped_flash(mesh, q, k, causal, softmax_scale):
    """Build a shard_mapped flash-attention caller for ``mesh``, or None
    when the shapes don't divide the mesh (caller falls back to XLA).

    Per-shard work is independent — batch shards over the data axes,
    heads over tp — so the body is the plain kernel with no collectives.
    The input specs match the activation constraints `_layer_forward`
    already pins (batch, None, "tp", None), so no resharding is inserted.
    """
    from jax.sharding import PartitionSpec as P

    from llava_plus_tpu.ops.flash_attention import flash_attention

    names = {a: n for a, n in zip(mesh.axis_names, mesh.devices.shape)}
    batch_axes = tuple(a for a in ("dp", "fsdp") if names.get(a, 1) > 1)
    tp = "tp" if names.get("tp", 1) > 1 else None
    data_ways = 1
    for a in batch_axes:
        data_ways *= names[a]
    tp_ways = names.get("tp", 1) if tp else 1
    B, _, H, _ = q.shape
    Hkv = k.shape[2]
    if B % data_ways or H % tp_ways or Hkv % tp_ways:
        return None
    bspec = batch_axes if batch_axes else None
    qkv = P(bspec, None, tp, None)
    # None args (no segments) carry no leaves; the spec is then unused
    seg = P(bspec, None)

    def body(q, k, v, q_seg, kv_seg):
        return flash_attention(
            q, k, v, causal=causal,
            q_segment_ids=q_seg, kv_segment_ids=kv_seg,
            softmax_scale=softmax_scale,
        )

    # check_vma=False: the kernel's custom_vjp residuals don't carry
    # varying-mesh-axis metadata; every operand is explicitly sharded, so
    # the replication check adds nothing here
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(qkv, qkv, qkv, seg, seg),
        out_specs=qkv,
        check_vma=False,
    )


def quant_cache_attention(
    q: jax.Array,
    kq: jax.Array,
    ks: jax.Array,
    vq: jax.Array,
    vs: jax.Array,
    *,
    kv_segment_ids: jax.Array,
    q_positions: jax.Array,
    bias: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
) -> jax.Array:
    """Decode attention reading the int8 KV cache NATIVELY (folded scales).

    The dequant-then-attend path (``_cache_read`` + :func:`xla_attention`)
    upcasts the whole [B, S, H, D] cache slice to f32 before the einsums;
    on v5e the folded form below measures 1.29x faster at the 7B b16
    serving shape (tools/bench_decode_attn.py: 26.8 vs 34.6 ms/step for a
    32-layer sweep) because the cache feeds the MXU as a fused int8->bf16
    convert and the f32 work shrinks to the [B, H, Tq, S] score tensor:

    - k_scale is constant along D (the score contraction), so it scales
      the scores instead of the keys;
    - v_scale is constant along D and contracts over S, so it folds into
      the probabilities instead of the values.

    Same math as dequantizing, reassociated (measured max rel err ~3e-3
    vs the dequant path — inside the int8 quantization noise).

    q [B, Tq, H, D] (bf16); kq/vq int8 [B, S, Hkv, D]; ks/vs f32
    [B, S, Hkv, 1]. ``q_positions`` [B, Tq] absolute positions (cache
    slot == position); ``bias`` [B or 1, H, Tq, S] additive (ALiBi).
    """
    B, Tq, H, D = q.shape
    S, Hkv = kq.shape[1], kq.shape[2]
    assert H % Hkv == 0, (H, Hkv)
    groups = H // Hkv
    scale = softmax_scale if softmax_scale is not None else D ** -0.5

    kb = kq.astype(q.dtype)            # fused operand convert, bf16 MXU
    if groups > 1:
        qg = q.reshape(B, Tq, Hkv, groups, D)
        logits = jnp.einsum(
            "btkgd,bskd->bkgts", qg, kb,
            preferred_element_type=jnp.float32,
        )                               # [B, Hkv, G, Tq, S]
        kscale = jnp.transpose(ks[..., 0], (0, 2, 1))  # [B, Hkv, S]
        logits = (logits * (kscale * scale)[:, :, None, None, :]).reshape(
            B, H, Tq, S
        )
    else:
        logits = jnp.einsum(
            "bthd,bshd->bhts", q, kb,
            preferred_element_type=jnp.float32,
        )
        kscale = jnp.transpose(ks[..., 0], (0, 2, 1))
        logits = logits * (kscale * scale)[:, :, None, :]

    if bias is not None:
        logits = logits + bias.astype(jnp.float32)

    kv_pos = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    mask = (kv_pos[:, None, :] <= q_positions[:, :, None])[:, None]
    mask = mask & (kv_segment_ids != 0)[:, None, None, :]
    logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)

    vscale = jnp.transpose(vs[..., 0], (0, 2, 1))       # [B, Hkv, S]
    vb = vq.astype(q.dtype)
    if groups > 1:
        pg = probs.reshape(B, Hkv, groups, Tq, S)
        pg = (pg * vscale[:, :, None, None, :]).astype(q.dtype)
        out = jnp.einsum(
            "bkgts,bskd->btkgd", pg, vb,
            preferred_element_type=jnp.float32,
        ).reshape(B, Tq, H, D)
    else:
        pv = (probs * vscale[:, :, None, :]).astype(q.dtype)
        out = jnp.einsum(
            "bhts,bshd->bthd", pv, vb,
            preferred_element_type=jnp.float32,
        )
    return out.astype(q.dtype)


def _can_use_pallas(q, k, bias, q_positions) -> bool:
    if not _on_tpu():
        return False
    B, Tq, H, D = q.shape
    Tkv = k.shape[1]
    # The fused kernel targets training/prefill: suffix-aligned q, block-sized
    # sequence lengths, MXU-friendly head dim.
    if q_positions is not None:
        return False
    if bias is not None:
        return False  # ALiBi goes through alibi_nheads; arbitrary bias -> XLA
    if Tq != Tkv:
        return False
    if D % 128 != 0:
        return False
    if Tq < 256:
        return False  # too small to beat fused XLA attention
    return True
