"""MPT decoder, TPU-native.

Functional replacement for the reference's vendored MPT
(``llava/model/language_model/mpt/modeling_mpt.py``, ``attention.py``,
``blocks.py``): ALiBi or learned positions, MQA (``multiquery``), prefix-LM,
``sequence_id`` attention restriction, optional qk-LayerNorm and qkv clamp.

ALiBi is expressed as a position-relative additive bias
``-slope * (q_pos - kv_pos)`` — softmax-equivalent to the reference's
key-absolute form (attention.py:293-299) and exact for the full/abs variant —
so KV-cache decode, padding, and packing all reuse the same attention op.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from llava_plus_tpu.models.configs import MptConfig
from llava_plus_tpu.models.llama import KVCache  # same cache layout
from llava_plus_tpu.ops.attention import attention
from llava_plus_tpu.ops.quant import matmul


def alibi_slopes(n_heads: int, alibi_bias_max: int = 8) -> jnp.ndarray:
    """Per-head ALiBi slopes (ref mpt/attention.py:284-291)."""
    n2 = 2 ** math.ceil(math.log2(n_heads))
    m = jnp.arange(1, n2 + 1, dtype=jnp.float32) * (alibi_bias_max / n2)
    slopes = 1.0 / jnp.power(2.0, m)
    if n2 != n_heads:
        slopes = jnp.concatenate([slopes[1::2], slopes[::2]])[:n_heads]
    return slopes


def alibi_bias_from_positions(
    q_pos: jax.Array, kv_pos: jax.Array, n_heads: int, alibi_bias_max: int = 8
) -> jax.Array:
    """bias[b, h, tq, tkv] = -slope_h * (q_pos - kv_pos).

    Positive (future) distances are handled by the causal mask, matching the
    reference's causal variant up to a per-row softmax constant; for the full
    (prefix-LM) variant the reference uses -|Δ|, which this equals on the
    visible (past) side and the mask covers elsewhere.
    """
    dist = (q_pos[:, :, None] - kv_pos[:, None, :]).astype(jnp.float32)
    slopes = alibi_slopes(n_heads, alibi_bias_max)
    return -jnp.abs(dist)[:, None, :, :] * slopes[None, :, None, None]


def init_params(cfg: MptConfig, key: jax.Array, dtype=jnp.bfloat16):
    keys = iter(jax.random.split(key, 8))
    D, L = cfg.d_model, cfg.n_layers
    F = cfg.expansion_ratio * D
    kv_dim = cfg.kv_heads * cfg.head_dim

    def norm(key, *shape):
        return jax.random.normal(key, shape, dtype) * 0.02

    layers = {
        "norm1": jnp.ones((L, D), dtype),
        "norm2": jnp.ones((L, D), dtype),
        "attn": {
            "wqkv": norm(next(keys), L, D, D + 2 * kv_dim),
            "out_proj": norm(next(keys), L, D, D),
        },
        "mlp": {
            "up_proj": norm(next(keys), L, D, F),
            "down_proj": norm(next(keys), L, F, D),
        },
    }
    if cfg.qk_ln:
        layers["q_ln"] = jnp.ones((L, D), dtype)
        layers["k_ln"] = jnp.ones((L, kv_dim), dtype)
    params = {
        "wte": norm(next(keys), cfg.vocab_size, D),
        "layers": layers,
        "norm_f": jnp.ones((D,), dtype),
    }
    if cfg.learned_pos_emb and not cfg.alibi:
        params["wpe"] = norm(next(keys), cfg.max_seq_len, D)
    return params


def _layer_norm_nobias(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (((xf - mean) * jax.lax.rsqrt(var + eps)) * w.astype(jnp.float32)).astype(x.dtype)


def embed_tokens(params, input_ids: jax.Array) -> jax.Array:
    safe = jnp.where(input_ids < 0, 0, input_ids)
    return jnp.take(params["wte"], safe, axis=0)


def _layer_forward(
    lp, h, bias, segment_ids, positions, cfg: MptConfig, layer_cache, cache_seg,
    prefix_lengths, attn_impl, paged_info=None, fresh_prefill=False,
    slopes=None,
):
    B, T, D = h.shape
    H, Hkv, Dh = cfg.n_heads, cfg.kv_heads, cfg.head_dim
    kv_dim = Hkv * Dh

    hn = _layer_norm_nobias(h, lp["norm1"], cfg.layer_norm_eps)
    qkv = matmul(hn, lp["attn"]["wqkv"])
    if cfg.clip_qkv:
        qkv = jnp.clip(qkv, -cfg.clip_qkv, cfg.clip_qkv)
    q, k, v = jnp.split(qkv, [D, D + kv_dim], axis=-1)
    if cfg.qk_ln:
        q = _layer_norm_nobias(q, lp["q_ln"], cfg.layer_norm_eps)
        k = _layer_norm_nobias(k, lp["k_ln"], cfg.layer_norm_eps)
    q = q.reshape(B, T, H, Dh)
    k = k.reshape(B, T, Hkv, Dh)
    v = v.reshape(B, T, Hkv, Dh)

    causal = not cfg.prefix_lm  # prefix visibility folded into bias below

    if layer_cache is not None and paged_info is not None:
        # Paged pool (shared machinery with llama): pool is a read-only
        # closure of the scan, this chunk's k/v are staged and written
        # once per step after the scan; ALiBi rides the kernel as
        # per-head slopes (paged_decode_attention) or the gather path as
        # an explicit bias.
        from llava_plus_tpu.models.llama import (
            _paged_layer_attention, _paged_quant,
        )

        kv_all, kvs_all, idx = layer_cache
        if fresh_prefill and T > 1:
            attn_out = attention(
                q, k, v,
                causal=True, bias=bias,
                q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
                softmax_scale=cfg.softmax_scale or Dh ** -0.5,
                impl=attn_impl,
            )
        else:
            attn_out = _paged_layer_attention(
                q, k, v, kv_all, kvs_all, idx, paged_info,
                segment_ids, positions, attn_impl,
                alibi_slopes=slopes,
                sm_scale=cfg.softmax_scale or Dh ** -0.5,
            )
        if kvs_all is not None:
            qk, sk = _paged_quant(k)
            qv, sv = _paged_quant(v)
            new_cache = (qk, qv, sk, sv)
        else:
            new_cache = (k, v, jnp.zeros(k.shape[:-1], jnp.float32),
                         jnp.zeros(k.shape[:-1], jnp.float32))
    elif layer_cache is not None:
        # full stacked cache carried through the scan, updated in place at
        # [idx] (see llama.py: the xs->ys form defeated donation aliasing);
        # scales present => int8 cache
        from llava_plus_tpu.models.llama import _cache_read, _cache_write

        k_all, v_all, ks_all, vs_all, idx = layer_cache
        b_idx = jnp.arange(B)[:, None]
        k_all, ks_all = _cache_write(k_all, ks_all, k, idx, b_idx, positions)
        v_all, vs_all = _cache_write(v_all, vs_all, v, idx, b_idx, positions)
        if ks_all is not None:
            # int8 cache: folded-scale attention straight off the int8
            # slices (see llama.py dense branch / ops.attention.
            # quant_cache_attention); ALiBi/prefix bias rides along.
            from llava_plus_tpu.ops.attention import quant_cache_attention
            import jax as _jax

            ix = lambda a: _jax.lax.dynamic_index_in_dim(
                a, idx, 0, keepdims=False
            )
            attn_out = quant_cache_attention(
                q, ix(k_all), ix(ks_all), ix(v_all), ix(vs_all),
                kv_segment_ids=cache_seg, q_positions=positions,
                bias=bias, softmax_scale=cfg.softmax_scale or Dh ** -0.5,
            )
        else:
            k_cache = _cache_read(k_all, ks_all, idx, q.dtype)
            v_cache = _cache_read(v_all, vs_all, idx, q.dtype)
            attn_out = attention(
                q, k_cache, v_cache,
                causal=True, bias=bias,
                q_segment_ids=segment_ids, kv_segment_ids=cache_seg,
                q_positions=positions,
                softmax_scale=cfg.softmax_scale or Dh ** -0.5,
                impl=attn_impl,
            )
        new_cache = (k_all, v_all, ks_all, vs_all)
    else:
        attn_out = attention(
            q, k, v,
            causal=causal, bias=bias,
            q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
            softmax_scale=cfg.softmax_scale or Dh ** -0.5,
            impl=attn_impl,
        )
        new_cache = None

    h = h + matmul(attn_out.reshape(B, T, D), lp["attn"]["out_proj"])

    hn = _layer_norm_nobias(h, lp["norm2"], cfg.layer_norm_eps)
    inner = jax.nn.gelu(
        matmul(hn, lp["mlp"]["up_proj"]).astype(jnp.float32),
        approximate=False,
    )
    h = h + matmul(inner.astype(hn.dtype), lp["mlp"]["down_proj"])
    return h, new_cache


def decoder_forward(
    params,
    cfg: MptConfig,
    inputs_embeds: jax.Array,
    *,
    positions: jax.Array,
    segment_ids: jax.Array,
    cache: Optional[KVCache] = None,
    prefix_mask: Optional[jax.Array] = None,
    sequence_id: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    fresh_prefill: bool = False,
) -> Tuple[jax.Array, Optional[KVCache]]:
    from llava_plus_tpu.models.llama import (
        PagedKVCache, _decode_unroll, _paged_write_all,
    )

    h = inputs_embeds
    B, T, D = h.shape
    paged = isinstance(cache, PagedKVCache)
    # static Python-loop layer iteration for decode steps — same ~390 us/
    # iteration scan-tax rationale as llama.decoder_forward
    unrolled = (cache is not None and not remat and T <= 8
                and _decode_unroll())

    if cfg.learned_pos_emb and not cfg.alibi:
        h = h + jnp.take(params["wpe"], positions, axis=0)

    new_cache_seg = None
    paged_info = None
    if cache is not None:
        b_idx = jnp.arange(B)[:, None]
        new_cache_seg = cache.seg.at[b_idx, positions].set(
            segment_ids, mode="drop"
        )
        if paged:
            # same page addressing as llama (models/llama.py)
            P = cache.page_size
            maxp = cache.page_table.shape[1]
            pidx = jnp.clip(positions // P, 0, maxp - 1)
            pages = jnp.take_along_axis(cache.page_table, pidx, axis=1)
            offsets = positions % P
            valid = ((positions < cache.max_len) & (segment_ids > 0)
                     & (positions < cache.alloc[:, None]))
            past_len = jnp.where(
                segment_ids[:, 0] > 0, positions[:, 0], 0
            ).astype(jnp.int32)
            past_len = jnp.minimum(past_len, cache.max_len)
            paged_info = (pages, offsets, valid, cache.page_table,
                          past_len, cache.seg)
            kv_pos = positions  # ALiBi handled inside the paged attention
        else:
            kv_pos = jnp.broadcast_to(jnp.arange(cache.max_len, dtype=jnp.int32), (B, cache.max_len))
    else:
        kv_pos = positions

    bias = None
    slopes = alibi_slopes(cfg.n_heads, cfg.alibi_bias_max) if cfg.alibi else None
    if cfg.alibi and not paged:
        bias = alibi_bias_from_positions(positions, kv_pos, cfg.n_heads, cfg.alibi_bias_max)
    elif cfg.alibi and paged and fresh_prefill:
        # paged fresh prefill attends the local chunk only
        bias = alibi_bias_from_positions(positions, positions, cfg.n_heads, cfg.alibi_bias_max)
    if cfg.prefix_lm and prefix_mask is not None:
        # visible where causal OR key-in-prefix (ref modeling_mpt.py:119-131)
        q_pos = positions
        causal_ok = kv_pos[:, None, :] <= q_pos[:, :, None]
        prefix_ok = prefix_mask[:, None, :].astype(bool)
        visible = causal_ok | prefix_ok
        neg = jnp.float32(-1e9)
        extra = jnp.where(visible, 0.0, neg)[:, None, :, :]
        bias = extra if bias is None else bias + extra
    if cfg.attn_uses_sequence_id and sequence_id is not None:
        same = sequence_id[:, :, None] == sequence_id[:, None, :]
        extra = jnp.where(same, 0.0, jnp.float32(-1e9))[:, None, :, :]
        bias = extra if bias is None else bias + extra

    if paged:
        def body(carry, xs):
            carry_h, = carry
            lp, idx = xs
            h_out, staged = _layer_forward(
                lp, carry_h, bias, segment_ids, positions, cfg,
                (cache.kv, cache.kv_scale, idx), new_cache_seg, None,
                attn_impl, paged_info, fresh_prefill, slopes,
            )
            return (h_out,), staged

        if remat:
            body = jax.checkpoint(body)
        L = cfg.n_layers
        if unrolled:
            stages = []
            for i in range(L):
                lp_i = jax.tree.map(lambda a: a[i], params["layers"])
                (h,), staged = body((h,), (lp_i, jnp.int32(i)))
                stages.append(staged)
            stage_k, stage_v, stage_sk, stage_sv = (
                jnp.stack(parts) for parts in zip(*stages)
            )
        else:
            (h,), (stage_k, stage_v, stage_sk, stage_sv) = jax.lax.scan(
                body,
                (h,),
                (params["layers"], jnp.arange(L, dtype=jnp.int32)),
            )
        pages, offsets, valid = paged_info[0], paged_info[1], paged_info[2]
        kvp, kvsp = _paged_write_all(
            cache.kv, cache.kv_scale, stage_k, stage_v, stage_sk, stage_sv,
            pages, offsets, valid,
        )
        new_cache = PagedKVCache(
            kv=kvp, seg=new_cache_seg, page_table=cache.page_table,
            alloc=cache.alloc, kv_scale=kvsp,
        )
    elif cache is not None:
        def body(carry, lp):
            carry_h, k_all, v_all, ks_all, vs_all, idx = carry
            h_out, (k_all, v_all, ks_all, vs_all) = _layer_forward(
                lp, carry_h, bias, segment_ids, positions, cfg,
                (k_all, v_all, ks_all, vs_all, idx), new_cache_seg, None,
                attn_impl,
            )
            return (h_out, k_all, v_all, ks_all, vs_all, idx + 1), None

        if remat:
            body = jax.checkpoint(body)
        if unrolled:
            carry = (h, cache.k, cache.v, cache.k_scale, cache.v_scale,
                     jnp.int32(0))
            for i in range(cfg.n_layers):
                lp_i = jax.tree.map(lambda a: a[i], params["layers"])
                carry, _ = body(carry, lp_i)
            h, ks, vs, kss, vss, _ = carry
        else:
            (h, ks, vs, kss, vss, _), _ = jax.lax.scan(
                body,
                (h, cache.k, cache.v, cache.k_scale, cache.v_scale,
                 jnp.int32(0)),
                params["layers"],
            )
        new_cache = KVCache(k=ks, v=vs, seg=new_cache_seg,
                            k_scale=kss, v_scale=vss)
    else:
        def body(carry_h, lp):
            h_out, _ = _layer_forward(
                lp, carry_h, bias, segment_ids, positions, cfg,
                None, None, None, attn_impl,
            )
            return h_out, None

        if remat:
            body = jax.checkpoint(body)
        h, _ = jax.lax.scan(body, h, params["layers"])
        new_cache = None

    h = _layer_norm_nobias(h, params["norm_f"], cfg.layer_norm_eps)
    return h, new_cache


def lm_head(params, cfg: MptConfig, hidden: jax.Array) -> jax.Array:
    """Tied-embedding head (ref llava_mpt.py:79: F.linear(h, wte.weight))."""
    logits = jnp.dot(hidden, params["wte"].T, preferred_element_type=jnp.float32)
    if cfg.logit_scale is not None:
        logits = logits * cfg.logit_scale
    return logits


def forward(
    params,
    cfg: MptConfig,
    input_ids: Optional[jax.Array] = None,
    *,
    inputs_embeds: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    cache: Optional[KVCache] = None,
    prefix_mask: Optional[jax.Array] = None,
    sequence_id: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    fresh_prefill: bool = False,
) -> Tuple[jax.Array, Optional[KVCache]]:
    if inputs_embeds is None:
        inputs_embeds = embed_tokens(params, input_ids)
    B, T = inputs_embeds.shape[:2]
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    if segment_ids is None:
        segment_ids = jnp.ones((B, T), jnp.int32)
    h, new_cache = decoder_forward(
        params, cfg, inputs_embeds,
        positions=positions, segment_ids=segment_ids, cache=cache,
        prefix_mask=prefix_mask, sequence_id=sequence_id,
        attn_impl=attn_impl, remat=remat, fresh_prefill=fresh_prefill,
    )
    return lm_head(params, cfg, h), new_cache


def create_cache(cfg: MptConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.n_layers, batch, max_len, cfg.kv_heads, cfg.head_dim)
    quantized = dtype == jnp.int8
    return KVCache(
        k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
        seg=jnp.zeros((batch, max_len), jnp.int32),
        k_scale=jnp.zeros(shape[:-1] + (1,), jnp.float32) if quantized else None,
        v_scale=jnp.zeros(shape[:-1] + (1,), jnp.float32) if quantized else None,
    )
