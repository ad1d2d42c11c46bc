"""LLaMA/Vicuna decoder, TPU-native.

Functional replacement for the reference's HF ``LlamaForCausalLM`` backbone
(reached through ``llava/model/language_model/llava_llama.py``). Differences
by design:

- pure functions over a parameter pytree; no modules, no monkey patches —
  the attention backend is an argument (``ops/attention.py``);
- ``lax.scan`` over stacked layer parameters (single compiled layer body,
  fast XLA compiles, natural remat point);
- explicit ``positions`` and ``segment_ids`` everywhere, so prefill, padded
  batches, and KV-cache decode are the same code path;
- weights live as ``[in, out]`` matrices (x @ w), bf16 by default, fp32
  master copies only in the optimizer.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from llava_plus_tpu.models.configs import LlamaConfig
from llava_plus_tpu.ops.attention import attention
from llava_plus_tpu.ops.quant import matmul
from llava_plus_tpu.parallel.mesh import constrain

_BATCH = ("dp", "fsdp")  # batch dim of activations shards over both


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Per-layer stacked KV cache.

    k, v: [L, B, S, Hkv, Dh]; seg: [B, S] segment ids of written tokens
    (0 = empty slot). Slot index == token position. (A [.., Hkv, S, Dh]
    layout was tried for the flash-decode kernel and reverted: the extra
    index dimension made the prefill scatter and the per-layer read
    transpose cost more than the kernel saved.)

    With ``dtype=jnp.int8`` (``create(..., dtype=jnp.int8)``) the cache is
    stored quantized with one f32 scale per (layer, slot, token, kv-head)
    in ``k_scale``/``v_scale`` [L, B, S, Hkv, 1]; the dequant fuses into
    the decode attention, so int8 dominates the HBM traffic. Halves the
    cache share of the decode bandwidth bill and doubles how many slots fit.
    """

    k: jax.Array
    v: jax.Array
    seg: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @classmethod
    def create(
        cls, cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16
    ) -> "KVCache":
        shape = (cfg.num_hidden_layers, batch, max_len, cfg.num_key_value_heads, cfg.head_dim)
        quantized = dtype == jnp.int8
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            seg=jnp.zeros((batch, max_len), jnp.int32),
            k_scale=jnp.zeros(shape[:-1] + (1,), jnp.float32) if quantized else None,
            v_scale=jnp.zeros(shape[:-1] + (1,), jnp.float32) if quantized else None,
        )

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Paged KV cache: one combined page pool + per-slot page tables
    (the BASELINE north star's "paged-KV continuous-batched decode").

    kv: [L, Np, 2, P, Hkv, Dh] — dim 2 selects K (0) / V (1). One page is
    a contiguous [2, P, Hkv, Dh] block: the unit the Pallas paged-decode
    kernel DMAs from HBM (ops/paged_attention.py), carrying BOTH k and v
    for ALL heads so one async copy serves the whole attention block.
    Token-major WITHIN the page (P above Hkv) so one token's [Hkv, Dh]
    block is contiguous: the deferred-write scatter's preferred layout is
    then exactly XLA's default layout. With heads-major pages the TPU
    scatter emitter demands layout {5,3,4,2,1,0} while the pallas kernel
    pins the default — XLA reconciled them with TWO whole-pool relayout
    copies inside every decode step (6 GB of HLO temp + ~12 GB of HBM
    copy traffic per step at a 24-slot 7B pool; measured on v5e, round 4).
    page_table: [B, max_pages] int32 per-layer page ids per serving slot
    (the same id addresses page l*Np + id of the flattened pool in layer
    l); seg: [B, max_pages*P] dense segment ids by logical position.
    int8 pools carry per-(token, head) scales kv_scale [L, Np, 2, Hkv, P]
    — scales stay HEAD-major: their page slice needs a lane-aligned minor
    dim for the kernel's DMA (P = 128; Hkv alone is not), and the ~2 x
    scale-pool relayout the scatter then costs is ~3% of the kv pool's.

    Unlike the dense :class:`KVCache` (slot = fixed max_len stripe), pool
    pages are allocated per request for prompt_len + budget, so long
    contexts (> 2048) and short chats share the same HBM pool densely.
    """

    kv: jax.Array
    seg: jax.Array
    page_table: jax.Array
    # tokens allocated per slot (pages * page_size). Writes at positions
    # >= alloc are DROPPED: page_table filler entries are 0, and without
    # this mask a decode chunk running past a slot's allocation (budget
    # exhausts mid-chunk) would scatter garbage into page 0 — a page that
    # may belong to another live request.
    alloc: jax.Array = None
    kv_scale: Optional[jax.Array] = None

    @classmethod
    def create(cls, cfg, batch: int, *, num_pages: int,
               max_pages_per_slot: int, page_size: int = 128,
               dtype=jnp.bfloat16) -> "PagedKVCache":
        # cfg is LlamaConfig or MptConfig (both decoders share the pool)
        n_layers = getattr(cfg, "num_hidden_layers", None) or cfg.n_layers
        kv_heads = getattr(cfg, "num_key_value_heads", None) or cfg.kv_heads
        shape = (n_layers, num_pages, 2, page_size, kv_heads, cfg.head_dim)
        quantized = dtype == jnp.int8
        return cls(
            kv=jnp.zeros(shape, dtype),
            seg=jnp.zeros((batch, max_pages_per_slot * page_size), jnp.int32),
            page_table=jnp.zeros((batch, max_pages_per_slot), jnp.int32),
            alloc=jnp.full((batch,), max_pages_per_slot * page_size,
                           jnp.int32),
            kv_scale=(jnp.zeros(
                (n_layers, num_pages, 2, kv_heads, page_size), jnp.float32
            ) if quantized else None),
        )

    @property
    def page_size(self) -> int:
        return self.kv.shape[3]

    @property
    def num_pages(self) -> int:
        return self.kv.shape[1]

    @property
    def max_len(self) -> int:
        return self.page_table.shape[1] * self.page_size

    @property
    def quantized(self) -> bool:
        return self.kv_scale is not None


def _paged_scatter(pool, idx4, vals, *, window_dims, operand_dims):
    """lax.scatter of per-token windows into the paged pool. Direct
    scatter (not jnp .at[]): mixed advanced indexing with a slice between
    index arrays would transpose the multi-GB pool per layer — lax.scatter
    handles arbitrary operand dims in place."""
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=window_dims,
        inserted_window_dims=operand_dims,
        scatter_dims_to_operand_dims=operand_dims,
    )
    return jax.lax.scatter(
        pool, idx4, vals.astype(pool.dtype), dnums,
        indices_are_sorted=False, unique_indices=False,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
    )


def _paged_quant(new):
    """Per-(token, head) symmetric int8: [.., Hkv, D] -> (int8, scale[.., Hkv])."""
    nf = new.astype(jnp.float32)
    scale = jnp.maximum(
        jnp.max(jnp.abs(nf), axis=-1, keepdims=True), 1e-8
    ) / 127.0
    q = jnp.clip(jnp.round(nf / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0]


def _paged_write_all(pool, scales, stage_k, stage_v, stage_sk, stage_sv,
                     pages, offsets, valid):
    """Write staged stage_k/stage_v [L,B,T,Hkv,D] (every layer's current
    chunk, already quantized when the pool is int8) into the
    [L,Np,2,P,Hkv,D] pool in ONE scatter per tensor.

    Deferred from the layer scan: a scatter's operand is the multi-GB pool,
    and per-layer scatters cost far more than the attention they feed (the
    kernel attends to the current token directly via its self block, so
    nothing reads these writes until the next decode step). Quantization
    happens per layer inside the scan (_paged_quant) so the staging is
    int8, never a [L,B,T,Hkv,D] fp32 transient (which OOMs long prefills).
    """
    L, B, T, Hkv, D = stage_k.shape
    npages = pool.shape[1]
    pages = jnp.where(valid, pages, npages)  # out of range -> dropped
    lay = jnp.broadcast_to(
        jnp.arange(L, dtype=jnp.int32)[:, None, None], (L, B, T)
    )
    pages = jnp.broadcast_to(pages[None], (L, B, T))
    offsets = jnp.broadcast_to(offsets[None], (L, B, T))
    N = L * B * T

    def idx4(kv_sel):
        sel = jnp.full((L, B, T), kv_sel, jnp.int32)
        return jnp.stack([lay, pages, sel, offsets], axis=-1).reshape(N, 4)

    # operand [L, Np, 2, P, Hkv, D]: indices address dims (0,1,2,3);
    # the (Hkv, D) window maps to the two MINOR-MOST dims (4, 5) — the
    # TPU scatter emitter's required layout is then the default layout
    # (window dims minor and contiguous), so no whole-pool relayout
    # copies appear around the scatter (see PagedKVCache docstring)
    def put(pool, vals, kv_sel):
        return _paged_scatter(
            pool, idx4(kv_sel), vals.reshape(N, Hkv, D),
            window_dims=(1, 2), operand_dims=(0, 1, 2, 3),
        )

    pool = put(pool, stage_k, 0)
    pool = put(pool, stage_v, 1)
    if scales is None:
        return pool, None

    # scales operand [L, Np, 2, Hkv, P] (head-major, see PagedKVCache):
    # indices address dims (0,1,2,4), window (Hkv,) maps to dim 3. The
    # scatter emitter relayouts the scale pool around this write (window
    # not minor-most), but the scale pool is 1/(2*D) the kv pool's bytes.
    def put_s(scales, vals, kv_sel):
        return _paged_scatter(
            scales, idx4(kv_sel), vals.reshape(N, Hkv),
            window_dims=(1,), operand_dims=(0, 1, 2, 4),
        )

    scales = put_s(scales, stage_sk, 0)
    scales = put_s(scales, stage_sv, 1)
    return pool, scales


def _cache_write(all_vals, all_scales, new, idx, b_idx, positions):
    """Write new [B,T,H,D] values into the stacked [L,B,S,H,D] cache at
    [idx, b, pos], quantizing per (token, head) when the cache carries
    scales."""
    if all_scales is None:
        return all_vals.at[idx, b_idx, positions].set(
            new.astype(all_vals.dtype), mode="drop"
        ), None
    nf = new.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(nf), axis=-1, keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(nf / scale), -127, 127).astype(jnp.int8)
    all_vals = all_vals.at[idx, b_idx, positions].set(q, mode="drop")
    all_scales = all_scales.at[idx, b_idx, positions].set(scale, mode="drop")
    return all_vals, all_scales


def _scan_unroll() -> int:
    """Layer-scan unroll factor (LLAVA_SCAN_UNROLL, default 1).

    Measured NEGATIVE for serving decode on v5e: unroll=4 dropped the
    batch-16 headline from 410 to 260 img+tok/s (the unrolled body breaks
    XLA's in-place aliasing of the scanned KV cache, so cache slices copy
    per unrolled layer). Kept as an experiment knob; leave at 1.
    """
    import os

    try:
        return max(int(os.environ.get("LLAVA_SCAN_UNROLL", "1")), 1)
    except ValueError:
        return 1


def _decode_unroll() -> bool:
    """Static Python-loop layer iteration for decode steps
    (LLAVA_DECODE_UNROLL, default on for TPU).

    Distinct from LLAVA_SCAN_UNROLL (scan's unroll= option): scan-unroll
    keeps DYNAMIC layer indices, which copy every unrolled layer's cache
    slice (the round-3 410 -> 260 regression). The Python loop bakes the
    layer index into each dynamic_update_slice as a constant, so cache
    writes stay in place and weight slices are contiguous views."""
    import os

    return os.environ.get("LLAVA_DECODE_UNROLL", "1") != "0"


def _decode_kernel_ok() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _cache_read(all_vals, all_scales, idx, dtype):
    """Layer slice [B,S,H,D], dequantized if scales present (the dequant
    fuses into the decode attention einsum)."""
    vals = jax.lax.dynamic_index_in_dim(all_vals, idx, 0, keepdims=False)
    if all_scales is None:
        return vals
    scale = jax.lax.dynamic_index_in_dim(all_scales, idx, 0, keepdims=False)
    return (vals.astype(jnp.float32) * scale).astype(dtype)


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------

def init_params(cfg: LlamaConfig, key: jax.Array, dtype=jnp.bfloat16):
    """Random-normal init (scale 0.02), shapes matching the HF layout after
    transposition. Used for tests and from-scratch training."""
    keys = iter(jax.random.split(key, 16))
    D, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    H, Hkv, Dh, L = (
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
        cfg.num_hidden_layers,
    )

    def norm(key, *shape):
        # generate directly in target dtype: avoids transient fp32 copies
        # (a 7B init would otherwise spike ~2 GB per stacked tensor)
        return jax.random.normal(key, shape, dtype) * 0.02

    layers = {
        "attn": {
            "wq": norm(next(keys), L, D, H * Dh),
            "wk": norm(next(keys), L, D, Hkv * Dh),
            "wv": norm(next(keys), L, D, Hkv * Dh),
            "wo": norm(next(keys), L, H * Dh, D),
        },
        "mlp": {
            "w_gate": norm(next(keys), L, D, F),
            "w_up": norm(next(keys), L, D, F),
            "w_down": norm(next(keys), L, F, D),
        },
        "input_norm": jnp.ones((L, D), dtype),
        "post_attn_norm": jnp.ones((L, D), dtype),
    }
    params = {
        "embed_tokens": norm(next(keys), V, D),
        "layers": layers,
        "final_norm": jnp.ones((D,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = norm(next(keys), D, V)
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """RMSNorm with fp32 accumulation (matches HF LlamaRMSNorm)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float,
                 scaling_type: Optional[str] = None,
                 scaling_factor: float = 1.0):
    """cos/sin tables for the given positions: [..., head_dim] each.

    Non-interleaved (rotate-half) layout, matching HF llama. ``scaling``
    follows HF ``rope_scaling`` (transformers LlamaRotaryEmbedding):
    "linear" divides positions by the factor; "dynamic" rescales theta
    NTK-style. Unlike HF, dynamic theta is fixed at the scaled target
    length (factor * max_position) instead of recomputed per forward —
    per-forward recompute would silently invalidate cached K vectors in a
    decode cache.
    """
    pos = positions.astype(jnp.float32)
    if scaling_type == "linear":
        pos = pos / scaling_factor
    elif scaling_type == "dynamic":
        # NTK-aware: theta' = theta * ((factor*s/L) - (factor-1))^(d/(d-2))
        # evaluated at the target length s == factor * L ->
        # theta * (factor^2 - factor + 1)^(d/(d-2)); matches HF's
        # LlamaDynamicNTKScalingRotaryEmbedding at full length for every
        # factor (the earlier 2*factor-1 only coincided at factor == 2).
        theta = theta * (
            scaling_factor * scaling_factor - scaling_factor + 1.0
        ) ** (head_dim / (head_dim - 2))
    elif scaling_type is not None:
        raise ValueError(f"unknown rope_scaling type: {scaling_type}")
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = pos[..., None] * inv_freq  # [..., Dh/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, T, H, Dh]; cos/sin: [B, T, Dh]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin).astype(x.dtype)


def embed_tokens(params, input_ids: jax.Array) -> jax.Array:
    # Clamp sentinel/negative ids (e.g. IMAGE_TOKEN_INDEX) to 0; the caller
    # overwrites those positions with image features before the decoder runs.
    safe = jnp.where(input_ids < 0, 0, input_ids)
    return jnp.take(params["embed_tokens"], safe, axis=0)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _paged_layer_attention(
    q, k_cur, v_cur, kv_all, kvs_all, idx, paged_info,
    segment_ids, positions, attn_impl,
    alibi_slopes=None, sm_scale=None,
):
    """Decode/continuation attention over the paged pool for one layer.

    ``kv_all`` is the FULL stacked pool [L, Np, 2, P, Hkv, Dh] (closed
    over by the scan — it is never written inside it); the layer is
    addressed by offsetting page ids into the flattened [L*Np, ...] view —
    a [B, maxp] int32 add — instead of slicing a multi-GB array per layer.
    The pool holds PAST tokens only: the current chunk's k/v arrive as
    ``k_cur``/``v_cur`` (written to the pool once per step, after the
    layer scan — see _paged_write_all).
    """
    pages, offsets, valid, page_table, past_len, old_seg = paged_info
    B, T = q.shape[:2]
    L, Np = kv_all.shape[:2]
    flat = kv_all.reshape((L * Np,) + kv_all.shape[2:])
    flat_s = (None if kvs_all is None
              else kvs_all.reshape((L * Np,) + kvs_all.shape[2:]))
    flat_ids = page_table + idx * Np
    # attn_impl == "xla" forces the gather path: pallas_call has no GSPMD
    # partitioning rule, so under a tp-sharded mesh the kernel would
    # replicate/all-gather the multi-GB pool per layer. The engine passes
    # "xla" whenever it serves over a mesh (serve/engine.py).
    # T <= 8 covers the decode step (T == 1) and the speculative-verify /
    # short-continuation chunk; both have contiguous positions from
    # positions[:, 0] and prefix-valid segment ids, which is what the
    # kernel's self block assumes (chunk token j at position past_len + j).
    # head_dim must be lane-aligned (Mosaic tiles the last VMEM dim at
    # 128; llama/MPT production heads are 128 — a 64-dim head falls back).
    if (T <= 8 and q.shape[-1] % 128 == 0 and attn_impl != "xla"
            and _decode_kernel_ok()):
        from llava_plus_tpu.ops.paged_attention import paged_decode_attention

        return paged_decode_attention(
            q, flat, flat_ids, past_len, flat_s,
            cur_k=k_cur, cur_v=v_cur,
            cur_valid=jnp.sum(segment_ids, axis=1).astype(jnp.int32),
            alibi_slopes=alibi_slopes, sm_scale=sm_scale,
        )
    # Generic path (CPU tests, multi-token continuation): gather the used
    # pages into a dense view, append the current chunk, and run the
    # masked XLA attention with explicit kv positions.
    from llava_plus_tpu.ops.paged_attention import gather_pages

    k, v = gather_pages(flat, flat_ids, flat_s)
    S = k.shape[1]
    k = jnp.concatenate([k.astype(q.dtype), k_cur.astype(q.dtype)], axis=1)
    v = jnp.concatenate([v.astype(q.dtype), v_cur.astype(q.dtype)], axis=1)
    # The pool holds PAST tokens only, but rejected speculative-verify
    # writes (and their seg marks) linger at positions >= past_len until
    # the next chunk overwrites them — mask them out so they are never
    # double-counted against the current chunk's own entries.
    pool_pos = jnp.arange(S, dtype=jnp.int32)[None]
    pool_seg = old_seg * (pool_pos < past_len[:, None]).astype(jnp.int32)
    kv_seg = jnp.concatenate([pool_seg, segment_ids], axis=1)
    kv_positions = jnp.concatenate([
        jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S)),
        positions.astype(jnp.int32),
    ], axis=1)
    bias = None
    if alibi_slopes is not None:
        dist = (positions[:, :, None] - kv_positions[:, None, :]).astype(
            jnp.float32
        )
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        bias = -jnp.abs(dist)[:, None, :, :] * slopes[None, :, None, None]
    return attention(
        q, k, v,
        causal=True,
        bias=bias,
        q_segment_ids=segment_ids,
        kv_segment_ids=kv_seg,
        q_positions=positions,
        kv_positions=kv_positions,
        softmax_scale=sm_scale,
        impl="xla",
    )


def _layer_forward(
    lp,
    h: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    segment_ids: jax.Array,
    positions: jax.Array,
    cfg: LlamaConfig,
    layer_cache,
    cache_seg: Optional[jax.Array],
    attn_impl: str,
    fresh_prefill: bool = False,
    paged_info=None,
):
    B, T, D = h.shape
    H, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    hn = rms_norm(h, lp["input_norm"], cfg.rms_norm_eps)
    # Head projections land tp-sharded over heads (Megatron layout); the
    # explicit constraints keep GSPMD from re-deriving a different layout
    # for the jvp/transpose graphs (involuntary-remat warnings).
    if "wqkv" in lp["attn"]:
        # inference-fused MHA projection (quant.fuse_llama_matrices):
        # one kernel launch instead of three
        qkv = matmul(hn, lp["attn"]["wqkv"])
        q, k, v = jnp.split(
            qkv, [H * Dh, H * Dh + Hkv * Dh], axis=-1
        )
        q = q.reshape(B, T, H, Dh)
        k = k.reshape(B, T, Hkv, Dh)
        v = v.reshape(B, T, Hkv, Dh)
    else:
        q = matmul(hn, lp["attn"]["wq"]).reshape(B, T, H, Dh)
        k = matmul(hn, lp["attn"]["wk"]).reshape(B, T, Hkv, Dh)
        v = matmul(hn, lp["attn"]["wv"]).reshape(B, T, Hkv, Dh)
    q = constrain(q, _BATCH, None, "tp", None)
    k = constrain(k, _BATCH, None, "tp", None)
    v = constrain(v, _BATCH, None, "tp", None)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if layer_cache is not None and paged_info is not None:
        # Paged cache: the combined pool [L,Np,2,P,Hkv,Dh] is a read-only
        # closure of the scan; this layer's k/v are STAGED (returned as
        # scan ys) and written to the pool once per step, after the scan.
        # Attention covers pool (past tokens) + the current chunk directly.
        kv_all, kvs_all, idx = layer_cache
        if fresh_prefill and T > 1:
            attn_out = attention(
                q, k, v,
                causal=True,
                q_segment_ids=segment_ids,
                kv_segment_ids=segment_ids,
                impl=attn_impl,
            )
        else:
            attn_out = _paged_layer_attention(
                q, k, v, kv_all, kvs_all, idx, paged_info,
                segment_ids, positions, attn_impl,
            )
        # staged chunk (not the pool); quantized here, per layer, so the
        # cross-layer staging is int8 + tiny scales, never bulk fp32
        if kvs_all is not None:
            qk, sk = _paged_quant(k)
            qv, sv = _paged_quant(v)
            new_cache = (qk, qv, sk, sv)
        else:
            new_cache = (k, v, jnp.zeros(k.shape[:-1], jnp.float32),
                         jnp.zeros(k.shape[:-1], jnp.float32))
    elif layer_cache is not None:
        # layer_cache = (k_all [L,B,T,Hkv,Dh], v_all, k_scale, v_scale,
        # layer_idx): the FULL stacked cache rides the scan carry and is
        # updated in place at [idx, b, pos]. Carrying (vs. emitting
        # per-layer ys) lets XLA alias the donated input cache — the xs->ys
        # form allocated a fresh full-cache copy per call (2x2GB temps at
        # 7B/b8) and rewrote every byte of cache on every decode step.
        # scales present => int8 cache (one scale per token per kv-head).
        k_all, v_all, ks_all, vs_all, idx = layer_cache
        # Write new k/v at their positions (slot == position); padding rows
        # carry position == max_len and drop out of range.
        b_idx = jnp.arange(B)[:, None]
        k_all, ks_all = _cache_write(k_all, ks_all, k, idx, b_idx, positions)
        v_all, vs_all = _cache_write(v_all, vs_all, v, idx, b_idx, positions)
        if fresh_prefill and T > 1:
            # First prefill of a stream: the cache holds nothing but this
            # chunk, so attention over the local q/k/v is exact — and
            # flash-eligible (Tq == Tkv, iota positions), unlike the
            # general cache path whose absolute q_positions force XLA.
            attn_out = attention(
                q, k, v,
                causal=True,
                q_segment_ids=segment_ids,
                kv_segment_ids=segment_ids,
                impl=attn_impl,
            )
        elif T == 1 and attn_impl == "pallas_decode" and _decode_kernel_ok():
            # flash-decode kernel (ops/decode_attention.py) — experimental
            # opt-in: on v5e the per-(batch, head) matvec grid measures ~2x
            # slower than XLA's fused batched attention (which also fuses
            # the int8-cache dequant acceptably); kept for the paged/long-
            # context path where streaming the cache once will matter.
            from llava_plus_tpu.ops.decode_attention import decode_attention

            def to_hsd(a):  # [B,S,H,x] -> [B,H,S,x] (kernel layout)
                return jnp.swapaxes(
                    jax.lax.dynamic_index_in_dim(a, idx, 0, keepdims=False),
                    1, 2,
                )

            ks = vs = None
            if ks_all is not None:
                ks, vs = to_hsd(ks_all), to_hsd(vs_all)
            attn_out = decode_attention(
                q, to_hsd(k_all), to_hsd(v_all), cache_seg, ks, vs
            )
        elif ks_all is not None:
            # int8 cache: fold the scales into scores/probabilities and
            # feed the raw int8 slices to the MXU as fused bf16 converts
            # (ops/attention.quant_cache_attention) — 1.29x over dequant-
            # then-attend at the 7B b16 serving shape. Plain einsums, so
            # GSPMD partitions it under a tp mesh like the XLA path.
            from llava_plus_tpu.ops.attention import quant_cache_attention

            ix = lambda a: jax.lax.dynamic_index_in_dim(
                a, idx, 0, keepdims=False
            )
            attn_out = quant_cache_attention(
                q, ix(k_all), ix(ks_all), ix(v_all), ix(vs_all),
                kv_segment_ids=cache_seg,
                q_positions=positions,
            )
        else:
            k_cache = _cache_read(k_all, ks_all, idx, q.dtype)
            v_cache = _cache_read(v_all, vs_all, idx, q.dtype)
            attn_out = attention(
                q, k_cache, v_cache,
                causal=True,
                q_segment_ids=segment_ids,
                kv_segment_ids=cache_seg,
                q_positions=positions,
                impl=attn_impl,
            )
        new_cache = (k_all, v_all, ks_all, vs_all)
    else:
        attn_out = attention(
            q, k, v,
            causal=True,
            q_segment_ids=segment_ids,
            kv_segment_ids=segment_ids,
            impl=attn_impl,
        )
        new_cache = None

    attn_out = constrain(attn_out, _BATCH, None, "tp", None)
    h = h + matmul(attn_out.reshape(B, T, H * Dh), lp["attn"]["wo"])
    h = constrain(h, _BATCH, None, None)

    hn = rms_norm(h, lp["post_attn_norm"], cfg.rms_norm_eps)
    if "w_gateup" in lp["mlp"]:
        # inference-fused gate|up projection: one kernel launch
        F = cfg.intermediate_size
        gu = constrain(
            matmul(hn, lp["mlp"]["w_gateup"]), _BATCH, None, "tp"
        )
        gate_pre, up = jnp.split(gu, [F], axis=-1)
        gate = jax.nn.silu(gate_pre.astype(jnp.float32)).astype(hn.dtype)
    else:
        gate = jax.nn.silu(
            constrain(matmul(hn, lp["mlp"]["w_gate"]), _BATCH, None, "tp")
            .astype(jnp.float32)
        ).astype(hn.dtype)
        up = constrain(matmul(hn, lp["mlp"]["w_up"]), _BATCH, None, "tp")
    h = h + matmul(gate * up, lp["mlp"]["w_down"])
    h = constrain(h, _BATCH, None, None)
    return h, new_cache


def decoder_forward(
    params,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,
    *,
    positions: jax.Array,
    segment_ids: jax.Array,
    cache: Optional[KVCache] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    fresh_prefill: bool = False,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Run the decoder stack. Returns (hidden_states, updated_cache).

    fresh_prefill=True asserts the cache is empty before this call (every
    serve-stack prefill): attention then runs over the local chunk
    (flash-eligible) while k/v still write into the cache.

    positions: [B, T] absolute positions (RoPE + cache slots).
    segment_ids: [B, T] (0 = padding; >0 real tokens, distinct ids isolate
    packed sequences).
    """
    h = constrain(inputs_embeds, _BATCH, None, None)
    cos, sin = rope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta,
        cfg.rope_scaling_type, cfg.rope_scaling_factor,
    )
    # Decode steps iterate layers with a STATIC Python loop instead of
    # lax.scan: on the tunneled v5e every scan iteration costs ~390 us of
    # fixed loop overhead, so a 32-layer scanned decode step pays ~12.5 ms
    # of pure tax — half the measured step. Static per-layer indices
    # slice the stacked params at constant offsets (contiguous views, no
    # copies — unlike scan-unroll's dynamic slices, which regressed 410 ->
    # 260 img+tok/s in round 3 by copying every layer's weights). Prefill
    # and training keep the scan: one compiled body, natural remat point,
    # and the tax amortizes over T >> 1 tokens of compute.
    unrolled = (cache is not None and not remat
                and inputs_embeds.shape[1] <= 8 and _decode_unroll())

    new_cache_seg = None
    paged_info = None
    if cache is not None:
        b_idx = jnp.arange(h.shape[0])[:, None]
        new_cache_seg = cache.seg.at[b_idx, positions].set(
            segment_ids, mode="drop"
        )
        if isinstance(cache, PagedKVCache):
            P = cache.page_size
            maxp = cache.page_table.shape[1]
            pidx = jnp.clip(positions // P, 0, maxp - 1)
            pages = jnp.take_along_axis(cache.page_table, pidx, axis=1)
            offsets = positions % P
            valid = ((positions < cache.max_len) & (segment_ids > 0)
                     & (positions < cache.alloc[:, None]))
            # PAST tokens per slot (pool-resident; the current chunk is
            # attended directly and written after the layer scan)
            past_len = jnp.where(
                segment_ids[:, 0] > 0, positions[:, 0], 0
            ).astype(jnp.int32)
            past_len = jnp.minimum(past_len, cache.max_len)
            paged_info = (pages, offsets, valid, cache.page_table, past_len,
                          cache.seg)

    if isinstance(cache, PagedKVCache):
        # The pool is a read-only closure of the scan (deferred writes):
        # each layer stages its chunk k/v as ys; one scatter per step
        # then lands all layers' tokens in the pool.
        def body(carry, xs):
            carry_h, = carry
            lp, idx = xs
            h_out, staged = _layer_forward(
                lp, carry_h, cos, sin, segment_ids, positions, cfg,
                (cache.kv, cache.kv_scale, idx), new_cache_seg, attn_impl,
                fresh_prefill, paged_info,
            )
            return (h_out,), staged

        if remat:
            body = jax.checkpoint(body)
        L = cfg.num_hidden_layers
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
                unroll=_scan_unroll(),
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
                lp, carry_h, cos, sin, segment_ids, positions, cfg,
                (k_all, v_all, ks_all, vs_all, idx), new_cache_seg, attn_impl,
                fresh_prefill, paged_info,
            )
            return (h_out, k_all, v_all, ks_all, vs_all, idx + 1), None

        if remat:
            body = jax.checkpoint(body)
        if unrolled:
            carry = (h, cache.k, cache.v, cache.k_scale, cache.v_scale,
                     jnp.int32(0))
            for i in range(cfg.num_hidden_layers):
                lp_i = jax.tree.map(lambda a: a[i], params["layers"])
                carry, _ = body(carry, lp_i)
            h, ks, vs, kss, vss, _ = carry
        else:
            (h, ks, vs, kss, vss, _), _ = jax.lax.scan(
                body,
                (h, cache.k, cache.v, cache.k_scale, cache.v_scale,
                 jnp.int32(0)),
                params["layers"],
                unroll=_scan_unroll(),
            )
        new_cache = KVCache(k=ks, v=vs, seg=new_cache_seg,
                            k_scale=kss, v_scale=vss)
    else:
        def body(carry_h, lp):
            h_out, _ = _layer_forward(
                lp, carry_h, cos, sin, segment_ids, positions, cfg,
                None, None, attn_impl,
            )
            return h_out, None

        if remat:
            body = jax.checkpoint(body)
        h, _ = jax.lax.scan(body, h, params["layers"], unroll=_scan_unroll())
        new_cache = None

    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    return h, new_cache


def lm_head(params, cfg: LlamaConfig, hidden: jax.Array) -> jax.Array:
    """Project hidden states to fp32 logits (vocab dim tp-sharded).

    The fp32 ``preferred_element_type`` does NOT leak f32 cotangents into
    the decoder backward: jax's dot transpose casts the cotangent back to
    the primal dtype (bf16) at this boundary (verified on the grad jaxpr,
    round 4), so the backward runs at the MXU's bf16 rate throughout."""
    if cfg.tie_word_embeddings:
        logits = jnp.dot(
            hidden, params["embed_tokens"].T,
            preferred_element_type=jnp.float32,
        )
    else:
        from llava_plus_tpu.ops.quant import is_quantized

        w = params["lm_head"]
        if is_quantized(w):
            logits = matmul(hidden, w).astype(jnp.float32)
        else:
            logits = jnp.dot(hidden, w, preferred_element_type=jnp.float32)
    return constrain(logits, _BATCH, None, "tp")


def forward(
    params,
    cfg: LlamaConfig,
    input_ids: Optional[jax.Array] = None,
    *,
    inputs_embeds: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    cache: Optional[KVCache] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    fresh_prefill: bool = False,
    logits_positions: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Full forward: ids/embeds -> fp32 logits. Convenience wrapper.

    ``logits_positions`` [B]: project only these positions through the
    lm_head (serving prefills need just the last valid token's logits —
    skipping the [B, T, V] projection saves ~0.5 GB and a T-long matmul
    at 7B prefill shapes). Returns [B, 1, V] then.
    """
    if inputs_embeds is None:
        inputs_embeds = embed_tokens(params, input_ids)
    B, T = inputs_embeds.shape[:2]
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    if segment_ids is None:
        segment_ids = jnp.ones((B, T), jnp.int32)
    h, new_cache = decoder_forward(
        params, cfg, inputs_embeds,
        positions=positions, segment_ids=segment_ids,
        cache=cache, attn_impl=attn_impl, remat=remat,
        fresh_prefill=fresh_prefill,
    )
    if logits_positions is not None:
        h = jnp.take_along_axis(h, logits_positions[:, None, None], axis=1)
    return lm_head(params, cfg, h), new_cache
