"""LLaVA multimodal model: vision tower -> projector -> language decoder.

Functional replacement for the reference meta-architecture
(``llava/model/llava_arch.py``). The central difference is the image splice:
the reference walks each sample in Python and concatenates variable-length
pieces (``llava_arch.py:150-187``), which cannot live under ``jit``. Here the
data pipeline precomputes a **position map** (``data/multimodal.py``) and the
device program is one vectorized scatter:

    embeds = embed_tokens(tokens).at[b, image_pos].set(image_features)

with out-of-range positions dropped — fixed shapes, one compile, MXU-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from llava_plus_tpu.models import clip_vit, llama, projector
from llava_plus_tpu.models.configs import LlavaConfig
from llava_plus_tpu.parallel.mesh import constrain


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MultimodalBatch:
    """Device inputs for one fused multimodal batch (fixed shapes).

    tokens:      [B, T]        token ids; image-span slots hold pad (0)
    positions:   [B, T]        absolute positions for RoPE / cache slots
    segment_ids: [B, T]        0 = padding, >0 real tokens
    images:      [B, N, H, W, 3] preprocessed pixel values (N = max images)
    image_pos:   [B, N * num_patches] scatter positions into T; entries >= T
                 are dropped (pad images / truncated spans)
    labels:      [B, T] or None; IGNORE_INDEX-masked next-token targets
    """

    tokens: jax.Array
    positions: jax.Array
    segment_ids: jax.Array
    images: jax.Array
    image_pos: jax.Array
    labels: Optional[jax.Array] = None


def init_params(cfg: LlavaConfig, key: jax.Array, dtype=jnp.bfloat16):
    k1, k2, k3 = jax.random.split(key, 3)
    if cfg.language_model_type == "llama":
        lm = llama.init_params(cfg.text, k1, dtype)
    else:
        from llava_plus_tpu.models import mpt

        lm = mpt.init_params(cfg.mpt, k1, dtype)
    return {
        "language_model": lm,
        "vision_tower": clip_vit.init_params(cfg.vision, k2, dtype),
        "mm_projector": projector.init_params(
            cfg.mm_projector_type, cfg.mm_hidden_size, cfg.hidden_size, k3, dtype
        ),
    }


def encode_images(params, cfg: LlavaConfig, images: jax.Array) -> jax.Array:
    """[B*, H, W, 3] -> [B*, num_patches, lm_hidden].

    Vision tower is frozen (no-grad in the reference, clip_encoder.py:39);
    gradients are cut with stop_gradient so training never backprops into it.
    """
    images = constrain(images, ("dp", "fsdp"), None, None, None)
    feats = clip_vit.encode(params["vision_tower"], cfg.vision, images)
    feats = jax.lax.stop_gradient(feats)
    feats = constrain(feats, ("dp", "fsdp"), None, None)
    out = projector.apply(params["mm_projector"], cfg.mm_projector_type, feats)
    return constrain(out, ("dp", "fsdp"), None, None)


def fuse(params, cfg: LlavaConfig, batch: MultimodalBatch) -> jax.Array:
    """Build the fused embedding sequence [B, T, D]."""
    if cfg.language_model_type == "llama":
        embeds = llama.embed_tokens(params["language_model"], batch.tokens)
    else:
        from llava_plus_tpu.models import mpt

        embeds = mpt.embed_tokens(params["language_model"], batch.tokens)

    B, N = batch.images.shape[:2]
    if N == 0:
        return embeds
    flat_images = batch.images.reshape((B * N,) + batch.images.shape[2:])
    feats = encode_images(params, cfg, flat_images)  # [B*N, P, D]
    feats = feats.reshape(B, N * feats.shape[1], feats.shape[2]).astype(embeds.dtype)

    b_idx = jnp.arange(B)[:, None]
    # mode="drop": positions >= T (pad images, truncated tails) are discarded.
    embeds = constrain(embeds, ("dp", "fsdp"), None, None)
    fused = embeds.at[b_idx, batch.image_pos].set(feats, mode="drop")
    return constrain(fused, ("dp", "fsdp"), None, None)


def forward(
    params,
    cfg: LlavaConfig,
    batch: MultimodalBatch,
    *,
    cache: Optional[llama.KVCache] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    fresh_prefill: bool = False,
    logits_positions: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[llama.KVCache]]:
    """Full multimodal forward -> (fp32 logits [B, T, V], updated cache).

    fresh_prefill=True (first prefill into an empty cache) keeps attention
    on the local chunk — flash-kernel-eligible — while writing the cache.
    logits_positions [B] restricts the lm_head to those positions
    (llama only; serving prefill)."""
    embeds = fuse(params, cfg, batch)
    if cfg.language_model_type == "llama":
        return llama.forward(
            params["language_model"], cfg.text,
            inputs_embeds=embeds,
            positions=batch.positions,
            segment_ids=batch.segment_ids,
            cache=cache, attn_impl=attn_impl, remat=remat,
            fresh_prefill=fresh_prefill,
            logits_positions=logits_positions,
        )
    from llava_plus_tpu.models import mpt

    return mpt.forward(
        params["language_model"], cfg.mpt,
        inputs_embeds=embeds,
        positions=batch.positions,
        segment_ids=batch.segment_ids,
        cache=cache, attn_impl=attn_impl, remat=remat,
    )


def decode_step(
    params,
    cfg: LlavaConfig,
    token: jax.Array,        # [B, 1]
    position: jax.Array,     # [B, 1]
    segment_ids: jax.Array,  # [B, 1]
    cache: llama.KVCache,
    attn_impl: str = "auto",
) -> Tuple[jax.Array, llama.KVCache]:
    """Single decode step over the KV cache (text-only; images only appear in
    prefill, ref llava_arch.py:103-112). Returns (logits [B, 1, V], cache)."""
    if cfg.language_model_type == "llama":
        return llama.forward(
            params["language_model"], cfg.text, token,
            positions=position, segment_ids=segment_ids,
            cache=cache, attn_impl=attn_impl,
        )
    from llava_plus_tpu.models import mpt

    return mpt.forward(
        params["language_model"], cfg.mpt, token,
        positions=position, segment_ids=segment_ids,
        cache=cache, attn_impl=attn_impl,
    )
