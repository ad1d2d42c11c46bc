"""Weight-only int8 quantization for serving.

Decode at batch 1 is HBM-bandwidth-bound: every step streams the full weight
set. Symmetric per-output-channel int8 halves the bytes (13.5 GB -> 6.8 GB
for 7B), and XLA fuses the dequant into the matmul so the int8 tensors are
what actually crosses HBM. The reference's 8-bit path is bitsandbytes on GPU
(``llava/model/builder.py:32-41``); this is its TPU-native equivalent.

A quantized matrix is a dict {"qvalue": int8 [..., in, out],
"scale": f32 [..., 1, out]}; ``matmul`` dispatches on leaf type so model
code is unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

QKEY = "qvalue"
Q4KEY = "qvalue4"
SKEY = "scale"

# Block length (along the input/contraction dim) for int4 quantization.
# 32 matches the QLoRA/NF4 granularity the reference reaches through
# bitsandbytes ``load_in_4bit`` (``llava/model/builder.py:32-41``).
INT4_BLOCK = 32


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and (QKEY in w or Q4KEY in w)


@jax.jit
def quantize_array(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel (last dim) int8.

    Jitted so the fp32 intermediates fuse away — eager quantization of a
    stacked 7B tensor would materialize a ~6 GB fp32 copy.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {QKEY: q, SKEY: scale.astype(jnp.float32)}


@jax.jit
def quantize_array_int4(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric blockwise int4 (block=INT4_BLOCK along the contraction dim).

    The TPU-native analogue of the reference's bitsandbytes 4-bit load
    (``builder.py:32-41``): ~4.5 bits/weight resident in HBM (two nibbles
    packed per int8 + one f32 scale per 32-block), streamed and dequantized
    inside the matmul. Packed int8 is used rather than the jnp.int4 dtype —
    int4 jit arguments trip relayout bugs on the CPU backend. Stored as
    ``{"qvalue4": int8 [..., in/B, B/2, out], "scale":
    f32 [..., in/B, 1, out]}``; the input dim must divide INT4_BLOCK (true
    for every transformer matrix we quantize).
    """
    *lead, d_in, d_out = w.shape
    assert d_in % INT4_BLOCK == 0, (d_in, INT4_BLOCK)
    wf = w.astype(jnp.float32).reshape(*lead, d_in // INT4_BLOCK, INT4_BLOCK, d_out)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    lo = q[..., 0::2, :] & 0x0F
    hi = (q[..., 1::2, :] & 0x0F) << 4
    return {Q4KEY: (lo | hi).astype(jnp.int8), SKEY: scale.astype(jnp.float32)}


def _unpack_int4(packed: jax.Array) -> jax.Array:
    """int8 [..., nb, B/2, out] -> int8 [..., nb, B, out] (sign-extended)."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    *lead, nb, half, d_out = packed.shape
    return jnp.stack([lo, hi], axis=-2).reshape(*lead, nb, half * 2, d_out)


def dequantize_array(qw: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    if Q4KEY in qw:
        wf = _unpack_int4(qw[Q4KEY]).astype(jnp.float32) * qw[SKEY]
        *lead, nb, b, d_out = wf.shape
        return wf.reshape(*lead, nb * b, d_out).astype(dtype)
    return (qw[QKEY].astype(jnp.float32) * qw[SKEY]).astype(dtype)


def matmul(x: jax.Array, w) -> jax.Array:
    """x @ w for plain or quantized w. Dequant fuses into the matmul: the
    int8/int4 tensor is the HBM-resident operand."""
    if not is_quantized(w):
        return x @ w
    if Q4KEY in w:
        return x @ dequantize_array(w, x.dtype)
    wq = w[QKEY].astype(x.dtype)
    out = x @ wq
    return out * w[SKEY].reshape(w[SKEY].shape[-1]).astype(out.dtype)


# Paths of the LLaMA matrices worth quantizing (stacked [L, in, out]).
LLAMA_QUANT_PATHS = (
    ("layers", "attn", "wq"),
    ("layers", "attn", "wk"),
    ("layers", "attn", "wv"),
    ("layers", "attn", "wo"),
    ("layers", "mlp", "w_gate"),
    ("layers", "mlp", "w_up"),
    ("layers", "mlp", "w_down"),
    ("lm_head",),
)

MPT_QUANT_PATHS = (
    ("layers", "attn", "wqkv"),
    ("layers", "attn", "out_proj"),
    ("layers", "mlp", "up_proj"),
    ("layers", "mlp", "down_proj"),
)


def _get(tree, path):
    for p in path:
        if p not in tree:
            return None
        tree = tree[p]
    return tree


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def quantize_lm_params(lm_params, paths: Sequence = LLAMA_QUANT_PATHS,
                       in_place: bool = True, bits: int = 8):
    """Replace the listed matrices with int8 (or blockwise int4) dicts.
    Norms/embeddings stay bf16.

    ``in_place=True`` (default) mutates the tree and frees each bf16 tensor
    as soon as its int8 replacement exists — without this, a 7B model needs
    ~20 GB transient HBM (bf16 + int8 copies) and OOMs a 16 GB chip.
    """
    if not in_place:
        def copy_dicts(t):
            if isinstance(t, dict):
                return {k: copy_dicts(v) for k, v in t.items()}
            return t

        lm_params = copy_dicts(lm_params)
    assert bits in (4, 8), bits
    quantize = quantize_array if bits == 8 else quantize_array_int4
    for path in paths:
        w = _get(lm_params, path)
        if w is None:
            continue
        q = quantize(w)
        _set(lm_params, path, q)
        del w
        # block so the freed buffer is actually released before the next one
        jax.block_until_ready(q[QKEY if bits == 8 else Q4KEY])
    return lm_params


def quantize_llava_params(params, model_type: str = "llama",
                          in_place: bool = True, bits: int = 8):
    paths = MPT_QUANT_PATHS if model_type == "mpt" else LLAMA_QUANT_PATHS
    lm = quantize_lm_params(params["language_model"], paths,
                            in_place=in_place, bits=bits)
    return dict(params, language_model=lm)
