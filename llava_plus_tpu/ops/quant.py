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
SKEY = "scale"


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and QKEY in w


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


def dequantize_array(qw: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    return (qw[QKEY].astype(jnp.float32) * qw[SKEY]).astype(dtype)


def matmul(x: jax.Array, w) -> jax.Array:
    """x @ w for plain or quantized w. Dequant fuses into the matmul: the
    int8 tensor is the HBM-resident operand."""
    if not is_quantized(w):
        return x @ w
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
                       in_place: bool = True):
    """Replace the listed matrices with int8 dicts. Norms/embeddings stay
    bf16.

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
    for path in paths:
        w = _get(lm_params, path)
        if w is None:
            continue
        q = quantize_array(w)
        _set(lm_params, path, q)
        del w
        # block so the freed buffer is actually released before the next one
        jax.block_until_ready(q[QKEY])
    return lm_params


def quantize_llava_params(params, model_type: str = "llama",
                          in_place: bool = True):
    paths = MPT_QUANT_PATHS if model_type == "mpt" else LLAMA_QUANT_PATHS
    lm = quantize_lm_params(params["language_model"], paths, in_place=in_place)
    return dict(params, language_model=lm)
