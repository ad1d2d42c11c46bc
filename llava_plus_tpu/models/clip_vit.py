"""CLIP ViT vision tower, TPU-native.

Functional replacement for the HF ``CLIPVisionModel`` wrapped by the
reference's ``llava/model/multimodal_encoder/clip_encoder.py``. The tower is
frozen in all LLaVA recipes (``clip_encoder.py:39`` runs under no_grad), so
this is forward-only by default; it still differentiates fine if unfrozen.

Hidden-layer selection follows the reference: ``select_layer`` indexes the
list [embeddings, layer1_out, ..., layerN_out] the same way HF
``output_hidden_states`` does, and ``select_feature`` drops the CLS token for
"patch" (ref clip_encoder.py:29-37). Input layout is NHWC.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from llava_plus_tpu.models.configs import ClipVisionConfig


def init_params(cfg: ClipVisionConfig, key: jax.Array, dtype=jnp.bfloat16):
    keys = iter(jax.random.split(key, 24))
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    P = cfg.patch_size

    def norm(key, *shape, scale=0.02):
        return jax.random.normal(key, shape, dtype) * scale

    def ln():
        return {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)}

    layers = {
        "ln1": ln(),
        "ln2": ln(),
        "attn": {
            "wq": norm(next(keys), L, D, D), "bq": jnp.zeros((L, D), dtype),
            "wk": norm(next(keys), L, D, D), "bk": jnp.zeros((L, D), dtype),
            "wv": norm(next(keys), L, D, D), "bv": jnp.zeros((L, D), dtype),
            "wo": norm(next(keys), L, D, D), "bo": jnp.zeros((L, D), dtype),
        },
        "mlp": {
            "w1": norm(next(keys), L, D, F), "b1": jnp.zeros((L, F), dtype),
            "w2": norm(next(keys), L, F, D), "b2": jnp.zeros((L, D), dtype),
        },
    }
    return {
        "class_embedding": norm(next(keys), D),
        # patch embedding as a matmul over flattened patches: [P*P*3, D]
        "patch_embedding": norm(next(keys), P * P * 3, D),
        "position_embedding": norm(next(keys), cfg.num_positions, D),
        "pre_layernorm": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
        "layers": layers,
        # post_layernorm exists in HF but is unused for hidden-state features.
        "post_layernorm": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
    }


def layer_norm(x: jax.Array, p, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)


def patchify(images: jax.Array, patch_size: int) -> jax.Array:
    """[B, H, W, 3] -> [B, N, P*P*3] with HF Conv2d-equivalent ordering.

    HF's patch conv weight is [D, 3, P, P]; flattening our patches as
    (channel, py, px) lets the conv become a single MXU matmul against the
    reshaped kernel. einops-style reshape keeps it fusable.
    """
    B, H, W, C = images.shape
    P = patch_size
    gh, gw = H // P, W // P
    x = images.reshape(B, gh, P, gw, P, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, gh, gw, C, P, P]
    return x.reshape(B, gh * gw, C * P * P)


def _vit_layer(lp, h: jax.Array, cfg: ClipVisionConfig):
    B, T, D = h.shape
    H, Dh = cfg.num_attention_heads, cfg.head_dim
    eps = cfg.layer_norm_eps

    hn = layer_norm(h, lp["ln1"], eps)
    q = (hn @ lp["attn"]["wq"] + lp["attn"]["bq"]).reshape(B, T, H, Dh)
    k = (hn @ lp["attn"]["wk"] + lp["attn"]["bk"]).reshape(B, T, H, Dh)
    v = (hn @ lp["attn"]["wv"] + lp["attn"]["bv"]).reshape(B, T, H, Dh)
    # Bidirectional attention; sequence is fixed 577 tokens, no padding.
    # Operands stay in the compute dtype (bf16 in serving) with fp32 MXU
    # accumulation — halves vision-tower attention cost vs fp32 operands.
    scale = Dh ** -0.5
    logits = jnp.einsum(
        "bthd,bshd->bhts", q * scale, k,
        preferred_element_type=jnp.float32,
    )
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhts,bshd->bthd", probs.astype(h.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(h.dtype)
    h = h + out.reshape(B, T, D) @ lp["attn"]["wo"] + lp["attn"]["bo"]

    hn = layer_norm(h, lp["ln2"], eps)
    # CLIP uses quick_gelu: x * sigmoid(1.702 x)
    inner = (hn @ lp["mlp"]["w1"] + lp["mlp"]["b1"]).astype(jnp.float32)
    act = (inner * jax.nn.sigmoid(1.702 * inner)).astype(h.dtype)
    h = h + act @ lp["mlp"]["w2"] + lp["mlp"]["b2"]
    return h


def encode(
    params,
    cfg: ClipVisionConfig,
    images: jax.Array,
    *,
    select_layer: Optional[int] = None,
    select_feature: Optional[str] = None,
) -> jax.Array:
    """images [B, H, W, 3] float -> features [B, N(+1), D] of the selected
    hidden layer. Default: layer -2, patch features (drop CLS)."""
    select_layer = cfg.select_layer if select_layer is None else select_layer
    select_feature = cfg.select_feature if select_feature is None else select_feature
    L = cfg.num_hidden_layers
    # hidden_states list has L+1 entries; negative indexing like HF.
    stop = select_layer % (L + 1)  # number of layers to run

    patches = patchify(images.astype(params["patch_embedding"].dtype), cfg.patch_size)
    h = patches @ params["patch_embedding"]  # [B, N, D]
    cls = jnp.broadcast_to(
        params["class_embedding"][None, None, :], (h.shape[0], 1, h.shape[-1])
    )
    h = jnp.concatenate([cls, h], axis=1)
    h = h + params["position_embedding"][None]
    h = layer_norm(h, params["pre_layernorm"], cfg.layer_norm_eps)

    if stop == 0:
        out = h
    else:
        def body(carry, lp):
            new_h = _vit_layer(lp, carry, cfg)
            return new_h, None

        # Run `stop` layers: slice the stacked layer params.
        sliced = jax.tree.map(lambda a: a[:stop], params["layers"])
        out, _ = jax.lax.scan(body, h, sliced)

    if select_feature == "patch":
        return out[:, 1:]
    if select_feature == "cls_patch":
        return out
    raise ValueError(f"Unexpected select feature: {select_feature}")
