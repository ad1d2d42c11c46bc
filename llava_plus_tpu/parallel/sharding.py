"""Sharding rule tables: parameter pytrees -> PartitionSpec pytrees.

ZeRO-2/3 (the reference's DeepSpeed configs, ``scripts/zero*.json``) maps to
the ``fsdp`` axis: parameters and optimizer state shard over it and XLA GSPMD
inserts the all-gathers/reduce-scatters DeepSpeed does by hand. The
``pretraining_tp`` stub the reference never exercises
(``llava_llama.py:46``) is a real ``tp`` axis here.

Spec trees mirror the parameter dicts exactly (stacked layer dim L first).
"""

from __future__ import annotations

from jax.sharding import PartitionSpec as P

from llava_plus_tpu.models.configs import LlavaConfig


def llama_param_specs(fsdp: str = "fsdp", tp: str = "tp"):
    """Specs for models/llama.py param tree.

    TP shards head/ffn output dims; FSDP shards the other large dim. Norms
    replicate (tiny).
    """
    return {
        # Vocab rows shard over fsdp+tp, D replicated: the token gather then
        # partitions as masked-lookup + psum over the vocab axis with
        # batch-sharded output — no resharding against the decoder's
        # batch-sharded activation layout (and its transpose scatter-add
        # keeps the same layout).
        "embed_tokens": P((fsdp, tp), None),  # [V, D]
        "final_norm": P(None),             # [D]
        "lm_head": P(fsdp, tp),            # [D, V]
        "layers": {
            "attn": {
                "wq": P(None, fsdp, tp),   # [L, D, H*Dh]
                "wk": P(None, fsdp, tp),
                "wv": P(None, fsdp, tp),
                "wo": P(None, tp, fsdp),   # [L, H*Dh, D]
            },
            "mlp": {
                "w_gate": P(None, fsdp, tp),  # [L, D, F]
                "w_up": P(None, fsdp, tp),
                "w_down": P(None, tp, fsdp),  # [L, F, D]
            },
            "input_norm": P(None, None),
            "post_attn_norm": P(None, None),
        },
    }


def mpt_param_specs(fsdp: str = "fsdp", tp: str = "tp"):
    return {
        "wte": P(tp, fsdp),
        "norm_f": P(None),
        "layers": {
            "norm1": P(None, None),
            "norm2": P(None, None),
            "attn": {
                "wqkv": P(None, fsdp, tp),
                "out_proj": P(None, tp, fsdp),
            },
            "mlp": {
                "up_proj": P(None, fsdp, tp),
                "down_proj": P(None, tp, fsdp),
            },
        },
    }


def clip_param_specs(fsdp: str = "fsdp", tp: str = "tp"):
    """Vision tower: frozen and comparatively small; shard only the fat
    matrices over fsdp to keep memory flat, replicate the rest."""
    ln = {"scale": P(None, None), "bias": P(None, None)}
    return {
        "class_embedding": P(None),
        "patch_embedding": P(None, fsdp),
        "position_embedding": P(None, None),
        "pre_layernorm": {"scale": P(None), "bias": P(None)},
        "post_layernorm": {"scale": P(None), "bias": P(None)},
        "layers": {
            "ln1": dict(ln),
            "ln2": dict(ln),
            "attn": {
                "wq": P(None, None, fsdp), "bq": P(None, None),
                "wk": P(None, None, fsdp), "bk": P(None, None),
                "wv": P(None, None, fsdp), "bv": P(None, None),
                "wo": P(None, fsdp, None), "bo": P(None, None),
            },
            "mlp": {
                "w1": P(None, None, fsdp), "b1": P(None, None),
                "w2": P(None, fsdp, None), "b2": P(None, None),
            },
        },
    }


def projector_param_specs(projector_type: str, fsdp: str = "fsdp", tp: str = "tp"):
    from llava_plus_tpu.models.projector import parse_projector_type

    depth = parse_projector_type(projector_type)
    if depth == 0:
        return {}
    return {
        "layers": [{"w": P(fsdp, None), "b": P(None)} for _ in range(depth)]
    }


def llava_param_specs(cfg: LlavaConfig, fsdp: str = "fsdp", tp: str = "tp"):
    if cfg.language_model_type == "mpt":
        lm = mpt_param_specs(fsdp, tp)
    else:
        lm = llama_param_specs(fsdp, tp)
        if cfg.text.tie_word_embeddings:
            lm.pop("lm_head", None)
    return {
        "language_model": lm,
        "vision_tower": clip_param_specs(fsdp, tp),
        "mm_projector": projector_param_specs(cfg.mm_projector_type, fsdp, tp),
    }
