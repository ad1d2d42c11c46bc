"""Checkpointing: orbax-native save/resume + HF-format interop.

Covers the reference's three save shapes (SURVEY.md §5):
- adapter-only ``mm_projector.bin`` (stage-1, ``tune_mm_mlp_adapter``)
- LoRA split (``adapter_model`` + ``non_lora_trainables.bin`` — train/lora.py)
- full state dict -> HF-layout safetensors any HF LLaVA stack can load

Native training state (params + optimizer + step) uses orbax so sharded
(FSDP) arrays save/restore without gathering — the ZeRO-3-gather dance
(ref train.py:120-131) disappears.
"""

from __future__ import annotations

import dataclasses
import json
import re
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

from llava_plus_tpu.models.configs import LlavaConfig

CKPT_PREFIX = "checkpoint-"


# ---------------------------------------------------------------------------
# Orbax-native train state
# ---------------------------------------------------------------------------

def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_train_state(ckpt_dir, step: int, params, opt_state=None,
                     cfg: Optional[LlavaConfig] = None) -> Path:
    ckpt_dir = Path(ckpt_dir)
    path = ckpt_dir / f"{CKPT_PREFIX}{step}"
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = _checkpointer()
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    ckptr.save((path / "state").absolute(), state, force=True)
    ckptr.wait_until_finished()
    (path / "meta.json").write_text(json.dumps({"step": step}))
    if cfg is not None:
        cfg.save(path / "config.json")
    return path


def latest_checkpoint(ckpt_dir) -> Optional[Path]:
    """Auto-resume discovery (ref train.py:979-982 resume-from-latest).

    Skips incomplete saves: a run killed mid-save leaves only an orbax
    ``state.orbax-checkpoint-tmp*`` dir (no committed ``state``); resuming
    from it would crash the NEXT run at restore. meta.json is written
    after the save commits, so its presence is the completeness marker."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    best, best_step = None, -1
    for p in ckpt_dir.iterdir():
        m = re.fullmatch(rf"{CKPT_PREFIX}(\d+)", p.name)
        if (m and int(m.group(1)) > best_step
                and (p / "state").exists() and (p / "meta.json").exists()):
            best, best_step = p, int(m.group(1))
    return best


def restore_train_state(path, params_like, opt_state_like=None):
    """Restore into abstract/like trees (preserves shardings of the targets)."""
    ckptr = _checkpointer()
    target = {"params": params_like}
    if opt_state_like is not None:
        target["opt_state"] = opt_state_like
    state = ckptr.restore((Path(path) / "state").absolute(), target)
    step = json.loads((Path(path) / "meta.json").read_text())["step"]
    return state, step


# ---------------------------------------------------------------------------
# HF-format export (inverse of models/hf_import.py)
# ---------------------------------------------------------------------------

def _t(x) -> np.ndarray:
    return np.asarray(jax.device_get(x))


def llama_state_dict_from_params(lm, cfg) -> Dict[str, np.ndarray]:
    sd = {
        "model.embed_tokens.weight": _t(lm["embed_tokens"]),
        "model.norm.weight": _t(lm["final_norm"]),
    }
    if "lm_head" in lm:
        sd["lm_head.weight"] = _t(lm["lm_head"]).T
    L = cfg.num_hidden_layers
    layer_map = [
        ("self_attn.q_proj.weight", ("attn", "wq"), True),
        ("self_attn.k_proj.weight", ("attn", "wk"), True),
        ("self_attn.v_proj.weight", ("attn", "wv"), True),
        ("self_attn.o_proj.weight", ("attn", "wo"), True),
        ("mlp.gate_proj.weight", ("mlp", "w_gate"), True),
        ("mlp.up_proj.weight", ("mlp", "w_up"), True),
        ("mlp.down_proj.weight", ("mlp", "w_down"), True),
        ("input_layernorm.weight", ("input_norm",), False),
        ("post_attention_layernorm.weight", ("post_attn_norm",), False),
    ]
    for hf_name, path, transpose in layer_map:
        node = lm["layers"]
        for p in path:
            node = node[p]
        arr = _t(node)
        for i in range(L):
            m = arr[i].T if transpose else arr[i]
            sd[f"model.layers.{i}.{hf_name}"] = np.ascontiguousarray(m)
    return sd


def mpt_state_dict_from_params(lm, cfg) -> Dict[str, np.ndarray]:
    """Inverse of hf_import.mpt_params_from_state_dict (reference
    LLaVA-MPT keys: transformer.wte/blocks.N/norm_f, llava_mpt.py)."""
    sd = {
        "transformer.wte.weight": _t(lm["wte"]),
        "transformer.norm_f.weight": _t(lm["norm_f"]),
    }
    if "wpe" in lm:
        sd["transformer.wpe.weight"] = _t(lm["wpe"])
    L = cfg.n_layers
    layer_map = [
        ("norm_1.weight", ("norm1",), False),
        ("norm_2.weight", ("norm2",), False),
        ("attn.Wqkv.weight", ("attn", "wqkv"), True),
        ("attn.out_proj.weight", ("attn", "out_proj"), True),
        ("ffn.up_proj.weight", ("mlp", "up_proj"), True),
        ("ffn.down_proj.weight", ("mlp", "down_proj"), True),
    ]
    for hf_name, path, transpose in layer_map:
        node = lm["layers"]
        for p in path:
            node = node[p]
        arr = _t(node)
        for i in range(L):
            m = arr[i].T if transpose else arr[i]
            sd[f"transformer.blocks.{i}.{hf_name}"] = np.ascontiguousarray(m)
    return sd


def clip_state_dict_from_params(vt, cfg,
                                prefix="model.vision_tower.vision_tower.vision_model.") -> Dict[str, np.ndarray]:
    D = cfg.hidden_size
    P = cfg.patch_size
    sd = {
        prefix + "embeddings.class_embedding": _t(vt["class_embedding"]),
        prefix + "embeddings.patch_embedding.weight":
            np.ascontiguousarray(_t(vt["patch_embedding"]).T.reshape(D, 3, P, P)),
        prefix + "embeddings.position_embedding.weight": _t(vt["position_embedding"]),
        prefix + "pre_layrnorm.weight": _t(vt["pre_layernorm"]["scale"]),
        prefix + "pre_layrnorm.bias": _t(vt["pre_layernorm"]["bias"]),
        prefix + "post_layernorm.weight": _t(vt["post_layernorm"]["scale"]),
        prefix + "post_layernorm.bias": _t(vt["post_layernorm"]["bias"]),
    }
    L = cfg.num_hidden_layers
    lm_ = vt["layers"]
    pairs = [
        ("layer_norm1.weight", lm_["ln1"]["scale"], False),
        ("layer_norm1.bias", lm_["ln1"]["bias"], False),
        ("layer_norm2.weight", lm_["ln2"]["scale"], False),
        ("layer_norm2.bias", lm_["ln2"]["bias"], False),
        ("self_attn.q_proj.weight", lm_["attn"]["wq"], True),
        ("self_attn.q_proj.bias", lm_["attn"]["bq"], False),
        ("self_attn.k_proj.weight", lm_["attn"]["wk"], True),
        ("self_attn.k_proj.bias", lm_["attn"]["bk"], False),
        ("self_attn.v_proj.weight", lm_["attn"]["wv"], True),
        ("self_attn.v_proj.bias", lm_["attn"]["bv"], False),
        ("self_attn.out_proj.weight", lm_["attn"]["wo"], True),
        ("self_attn.out_proj.bias", lm_["attn"]["bo"], False),
        ("mlp.fc1.weight", lm_["mlp"]["w1"], True),
        ("mlp.fc1.bias", lm_["mlp"]["b1"], False),
        ("mlp.fc2.weight", lm_["mlp"]["w2"], True),
        ("mlp.fc2.bias", lm_["mlp"]["b2"], False),
    ]
    for name, arr, transpose in pairs:
        a = _t(arr)
        for i in range(L):
            m = a[i].T if transpose else a[i]
            sd[prefix + f"encoder.layers.{i}.{name}"] = np.ascontiguousarray(m)
    return sd


def projector_state_dict_from_params(proj, prefix="model.mm_projector.") -> Dict[str, np.ndarray]:
    sd = {}
    layers = proj.get("layers", [])
    for i, layer in enumerate(layers):
        idx = i * 2
        key = f"{prefix}{idx}." if len(layers) > 1 else f"{prefix}{idx}."
        sd[key + "weight"] = np.ascontiguousarray(_t(layer["w"]).T)
        sd[key + "bias"] = _t(layer["b"])
    return sd


def export_hf_llava(params, cfg: LlavaConfig, out_dir, tokenizer=None) -> Path:
    """Write a full HF-layout LLaVA checkpoint (safetensors + config.json)."""
    from safetensors.numpy import save_file

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    is_mpt = cfg.language_model_type == "mpt"
    sd: Dict[str, np.ndarray] = {}
    if is_mpt:
        # reference LLaVA-MPT layout: everything under transformer.*
        # (llava_mpt.py: LlavaMPTModel(MptModel) owns tower + projector)
        sd.update(mpt_state_dict_from_params(params["language_model"],
                                             cfg.mpt))
        vt_prefix = "transformer.vision_tower.vision_tower.vision_model."
        proj_prefix = "transformer.mm_projector."
    else:
        sd.update(llama_state_dict_from_params(params["language_model"],
                                               cfg.text))
        vt_prefix = "model.vision_tower.vision_tower.vision_model."
        proj_prefix = "model.mm_projector."
    if params.get("vision_tower"):
        sd.update(clip_state_dict_from_params(params["vision_tower"],
                                              cfg.vision, prefix=vt_prefix))
    if params.get("mm_projector"):
        sd.update(projector_state_dict_from_params(params["mm_projector"],
                                                   prefix=proj_prefix))
    sd = {k: np.asarray(v) for k, v in sd.items()}
    save_file(sd, str(out_dir / "model.safetensors"))

    if is_mpt:
        m = cfg.mpt
        hf_cfg = {
            "architectures": ["LlavaMPTForCausalLM"],
            "model_type": "llava_mpt",
            "vocab_size": m.vocab_size,
            "d_model": m.d_model,
            "n_layers": m.n_layers,
            "n_heads": m.n_heads,
            "expansion_ratio": m.expansion_ratio,
            "max_seq_len": m.max_seq_len,
            "attn_config": {
                "alibi": m.alibi,
                "alibi_bias_max": m.alibi_bias_max,
                "attn_type": ("multiquery_attention" if m.multiquery
                              else "multihead_attention"),
                "prefix_lm": m.prefix_lm,
                "attn_uses_sequence_id": m.attn_uses_sequence_id,
                "clip_qkv": m.clip_qkv,
                "qk_ln": m.qk_ln,
                "softmax_scale": m.softmax_scale,
            },
            "no_bias": m.no_bias,
            "learned_pos_emb": m.learned_pos_emb,
            "layer_norm_epsilon": m.layer_norm_eps,
            "logit_scale": m.logit_scale,
        }
    else:
        hf_cfg = {
            "architectures": ["LlavaLlamaForCausalLM"],
            "model_type": "llava",
            "vocab_size": cfg.text.vocab_size,
            "hidden_size": cfg.text.hidden_size,
            "intermediate_size": cfg.text.intermediate_size,
            "num_hidden_layers": cfg.text.num_hidden_layers,
            "num_attention_heads": cfg.text.num_attention_heads,
            "num_key_value_heads": cfg.text.num_key_value_heads,
            "max_position_embeddings": cfg.text.max_position_embeddings,
            "rms_norm_eps": cfg.text.rms_norm_eps,
            "rope_theta": cfg.text.rope_theta,
            **({"rope_scaling": {"type": cfg.text.rope_scaling_type,
                                 "factor": cfg.text.rope_scaling_factor}}
               if cfg.text.rope_scaling_type else {}),
            "tie_word_embeddings": cfg.text.tie_word_embeddings,
        }
    hf_cfg.update({
        "mm_vision_tower": "openai/clip-vit-large-patch14-336"
            if cfg.vision.image_size == 336 else "openai/clip-vit-large-patch14",
        "mm_projector_type": cfg.mm_projector_type,
        "mm_hidden_size": cfg.mm_hidden_size,
        "mm_vision_select_layer": cfg.vision.select_layer,
        "mm_vision_select_feature": cfg.vision.select_feature,
        "image_aspect_ratio": cfg.image_aspect_ratio,
        "mm_use_im_start_end": cfg.mm_use_im_start_end,
        "mm_use_im_patch_token": cfg.mm_use_im_patch_token,
        "tokenizer_model_max_length": cfg.max_sequence_length,
        "torch_dtype": "bfloat16",
        # actual vision-tower dims so import never guesses from the name
        "mm_vision_config": dataclasses.asdict(cfg.vision),
    })
    (out_dir / "config.json").write_text(json.dumps(hf_cfg, indent=2))
    if tokenizer is not None and hasattr(tokenizer, "save_pretrained"):
        tokenizer.save_pretrained(str(out_dir))
    return out_dir


def export_mm_projector_bin(params, out_path) -> Path:
    """Stage-1 adapter-only save (ref llava_trainer.py:239-258:
    mm_projector.bin with 'model.mm_projector.' keys)."""
    import torch

    sd = projector_state_dict_from_params(params["mm_projector"])
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    torch.save(
        {k: torch.tensor(np.asarray(v, np.float32)) for k, v in sd.items()},
        str(out_path),
    )
    return out_path


# ---------------------------------------------------------------------------
# Delta weights (ref llava/model/make_delta.py / apply_delta.py)
# ---------------------------------------------------------------------------

def make_delta(target_params, base_lm_params):
    """target - base on the language model subtree (distribution format for
    license-encumbered bases)."""
    return jax.tree.map(
        lambda t, b: (np.asarray(t, np.float32) - np.asarray(b, np.float32)),
        target_params["language_model"], base_lm_params,
    )


def apply_delta(delta_lm, base_lm_params, dtype=None):
    out = jax.tree.map(
        lambda d, b: np.asarray(d, np.float32) + np.asarray(b, np.float32),
        delta_lm, base_lm_params,
    )
    return out
