"""Pretrained model loading — the reference's 4 checkpoint shapes.

Rebuild of ``llava/model/builder.py:26-151``:

1. LoRA + base:      adapter dir with ``non_lora_trainables.bin`` +
                     ``adapter_model`` over a base model (merge on load)
2. base + projector: LM dir + ``mm_projector.bin`` adapter
                     (``tune_mm_mlp_adapter`` stage-1 output)
3. full LLaVA ckpt:  one directory with everything
4. plain LM:         text-only checkpoint

Returns ``(tokenizer, params, cfg, image_processor, context_len)`` — same
contract, minus torch. Weights land as bf16 pytrees (fp32 opt-in).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple

from llava_plus_tpu.data.image_processing import (
    ClipImageProcessor,
    processor_for_vision_tower,
)
from llava_plus_tpu.models import hf_import
from llava_plus_tpu.models.configs import LlavaConfig
from llava_plus_tpu.utils.logging import build_logger

logger = build_logger("builder", "model_builder.log")


def load_tokenizer(model_path: str):
    path = Path(model_path)
    has_tok_files = any(
        (path / f).exists()
        for f in ("tokenizer.json", "tokenizer.model", "tokenizer_config.json")
    )
    if not has_tok_files and (path / "config.json").exists():
        # checkpoints from --tiny-debug-model runs carry no tokenizer; fall
        # back to the deterministic offline DebugTokenizer so the full
        # serve/eval stack runs without downloads
        cfg = _read_config(path)
        logger.warning(f"{model_path}: no tokenizer files; using DebugTokenizer")
        from llava_plus_tpu.data.debug_tokenizer import DebugTokenizer

        return DebugTokenizer(vocab_size=cfg.get("vocab_size", 32000))
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(model_path, use_fast=True)


def _read_config(path: Path) -> dict:
    return json.loads((path / "config.json").read_text())


def load_pretrained_model(
    model_path: str,
    model_base: Optional[str] = None,
    model_name: Optional[str] = None,
    *,
    dtype: str = "bfloat16",
) -> Tuple[object, dict, LlavaConfig, Optional[ClipImageProcessor], int]:
    path = Path(model_path)
    model_name = model_name or path.name
    is_llava = "llava" in model_name.lower()

    # (the reference additionally gates on 'llava' in the name; an
    # adapter_config.json + base is unambiguous, so accept any name)
    if model_base is not None and (path / "adapter_config.json").exists():
        tokenizer, params, cfg = _load_lora(path, Path(model_base), dtype)
    elif model_base is not None and (path / "mm_projector.bin").exists():
        tokenizer, params, cfg = _load_base_plus_projector(path, Path(model_base), dtype)
    elif is_llava or _has_mm_config(path):
        cfg = hf_import.llava_config_from_hf_dir(path)
        params, cfg = hf_import.llava_params_from_hf_dir(path, cfg, dtype=dtype)
        tokenizer = load_tokenizer(model_path)
    else:
        # plain text-only LM
        d = _read_config(path)
        text_cfg = hf_import.llama_config_from_hf(d)
        sd = hf_import.load_state_dict_dir(path)
        lm = hf_import.llama_params_from_state_dict(sd, text_cfg, dtype=dtype)
        cfg = LlavaConfig(text=text_cfg, mm_projector_type="identity")
        params = {"language_model": lm, "vision_tower": {}, "mm_projector": {}}
        tokenizer = load_tokenizer(model_path)

    image_processor = None
    if is_llava or _has_mm_config(path):
        # size the processor from the checkpoint's actual vision dims (cfg
        # came from mm_vision_config when present), not the tower name —
        # tiny/exported checkpoints are not 224/336
        size = cfg.vision.image_size
        image_processor = ClipImageProcessor(shortest_edge=size, crop_size=size)
    context_len = _context_len(path)
    return tokenizer, params, cfg, image_processor, context_len


def _has_mm_config(path: Path) -> bool:
    try:
        return "mm_vision_tower" in _read_config(path)
    except Exception:
        return False


def _context_len(path: Path) -> int:
    try:
        d = _read_config(path)
    except Exception:
        return 2048
    if "max_sequence_length" in d:
        return d["max_sequence_length"]
    return d.get("tokenizer_model_max_length", 2048)


def _load_base_plus_projector(path: Path, base: Path, dtype):
    """Stage-1 output: base LM + CLIP tower + trained mm_projector.bin
    (ref builder.py:83-99)."""
    d_ckpt = _read_config(path)
    base_cfg_d = _read_config(base)
    text_cfg = hf_import.llama_config_from_hf(base_cfg_d)
    sd_base = hf_import.load_state_dict_dir(base)
    lm = hf_import.llama_params_from_state_dict(sd_base, text_cfg, dtype=dtype)

    cfg = LlavaConfig(
        text=text_cfg,
        mm_projector_type=d_ckpt.get("mm_projector_type", "linear"),
        mm_hidden_size=d_ckpt.get("mm_hidden_size", 1024),
        image_aspect_ratio=d_ckpt.get("image_aspect_ratio", "square"),
    )
    import torch

    proj_sd = {
        k: v for k, v in torch.load(
            str(path / "mm_projector.bin"), map_location="cpu", weights_only=True
        ).items()
    }
    proj_sd = {k.replace("model.mm_projector.", ""): v for k, v in proj_sd.items()}
    proj = hf_import.projector_params_from_state_dict(
        proj_sd, cfg.mm_projector_type, dtype=dtype
    )
    vt = _load_vision_tower(d_ckpt, cfg, dtype)
    tokenizer = load_tokenizer(str(base))
    return tokenizer, {
        "language_model": lm, "vision_tower": vt, "mm_projector": proj,
    }, cfg


def _load_vision_tower(cfg_dict: dict, cfg: LlavaConfig, dtype):
    """Load the CLIP tower referenced by mm_vision_tower (a local path in the
    zero-egress environment; HF hub name requires a local cache)."""
    name = cfg_dict.get("mm_vision_tower", "openai/clip-vit-large-patch14-336")
    p = Path(name)
    if p.exists():
        sd = hf_import.load_state_dict_dir(p)
        return hf_import.clip_params_from_state_dict(sd, cfg.vision, dtype=dtype)
    logger.warning(
        f"vision tower checkpoint {name} not found locally; "
        "initializing randomly (logits will NOT match the reference)"
    )
    import jax
    import jax.numpy as jnp

    from llava_plus_tpu.models import clip_vit

    jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    return clip_vit.init_params(cfg.vision, jax.random.PRNGKey(0), jdt)


def _load_lora(path: Path, base: Path, dtype):
    """LoRA checkpoint: merge adapter deltas + non-LoRA trainables into the
    base model (ref builder.py:49-82)."""
    from llava_plus_tpu.train.lora import merge_lora_checkpoint

    return merge_lora_checkpoint(path, base, dtype)
