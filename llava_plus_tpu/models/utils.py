"""Model-layer utilities: special-token init, config upgrade, consolidation.

- :func:`initialize_vision_tokenizer` — the reference's
  ``llava_arch.py:242-284`` + ``smart_tokenizer_and_embedding_resize``
  (train.py:229-252): add <im_start>/<im_end>/<im_patch>, grow both embedding
  matrices, and initialize new rows with the mean of the old ones.
- :func:`auto_upgrade` — v0->v1 config migration (ref llava/model/utils.py).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from llava_plus_tpu.constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_PATCH_TOKEN,
)


def resize_token_embeddings(lm_params, new_vocab: int, pad_to_multiple: int = 64):
    """Grow embed_tokens/lm_head to new_vocab rows; new rows = mean of old
    (ref smart_tokenizer_and_embedding_resize, train.py:240-252). Pads the
    vocab to a multiple of 64 for MXU-friendly shapes (the reference notes
    its version is 'unoptimized' for exactly this reason)."""
    target = ((new_vocab + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple

    def grow(mat: jnp.ndarray, axis: int) -> jnp.ndarray:
        old = mat.shape[axis]
        if old >= target:
            return mat
        mean = jnp.mean(mat.astype(jnp.float32), axis=axis, keepdims=True)
        reps = [1] * mat.ndim
        reps[axis] = target - old
        pad = jnp.tile(mean, reps).astype(mat.dtype)
        return jnp.concatenate([mat, pad], axis=axis)

    out = dict(lm_params)
    out["embed_tokens"] = grow(lm_params["embed_tokens"], 0)
    if "lm_head" in lm_params:
        out["lm_head"] = grow(lm_params["lm_head"], 1)
    return out


def initialize_vision_tokenizer(
    lm_params,
    tokenizer,
    *,
    mm_use_im_patch_token: bool = False,
    mm_use_im_start_end: bool = False,
) -> Tuple[dict, int]:
    """Add image special tokens to the tokenizer + grow the embeddings.
    Returns (new_lm_params, num_new_tokens)."""
    num_new = 0
    if mm_use_im_patch_token:
        num_new += tokenizer.add_tokens(
            [DEFAULT_IMAGE_PATCH_TOKEN], special_tokens=True
        )
    if mm_use_im_start_end:
        num_new += tokenizer.add_tokens(
            [DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN], special_tokens=True
        )
    if num_new > 0:
        lm_params = resize_token_embeddings(lm_params, len(tokenizer))
    return lm_params, num_new


def auto_upgrade(config_path) -> None:
    """Upgrade a legacy v0 'llava' config in place (ref llava/model/utils.py:
    model_type 'llava' from the v0 era lacks the mm_* keys that inference
    reconstructs the pipeline from)."""
    path = Path(config_path) / "config.json"
    cfg = json.loads(path.read_text())
    if "llava" in cfg.get("_name_or_path", "") and cfg.get("model_type") != "llava":
        cfg["model_type"] = "llava"
        path.write_text(json.dumps(cfg, indent=2))


def consolidate_ckpt(src_path: str, dst_path: str) -> None:
    """Load any supported checkpoint layout and write one consolidated
    HF-format directory (ref llava/model/consolidate.py)."""
    from llava_plus_tpu.models.builder import load_pretrained_model
    from llava_plus_tpu.train.checkpoint import export_hf_llava

    tokenizer, params, cfg, _proc, _ctx = load_pretrained_model(src_path)
    export_hf_llava(params, cfg, dst_path, tokenizer)


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--src", type=str, required=True)
    parser.add_argument("--dst", type=str, required=True)
    args = parser.parse_args()
    consolidate_ckpt(args.src, args.dst)


if __name__ == "__main__":
    main()
