"""Merge a LoRA checkpoint into its base and export HF format
(ref scripts/merge_lora_weights.py)."""

import sys
from pathlib import Path

# allow running as `python scripts/<name>.py` without installing the package
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


import argparse

from llava_plus_tpu.models.builder import load_pretrained_model
from llava_plus_tpu.mm_utils import get_model_name_from_path
from llava_plus_tpu.train.checkpoint import export_hf_llava


def merge_lora(args):
    model_name = get_model_name_from_path(args.model_path)
    tokenizer, params, cfg, _proc, _ctx = load_pretrained_model(
        args.model_path, args.model_base, model_name
    )
    export_hf_llava(params, cfg, args.save_model_path, tokenizer)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", type=str, required=True)
    parser.add_argument("--model-base", type=str, required=True)
    parser.add_argument("--save-model-path", type=str, required=True)
    merge_lora(parser.parse_args())
