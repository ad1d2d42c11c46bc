"""Extract mm_projector weights from a full checkpoint
(ref scripts/extract_mm_projector.py)."""

import argparse
import os

import torch


def parse_args():
    parser = argparse.ArgumentParser(
        description="Extract MMProjector weights"
    )
    parser.add_argument("--model-path", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()
    from llava_plus_tpu.models.hf_import import load_state_dict_dir

    sd = load_state_dict_dir(args.model_path)
    prefix = "model.mm_projector."
    proj = {
        k: torch.tensor(v) for k, v in sd.items() if k.startswith(prefix)
    }
    assert proj, f"no {prefix}* keys found in {args.model_path}"
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    torch.save(proj, args.output)
