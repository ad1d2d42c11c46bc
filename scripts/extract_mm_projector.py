"""Extract mm_projector weights from a full checkpoint
(ref scripts/extract_mm_projector.py)."""

import sys
from pathlib import Path

# allow running as `python scripts/<name>.py` without installing the package
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


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
    import numpy as np

    def to_torch(v):
        a = np.asarray(v)
        if a.dtype.name == "bfloat16":  # torch can't ingest ml_dtypes bf16
            return torch.from_numpy(a.astype(np.float32)).to(torch.bfloat16)
        return torch.tensor(a)

    proj = {
        k: to_torch(v) for k, v in sd.items() if k.startswith(prefix)
    }
    assert proj, f"no {prefix}* keys found in {args.model_path}"
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    torch.save(proj, args.output)
