"""Apply delta weights to a base model (ref llava/model/apply_delta.py):
reconstruct the full checkpoint from base + delta.

Usage: python -m llava_plus_tpu.models.apply_delta \\
           --base <base dir> --delta <delta dir> --target <out dir>
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base", type=str, required=True)
    parser.add_argument("--delta", type=str, required=True)
    parser.add_argument("--target", type=str, required=True)
    args = parser.parse_args()

    from llava_plus_tpu.models.builder import load_pretrained_model
    from llava_plus_tpu.train.checkpoint import apply_delta, export_hf_llava

    tok_b, base_params, _cfg_b, _p, _c = load_pretrained_model(args.base)
    tok_d, delta_params, cfg, _p, _c = load_pretrained_model(args.delta)
    lm = apply_delta(delta_params["language_model"],
                     base_params["language_model"])
    out = dict(delta_params, language_model=lm)
    export_hf_llava(out, cfg, args.target, tok_d)
    print(f"wrote reconstructed model -> {args.target}")


if __name__ == "__main__":
    main()
