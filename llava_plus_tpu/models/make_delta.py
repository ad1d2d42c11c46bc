"""Delta-weight distribution CLI (ref llava/model/make_delta.py):
write target minus base on the language model so license-encumbered bases
can be distributed as deltas.

Usage: python -m llava_plus_tpu.models.make_delta \\
           --base <base dir> --target <full llava dir> --delta <out dir>
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base", type=str, required=True)
    parser.add_argument("--target", type=str, required=True)
    parser.add_argument("--delta", type=str, required=True)
    args = parser.parse_args()

    from llava_plus_tpu.models.builder import load_pretrained_model
    from llava_plus_tpu.train.checkpoint import export_hf_llava, make_delta

    tok_b, base_params, _cfg_b, _p, _c = load_pretrained_model(args.base)
    tok_t, target_params, cfg, _p, _c = load_pretrained_model(args.target)
    delta_lm = make_delta(target_params, base_params["language_model"])
    out = dict(target_params, language_model=delta_lm)
    export_hf_llava(out, cfg, args.delta, tok_t)
    print(f"wrote delta -> {args.delta}")


if __name__ == "__main__":
    main()
