"""Interactive CLI chat (ref ``llava/serve/cli.py``): load a model, pick the
conversation template from the model name, stream answers about an image."""

from __future__ import annotations

import argparse

import numpy as np
import requests
from PIL import Image
from io import BytesIO

from llava_plus_tpu.constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_TOKEN,
)
from llava_plus_tpu.conversation import SeparatorStyle, conv_templates
from llava_plus_tpu.mm_utils import get_model_name_from_path, process_images


def load_image(image_file: str) -> Image.Image:
    if image_file.startswith(("http://", "https://")):
        resp = requests.get(image_file)
        return Image.open(BytesIO(resp.content)).convert("RGB")
    return Image.open(image_file).convert("RGB")


def pick_conv_mode(model_name: str) -> str:
    """Template auto-selection by model name (ref cli.py:34-46)."""
    name = model_name.lower()
    if "llama-2" in name:
        return "llava_llama_2"
    if "v1" in name:
        return "llava_v1"
    if "mpt" in name:
        return "mpt"
    return "llava_v0"


def main(args):
    from llava_plus_tpu.generate import Generator
    from llava_plus_tpu.models.builder import load_pretrained_model

    model_name = get_model_name_from_path(args.model_path)
    tokenizer, params, cfg, image_processor, context_len = load_pretrained_model(
        args.model_path, args.model_base, model_name
    )
    gen = Generator(params, cfg, tokenizer, image_processor,
                    max_seq_len=context_len)

    conv_mode = args.conv_mode or pick_conv_mode(model_name)
    conv = conv_templates[conv_mode].copy()
    roles = conv.roles

    image = load_image(args.image_file) if args.image_file else None
    image_arrays = None
    if image is not None:
        image_arrays = process_images([image], image_processor, cfg)

    first_turn = True
    while True:
        try:
            inp = input(f"{roles[0]}: ")
        except EOFError:
            inp = ""
        if not inp:
            print("exit...")
            break

        print(f"{roles[1]}: ", end="", flush=True)
        if image is not None and first_turn:
            if cfg.mm_use_im_start_end:
                inp = (DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN
                       + DEFAULT_IM_END_TOKEN + "\n" + inp)
            else:
                inp = DEFAULT_IMAGE_TOKEN + "\n" + inp
            first_turn = False
        conv.append_message(conv.roles[0], inp)
        conv.append_message(conv.roles[1], None)
        prompt = conv.get_prompt()

        stop_str = (
            conv.sep if conv.sep_style != SeparatorStyle.TWO else conv.sep2
        )
        shown = 0
        text = ""
        for text in gen.stream(
            prompt,
            images=image_arrays,
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature,
            stop_strings=[stop_str] if stop_str else [],
        ):
            print(text[shown:], end="", flush=True)
            shown = len(text)
        print()
        conv.messages[-1][-1] = text

        if args.debug:
            print("\n", {"prompt": prompt, "outputs": text}, "\n")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", type=str, default=None,
                        help="accepted for reference-CLI compatibility")
    parser.add_argument("--model-path", type=str, required=True)
    parser.add_argument("--model-base", type=str, default=None)
    parser.add_argument("--image-file", type=str, default=None)
    parser.add_argument("--conv-mode", type=str, default=None)
    parser.add_argument("--temperature", type=float, default=0.2)
    parser.add_argument("--max-new-tokens", type=int, default=512)
    parser.add_argument("--debug", action="store_true")
    main(parser.parse_args())
