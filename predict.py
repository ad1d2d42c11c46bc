"""Deployment predictor (ref predict.py / cog.yaml, Replicate-style).

Loads LLaVA-1.5 weights from a local directory (or a weights mirror when the
deployment image has egress), then serves streaming predictions. The cog
decorators are optional — the class works standalone.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

DEFAULT_WEIGHTS = os.environ.get(
    "LLAVA_WEIGHTS", "./checkpoints/llava-v1.5-13b"
)


class Predictor:
    def setup(self, weights: Optional[str] = None) -> None:
        from llava_plus_tpu.generate import Generator
        from llava_plus_tpu.mm_utils import get_model_name_from_path
        from llava_plus_tpu.models.builder import load_pretrained_model

        path = weights or DEFAULT_WEIGHTS
        name = get_model_name_from_path(path)
        (self.tokenizer, params, self.cfg, self.image_processor,
         context_len) = load_pretrained_model(path, model_name=name)
        self.generator = Generator(
            params, self.cfg, self.tokenizer, self.image_processor,
            max_seq_len=context_len,
        )

    def predict(
        self,
        image: str,
        prompt: str,
        top_p: float = 1.0,
        temperature: float = 0.2,
        max_tokens: int = 1024,
    ) -> Iterator[str]:
        """Stream the answer to a visual prompt (image = path or URL)."""
        from llava_plus_tpu.conversation import SeparatorStyle, conv_templates
        from llava_plus_tpu.mm_utils import process_images
        from llava_plus_tpu.serve.cli import load_image

        conv = conv_templates["llava_v1"].copy()
        pil = load_image(image)
        images = process_images([pil], self.image_processor, self.cfg)

        conv.append_message(conv.roles[0], "<image>\n" + prompt)
        conv.append_message(conv.roles[1], None)
        stop = conv.sep if conv.sep_style != SeparatorStyle.TWO else conv.sep2

        prev = 0
        for text in self.generator.stream(
            conv.get_prompt(), images=images,
            max_new_tokens=max_tokens, temperature=temperature, top_p=top_p,
            stop_strings=[stop] if stop else [],
        ):
            yield text[prev:]
            prev = len(text)


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--image", type=str, required=True)
    parser.add_argument("--prompt", type=str, required=True)
    args = parser.parse_args()
    p = Predictor()
    p.setup(args.weights)
    for piece in p.predict(args.image, args.prompt):
        print(piece, end="", flush=True)
    print()
