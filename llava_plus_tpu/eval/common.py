"""Shared eval plumbing: chunking, answer files, model session.

The reference fans out eval across GPUs with ``--num-chunks/--chunk-idx``
(``llava/eval/model_vqa_loader.py:19-27``); the same contract here also maps
onto ``jax.process_index()`` for multi-host runs.
"""

from __future__ import annotations

import json
import math
import os
from typing import Iterable, List


def split_list(lst: List, n: int) -> List[List]:
    chunk_size = math.ceil(len(lst) / n)
    return [lst[i : i + chunk_size] for i in range(0, len(lst), chunk_size)]


def get_chunk(lst: List, n: int, k: int) -> List:
    chunks = split_list(lst, n)
    return chunks[k] if k < len(chunks) else []


def load_jsonl(path) -> List[dict]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def write_jsonl(path, rows: Iterable[dict], mode: str = "w") -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, mode) as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


def short_uuid() -> str:
    import uuid

    return uuid.uuid4().hex[:22]


class EvalSession:
    """Load a model once; greedy (or sampled) answers for eval prompts."""

    def __init__(self, model_path, model_base=None, model_name=None,
                 conv_mode="llava_v1", temperature=0.0, top_p=1.0,
                 max_new_tokens=128, backend=None):
        self.conv_mode = conv_mode
        self.temperature = temperature
        self.top_p = top_p
        self.max_new_tokens = max_new_tokens
        if backend is not None:
            # test seam: any object with .answer(prompt, image) -> str
            self.backend = backend
            return
        from llava_plus_tpu.generate import Generator
        from llava_plus_tpu.mm_utils import get_model_name_from_path
        from llava_plus_tpu.models.builder import load_pretrained_model

        name = model_name or get_model_name_from_path(model_path)
        tokenizer, params, cfg, image_processor, context_len = (
            load_pretrained_model(model_path, model_base, name)
        )
        self.cfg = cfg
        self.image_processor = image_processor
        self.generator = Generator(
            params, cfg, tokenizer, image_processor, max_seq_len=context_len
        )
        self.backend = None

    def answer(self, prompt: str, image=None, stop_strings=()) -> str:
        if self.backend is not None:
            return self.backend.answer(prompt, image)
        images = None
        if image is not None:
            from llava_plus_tpu.mm_utils import process_images

            images = process_images([image], self.image_processor, self.cfg)
        result = self.generator.generate(
            prompt, images=images,
            max_new_tokens=self.max_new_tokens,
            temperature=self.temperature,
            top_p=self.top_p,
            stop_strings=list(stop_strings),
        )
        return result.text.strip()
