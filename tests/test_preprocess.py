"""Label-masking tests for the training preprocess pipelines.

Uses an SP-like word tokenizer that reproduces the LLaMA sentencepiece
properties the reference's round arithmetic depends on (BOS per call,
context-free word pieces, trailing-space artifact token), so the subtle
``instruction_len - 2`` logic is exercised for real: instructions masked,
answers + eos kept, and the mismatch tripwire stays silent.
"""

import re

import numpy as np
import pytest

from llava_plus_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from llava_plus_tpu.conversation import conv_templates
from llava_plus_tpu.data.preprocess import (
    preprocess,
    preprocess_multimodal,
    preprocess_plain,
    preprocess_v1,
)


class SpLikeTokenizer:
    """Word-level tokenizer with sentencepiece-like artifacts:
    - BOS prepended to every call
    - "</s>" is a single token even when glued to text
    - a trailing space emits an extra artifact token (like SP's dangling "▁")
    """

    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0
    model_max_length = 4096
    _SPACE = 3  # artifact token

    def __init__(self):
        self.vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "▁": 3}

    def _word_id(self, w):
        if w not in self.vocab:
            self.vocab[w] = len(self.vocab) + 10
        return self.vocab[w]

    def _encode_words(self, text):
        ids = []
        for piece in re.split(r"(</s>|<\|im_start\|>|<\|im_end\|>|\n)", text):
            if piece == "":
                continue
            if piece == "</s>":
                ids.append(self.eos_token_id)
                continue
            if piece in ("<|im_start|>", "<|im_end|>", "\n"):
                ids.append(self._word_id(piece))
                continue
            trailing_space = piece.endswith(" ")
            for w in piece.split(" "):
                if w:
                    ids.append(self._word_id(w))
            if trailing_space:
                ids.append(self._SPACE)
        return ids

    def __call__(self, text):
        ids = self._encode_words(text)
        if self.bos_token_id is not None:
            ids = [self.bos_token_id] + ids
        return type("Enc", (), {"input_ids": ids})()

    def decode(self, ids, skip_special_tokens=True):
        inv = {v: k for k, v in self.vocab.items()}
        return " ".join(inv.get(int(i), "?") for i in ids)


CONV = conv_templates["v1"]


def _sources(n_rounds=2, with_image=False):
    src = []
    for i in range(n_rounds):
        q = ("<image>\nwhat is this" if (with_image and i == 0)
             else f"question {i}")
        src.append({"from": "human", "value": q})
        src.append({"from": "gpt", "value": f"answer {i} text"})
    return [src]


def test_v1_masks_instructions_keeps_answers():
    tok = SpLikeTokenizer()
    out = preprocess_v1(_sources(2), tok, has_image=False, conv=CONV)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert len(ids) == len(labels)
    # not everything masked (mismatch tripwire would mask all)
    kept = labels != IGNORE_INDEX
    assert kept.any()
    # every kept label equals its input id
    np.testing.assert_array_equal(labels[kept], ids[kept])
    # kept spans decode to the answers (+ eos)
    text = tok.decode(ids[kept])
    assert "answer 0 text" in text and "answer 1 text" in text
    assert "question" not in text
    assert "USER:" not in text and "ASSISTANT:" not in text


def test_v1_with_image_tokens():
    tok = SpLikeTokenizer()
    srcs = preprocess_multimodal(_sources(1, with_image=True))
    out = preprocess(srcs, tok, has_image=True, conv=CONV)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    # image token masked in labels
    assert labels[np.where(ids == IMAGE_TOKEN_INDEX)[0][0]] == IGNORE_INDEX
    kept = labels != IGNORE_INDEX
    assert "answer 0 text" in tok.decode(ids[kept])


def test_plain_masks_image_span():
    tok = SpLikeTokenizer()
    srcs = [[
        {"from": "human", "value": "<image>\nsome noise"},
        {"from": "gpt", "value": "a photo of a cat"},
    ]]
    out = preprocess_plain(srcs, tok, conv=conv_templates["plain"])
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert ids[1] == IMAGE_TOKEN_INDEX
    assert labels[1] == IGNORE_INDEX
    kept = labels != IGNORE_INDEX
    assert "cat" in tok.decode(ids[kept])


def test_tool_use_reorganization_applied():
    tok = SpLikeTokenizer()
    srcs = [[
        {"from": "human", "value": "find the dog"},
        {"from": "gpt", "thoughts": "use grounding",
         "actions": [{"API_name": "grounding_dino"}], "value": "on it"},
    ]]
    out = preprocess(srcs, tok, has_image=False, conv=CONV)
    ids, labels = out["input_ids"][0], out["labels"][0]
    kept = labels != IGNORE_INDEX
    text = tok.decode(ids[kept])
    assert "thoughts🤔\"" in text or "thoughts" in text  # grammar serialized


def test_mismatch_tripwire_masks_everything():
    class BrokenTokenizer(SpLikeTokenizer):
        def __call__(self, text):
            ids = [self.bos_token_id] + self._encode_words(text)
            if text.endswith("text"):  # per-round count diverges
                ids += [99, 99, 99]
            return type("Enc", (), {"input_ids": ids})()

    tok = BrokenTokenizer()
    out = preprocess_v1(_sources(1), tok, has_image=False, conv=CONV)
    assert (out["labels"][0] == IGNORE_INDEX).all()


def test_mpt_preprocess():
    # MPT's GPT-NeoX-style tokenizer has no BOS
    tok = SpLikeTokenizer()
    tok.bos_token_id = None
    out = preprocess(_sources(2), tok, has_image=False,
                     conv=conv_templates["mpt"])
    ids, labels = out["input_ids"][0], out["labels"][0]
    kept = labels != IGNORE_INDEX
    assert kept.any()
    np.testing.assert_array_equal(labels[kept], ids[kept])


def test_v0_default_preprocess():
    tok = SpLikeTokenizer()
    out = preprocess(_sources(2), tok, has_image=False,
                     conv=conv_templates["v0"])
    ids, labels = out["input_ids"][0], out["labels"][0]
    kept = labels != IGNORE_INDEX
    assert kept.any()
    text = tok.decode(ids[kept])
    assert "answer" in text
