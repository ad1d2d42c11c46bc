"""mm_utils parity tests: image tokenization, expand2square, tool reorg."""

import numpy as np
import pytest
from PIL import Image

from llava_plus_tpu.constants import IMAGE_TOKEN_INDEX
from llava_plus_tpu.mm_utils import (
    KeywordsStoppingCriteria,
    expand2square,
    get_model_name_from_path,
    reorganize_source_for_tool_use,
    tokenizer_image_token,
)

from .reference_loader import load_reference_module, reference_available


class FakeTokenizer:
    """Tokenizer stand-in: 1 char = 1 id (ord), with optional BOS=1."""

    def __init__(self, bos=1):
        self.bos_token_id = bos

    def __call__(self, text):
        ids = [] if self.bos_token_id is None else [self.bos_token_id]
        ids += [ord(c) for c in text]
        if self.bos_token_id is not None and text == "":
            pass  # HF llama tokenizer returns [bos] for empty string
        return type("Enc", (), {"input_ids": ids})()

    def batch_decode(self, ids, skip_special_tokens=True):
        out = []
        for row in np.atleast_2d(np.asarray(ids)):
            out.append("".join(chr(int(i)) for i in row if int(i) > 1))
        return out


def test_tokenizer_image_token_basic():
    tok = FakeTokenizer()
    ids = tokenizer_image_token("ab<image>cd", tok)
    assert ids == [1, ord("a"), ord("b"), IMAGE_TOKEN_INDEX, ord("c"), ord("d")]


def test_tokenizer_image_token_multi_image():
    tok = FakeTokenizer()
    ids = tokenizer_image_token("a<image>b<image>c", tok)
    assert ids == [
        1, ord("a"), IMAGE_TOKEN_INDEX, ord("b"), IMAGE_TOKEN_INDEX, ord("c")
    ]


def test_tokenizer_image_token_leading_image():
    tok = FakeTokenizer()
    ids = tokenizer_image_token("<image>\nhi", tok)
    assert ids == [1, IMAGE_TOKEN_INDEX, ord("\n"), ord("h"), ord("i")]


def test_tokenizer_image_token_no_bos():
    tok = FakeTokenizer(bos=None)
    ids = tokenizer_image_token("ab<image>cd", tok)
    assert ids == [ord("a"), ord("b"), IMAGE_TOKEN_INDEX, ord("c"), ord("d")]


def test_tokenizer_image_token_np():
    tok = FakeTokenizer()
    arr = tokenizer_image_token("a<image>b", tok, return_tensors="np")
    assert arr.dtype == np.int32
    assert arr.tolist() == [1, ord("a"), IMAGE_TOKEN_INDEX, ord("b")]


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize(
    "prompt",
    ["ab<image>cd", "<image>x", "x<image>", "<image>", "no image", "",
     "a<image><image>b", "a<image>b<image>c<image>d"],
)
def test_tokenizer_image_token_parity(prompt):
    ref = load_reference_module("llava/mm_utils.py", "ref_mm_utils")
    tok = FakeTokenizer()
    assert tokenizer_image_token(prompt, tok) == ref.tokenizer_image_token(prompt, tok)


def test_expand2square():
    img = Image.new("RGB", (10, 4), (255, 0, 0))
    out = expand2square(img, (0, 0, 0))
    assert out.size == (10, 10)
    arr = np.asarray(out)
    assert (arr[0] == 0).all()          # top padding row
    assert (arr[4, :, 0] == 255).all()  # original content centered
    sq = Image.new("RGB", (5, 5))
    assert expand2square(sq, (0, 0, 0)) is sq


def test_get_model_name_from_path():
    assert get_model_name_from_path("/a/b/llava-v1.5-7b/") == "llava-v1.5-7b"
    assert (
        get_model_name_from_path("/a/llava-lora/checkpoint-500")
        == "llava-lora_checkpoint-500"
    )


def test_keywords_stopping_criteria():
    tok = FakeTokenizer()
    prompt_ids = np.array([[1, ord("h"), ord("i")]])
    crit = KeywordsStoppingCriteria(["</s>"], tok, prompt_ids)
    grown = np.concatenate([prompt_ids, [[ord("x")]]], axis=1)
    assert not crit(grown)
    kw = tok("</s>").input_ids[1:]
    stopped = np.concatenate([grown, [kw]], axis=1)
    assert crit(stopped)


def test_reorganize_source_for_tool_use():
    src = [
        {"from": "human", "value": "find the cat"},
        {"from": "gpt", "thoughts": "use dino", "actions": [{"API_name": "grounding_dino"}], "value": "ok"},
    ]
    out = reorganize_source_for_tool_use([dict(s) for s in src])
    assert out[0]["value"] == "find the cat"
    v = out[1]["value"]
    assert v.startswith('"thoughts🤔" use dino\n"actions🚀" ')
    assert v.endswith('"value👉" ok\n')
    assert "thoughts" not in out[1] or out[1].get("thoughts") is None


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_reorganize_parity():
    ref = load_reference_module("llava/mm_utils.py", "ref_mm_utils")
    def mk():
        return [
            {"from": "human", "value": "q"},
            {"from": "gpt", "thoughts": "t", "actions": [{"a": 1}], "value": "v"},
            {"from": "gpt", "value": "plain answer"},
            {"from": "gpt", "actions": []},
        ]
    assert reorganize_source_for_tool_use(mk()) == ref.reorganize_source_for_tool_use(mk())


def test_misc_serving_utils():
    from llava_plus_tpu.utils.misc import (
        detect_language, is_partial_stop, parse_gradio_auth_creds,
        violates_moderation,
    )

    assert is_partial_stop("hello </", "</s>")
    assert is_partial_stop("hello <", "</s>")
    assert not is_partial_stop("hello!", "</s>")
    assert detect_language("这是中文") == "zh"
    assert detect_language("plain english") == "en"
    # no API key in CI -> moderation fails open
    assert violates_moderation("anything") is False

    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("alice:secret\n\nbob:hunter2\n")
        name = f.name
    assert parse_gradio_auth_creds(name) == [("alice", "secret"), ("bob", "hunter2")]
