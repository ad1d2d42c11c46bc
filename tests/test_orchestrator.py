"""Tool-use loop integration tests: controller + scripted LLM worker + fake
tool worker over real HTTP — the reference's config #3 with no GPU models."""

import base64
import json
from io import BytesIO

import numpy as np
import pytest
from PIL import Image

from llava_plus_tpu.conversation import conv_templates, serialize_tool_turn
from llava_plus_tpu.serve.controller import Controller, build_app as build_controller_app
from llava_plus_tpu.serve.model_worker import ModelWorker, build_app as build_worker_app
from llava_plus_tpu.serve.orchestrator import (
    ToolOrchestrator,
    ToolSession,
    build_round2_message,
    fold_tool_response,
    parse_tool_cfg,
    prepare_tool_call,
)
from llava_plus_tpu.serve.tool_workers.base import build_tool_app
from llava_plus_tpu.serve.tool_workers.fake_tool_worker import FakeToolWorker

from .test_serving import AppThread

from .test_serving import _free_port

CTRL_PORT = _free_port()
LLM_PORT = _free_port()
TOOL_PORT = _free_port()


class ScriptedToolBackend:
    """Round 1: emit the tool grammar; round 2 (summarize): final answer."""

    is_multimodal = True
    context_len = 2048

    def generate_stream(self, params):
        prompt = params["prompt"]
        if "model outputs:" in prompt:
            yield prompt + " The image shows a cat in the detected box."
        else:
            reply = serialize_tool_turn(
                thoughts="I need to locate the object.",
                actions=[{
                    "API_name": "grounding_dino",
                    "API_params": {"caption": "a cat"},
                }],
                value="Let me find it.",
            )
            yield prompt + " " + reply


@pytest.fixture(scope="module")
def topology():
    controller = Controller("shortest_queue", start_expiration_thread=False)
    t1 = AppThread(build_controller_app(controller), CTRL_PORT)
    llm = ModelWorker(
        f"http://127.0.0.1:{CTRL_PORT}", f"http://127.0.0.1:{LLM_PORT}",
        ScriptedToolBackend(), ["llava-plus-7b"], heartbeats=False,
    )
    t2 = AppThread(build_worker_app(llm), LLM_PORT)
    tool = FakeToolWorker(
        f"http://127.0.0.1:{CTRL_PORT}", f"http://127.0.0.1:{TOOL_PORT}",
        ["grounding_dino"], heartbeats=False,
    )
    t3 = AppThread(build_tool_app(tool), TOOL_PORT)
    yield controller
    for t in (t1, t2, t3):
        t.stop()


def _image():
    rng = np.random.default_rng(0)
    return Image.fromarray(rng.integers(0, 255, (80, 100, 3), dtype=np.uint8))


def test_full_tool_loop(topology):
    orch = ToolOrchestrator(f"http://127.0.0.1:{CTRL_PORT}")
    conv = conv_templates["v1"].copy()
    result = orch.run_turn(
        conv, "llava-plus-7b", "find the cat", image=_image(),
        max_new_tokens=64, stop="</s>",
    )
    assert result.error is None
    assert result.api_name == "grounding_dino"
    assert result.tool_response["phrases"] == ["object"]
    assert "cat" in result.text
    # two full rounds recorded in the conversation
    assert len(conv.messages) == 4
    assert "model outputs:" in conv.messages[2][1]
    # boxes drawn on the image
    assert result.annotated_image is not None
    assert result.annotated_image.size == (100, 80)


def test_no_tool_passthrough(topology):
    class PlainBackend(ScriptedToolBackend):
        def generate_stream(self, params):
            yield params["prompt"] + " just a plain answer"

    # direct orchestrator stream against a plain reply: no tool call parsed
    text = 'no grammar here'
    assert parse_tool_cfg(text) is None


def test_parse_tool_cfg_single_quotes():
    body = serialize_tool_turn(
        thoughts="t", actions=[{"API_name": "sam"}], value="v"
    ).replace('"API_name"', "'API_name'")
    cfg = parse_tool_cfg(body)
    assert cfg[0]["API_name"] == "sam"


def test_prepare_tool_call_surgery():
    session = ToolSession(mask_rle={"size": [2, 2], "counts": [4]})
    api, paras = prepare_tool_call(
        [{"API_name": "inpainting", "API_params": {"prompt": "x", "image": "IGNORED"}}],
        "B64IMG", session,
    )
    assert api == "inpainting"
    assert paras["mask"] == session.mask_rle
    assert paras["image"] == "B64IMG"
    assert paras["box_threshold"] == 0.3

    api, paras = prepare_tool_call(
        [{"API_name": "openseed", "API_params": {}}], None, ToolSession()
    )
    assert api == "controlnet" and paras["mode"] == "openseed"

    with pytest.raises(AssertionError):
        prepare_tool_call(
            [{"API_name": "a"}, {"API_name": "b"}], None, ToolSession()
        )


def test_fold_tool_response_rounding_and_caching():
    session = ToolSession()
    folded, artifacts = fold_tool_response("grounding_dino", {
        "boxes": [[1.23456, 2.34567, 3.45678, 4.56789]],
        "logits": [0.98765],
        "size": [80, 100],
        "masks_rle": [{"size": [2, 2], "counts": [4]}],
    }, session)
    assert folded["boxes"] == [[1.23, 2.35, 3.46, 4.57]]
    assert folded["logits"] == [0.99]
    assert "size" not in folded and "masks_rle" not in folded
    assert session.mask_rle == {"size": [2, 2], "counts": [4]}
    assert artifacts["masks_rle"]

    # empty response gets the processed-image message
    folded2, _ = fold_tool_response("sd", {"size": [4, 4]}, session)
    assert folded2["message"] == "The sd has processed the image."


def test_round2_message_format():
    msg = build_round2_message("grounding_dino", {"boxes": [[1, 2, 3, 4]]},
                               "  find the cat ")
    assert msg.startswith("grounding_dino model outputs: {'boxes': [[1, 2, 3, 4]]}\n\n")
    assert msg.endswith(
        "Please summarize the model outputs and answer my first question: find the cat"
    )
