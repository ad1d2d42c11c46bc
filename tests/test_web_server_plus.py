"""LLaVA-Plus web UI surface over the echo topology: browser streaming,
cross-turn tool state (segment -> inpaint across two /api/chat calls),
sketch-mask bbox prompts, SEEM reference capture, Prog/tool transcript
events. The VERDICT-round-1 gaps for the Plus interaction surface."""

import base64
import json
from io import BytesIO

import numpy as np
import pytest
import requests
from PIL import Image

from llava_plus_tpu.conversation import serialize_tool_turn
from llava_plus_tpu.serve.controller import Controller, build_app as build_controller_app
from llava_plus_tpu.serve.model_worker import ModelWorker, build_app as build_worker_app
from llava_plus_tpu.serve.protocol import iter_chunks_requests
from llava_plus_tpu.serve.tool_workers.base import build_tool_app
from llava_plus_tpu.serve.tool_workers.fake_tool_worker import FakeToolWorker
from llava_plus_tpu.serve.web_server import build_app as build_web_app

from .test_serving import AppThread, _free_port

CTRL, LLM, TOOL, WEB = (_free_port() for _ in range(4))


class PlusScriptedBackend:
    """Emits a sam action for 'segment', an inpainting action for 'remove',
    and a summary for round-2 prompts. Records every prompt it sees."""

    is_multimodal = True
    context_len = 2048
    prompts: list = []

    def generate_stream(self, params):
        prompt = params["prompt"]
        PlusScriptedBackend.prompts.append(prompt)
        tail = prompt[-600:]
        if "Please summarize the model outputs" in tail:
            yield prompt + " Done: summarized the tool output."
        elif "remove" in tail:
            reply = serialize_tool_turn(
                thoughts="User wants the object removed; inpaint it.",
                actions=[{"API_name": "inpainting",
                          "API_params": {"prompt": "background"}}],
                value="Removing it.",
            )
            yield prompt + " " + reply
        else:
            reply = serialize_tool_turn(
                thoughts="Segment the object first.",
                actions=[{"API_name": "sam", "API_params": {}}],
                value="Segmenting.",
            )
            yield prompt + " " + reply


class RecordingToolWorker(FakeToolWorker):
    calls: list = []

    def generate(self, params):
        RecordingToolWorker.calls.append(dict(params))
        return super().generate(params)


@pytest.fixture(scope="module")
def topology():
    controller = Controller("shortest_queue", start_expiration_thread=False)
    t1 = AppThread(build_controller_app(controller), CTRL)
    llm = ModelWorker(
        f"http://127.0.0.1:{CTRL}", f"http://127.0.0.1:{LLM}",
        PlusScriptedBackend(), ["llava-plus-7b"], heartbeats=False,
    )
    t2 = AppThread(build_worker_app(llm), LLM)
    tool = RecordingToolWorker(
        f"http://127.0.0.1:{CTRL}", f"http://127.0.0.1:{TOOL}",
        ["sam", "inpainting"], heartbeats=False,
    )
    t3 = AppThread(build_tool_app(tool), TOOL)
    t4 = AppThread(
        build_web_app(f"http://127.0.0.1:{CTRL}", llava_plus=True), WEB
    )
    yield
    for t in (t1, t2, t3, t4):
        t.stop()


def _img_b64(w=100, h=80):
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    buf = BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _chat(payload):
    r = requests.post(
        f"http://127.0.0.1:{WEB}/api/chat", json=payload, stream=True,
        timeout=30,
    )
    return list(iter_chunks_requests(r))


def test_segment_then_inpaint_across_turns(topology):
    """Turn 1 segments (sam caches mask_rle on the server-side session);
    turn 2 inpaints and must receive that cached mask (ref caches it on the
    conversation state, gradio_web_server_llava_plus.py:560-596)."""
    RecordingToolWorker.calls.clear()
    sid = "sess-segment-inpaint"
    chunks1 = _chat({
        "model": "llava-plus-7b", "text": "segment the cat",
        "history": [], "session_id": sid, "image": _img_b64(),
    })
    final1 = [c for c in chunks1 if "text" in c][-1]["text"]
    assert "summarized" in final1
    assert RecordingToolWorker.calls, "sam was not called"
    assert "mask" not in RecordingToolWorker.calls[0] or \
        RecordingToolWorker.calls[0].get("mask") is None

    chunks2 = _chat({
        "model": "llava-plus-7b", "text": "now remove it",
        "history": [["segment the cat", final1]], "session_id": sid,
        "image": _img_b64(),
    })
    final2 = [c for c in chunks2 if "text" in c][-1]["text"]
    assert "summarized" in final2
    inpaint_calls = [c for c in RecordingToolWorker.calls if "mask" in c]
    assert inpaint_calls, "inpainting did not receive a mask parameter"
    mask = inpaint_calls[-1]["mask"]
    assert isinstance(mask, dict) and "counts" in mask, mask


def test_fresh_session_has_no_mask(topology):
    """A different session id must NOT see the other session's cached mask."""
    RecordingToolWorker.calls.clear()
    chunks = _chat({
        "model": "llava-plus-7b", "text": "remove it please",
        "history": [], "session_id": "sess-fresh", "image": _img_b64(),
    })
    assert chunks
    inpaint_calls = [c for c in RecordingToolWorker.calls
                     if c.get("prompt") == "background"]
    assert inpaint_calls and inpaint_calls[-1].get("mask") is None


def test_stream_has_incremental_events(topology):
    """The Plus turn streams prog + status + tool + image events, and text
    arrives over multiple chunks (not one buffered blob)."""
    chunks = _chat({
        "model": "llava-plus-7b", "text": "segment the dog",
        "history": [], "session_id": "sess-events", "image": _img_b64(),
    })
    kinds = [next(iter(c.keys())) for c in chunks]
    assert "prog" in kinds, kinds
    assert "status" in kinds, kinds
    assert "tool" in kinds, kinds
    assert "image" in kinds, kinds        # sam boxes/masks -> annotated image
    tool_ev = [c for c in chunks if "tool" in c][-1]["tool"]
    assert tool_ev["api_name"] == "sam"
    assert "masks_rle" not in tool_ev["response"]  # folded out of the prompt


def test_sketch_mask_appends_input_box(topology):
    """A drawn sketch mask becomes 'Input box: [x0,y0,x1,y1]' in the prompt
    (ref :327-334, normalized 2-dp)."""
    PlusScriptedBackend.prompts.clear()
    mask = np.zeros((80, 100, 4), np.uint8)
    mask[20:40, 25:75] = 255
    buf = BytesIO()
    Image.fromarray(mask, mode="RGBA").save(buf, format="PNG")
    _chat({
        "model": "llava-plus-7b", "text": "segment this",
        "history": [], "session_id": "sess-sketch", "image": _img_b64(),
        "sketch_mask": base64.b64encode(buf.getvalue()).decode(),
    })
    assert any("Input box: [0.25, 0.25, 0.75, 0.5]" in p
               for p in PlusScriptedBackend.prompts), \
        PlusScriptedBackend.prompts[-1][-200:]


def test_reference_image_reaches_seem_session(topology):
    """reference_image/reference_mask land on the server-side session (ref
    :336-342) and flow to a seem call as refimg/refmask."""
    from llava_plus_tpu.serve.orchestrator import ToolSession, prepare_tool_call
    from llava_plus_tpu.serve.web_server import SessionStore

    store = SessionStore()
    sess = store.get("s1")
    sess.reference_image = "REFIMG64"
    sess.reference_mask = "REFMASK64"
    assert store.get("s1") is sess  # persists across turns
    api, params = prepare_tool_call(
        [{"API_name": "seem", "API_params": {}}], None, sess
    )
    assert api == "seem"
    assert params["refimg"] == "REFIMG64"
    assert params["refmask"] == "REFMASK64"


def test_empty_sketch_mask_is_ignored(topology):
    PlusScriptedBackend.prompts.clear()
    mask = np.zeros((80, 100, 4), np.uint8)
    buf = BytesIO()
    Image.fromarray(mask, mode="RGBA").save(buf, format="PNG")
    _chat({
        "model": "llava-plus-7b", "text": "segment this too",
        "history": [], "session_id": "sess-sketch2", "image": _img_b64(),
        "sketch_mask": base64.b64encode(buf.getvalue()).decode(),
    })
    assert not any("Input box" in p for p in PlusScriptedBackend.prompts)
