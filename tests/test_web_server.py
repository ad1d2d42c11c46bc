"""Web UI/API tests over the echo topology."""

import json

import pytest
import requests

from llava_plus_tpu.serve.controller import Controller, build_app as build_controller_app
from llava_plus_tpu.serve.model_worker import (
    EchoBackend, ModelWorker, build_app as build_worker_app,
)
from llava_plus_tpu.serve.protocol import iter_chunks_requests
from llava_plus_tpu.serve.web_server import build_app as build_web_app

from .test_serving import AppThread

CTRL, WORKER, WEB = 21921, 21922, 21923


@pytest.fixture(scope="module")
def topology():
    controller = Controller("shortest_queue", start_expiration_thread=False)
    t1 = AppThread(build_controller_app(controller), CTRL)
    worker = ModelWorker(
        f"http://127.0.0.1:{CTRL}", f"http://127.0.0.1:{WORKER}",
        EchoBackend("web reply"), ["web-model"], heartbeats=False,
    )
    t2 = AppThread(build_worker_app(worker), WORKER)
    t3 = AppThread(build_web_app(f"http://127.0.0.1:{CTRL}"), WEB)
    yield
    for t in (t1, t2, t3):
        t.stop()


def test_index_serves_html(topology):
    r = requests.get(f"http://127.0.0.1:{WEB}/", timeout=5)
    assert r.status_code == 200
    assert "LLaVA-Plus" in r.text


def test_regenerate_ui_present(topology):
    """Regenerate button + handler shipped in the page (the pop-last-
    assistant-turn + re-stream flow itself is client-side JS; the server
    round it drives is test_chat_stream's /api/chat). Ref
    gradio_web_server.py:113-120, :355, :384."""
    r = requests.get(f"http://127.0.0.1:{WEB}/", timeout=5)
    assert 'id="regen"' in r.text
    assert "regen.onclick" in r.text
    assert "history.pop()" in r.text


def test_models_endpoint(topology):
    r = requests.post(f"http://127.0.0.1:{WEB}/api/models", timeout=5)
    assert r.json()["models"] == ["web-model"]


def test_chat_stream(topology):
    r = requests.post(
        f"http://127.0.0.1:{WEB}/api/chat",
        json={"model": "web-model", "text": "hi there", "history": []},
        stream=True, timeout=20,
    )
    chunks = list(iter_chunks_requests(r))
    assert chunks
    assert chunks[-1]["text"].endswith("web reply")


def test_vote_logged(topology, tmp_path):
    r = requests.post(
        f"http://127.0.0.1:{WEB}/api/vote",
        json={"type": "upvote", "model": "web-model"}, timeout=5,
    )
    assert r.status_code == 200


def test_examples_endpoint():
    """/api/examples returns two (image, prompt) demo pairs (reference
    gr.Examples parity, gradio_web_server.py:333-336)."""
    import base64

    from llava_plus_tpu.serve.web_server import _example_prompts

    ex = _example_prompts()
    assert len(ex) == 2
    for e in ex:
        assert e["text"]
        raw = base64.b64decode(e["image"])
        assert raw[:8] == b"\x89PNG\r\n\x1a\n"
