"""Serving-plane integration tests: real HTTP, echo backend, no model.

Spins up the controller and an echo worker on localhost ports (the reference's
own test seam, SURVEY.md §4.5) and exercises registration, dispatch,
streaming, the controller proxy, and heartbeat expiry.
"""

import asyncio
import json
import threading
import time

import pytest
import requests

from llava_plus_tpu.serve.controller import Controller, build_app as build_controller_app
from llava_plus_tpu.serve.model_worker import (
    EchoBackend,
    ModelWorker,
    build_app as build_worker_app,
)
from llava_plus_tpu.serve.protocol import decode_stream, iter_chunks_requests

def _free_port():
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


CTRL_PORT = _free_port()
WORKER_PORT = _free_port()


class AppThread:
    """Run an aiohttp app on a dedicated event loop thread."""

    def __init__(self, app, port):
        self.app = app
        self.port = port
        self.loop = asyncio.new_event_loop()
        self._started = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()
        assert self._started.wait(10)

    def _run(self):
        from aiohttp import web

        asyncio.set_event_loop(self.loop)
        runner = web.AppRunner(self.app)
        self.loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", self.port)
        self.loop.run_until_complete(site.start())
        self._started.set()
        self.loop.run_forever()

    def stop(self):
        self.loop.call_soon_threadsafe(self.loop.stop)


@pytest.fixture(scope="module")
def topology():
    controller = Controller("shortest_queue", start_expiration_thread=False)
    ctrl_thread = AppThread(build_controller_app(controller), CTRL_PORT)

    worker = ModelWorker(
        f"http://127.0.0.1:{CTRL_PORT}",
        f"http://127.0.0.1:{WORKER_PORT}",
        EchoBackend("echo: ok"),
        ["echo-model"],
        heartbeats=False,
    )
    worker_thread = AppThread(build_worker_app(worker), WORKER_PORT)
    # worker registered on construction (before its HTTP server was up; the
    # controller stored the pushed status so no callback was needed)
    yield controller, worker
    worker.stop()
    controller.stop()
    ctrl_thread.stop()
    worker_thread.stop()


def test_list_models(topology):
    r = requests.post(f"http://127.0.0.1:{CTRL_PORT}/list_models", timeout=5)
    assert r.json()["models"] == ["echo-model"]


def test_get_worker_address(topology):
    r = requests.post(
        f"http://127.0.0.1:{CTRL_PORT}/get_worker_address",
        json={"model": "echo-model"}, timeout=5,
    )
    assert r.json()["address"] == f"http://127.0.0.1:{WORKER_PORT}"
    r = requests.post(
        f"http://127.0.0.1:{CTRL_PORT}/get_worker_address",
        json={"model": "nope"}, timeout=5,
    )
    assert r.json()["address"] == ""


def test_worker_status(topology):
    r = requests.post(
        f"http://127.0.0.1:{WORKER_PORT}/worker_get_status", timeout=5
    )
    s = r.json()
    assert s["model_names"] == ["echo-model"]
    assert s["speed"] == 1


def test_worker_stream_wire_format(topology):
    r = requests.post(
        f"http://127.0.0.1:{WORKER_PORT}/worker_generate_stream",
        json={"prompt": "Hello", "stop": "###"},
        stream=True, timeout=10,
    )
    chunks = list(iter_chunks_requests(r))
    assert chunks, "no chunks received"
    for c in chunks:
        assert c["error_code"] == 0
        assert c["text"].startswith("Hello")
    assert chunks[-1]["text"] == "Hello echo: ok"


def test_controller_proxy_stream(topology):
    r = requests.post(
        f"http://127.0.0.1:{CTRL_PORT}/worker_generate_stream",
        json={"model": "echo-model", "prompt": "Hi", "stop": "###"},
        stream=True, timeout=10,
    )
    chunks = list(iter_chunks_requests(r))
    assert chunks[-1]["text"] == "Hi echo: ok"
    assert chunks[-1]["error_code"] == 0


def test_proxy_unknown_model_error_chunk(topology):
    r = requests.post(
        f"http://127.0.0.1:{CTRL_PORT}/worker_generate_stream",
        json={"model": "missing", "prompt": "x"},
        stream=True, timeout=10,
    )
    chunks = list(iter_chunks_requests(r))
    assert chunks[-1]["error_code"] == 2


def test_heartbeat_updates_and_expiry():
    c = Controller(
        "shortest_queue", heartbeat_expiration=0.2,
        start_expiration_thread=False,
    )
    c.register_worker("http://x", True, {
        "model_names": ["m"], "speed": 1, "queue_length": 0,
    })
    assert c.receive_heart_beat("http://x", 3)
    assert c.worker_info["http://x"].queue_length == 3
    time.sleep(0.25)
    c.remove_stale_workers_by_expiration()
    assert "http://x" not in c.worker_info
    assert not c.receive_heart_beat("http://x", 1)


def test_dispatch_shortest_queue_increments():
    c = Controller("shortest_queue", start_expiration_thread=False)
    for name, q in [("http://a", 5), ("http://b", 1)]:
        c.register_worker(name, False, {
            "model_names": ["m"], "speed": 1, "queue_length": q,
        })
    assert c.get_worker_address("m") == "http://b"
    assert c.worker_info["http://b"].queue_length == 2


def test_dispatch_lottery_weighted():
    import numpy as np

    np.random.seed(0)
    c = Controller("lottery", start_expiration_thread=False)
    c.register_worker("http://a", False, {
        "model_names": ["m"], "speed": 0, "queue_length": 0,
    })
    c.register_worker("http://b", False, {
        "model_names": ["m"], "speed": 10, "queue_length": 0,
    })
    picks = {c.get_worker_address("m") for _ in range(20)}
    assert picks == {"http://b"}
    assert c.get_worker_address("nope") == ""


def test_worker_metrics_endpoint(topology):
    requests.post(
        f"http://127.0.0.1:{WORKER_PORT}/worker_generate_stream",
        json={"prompt": "metrics test"}, stream=True, timeout=10,
    ).content  # drain
    r = requests.post(
        f"http://127.0.0.1:{WORKER_PORT}/worker_metrics", timeout=5
    )
    m = r.json()
    assert m["requests"] >= 1
    assert m["mean_ttft_s"] >= 0.0
