"""Model worker: serves one multimodal model behind the controller.

Wire-compatible rebuild of ``llava/serve/model_worker.py`` on aiohttp.
Internally the reference's Python-thread + HF streamer becomes our jitted
prefill/decode engine (``generate.py``); the HTTP surface — registration,
heartbeats, semaphore-limited /worker_generate_stream with b"\\0"-delimited
cumulative-text chunks — is identical.

A backend abstraction separates protocol from model so the full serving
topology is testable without weights (EchoBackend).
"""

from __future__ import annotations

import argparse
import asyncio
import json
import threading
import time
import uuid
from typing import Iterator, Optional

from llava_plus_tpu.constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_TOKEN,
    WORKER_HEART_BEAT_INTERVAL,
)
from llava_plus_tpu.serve.protocol import encode_chunk
from llava_plus_tpu.utils.logging import (
    build_logger,
    pretty_print_semaphore,
    server_error_msg,
)

GB = 1 << 30

worker_id = str(uuid.uuid4())[:6]
logger = build_logger("model_worker", f"model_worker_{worker_id}.log")


class EchoBackend:
    """Protocol-test backend: streams the prompt + a canned echo."""

    is_multimodal = True
    context_len = 2048

    def __init__(self, reply: str = "echo: ok", delay: float = 0.0):
        self.reply = reply
        self.delay = delay

    def generate_stream(self, params: dict) -> Iterator[str]:
        prompt = params["prompt"]
        text = prompt
        for piece in self.reply.split(" "):
            if self.delay:
                time.sleep(self.delay)
            text += " " + piece
            stop = params.get("stop")
            out = text
            if stop and out.endswith(stop):
                out = out[: -len(stop)]
            yield out


class JaxBackend:
    """Real backend: jitted prefill/decode over a loaded checkpoint.

    ``use_engine=True`` (default) serves through the continuous-batching
    engine so concurrent requests share decode steps; ``quantize="int8"`` /
    ``"int4"`` enables weight-only quantization (the TPU analogue of
    --load-8bit / --load-4bit, ref builder.py:32-41)."""

    def __init__(self, model_path: str, model_base: Optional[str],
                 model_name: Optional[str], *, load_dtype: str = "bfloat16",
                 use_engine: bool = True, max_slots: int = 8,
                 quantize: Optional[str] = None, decode_chunk: int = 4,
                 kv_int8: bool = False, tp: int = 1,
                 paged: bool = False, max_seq_len: Optional[int] = None,
                 pool_tokens: Optional[int] = None,
                 rope_scaling: Optional[str] = None,
                 speculate: int = 0, spec_chunk: int = 4,
                 prefix_cache: bool = True, w8a8: bool = False,
                 stream_interval: int = 1, warmup_len: int = 0):
        from llava_plus_tpu.models.builder import load_pretrained_model

        self.stream_interval = max(int(stream_interval or 1), 1)
        (self.tokenizer, params, self.cfg, self.image_processor,
         self.context_len) = load_pretrained_model(
            model_path, model_base, model_name, dtype=load_dtype
        )
        if rope_scaling:
            # "dynamic:2.0" / "linear:4.0" — serve an unmodified checkpoint
            # past its trained context (pairs with --paged --max-seq-len)
            import dataclasses as _dc

            typ, _, fac = rope_scaling.partition(":")
            # Fail fast with a clear CLI error: an unsupported type or a
            # malformed factor would otherwise only surface as a ValueError
            # inside the first jitted forward, after model load.
            if typ not in ("linear", "dynamic"):
                raise SystemExit(
                    f"--rope-scaling: unsupported type {typ!r} "
                    "(expected 'linear:<factor>' or 'dynamic:<factor>')"
                )
            try:
                factor = float(fac or 2.0)
            except ValueError:
                raise SystemExit(
                    f"--rope-scaling: factor {fac!r} is not a number "
                    "(expected e.g. 'linear:4.0')"
                )
            self.cfg = _dc.replace(self.cfg, text=_dc.replace(
                self.cfg.text, rope_scaling_type=typ,
                rope_scaling_factor=factor,
            ))
        if quantize in ("int8", "int4"):
            from llava_plus_tpu.ops.quant import quantize_llava_params

            params = quantize_llava_params(
                params, self.cfg.language_model_type,
                bits=4 if quantize == "int4" else 8,
                # fused qkv/gateup: 4 matmuls per layer, not 7. Fused int8
                # measures faster than split on chip (418.7 vs 412.4
                # img+tok/s r4; the r5 537.3 headline is the fused path) —
                # production serving gets the same layout bench.py sells.
                fuse=True,
            )
        import jax.numpy as jnp

        from llava_plus_tpu.generate import Generator

        cache_dtype = jnp.int8 if kv_int8 else jnp.bfloat16
        mesh = None
        if tp > 1:
            from llava_plus_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(1, 1, tp)
        self.engine = None
        if use_engine:
            from llava_plus_tpu.serve.engine import BatchedEngine

            if max_seq_len:
                # paged pools make contexts beyond the checkpoint's dense
                # 2048 practical; RoPE extrapolates (quality untested here)
                self.context_len = max_seq_len
            self.engine = BatchedEngine(
                params, self.cfg, self.tokenizer,
                max_slots=max_slots, max_seq_len=self.context_len,
                decode_chunk=decode_chunk, cache_dtype=cache_dtype,
                mesh=mesh, paged=paged, pool_tokens=pool_tokens,
                speculate=speculate, spec_chunk=spec_chunk,
                prefix_cache=prefix_cache, w8a8=w8a8,
            )
        self.generator = None if use_engine else Generator(
            params, self.cfg, self.tokenizer, self.image_processor,
            max_seq_len=self.context_len, cache_dtype=cache_dtype,
            mesh=mesh,
        )
        self.is_multimodal = "llava" in (model_name or model_path).lower()
        if self.engine is not None and warmup_len:
            # compile the full program set BEFORE registering with the
            # controller: the first requests routed here must not pay
            # multi-second XLA compiles (the reference's torch eager path
            # has no compile step to pay, ref llava/serve/model_worker.py)
            self.engine.warmup(
                prompt_len=warmup_len, image=self.is_multimodal
            )

    def generate_stream(self, params: dict) -> Iterator[str]:
        import numpy as np

        from llava_plus_tpu.mm_utils import (
            load_image_from_base64, process_images,
        )

        prompt = params["prompt"]
        ori_prompt = prompt
        images = params.get("images", None)
        num_image_tokens = 0
        image_arrays = None
        if images is not None and len(images) > 0 and self.is_multimodal:
            if len(images) != prompt.count(DEFAULT_IMAGE_TOKEN):
                raise ValueError(
                    "Number of images does not match number of <image> tokens in prompt"
                )
            pil_images = [load_image_from_base64(im) for im in images]
            image_arrays = process_images(
                pil_images, self.image_processor, self.cfg
            )
            replace_token = DEFAULT_IMAGE_TOKEN
            if self.cfg.mm_use_im_start_end:
                replace_token = (
                    DEFAULT_IM_START_TOKEN + replace_token + DEFAULT_IM_END_TOKEN
                )
            prompt = prompt.replace(DEFAULT_IMAGE_TOKEN, replace_token)
            num_image_tokens = (
                prompt.count(replace_token) * self.cfg.num_image_tokens
            )

        temperature = float(params.get("temperature", 1.0))
        top_p = float(params.get("top_p", 1.0))
        max_new_tokens = min(int(params.get("max_new_tokens", 256)), 1024)
        stop_str = params.get("stop", None)
        if temperature <= 0.001:
            temperature = 0.0

        prompt_tokens = len(self.tokenizer(prompt).input_ids)
        max_new_tokens = min(
            max_new_tokens,
            self.context_len - prompt_tokens - num_image_tokens,
        )
        if max_new_tokens < 1:
            yield (
                ori_prompt
                + "Exceeds max token length. Please start a new conversation, thanks."
            )
            return

        if self.engine is not None:
            from llava_plus_tpu.serve.engine import Request

            stream = self.engine.stream(Request(
                prompt=prompt, images=image_arrays,
                max_new_tokens=max_new_tokens, temperature=temperature,
                top_p=top_p, stop_strings=[stop_str] if stop_str else [],
            ))
        else:
            stream = self.generator.stream(
                prompt, images=image_arrays,
                max_new_tokens=max_new_tokens, temperature=temperature,
                top_p=top_p, stop_strings=[stop_str] if stop_str else [],
            )
        # --stream-interval N: push every Nth cumulative update plus the
        # final one (ref model_worker.py streams every N tokens)
        every = max(int(getattr(self, "stream_interval", 1) or 1), 1)
        n, last = 0, None
        for text in stream:
            n += 1
            if n % every == 0:
                yield ori_prompt + text
                last = None
            else:
                last = text
        if last is not None:
            yield ori_prompt + last


def heart_beat_worker(worker: "ModelWorker"):
    while not worker._stop.wait(WORKER_HEART_BEAT_INTERVAL):
        worker.send_heart_beat()


class ModelWorker:
    def __init__(
        self,
        controller_addr: str,
        worker_addr: str,
        backend,
        model_names,
        *,
        limit_model_concurrency: int = 5,
        no_register: bool = False,
        heartbeats: bool = True,
    ):
        self.controller_addr = controller_addr
        self.worker_addr = worker_addr
        self.worker_id = worker_id
        self.backend = backend
        self.model_names = list(model_names)
        self.limit_model_concurrency = limit_model_concurrency
        self.semaphore: Optional[asyncio.Semaphore] = None
        self.global_counter = 0
        self.metrics: dict = {}
        self._stop = threading.Event()
        self.no_register = no_register
        if not no_register:
            self.register_to_controller()
            if heartbeats:
                t = threading.Thread(
                    target=heart_beat_worker, args=(self,), daemon=True
                )
                t.start()

    # -- control plane ------------------------------------------------------

    def register_to_controller(self):
        import requests

        logger.info("Register to controller")
        url = self.controller_addr + "/register_worker"
        data = {
            "worker_name": self.worker_addr,
            "check_heart_beat": True,
            "worker_status": self.get_status(),
        }
        r = requests.post(url, json=data)
        assert r.status_code == 200

    def send_heart_beat(self):
        import requests

        logger.info(
            f"Send heart beat. Models: {self.model_names}. "
            f"Semaphore: {pretty_print_semaphore(self.semaphore)}. "
            f"global_counter: {self.global_counter}"
        )
        url = self.controller_addr + "/receive_heart_beat"
        while True:
            try:
                ret = requests.post(url, json={
                    "worker_name": self.worker_addr,
                    "queue_length": self.get_queue_length(),
                }, timeout=5)
                exist = ret.json()["exist"]
                break
            except Exception as e:
                logger.error(f"heart beat error: {e}")
            time.sleep(5)
        if not exist:
            self.register_to_controller()

    def get_queue_length(self) -> int:
        if (
            self.semaphore is None
            or self.semaphore._value is None
            or self.semaphore._waiters is None
        ):
            return 0
        return (
            self.limit_model_concurrency
            - self.semaphore._value
            + len(self.semaphore._waiters)
        )

    def get_status(self) -> dict:
        return {
            "model_names": self.model_names,
            "speed": 1,
            "queue_length": self.get_queue_length(),
        }

    def stop(self):
        self._stop.set()

    # -- observability ------------------------------------------------------
    # (the reference has none beyond heartbeat logs — SURVEY.md §5)

    def get_metrics(self) -> dict:
        m = dict(self.metrics)
        n = max(m.pop("_requests", 0), 1)
        m["requests"] = self.metrics.get("_requests", 0)
        m["mean_ttft_s"] = m.pop("_ttft_sum", 0.0) / n
        total_decode = m.pop("_decode_time_sum", 0.0)
        m["decode_tok_s"] = (
            m.get("_tokens_sum", 0) / total_decode if total_decode else 0.0
        )
        m["total_tokens"] = m.pop("_tokens_sum", 0)
        engine = getattr(self.backend, "engine", None)
        if engine is not None:
            m["engine_active_slots"] = engine.num_active
            m["engine_max_slots"] = engine.max_slots
            m["engine_prefill_dispatches"] = engine.prefill_dispatches
            m["engine_prefill_requests"] = engine.prefill_requests
            if engine._prefix is not None:
                m["engine_prefix_entries"] = len(engine._prefix)
                m["engine_prefix_lookups"] = engine._prefix.lookups
                m["engine_prefix_hits"] = engine._prefix.hit_requests
                m["engine_prefix_hit_tokens"] = engine.prefix_hit_tokens
        return m

    # -- data plane ---------------------------------------------------------

    def generate_stream_gate(self, params: dict) -> Iterator[bytes]:
        """Error-gated stream: text chunks -> wire chunks
        (ref model_worker.py:194-218), with TTFT/decode-rate accounting."""
        t0 = time.perf_counter()
        first_t = None
        n_chunks = 0
        try:
            for text in self.backend.generate_stream(params):
                if first_t is None:
                    first_t = time.perf_counter()
                n_chunks += 1
                yield encode_chunk({"text": text, "error_code": 0})
        except ValueError as e:
            logger.error(f"Caught ValueError: {e}")
            yield encode_chunk({
                "text": f"{server_error_msg}\n\n({e})", "error_code": 1,
            })
        except Exception as e:
            logger.error(f"Caught Unknown Error: {e}")
            yield encode_chunk({
                "text": f"{server_error_msg}\n\n({e})", "error_code": 1,
            })
        finally:
            end = time.perf_counter()
            self.metrics["_requests"] = self.metrics.get("_requests", 0) + 1
            if first_t is not None:
                self.metrics["_ttft_sum"] = (
                    self.metrics.get("_ttft_sum", 0.0) + (first_t - t0)
                )
                self.metrics["_decode_time_sum"] = (
                    self.metrics.get("_decode_time_sum", 0.0) + (end - first_t)
                )
                self.metrics["_tokens_sum"] = (
                    self.metrics.get("_tokens_sum", 0) + n_chunks
                )


# ---------------------------------------------------------------------------
# HTTP app (aiohttp)
# ---------------------------------------------------------------------------

def build_app(worker: ModelWorker):
    from aiohttp import web

    routes = web.RouteTableDef()

    @routes.post("/worker_generate_stream")
    async def worker_generate_stream(request):
        params = await request.json()
        worker.global_counter += 1
        if worker.semaphore is None:
            worker.semaphore = asyncio.Semaphore(worker.limit_model_concurrency)
        await worker.semaphore.acquire()
        if not worker.no_register:
            # per-request queue-length heartbeat (ref model_worker.py:239);
            # skipped standalone — the reference retries a nonexistent
            # controller forever here, wedging the response (ref bug)
            worker.send_heart_beat()
        resp = web.StreamResponse()
        await resp.prepare(request)
        loop = asyncio.get_event_loop()
        try:
            gen = worker.generate_stream_gate(params)
            while True:
                chunk = await loop.run_in_executor(None, next, gen, None)
                if chunk is None:
                    break
                await resp.write(chunk)
        finally:
            worker.semaphore.release()
            if not worker.no_register:
                worker.send_heart_beat()
        await resp.write_eof()
        return resp

    @routes.post("/worker_get_status")
    async def worker_get_status(request):
        return web.json_response(worker.get_status())

    @routes.post("/worker_metrics")
    async def worker_metrics(request):
        return web.json_response(worker.get_metrics())

    @routes.post("/worker_profile_start")
    async def worker_profile_start(request):
        """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
        data = await request.json()
        log_dir = data.get("log_dir", "/tmp/llava_tpu_profile")
        import jax

        jax.profiler.start_trace(log_dir)
        return web.json_response({"log_dir": log_dir})

    @routes.post("/worker_profile_stop")
    async def worker_profile_stop(request):
        import jax

        jax.profiler.stop_trace()
        return web.json_response({})

    app = web.Application(client_max_size=64 * 1024 * 1024)
    app.add_routes(routes)
    return app


def main():
    from aiohttp import web

    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="localhost")
    parser.add_argument("--port", type=int, default=21002)
    parser.add_argument("--worker-address", type=str,
                        default="http://localhost:21002")
    parser.add_argument("--controller-address", type=str,
                        default="http://localhost:21001")
    parser.add_argument("--model-path", type=str, default=None)
    parser.add_argument("--model-base", type=str, default=None)
    parser.add_argument("--model-name", type=str, default=None)
    parser.add_argument("--limit-model-concurrency", type=int, default=5)
    parser.add_argument("--no-register", action="store_true")
    parser.add_argument("--echo", action="store_true",
                        help="protocol-test echo backend (no model)")
    parser.add_argument("--load-8bit", action="store_true",
                        help="weight-only int8 serving (TPU analogue of bnb)")
    parser.add_argument("--load-4bit", action="store_true",
                        help="weight-only blockwise int4 serving")
    parser.add_argument("--decode-chunk", type=int, default=4,
                        help="decode steps per device program (latency "
                             "between stream flushes vs dispatch overhead)")
    parser.add_argument("--kv-int8", action="store_true",
                        help="int8 KV cache (per-token/head scales): halves "
                             "cache bandwidth and doubles slot capacity")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel serving over N local chips "
                             "(params + kv heads shard; GSPMD collectives)")
    parser.add_argument("--max-slots", type=int, default=8,
                        help="continuous-batching slot count")
    parser.add_argument("--no-engine", action="store_true",
                        help="disable continuous batching (single-stream)")
    parser.add_argument("--paged", action="store_true",
                        help="paged KV pool: per-request page allocation; "
                             "enables long contexts + denser slot packing")
    parser.add_argument("--no-prefix-cache", action="store_true",
                        help="disable cross-request KV prefix reuse over "
                             "the paged pool (on by default with --paged: "
                             "multi-turn follow-ups skip recomputing — and "
                             "re-vision-encoding — the shared history)")
    parser.add_argument("--max-seq-len", type=int, default=None,
                        help="override context length (paged pools make "
                             ">2048 practical)")
    parser.add_argument("--pool-tokens", type=int, default=None,
                        help="KV pool size in tokens (default "
                             "max_slots*max_seq_len)")
    parser.add_argument("--rope-scaling", type=str, default=None,
                        help="override rope scaling, e.g. dynamic:2.0 or "
                             "linear:4.0 (serve past the trained context)")
    parser.add_argument("--speculate", type=int, default=0,
                        help="prompt-lookup speculative decoding: propose N "
                             "tokens per step (greedy streams; exact)")
    parser.add_argument("--w8a8", action="store_true",
                        help="dynamic int8 activations for the prefill "
                             "matmuls (2x MXU int8 path; decode keeps "
                             "weight-only int8). Near-lossless on most "
                             "checkpoints but activation-outlier "
                             "sensitive: eval before production use")
    parser.add_argument("--spec-chunk", type=int, default=4,
                        help="verify steps fused per dispatch (one host "
                             "round-trip each; >1 amortizes the dispatch "
                             "tax like --decode-chunk does for plain "
                             "decode)")
    parser.add_argument("--warmup", type=int, default=768, metavar="LEN",
                        help="compile the engine's full program set at "
                             "startup for prompts of ~LEN fused tokens "
                             "(576 image + text), before registering with "
                             "the controller; 0 disables (first requests "
                             "then pay the XLA compiles)")
    parser.add_argument("--stream-interval", type=int, default=1,
                        help="push every Nth streamed update (ref flag)")
    parser.add_argument("--device", type=str, default=None,
                        help="accepted for reference-CLI compatibility; "
                             "placement is JAX's (the TPU chip)")
    parser.add_argument("--multi-modal", action="store_true",
                        help="accepted for reference-CLI compatibility; "
                             "multimodality is inferred from the model "
                             "(as in the reference)")
    args = parser.parse_args()
    logger.info(f"args: {args}")

    if args.echo or args.model_path is None:
        backend = EchoBackend()
        model_names = [args.model_name or "echo"]
    else:
        from llava_plus_tpu.mm_utils import get_model_name_from_path

        name = args.model_name or get_model_name_from_path(args.model_path)
        if args.load_4bit and "13b" not in (name or "").lower():
            # Measured fence (BENCH r3 / README perf table): on models
            # whose int8 weights fit the chip (7B: 6.6 GB), int8 decodes
            # faster end-to-end (70 vs 63 img+tok/s at batch 1) — int4's
            # role is capacity (13B on a 16 GB chip), not speed.
            logger.warning(
                "--load-4bit on %s: int8 (--load-8bit) measures faster "
                "end-to-end on models that fit int8 (7B: 70 vs 63 "
                "img+tok/s at batch 1); int4 is the capacity knob for "
                "13B-class models.", name,
            )
        backend = JaxBackend(
            args.model_path, args.model_base, name,
            use_engine=not args.no_engine, max_slots=args.max_slots,
            quantize=("int4" if args.load_4bit else
                      "int8" if args.load_8bit else None),
            decode_chunk=args.decode_chunk, kv_int8=args.kv_int8,
            tp=args.tp, paged=args.paged, max_seq_len=args.max_seq_len,
            pool_tokens=args.pool_tokens, rope_scaling=args.rope_scaling,
            speculate=args.speculate, spec_chunk=args.spec_chunk,
            prefix_cache=not args.no_prefix_cache, w8a8=args.w8a8,
            stream_interval=args.stream_interval,
            warmup_len=args.warmup,
        )
        model_names = [name]

    worker = ModelWorker(
        args.controller_address, args.worker_address, backend, model_names,
        limit_model_concurrency=args.limit_model_concurrency,
        no_register=args.no_register,
    )
    web.run_app(build_app(worker), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
