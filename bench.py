"""Serving benchmark: images+tokens/sec/chip for LLaVA-1.5-7B-shaped serving.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the full serving data path on the local chip: CLIP ViT-L/14-336
encode of one image + projector + fused prefill (576 image tokens + text
prompt), then greedy KV-cache decode. Weights are random (no network egress)
— identical FLOP/byte profile to the real checkpoint.

vs_baseline: the reference publishes no speed numbers (BASELINE.json
published={}); the denominator is an ENGINEERING ESTIMATE of ~40
images+tokens/s/chip for HF LLaVA-1.5-7B fp16 serving on A100 (decode is
HBM-bound: ~14 GB fp16 weights / ~2 TB/s ~= 140 tok/s theoretical ceiling
per stream, HF transformers' serial generate() with thread-level concurrency
lands well below it; no measured/published number exists and this
environment has no GPU or network egress to produce one). vs_baseline >= 2.0
nominally meets the >=2x A100 north star, with that caveat. The output
labels it: detail.baseline = "estimate".
"""

import json
import sys
import time

import numpy as np

A100_BASELINE_IPS = 40.0

PREFILL_LEN = 768          # 576 image tokens + 192 text tokens (128-aligned)
MAX_NEW_TOKENS = 128
CACHE_LEN = 1024


def build(model_name: str):
    import jax
    import jax.numpy as jnp

    from llava_plus_tpu.models import llava as llava_model
    from llava_plus_tpu.models.configs import (
        LLAVA_15_7B, LlavaConfig, tiny_llava_config,
    )

    if model_name.startswith("llava-1.5-13b"):
        from llava_plus_tpu.models.configs import LLAVA_15_13B

        cfg = LLAVA_15_13B
    elif model_name.startswith("llava-1.5-7b") and model_name != "llava-1.5-7b-lite":
        cfg = LLAVA_15_7B
    elif model_name == "llava-1.5-7b-lite":
        import dataclasses

        from llava_plus_tpu.models.configs import LLAMA_7B

        cfg = LlavaConfig(
            text=dataclasses.replace(LLAMA_7B, num_hidden_layers=16)
        )
    else:
        cfg = tiny_llava_config()

    if (model_name.startswith("llava-1.5-13b")
            and model_name.endswith(("-int8", "-int4"))):
        # 13B bf16 init is ~26 GB — OOMs the chip before quantization.
        # Generate already-quantized random leaves host-side (identical
        # FLOP/byte profile; values are irrelevant to throughput).
        bits = 4 if model_name.endswith("-int4") else 8
        return cfg, _prequantized_params(cfg, bits)
    params = llava_model.init_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16
    )
    if model_name.endswith(("-int8", "-int4", "-int8f")):
        from llava_plus_tpu.ops.quant import quantize_llava_params

        bits = 4 if model_name.endswith("-int4") else 8
        # "-int8f" fuses qkv/gate|up for int8 too (experiment: int4 wins
        # from fusing; int8's XLA dots may or may not — measure, not guess)
        fuse = bits == 4 or model_name.endswith("-int8f")
        params = quantize_llava_params(params, bits=bits, fuse=fuse)
    return cfg, params


def _prequantized_params(cfg, bits: int):
    """Random llava params with LM matrices already int8/int4 on the host:
    peak device memory is the final quantized size, never the bf16 model."""
    import ml_dtypes
    import jax
    import jax.numpy as jnp

    from llava_plus_tpu.models import llava as llava_model
    from llava_plus_tpu.ops import quant

    rng = np.random.default_rng(0)
    shapes = jax.eval_shape(
        lambda k: llava_model.init_params(cfg, k, jnp.bfloat16),
        jax.random.PRNGKey(0),
    )
    if bits == 4:
        # mirror quant.fuse_llama_matrices (wqkv / w_gateup shapes)
        attn = shapes["language_model"]["layers"]["attn"]
        wq, wk, wv = attn.pop("wq"), attn.pop("wk"), attn.pop("wv")
        attn["wqkv"] = jax.ShapeDtypeStruct(
            wq.shape[:-1] + (wq.shape[-1] + wk.shape[-1] + wv.shape[-1],),
            wq.dtype,
        )
        mlp = shapes["language_model"]["layers"]["mlp"]
        wg, wu = mlp.pop("w_gate"), mlp.pop("w_up")
        mlp["w_gateup"] = jax.ShapeDtypeStruct(
            wg.shape[:-1] + (wg.shape[-1] + wu.shape[-1],), wg.dtype,
        )

    def host_leaf(sds):
        a = (rng.standard_normal(sds.shape, np.float32) * 0.02)
        return jax.device_put(a.astype(ml_dtypes.bfloat16))

    def quantize_host(sds):
        *lead, K, N = sds.shape
        if bits == 8:
            q = rng.integers(-127, 128, size=sds.shape, dtype=np.int8)
            s = np.full((*lead, 1, N), 0.02 / 127.0, np.float32)
            return {quant.QKEY: jax.device_put(q),
                    quant.SKEY: jax.device_put(s)}
        q = rng.integers(-128, 128, size=(*lead, K // 2, N), dtype=np.int16)
        q = q.astype(np.int8)
        s = np.full((*lead, K // quant.INT4_BLOCK, N), 0.02 / 7.0, np.float32)
        return {quant.Q4KEY: jax.device_put(q),
                quant.SKEY: jax.device_put(s)}

    qpaths = {tuple(p) for p in
              (quant.LLAMA_FUSED_QUANT_PATHS if bits == 4
               else quant.LLAMA_QUANT_PATHS)}

    def build(tree, path):
        if isinstance(tree, dict):
            return {k: build(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(build(v, path + (i,))
                              for i, v in enumerate(tree))
        if path[0] == "language_model" and path[1:] in qpaths:
            return quantize_host(tree)
        return host_leaf(tree)

    return build(shapes, ())


def _bench_prompt(cfg):
    n_text = max(PREFILL_LEN - cfg.num_image_tokens - 8, 8)
    return "<image>\n" + " ".join(f"word{i}" for i in range(n_text))


def measure_engine_metrics(cfg, params, kv_int8: bool, *, slots=16,
                           n_background=8, n_probes=16, n_arrivals=16):
    """Latency metrics on ONE engine at the HEADLINE serving config
    (``slots`` continuous-batching slots, engine-default prefill_batch /
    decode_chunk — the same machine the throughput number sells):

    - cold_first_request_s: engine construction -> first streamed token,
      nothing warmed (the XLA-compile cost a fresh worker's very first
      request pays; warmup() makes this a one-time construction cost).
    - warmup_s: engine.warmup() wall time (full program set).
    - burst16 p50/p95: TTFT for ``n_arrivals`` SIMULTANEOUS arrivals at
      the idle WARM engine — batched prefill admission bounds how long
      late arrivals wait behind earlier prefills.
    - loaded p50: TTFT for a probe admitted while ``n_background`` slots
      are decoding (the honest at-occupancy north-star number: prefill
      incl. vision encode overlaps a busy engine).
    """
    import statistics

    import jax.numpy as jnp

    from llava_plus_tpu.data.debug_tokenizer import DebugTokenizer
    from llava_plus_tpu.serve.engine import BatchedEngine, Request

    rng = np.random.default_rng(0)
    img_size = cfg.vision.image_size
    prompt = _bench_prompt(cfg)

    def image():
        return rng.normal(size=(1, img_size, img_size, 3)).astype(np.float32)

    out = {}
    tok = DebugTokenizer(vocab_size=cfg.text.vocab_size)
    t0 = time.perf_counter()
    eng = BatchedEngine(
        params, cfg, tok,
        max_slots=slots, max_seq_len=CACHE_LEN,
        prefill_bucket=256,
        cache_dtype=jnp.int8 if kv_int8 else jnp.bfloat16,
    )
    try:
        cold = Request(prompt=prompt, images=image(), max_new_tokens=4)
        eng.submit(cold)
        assert cold._chunks.get(timeout=900) is not None
        out["cold_first_request_s"] = round(time.perf_counter() - t0, 4)
        while cold._chunks.get(timeout=900) is not None:
            pass

        out["warmup_s"] = round(eng.warmup(prompt_len=PREFILL_LEN), 4)

        # ---- burst: simultaneous arrivals at the idle warm engine ----
        reqs = [Request(prompt=prompt, images=image(), max_new_tokens=4)
                for _ in range(n_arrivals)]
        for r in reqs:
            eng.submit(r)
        for r in reqs:
            while r._chunks.get(timeout=600) is not None:
                pass
        ttfts = sorted(r.ttft for r in reqs if r.ttft is not None)
        if ttfts:
            out["burst16_ttft_p50_s"] = round(ttfts[len(ttfts) // 2], 4)
            out["burst16_ttft_p95_s"] = round(
                ttfts[min(int(len(ttfts) * 0.95), len(ttfts) - 1)], 4
            )

        # ---- loaded: probes against n_background decoding slots ----
        # (a probe needs a slot to drain into: with few slots, leave one)
        n_background = min(n_background, max(slots - 1, 1))
        for _ in range(n_background):
            eng.submit(Request(
                prompt=prompt, images=image(), max_new_tokens=200,
                temperature=1.0, top_p=0.95,
            ))
        deadline = time.time() + 600
        while eng.num_active < n_background and time.time() < deadline:
            time.sleep(0.05)
        probes = []
        for i in range(n_probes):
            probe = Request(prompt=prompt, images=image(), max_new_tokens=4)
            eng.submit(probe)
            # first streamed chunk == first token emitted at prefill
            first = probe._chunks.get(timeout=120)
            assert first is not None
            probes.append(probe.ttft)
            while probe._chunks.get(timeout=120) is not None:
                pass
            time.sleep(0.2)  # let the pool settle back to steady decode
        out["loaded_ttft_p50_s"] = round(statistics.median(probes), 4)
    finally:
        eng.stop()
    return out


def run_paged_engine(model_name: str, slots: int, kv_int8: bool = True):
    """End-to-end ENGINE throughput over the paged KV pool: ``slots``
    concurrent streams (prefill 768 incl. vision encode + 128 new tokens
    each) through the warmed continuous-batching engine. The paged pool
    decouples occupancy from the dense cache's max_slots*max_seq_len HBM
    bill (dense b24 spills ~15 GB and regresses; the pool allocates only
    prompt+budget pages per stream), so occupancy can exceed 16."""
    import jax.numpy as jnp

    from llava_plus_tpu.data.debug_tokenizer import DebugTokenizer
    from llava_plus_tpu.serve.engine import BatchedEngine, Request

    cfg, params = build(model_name)
    rng = np.random.default_rng(0)
    img_size = cfg.vision.image_size
    prompt = _bench_prompt(cfg)

    def image():
        return rng.normal(size=(1, img_size, img_size, 3)).astype(np.float32)

    tok = DebugTokenizer(vocab_size=cfg.text.vocab_size)
    page_size = 128
    per_req_pages = -(-(PREFILL_LEN + MAX_NEW_TOKENS + 1) // page_size)
    eng = BatchedEngine(
        params, cfg, tok,
        max_slots=slots, max_seq_len=CACHE_LEN, prefill_bucket=256,
        cache_dtype=jnp.int8 if kv_int8 else jnp.bfloat16,
        paged=True, page_size=page_size,
        pool_tokens=slots * per_req_pages * page_size,
        prefix_cache=False,  # distinct images per request; pure occupancy
        # at 24+ slots the pool (~6.6 GB) + int8 weights (~7 GB) leave
        # <2 GB for prefill transients; half-size admission batches keep
        # the pipelined prefill-ahead (up to 4 bucket caches) inside it.
        # Throughput is decode-dominated; the slower ramp is noise.
        prefill_batch=2 if slots >= 24 else 4,
    )
    try:
        warmup_s = eng.warmup(prompt_len=PREFILL_LEN)
        reqs = [Request(prompt=prompt, images=image(),
                        max_new_tokens=MAX_NEW_TOKENS)
                for _ in range(slots)]
        t0 = time.perf_counter()
        for r in reqs:
            eng.submit(r)
        counts = []
        for r in reqs:
            n = 0
            while r._chunks.get(timeout=900) is not None:
                n += 1
            counts.append(n)
        wall = time.perf_counter() - t0
    finally:
        eng.stop()
    total = sum(counts) + len(counts)  # +1 image per stream
    return {
        "metric": "serving_images_plus_tokens_per_sec_per_chip",
        "value": round(total / wall, 3),
        "unit": "img+tok/s/chip",
        "vs_baseline": round(total / wall / A100_BASELINE_IPS, 3),
        "detail": {
            "model": model_name, "baseline": "estimate", "mode": "paged",
            "slots": slots, "kv_cache": "int8" if kv_int8 else "bf16",
            "warmup_s": round(warmup_s, 2), "wall_s": round(wall, 2),
            "tokens": total, "prefill_len": PREFILL_LEN,
            "new_tokens": MAX_NEW_TOKENS,
        },
    }


def run(model_name: str, batch_size: int = 1, kv_int8: bool = False,
        loaded_ttft: bool = False, raw_paged: bool = False,
        w8a8: bool = False):
    import jax
    import jax.numpy as jnp

    if w8a8:
        # int8 activations for the FLOP-bound prefill matmuls (2x MXU
        # int8 path); decode matvecs keep weight-only int8 (row gate in
        # ops/quant.matmul). Trace-time: set before the jits below.
        from llava_plus_tpu.ops import quant

        quant.set_w8a8(True)

    from llava_plus_tpu.constants import IMAGE_TOKEN_INDEX
    from llava_plus_tpu.data.multimodal import pad_images, plan_multimodal_batch
    from llava_plus_tpu.models import llama, llava as llava_model
    from llava_plus_tpu.models.llava import MultimodalBatch

    cfg, params = build(model_name)
    n_patch = cfg.num_image_tokens
    img_size = cfg.vision.image_size

    B = batch_size
    rng = np.random.default_rng(0)
    n_text = max(PREFILL_LEN - n_patch, 8)
    ids_list = [
        np.concatenate(
            [[1], [IMAGE_TOKEN_INDEX], rng.integers(3, 30000, size=n_text - 1)]
        )
        for _ in range(B)
    ]
    plan = plan_multimodal_batch(
        ids_list, num_patches=n_patch, max_len=CACHE_LEN, pad_to=PREFILL_LEN,
    )
    imgs = pad_images(
        [rng.normal(size=(1, img_size, img_size, 3)).astype(np.float32)
         for _ in range(B)],
        1, (img_size, img_size, 3),
    )
    batch = MultimodalBatch(
        tokens=jnp.asarray(plan.tokens),
        positions=jnp.asarray(plan.positions),
        segment_ids=jnp.asarray(plan.segment_ids),
        images=jnp.asarray(imgs),
        image_pos=jnp.asarray(plan.image_pos),
    )
    prompt_len = int(plan.lengths[0])

    import functools

    @functools.partial(jax.jit, donate_argnums=(1,))
    def prefill(params, cache, batch):
        last = jnp.sum(batch.segment_ids, axis=1) - 1
        logits, cache = llava_model.forward(
            params, cfg, batch, cache=cache, fresh_prefill=True,
            logits_positions=last,
        )
        return jnp.argmax(logits[:, 0], axis=-1)[:, None], cache

    @functools.partial(jax.jit, donate_argnums=(1,))
    def decode(params, cache, token, pos):
        seg = jnp.ones_like(token, jnp.int32)
        logits, cache = llava_model.decode_step(
            params, cfg, token, pos, seg, cache
        )
        return jnp.argmax(logits[:, 0], axis=-1)[:, None], cache

    @functools.partial(
        jax.jit, static_argnames=("n_steps",), donate_argnums=(1,)
    )
    def decode_n(params, cache, token, pos, *, n_steps):
        """Greedy decode of n_steps tokens as ONE device program: on a
        tunneled TPU, per-token dispatch costs a host round-trip comparable
        to the step itself; lax.scan amortizes it away (same path as
        Generator._decode_n)."""
        def body(carry, _):
            token, pos, cache = carry
            seg = jnp.ones_like(token, jnp.int32)
            logits, cache = llava_model.decode_step(
                params, cfg, token, pos, seg, cache
            )
            nxt = jnp.argmax(logits[:, 0], axis=-1)[:, None]
            return (nxt, pos + 1, cache), nxt[:, 0]

        (token, pos, cache), toks = jax.lax.scan(
            body, (token, pos, cache), None, length=n_steps
        )
        return toks, token, cache

    def make_cache():
        if raw_paged:
            # Static-batch serving over the PAGED pool: identity page
            # tables (slot b owns pages [b*pps, (b+1)*pps)) make the pool
            # an exact drop-in for the dense cache at the same HBM bill,
            # but decode attention runs the manual-DMA Pallas paged
            # kernel (int8-native, all heads per block, only VALID pages
            # read) instead of the XLA batched-matvec einsum.
            import dataclasses

            page_size = 128
            pps = CACHE_LEN // page_size
            c = llama.PagedKVCache.create(
                cfg.text, B, num_pages=B * pps, max_pages_per_slot=pps,
                page_size=page_size,
                dtype=jnp.int8 if kv_int8 else jnp.bfloat16,
            )
            pt = np.arange(B * pps, dtype=np.int32).reshape(B, pps)
            return dataclasses.replace(c, page_table=jnp.asarray(pt))
        return llama.KVCache.create(
            cfg.text, B, CACHE_LEN, jnp.int8 if kv_int8 else jnp.bfloat16
        )

    def sync(x):
        # axon (tunneled TPU) does not block in block_until_ready; a value
        # fetch is the only reliable barrier.
        return np.asarray(jax.device_get(x))

    # Warmup / compile
    cache = make_cache()
    tok, cache = prefill(params, cache, batch)
    _, tok, cache = decode_n(
        params, cache, tok, jnp.full((B, 1), prompt_len, jnp.int32),
        n_steps=MAX_NEW_TOKENS,
    )
    sync(tok)

    del cache, tok  # free warmup buffers before the timed run

    # Timed: TTFT (prefill incl. vision encode)
    t0 = time.perf_counter()
    cache2 = make_cache()
    tok, cache2 = prefill(params, cache2, batch)
    sync(tok)
    ttft = time.perf_counter() - t0

    # Timed: decode loop (one on-device program for all MAX_NEW_TOKENS)
    t0 = time.perf_counter()
    toks, tok, cache2 = decode_n(
        params, cache2, tok, jnp.full((B, 1), prompt_len, jnp.int32),
        n_steps=MAX_NEW_TOKENS,
    )
    sync(toks)
    decode_time = time.perf_counter() - t0

    total_time = ttft + decode_time
    images_plus_tokens = B * (1 + MAX_NEW_TOKENS)
    ips = images_plus_tokens / total_time

    engine_metrics = {}
    if loaded_ttft:
        del cache2, tok, toks  # free the throughput run before the engine
        try:
            # latency metrics at the HEADLINE config: same slot count as
            # the throughput batch (VERDICT r3 item 1/6 — the storm must
            # measure the machine being sold, after its warmup)
            engine_metrics = measure_engine_metrics(
                cfg, params, kv_int8, slots=B,
            )
        except Exception as e:  # measurement is additive; never fail the bench
            print(f"engine-metrics measurement failed: {e}", file=sys.stderr)

    return {
        "metric": "serving_images_plus_tokens_per_sec_per_chip",
        "value": round(ips, 3),
        "unit": "img+tok/s/chip",
        "vs_baseline": round(ips / A100_BASELINE_IPS, 3),
        "detail": {
            "model": model_name,
            "baseline": "estimate",  # no published A100 serving number
            "batch": B,
            "cache": "paged" if raw_paged else "dense",
            "kv_cache": "int8" if kv_int8 else "bf16",
            "w8a8_prefill": bool(w8a8),
            "ttft_s": round(ttft, 4),
            "loaded_ttft_p50_s": engine_metrics.get("loaded_ttft_p50_s"),
            "burst16_ttft_p50_s": engine_metrics.get("burst16_ttft_p50_s"),
            "burst16_ttft_p95_s": engine_metrics.get("burst16_ttft_p95_s"),
            "cold_first_request_s": engine_metrics.get(
                "cold_first_request_s"),
            "warmup_s": engine_metrics.get("warmup_s"),
            "decode_tok_s": round(MAX_NEW_TOKENS / decode_time, 2),
            "prefill_len": PREFILL_LEN,
            "new_tokens": MAX_NEW_TOKENS,
        },
    }


# bench.py must finish — and print the headline — inside the driver's
# budget (round 4 was killed at rc 124 with NO headline on record because
# tpu_checks ran first). Self-imposed wall-clock ceiling; every phase below
# checks the remaining budget before starting and the headline is printed
# the moment it exists.
BUDGET_S = 3000


def main():
    # Each attempt runs in a fresh subprocess: a failed (OOM) attempt must not
    # leak device buffers into the fallback.
    import os
    import subprocess

    t_start = time.time()

    def remaining():
        return BUDGET_S - (time.time() - t_start)

    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    # Persistent XLA compile cache (gitignored, survives across rounds):
    # backend init on the tunneled chip already costs ~200 s per
    # subprocess; recompiling the same programs every round is what blew
    # round 4's budget (flash_fwd check alone: 755 s).
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(here, ".xla_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

    zero = {
        "metric": "serving_images_plus_tokens_per_sec_per_chip",
        "value": 0.0, "unit": "img+tok/s/chip", "vs_baseline": 0.0,
        "detail": {"error": "no attempt succeeded"},
    }

    # Device liveness gate: a wedged/unavailable TPU tunnel blocks backend
    # init for ~25 min PER subprocess; without this gate the fallback
    # chain would burn hours discovering the same outage 12 times. A live
    # tunnel answers in ~200 s (backend init); 600 s is decisively dead.
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; jax.devices(); "
             "print(float(jnp.ones(2).sum()))"],
            capture_output=True, text=True, timeout=600, env=env,
        )
        if probe.returncode != 0:
            raise RuntimeError(probe.stderr[-500:])
    except Exception as e:
        print(f"bench: device unavailable, skipping: {e}", file=sys.stderr)
        zero["detail"] = {"error": "device unavailable (tunnel down)"}
        print(json.dumps(zero))
        return

    def attempt(extra_args, timeout):
        timeout = min(timeout, remaining() - 60)
        if timeout < 120:
            return None
        cmd = [sys.executable, __file__] + extra_args
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=timeout, env=env)
        except subprocess.TimeoutExpired:
            print(f"bench: {extra_args} timed out after {timeout:.0f}s",
                  file=sys.stderr)
            return None
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    pass
        print(f"bench: {extra_args} failed:\n{proc.stderr[-2000:]}",
              file=sys.stderr)
        return None

    # ---- phase 1: the headline (continuous batching, dense cache) ----
    # One chip decodes B streams off one weight pass (the reference's
    # concurrency-5 worker time-slices a GPU instead). Fall back through
    # smaller batches, then precision, then model size. int8f (fused
    # qkv/gate|up int8) measured above plain int8 in round 4 (418.7 vs
    # 412.4, CHIPBENCH.json); it leads the chain.
    best = None
    for model, batch, kv8, lttft in (
        ("llava-1.5-7b-int8f", 16, True, True),
        ("llava-1.5-7b-int8", 16, True, False),
        ("llava-1.5-7b-int8", 8, True, False),
        ("llava-1.5-7b-int4", 16, True, False),
        ("llava-1.5-13b-int4", 8, True, False),
        ("llava-1.5-7b-int8", 4, False, False),
        ("llava-1.5-7b-int8", 1, False, False),
        ("llava-1.5-7b", 1, False, False),
        ("llava-1.5-7b-lite", 1, False, False),
        ("tiny", 1, False, False),
    ):
        args = ["--model", model, "--batch", str(batch)]
        if kv8:
            args.append("--kv-int8")
        if lttft:
            args.append("--loaded-ttft")
        r = attempt(args, 2100 if lttft else 1200)
        if r and r.get("value", 0) > 0:
            best = r
            # insurance copy: if a later phase hangs into the driver's
            # kill, the headline is already on stdout
            print(json.dumps(best), flush=True)
            break
        if remaining() < 400:
            break

    # ---- phase 2: paged-pool engine throughput (occupancy 24) ----
    # Paged KV is the BASELINE north-star feature; it gets a driver-visible
    # number every round. Promoted to the headline iff it beats dense.
    if best is not None and remaining() > 900:
        r = attempt(["--model", "llava-1.5-7b-int8", "--batch", "24",
                     "--kv-int8", "--paged"], 1200)
        if r and r.get("value", 0) > 0:
            best.setdefault("detail", {})["paged24_img_tok_s"] = r["value"]
            if r["value"] > best["value"]:
                r.setdefault("detail", {})["dense16_img_tok_s"] = \
                    best["value"]
                best = r

    # ---- phase 3: on-chip kernel equality checks (TPUCHECKS.json) ----
    # Strictly after the headline: proves the compiled TPU kernels (not
    # their CPU fallbacks) match the XLA references, with whatever budget
    # is left. Additive — a failure is recorded, never fails the bench.
    if remaining() > 300:
        try:
            subprocess.run(
                [sys.executable, os.path.join(here, "tools",
                                              "tpu_checks.py")],
                timeout=min(1200, remaining() - 60),
                # verdict goes to TPUCHECKS.json + stderr; bench stdout
                # must end with the headline line (the driver parses it)
                stdout=sys.stderr, env=env,
            )
        except Exception as e:
            print(f"tpu_checks failed: {e}", file=sys.stderr)
    else:
        print(f"bench: skipping tpu_checks ({remaining():.0f}s left)",
              file=sys.stderr)

    print(json.dumps(best or zero), flush=True)


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--kv-int8", action="store_true")
    parser.add_argument("--loaded-ttft", action="store_true")
    parser.add_argument("--paged", action="store_true",
                        help="engine throughput over the paged KV pool "
                             "(--batch becomes the slot/occupancy count)")
    parser.add_argument("--paged-raw", action="store_true",
                        help="static-batch loop over the paged pool "
                             "(identity page tables; Pallas paged decode "
                             "kernel instead of the XLA einsum)")
    parser.add_argument("--w8a8", action="store_true",
                        help="dynamic int8 activations for the prefill "
                             "matmuls (2x MXU int8 path; decode "
                             "unaffected)")
    args = parser.parse_args()
    if args.model and args.paged:
        print(json.dumps(run_paged_engine(args.model, args.batch,
                                          args.kv_int8)))
    elif args.model:
        print(json.dumps(run(args.model, args.batch, args.kv_int8,
                             loaded_ttft=args.loaded_ttft,
                             raw_paged=args.paged_raw, w8a8=args.w8a8)))
    else:
        main()
