"""On-chip prompt-lookup speculative decoding measurement.

Single-stream 7B int8 greedy decode, speculation off vs on. With random
weights acceptance depends on whether the greedy chain happens to cycle
(real checkpoints produce far more matchable text); the structural claims
this validates are (a) the (k+1)-token verify step costs about one decode
step, so speculation never loses much, and (b) accepted tokens raise
tok/s in proportion to `spec_acceptance`.

Usage: python tools/bench_spec.py [--spec 4] [--new 128]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp


def run(speculate: int, new_tokens: int, spec_chunk: int = 4):
    from llava_plus_tpu.data.debug_tokenizer import DebugTokenizer
    from llava_plus_tpu.models import llava as llava_model
    from llava_plus_tpu.models.configs import LLAVA_15_7B
    from llava_plus_tpu.ops.quant import quantize_llava_params
    from llava_plus_tpu.serve.engine import BatchedEngine, Request

    cfg = LLAVA_15_7B
    params = llava_model.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.bfloat16)
    params = quantize_llava_params(params, bits=8)
    tok = DebugTokenizer(vocab_size=cfg.text.vocab_size)

    rng = np.random.default_rng(0)
    img = cfg.vision.image_size
    prompt = "<image>\n" + " ".join(f"w{i % 24}" for i in range(160))

    eng = BatchedEngine(
        params, cfg, tok, max_slots=1, max_seq_len=2048,
        prefill_bucket=256, cache_dtype=jnp.int8, speculate=speculate,
        spec_chunk=spec_chunk,
    )
    try:
        warm = Request(prompt=prompt,
                       images=rng.normal(size=(1, img, img, 3)).astype(np.float32),
                       max_new_tokens=8, temperature=0.0)
        eng.submit(warm)
        while warm._chunks.get(timeout=900) is not None:
            pass

        req = Request(prompt=prompt,
                      images=rng.normal(size=(1, img, img, 3)).astype(np.float32),
                      max_new_tokens=new_tokens, temperature=0.0)
        t0 = time.perf_counter()
        eng.submit(req)
        n = 0
        while req._chunks.get(timeout=900) is not None:
            n += 1
        dt = time.perf_counter() - t0
        if speculate:
            t = dict(eng.spec_timers)
            t["steps"] = eng.spec_steps
            t["refreshes"] = eng.spec_refreshes
            print(f"  spec loop breakdown: {t}", flush=True)
        return n, dt, eng.spec_acceptance
    finally:
        eng.stop()


def isolate(speculate: int = 4, spec_chunk: int = 4):
    """Break the per-emitted-token cost of the device-resident spec
    pipeline into its parts ON THE CHIP: the fused spec_step program
    itself, the [B, k+2] result fetch, and the plain decode step for
    comparison. Pinpoints whether a pathological spec number is device
    compute, tunnel round-trips, or host loop overhead."""
    from llava_plus_tpu.data.debug_tokenizer import DebugTokenizer
    from llava_plus_tpu.models import llava as llava_model
    from llava_plus_tpu.models.configs import LLAVA_15_7B
    from llava_plus_tpu.ops.quant import quantize_llava_params
    from llava_plus_tpu.serve.engine import BatchedEngine, Request

    cfg = LLAVA_15_7B
    params = llava_model.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.bfloat16)
    params = quantize_llava_params(params, bits=8)
    tok = DebugTokenizer(vocab_size=cfg.text.vocab_size)

    rng = np.random.default_rng(0)
    img = cfg.vision.image_size
    prompt = "<image>\n" + " ".join(f"w{i % 24}" for i in range(160))

    eng = BatchedEngine(
        params, cfg, tok, max_slots=1, max_seq_len=2048,
        prefill_bucket=256, cache_dtype=jnp.int8, speculate=speculate,
        spec_chunk=spec_chunk,
    )
    try:
        warm = Request(prompt=prompt,
                       images=rng.normal(size=(1, img, img, 3))
                       .astype(np.float32),
                       max_new_tokens=8, temperature=0.0)
        eng.submit(warm)
        while warm._chunks.get(timeout=900) is not None:
            pass
        # freeze the engine loop so we own the programs
        eng._stop.set()
        eng._thread.join(timeout=30)
        if eng._prefill_thread is not None:
            eng._prefill_thread.join(timeout=30)

        res = {}

        def timed(name, fn, reps=20):
            fn()  # warm (compiles if needed)
            t0 = time.perf_counter()
            for _ in range(reps):
                fn()
            dt = (time.perf_counter() - t0) / reps
            res[name] = round(dt * 1e3, 2)
            print(f"  {name:24s} {dt*1e3:9.2f} ms", flush=True)

        B, S, k = eng.max_slots, eng.max_seq_len, eng.speculate
        z = lambda *sh: jnp.zeros(sh or (B,), jnp.int32)
        keys = jnp.stack([jax.random.PRNGKey(0)] * B)
        temps = jnp.zeros((B,), jnp.float32)
        tops = jnp.ones((B,), jnp.float32)
        active = jnp.ones((B,), bool)
        positions = jnp.full((B,), 512, jnp.int32)

        # 1. plain decode step, fetch one element to sync
        def plain():
            eng.tokens, eng.cache = eng._decode(
                eng.params, eng.cache, eng.tokens, positions, active,
                keys, temps, tops,
            )
            jax.device_get(eng.tokens.ravel()[0])
        timed("decode_step+sync", plain)

        # 2. fused spec step, sync on the small ret row
        st = {"cur": z(), "hlen": jnp.full((B,), 512, jnp.int32),
              "hist": z(B, S), "prop": z(B, k),
              "budget": jnp.full((B,), 1 << 20, jnp.int32)}
        def spec():
            ret, st["cur"], st["hlen"], st["hist"], st["prop"], \
                st["budget"], eng.cache = eng._spec_prog(
                    eng.params, eng.cache, st["cur"], st["hlen"],
                    st["hist"], st["prop"], st["budget"], active, keys,
                    temps, tops, k=k,
                )
            jax.device_get(ret)
        timed("spec_step+fetch", spec)

        # 3. pure fetch RTT (tiny constant)
        one = jnp.zeros((4,), jnp.int32)
        timed("tiny_fetch_rtt", lambda: jax.device_get(one))
        print("RESULT " + json.dumps(res), flush=True)
    finally:
        eng._stop.set()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spec", type=int, default=4)
    p.add_argument("--new", type=int, default=128)
    p.add_argument("--chunk", type=int, default=4,
                   help="verify steps fused per dispatch (engine spec_chunk)")
    p.add_argument("--only", type=int, default=None,
                   help="run a single mode (0=plain or k) in this process")
    p.add_argument("--isolate", action="store_true",
                   help="per-component timing of the spec pipeline")
    args = p.parse_args()

    if args.isolate:
        isolate(args.spec, args.chunk)
        return

    if args.only is not None:
        n, dt, acc = run(args.only, args.new, args.chunk)
        print(f"  spec={args.only}: {n} tokens in {dt:.2f}s = "
              f"{n/dt:.1f} tok/s (acceptance {acc:.2f})", flush=True)
        print("RESULT " + json.dumps({
            "mode": args.only, "tokens": n, "seconds": round(dt, 2),
            "tok_s": round(n / dt, 2), "acceptance": round(acc, 2),
        }), flush=True)
        return

    # one engine per process (single 16 GB chip)
    import subprocess
    results = {}
    for mode in (0, args.spec):
        proc = subprocess.run(
            [sys.executable, __file__, "--only", str(mode),
             "--new", str(args.new), "--chunk", str(args.chunk)],
            capture_output=True, text=True, timeout=3000,
        )
        out = [l for l in proc.stdout.splitlines() if l.startswith("  ")]
        if out:
            print("\n".join(out), flush=True)  # incl. spec loop breakdown
        else:
            print(f"spec={mode} FAILED (rc={proc.returncode})\n"
                  f"{proc.stderr[-2000:]}", flush=True)
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                results["plain" if mode == 0 else f"spec{mode}"] = (
                    json.loads(line[7:]))
    if len(results) == 2:
        plain, spec = results["plain"], results[f"spec{args.spec}"]
        print("RESULT " + json.dumps({
            "plain_tok_s": plain["tok_s"],
            "spec_tok_s": spec["tok_s"],
            "acceptance": spec["acceptance"],
            "speedup": round(spec["tok_s"] / plain["tok_s"], 3),
        }), flush=True)


if __name__ == "__main__":
    main()
