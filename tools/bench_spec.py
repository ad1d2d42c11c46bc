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


def run(speculate: int, new_tokens: int):
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
        return n, dt, eng.spec_acceptance
    finally:
        eng.stop()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spec", type=int, default=4)
    p.add_argument("--new", type=int, default=128)
    p.add_argument("--only", type=int, default=None,
                   help="run a single mode (0=plain or k) in this process")
    args = p.parse_args()

    if args.only is not None:
        n, dt, acc = run(args.only, args.new)
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
             "--new", str(args.new)],
            capture_output=True, text=True, timeout=3000,
        )
        out = [l for l in proc.stdout.splitlines() if l.startswith("  ")]
        print(out[-1] if out else f"spec={mode} FAILED\n{proc.stderr[-800:]}",
              flush=True)
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
