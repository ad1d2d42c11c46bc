"""On-chip batched-eval measurement: questions/sec through EvalSession in
single-stream mode vs `--engine-slots N` (eval/common.py answer_many).

Same 7B-shaped random weights and 768-token multimodal prompts as
bench.py; answers are `--max-new` greedy tokens. The ratio is the
eval-wall-clock speedup a user gets from `--engine-slots` on
model_vqa/model_vqa_loader. Usage: python tools/bench_eval.py
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def build(model: str, kv_int8: bool):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench

    cfg, params = bench.build(model)
    from llava_plus_tpu.data.debug_tokenizer import DebugTokenizer

    tok = DebugTokenizer(vocab_size=cfg.text.vocab_size)
    cache_dtype = jnp.int8 if kv_int8 else jnp.bfloat16
    return cfg, params, tok, cache_dtype


def questions(cfg, n, prefill_len, rng):
    n_text = max(prefill_len - cfg.num_image_tokens - 8, 8)
    img = cfg.vision.image_size
    out = []
    for i in range(n):
        prompt = (f"<image>\nquestion {i}: "
                  + " ".join(f"word{j}" for j in range(n_text)))
        image = rng.normal(size=(1, img, img, 3)).astype(np.float32)
        out.append((prompt, image))
    return out

def run(mode: str, args, built):
    import jax.numpy as jnp

    from llava_plus_tpu.eval.common import EvalSession
    from llava_plus_tpu.generate import Generator
    from llava_plus_tpu.serve.engine import BatchedEngine

    cfg, params, tok, cache_dtype = built
    if mode == "engine":
        engine = BatchedEngine(
            params, cfg, tok, max_slots=args.slots, max_seq_len=1024,
            prefill_bucket=256, cache_dtype=cache_dtype,
        )
        session = EvalSession(None, engine=engine,
                              max_new_tokens=args.max_new)
    else:
        gen = Generator(params, cfg, tok, max_seq_len=1024,
                        prefill_bucket=256, cache_dtype=cache_dtype)
        session = EvalSession(None, generator=gen,
                              max_new_tokens=args.max_new)
    # answer_many consumes (prompt, pixel_array) via _pixels only when a
    # PIL image is passed; here images are already pixel arrays
    session._pixels = lambda image: image

    rng = np.random.default_rng(0)
    try:
        # warmup: identical question count so every program the timed run
        # dispatches (prefill buckets, decode_n chunk lengths under queue
        # pressure) is compiled before timing starts
        n_warm = args.n if mode == "engine" else 1
        list(session.answer_many(questions(cfg, n_warm, args.prefill, rng)))
        qs = questions(cfg, args.n, args.prefill, rng)
        t0 = time.perf_counter()
        outs = list(session.answer_many(qs))
        dt = time.perf_counter() - t0
    finally:
        session.close()
    assert len(outs) == args.n
    qps = args.n / dt
    print(f"{mode}: {qps:.3f} questions/s ({args.n} questions, {dt:.1f}s)")
    return qps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="llava-1.5-7b-int8")
    p.add_argument("--kv-int8", action="store_true", default=True)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--n", type=int, default=24)
    p.add_argument("--prefill", type=int, default=768)
    p.add_argument("--max-new", type=int, default=64)
    p.add_argument("--mode", choices=["single", "engine", "both"],
                   default="both")
    args = p.parse_args()
    built = build(args.model, args.kv_int8)
    res = {}
    for mode in (["single", "engine"] if args.mode == "both"
                 else [args.mode]):
        res[mode] = run(mode, args, built)
    if len(res) == 2:
        print(f"batched-eval speedup: {res['engine'] / res['single']:.2f}x")
        import json

        print("RESULT " + json.dumps({
            "single_q_s": round(res["single"], 3),
            "engine_q_s": round(res["engine"], 3),
            "slots": args.slots,
            "speedup": round(res["engine"] / res["single"], 3),
        }), flush=True)


if __name__ == "__main__":
    main()
