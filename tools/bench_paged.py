"""On-chip paged-KV engine measurement (VERDICT: paged KV done-criterion).

Compares per-token decode cost of the dense-cache engine (2048 ctx) vs the
paged-pool engine serving 4096-token contexts from the same pool budget,
and demonstrates a >2048-token context actually decoding.

Usage: python tools/bench_paged.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax.numpy as jnp


def run_engine(paged: bool, max_seq_len: int, prompt_tokens: int,
               n_requests: int = 8, new_tokens: int = 128,
               pool_tokens=None):
    from llava_plus_tpu.data.debug_tokenizer import DebugTokenizer
    from llava_plus_tpu.models import llava as llava_model
    from llava_plus_tpu.models.configs import LLAVA_15_7B
    from llava_plus_tpu.ops.quant import quantize_llava_params
    from llava_plus_tpu.serve.engine import BatchedEngine, Request

    import jax

    cfg = LLAVA_15_7B
    params = llava_model.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.bfloat16)
    params = quantize_llava_params(params, bits=8)
    tok = DebugTokenizer(vocab_size=cfg.text.vocab_size)

    rng = np.random.default_rng(0)
    img = cfg.vision.image_size
    n_text = prompt_tokens - cfg.num_image_tokens - 8
    prompt = "<image>\n" + " ".join(f"w{i}" for i in range(n_text))

    eng = BatchedEngine(
        params, cfg, tok, max_slots=n_requests, max_seq_len=max_seq_len,
        prefill_bucket=256, cache_dtype=jnp.int8,
        paged=paged, pool_tokens=pool_tokens,
        # identical prompts here: prefix reuse would skip later prefills
        # and skew the dense-vs-paged decode comparison (bench_prefix.py
        # measures reuse itself)
        prefix_cache=False,
    )
    try:
        # warmup: compile prefill + decode programs outside the timing
        warm = Request(prompt=prompt,
                       images=rng.normal(size=(1, img, img, 3)).astype(np.float32),
                       max_new_tokens=4, temperature=1.0, top_p=0.95)
        eng.submit(warm)
        while warm._chunks.get(timeout=600) is not None:
            pass

        reqs = [
            Request(prompt=prompt,
                    images=rng.normal(size=(1, img, img, 3)).astype(np.float32),
                    max_new_tokens=new_tokens, temperature=1.0, top_p=0.95)
            for _ in range(n_requests)
        ]
        t0 = time.perf_counter()
        for r in reqs:
            eng.submit(r)
        total = 0
        for r in reqs:
            n = 0
            while r._chunks.get(timeout=600) is not None:
                n += 1
            total += n
        dt = time.perf_counter() - t0
        return total, dt
    finally:
        eng.stop()


STAGES = {
    # dense engine, 2048 ctx, 8 x (768 prompt + 128 decode)
    "dense-2048": dict(paged=False, max_seq_len=2048, prompt_tokens=768),
    # paged engine, 4096 ctx, same pool budget (8*2048 tokens), same load
    "paged-4096": dict(paged=True, max_seq_len=4096, prompt_tokens=768,
                       pool_tokens=8 * 2048),
    # one 3584-token prompt -> 64 new tokens (beyond the dense 2048 limit);
    # pool sized to the single stream (a 16 GB-chip 8-slot pool + the 3584
    # prefill transients would OOM next to the int8 weights)
    "paged-long": dict(paged=True, max_seq_len=4096, prompt_tokens=3584,
                       n_requests=1, new_tokens=64, pool_tokens=2 * 4096),
}


def main():
    # each stage in a fresh subprocess: a 7B engine + its quantize
    # transients must not leak into the next stage (single 16 GB chip)
    import subprocess

    for name in STAGES:
        proc = subprocess.run(
            [sys.executable, __file__, "--stage", name],
            capture_output=True, text=True, timeout=3000,
        )
        out = [l for l in proc.stdout.splitlines() if l.startswith("  ")]
        print(f"{name}: " + (out[-1].strip() if out
                             else f"FAILED\n{proc.stderr[-1000:]}"))


def verify_kernel():
    """Numerical parity of the Pallas paged-decode kernel vs the XLA
    gather reference, on the real chip (bf16 / int8 / GQA / self-block)."""
    import jax
    import jax.numpy as jnp

    from llava_plus_tpu.ops.paged_attention import (
        paged_attention_reference, paged_decode_attention)

    rng = np.random.default_rng(0)
    for name, B, H, Hkv, D, maxp, quant in [
        ("bf16", 8, 32, 32, 128, 16, False),
        ("int8", 8, 32, 32, 128, 16, True),
        ("gqa-int8", 4, 32, 8, 128, 8, True),
    ]:
        P = 128
        Np = B * maxp + 3
        lengths = rng.integers(0, maxp * P, size=B)
        pt = jnp.asarray(rng.integers(0, Np, size=(B, maxp)), jnp.int32)
        kv = rng.normal(size=(Np, 2, P, Hkv, D)).astype(np.float32)
        q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.bfloat16)
        ck = jnp.asarray(rng.standard_normal((B, 1, Hkv, D)), jnp.bfloat16)
        cv = jnp.asarray(rng.standard_normal((B, 1, Hkv, D)), jnp.bfloat16)
        valid = jnp.ones((B,), jnp.int32)
        scale = None
        if quant:
            s = np.abs(kv).max(axis=-1) / 127.0     # [Np, 2, P, Hkv]
            kv = np.clip(np.round(kv / s[..., None]), -127, 127).astype(np.int8)
            # head-major scale pages [Np, 2, Hkv, P]
            scale = jnp.asarray(s.transpose(0, 1, 3, 2).astype(np.float32))
            kv = jnp.asarray(kv)
        else:
            kv = jnp.asarray(kv, jnp.bfloat16)
        lens = jnp.asarray(lengths, jnp.int32)
        got = paged_decode_attention(q, kv, pt, lens, scale, cur_k=ck,
                                     cur_v=cv, cur_valid=valid,
                                     interpret=False)
        ref = paged_attention_reference(q.astype(jnp.float32), kv, pt, lens,
                                        scale, cur_k=ck, cur_v=cv,
                                        cur_valid=valid)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
        print(f"  {name}: max abs err {err:.4f}")
        assert err < 0.05, name
    print("  kernel parity OK")


if __name__ == "__main__":
    import argparse

    _p = argparse.ArgumentParser()
    _p.add_argument("--stage", default=None)
    _p.add_argument("--verify", action="store_true")
    _a = _p.parse_args()
    if _a.verify:
        verify_kernel()
    elif _a.stage:
        kw = STAGES[_a.stage]
        total, dt = run_engine(**kw)
        print(f"  {total} tokens in {dt:.1f}s = {total/dt:,.1f} tok/s aggregate",
              flush=True)
    else:
        main()
