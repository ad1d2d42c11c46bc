"""Bisect the speculative verify step's on-chip cost.

bench_spec --isolate showed one fused spec iteration (m=1) costs ~98 ms
vs ~37 ms for a plain decode step at B=1 — 2.67x for a (k+1)-token
verify that SHOULD be ~1x (both are weight/KV-bandwidth bound). At
acceptance 1.91 that ratio is exactly the measured 0.73x end-to-end
loss (CHIPBENCH r5 spec stage). This probe times each candidate in the
gap separately ON THE CHIP:

  engine_decode   the engine's full plain step (dispatch+sample+sync)
  raw_T1          bare llava.decode_step, one token
  raw_T5          bare llava.decode_step, k+1 = 5 tokens (verify core)
  verify_core     raw_T5 + greedy argmax + small fetch
  propose_only    the device n-gram proposal scan over hist [B, S]
  sample_only     _sample_batch replica (32k-vocab sort + categorical)
  spec_m1 / m4    the engine's fused program, one / four iterations

Whichever line carries the missing ~60 ms is the fix target.

Usage: python tools/probe_spec_cost.py [--slots 1] [--k 4]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parents[1] / ".xla_cache"),
)

import numpy as np

import functools
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--slots", type=int, default=1)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--tiny", action="store_true",
                   help="tiny config smoke run (CPU correctness only)")
    args = p.parse_args()
    if args.tiny:
        # the axon sitecustomize overrides JAX_PLATFORMS at interpreter
        # start; jax.config wins over it (same dance as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")

    from llava_plus_tpu.data.debug_tokenizer import DebugTokenizer
    from llava_plus_tpu.models import llava as llava_model
    from llava_plus_tpu.models.configs import LLAVA_15_7B, tiny_llava_config
    from llava_plus_tpu.ops.quant import quantize_llava_params
    from llava_plus_tpu.serve.engine import BatchedEngine, Request

    cfg = tiny_llava_config() if args.tiny else LLAVA_15_7B
    params = llava_model.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.bfloat16)
    params = quantize_llava_params(params, bits=8)
    tok = DebugTokenizer(vocab_size=cfg.text.vocab_size)
    rng = np.random.default_rng(0)
    img = cfg.vision.image_size
    prompt = "<image>\n" + " ".join(f"w{i % 24}" for i in range(160))

    eng = BatchedEngine(
        params, cfg, tok, max_slots=args.slots, max_seq_len=2048,
        prefill_bucket=256, cache_dtype=jnp.int8, speculate=args.k,
        spec_chunk=4,
    )
    res = {}
    try:
        warm = Request(
            prompt=prompt,
            images=rng.normal(size=(1, img, img, 3)).astype(np.float32),
            max_new_tokens=8, temperature=0.0,
        )
        eng.submit(warm)
        while warm._chunks.get(timeout=900) is not None:
            pass
        eng._stop.set()
        eng._thread.join(timeout=30)
        if eng._prefill_thread is not None:
            eng._prefill_thread.join(timeout=30)

        def timed(name, fn, reps=args.reps):
            fn()  # compile
            t0 = time.perf_counter()
            for _ in range(reps):
                fn()
            dt = (time.perf_counter() - t0) / reps
            res[name] = round(dt * 1e3, 2)
            print(f"  {name:16s} {dt*1e3:9.2f} ms", flush=True)

        B, S, k = eng.max_slots, eng.max_seq_len, eng.speculate
        V = cfg.text.vocab_size
        keys = jnp.stack([jax.random.PRNGKey(0)] * B)
        temps = jnp.zeros((B,), jnp.float32)
        tops = jnp.ones((B,), jnp.float32)
        active = jnp.ones((B,), bool)
        positions1 = jnp.full((B, 1), 512, jnp.int32)

        # 1. engine plain step (known baseline)
        def plain():
            eng.tokens, eng.cache = eng._decode(
                eng.params, eng.cache, eng.tokens, positions1[:, 0],
                active, keys, temps, tops,
            )
            jax.device_get(eng.tokens.ravel()[0])
        timed("engine_decode", plain)

        # 2/3. bare decode_step at T = 1 and T = k+1
        impl = eng._attn_impl

        @functools.partial(jax.jit, donate_argnums=(1,),
                           static_argnames=("T",))
        def raw_step(prm, cache, toks, pos, seg, *, T):
            logits, cache = llava_model.decode_step(
                prm, cfg, toks, pos, seg, cache, attn_impl=impl,
            )
            return logits, cache

        def run_raw(T):
            toks = jnp.zeros((B, T), jnp.int32)
            pos = 512 + jnp.tile(
                jnp.arange(T, dtype=jnp.int32)[None], (B, 1))
            seg = jnp.ones((B, T), jnp.int32)

            def go():
                logits, eng.cache = raw_step(
                    eng.params, eng.cache, toks, pos, seg, T=T,
                )
                jax.device_get(logits[0, 0, 0])
            return go

        timed("raw_T1", run_raw(1))
        timed(f"raw_T{k + 1}", run_raw(k + 1))

        # 4. verify core: T=k+1 step + argmax + [B, k+1] fetch
        @functools.partial(jax.jit, donate_argnums=(1,))
        def verify(prm, cache, toks, pos, seg):
            logits, cache = llava_model.decode_step(
                prm, cfg, toks, pos, seg, cache, attn_impl=impl,
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

        toksv = jnp.zeros((B, k + 1), jnp.int32)
        posv = 512 + jnp.tile(
            jnp.arange(k + 1, dtype=jnp.int32)[None], (B, 1))
        segv = jnp.ones((B, k + 1), jnp.int32)

        def vgo():
            out, eng.cache = verify(eng.params, eng.cache, toksv, posv, segv)
            jax.device_get(out)
        timed("verify_core", vgo)

        # 5. device n-gram proposal replica (engine._propose_dev)
        def propose(hist, hlen):
            idx = jnp.arange(S, dtype=jnp.int32)[None]
            best_j = jnp.full((B,), -1, jnp.int32)
            best_n = jnp.zeros((B,), jnp.int32)
            for n in (3, 2, 1):
                tail_idx = (hlen[:, None] - n
                            + jnp.arange(n, dtype=jnp.int32)[None])
                tail = jnp.take_along_axis(
                    hist, jnp.clip(tail_idx, 0, S - 1), axis=1)
                m = jnp.ones((B, S), bool)
                padded = jnp.pad(hist, ((0, 0), (0, n)))
                for i in range(n):
                    m &= padded[:, i:i + S] == tail[:, i:i + 1]
                m &= idx < (hlen - n)[:, None]
                m &= (hlen > n)[:, None]
                found = jnp.any(m, axis=1)
                jstar = jnp.max(jnp.where(m, idx, -1), axis=1)
                take = found & (best_j < 0)
                best_j = jnp.where(take, jstar, best_j)
                best_n = jnp.where(take, jnp.int32(n), best_n)
            pidx = (best_j[:, None] + best_n[:, None]
                    + jnp.arange(k, dtype=jnp.int32)[None])
            prop = jnp.take_along_axis(
                hist, jnp.clip(pidx, 0, S - 1), axis=1)
            ok = (best_j[:, None] >= 0) & (pidx < hlen[:, None])
            return jnp.where(ok, prop, 0)

        jprop = jax.jit(propose)
        hist = jnp.zeros((B, S), jnp.int32)
        hlen = jnp.full((B,), 512, jnp.int32)

        def pgo():
            jax.device_get(jprop(hist, hlen)[0, 0])
        timed("propose_only", pgo)

        # 6. sampler replica (32k sort + categorical)
        def sample(logits, skeys, temperature, top_p):
            greedy = jnp.argmax(logits, axis=-1)
            scaled = logits / jnp.maximum(temperature[:, None], 1e-6)
            sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep = (cum - probs) < top_p[:, None]
            cutoff = jnp.max(
                jnp.where(keep, sorted_logits, -jnp.inf),
                axis=-1, keepdims=True)
            filtered = jnp.where(scaled >= cutoff, scaled, -jnp.inf)
            sampled = jax.vmap(
                lambda kk, l: jax.random.categorical(kk, l)
            )(skeys, filtered)
            return jnp.where(temperature <= 0.0, greedy, sampled)

        jsample = jax.jit(sample)
        lg = jnp.zeros((B, V), jnp.float32)

        def sgo():
            jax.device_get(jsample(lg, keys, temps, tops)[0])
        timed("sample_only", sgo)

        # 7/8. the engine's fused spec program, m = 1 and m = 4
        st = {"cur": jnp.zeros((B,), jnp.int32),
              "hlen": jnp.full((B,), 512, jnp.int32),
              "hist": jnp.zeros((B, S), jnp.int32),
              "prop": jnp.zeros((B, k), jnp.int32),
              "budget": jnp.full((B,), 1 << 20, jnp.int32)}

        def spec(m):
            def go():
                ret, st["cur"], st["hlen"], st["hist"], st["prop"], \
                    st["budget"], eng.cache = eng._spec_prog(
                        eng.params, eng.cache, st["cur"], st["hlen"],
                        st["hist"], st["prop"], st["budget"], active,
                        keys, temps, tops, k=k, m=m,
                    )
                jax.device_get(ret)
            return go

        timed("spec_m1", spec(1))
        timed("spec_m4", spec(4), reps=max(args.reps // 4, 3))

        print("RESULT " + json.dumps(res), flush=True)
    finally:
        eng._stop.set()


if __name__ == "__main__":
    main()
