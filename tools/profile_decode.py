"""Decode-step byte budget: WHERE the serving headline's time goes.

Decomposes the 7B batch-16 decode step (the config behind bench.py's
headline) into its HBM byte consumers and measures each as an isolated
device program at the exact production shapes/dtypes:

  full     the real llava decode_step (int8 weights, int8 KV, folded
           quant_cache_attention, unrolled layers) — ms of record
  matmuls  the weight stream alone: x @ {wqkv, wo, w_gateup, w_down}
           through ops.quant.matmul for all 32 layers + lm_head
           (~6.6 GB of int8 weights+scales per step)
  attn     the KV read alone: quant_cache_attention over the int8
           [B,S,H,D] cache for 32 layers (~4.4 GB incl. scales)

The residual (full - matmuls - attn) is RoPE/layernorm/sampling plus
XLA scheduling slack. Implied GB/s per component against the v5e's
~819 GB/s HBM peak shows which consumer is furthest from its roofline.

Usage: python tools/profile_decode.py [--batch 16] [--reps 20]
Prints a RESULT json line for chipbench/README citation.
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

S = 1024          # cache length (bench.py CACHE_LEN)
CTX = 832         # valid context mid-generation (768 prompt + ~64)
HBM_PEAK_GB_S = 819.0


def _sync(x):
    return np.asarray(jax.device_get(x))


def _time(fn, *args, reps):
    out = fn(*args)
    _sync(out)  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def measure_full(cfg, params, B, reps, n_steps=32):
    """The production decode step, measured the way the headline runs it:
    ``n_steps`` steps scanned into ONE device program (bench.py decode_n —
    per-step host dispatch on the tunneled chip costs ~16 ms of round-trip
    that the serving loop never pays)."""
    import functools

    from llava_plus_tpu.models import llama, llava as llava_model

    cache = llama.KVCache.create(cfg.text, B, S, jnp.int8)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def decode_n(params, cache, token, pos):
        def body(carry, _):
            token, pos, cache = carry
            seg = jnp.ones_like(token, jnp.int32)
            logits, cache = llava_model.decode_step(
                params, cfg, token, pos, seg, cache
            )
            nxt = jnp.argmax(logits[:, 0], axis=-1)[:, None]
            return (nxt, pos + 1, cache), None

        (token, pos, cache), _ = jax.lax.scan(
            body, (token, pos, cache), None, length=n_steps
        )
        return token, cache

    tok = jnp.ones((B, 1), jnp.int32)
    pos = jnp.full((B, 1), CTX, jnp.int32)
    t, cache = decode_n(params, cache, tok, pos)   # compile
    _sync(t)
    t0 = time.perf_counter()
    for _ in range(reps):
        t, cache = decode_n(params, cache, tok, pos)
    _sync(t)
    sec = (time.perf_counter() - t0) / (reps * n_steps)
    del cache
    return sec


def measure_matmuls(cfg, params, B, reps):
    """The weight stream alone: every decode matmul at [B, K] x int8[K, N]
    through the production ops.quant.matmul (fused dequant), layers
    unrolled like the decode step."""
    from llava_plus_tpu.ops import quant

    L = cfg.text.num_hidden_layers

    def one_layer(layers, x, i):
        at, ml = layers["attn"], layers["mlp"]
        take = lambda t: jax.tree.map(lambda a: a[i], t)
        if "wqkv" in at:
            y = quant.matmul(x, take(at["wqkv"]))
        else:
            y = jnp.concatenate(
                [quant.matmul(x, take(at[k])) for k in ("wq", "wk", "wv")],
                axis=-1,
            )
        x = quant.matmul(y[..., : x.shape[-1]], take(at["wo"]))
        if "w_gateup" in ml:
            g = quant.matmul(x, take(ml["w_gateup"]))
            h = g[..., : g.shape[-1] // 2]
        else:
            h = quant.matmul(x, take(ml["w_gate"]))
            h = h * 0 + quant.matmul(x, take(ml["w_up"]))
        return quant.matmul(h, take(ml["w_down"]))

    INNER = 8  # amortize the ~16 ms tunnel dispatch over 8 in-program passes

    @jax.jit
    def run(params, x):
        lm = params["language_model"]

        def full_pass(x, _):
            for i in range(L):
                x = one_layer(lm["layers"], x, i)
            head = lm.get("lm_head", lm["embed_tokens"].T)
            logits = (quant.matmul(x, head) if isinstance(head, dict)
                      else x @ head)
            # feed the logits back so no pass is dead code / CSE-able
            return x + 1e-6 * jnp.sum(logits), None

        x, _ = jax.lax.scan(full_pass, x, None, length=INNER)
        return jnp.sum(x)

    x = jnp.ones((B, cfg.text.hidden_size), jnp.bfloat16) * 0.01
    return _time(run, params, x, reps=reps) / INNER


def measure_attn(cfg, B, reps):
    """The KV read alone: folded int8-cache attention over the full
    [B, S, Hkv, D] pool for all layers (stacked, scanned unroll=8 like
    tools/bench_decode_attn.py)."""
    from llava_plus_tpu.ops.attention import quant_cache_attention

    t = cfg.text
    H, D = t.num_attention_heads, t.hidden_size // t.num_attention_heads
    Hkv = t.num_key_value_heads or H
    L = t.num_hidden_layers
    rng = np.random.default_rng(0)
    kq = jnp.asarray(
        rng.integers(-127, 128, size=(L, B, S, Hkv, D), dtype=np.int8))
    vq = jnp.asarray(
        rng.integers(-127, 128, size=(L, B, S, Hkv, D), dtype=np.int8))
    ks = jnp.asarray(
        rng.random((L, B, S, Hkv, 1), np.float32) * 0.01 + 1e-3)
    vs = jnp.asarray(
        rng.random((L, B, S, Hkv, 1), np.float32) * 0.01 + 1e-3)
    q = jnp.asarray(rng.standard_normal((L, B, 1, H, D)) * 0.1,
                    jnp.bfloat16)
    seg = np.zeros((B, S), np.int32)
    seg[:, :CTX] = 1
    seg = jnp.asarray(seg)
    pos = jnp.full((B, 1), CTX - 1, jnp.int32)

    INNER = 4  # amortize the tunnel dispatch over 4 in-program sweeps

    @jax.jit
    def run(kq, ks, vq, vs, q):
        def sweep(acc, _):
            def body(acc, xs):
                kql, ksl, vql, vsl, ql = xs
                o = quant_cache_attention(
                    ql, kql, ksl, vql, vsl, kv_segment_ids=seg,
                    q_positions=pos,
                )
                return acc + o.astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, acc, (kq, ks, vq, vs, q),
                                  unroll=8)
            return acc * 0.5, None  # data dependence across sweeps

        out, _ = jax.lax.scan(
            sweep, jnp.zeros((B, 1, H, D), jnp.float32), None,
            length=INNER,
        )
        return out

    sec = _time(run, kq, ks, vq, vs, q, reps=reps) / INNER
    kv_bytes = 2 * L * B * S * Hkv * D + 2 * L * B * S * Hkv * 4
    return sec, kv_bytes


def _weight_bytes(params):
    def leaf_bytes(a):
        return a.size * a.dtype.itemsize
    return sum(leaf_bytes(a) for a in
               jax.tree.leaves(params["language_model"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--model", default="llava-1.5-7b-int8f")
    args = ap.parse_args()

    import bench

    cfg, params = bench.build(args.model)
    B = args.batch

    full_s = measure_full(cfg, params, B, args.reps)
    print(f"full decode step      {full_s*1e3:8.2f} ms", flush=True)

    mm_s = measure_matmuls(cfg, params, B, args.reps)
    w_bytes = _weight_bytes(params)
    print(f"matmuls (weights)     {mm_s*1e3:8.2f} ms  "
          f"{w_bytes/1e9:5.2f} GB -> {w_bytes/mm_s/1e9:6.1f} GB/s",
          flush=True)

    # free the model before staging the synthetic attention cache
    del params
    attn_s, kv_bytes = measure_attn(cfg, B, args.reps)
    print(f"attention (KV read)   {attn_s*1e3:8.2f} ms  "
          f"{kv_bytes/1e9:5.2f} GB -> {kv_bytes/attn_s/1e9:6.1f} GB/s",
          flush=True)

    other_s = max(full_s - mm_s - attn_s, 0.0)
    total_bytes = w_bytes + kv_bytes
    sol_s = total_bytes / (HBM_PEAK_GB_S * 1e9)
    res = {
        "batch": B,
        "full_ms": round(full_s * 1e3, 2),
        "matmuls_ms": round(mm_s * 1e3, 2),
        "weight_gb": round(w_bytes / 1e9, 2),
        "weight_gb_s": round(w_bytes / mm_s / 1e9, 1),
        "attn_ms": round(attn_s * 1e3, 2),
        "kv_gb": round(kv_bytes / 1e9, 2),
        "kv_gb_s": round(kv_bytes / attn_s / 1e9, 1),
        "other_ms": round(other_s * 1e3, 2),
        "hbm_sol_ms": round(sol_s * 1e3, 2),
        "pct_of_roofline": round(100 * sol_s / full_s, 1),
    }
    print(f"other (norms/rope/sampling/slack) {other_s*1e3:.2f} ms")
    print(f"HBM speed-of-light ({total_bytes/1e9:.1f} GB @ "
          f"{HBM_PEAK_GB_S:.0f} GB/s) = {sol_s*1e3:.2f} ms -> step runs at "
          f"{100*sol_s/full_s:.0f}% of roofline")
    print("RESULT " + json.dumps(res))


if __name__ == "__main__":
    main()
