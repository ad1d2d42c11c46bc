"""On-TPU check + timing for the Pallas flash attention fwd/bwd.

Usage: python tools/bench_flash.py [--small]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from llava_plus_tpu.ops.attention import xla_attention
from llava_plus_tpu.ops.flash_attention import flash_attention


def sync(x):
    # fetch ONE element: axon doesn't block in block_until_ready, and
    # fetching the whole array would time the tunnel, not the chip
    return np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true")
    args = p.parse_args()

    B, T, H, D = (2, 512, 4, 128) if args.small else (4, 2048, 32, 128)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.bfloat16)
    seg = jnp.ones((B, T), jnp.int32)
    g = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.bfloat16)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=True,
                            q_segment_ids=seg, kv_segment_ids=seg)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    def loss_xla(q, k, v):
        o = xla_attention(q, k, v, causal=True,
                          q_segment_ids=seg, kv_segment_ids=seg)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    fwd_flash = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg))
    fwd_xla = jax.jit(lambda q, k, v: xla_attention(
        q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg))
    grad_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))
    grad_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))

    # numerics
    of, ox = fwd_flash(q, k, v), fwd_xla(q, k, v)
    err = float(jnp.max(jnp.abs(of.astype(jnp.float32) - ox.astype(jnp.float32))))
    print(f"fwd max abs err: {err:.4f}")
    gf, gx = grad_flash(q, k, v), grad_xla(q, k, v)
    for name, a, b in zip("qkv", gf, gx):
        e = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) or 1.0
        print(f"d{name} max abs err: {e:.4f} (rel {e / scale:.4f})")

    # timing
    tf = timeit(fwd_flash, q, k, v)
    tx = timeit(fwd_xla, q, k, v)
    print(f"fwd: pallas {tf*1e3:.2f} ms vs xla {tx*1e3:.2f} ms")
    tbf = timeit(grad_flash, q, k, v)
    tbx = timeit(grad_xla, q, k, v)
    print(f"fwd+bwd: pallas {tbf*1e3:.2f} ms vs xla {tbx*1e3:.2f} ms")
    # attention flops: causal ~ 0.5 * (fwd 4 + bwd 10) * B*T^2*H*D
    flops = 0.5 * 14 * B * T * T * H * D
    print(f"fwd+bwd pallas TFLOP/s: {flops / tbf / 1e12:.1f}")


if __name__ == "__main__":
    main()
