"""Microbench the quantized matvec kernels at 7B decode shapes.

Prints effective GB/s (resident quantized bytes / time) for the int4 Pallas
kernel, the int8 Pallas kernel, and the XLA dense paths, at the decode row
counts the engine actually uses.

Usage: python tools/bench_int4.py [--rows 16]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    return np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def timeit(fn, x, *ws, iters=100):
    """Time fn(x, *ws) via lax.scan inside ONE jit: the tunneled runtime
    adds ~0.4-1 ms fixed overhead per dispatch, so per-call timing measures
    the tunnel, not the kernel. A scalar dependency chains iterations so
    XLA can't hoist the loop-invariant matmul."""
    import jax.numpy as jnp

    @jax.jit
    def loop(x, *ws):
        def body(carry, _):
            out = fn(carry, *ws)
            bump = (out.ravel()[0] * 0.0).astype(carry.dtype)
            return carry + bump, ()

        final, _ = jax.lax.scan(body, x, None, length=iters)
        return final

    sync(loop(x, *ws))  # compile
    t0 = time.perf_counter()
    sync(loop(x, *ws))
    total = time.perf_counter() - t0

    @jax.jit
    def base(x):
        def body(carry, _):
            return carry + (carry.ravel()[0] * 0.0), ()

        final, _ = jax.lax.scan(body, x, None, length=iters)
        return final

    sync(base(x))
    t0 = time.perf_counter()
    sync(base(x))
    return max((total - (time.perf_counter() - t0)) / iters, 1e-9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=16)
    args = p.parse_args()

    from llava_plus_tpu.ops import quant, quant_matmul

    shapes = [(4096, 4096), (4096, 11008), (11008, 4096)]
    rng = np.random.default_rng(0)
    R = args.rows

    for K, N in shapes:
        w = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.float32)
        x = jnp.asarray(rng.normal(size=(R, K)), jnp.bfloat16)
        q8 = quant.quantize_array(w)
        q4 = quant.quantize_array_int4(w)

        b4 = K * N // 2 + (K // 32) * N * 4
        b8 = K * N + N * 4

        t4 = timeit(jax.jit(
            lambda x, q, s: quant_matmul.matmul_int4(x, q, s)
        ), x, q4[quant.Q4KEY], q4[quant.SKEY])
        t8k = timeit(jax.jit(
            lambda x, q: quant_matmul.matmul_int8(x, q)
        ), x, q8[quant.QKEY])
        t8x = timeit(jax.jit(
            lambda x, q, s: (x @ q.astype(x.dtype)) * s.reshape(-1).astype(x.dtype)
        ), x, q8[quant.QKEY], q8[quant.SKEY])
        t4x = timeit(jax.jit(
            lambda x, q: x @ quant.dequantize_array(q, x.dtype)
        ), x, q4)

        print(f"[{K}x{N}] R={R}:"
              f" int4-kernel {t4*1e3:.2f}ms ({b4/t4/1e9:.0f} GB/s)"
              f" | int4-xla {t4x*1e3:.2f}ms ({b4/t4x/1e9:.0f} GB/s)"
              f" | int8-kernel {t8k*1e3:.2f}ms ({b8/t8k/1e9:.0f} GB/s)"
              f" | int8-xla {t8x*1e3:.2f}ms ({b8/t8x/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
