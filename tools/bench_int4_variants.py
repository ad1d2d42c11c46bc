"""Compare int4 matmul kernel variants on the TPU.

The shipped kernel (V0, ops/quant_matmul.matmul_int4) unpacks nibbles from
packed int8 by widening to int32 + shifts — heavy VPU work per byte (the
int32 widening alone quadruples vector traffic). Variants:

- V0: shipped packed-int8 kernel
- V3: native jnp.int4 storage; Mosaic converts int4->f32 directly, the
  per-32-block scale multiply uses a layout-preserving [bk/32, 32, bn]
  reshape (32 % 8 == 0 keeps sublane tiling intact)
- XLA8: int8 kernel for the time-to-beat (int4 wins only if its time is
  meaningfully under int8's — bytes are halved, so speed-of-light is 2x)

Timing uses lax.scan inside one jit minus a trivial-body baseline (the
tunneled runtime adds ~1 ms per dispatch).

Usage: python tools/bench_int4_variants.py [--rows 16]
"""

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT4_BLOCK = 32


def sync(x):
    return np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def timeit(fn, x, *ws, iters=100):
    @jax.jit
    def loop(x, *ws):
        def body(carry, _):
            out = fn(carry, *ws)
            bump = (out.ravel()[0] * 0.0).astype(carry.dtype)
            return carry + bump, ()

        final, _ = jax.lax.scan(body, x, None, length=iters)
        return final

    sync(loop(x, *ws))
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


# --- V3: native int4 storage -------------------------------------------------

def _int4n_kernel(x_ref, qw_ref, s_ref, o_ref, acc_ref, *, bk: int):
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bn = qw_ref.shape[-1]
    nb = bk // INT4_BLOCK
    w = qw_ref[:].astype(jnp.float32)           # int4 -> f32, native
    w = (w.reshape(nb, INT4_BLOCK, bn) * s_ref[:].reshape(nb, 1, bn))
    w = w.reshape(bk, bn).astype(x_ref.dtype)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(kj == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def matmul_int4_native(x, qw4, scale, *, block_n=256, block_k=0):
    R, K = x.shape
    K2, N = qw4.shape
    assert K == K2
    Rp = max(((R + 15) // 16) * 16, 16)
    bn = block_n
    bk = block_k or min(K, 4096)
    if Rp != R:
        x = jnp.pad(x, ((0, Rp - R), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_int4n_kernel, bk=bk),
        grid=(1, N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((Rp, bk), lambda r, j, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda r, j, k: (k, j)),
            pl.BlockSpec((bk // INT4_BLOCK, bn), lambda r, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((Rp, bn), lambda r, j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Rp, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Rp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x, qw4, scale.astype(jnp.float32))
    return out[:R]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=16)
    args = p.parse_args()

    from llava_plus_tpu.ops import quant, quant_matmul

    shapes = [(4096, 4096), (4096, 11008), (11008, 4096),
              (5120, 13824), (13824, 5120)]
    rng = np.random.default_rng(0)
    R = args.rows

    for K, N in shapes:
        w = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.float32)
        x = jnp.asarray(rng.normal(size=(R, K)), jnp.bfloat16)
        q8 = quant.quantize_array(w)
        q4 = quant.quantize_array_int4(w)
        # native int4 tensor with the same blockwise scales
        scale = q4[quant.SKEY]
        wf = np.asarray(w, np.float32).reshape(K // 32, 32, N)
        q4n = np.clip(np.round(wf / np.asarray(scale)[:, None, :]), -8, 7)
        # device-side cast: jnp.asarray(np, int4) recurses on this runtime
        q4n = jnp.asarray(q4n.reshape(K, N), jnp.int8).astype(jnp.int4)

        b4 = K * N // 2 + (K // 32) * N * 4
        b8 = K * N + N * 4

        t0 = timeit(jax.jit(
            lambda x, q, s: quant_matmul.matmul_int4(x, q, s)
        ), x, q4[quant.Q4KEY], q4[quant.SKEY])
        try:
            # NOTE: the tunneled axon runtime cannot dispatch S4 (jnp.int4)
            # jit arguments (RecursionError in apply_primitive) — the
            # native-int4-storage variant is unrunnable here; keep the
            # packed-int8 kernel as the production path.
            t3 = timeit(jax.jit(
                lambda x, q, s: matmul_int4_native(x, q, s)
            ), x, q4n, scale)
            v3 = f" | V3-native {t3*1e6:.0f}us ({b4/t3/1e9:.0f} GB/s)"
        except Exception as e:
            v3 = f" | V3-native unrunnable ({type(e).__name__})"
        t8 = timeit(jax.jit(
            lambda x, q: quant_matmul.matmul_int8(x, q)
        ), x, q8[quant.QKEY])

        print(f"[{K}x{N}] R={R}:"
              f" V0-packed {t0*1e6:.0f}us ({b4/t0/1e9:.0f} GB/s)"
              f"{v3}"
              f" | int8 {t8*1e6:.0f}us ({b8/t8/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
