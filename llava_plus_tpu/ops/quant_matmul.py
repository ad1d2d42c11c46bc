"""Pallas TPU kernels for weight-only quantized matmuls (int8 / int4).

Why a kernel instead of ``x @ dequant(w)``: inside a decode ``lax.scan`` XLA
treats the dequantized weights as loop-invariant and hoists them out,
materializing a full bf16 copy of the model in HBM (OOM at 7B on a 16 GB
chip, and it defeats the bandwidth win). A pallas_call is opaque to that
optimization: the packed int8/int4 tensor is what streams HBM->VMEM, and
dequantization happens in VMEM right before the MXU.

Replaces the reference's bitsandbytes 8/4-bit CUDA kernels
(``llava/model/builder.py:32-41``) as the TPU-native quantized compute path.

Layouts (K = contraction dim, N = output dim):
- int8: ``qw [K, N] int8``, per-output-channel scale applied OUTSIDE the
  kernel (y = kernel(x, qw) * scale[None, :]).
- int4: ``qw [K//2, N] int8`` — two nibbles per byte in *split-half block*
  order: for each 32-row quantization block, the low nibbles hold rows
  0..15 and the high nibbles rows 16..31. ``scale [K//32, N] f32`` is the
  per-block scale and is applied in-kernel (it varies along K).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT4_BLOCK = 32


def _pick_block(total: int, preferred: int) -> int:
    for b in (preferred, 512, 256, 128):
        if b <= total and total % b == 0:
            return b
    return 0


def _pick_block_n(n: int) -> int:
    """Output-dim tile. Measured on v5e: narrow N tiles with a full-K pass
    win (bn=256,bk=K hit 467 GB/s vs 176 GB/s for 256x512 on [4096,11008])."""
    for b in (256, 128):
        if b <= n and n % b == 0:
            return b
    return 0


def _pick_block_k(k: int, cap: int = 16384) -> int:
    """Contraction-dim tile: the largest 256-aligned divisor of K under the
    VMEM cap — ideally K itself so the accumulator is written once (K=11008
    at bk=256 costs 43 accumulator passes and 3x the kernel time)."""
    for c in (k, k // 2, k // 4, 4096, 2048, 1024, 512, 256):
        if c and c <= cap and k % c == 0 and c % 256 == 0:
            return c
    return 0


def _interpret_default() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True


# ---------------------------------------------------------------------------
# int8
# ---------------------------------------------------------------------------

def _int8_kernel(x_ref, qw_ref, o_ref, acc_ref):
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = qw_ref[:].astype(x_ref.dtype)  # int8 -> bf16 in VMEM
    acc_ref[:] += jnp.dot(
        x_ref[:], w, preferred_element_type=jnp.float32
    )

    @pl.when(kj == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def matmul_int8(x, qw, *, block_n: int = 512, block_k: int = 512,
                interpret=None):
    """x [R, K] (bf16/f32) @ int8 qw [K, N] -> f32 [R, N] (unscaled)."""
    if interpret is None:
        interpret = _interpret_default()
    R, K = x.shape
    K2, N = qw.shape
    assert K == K2, (x.shape, qw.shape)
    bn = _pick_block(N, block_n)
    bk = _pick_block(K, block_k)
    assert bn and bk, (N, K)

    # pad rows to the sublane tile so tiny decode batches lower cleanly
    Rp = max(((R + 15) // 16) * 16, 16)
    if Rp != R:
        x = jnp.pad(x, ((0, Rp - R), (0, 0)))

    out = pl.pallas_call(
        _int8_kernel,
        grid=(1, N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((Rp, bk), lambda r, j, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda r, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((Rp, bn), lambda r, j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Rp, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Rp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, qw)
    return out[:R]


# ---------------------------------------------------------------------------
# int4 (split-half nibble packing, per-32-block scales)
# ---------------------------------------------------------------------------

def _int4_kernel(x_ref, qw_ref, s_ref, o_ref, acc_ref, *, bk: int):
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Mosaic has no int8 vector shifts; widen to int32 to split nibbles.
    p = qw_ref[:].astype(jnp.int32)                 # [bk//2, bn]
    lo = jnp.right_shift(jnp.left_shift(p, 28), 28)  # rows 0..15 of block
    hi = jnp.right_shift(p, 4)                       # rows 16..31
    half = INT4_BLOCK // 2
    bn = p.shape[-1]
    nb = bk // INT4_BLOCK
    lo = lo.reshape(nb, half, bn)
    hi = hi.reshape(nb, half, bn)
    w = jnp.concatenate([lo, hi], axis=1).astype(jnp.float32)  # [nb, 32, bn]
    w = w * s_ref[:].reshape(nb, 1, bn)
    w = w.reshape(bk, bn).astype(x_ref.dtype)
    acc_ref[:] += jnp.dot(
        x_ref[:], w, preferred_element_type=jnp.float32
    )

    @pl.when(kj == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def matmul_int4(x, qw, scale, *, block_n: int = 0, block_k: int = 0,
                interpret=None):
    """x [R, K] @ packed-int4 qw [K//2, N] (scale [K//32, N]) -> f32 [R, N]."""
    if interpret is None:
        interpret = _interpret_default()
    R, K = x.shape
    Kh, N = qw.shape
    assert Kh * 2 == K, (x.shape, qw.shape)
    assert scale.shape == (K // INT4_BLOCK, N), scale.shape
    Rp = max(((R + 15) // 16) * 16, 16)
    bn = block_n or _pick_block_n(N)
    # cap the K tile so the [Rp, bk] bf16 x-block stays ~<=2 MB of VMEM
    # (prefill calls this with hundreds of rows)
    bk = block_k or _pick_block_k(K, cap=min(16384, (2 << 20) // (2 * Rp)))
    assert bn and bk and bk % INT4_BLOCK == 0, (N, K)
    if Rp != R:
        x = jnp.pad(x, ((0, Rp - R), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_int4_kernel, bk=bk),
        grid=(1, N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((Rp, bk), lambda r, j, k: (0, k)),
            pl.BlockSpec((bk // 2, bn), lambda r, j, k: (k, j)),
            pl.BlockSpec((bk // INT4_BLOCK, bn), lambda r, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((Rp, bn), lambda r, j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Rp, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Rp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, qw, scale.astype(jnp.float32))
    return out[:R]
