"""On-TPU kernel-correctness checks with a driver-visible JSON verdict.

The CI suite runs on a CPU mesh, where every Pallas kernel falls back to
its XLA reference (e.g. ops/paged_attention.py:_interpret_default) — so a
green CPU run proves nothing about the compiled TPU kernels. This tool
runs the TPU-only equality checks on the real chip and writes
``TPUCHECKS.json`` at the repo root (wired into bench.py's chain so every
round records a kernel pass/fail artifact).

Checks (kernel vs XLA reference):
  flash_fwd          Pallas flash attention fwd (causal, segment ids, GQA)
  flash_alibi        fwd with ALiBi slopes (MPT path)
  flash_bwd          fused Pallas dk/dv + dq backward
  decode_dense       dense flash-decode kernel (bf16 + int8 cache)
  paged_decode       manual-DMA paged kernel (bf16 + int8, self block)
  paged_multitoken   paged kernel with Tq > 1 (speculative verify path)
  int8_matmul        quantized matmul vs fp32 reference
  int4_matmul        Pallas int4 matvec vs fp32 reference
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _rand(shape, seed, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32), dtype)


def _maxerr(a, b):
    """Max abs error normalized by the reference RMS: both sides run
    bf16 MXU matmuls with different blocking/reduction orders, so the
    meaningful bound is relative to the signal magnitude."""
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    rms = jnp.sqrt(jnp.mean(bf * bf)) + 1e-12
    return float(jnp.max(jnp.abs(af - bf)) / rms)


def check_flash_fwd():
    from llava_plus_tpu.ops.attention import xla_attention
    from llava_plus_tpu.ops.flash_attention import flash_attention

    B, T, H, Hkv, D = 2, 512, 8, 4, 64
    q = _rand((B, T, H, D), 0)
    k = _rand((B, T, Hkv, D), 1)
    v = _rand((B, T, Hkv, D), 2)
    seg = jnp.asarray(
        (np.arange(T)[None] < np.array([T, T - 100])[:, None]).astype(np.int32)
    )
    got = flash_attention(q, k, v, causal=True,
                          q_segment_ids=seg, kv_segment_ids=seg)
    ref = xla_attention(q, k, v, causal=True,
                        q_segment_ids=seg, kv_segment_ids=seg)
    # padding rows are don't-care
    m = seg[:, :, None, None].astype(jnp.float32)
    return _maxerr(got * m, ref * m), 2e-2


def check_flash_alibi():
    from llava_plus_tpu.ops.attention import xla_attention
    from llava_plus_tpu.models.mpt import alibi_bias_from_positions
    from llava_plus_tpu.ops.flash_attention import flash_attention

    B, T, H, D = 2, 256, 8, 64
    q = _rand((B, T, H, D), 3)
    k = _rand((B, T, H, D), 4)
    v = _rand((B, T, H, D), 5)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    bias = alibi_bias_from_positions(pos, pos, H)
    got = flash_attention(q, k, v, causal=True, alibi_nheads=H)
    ref = xla_attention(q, k, v, causal=True, bias=bias)
    return _maxerr(got, ref), 2e-2


def check_flash_bwd():
    from llava_plus_tpu.ops.attention import xla_attention
    from llava_plus_tpu.ops.flash_attention import flash_attention

    B, T, H, D = 2, 256, 4, 64
    q = _rand((B, T, H, D), 6)
    k = _rand((B, T, H, D), 7)
    v = _rand((B, T, H, D), 8)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal=True) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    return max(_maxerr(a, b) for a, b in zip(gf, gr)), 5e-2


def check_decode_dense(quantized):
    from llava_plus_tpu.ops.attention import xla_attention
    from llava_plus_tpu.ops.decode_attention import decode_attention

    B, S, H, Hkv, D = 4, 512, 8, 8, 64
    q = _rand((B, 1, H, D), 9)
    k = _rand((B, Hkv, S, D), 10)
    v = _rand((B, Hkv, S, D), 11)
    seg = jnp.asarray(
        (np.arange(S)[None] < np.array([S, 300, 17, 1])[:, None])
        .astype(np.int32)
    )
    ks = vs = None
    kd, vd = k, v
    if quantized:
        def q8(a):
            s = jnp.max(jnp.abs(a), axis=-1, keepdims=True) / 127.0
            return (jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8),
                    s.astype(jnp.float32))
        kq, ks = q8(k)
        vq, vs = q8(v)
        kd = kq.astype(jnp.float32) * ks
        vd = vq.astype(jnp.float32) * vs
        k, v = kq, vq
    got = decode_attention(q, k, v, seg, ks, vs, interpret=False)
    ref = xla_attention(
        q, jnp.swapaxes(kd, 1, 2), jnp.swapaxes(vd, 1, 2), causal=False,
        q_segment_ids=jnp.ones((B, 1), jnp.int32), kv_segment_ids=seg,
    )
    return _maxerr(got, ref), 5e-2 if quantized else 2e-3


def _paged_setup(seed, quantized, n_cur=1):
    rng = np.random.default_rng(seed)
    B, NP, Hkv, P, D, H = 4, 24, 4, 128, 128, 8
    maxp = 4
    kv = rng.standard_normal((NP, 2, Hkv, P, D)).astype(np.float32)
    pt = jnp.asarray(rng.permutation(NP)[: B * maxp].reshape(B, maxp)
                     .astype(np.int32))
    lengths = jnp.asarray([P * maxp - 3, 2 * P, 5, 0], jnp.int32)
    scale = None
    if quantized:
        s = np.abs(kv).max(axis=-1) / 127.0 + 1e-8
        kvq = np.clip(np.round(kv / s[..., None]), -127, 127).astype(np.int8)
        scale = jnp.asarray(s.astype(np.float32))
        kv_dev = jnp.asarray(kvq)
    else:
        kv_dev = jnp.asarray(kv, jnp.bfloat16)
    q = _rand((B, n_cur, H, D), seed + 1)
    ck = _rand((B, n_cur, Hkv, D), seed + 2)
    cv = _rand((B, n_cur, Hkv, D), seed + 3)
    return q, kv_dev, pt, lengths, scale, ck, cv


def check_paged_decode(quantized):
    from llava_plus_tpu.ops.paged_attention import (
        paged_attention_reference, paged_decode_attention,
    )

    q, kv, pt, lens, scale, ck, cv = _paged_setup(20, quantized)
    valid = jnp.asarray([1, 1, 1, 0], jnp.int32)
    got = paged_decode_attention(q, kv, pt, lens, scale, cur_k=ck, cur_v=cv,
                                 cur_valid=valid, interpret=False)
    ref = paged_attention_reference(q, kv, pt, lens, scale, cur_k=ck,
                                    cur_v=cv, cur_valid=valid)
    return _maxerr(got, ref), 5e-2 if quantized else 2e-3


def check_paged_multitoken(quantized):
    from llava_plus_tpu.ops.paged_attention import (
        paged_attention_reference, paged_decode_attention,
    )

    k1 = 4  # verify chunk: current token + 3 proposals
    q, kv, pt, lens, scale, ck, cv = _paged_setup(30, quantized, n_cur=k1)
    counts = jnp.asarray([4, 2, 1, 0], jnp.int32)  # valid-prefix lengths
    got = paged_decode_attention(q, kv, pt, lens, scale, cur_k=ck, cur_v=cv,
                                 cur_valid=counts, interpret=False)
    ref = paged_attention_reference(q, kv, pt, lens, scale, cur_k=ck,
                                    cur_v=cv, cur_valid=counts)
    m = (jnp.arange(k1)[None] < counts[:, None]).astype(jnp.float32)
    m = m[:, :, None, None]
    return _maxerr(got * m, ref * m), 5e-2 if quantized else 2e-3


def check_quant_matmul(bits):
    from llava_plus_tpu.ops.quant import (
        dequantize_array, matmul, quantize_array, quantize_array_int4,
    )

    K, N = 512, 1024
    w = _rand((K, N), 40) * 0.02
    x = _rand((4, K), 41, jnp.bfloat16)
    qw = quantize_array_int4(w) if bits == 4 else quantize_array(w)
    got = matmul(x, qw).astype(jnp.float32)
    ref = jnp.dot(x.astype(jnp.float32),
                  dequantize_array(qw, jnp.float32))
    return _maxerr(got, ref), 0.05


CHECKS = [
    ("flash_fwd", check_flash_fwd),
    ("flash_alibi", check_flash_alibi),
    ("flash_bwd", check_flash_bwd),
    ("decode_dense_bf16", lambda: check_decode_dense(False)),
    ("decode_dense_int8", lambda: check_decode_dense(True)),
    ("paged_decode_bf16", lambda: check_paged_decode(False)),
    ("paged_decode_int8", lambda: check_paged_decode(True)),
    ("paged_multitoken_bf16", lambda: check_paged_multitoken(False)),
    ("paged_multitoken_int8", lambda: check_paged_multitoken(True)),
    ("int8_matmul", lambda: check_quant_matmul(8)),
    ("int4_matmul", lambda: check_quant_matmul(4)),
]


def main(out_path=None):
    platform = jax.devices()[0].platform
    results = {}
    ok = True
    for name, fn in CHECKS:
        t0 = time.time()
        try:
            err, tol = fn()
            passed = err < tol
            results[name] = {
                "pass": bool(passed), "max_err": round(err, 6), "tol": tol,
                "sec": round(time.time() - t0, 1),
            }
            if not passed:
                ok = False
        except Exception as e:
            ok = False
            results[name] = {"pass": False, "error": f"{type(e).__name__}: {e}"}
            traceback.print_exc(file=sys.stderr)
        status = "PASS" if results[name].get("pass") else "FAIL"
        print(f"  {name:24s} {status}  {results[name]}", file=sys.stderr)
    verdict = {
        "platform": platform,
        "on_tpu": platform == "tpu",
        "all_pass": bool(ok),
        "checks": results,
    }
    out_path = out_path or os.path.join(REPO, "TPUCHECKS.json")
    with open(out_path, "w") as f:
        json.dump(verdict, f, indent=1)
    print(json.dumps({"tpu_checks": "pass" if ok else "fail",
                      "platform": platform}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))
