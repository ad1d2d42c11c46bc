"""On-TPU kernel-correctness checks with a driver-visible JSON verdict.

The CI suite runs on a CPU mesh, where every Pallas kernel falls back to
its XLA reference (e.g. ops/paged_attention.py:_interpret_default) — so a
green CPU run proves nothing about the compiled TPU kernels. This tool
runs the TPU-only equality checks on the real chip and writes
``TPUCHECKS.json`` at the repo root (wired into bench.py's chain so every
round records a kernel pass/fail artifact).

Pass criterion: on TPU both the Pallas kernel and the XLA production path
run their matmuls at default precision (bf16 MXU passes), so absolute
kernel-vs-XLA thresholds only measure blocking noise. Instead each check
computes a ground truth with ``jax.default_matmul_precision("float32")``
and passes iff

    err(kernel, truth) <= max(RATIO * err(xla, truth), FLOOR)

i.e. the kernel is as accurate as the XLA implementation it replaces
(errors are max-abs normalized by the truth RMS).

Checks:
  flash_fwd          Pallas flash attention fwd (causal, segment ids, GQA)
  flash_alibi        fwd with ALiBi slopes (MPT path)
  flash_bwd          fused Pallas dk/dv + dq backward
  decode_dense       dense flash-decode kernel (bf16 + int8 cache)
  paged_decode       manual-DMA paged kernel (bf16 + int8, self block)
  paged_multitoken   paged kernel with Tq > 1 (speculative verify path)
  paged_alibi        paged kernel with ALiBi slopes (MPT serving path)
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

# Persistent compile cache (also set by bench.py for its subprocesses):
# round 4's flash_fwd check spent 755 s in XLA compilation alone; cached,
# the whole suite reruns in a few minutes.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.join(REPO, ".xla_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

RATIO = 2.5   # kernel may be at most this factor noisier than XLA
FLOOR = 2e-3  # and never fails under this normalized error


def _rand(shape, seed, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32), dtype)


def _err(a, b, mask=None):
    """Max abs error normalized by the reference RMS."""
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    if mask is not None:
        af = af * mask
        bf = bf * mask
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
    kw = dict(causal=True, q_segment_ids=seg, kv_segment_ids=seg)
    got = flash_attention(q, k, v, **kw)
    ref = xla_attention(q, k, v, **kw)
    with jax.default_matmul_precision("float32"):
        truth = xla_attention(q, k, v, **kw)
    m = seg[:, :, None, None].astype(jnp.float32)  # padding: don't-care
    return got, ref, truth, m


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
    with jax.default_matmul_precision("float32"):
        truth = xla_attention(q, k, v, causal=True, bias=bias)
    return got, ref, truth, None


def check_flash_packed():
    """Multi-segment (packed-training) ids through fwd AND bwd — the
    shape --pack-sequences trains with (data/packing.py)."""
    from llava_plus_tpu.ops.attention import xla_attention
    from llava_plus_tpu.ops.flash_attention import flash_attention

    B, T, H, D = 2, 512, 4, 64
    q = _rand((B, T, H, D), 9)
    k = _rand((B, T, H, D), 10)
    v = _rand((B, T, H, D), 11)
    # three packed samples per row + trailing padding (segment id 0)
    bounds = np.array([200, 360, 480])
    seg_row = np.searchsorted(bounds, np.arange(T), side="right") + 1
    seg_row[480:] = 0
    seg = jnp.asarray(np.broadcast_to(seg_row, (B, T)).astype(np.int32))
    kw = dict(causal=True, q_segment_ids=seg, kv_segment_ids=seg)
    # cotangent masked at padding rows: XLA's fully-masked rows output
    # mean(v) (uniform softmax) while the kernel zeroes them; real losses
    # never read padding rows (see tests/test_flash_attention.py)
    m = (seg != 0)[:, :, None, None].astype(jnp.float32)

    def loss(fn):
        return lambda q, k, v: jnp.sum((fn(q, k, v, **kw) * m) ** 2)

    gf = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(xla_attention), argnums=(0, 1, 2))(q, k, v)
    with jax.default_matmul_precision("float32"):
        gt = jax.grad(loss(xla_attention), argnums=(0, 1, 2))(q, k, v)
    errs = [(_err(a, t), _err(b, t)) for a, b, t in zip(gf, gr, gt)]
    return max(errs, key=lambda p: p[0] / (p[1] + 1e-9))


def check_flash_bwd():
    from llava_plus_tpu.ops.attention import xla_attention
    from llava_plus_tpu.ops.flash_attention import flash_attention

    B, T, H, D = 2, 256, 4, 64
    q = _rand((B, T, H, D), 6)
    k = _rand((B, T, H, D), 7)
    v = _rand((B, T, H, D), 8)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v, causal=True) ** 2)

    gf = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(xla_attention), argnums=(0, 1, 2))(q, k, v)
    with jax.default_matmul_precision("float32"):
        gt = jax.grad(loss(xla_attention), argnums=(0, 1, 2))(q, k, v)
    # report the worst input-gradient error pair
    errs = [( _err(a, t), _err(b, t)) for a, b, t in zip(gf, gr, gt)]
    return max(errs, key=lambda p: p[0] / (p[1] + 1e-9))


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
    got = decode_attention(q, k, v, seg, ks, vs)
    kw = dict(causal=False, q_segment_ids=jnp.ones((B, 1), jnp.int32),
              kv_segment_ids=seg)
    ref = xla_attention(q, jnp.swapaxes(kd, 1, 2), jnp.swapaxes(vd, 1, 2),
                        **kw)
    with jax.default_matmul_precision("float32"):
        truth = xla_attention(q, jnp.swapaxes(kd, 1, 2),
                              jnp.swapaxes(vd, 1, 2), **kw)
    return got, ref, truth, None


def _paged_setup(seed, quantized, n_cur=1, Hkv=4, H=8):
    rng = np.random.default_rng(seed)
    B, NP, P, D = 4, 24, 128, 128
    maxp = 4
    kv = rng.standard_normal((NP, 2, P, Hkv, D)).astype(np.float32)
    pt = jnp.asarray(rng.permutation(NP)[: B * maxp].reshape(B, maxp)
                     .astype(np.int32))
    lengths = jnp.asarray([P * maxp - 3, 2 * P, 5, 0], jnp.int32)
    scale = None
    if quantized:
        s = np.abs(kv).max(axis=-1) / 127.0 + 1e-8  # [NP, 2, P, Hkv]
        kvq = np.clip(np.round(kv / s[..., None]), -127, 127).astype(np.int8)
        # head-major scale pages [NP, 2, Hkv, P]
        scale = jnp.asarray(s.transpose(0, 1, 3, 2).astype(np.float32))
        kv_dev = jnp.asarray(kvq)
    else:
        kv_dev = jnp.asarray(kv, jnp.bfloat16)
    q = _rand((B, n_cur, H, D), seed + 1)
    ck = _rand((B, n_cur, Hkv, D), seed + 2)
    cv = _rand((B, n_cur, Hkv, D), seed + 3)
    return q, kv_dev, pt, lengths, scale, ck, cv


def _paged_pair(q, kv, pt, lens, scale, ck, cv, valid, slopes=None):
    from llava_plus_tpu.ops.paged_attention import (
        paged_attention_reference, paged_decode_attention,
    )

    got = paged_decode_attention(q, kv, pt, lens, scale, cur_k=ck, cur_v=cv,
                                 cur_valid=valid, alibi_slopes=slopes)
    ref = paged_attention_reference(q, kv, pt, lens, scale, cur_k=ck,
                                    cur_v=cv, cur_valid=valid,
                                    alibi_slopes=slopes)
    with jax.default_matmul_precision("float32"):
        truth = paged_attention_reference(q, kv, pt, lens, scale, cur_k=ck,
                                          cur_v=cv, cur_valid=valid,
                                          alibi_slopes=slopes)
    return got, ref, truth


def check_paged_decode(quantized):
    q, kv, pt, lens, scale, ck, cv = _paged_setup(20, quantized)
    valid = jnp.asarray([1, 1, 1, 0], jnp.int32)
    got, ref, truth = _paged_pair(q, kv, pt, lens, scale, ck, cv, valid)
    m = valid[:, None, None, None].astype(jnp.float32)
    return got, ref, truth, m


def check_paged_multitoken(quantized):
    k1 = 4  # verify chunk: current token + 3 proposals
    q, kv, pt, lens, scale, ck, cv = _paged_setup(30, quantized, n_cur=k1)
    counts = jnp.asarray([4, 2, 1, 0], jnp.int32)  # valid-prefix lengths
    got, ref, truth = _paged_pair(q, kv, pt, lens, scale, ck, cv, counts)
    m = (jnp.arange(k1)[None] < counts[:, None]).astype(jnp.float32)
    return got, ref, truth, m[:, :, None, None]


def check_paged_alibi():
    from llava_plus_tpu.models.mpt import alibi_slopes

    q, kv, pt, lens, scale, ck, cv = _paged_setup(50, False, n_cur=2)
    counts = jnp.asarray([2, 2, 1, 0], jnp.int32)
    slopes = alibi_slopes(q.shape[2])
    got, ref, truth = _paged_pair(q, kv, pt, lens, scale, ck, cv, counts,
                                  slopes=slopes)
    m = (jnp.arange(2)[None] < counts[:, None]).astype(jnp.float32)
    return got, ref, truth, m[:, :, None, None]


def check_paged_alibi_nocur(mha):
    """ALiBi decode with NO current chunk: the query's own KV is already
    pooled, so its position is lengths-1 (regression for the one-token
    bias offset fixed in round 5 — kernels previously used `length`).
    mha=True drives the token-major fast kernel (_kernel_decode1, the
    production llama MHA decode path); mha=False the general GQA kernel."""
    from llava_plus_tpu.models.mpt import alibi_slopes
    from llava_plus_tpu.ops.paged_attention import (
        paged_attention_reference, paged_decode_attention,
    )

    heads = dict(Hkv=8, H=8) if mha else dict(Hkv=4, H=8)
    q, kv, pt, lens, scale, _, _ = _paged_setup(60, False, **heads)
    lens = jnp.maximum(lens, 1)  # every slot has >= 1 pooled token
    slopes = alibi_slopes(q.shape[2])
    kw = dict(cur_k=None, cur_v=None, cur_valid=None, alibi_slopes=slopes)
    got = paged_decode_attention(q, kv, pt, lens, scale, **kw)
    ref = paged_attention_reference(q, kv, pt, lens, scale, **kw)
    with jax.default_matmul_precision("float32"):
        truth = paged_attention_reference(q, kv, pt, lens, scale, **kw)
    return got, ref, truth, None


def check_quant_cache_attention(groups):
    """Folded-scale int8-cache decode attention (the r5 serving headline's
    hot path, ops/attention.py:quant_cache_attention) vs dequantize-then-
    attend ON THE CHIP: the fold feeds raw int8 to the MXU as a fused bf16
    convert, which only the TPU compile path exercises."""
    from llava_plus_tpu.ops.attention import (
        quant_cache_attention, xla_attention,
    )

    B, S, Hkv, D, Tq = 4, 512, 8, 128, 1
    H = Hkv * groups
    q = (_rand((B, Tq, H, D), 70) * 0.5).astype(jnp.bfloat16)
    k = _rand((B, S, Hkv, D), 71) * 0.5
    v = _rand((B, S, Hkv, D), 72) * 0.5

    def q8(a):
        s = jnp.max(jnp.abs(a), axis=-1, keepdims=True) / 127.0 + 1e-8
        return (jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8),
                s.astype(jnp.float32))

    kq, ks = q8(k)
    vq, vs = q8(v)
    ctx = np.array([S, 300, 17, 1])
    seg = jnp.asarray((np.arange(S)[None] < ctx[:, None]).astype(np.int32))
    pos = jnp.asarray(ctx - 1, jnp.int32)[:, None]
    got = quant_cache_attention(
        q, kq, ks, vq, vs, kv_segment_ids=seg, q_positions=pos,
    )
    kw = dict(causal=True, q_segment_ids=jnp.ones((B, Tq), jnp.int32),
              kv_segment_ids=seg, q_positions=pos)
    kd = kq.astype(jnp.float32) * ks
    vd = vq.astype(jnp.float32) * vs
    ref = xla_attention(q, kd, vd, **kw)
    with jax.default_matmul_precision("float32"):
        truth = xla_attention(q.astype(jnp.float32), kd, vd, **kw)
    return got, ref, truth, None


def check_quant_matmul(bits):
    from llava_plus_tpu.ops.quant import (
        dequantize_array, matmul, quantize_array, quantize_array_int4,
    )

    K, N = 512, 1024
    w = _rand((K, N), 40) * 0.02
    x = _rand((4, K), 41, jnp.bfloat16)
    qw = quantize_array_int4(w) if bits == 4 else quantize_array(w)
    got = matmul(x, qw).astype(jnp.float32)
    # ref = the XLA production path the kernel replaces: dequantize to the
    # activation dtype (bf16) and matmul at default precision
    ref = jnp.dot(x, dequantize_array(qw, x.dtype)).astype(jnp.float32)
    with jax.default_matmul_precision("float32"):
        truth = jnp.dot(x.astype(jnp.float32),
                        dequantize_array(qw, jnp.float32))
    return got, ref, truth, None


CHECKS = [
    ("flash_fwd", check_flash_fwd),
    ("flash_alibi", check_flash_alibi),
    ("flash_bwd", check_flash_bwd),
    ("flash_packed", check_flash_packed),
    ("decode_dense_bf16", lambda: check_decode_dense(False)),
    ("decode_dense_int8", lambda: check_decode_dense(True)),
    ("paged_decode_bf16", lambda: check_paged_decode(False)),
    ("paged_decode_int8", lambda: check_paged_decode(True)),
    ("paged_multitoken_bf16", lambda: check_paged_multitoken(False)),
    ("paged_multitoken_int8", lambda: check_paged_multitoken(True)),
    ("paged_alibi", check_paged_alibi),
    ("paged_alibi_nocur_mha", lambda: check_paged_alibi_nocur(True)),
    ("paged_alibi_nocur_gqa", lambda: check_paged_alibi_nocur(False)),
    ("quant_cache_attn_mha", lambda: check_quant_cache_attention(1)),
    ("quant_cache_attn_gqa", lambda: check_quant_cache_attention(4)),
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
            out = fn()
            if len(out) == 2:                 # (err_kernel, err_xla)
                err_k, err_x = out
                bf16_floor = 0.0
            else:
                got, ref, truth, m = out
                err_k = _err(got, truth, m)
                err_x = _err(ref, truth, m)
                # A kernel that computes through bf16 (MXU operands,
                # bf16 intermediates) cannot be expected to beat the
                # bf16 representation noise of the answer itself. When
                # the XLA reference happens to compile entirely in f32
                # (err_x == 0, e.g. paged_alibi_nocur_mha: upcast
                # einsums), RATIO*err_x collapses to the scalar FLOOR,
                # which is tighter than bf16 — measure the floor from
                # the truth instead of hardcoding it.
                bf16_floor = 1.5 * _err(
                    truth.astype(jnp.bfloat16), truth, m)
            tol = max(RATIO * err_x, FLOOR, bf16_floor)
            passed = err_k <= tol
            results[name] = {
                "pass": bool(passed),
                "kernel_err": round(err_k, 6),
                "xla_err": round(err_x, 6),
                "tol": round(tol, 6),
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
        "criterion": f"kernel_err <= max({RATIO} * xla_err, {FLOOR}) "
                     "vs f32-precision ground truth",
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
