"""Decode-attention dequant strategies, measured at the 7B serving shape.

Hypothesis (roofline): the dense int8-KV decode path dequantizes the
whole [B, S, H, D] cache slice to bf16 per layer per step. If XLA
materializes that convert (write bf16 + read bf16 ≈ 4x the int8 bytes),
decode is bound by the materialization, not the cache itself:
  measured 35.2 steps/s x ~21.5 GB/step  = ~760 GB/s  (≈ chip limit)
  int8-native                ~10.3 GB/step -> ~2x headroom

Variants (all computed as a 32-layer lax.scan, one program per step):
  dequant   current path: (int8 -> f32 * scale -> bf16) feeding the dots
  folded    scale algebra moved OUT of the big tensors: scores use the
            raw int8->bf16 convert (fusable operand) and are scaled by
            k_scale afterwards; v's scale folds into the probabilities
            (both scales are constant along their contraction dims)
  bf16      unquantized cache (upper bound / no-dequant reference)

Prints ms/step and implied HBM GB/s for each; RESULT line for chipbench.
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

B, S, H, D, L = 16, 1024, 32, 128, 32
CTX = 832  # valid context per slot (768 prompt + mid-generation)


def make_inputs(seed=0):
    """HOST arrays only: each variant device_puts just what it reads and
    frees it before the next (int8 + bf16 cache copies together are
    ~13 GB and OOM the 16 GB chip)."""
    rng = np.random.default_rng(seed)
    kq = rng.integers(-127, 128, size=(L, B, S, H, D), dtype=np.int8)
    vq = rng.integers(-127, 128, size=(L, B, S, H, D), dtype=np.int8)
    ks = (rng.random((L, B, S, H, 1), np.float32) * 0.01 + 0.001)
    vs = (rng.random((L, B, S, H, 1), np.float32) * 0.01 + 0.001)
    q = rng.standard_normal((L, B, 1, H, D), np.float32) * 0.1
    seg = np.zeros((B, S), np.int32)
    seg[:, :CTX] = 1
    return kq, ks, vq, vs, q, seg


def _masked_softmax(scores, seg):
    # scores [B,H,1,S]; seg [B,S]
    mask = (seg == 1)[:, None, None, :]
    scores = jnp.where(mask, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def attn_dequant(kq, ks, vq, vs, q, seg):
    k = (kq.astype(jnp.float32) * ks).astype(q.dtype)
    v = (vq.astype(jnp.float32) * vs).astype(q.dtype)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    p = _masked_softmax(scores / np.sqrt(D), seg)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v)


def attn_folded(kq, ks, vq, vs, q, seg):
    # k_scale is constant along D (the scores contraction): apply to the
    # [B,H,1,S] scores instead of the [B,S,H,D] keys. v_scale is constant
    # along D too but contracts over S: fold it into the probabilities.
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, kq.astype(q.dtype))
    scores = scores.astype(jnp.float32) * jnp.transpose(
        ks[..., 0], (0, 2, 1)
    )[:, :, None, :]
    p = _masked_softmax(scores / np.sqrt(D), seg)
    pv = p * jnp.transpose(vs[..., 0], (0, 2, 1))[:, :, None, :]
    return jnp.einsum("bhqk,bkhd->bqhd", pv.astype(q.dtype),
                      vq.astype(q.dtype))


def attn_bf16(k, _ks, v, _vs, q, seg):
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    p = _masked_softmax(scores / np.sqrt(D), seg)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v)


def run(fn, kq, ks, vq, vs, q, seg, *, reps=20, unroll=8):
    """One program = a 32-layer scan (unrolled {unroll}x: the tunneled
    chip charges ~390us of fixed overhead PER SCAN STEP — at unroll 1
    that's ~12 ms/step of pure tax masking any kernel difference)."""
    @jax.jit
    def step(kq, ks, vq, vs, q, seg):
        def body(acc, xs):
            kql, ksl, vql, vsl, ql = xs
            return acc + fn(kql, ksl, vql, vsl, ql, seg).astype(
                jnp.float32
            ), None
        out, _ = jax.lax.scan(
            body, jnp.zeros((B, 1, H, D), jnp.float32),
            (kq, ks, vq, vs, q), unroll=unroll,
        )
        return out

    out = step(kq, ks, vq, vs, q, seg)
    np.asarray(jax.device_get(out))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(kq, ks, vq, vs, q, seg)
    np.asarray(jax.device_get(out))
    return (time.perf_counter() - t0) / reps


def main():
    import ml_dtypes

    kq, ks, vq, vs, q, seg = make_inputs()
    int8_bytes = 2 * L * B * S * H * D + 2 * L * B * S * H * 4
    bf16_bytes = 2 * L * B * S * H * D * 2
    qd = jnp.asarray(q, jnp.bfloat16)
    segd = jnp.asarray(seg)
    res = {}
    for name, fn, host_args, nbytes in (
        ("dequant", attn_dequant, (kq, ks, vq, vs), int8_bytes),
        ("folded", attn_folded, (kq, ks, vq, vs), int8_bytes),
        ("bf16", attn_bf16,
         ((kq.astype(np.float32) * ks).astype(ml_dtypes.bfloat16), None,
          (vq.astype(np.float32) * vs).astype(ml_dtypes.bfloat16), None),
         bf16_bytes),
    ):
        args = tuple(None if a is None else jnp.asarray(a)
                     for a in host_args)
        sec = run(fn, *args, qd, segd)
        del args  # free this variant's cache copy before the next
        res[name] = {
            "ms_per_step": round(sec * 1e3, 2),
            "cache_gb_s": round(nbytes / sec / 1e9, 1),
        }
        print(f"{name:8s} {sec*1e3:8.2f} ms/step "
              f"({nbytes/sec/1e9:7.1f} GB/s of cache)", flush=True)
    # numeric agreement (same quantized inputs -> same math, fp reorder)
    kq, ks, vq, vs, q = (jnp.asarray(kq[0]), jnp.asarray(ks[0]),
                         jnp.asarray(vq[0]), jnp.asarray(vs[0]),
                         jnp.asarray(q[0], jnp.bfloat16))
    seg = segd
    a = attn_dequant(kq, ks, vq, vs, q, seg)
    b = attn_folded(kq, ks, vq, vs, q, seg)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(a.astype(jnp.float32)))) or 1.0
    res["folded_vs_dequant_relerr"] = err / ref
    print(f"folded vs dequant max rel err: {err/ref:.3e}")
    print("RESULT " + json.dumps(res))


if __name__ == "__main__":
    main()
