"""Weight-only int8 / int4 quantization for serving and QLoRA.

Decode is HBM-bandwidth-bound: every step streams the full weight set.
Symmetric per-output-channel int8 halves the bytes (13.5 GB -> 6.8 GB for
7B); blockwise int4 (packed nibbles) quarters them. The reference reaches
8/4-bit through bitsandbytes CUDA kernels (``llava/model/builder.py:32-41``);
this is the TPU-native equivalent.

A quantized matrix is a dict — int8: {"qvalue": int8 [..., in, out],
"scale": f32 [..., 1, out]}; int4: {"qvalue4": int8 [..., in/2, out],
"scale": f32 [..., in/32, out]} — and ``matmul`` dispatches on leaf type so
model code is unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

QKEY = "qvalue"
Q4KEY = "qvalue4"
SKEY = "scale"

# Block length (along the input/contraction dim) for int4 quantization.
# 32 matches the QLoRA/NF4 granularity the reference reaches through
# bitsandbytes ``load_in_4bit`` (``llava/model/builder.py:32-41``).
INT4_BLOCK = 32


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and (QKEY in w or Q4KEY in w)


@jax.jit
def quantize_array(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel (last dim) int8.

    Jitted so the fp32 intermediates fuse away — eager quantization of a
    stacked 7B tensor would materialize a ~6 GB fp32 copy.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {QKEY: q, SKEY: scale.astype(jnp.float32)}


@jax.jit
def quantize_array_int4(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric blockwise int4 (block=INT4_BLOCK along the contraction dim).

    The TPU-native analogue of the reference's bitsandbytes 4-bit load
    (``builder.py:32-41``): ~4.5 bits/weight resident in HBM (two nibbles
    packed per int8 + one f32 scale per 32-block), streamed and dequantized
    inside the matmul. Packed int8 is used rather than the jnp.int4 dtype —
    int4 jit arguments trip relayout bugs on the CPU backend. Stored FLAT as
    ``{"qvalue4": int8 [..., in/2, out], "scale": f32 [..., in/B, out]}`` —
    flat because TPU tiling pads small trailing-2D dims (a [.., 16, N] int8
    tile pads its sublane dim to 32, and a size-1 dim pads to 8), which
    would double/8x the resident footprint. The input dim must divide
    INT4_BLOCK (true for every transformer matrix we quantize).

    Within each 32-row block the packing is split-half: low nibble = rows
    0..15, high nibble = rows 16..31 (so unpack is one sublane concat, no
    interleave — see ops/quant_matmul.py).
    """
    *lead, d_in, d_out = w.shape
    assert d_in % INT4_BLOCK == 0, (d_in, INT4_BLOCK)
    wf = w.astype(jnp.float32).reshape(*lead, d_in // INT4_BLOCK, INT4_BLOCK, d_out)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    half = INT4_BLOCK // 2
    lo = q[..., :half, :] & 0x0F
    hi = (q[..., half:, :] & 0x0F) << 4
    packed = (lo | hi).astype(jnp.int8)
    return {
        Q4KEY: packed.reshape(*lead, d_in // 2, d_out),
        SKEY: scale.astype(jnp.float32).reshape(*lead, d_in // INT4_BLOCK, d_out),
    }


def _unpack_int4(packed: jax.Array) -> jax.Array:
    """flat int8 [..., in/2, out] -> int8 [..., in/B, B, out] (sign-ext)."""
    *lead, half_in, d_out = packed.shape
    nb = half_in * 2 // INT4_BLOCK
    p = packed.reshape(*lead, nb, INT4_BLOCK // 2, d_out)
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)
    hi = jnp.right_shift(p, 4)
    return jnp.concatenate([lo, hi], axis=-2)


def dequantize_array(qw: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    if Q4KEY in qw:
        unpacked = _unpack_int4(qw[Q4KEY]).astype(jnp.float32)
        *lead, nb, b, d_out = unpacked.shape
        scale = qw[SKEY].reshape(*lead, nb, 1, d_out)
        wf = unpacked * scale
        return wf.reshape(*lead, nb * b, d_out).astype(dtype)
    return (qw[QKEY].astype(jnp.float32) * qw[SKEY]).astype(dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# --- W8A8: int8 activations x int8 weights on the MXU's int8 path -------
#
# The v5e MXU runs int8xint8->int32 at 2x its bf16 FLOPs (394 vs 197
# TOPS). Prefill and training matmuls are FLOP-bound (rows = B*T in the
# thousands), so quantizing the ACTIVATIONS per token (dynamic symmetric
# absmax, the vLLM/SmoothQuant "w8a8 dynamic" recipe) halves their MXU
# time; decode matvecs (rows ~ B) stay on the weight-only path — they are
# bandwidth-bound and the per-token quant would cost more than it saves.
#
# Opt-in (LLAVA_W8A8=1 or set_w8a8(True)): per-token absmax int8 carries
# ~0.4% RMS error per matmul on typical activations but is sensitive to
# outlier channels on real checkpoints — measure your eval before
# enabling in production. Read at TRACE time: set it before the engine /
# train step compiles.
_W8A8 = None  # tri-state: None = read env, True/False = explicit
_W8A8_MIN_ROWS = 256


def set_w8a8(enabled: bool) -> None:
    """Explicitly enable/disable W8A8 large-matmul quantization (overrides
    the LLAVA_W8A8 env var). Call before the programs that should use it
    are traced."""
    global _W8A8
    _W8A8 = bool(enabled)


def w8a8_enabled() -> bool:
    if _W8A8 is not None:
        return _W8A8
    import os

    return os.environ.get("LLAVA_W8A8", "0") == "1"


def _w8a8_matmul(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """[rows, K] x int8 [K, N] with per-row dynamic int8 activations.

    out = (xq @ q) * x_scale[:, None] * w_scale[None, :] — the int32
    accumulator comes straight off the MXU; both scale multiplies fuse
    into its epilogue."""
    lead, K = x.shape[:-1], x.shape[-1]
    x2 = x.reshape(-1, K)
    amax = jnp.maximum(jnp.max(jnp.abs(x2), axis=-1, keepdims=True), 1e-6)
    inv = 127.0 / amax.astype(jnp.float32)
    xq = jnp.clip(
        jnp.round(x2.astype(jnp.float32) * inv), -127, 127
    ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = (acc.astype(jnp.float32)
           * (amax / 127.0)
           * scale.reshape(1, scale.shape[-1]))
    return out.reshape(*lead, q.shape[-1]).astype(x.dtype)


LORA_A = "lora_a"
LORA_B = "lora_b"
WKEY = "w"


def matmul(x: jax.Array, w) -> jax.Array:
    """x @ w for plain or quantized w. Dequant fuses into the matmul: the
    int8/int4 tensor is the HBM-resident operand.

    int8 uses the XLA dense path everywhere (`x @ q.astype(bf16)` — XLA
    streams the int8 and fuses the convert; measured faster than a hand
    kernel at these shapes). int4 uses the Pallas kernel for decode-sized
    row counts (XLA's unpack graph is ~2x slower there) and the dense path
    for prefill/training rows, where the matmul is compute-bound.

    A dict carrying ``lora_a``/``lora_b`` (see train/lora.py lazy attach) is
    computed as ``x @ base + (x @ a) @ b`` — the QLoRA hot path: the frozen
    base never materializes in bf16 (the reference's bitsandbytes 4-bit
    forward has the same property), which is what lets a 7B QLoRA step fit
    a single 16 GB chip.
    """
    if isinstance(w, dict) and LORA_A in w:
        base = {k: v for k, v in w.items() if k not in (LORA_A, LORA_B)}
        if WKEY in base:
            base = base[WKEY]
        y = matmul(x, base)
        a = w[LORA_A].astype(x.dtype)
        b = w[LORA_B].astype(x.dtype)  # pre-scaled by alpha/r at attach time
        xa = jnp.dot(x, a, preferred_element_type=jnp.float32).astype(x.dtype)
        delta = jnp.dot(xa, b, preferred_element_type=jnp.float32)
        return y + delta.astype(y.dtype)
    if not is_quantized(w):
        return x @ w

    lead, K = x.shape[:-1], x.shape[-1]
    rows = 1
    for d in lead:
        rows *= d

    if Q4KEY in w:
        q, s = w[Q4KEY], w[SKEY]
        # Kernel for decode-sized row counts (bandwidth-bound); prefill and
        # training row counts go through the dense XLA path, where the
        # dequant is a per-layer transient and the matmul is compute-bound.
        # LLAVA_INT4_KERNEL=0 forces the dense path everywhere (perf A/B).
        import os

        use_kernel = os.environ.get("LLAVA_INT4_KERNEL", "1") != "0"
        if use_kernel and _on_tpu() and q.ndim == 2 and rows <= 256:
            from llava_plus_tpu.ops import quant_matmul

            N = q.shape[-1]
            rp = max(((rows + 15) // 16) * 16, 16)
            if (quant_matmul._pick_block_n(N)
                    and quant_matmul._pick_block_k(
                        K, cap=min(16384, (2 << 20) // (2 * rp)))):
                out = quant_matmul.matmul_int4(x.reshape(rows, K), q, s)
                return out.reshape(*lead, N).astype(x.dtype)
        return x @ dequantize_array(w, x.dtype)

    if (w[QKEY].ndim == 2 and rows >= _W8A8_MIN_ROWS and w8a8_enabled()
            and jnp.issubdtype(x.dtype, jnp.floating)):
        return _w8a8_matmul(x, w[QKEY], w[SKEY])
    wq = w[QKEY].astype(x.dtype)
    out = x @ wq
    return out * w[SKEY].reshape(w[SKEY].shape[-1]).astype(out.dtype)


# Paths of the LLaMA matrices worth quantizing (stacked [L, in, out]).
LLAMA_QUANT_PATHS = (
    ("layers", "attn", "wq"),
    ("layers", "attn", "wk"),
    ("layers", "attn", "wv"),
    ("layers", "attn", "wo"),
    ("layers", "mlp", "w_gate"),
    ("layers", "mlp", "w_up"),
    ("layers", "mlp", "w_down"),
    ("lm_head",),
)

MPT_QUANT_PATHS = (
    ("layers", "attn", "wqkv"),
    ("layers", "attn", "out_proj"),
    ("layers", "mlp", "up_proj"),
    ("layers", "mlp", "down_proj"),
)


def _get(tree, path):
    for p in path:
        if p not in tree:
            return None
        tree = tree[p]
    return tree


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def quantize_lm_params(lm_params, paths: Sequence = LLAMA_QUANT_PATHS,
                       in_place: bool = True, bits: int = 8):
    """Replace the listed matrices with int8 (or blockwise int4) dicts.
    Norms/embeddings stay bf16.

    ``in_place=True`` (default) mutates the tree and frees each bf16 tensor
    as soon as its int8 replacement exists — without this, a 7B model needs
    ~20 GB transient HBM (bf16 + int8 copies) and OOMs a 16 GB chip.
    """
    if not in_place:
        def copy_dicts(t):
            if isinstance(t, dict):
                return {k: copy_dicts(v) for k, v in t.items()}
            return t

        lm_params = copy_dicts(lm_params)
    assert bits in (4, 8), bits
    quantize = quantize_array if bits == 8 else quantize_array_int4

    def materialize(x):
        # Deferred-execution runtimes (axon tunnel) do NOT block in
        # block_until_ready; fetching a value is the only reliable barrier.
        # Without it every quantize program executes lazily at the first
        # forward, so the full bf16 model + all quantize transients coexist
        # (OOM at 7B); with it, peak memory is one tensor's transients.
        jax.device_get(jnp.ravel(x)[0])

    for path in paths:
        w = _get(lm_params, path)
        if w is None:
            continue
        if bits == 4 and w.ndim == 3:
            # chunk stacked [L, K, N] tensors layer-by-layer: the int4
            # quantizer's fp32 intermediate would otherwise be 4x the
            # tensor (5.8 GB for a 7B MLP stack)
            parts = [quantize_array_int4(w[i]) for i in range(w.shape[0])]
            q = {
                Q4KEY: jnp.stack([p[Q4KEY] for p in parts]),
                SKEY: jnp.stack([p[SKEY] for p in parts]),
            }
        else:
            q = quantize(w)
        _set(lm_params, path, q)
        del w
        materialize(q[QKEY if bits == 8 else Q4KEY])
    return lm_params


def fuse_llama_matrices(lm_params):
    """Fuse wq/wk/wv -> wqkv and w_gate/w_up -> w_gateup (output-dim
    concat; exact — per-output-channel/block quantization is independent
    per column, so already-quantized dicts concat leaf-by-leaf).

    Inference-only: with quantized weights each matmul is a Pallas kernel
    launch, and the per-call overhead of 7 launches per layer costs more
    than the matmuls at decode row counts. Fusing drops it to 4. QKV fuses
    only for MHA (equal head counts) so tp sharding of the output dim
    stays aligned. LoRA/QLoRA training keeps the unfused layout (adapters
    attach to the individual matrices). Call AFTER quantization: fusing
    int4/int8 dicts peaks at the quantized size, not the bf16 model's.
    """
    def materialize(x):
        # deferred-execution runtimes: force the concat to run NOW so the
        # popped source tensors actually free before the next fuse
        jax.device_get(jnp.ravel(jax.tree.leaves(x)[0])[0])
        return x

    def cat(parts):
        if is_quantized(parts[0]):
            keys = parts[0].keys()
            return {k: jnp.concatenate([p[k] for p in parts], axis=-1)
                    for k in keys}
        return jnp.concatenate(parts, axis=-1)

    def shape(w):
        return w[QKEY if QKEY in w else Q4KEY].shape if is_quantized(w) \
            else w.shape

    attn = lm_params["layers"]["attn"]
    if ("wq" in attn and shape(attn["wq"]) == shape(attn["wk"])):
        attn["wqkv"] = materialize(cat(
            [attn.pop("wq"), attn.pop("wk"), attn.pop("wv")]
        ))
    mlp = lm_params["layers"]["mlp"]
    if "w_gate" in mlp:
        mlp["w_gateup"] = materialize(cat(
            [mlp.pop("w_gate"), mlp.pop("w_up")]
        ))
    return lm_params


LLAMA_FUSED_QUANT_PATHS = (
    ("layers", "attn", "wqkv"),
    ("layers", "attn", "wq"),      # present when GQA kept them unfused
    ("layers", "attn", "wk"),
    ("layers", "attn", "wv"),
    ("layers", "attn", "wo"),
    ("layers", "mlp", "w_gateup"),
    ("layers", "mlp", "w_down"),
    ("lm_head",),
)


def quantize_llava_params(params, model_type: str = "llama",
                          in_place: bool = True, bits: int = 8,
                          fuse: bool = False):
    paths = MPT_QUANT_PATHS if model_type == "mpt" else LLAMA_QUANT_PATHS
    lm = quantize_lm_params(params["language_model"], paths,
                            in_place=in_place, bits=bits)
    if fuse and model_type == "llama":
        # fuse AFTER quantizing: transients peak at quantized size
        lm = fuse_llama_matrices(lm)
    return dict(params, language_model=lm)
