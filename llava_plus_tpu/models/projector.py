"""Vision-to-language projector.

Parity target: ``llava/model/multimodal_projector/builder.py:33-51`` —
"linear", "mlp{N}x_gelu" (regex-parsed depth), and "identity".
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp


def parse_projector_type(projector_type: str) -> int:
    """Return MLP depth: 1 for linear, N for mlpNx_gelu, 0 for identity."""
    if projector_type == "identity":
        return 0
    if projector_type == "linear":
        return 1
    m = re.match(r"^mlp(\d+)x_gelu$", projector_type)
    if m:
        return int(m.group(1))
    raise ValueError(f"Unknown projector type: {projector_type}")


def init_params(projector_type: str, mm_hidden_size: int, hidden_size: int,
                key: jax.Array, dtype=jnp.bfloat16):
    depth = parse_projector_type(projector_type)
    if depth == 0:
        return {}
    keys = jax.random.split(key, depth)
    layers = []
    d_in = mm_hidden_size
    for i in range(depth):
        layers.append({
            "w": jax.random.normal(keys[i], (d_in, hidden_size), dtype) * 0.02,
            "b": jnp.zeros((hidden_size,), dtype),
        })
        d_in = hidden_size
    return {"layers": layers}


def apply(params, projector_type: str, x: jax.Array) -> jax.Array:
    """x: [..., mm_hidden] -> [..., hidden]. GELU (tanh-free exact, matching
    torch nn.GELU default) between linear layers."""
    depth = parse_projector_type(projector_type)
    if depth == 0:
        return x
    for i, layer in enumerate(params["layers"]):
        if i > 0:
            x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
        x = x @ layer["w"] + layer["b"]
    return x
