"""The static Python-loop decode (LLAVA_DECODE_UNROLL) must be
numerically identical to the lax.scan layer iteration it replaces —
same jaxpr-level ops per layer, only the loop structure differs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_plus_tpu.models import llama
from llava_plus_tpu.models.configs import tiny_llava_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_llava_config().text
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    B, T_prompt, S = 2, 8, 32
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(B, T_prompt)))
    pos = jnp.broadcast_to(jnp.arange(T_prompt), (B, T_prompt))
    seg = jnp.ones((B, T_prompt), jnp.int32)
    return cfg, params, ids, pos, seg, S


def _decode_logits(cfg, params, ids, pos, seg, S, monkeypatch, unroll,
                   quantized=False):
    monkeypatch.setenv("LLAVA_DECODE_UNROLL", "1" if unroll else "0")
    B, T_prompt = ids.shape
    cache = llama.KVCache.create(
        cfg, B, S, jnp.int8 if quantized else jnp.float32
    )
    logits, cache = llama.forward(
        params, cfg, ids, positions=pos, segment_ids=seg, cache=cache,
        attn_impl="xla", fresh_prefill=True,
    )
    tok = jnp.argmax(logits[:, -1], axis=-1)[:, None]
    outs = []
    for i in range(3):
        p = jnp.full((B, 1), T_prompt + i, jnp.int32)
        logits, cache = llama.forward(
            params, cfg, tok, positions=p,
            segment_ids=jnp.ones((B, 1), jnp.int32), cache=cache,
            attn_impl="xla",
        )
        tok = jnp.argmax(logits[:, -1], axis=-1)[:, None]
        outs.append(np.asarray(logits))
    return np.stack(outs)


@pytest.mark.parametrize("quantized", [False, True])
def test_unrolled_decode_matches_scan(setup, monkeypatch, quantized):
    cfg, params, ids, pos, seg, S = setup
    a = _decode_logits(cfg, params, ids, pos, seg, S, monkeypatch,
                       unroll=False, quantized=quantized)
    b = _decode_logits(cfg, params, ids, pos, seg, S, monkeypatch,
                       unroll=True, quantized=quantized)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
