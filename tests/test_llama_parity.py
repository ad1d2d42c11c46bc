"""Numerical parity: our functional LLaMA decoder vs HF LlamaForCausalLM.

fp32, tiny random config, CPU. This is the north-star logit-parity harness
(BASELINE.md): if this drifts, everything downstream is wrong.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_plus_tpu.models import llama
from llava_plus_tpu.models.hf_import import (
    llama_config_from_hf,
    llama_params_from_state_dict,
)


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(0)
    cfg = HFConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg).eval()
    return model, cfg


def _our_params(hf_model):
    model, hf_cfg = hf_model
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = llama_params_from_state_dict(sd, cfg, dtype=jnp.float32)
    return params, cfg


def test_logits_match_hf(hf_model):
    import torch

    model, _ = hf_model
    params, cfg = _our_params(hf_model)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 9))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()

    ours, _ = llama.forward(params, cfg, jnp.asarray(ids), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-3)


def test_logits_match_hf_with_padding(hf_model):
    import torch

    model, _ = hf_model
    params, cfg = _our_params(hf_model)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 128, size=(1, 6))
    # right-pad to 10 and mask
    padded = np.concatenate([ids, np.zeros((1, 4), dtype=ids.dtype)], axis=1)
    seg = np.concatenate([np.ones((1, 6)), np.zeros((1, 4))], axis=1).astype(np.int32)

    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()

    ours, _ = llama.forward(
        params, cfg, jnp.asarray(padded), segment_ids=jnp.asarray(seg),
        attn_impl="xla",
    )
    np.testing.assert_allclose(np.asarray(ours)[:, :6], ref, atol=2e-4, rtol=2e-3)


def test_incremental_decode_matches_prefill(hf_model):
    """KV-cache decode must reproduce full-sequence logits exactly."""
    params, cfg = _our_params(hf_model)
    rng = np.random.default_rng(2)
    T = 8
    ids = jnp.asarray(rng.integers(0, 128, size=(2, T)))

    full, _ = llama.forward(params, cfg, ids, attn_impl="xla")

    cache = llama.KVCache.create(cfg, batch=2, max_len=16, dtype=jnp.float32)
    # Prefill first 5 tokens through the cache path
    pos = jnp.broadcast_to(jnp.arange(5, dtype=jnp.int32), (2, 5))
    seg = jnp.ones((2, 5), jnp.int32)
    logits, cache = llama.forward(
        params, cfg, ids[:, :5], positions=pos, segment_ids=seg,
        cache=cache, attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, :5]), atol=1e-4, rtol=1e-3
    )
    # Decode the rest one token at a time
    for t in range(5, T):
        pos = jnp.full((2, 1), t, jnp.int32)
        seg = jnp.ones((2, 1), jnp.int32)
        logits, cache = llama.forward(
            params, cfg, ids[:, t : t + 1], positions=pos, segment_ids=seg,
            cache=cache, attn_impl="xla",
        )
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]), np.asarray(full[:, t]), atol=1e-4, rtol=1e-3
        )


def test_gqa_head_expansion(hf_model):
    """num_heads != num_kv_heads path produces same shapes and finite values."""
    params, cfg = _our_params(hf_model)
    assert cfg.num_key_value_heads != cfg.num_attention_heads
    ids = jnp.asarray(np.arange(12).reshape(1, 12) % 128)
    logits, _ = llama.forward(params, cfg, ids, attn_impl="xla")
    assert logits.shape == (1, 12, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_rope_linear_scaling_matches_hf():
    """HF rope_scaling {"type": "linear"} logits reproduced (positions
    beyond max_position_embeddings — the long-context serving path)."""
    import torch
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(1)
    hf_cfg = HFConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=16, rms_norm_eps=1e-5,
        attention_bias=False, tie_word_embeddings=False,
        rope_scaling={"type": "linear", "factor": 2.0},
    )
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    assert cfg.rope_scaling_type == "linear"
    assert cfg.rope_scaling_factor == 2.0
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = llama_params_from_state_dict(sd, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(3)
    T = 24  # > max_position_embeddings: only correct if scaling is applied
    ids = rng.integers(0, 128, size=(1, T))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    ours, _ = llama.forward(params, cfg, jnp.asarray(ids), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_rope_dynamic_ntk_static_theta():
    """dynamic NTK: theta rescaled once at the target length; positions
    past max_position_embeddings still produce sane (finite, non-degenerate)
    attention. (HF recomputes theta per forward, which would invalidate a
    decode cache — we fix theta at the scaled target instead, so exact HF
    parity only holds at the full target length.)"""
    from llava_plus_tpu.models.llama import rope_cos_sin

    pos = jnp.arange(32)[None]
    cos_s, sin_s = rope_cos_sin(pos, 64, 10000.0, "dynamic", 2.0)
    cos_u, sin_u = rope_cos_sin(pos, 64, 10000.0)
    assert bool(jnp.isfinite(cos_s).all() and jnp.isfinite(sin_s).all())
    # scaled frequencies are strictly lower than unscaled ones at the same
    # position (except freq index 0 where both are 1.0 at pos 0)
    assert float(jnp.abs(cos_s - cos_u).max()) > 1e-3


def test_dense_cache_multitoken_continuation(hf_model):
    """Feeding several tokens at once through the dense cache (the
    speculative-verify shape) must equal one-at-a-time decode."""
    params, cfg = _our_params(hf_model)
    rng = np.random.default_rng(5)
    T0, K = 6, 3
    ids = jnp.asarray(rng.integers(0, 128, size=(1, T0 + K)), jnp.int32)

    full, _ = llama.forward(params, cfg, ids, attn_impl="xla")

    cache = llama.KVCache.create(cfg, batch=1, max_len=16, dtype=jnp.float32)
    pos0 = jnp.arange(T0, dtype=jnp.int32)[None]
    _, cache = llama.forward(
        params, cfg, ids[:, :T0], positions=pos0,
        segment_ids=jnp.ones((1, T0), jnp.int32), cache=cache,
        attn_impl="xla", fresh_prefill=True,
    )
    # multi-token continuation: K tokens in one call
    posk = jnp.arange(T0, T0 + K, dtype=jnp.int32)[None]
    logits, cache = llama.forward(
        params, cfg, ids[:, T0:], positions=posk,
        segment_ids=jnp.ones((1, K), jnp.int32), cache=cache,
        attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, T0:]), atol=1e-4, rtol=1e-3
    )
