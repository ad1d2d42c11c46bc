"""Numerical parity: our MPT decoder vs HF MptForCausalLM (ALiBi path).

The vendored reference MPT (llava/model/language_model/mpt/) and HF's
MptForCausalLM share weight layout and math for the torch/alibi config used
by LLaVA, so HF is the parity oracle here.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from llava_plus_tpu.models import mpt
from llava_plus_tpu.models.hf_import import (
    mpt_config_from_hf,
    mpt_params_from_state_dict,
)


@pytest.fixture(scope="module")
def hf_mpt():
    import torch
    from transformers import MptConfig as HFConfig
    from transformers import MptForCausalLM

    torch.manual_seed(0)
    cfg = HFConfig(
        d_model=64, n_heads=4, n_layers=2, expansion_ratio=2,
        max_seq_len=128, vocab_size=128,
        attn_config={"attn_impl": "torch", "alibi": True, "alibi_bias_max": 8},
    )
    model = MptForCausalLM(cfg).eval()
    return model, cfg


def _ours(hf_mpt):
    model, hf_cfg = hf_mpt
    cfg = mpt_config_from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = mpt_params_from_state_dict(sd, cfg, dtype=jnp.float32)
    return params, cfg


def test_alibi_slopes_match_reference_algorithm():
    # n_heads = 4 (power of two)
    s = np.asarray(mpt.alibi_slopes(4, 8))
    np.testing.assert_allclose(s, [0.25, 0.0625, 0.015625, 0.00390625])
    # non-power-of-two interleave
    s6 = np.asarray(mpt.alibi_slopes(6, 8))
    assert s6.shape == (6,)
    assert (s6 > 0).all() and (np.diff(s6[:3]) < 0).all()


def test_logits_match_hf(hf_mpt):
    import torch

    model, _ = hf_mpt
    params, cfg = _ours(hf_mpt)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 7))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    ours, _ = mpt.forward(params, cfg, jnp.asarray(ids), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4, rtol=2e-3)


def test_incremental_decode_matches_prefill(hf_mpt):
    params, cfg = _ours(hf_mpt)
    rng = np.random.default_rng(1)
    T = 6
    ids = jnp.asarray(rng.integers(0, 128, size=(1, T)))
    full, _ = mpt.forward(params, cfg, ids, attn_impl="xla")

    cache = mpt.create_cache(cfg, batch=1, max_len=8, dtype=jnp.float32)
    pos = jnp.arange(3, dtype=jnp.int32)[None]
    logits, cache = mpt.forward(
        params, cfg, ids[:, :3], positions=pos,
        segment_ids=jnp.ones((1, 3), jnp.int32), cache=cache, attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, :3]), atol=1e-4, rtol=1e-3
    )
    for t in range(3, T):
        logits, cache = mpt.forward(
            params, cfg, ids[:, t : t + 1],
            positions=jnp.full((1, 1), t, jnp.int32),
            segment_ids=jnp.ones((1, 1), jnp.int32),
            cache=cache, attn_impl="xla",
        )
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]), np.asarray(full[:, t]), atol=1e-4, rtol=1e-3
        )


def test_multiquery_shapes():
    import jax

    from llava_plus_tpu.models.configs import MptConfig

    cfg = MptConfig(
        vocab_size=64, d_model=32, n_layers=2, n_heads=4, expansion_ratio=2,
        max_seq_len=64, multiquery=True,
    )
    params = mpt.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    assert params["layers"]["attn"]["wqkv"].shape == (2, 32, 32 + 2 * 8)
    ids = jnp.asarray(np.arange(10)[None] % 64)
    logits, _ = mpt.forward(params, cfg, ids, attn_impl="xla")
    assert logits.shape == (1, 10, 64)
    assert bool(jnp.isfinite(logits).all())


def test_prefix_lm_visibility():
    import jax

    from llava_plus_tpu.models.configs import MptConfig

    cfg = MptConfig(
        vocab_size=64, d_model=32, n_layers=1, n_heads=2, expansion_ratio=2,
        max_seq_len=64, prefix_lm=True, alibi=True,
    )
    params = mpt.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jnp.asarray(np.arange(8)[None] % 64)
    prefix = jnp.asarray(np.array([[1, 1, 1, 0, 0, 0, 0, 0]]))
    logits, _ = mpt.forward(params, cfg, ids, prefix_mask=prefix, attn_impl="xla")
    # token 0 sees tokens 1-2 through the prefix: its logits must differ from
    # the purely-causal run.
    logits_causal, _ = mpt.forward(params, cfg, ids, attn_impl="xla")
    assert not np.allclose(np.asarray(logits[0, 0]), np.asarray(logits_causal[0, 0]))


def test_mpt_multitoken_continuation():
    """Several tokens at once through the MPT cache (the speculative-verify
    shape) must equal full-sequence logits."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from llava_plus_tpu.models import mpt
    from llava_plus_tpu.models.configs import MptConfig

    cfg = MptConfig(d_model=64, n_heads=4, n_layers=2, vocab_size=128,
                    max_seq_len=64)
    params = mpt.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 120, size=(1, 9)), jnp.int32)
    full, _ = mpt.forward(params, cfg, ids, attn_impl="xla")

    cache = mpt.create_cache(cfg, 1, 16, jnp.float32)
    pos0 = jnp.arange(6, dtype=jnp.int32)[None]
    _, cache = mpt.forward(
        params, cfg, ids[:, :6], positions=pos0,
        segment_ids=jnp.ones((1, 6), jnp.int32), cache=cache,
        attn_impl="xla",
    )
    posk = jnp.arange(6, 9, dtype=jnp.int32)[None]
    logits, cache = mpt.forward(
        params, cfg, ids[:, 6:], positions=posk,
        segment_ids=jnp.ones((1, 3), jnp.int32), cache=cache,
        attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, 6:]), atol=1e-4, rtol=1e-3
    )
