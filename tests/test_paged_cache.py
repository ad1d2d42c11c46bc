"""Paged KV cache vs dense KV cache: identical decode results on the tiny
model (CPU generic path; the Pallas paged kernel is covered by
test_paged_attention.py in interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_plus_tpu.models import llama
from llava_plus_tpu.models.configs import LlamaConfig

CFG = LlamaConfig(
    vocab_size=256, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=512,
)
PAGE = 128


@pytest.fixture(scope="module")
def params():
    return llama.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8])
def test_paged_matches_dense_decode(params, dtype):
    B, T0, steps = 2, 8, 4
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(3, 250, size=(B, T0)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T0, dtype=jnp.int32), (B, T0))
    seg = jnp.ones((B, T0), jnp.int32)

    cache_dtype = jnp.bfloat16 if dtype == jnp.int8 else dtype
    dense = llama.KVCache.create(CFG, B, 2 * PAGE, dtype=dtype)
    # scrambled page assignment: slot 0 -> pages [3, 1], slot 1 -> [0, 4]
    paged = llama.PagedKVCache.create(
        CFG, B, num_pages=6, max_pages_per_slot=2, page_size=PAGE,
        dtype=dtype,
    )
    import dataclasses
    paged = dataclasses.replace(
        paged, page_table=jnp.asarray([[3, 1], [0, 4]], jnp.int32)
    )

    logits_d, dense = llama.forward(
        params, CFG, prompt, positions=positions, segment_ids=seg,
        cache=dense, attn_impl="xla", fresh_prefill=True,
    )
    logits_p, paged = llama.forward(
        params, CFG, prompt, positions=positions, segment_ids=seg,
        cache=paged, attn_impl="xla", fresh_prefill=True,
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(logits_d), atol=1e-4, rtol=1e-4
    )

    tok_d = tok_p = jnp.argmax(logits_d[:, -1], axis=-1)[:, None]
    for i in range(steps):
        pos = jnp.full((B, 1), T0 + i, jnp.int32)
        s1 = jnp.ones((B, 1), jnp.int32)
        ld, dense = llama.forward(
            params, CFG, tok_d, positions=pos, segment_ids=s1,
            cache=dense, attn_impl="xla",
        )
        lp, paged = llama.forward(
            params, CFG, tok_p, positions=pos, segment_ids=s1,
            cache=paged, attn_impl="xla",
        )
        tol = 2e-2 if dtype == jnp.int8 else 1e-4
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(ld), atol=tol, rtol=tol,
            err_msg=f"step {i}",
        )
        tok_d = jnp.argmax(ld[:, -1], axis=-1)[:, None]
        tok_p = jnp.argmax(lp[:, -1], axis=-1)[:, None]
        assert (np.asarray(tok_d) == np.asarray(tok_p)).all()


def test_paged_long_context_beyond_dense(params):
    """A slot can use more pages than another: ragged allocation works and
    positions past one page boundary keep decoding."""
    B = 1
    paged = llama.PagedKVCache.create(
        CFG, B, num_pages=4, max_pages_per_slot=3, page_size=PAGE,
        dtype=jnp.float32,
    )
    import dataclasses
    paged = dataclasses.replace(
        paged, page_table=jnp.asarray([[2, 0, 3]], jnp.int32)
    )
    T0 = PAGE + 16  # prompt crosses a page boundary
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(3, 250, size=(B, T0)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T0, dtype=jnp.int32), (B, T0))
    seg = jnp.ones((B, T0), jnp.int32)

    # reference: no cache, full forward over prompt + one step
    logits_p, paged = llama.forward(
        params, CFG, prompt, positions=positions, segment_ids=seg,
        cache=paged, attn_impl="xla", fresh_prefill=True,
    )
    tok = jnp.argmax(logits_p[:, -1], axis=-1)[:, None]
    lp, paged = llama.forward(
        params, CFG, tok, positions=jnp.full((B, 1), T0, jnp.int32),
        segment_ids=jnp.ones((B, 1), jnp.int32), cache=paged, attn_impl="xla",
    )

    full = jnp.concatenate([prompt, tok], axis=1)
    ref_logits, _ = llama.forward(params, CFG, full, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(lp[:, 0]), np.asarray(ref_logits[:, -1]),
        atol=1e-4, rtol=1e-4,
    )


def test_paged_chunked_prefill_continuation(params):
    """Feeding a prompt in two chunks through the paged cache (fresh
    prefill, then a non-fresh multi-token continuation) must equal the
    uncached full forward — locks the deferred-write kv_positions path."""
    B, T0, T1 = 1, 8, 6
    rng = np.random.default_rng(7)
    full_ids = jnp.asarray(rng.integers(3, 250, size=(B, T0 + T1)), jnp.int32)

    paged = llama.PagedKVCache.create(
        CFG, B, num_pages=3, max_pages_per_slot=2, page_size=PAGE,
        dtype=jnp.float32,
    )
    import dataclasses
    paged = dataclasses.replace(
        paged, page_table=jnp.asarray([[2, 0]], jnp.int32)
    )

    pos0 = jnp.broadcast_to(jnp.arange(T0, dtype=jnp.int32), (B, T0))
    l0, paged = llama.forward(
        params, CFG, full_ids[:, :T0], positions=pos0,
        segment_ids=jnp.ones((B, T0), jnp.int32),
        cache=paged, attn_impl="xla", fresh_prefill=True,
    )
    pos1 = jnp.broadcast_to(
        jnp.arange(T0, T0 + T1, dtype=jnp.int32), (B, T1)
    )
    l1, paged = llama.forward(
        params, CFG, full_ids[:, T0:], positions=pos1,
        segment_ids=jnp.ones((B, T1), jnp.int32),
        cache=paged, attn_impl="xla",
    )

    ref, _ = llama.forward(params, CFG, full_ids, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(l0), np.asarray(ref[:, :T0]), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(ref[:, T0:]), atol=1e-4, rtol=1e-4
    )


def test_write_beyond_allocation_drops(params):
    """A decode chunk running past a slot's allocated pages must NOT write
    through page-table filler entries into page 0 (which may belong to
    another request). Regression for the budget-exhaustion overrun."""
    import dataclasses

    B = 1
    paged = llama.PagedKVCache.create(
        CFG, B, num_pages=4, max_pages_per_slot=3, page_size=PAGE,
        dtype=jnp.float32,
    )
    # slot allocated ONE page (page 2); filler entries point at page 0
    paged = dataclasses.replace(
        paged,
        page_table=jnp.asarray([[2, 0, 0]], jnp.int32),
        alloc=jnp.asarray([PAGE], jnp.int32),
    )
    page0_before = np.asarray(paged.kv[:, 0])

    # write a token at a position beyond the allocation (page index 1 ->
    # filler -> page 0 without the alloc mask)
    pos = jnp.asarray([[PAGE + 3]], jnp.int32)
    _, paged = llama.forward(
        params, CFG, jnp.asarray([[7]], jnp.int32), positions=pos,
        segment_ids=jnp.ones((1, 1), jnp.int32), cache=paged,
        attn_impl="xla",
    )
    np.testing.assert_array_equal(np.asarray(paged.kv[:, 0]), page0_before)
