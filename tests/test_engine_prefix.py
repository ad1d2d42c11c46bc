"""Cross-request KV prefix reuse over the paged pool
(serve/prefix_cache.py + engine suffix-prefill admission).

Sharing is exact — generation with the prefix cache on must equal
generation with it off, while multi-turn follow-ups skip the shared
pages (and the vision encode when the image sits in the prefix)."""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_plus_tpu.models import llava as llava_model
from llava_plus_tpu.models.configs import tiny_llava_config
from llava_plus_tpu.serve.engine import BatchedEngine, Request
from llava_plus_tpu.serve.prefix_cache import image_digest, page_keys

from .test_generate import CharTokenizer

PAGE = 32


# ---------------------------------------------------------------- hashing

def test_page_keys_chain_and_divergence():
    a = np.arange(100) % 50 + 3
    b = a.copy()
    b[40] += 1  # diverge inside page 1
    ka = page_keys(a, [], num_patches=4, page_size=32)
    kb = page_keys(b, [], num_patches=4, page_size=32)
    assert len(ka) == 3  # 100 // 32
    assert ka[0] == kb[0]          # page 0 identical
    assert ka[1] != kb[1]          # divergent page differs
    assert ka[2] != kb[2]          # chain: every later page differs too


def test_page_keys_fold_image_identity():
    toks = np.zeros(64, np.int64)  # fused ids at image spans are all pad
    img1 = np.ones((8, 8, 3), np.float32)
    img2 = np.zeros((8, 8, 3), np.float32)
    k1 = page_keys(toks, [(1, image_digest(img1))], 4, 32)
    k2 = page_keys(toks, [(1, image_digest(img2))], 4, 32)
    assert k1[0] != k2[0]
    # an image whose span is entirely in page 0 does not salt page 1's
    # block hash directly — but the CHAIN carries it forward
    assert k1[1] != k2[1]
    # same image -> identical everywhere
    assert k1 == page_keys(toks, [(1, image_digest(img1))], 4, 32)


# ---------------------------------------------------------------- engine

@pytest.fixture(scope="module")
def setup():
    cfg = tiny_llava_config()
    params = llava_model.init_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.float32
    )
    tok = CharTokenizer()
    off = BatchedEngine(
        params, cfg, tok, max_slots=4, max_seq_len=160,
        prefill_bucket=32, cache_dtype=jnp.float32,
        paged=True, page_size=PAGE, prefix_cache=False,
    )
    on = BatchedEngine(
        params, cfg, tok, max_slots=4, max_seq_len=160,
        prefill_bucket=32, cache_dtype=jnp.float32,
        paged=True, page_size=PAGE, prefix_cache=True,
    )
    yield cfg, off, on
    off.stop()
    on.stop()


TURN1 = "The quick brown fox jumps over the lazy dog near a river."
TURN2 = TURN1 + " Then what happened to it?"


def _gen(eng, prompt, images=None, n=6):
    return eng.generate(Request(prompt=prompt, images=images,
                                max_new_tokens=n, temperature=0.0))


def test_prefix_hit_matches_uncached(setup):
    _, off, on = setup
    assert _gen(on, TURN1) == _gen(off, TURN1)  # seeds the cache
    hits0 = on._prefix.hit_requests
    assert _gen(on, TURN2) == _gen(off, TURN2)  # served via suffix prefill
    assert on._prefix.hit_requests > hits0
    assert on.prefix_hit_tokens >= PAGE


def test_identical_prompt_rehit(setup):
    """Resubmitting the same prompt hits every full page except the one
    holding the last token (always recomputed for first-token logits)."""
    _, off, on = setup
    prompt = "z" + TURN1
    ref = _gen(off, prompt)
    assert _gen(on, prompt) == ref
    before = on.prefix_hit_tokens
    assert _gen(on, prompt) == ref
    # prompt is bos + 59 chars = 60+ tokens -> at least one full page hit
    assert on.prefix_hit_tokens - before >= PAGE


def test_image_identity_guards_reuse(setup):
    """Same tokens + different image bytes must NOT share pages."""
    cfg, off, on = setup
    rng = np.random.default_rng(0)
    s = cfg.vision.image_size
    img_a = rng.normal(size=(1, s, s, 3)).astype(np.float32)
    img_b = rng.normal(size=(1, s, s, 3)).astype(np.float32)
    prompt = "<image>\n" + TURN1

    ref_a = _gen(off, prompt, img_a)
    ref_b = _gen(off, prompt, img_b)
    assert _gen(on, prompt, img_a) == ref_a  # seed with image A
    got_b = _gen(on, prompt, img_b)          # must not reuse A's pages
    assert got_b == ref_b
    # and a true multi-turn image hit works (image span inside prefix)
    before = on.prefix_hit_tokens
    assert (_gen(on, prompt + " More about the picture?", img_a)
            == _gen(off, prompt + " More about the picture?", img_a))
    assert on.prefix_hit_tokens > before


def test_eviction_under_small_pool():
    """With a pool too small to retain history, published pages are
    evicted LRU to admit new work — completions stay correct and nothing
    leaks (refcounts return to the prefix cache's own entries only)."""
    cfg = tiny_llava_config()
    params = llava_model.init_params(
        cfg, jax.random.PRNGKey(1), dtype=jnp.float32
    )
    tok = CharTokenizer()
    eng = BatchedEngine(
        params, cfg, tok, max_slots=2, max_seq_len=96,
        prefill_bucket=32, cache_dtype=jnp.float32,
        paged=True, page_size=PAGE, pool_tokens=6 * PAGE,
        prefix_cache=True,
    )
    try:
        ref = None
        prompts = [c * 40 for c in "abcdef"]
        for p in prompts:  # each publishes a page; pool forces eviction
            eng.generate(Request(prompt=p, max_new_tokens=4,
                                 temperature=0.0))
        deadline = time.time() + 5
        while eng.num_active and time.time() < deadline:
            time.sleep(0.02)
        with eng._page_lock:
            live = sum(1 for r in eng._page_refs if r > 0)
            # every live page belongs to the prefix cache, nothing else
            assert live == len(eng._prefix)
            assert len(eng._free_pages) == eng.num_pages - live
    finally:
        eng.stop()
