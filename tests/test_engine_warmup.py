"""Engine warmup: the full program set compiles at warmup() time, so
serving afterwards triggers NO new XLA compilations (a fresh worker's
first requests must not pay multi-second compiles — the reference streams
its first token immediately, ref llava/serve/model_worker.py:174-192,
because torch eager has no compile step to pay), and warmup leaves the
engine state indistinguishable from a fresh one.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_plus_tpu.generate import Generator
from llava_plus_tpu.models import llava as llava_model
from llava_plus_tpu.models.configs import tiny_llava_config
from llava_plus_tpu.serve.engine import BatchedEngine, Request

from .test_generate import CharTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_llava_config()
    params = llava_model.init_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.float32
    )
    return cfg, params


def _cache_sizes(eng, names):
    return {name: getattr(eng, name)._cache_size() for name in names}


_DENSE_PROGRAMS = (
    "_prefill", "_insert", "_decode", "_decode_n", "_set_token",
    "_first_sample",
)
_PAGED_PROGRAMS = (
    "_prefill", "_insert_paged", "_prefill_suffix", "_decode", "_decode_n",
    "_set_token", "_first_sample", "_spec_prog",
)


def _drain(req):
    while req._chunks.get(timeout=120) is not None:
        pass


def test_warmup_then_serve_matches_single_stream(setup):
    """Warmup must not corrupt engine state: post-warmup greedy output
    equals the single-stream generator's."""
    cfg, params = setup
    tok = CharTokenizer()
    eng = BatchedEngine(
        params, cfg, tok, max_slots=4, max_seq_len=96,
        prefill_bucket=32, cache_dtype=jnp.float32,
    )
    gen = Generator(
        params, cfg, tok, max_seq_len=96, prefill_bucket=32,
        cache_dtype=jnp.float32, attn_impl="xla",
    )
    try:
        s = eng.warmup(prompt_len=20, image=False)
        assert s > 0 and eng.warmup_s == s
        for prompt in ["hello", "xyz", "abab"]:
            ref = gen.generate(prompt, max_new_tokens=6, temperature=0.0).text
            got = eng.generate(
                Request(prompt=prompt, max_new_tokens=6, temperature=0.0)
            )
            assert got == ref, (prompt, got, ref)
    finally:
        eng.stop()


def test_warmup_compiles_everything_dense_serving_needs(setup):
    """After warmup at a prompt bucket, a multi-request burst (image
    prompts in that bucket, more requests than slots, every admission
    batch size) adds ZERO entries to any program's jit cache."""
    cfg, params = setup
    tok = CharTokenizer()
    eng = BatchedEngine(
        params, cfg, tok, max_slots=2, max_seq_len=96,
        prefill_bucket=32, prefill_batch=4, cache_dtype=jnp.float32,
    )
    try:
        eng.warmup(prompt_len=24, image=True)
        sizes = _cache_sizes(eng, _DENSE_PROGRAMS)
        assert all(v >= 1 for v in sizes.values()), sizes

        rng = np.random.default_rng(0)
        sz = cfg.vision.image_size

        def image():
            return rng.normal(size=(1, sz, sz, 3)).astype(np.float32)

        reqs = [
            Request(
                prompt="<image>\n" + "abcdefg"[: (i % 5) + 2],
                images=image(), max_new_tokens=5, temperature=0.0,
            )
            for i in range(6)
        ]
        for r in reqs:
            eng.submit(r)
        for r in reqs:
            _drain(r)
        # batch-size-1 and batch-size-2 admissions too (timing above may
        # have drained everything as one padded batch)
        for n in (1, 2):
            batch = [
                Request(prompt="<image>\nhi", images=image(),
                        max_new_tokens=3, temperature=0.0)
                for _ in range(n)
            ]
            preps = eng._prepare(batch)
            for p in preps:
                if p is not None:
                    eng._ready.put(p)
            for r in batch:
                _drain(r)
        assert _cache_sizes(eng, _DENSE_PROGRAMS) == sizes
    finally:
        eng.stop()


def test_warmup_paged_spec_then_serve(setup):
    """Paged + speculative engine: warmup compiles the paged insert, the
    suffix-prefill (prefix-hit) path, and the spec step; serving a repeat
    prompt (prefix hit) afterwards adds no cache entries, output still
    matches the generator, and page accounting survives warmup."""
    cfg, params = setup
    tok = CharTokenizer()
    eng = BatchedEngine(
        params, cfg, tok, max_slots=2, max_seq_len=64,
        prefill_bucket=32, paged=True, page_size=32,
        cache_dtype=jnp.float32, speculate=2,
    )
    gen = Generator(
        params, cfg, tok, max_seq_len=64, prefill_bucket=32,
        cache_dtype=jnp.float32, attn_impl="xla",
    )
    try:
        # warm the bucket the serving prompt below lands in (warmup is
        # per-bucket: a 55-token char prompt pads to the 64 bucket)
        eng.warmup(prompt_len=50, image=False)
        # warmup must hand back every page it borrowed
        assert len(eng._free_pages) == eng.num_pages
        sizes = _cache_sizes(eng, _PAGED_PROGRAMS)
        assert all(v >= 1 for v in sizes.values()), sizes

        # a long prompt fills >= 1 full page -> the repeat is a prefix hit
        prompt = "the quick brown fox jumps over the lazy dog again and"
        ref = gen.generate(prompt, max_new_tokens=6, temperature=0.0).text
        for _ in range(2):
            got = eng.generate(
                Request(prompt=prompt, max_new_tokens=6, temperature=0.0)
            )
            assert got == ref, (got, ref)
        assert eng.prefix_hit_tokens > 0  # second pass hit the page cache
        assert _cache_sizes(eng, _PAGED_PROGRAMS) == sizes
    finally:
        eng.stop()
