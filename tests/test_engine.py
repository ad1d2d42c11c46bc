"""Continuous-batching engine tests: correctness vs the single-stream
generator, concurrent requests sharing decode steps, slot reuse."""

import threading

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
    params = llava_model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tok = CharTokenizer()
    engine = BatchedEngine(
        params, cfg, tok, max_slots=4, max_seq_len=96,
        prefill_bucket=32, cache_dtype=jnp.float32,
    )
    gen = Generator(
        params, cfg, tok, max_seq_len=96, prefill_bucket=32,
        cache_dtype=jnp.float32, attn_impl="xla",
    )
    yield engine, gen
    engine.stop()


def test_engine_matches_single_stream_greedy(setup):
    engine, gen = setup
    for prompt in ["hello", "xyz", "abab"]:
        ref = gen.generate(prompt, max_new_tokens=6, temperature=0.0).text
        got = engine.generate(
            Request(prompt=prompt, max_new_tokens=6, temperature=0.0)
        )
        assert got == ref, (prompt, got, ref)


def test_engine_concurrent_requests(setup):
    engine, gen = setup
    prompts = ["aa", "bb", "cc", "dd", "ee", "ff"]  # > max_slots
    refs = {
        p: gen.generate(p, max_new_tokens=5, temperature=0.0).text
        for p in prompts
    }
    results = {}
    threads = []

    def run(p):
        results[p] = engine.generate(
            Request(prompt=p, max_new_tokens=5, temperature=0.0)
        )

    for p in prompts:
        t = threading.Thread(target=run, args=(p,))
        t.start()
        threads.append(t)
    for t in threads:
        t.join(timeout=120)
    assert results == refs


def test_engine_batched_prefill_matches_single(setup):
    """A burst admitted as ONE batched prefill program (engine._prepare
    with len(reqs) > 1) must emit the same first token per request as
    single-request prefill — no cross-request contamination through the
    shared [N, S1] prefill cache (VERDICT r2 item 2's admission path)."""
    engine, gen = setup
    prompts = ["hello", "xyz", "abab", "qq"]
    refs = [gen.generate(p, max_new_tokens=1, temperature=0.0).text
            for p in prompts]
    reqs = [Request(prompt=p, max_new_tokens=1, temperature=0.0)
            for p in prompts]
    before = engine.prefill_dispatches
    preps = engine._prepare(reqs)  # deterministic: bypass the queue race
    engine.prefill_dispatches += 1  # counted by _prefill_loop normally
    for req, ref in zip(reqs, refs):
        assert req._chunks.get(timeout=60) == ref
    # requests that still have budget would be inserted for decode; drain
    # them through the normal path so the fixture engine stays clean
    for prep in preps:
        if prep is not None:
            engine._ready.put(prep)
    for req in reqs:
        while req._chunks.get(timeout=60) is not None:
            pass
    assert engine.prefill_dispatches == before + 1


def test_engine_streaming_cumulative(setup):
    engine, _ = setup
    chunks = list(engine.stream(
        Request(prompt="stream me", max_new_tokens=5, temperature=0.0)
    ))
    assert chunks
    for a, b in zip(chunks, chunks[1:]):
        assert len(b) >= len(a)


def test_engine_stop_string(setup):
    engine, gen = setup
    full = gen.generate("qq", max_new_tokens=4, temperature=0.0).text
    if len(full) < 2:
        pytest.skip("generation too short to test stop strings")
    stop = full[1]
    got = engine.generate(Request(
        prompt="qq", max_new_tokens=4, temperature=0.0, stop_strings=[stop],
    ))
    assert stop not in got


def test_engine_multimodal_request(setup):
    engine, gen = setup
    img = np.zeros((1, 28, 28, 3), np.float32)
    ref = gen.generate("<image>\nwhat?", images=img, max_new_tokens=4).text
    got = engine.generate(Request(
        prompt="<image>\nwhat?", images=img, max_new_tokens=4,
    ))
    assert got == ref


def test_engine_chunk1_matches_chunk4(setup):
    """decode_chunk=1 and the scan-chunked loop must produce identical
    greedy text (the module fixture engine runs the default chunk=4)."""
    engine, gen = setup
    cfg = engine.cfg
    e1 = BatchedEngine(
        engine.params, cfg, engine.tokenizer, max_slots=2, max_seq_len=96,
        prefill_bucket=32, cache_dtype=jnp.float32, decode_chunk=1,
    )
    try:
        for prompt in ["hello", "zq"]:
            ref = e1.generate(Request(prompt=prompt, max_new_tokens=7,
                                      temperature=0.0))
            got = engine.generate(Request(prompt=prompt, max_new_tokens=7,
                                          temperature=0.0))
            assert got == ref
    finally:
        e1.stop()


def test_engine_int8_kv_cache_runs(setup):
    """Engine with an int8 KV cache serves coherent greedy streams (exact
    text may differ from bf16 within quantization tolerance)."""
    engine, gen = setup
    e8 = BatchedEngine(
        engine.params, engine.cfg, engine.tokenizer, max_slots=2,
        max_seq_len=96, prefill_bucket=32, cache_dtype=jnp.int8,
    )
    try:
        out = e8.generate(Request(prompt="hello", max_new_tokens=6,
                                  temperature=0.0))
        assert isinstance(out, str) and len(out) > 0
        ref = engine.generate(Request(prompt="hello", max_new_tokens=6,
                                      temperature=0.0))
        # same model, tiny drift budget: most tokens should agree
        agree = sum(a == b for a, b in zip(out, ref)) / max(len(ref), 1)
        assert agree > 0.5, (out, ref)
    finally:
        e8.stop()


def test_engine_tensor_parallel_matches(setup):
    from llava_plus_tpu.parallel.mesh import make_mesh

    engine, gen = setup
    mesh = make_mesh(1, 1, 2)
    etp = BatchedEngine(
        engine.params, engine.cfg, engine.tokenizer, max_slots=2,
        max_seq_len=96, prefill_bucket=32, cache_dtype=jnp.float32,
        mesh=mesh,
    )
    try:
        ref = engine.generate(Request(prompt="hello", max_new_tokens=6,
                                      temperature=0.0))
        got = etp.generate(Request(prompt="hello", max_new_tokens=6,
                                   temperature=0.0))
        assert got == ref
    finally:
        etp.stop()


def test_speculative_matches_plain_greedy():
    """Prompt-lookup speculation must be EXACT for greedy streams: same
    text as the plain engine, token for token."""
    cfg = tiny_llava_config()
    params = llava_model.init_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.float32
    )
    tok = CharTokenizer()

    prompts = ["the cat sat on the mat the cat sat on the",
               "abc abc abc abc abc"]

    def run(speculate):
        eng = BatchedEngine(
            params, cfg, tok, max_slots=2, max_seq_len=96,
            prefill_bucket=32, cache_dtype=jnp.float32,
            speculate=speculate,
        )
        try:
            reqs = [Request(prompt=p, max_new_tokens=12, temperature=0.0)
                    for p in prompts]
            return [eng.generate(r) for r in reqs]
        finally:
            eng.stop()

    plain = run(0)
    spec = run(4)
    assert spec == plain


def test_speculative_chunked_exact():
    """Chunked spec dispatch (spec_chunk > 1: m fused verify steps per
    program, one host fetch per chunk) stays greedy-exact, including
    budgets that end mid-chunk (the device keeps stepping inside the
    chunk; the host must ignore the post-finish rows)."""
    cfg = tiny_llava_config()
    params = llava_model.init_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.float32
    )
    tok = CharTokenizer()
    prompts = ["the cat sat on the mat the cat sat on the",
               "abc abc abc abc abc"]
    budgets = [7, 13]  # neither a multiple of chunk x acceptance

    def run(speculate, chunk):
        eng = BatchedEngine(
            params, cfg, tok, max_slots=2, max_seq_len=96,
            prefill_bucket=32, cache_dtype=jnp.float32,
            speculate=speculate, spec_chunk=chunk,
        )
        try:
            reqs = [Request(prompt=p, max_new_tokens=b, temperature=0.0)
                    for p, b in zip(prompts, budgets)]
            return [eng.generate(r) for r in reqs]
        finally:
            eng.stop()

    plain = run(0, 1)
    for chunk in (3, 8):
        assert run(4, chunk) == plain, chunk


def test_speculative_mixed_temperature():
    """Sampled (temp > 0) streams coexist with greedy speculation: both
    finish, greedy output still matches the plain engine."""
    cfg = tiny_llava_config()
    params = llava_model.init_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.float32
    )
    tok = CharTokenizer()
    plain = BatchedEngine(
        params, cfg, tok, max_slots=2, max_seq_len=96,
        prefill_bucket=32, cache_dtype=jnp.float32,
    )
    try:
        ref = plain.generate(
            Request(prompt="aba aba aba", max_new_tokens=8, temperature=0.0)
        )
    finally:
        plain.stop()

    eng = BatchedEngine(
        params, cfg, tok, max_slots=2, max_seq_len=96,
        prefill_bucket=32, cache_dtype=jnp.float32, speculate=3,
    )
    try:
        greedy_req = Request(
            prompt="aba aba aba", max_new_tokens=8, temperature=0.0
        )
        sampled_req = Request(
            prompt="xyz xyz", max_new_tokens=8, temperature=0.8, seed=7
        )
        results = {}
        ts = []
        for name, r in (("g", greedy_req), ("s", sampled_req)):
            t = threading.Thread(
                target=lambda n=name, rq=r: results.__setitem__(
                    n, eng.generate(rq))
            )
            t.start()
            ts.append(t)
        for t in ts:
            t.join(timeout=300)
        assert results["g"] == ref
        assert "s" in results  # sampled stream completed
        assert eng.spec_steps > 0
    finally:
        eng.stop()


def test_speculative_pause_resume_exact():
    """Adaptive gating: when acceptance is low the engine flips to plain
    chunks and back; output must stay identical to the plain engine
    across both transitions."""
    cfg = tiny_llava_config()
    params = llava_model.init_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.float32
    )
    tok = CharTokenizer()
    prompt = "qwertzuiopasdfgh"  # unlikely to produce matchable n-grams

    plain = BatchedEngine(
        params, cfg, tok, max_slots=1, max_seq_len=256,
        prefill_bucket=32, cache_dtype=jnp.float32,
    )
    try:
        ref = plain.generate(
            Request(prompt=prompt, max_new_tokens=60, temperature=0.0)
        )
    finally:
        plain.stop()

    eng = BatchedEngine(
        params, cfg, tok, max_slots=1, max_seq_len=256,
        prefill_bucket=32, cache_dtype=jnp.float32, speculate=3,
        # per-step gate cadence: with chunked dispatch the first gating
        # check lands after spec_chunk steps, past the engineered
        # low-acceptance warm-in window this test relies on
        spec_chunk=1,
    )
    eng._spec_recent = __import__("collections").deque(maxlen=6)
    eng.spec_pause_len = 5  # force several pause/resume cycles in 60 tokens
    try:
        got = eng.generate(
            Request(prompt=prompt, max_new_tokens=60, temperature=0.0)
        )
    finally:
        eng.stop()
    assert got == ref
    assert eng.spec_pauses >= 1  # gating actually cycled


def test_engine_budget_clamp_matches_generator(setup):
    """Context-clamped budget: requesting more tokens than the window
    holds must emit EXACTLY as many tokens as the single-stream generator
    (regression: the engine clamped to max_seq_len - prompt_len - 1 and
    dropped the final token of every window-filling stream)."""
    engine, gen = setup
    for prompt in ["hello", "ab"]:
        ref = gen.generate(prompt, max_new_tokens=500, temperature=0.0).text
        got = engine.generate(
            Request(prompt=prompt, max_new_tokens=500, temperature=0.0)
        )
        assert got == ref, (prompt, len(got), len(ref))
