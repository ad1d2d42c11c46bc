"""Generation engine tests: greedy decode oracle, sampling, stop strings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_plus_tpu.generate import Generator, sample_token
from llava_plus_tpu.models import llava as llava_model
from llava_plus_tpu.models.configs import tiny_llava_config


class CharTokenizer:
    """Deterministic char-level tokenizer for tests. ids: bos=1, eos=2,
    chars offset by 3."""

    bos_token_id = 1
    eos_token_id = 2

    def __call__(self, text):
        ids = [self.bos_token_id] + [min(ord(c) + 3, 500) for c in text]
        return type("Enc", (), {"input_ids": ids})()

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(i - 3) for i in ids if i > 2)

    def batch_decode(self, rows, skip_special_tokens=True):
        return [self.decode(list(r)) for r in rows]


@pytest.fixture(scope="module")
def gen():
    cfg = tiny_llava_config()
    params = llava_model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return Generator(
        params, cfg, CharTokenizer(),
        max_seq_len=96, prefill_bucket=32, cache_dtype=jnp.float32,
        attn_impl="xla",
    )


def test_greedy_matches_uncached_oracle(gen):
    """Greedy streaming must equal naive full-forward argmax generation."""
    prompt = "hello"
    n_new = 6

    # oracle: grow the sequence, full forward each step, no cache
    from llava_plus_tpu.models import llama

    ids = list(gen.tokenizer(prompt).input_ids)
    for _ in range(n_new):
        logits, _ = llama.forward(
            gen.params["language_model"], gen.cfg.text,
            jnp.asarray([ids]), attn_impl="xla",
        )
        ids.append(int(jnp.argmax(logits[0, -1])))
        if ids[-1] == gen.tokenizer.eos_token_id:
            break
    oracle_ids = [i for i in ids[len(gen.tokenizer(prompt).input_ids):]
                  if i != gen.tokenizer.eos_token_id]

    res = gen.generate(prompt, max_new_tokens=n_new, temperature=0.0)
    assert res.text == gen.tokenizer.decode(oracle_ids)


def test_stream_yields_cumulative(gen):
    chunks = list(gen.stream("abc", max_new_tokens=4, temperature=0.0))
    assert len(chunks) >= 1
    for a, b in zip(chunks, chunks[1:]):
        assert b.startswith(a[: len(a) - 1])  # cumulative (last char may change on decode boundary)


def test_stop_string(gen):
    # pick the first greedily generated char as a stop string
    first = gen.generate("xyz", max_new_tokens=1, temperature=0.0).text
    if not first:
        pytest.skip("model immediately produced eos")
    res = gen.generate("xyz", max_new_tokens=8, stop_strings=[first])
    assert first not in res.text


def test_sampling_with_temperature_runs(gen):
    res = gen.generate("ab", max_new_tokens=5, temperature=0.8, top_p=0.9, seed=3)
    assert isinstance(res.text, str)


def test_multimodal_prompt_generation(gen):
    img = np.zeros((1, 28, 28, 3), np.float32)
    res = gen.generate("<image>\nwhat?", images=img, max_new_tokens=3)
    assert isinstance(res.text, str)
    assert res.prompt_tokens > gen.cfg.num_image_tokens


def test_sample_token_greedy_vs_nucleus():
    logits = jnp.asarray([[0.0, 5.0, 1.0, -2.0]])
    key = jax.random.PRNGKey(0)
    g = sample_token(logits, key, jnp.float32(0.0), jnp.float32(1.0))
    assert int(g[0]) == 1
    # top_p tiny -> only argmax survives even at high temperature
    s = sample_token(logits, key, jnp.float32(10.0), jnp.float32(1e-6))
    assert int(s[0]) == 1
    # full nucleus at temp>0 samples valid indices
    for i in range(5):
        k = jax.random.PRNGKey(i)
        t = sample_token(logits, k, jnp.float32(1.0), jnp.float32(0.95))
        assert 0 <= int(t[0]) < 4


@pytest.mark.parametrize("chunk", [2, 4, 32])
def test_chunked_decode_matches_per_token(gen, chunk):
    """decode_chunk>1 (on-device lax.scan) must emit exactly the same text
    stream as per-token decode, including stop handling mid-chunk."""
    prompt = "hello"
    ref = list(gen.stream(prompt, max_new_tokens=11, temperature=0.0,
                          decode_chunk=1))
    got = list(gen.stream(prompt, max_new_tokens=11, temperature=0.0,
                          decode_chunk=chunk))
    assert got == ref


def test_chunked_decode_respects_stop_string(gen):
    ref = gen.generate("abc", max_new_tokens=12, temperature=0.0,
                       decode_chunk=1)
    got = gen.generate("abc", max_new_tokens=12, temperature=0.0,
                       decode_chunk=5)
    assert got.text == ref.text
    assert got.output_ids == ref.output_ids


def test_tensor_parallel_generator_matches_single_device():
    """TP serving: params sharded over an 8-way tp mesh produce the same
    greedy stream as unsharded (GSPMD inserts the collectives)."""
    from llava_plus_tpu.parallel.mesh import make_mesh

    cfg = tiny_llava_config()
    params = llava_model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tok = CharTokenizer()
    ref_gen = Generator(params, cfg, tok, max_seq_len=96, prefill_bucket=32,
                        cache_dtype=jnp.float32, attn_impl="xla")
    ref = ref_gen.generate("hello", max_new_tokens=8, temperature=0.0)

    mesh = make_mesh(1, 1, 2)  # tiny config has 2 kv heads
    tp_gen = Generator(params, cfg, tok, max_seq_len=96, prefill_bucket=32,
                       cache_dtype=jnp.float32, attn_impl="xla", mesh=mesh)
    got = tp_gen.generate("hello", max_new_tokens=8, temperature=0.0)
    assert got.text == ref.text
    assert got.output_ids == ref.output_ids


def test_fresh_prefill_matches_general_cache_path():
    """fresh_prefill=True (local-chunk attention + cache write) must equal
    the general cached path on an empty cache."""
    from llava_plus_tpu.models import llama

    cfg = tiny_llava_config()
    params = llava_model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    lm, tcfg = params["language_model"], cfg.text
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 100, size=(2, 7)))
    pos = np.broadcast_to(np.arange(7, dtype=np.int32), (2, 7)).copy()
    seg = np.ones((2, 7), np.int32)
    seg[1, 5:] = 0   # padded sample: padding positions point at max_len
    pos[1, 5:] = 16  # (mode="drop" discards the cache write), as the
    seg = jnp.asarray(seg)  # batch planner emits them
    pos = jnp.asarray(pos)

    c1 = llama.KVCache.create(tcfg, 2, 16, jnp.float32)
    ref, c1 = llama.forward(lm, tcfg, ids, positions=pos, segment_ids=seg,
                            cache=c1, attn_impl="xla")
    c2 = llama.KVCache.create(tcfg, 2, 16, jnp.float32)
    got, c2 = llama.forward(lm, tcfg, ids, positions=pos, segment_ids=seg,
                            cache=c2, attn_impl="xla", fresh_prefill=True)
    valid = np.asarray(seg).astype(bool)
    np.testing.assert_allclose(np.asarray(got)[valid], np.asarray(ref)[valid],
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(c2.k), np.asarray(c1.k), atol=1e-6)


def test_beam_search_matches_uncached_oracle(gen):
    """Vanilla beam search vs a cache-free reference: same expansion
    rules, full forward per step, no KV cache — catches cache row-reorder
    and backpointer bugs, the risky parts of the jitted implementation."""
    from llava_plus_tpu.models import llama

    prompt = "ab"
    nb, n_new = 3, 5
    eos = gen.tokenizer.eos_token_id
    prompt_ids = list(gen.tokenizer(prompt).input_ids)

    def next_logp(ids):
        logits, _ = llama.forward(
            gen.params["language_model"], gen.cfg.text,
            jnp.asarray([ids]), attn_impl="xla",
        )
        return np.asarray(
            jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))
        )

    beams = [(0.0, list(prompt_ids), False)]
    for _ in range(n_new):
        cands = []
        for score, ids, done in beams:
            if done:
                cands.append((score, ids, True))
                continue
            lp = next_logp(ids)
            for v in np.argsort(lp)[::-1][:nb]:
                cands.append(
                    (score + float(lp[v]), ids + [int(v)], int(v) == eos)
                )
        cands.sort(key=lambda c: -c[0])
        beams = cands[:nb]
        if all(d for _, _, d in beams):
            break
    finished = [(s / len(i[len(prompt_ids):]), i) for s, i, d in beams if d]
    if finished:
        _, best_ids = max(finished, key=lambda f: f[0])
        expect = best_ids[len(prompt_ids):-1]  # drop EOS
    else:
        best = max(beams, key=lambda b: b[0])
        expect = best[1][len(prompt_ids):]

    res = gen.beam_search(prompt, num_beams=nb, max_new_tokens=n_new)
    assert res.output_ids == expect, (res.output_ids, expect)


def test_beam_search_width_one_is_greedy(gen):
    a = gen.generate("hello", max_new_tokens=5, temperature=0.0)
    b = gen.beam_search("hello", num_beams=1, max_new_tokens=5)
    assert a.text == b.text


def test_beam_search_multimodal_smoke(gen):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 28, 28, 3)).astype(np.float32)
    res = gen.beam_search("<image>\nhi", images=img, num_beams=2,
                          max_new_tokens=3)
    assert 0 < len(res.output_ids) <= 3
