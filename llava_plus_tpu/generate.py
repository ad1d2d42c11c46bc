"""Generation engine: jit-compiled prefill + decode with host-side streaming.

Replaces the reference's HF ``generate()`` + Python-thread
``TextIteratorStreamer`` (``llava/serve/model_worker.py:174-192``) with a
TPU-shaped design: two compiled programs (bucketed prefill over the fused
multimodal batch; a fixed-shape single-token decode step over the KV cache)
driven by a host loop that yields cumulative text. Sampling (greedy /
temperature / top-p) runs on device.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from llava_plus_tpu.constants import IMAGE_TOKEN_INDEX
from llava_plus_tpu.data.multimodal import pad_images, plan_multimodal_batch
from llava_plus_tpu.models import llama, llava as llava_model, mpt
from llava_plus_tpu.models.configs import LlavaConfig
from llava_plus_tpu.models.llava import MultimodalBatch


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def sample_token(
    logits: jax.Array,      # [B, V] fp32
    key: jax.Array,
    temperature: jax.Array,  # scalar fp32; 0 => greedy
    top_p: jax.Array,        # scalar fp32 in (0, 1]
) -> jax.Array:
    """Temperature + nucleus sampling; greedy when temperature == 0."""
    greedy = jnp.argmax(logits, axis=-1)

    scaled = logits / jnp.maximum(temperature, 1e-6)
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # keep tokens while cumulative mass (exclusive) < top_p; always keep top-1
    keep_sorted = (cum - sorted_probs) < top_p
    cutoff = jnp.max(jnp.where(keep_sorted, sorted_logits, -jnp.inf), axis=-1, keepdims=True)
    filtered = jnp.where(scaled >= cutoff, scaled, -jnp.inf)
    sampled = jax.random.categorical(key, filtered, axis=-1)

    return jnp.where(temperature <= 0.0, greedy, sampled)


def prepare_multimodal_request(
    cfg: LlavaConfig,
    tokenizer,
    prompts: Sequence[str],
    images_per_prompt: Optional[Sequence[Optional[np.ndarray]]] = None,
    *,
    max_seq_len: int,
    prefill_bucket: int = 128,
    max_images: int = 1,
):
    """Tokenize prompts (with <image> sentinels) and build the fused batch."""
    from llava_plus_tpu.mm_utils import tokenizer_image_token

    ids_list = [
        np.asarray(tokenizer_image_token(p, tokenizer), dtype=np.int64)
        for p in prompts
    ]
    plan = plan_multimodal_batch(
        ids_list,
        num_patches=cfg.num_image_tokens,
        max_len=max_seq_len,
        max_images=max_images,
        pad_to_multiple=prefill_bucket,
    )
    img_hw = (cfg.vision.image_size, cfg.vision.image_size, 3)
    if images_per_prompt is None:
        images_per_prompt = [None] * len(prompts)
    imgs = pad_images(list(images_per_prompt), max_images, img_hw)
    batch = MultimodalBatch(
        tokens=jnp.asarray(plan.tokens),
        positions=jnp.asarray(plan.positions),
        segment_ids=jnp.asarray(plan.segment_ids),
        images=jnp.asarray(imgs),
        image_pos=jnp.asarray(plan.image_pos),
    )
    return batch, plan


@dataclasses.dataclass
class GenerationResult:
    text: str
    output_ids: List[int]
    prompt_tokens: int
    completion_tokens: int


class Generator:
    """Compiled multimodal generation over one model.

    Buckets prefill lengths to multiples of ``prefill_bucket`` so a handful of
    compiles covers all prompts; the decode step compiles once per batch size.
    """

    def __init__(
        self,
        params,
        cfg: LlavaConfig,
        tokenizer,
        image_processor=None,
        *,
        max_seq_len: Optional[int] = None,
        prefill_bucket: int = 128,
        cache_dtype=jnp.bfloat16,
        attn_impl: str = "auto",
        donate_cache: bool = True,
        mesh=None,
    ):
        if mesh is not None:
            # Tensor-parallel serving: shard params over the mesh's tp axis
            # (reusing the training rule table); GSPMD inserts the
            # all-reduces inside the jitted prefill/decode programs. This is
            # the realized version of the reference's pretraining_tp stub
            # (llava_llama.py:46).
            from llava_plus_tpu.train.step import place_params

            params = place_params(params, mesh, cfg)
        self.mesh = mesh
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.image_processor = image_processor
        self.max_seq_len = max_seq_len or cfg.max_sequence_length
        self.prefill_bucket = prefill_bucket
        self.cache_dtype = cache_dtype
        self.attn_impl = attn_impl

        @functools.partial(jax.jit, donate_argnums=(1,))
        def _prefill(params, cache, batch: MultimodalBatch):
            # logits at each sequence's last real token only (llama skips
            # the full [B, T, V] lm_head projection)
            last = jnp.maximum(jnp.sum(batch.segment_ids, axis=1) - 1, 0)
            if self.cfg.language_model_type == "llama":
                logits, cache = llava_model.forward(
                    params, self.cfg, batch, cache=cache,
                    attn_impl=self.attn_impl, fresh_prefill=True,
                    logits_positions=last,
                )
                return logits[:, 0], cache
            logits, cache = llava_model.forward(
                params, self.cfg, batch, cache=cache,
                attn_impl=self.attn_impl, fresh_prefill=True,
            )
            last_logits = jnp.take_along_axis(
                logits, last[:, None, None], axis=1
            )[:, 0]
            return last_logits, cache

        @functools.partial(jax.jit, donate_argnums=(1,))
        def _decode(params, cache, token, pos, key, temperature, top_p):
            seg = jnp.ones_like(token, jnp.int32)
            logits, cache = llava_model.decode_step(
                params, self.cfg, token, pos, seg, cache, attn_impl=self.attn_impl
            )
            nxt = sample_token(logits[:, 0], key, temperature, top_p)
            return nxt[:, None], cache

        @functools.partial(
            jax.jit, static_argnames=("n_steps",), donate_argnums=(1,)
        )
        def _decode_n(params, cache, token, pos, key, temperature, top_p,
                      *, n_steps: int):
            """n_steps decode iterations in ONE device program (lax.scan).

            Per-token host dispatch costs one tunnel round-trip on remote
            TPUs (~5 ms — comparable to the 7B step itself); scanning on
            device amortizes it to one round-trip per chunk. Returns the
            emitted tokens [B, n_steps] plus the carried (token, cache).
            """
            def body(carry, _):
                token, pos, key, cache = carry
                key, sub = jax.random.split(key)
                seg = jnp.ones_like(token, jnp.int32)
                logits, cache = llava_model.decode_step(
                    params, self.cfg, token, pos, seg, cache,
                    attn_impl=self.attn_impl,
                )
                nxt = sample_token(logits[:, 0], sub, temperature, top_p)
                return (nxt[:, None], pos + 1, key, cache), nxt

            (token, pos, key, cache), toks = jax.lax.scan(
                body, (token, pos, key, cache), None, length=n_steps
            )
            return jnp.swapaxes(toks, 0, 1), token, pos, key, cache

        self._prefill = _prefill
        self._decode = _decode
        self._decode_n = _decode_n

    # ------------------------------------------------------------------

    def _make_cache(self, batch_size: int):
        if self.cfg.language_model_type == "mpt":
            cache = mpt.create_cache(
                self.cfg.mpt, batch_size, self.max_seq_len, self.cache_dtype
            )
        else:
            cache = llama.KVCache.create(
                self.cfg.text, batch_size, self.max_seq_len, self.cache_dtype
            )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            head = NamedSharding(self.mesh, P(None, None, None, "tp", None))
            rep = NamedSharding(self.mesh, P())
            cache = llama.KVCache(
                k=jax.device_put(cache.k, head),
                v=jax.device_put(cache.v, head),
                seg=jax.device_put(cache.seg, rep),
                k_scale=(None if cache.k_scale is None
                         else jax.device_put(cache.k_scale, head)),
                v_scale=(None if cache.v_scale is None
                         else jax.device_put(cache.v_scale, head)),
            )
        return cache

    def prepare_batch(
        self,
        prompts: Sequence[str],
        images_per_prompt: Optional[Sequence[Optional[np.ndarray]]] = None,
        max_images: int = 1,
    ):
        return prepare_multimodal_request(
            self.cfg, self.tokenizer, prompts, images_per_prompt,
            max_seq_len=self.max_seq_len, prefill_bucket=self.prefill_bucket,
            max_images=max_images,
        )

    def stream(
        self,
        prompt: str,
        images: Optional[np.ndarray] = None,
        *,
        max_new_tokens: int = 256,
        temperature: float = 0.0,
        top_p: float = 1.0,
        stop_strings: Sequence[str] = (),
        seed: int = 0,
        decode_chunk: int = 1,
    ) -> Iterator[str]:
        """Yield cumulative generated text after each token (serving wire
        semantics, ref model_worker.py:187-192).

        ``decode_chunk > 1`` runs that many decode steps per device program
        (lax.scan) and still yields token-by-token from the fetched chunk —
        trading first-token-in-chunk latency for amortized dispatch. The
        only waste is the tail of the chunk where EOS/stop landed.
        """
        imgs = None if images is None else [images]
        batch, plan = self.prepare_batch([prompt], imgs)
        prompt_len = int(plan.lengths[0])
        self._last_prompt_len = prompt_len
        self._last_output_ids: List[int] = []
        budget = min(max_new_tokens, self.max_seq_len - prompt_len)

        cache = self._make_cache(1)
        last_logits, cache = self._prefill(self.params, cache, batch)

        key = jax.random.PRNGKey(seed)
        # reference CLIs pass top_p=None for "disabled" (run_llava.py arg
        # default); coerce the sentinel values here
        temp = jnp.float32(temperature if temperature is not None else 0.0)
        tp = jnp.float32(top_p if top_p is not None else 1.0)
        key, sub = jax.random.split(key)
        token = sample_token(last_logits, sub, temp, tp)[:, None]

        eos = self.tokenizer.eos_token_id
        out_ids: List[int] = []
        pos = prompt_len
        emitted = 0
        pending: List[int] = []  # tokens fetched but not yet emitted

        def emit(tid):
            """Append tid; return (text, done). None text = suppressed."""
            if tid == eos:
                return None, True
            out_ids.append(tid)
            self._last_output_ids = out_ids
            text = self.tokenizer.decode(out_ids, skip_special_tokens=True)
            for s in stop_strings:
                if s and s in text:
                    return text.split(s)[0], True
            return text, False

        # `token` always holds the newest unemitted token (device array);
        # `pending` holds older fetched-but-unemitted tokens. A new decode
        # may only be dispatched right after the carry token is emitted —
        # dispatching earlier would consume (and lose) it.
        while emitted < budget:
            if pending:
                text, done = emit(pending.pop(0))
                if text is not None:
                    yield text
                emitted += 1
                if done:
                    break
                continue
            text, done = emit(int(token[0, 0]))
            if text is not None:
                yield text
            emitted += 1
            if done or emitted >= budget:
                break
            k = min(max(decode_chunk, 1), budget - emitted)
            if k > 1:
                toks, token, _, key, cache = self._decode_n(
                    self.params, cache, token,
                    jnp.full((1, 1), pos, jnp.int32), key, temp, tp,
                    n_steps=k,
                )
                # the scan's carry (`token`) IS the last scanned emission;
                # queue only the first k-1 so it isn't emitted twice
                pending = [int(t) for t in np.asarray(jax.device_get(toks))[0][:-1]]
            else:
                key, sub = jax.random.split(key)
                token, cache = self._decode(
                    self.params, cache,
                    token, jnp.full((1, 1), pos, jnp.int32), sub, temp, tp,
                )
            pos += k

    def beam_search(
        self,
        prompt: str,
        images: Optional[np.ndarray] = None,
        *,
        num_beams: int,
        max_new_tokens: int = 128,
        length_penalty: float = 1.0,
        stop_strings: Sequence[str] = (),
    ) -> GenerationResult:
        """Vanilla fixed-width beam search (the reference eval CLIs'
        ``--num_beams``; HF ``generate(num_beams=N)`` with default
        length_penalty covers every published config — all MODEL_ZOO
        evals use 1). Deviations from HF's implementation, documented in
        PARITY.md: top-``nb`` selection (not HF's 2*nb candidate pool),
        finished beams are frozen in place, stop-strings truncate at
        finalization.

        TPU shape: the nb beams ARE the batch — one prefill of nb
        identical rows, then per step ONE jitted decode of [nb, 1]
        tokens, a top-k expand/select, and a cache row-gather by parent
        beam (k/v are [L, B, S, H, D]; the gather is a batch-axis take
        XLA fuses with the step).
        """
        nb = int(num_beams)
        if nb <= 1:
            return self.generate(prompt, images,
                                 max_new_tokens=max_new_tokens,
                                 temperature=0.0,
                                 stop_strings=stop_strings)
        imgs = None if images is None else [images] * 1
        batch, plan = self.prepare_batch([prompt] * nb, imgs * nb if imgs else None)
        prompt_len = int(plan.lengths[0])
        budget = min(max_new_tokens, self.max_seq_len - prompt_len)
        eos = self.tokenizer.eos_token_id

        cache = self._make_cache(nb)
        last_logits, cache = self._prefill(self.params, cache, batch)

        @functools.partial(jax.jit, donate_argnums=(3,))
        def select(logits, scores, done, cache):
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            V = logp.shape[-1]
            cand = jnp.where(done[:, None], -jnp.inf, scores[:, None] + logp)
            # a finished beam survives as exactly ONE frozen candidate
            cand = cand.at[:, 0].set(jnp.where(done, scores, cand[:, 0]))
            top_scores, top_idx = jax.lax.top_k(cand.reshape(-1), nb)
            parent = top_idx // V
            tok = (top_idx % V).astype(jnp.int32)
            was_done = done[parent]
            new_done = was_done | (tok == eos)
            cache = jax.tree.map(
                lambda a: (jnp.take(a, parent, axis=1) if a.ndim >= 3
                           else jnp.take(a, parent, axis=0)),
                cache,
            )
            return tok, parent, top_scores, new_done, was_done, cache

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(params, cache, token, pos, live):
            seg = live.astype(jnp.int32)[:, None]
            logits, cache = llava_model.decode_step(
                params, self.cfg, token, pos, seg, cache,
                attn_impl=self.attn_impl,
            )
            return logits[:, 0], cache

        # beam 0 starts live, the rest at -inf (all rows are identical
        # clones until the first expansion)
        scores = jnp.asarray([0.0] + [-np.inf] * (nb - 1), jnp.float32)
        done = jnp.zeros((nb,), bool)
        logits = last_logits
        history: List[tuple] = []   # (tok[nb], parent[nb]) per step
        finished: List[tuple] = []  # (score_normalized, step_idx, beam)

        def reconstruct(t_end, beam):
            """Token path for `beam` through steps [0, t_end] inclusive."""
            ids = []
            b = beam
            for t in range(t_end, -1, -1):
                tok_t, par_t = history[t]
                ids.append(int(tok_t[b]))
                b = int(par_t[b])
            return ids[::-1]

        pos = prompt_len
        for t in range(budget):
            tok, parent, scores, done, was_done, cache = select(
                logits, scores, done, cache
            )
            tok_h = np.asarray(jax.device_get(tok))
            par_h = np.asarray(jax.device_get(parent))
            done_h = np.asarray(jax.device_get(done))
            was_h = np.asarray(jax.device_get(was_done))
            sc_h = np.asarray(jax.device_get(scores))
            history.append((tok_h, par_h))
            for b in range(nb):
                if done_h[b] and not was_h[b]:
                    # freshly finished: tokens up to (not incl.) this EOS
                    n_tok = t  # EOS at step t => t real tokens before it
                    norm = sc_h[b] / max(n_tok + 1, 1) ** length_penalty
                    finished.append((norm, t, b))
            if bool(done_h.all()):
                break
            logits, cache = step(
                self.params, cache, tok[:, None],
                jnp.full((nb, 1), pos, jnp.int32),
                ~done,
            )
            pos += 1

        t_last = len(history) - 1
        if finished:
            norm, t_end, beam = max(finished, key=lambda f: f[0])
            ids = reconstruct(t_end, beam)[:-1]  # drop the EOS itself
        else:
            sc_h = np.asarray(jax.device_get(scores))
            n = t_last + 1
            best = int(np.argmax(sc_h / max(n, 1) ** length_penalty))
            ids = reconstruct(t_last, beam=best)
        text = self.tokenizer.decode(ids, skip_special_tokens=True)
        for s in stop_strings:
            if s and s in text:
                text = text.split(s)[0]
        self._last_prompt_len = prompt_len
        self._last_output_ids = ids
        return GenerationResult(
            text=text,
            output_ids=ids,
            prompt_tokens=prompt_len,
            completion_tokens=len(ids),
        )

    def generate(
        self,
        prompt: str,
        images: Optional[np.ndarray] = None,
        **kw,
    ) -> GenerationResult:
        # Non-streaming callers don't need per-token latency; decode in
        # 32-token device programs unless the caller chose otherwise.
        kw.setdefault("decode_chunk", 32)
        text = ""
        for text in self.stream(prompt, images, **kw):
            pass
        return GenerationResult(
            text=text,
            output_ids=list(self._last_output_ids),
            prompt_tokens=self._last_prompt_len,
            completion_tokens=len(self._last_output_ids),
        )
