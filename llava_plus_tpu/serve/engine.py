"""Continuous-batching inference engine.

The reference serves one generation per Python thread through HF
``generate()`` (``llava/serve/model_worker.py:174-185``) — concurrency is a
semaphore, not batching. Here a single engine thread drives one compiled
decode step over a fixed pool of B slots; requests join (prefill into a free
slot) and leave (eos/stop/budget) between steps, so the bandwidth-bound
decode cost is shared by every active request.

Shapes are fixed (B slots x cache_len) -> a handful of compiled programs:
bucketed prefill (batch 1), the batched decode step (single and chunked),
and optionally the speculative verify step (``speculate=k``: current token
+ k prompt-lookup proposals checked in one multi-token cache pass) or the
paged-pool variants (``paged=True``).
"""

from __future__ import annotations

import dataclasses
import functools
import queue
import threading
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from llava_plus_tpu.generate import sample_token
from llava_plus_tpu.models import llama, llava as llava_model, mpt
from llava_plus_tpu.models.configs import LlavaConfig
from llava_plus_tpu.models.llava import MultimodalBatch
from llava_plus_tpu.utils.logging import build_logger

logger = build_logger("engine", "engine.log")


@dataclasses.dataclass
class Request:
    prompt: str
    images: Optional[np.ndarray] = None
    max_new_tokens: int = 256
    temperature: float = 0.0
    top_p: float = 1.0
    stop_strings: Sequence[str] = ()
    seed: int = 0

    # filled by the engine
    submit_ts: float = 0.0
    first_token_ts: float = 0.0
    _chunks: "queue.Queue" = dataclasses.field(
        default_factory=queue.Queue, repr=False
    )
    _done: threading.Event = dataclasses.field(
        default_factory=threading.Event, repr=False
    )

    @property
    def ttft(self) -> Optional[float]:
        if self.first_token_ts and self.submit_ts:
            return self.first_token_ts - self.submit_ts
        return None


@dataclasses.dataclass
class _Slot:
    request: Optional[Request] = None
    out_ids: List[int] = dataclasses.field(default_factory=list)
    pos: int = 0
    budget: int = 0
    key: Optional[jax.Array] = None
    # the prefill already emitted this slot's first token; the next decode
    # column for it is that same token and must not be emitted twice
    skip_next_emit: bool = False
    pages: List[int] = dataclasses.field(default_factory=list)
    # prompt + generated token ids (prompt-lookup speculation source)
    history: List[int] = dataclasses.field(default_factory=list)


class _PoolExhausted(Exception):
    """Not enough free KV pages to admit; retry after slots finish."""


@dataclasses.dataclass
class _Prepared:
    """A request whose prefill finished (first token already emitted to
    the client); waiting for the engine loop to insert it into a slot."""

    req: Request
    cache1: object          # bucket-sized single-request cache (device)
    first: jax.Array        # [1] first sampled token (device)
    first_id: int
    prompt_len: int
    budget: int
    key: jax.Array
    out_ids: List[int]
    history: List[int]
    needed_pages: int


class BatchedEngine:
    def __init__(
        self,
        params,
        cfg: LlavaConfig,
        tokenizer,
        *,
        max_slots: int = 8,
        max_seq_len: int = 2048,
        prefill_bucket: int = 256,
        cache_dtype=jnp.bfloat16,
        idle_sleep: float = 0.002,
        decode_chunk: int = 4,
        mesh=None,
        paged: bool = False,
        page_size: int = 128,
        pool_tokens: Optional[int] = None,
        speculate: int = 0,
    ):
        """``paged=True`` switches the KV cache to a paged pool: pages are
        allocated per request for prompt + budget, so long contexts
        (max_seq_len > 2048) and short chats share one HBM pool densely.
        ``pool_tokens`` sizes the pool (default: max_slots * max_seq_len,
        i.e. no overcommit); requests queue when the pool is exhausted."""
        if mesh is not None:
            from llava_plus_tpu.train.step import place_params

            params = place_params(params, mesh, cfg)
        self.mesh = mesh
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_slots = max_slots
        self.max_seq_len = max_seq_len
        self.prefill_bucket = prefill_bucket
        self.cache_dtype = cache_dtype
        self.idle_sleep = idle_sleep
        self.decode_chunk = max(decode_chunk, 1)
        self.paged = paged
        self.page_size = page_size
        # Under a tp mesh the paged Pallas kernel has no GSPMD partitioning
        # rule (the pool would replicate per layer); force the sharded XLA
        # gather path instead (models/llama.py:_paged_layer_attention).
        self._attn_impl = "xla" if mesh is not None else "auto"
        # prompt-lookup speculative decoding (greedy-exact): propose k
        # tokens by n-gram match against prompt+output, verify in ONE
        # multi-token step. Decode is bandwidth-bound, so a (k+1)-token
        # verify costs about one step; accepted tokens are free.
        self.speculate = max(int(speculate), 0)
        if self.speculate:
            assert not paged, "speculation uses the dense-cache engine"
        if paged:
            assert cfg.language_model_type == "llama", \
                "paged KV cache currently supports the llama decoder"
            assert max_seq_len % page_size == 0
            assert prefill_bucket % page_size == 0
            total = pool_tokens or max_slots * max_seq_len
            self.num_pages = max(total // page_size, max_seq_len // page_size)
            self._free_pages = list(range(self.num_pages))
        else:
            self.num_pages = 0

        self._queue: "queue.Queue[Request]" = queue.Queue()
        self._ready: "queue.Queue[_Prepared]" = queue.Queue()
        self._slots = [_Slot() for _ in range(max_slots)]
        self._stop = threading.Event()
        self._waiting: Optional[_Prepared] = None  # held back: pool exhausted
        from collections import deque

        self.ttfts: "deque[float]" = deque(maxlen=512)
        self.spec_steps = 0
        self.spec_emitted = 0
        # adaptive gating: recent per-step acceptance; when speculation
        # is not paying (content not repetitive), decode plain chunks and
        # re-probe periodically instead of paying the verify overhead
        self._spec_recent: "deque[int]" = deque(maxlen=32)
        self._spec_pause = 0
        self.spec_pause_len = 64  # plain chunks decoded per re-probe cycle
        self.spec_pauses = 0      # times adaptive gating kicked in

        self._build_programs()

        self.cache = self._make_cache()
        self.tokens = jnp.zeros((max_slots, 1), jnp.int32)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self._prefill_thread = threading.Thread(
            target=self._prefill_loop, daemon=True
        )
        self._prefill_thread.start()

    # ------------------------------------------------------------------

    def _make_cache(self, batch=None, seq_len=None, force_dense=False):
        batch = batch or self.max_slots
        seq_len = seq_len or self.max_seq_len
        if self.paged and not force_dense:
            cache = llama.PagedKVCache.create(
                self.cfg.text, batch,
                num_pages=self.num_pages,
                max_pages_per_slot=self.max_seq_len // self.page_size,
                page_size=self.page_size,
                dtype=self.cache_dtype,
            )
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                head = NamedSharding(
                    self.mesh, P(None, None, None, "tp", None, None)
                )
                shead = NamedSharding(
                    self.mesh, P(None, None, None, "tp", None)
                )
                rep = NamedSharding(self.mesh, P())
                cache = llama.PagedKVCache(
                    kv=jax.device_put(cache.kv, head),
                    seg=jax.device_put(cache.seg, rep),
                    page_table=jax.device_put(cache.page_table, rep),
                    alloc=jax.device_put(cache.alloc, rep),
                    kv_scale=(None if cache.kv_scale is None
                              else jax.device_put(cache.kv_scale, shead)),
                )
            return cache
        if self.cfg.language_model_type == "mpt":
            cache = mpt.create_cache(
                self.cfg.mpt, batch, seq_len, self.cache_dtype
            )
        else:
            cache = llama.KVCache.create(
                self.cfg.text, batch, seq_len, self.cache_dtype
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

    def _build_programs(self):
        cfg = self.cfg

        @jax.jit
        def prefill(params, batch: MultimodalBatch, cache1):
            last = jnp.maximum(jnp.sum(batch.segment_ids, axis=1) - 1, 0)
            if cfg.language_model_type == "llama":
                # lm_head only at the last valid position: skips the
                # [B, T, V] projection (~0.5 GB + a T-long matmul at 7B)
                logits, cache1 = llava_model.forward(
                    params, cfg, batch, cache=cache1, fresh_prefill=True,
                    logits_positions=last,
                )
                return logits[:, 0], cache1
            logits, cache1 = llava_model.forward(
                params, cfg, batch, cache=cache1, fresh_prefill=True
            )
            last_logits = jnp.take_along_axis(
                logits, last[:, None, None], axis=1
            )[:, 0]
            return last_logits, cache1

        # donate only the pool cache (argnum 0): the single-request
        # cache1's bucket-shaped buffers can never alias the pool-shaped
        # outputs, and donating them makes XLA emit "donated buffers were
        # not usable" warnings (a failed alias on the pool itself would
        # double peak HBM during admission). cache1 is freed by refcount
        # as soon as the call retires.
        @functools.partial(jax.jit, donate_argnums=(0,))
        def insert(cache, cache1, slot, first_token, tokens):
            # cache1 is BUCKET-sized (S1 <= max_seq_len): copy only its
            # stripe into rows [0:S1] of slot `slot` (the prefill never
            # allocates or copies a full max_seq_len cache). The seg row is
            # rebuilt from zeros so stale entries from the slot's previous
            # occupant are never attended.
            def upd(pool, single):
                return jax.lax.dynamic_update_slice(
                    pool, single.astype(pool.dtype)[:, :1],
                    (0, slot) + (0,) * (pool.ndim - 2),
                )

            seg_row = jnp.zeros((1, cache.seg.shape[1]), jnp.int32)
            seg_row = jax.lax.dynamic_update_slice(
                seg_row, cache1.seg[:1], (0, 0)
            )
            cache = llama.KVCache(
                k=upd(cache.k, cache1.k),
                v=upd(cache.v, cache1.v),
                seg=jax.lax.dynamic_update_slice(
                    cache.seg, seg_row, (slot, 0)
                ),
                k_scale=(None if cache.k_scale is None
                         else upd(cache.k_scale, cache1.k_scale)),
                v_scale=(None if cache.v_scale is None
                         else upd(cache.v_scale, cache1.v_scale)),
            )
            tokens = jax.lax.dynamic_update_index_in_dim(
                tokens, first_token, slot, axis=0
            )
            return cache, tokens

        @functools.partial(jax.jit, donate_argnums=(0,))
        def insert_paged(cache, cache1, slot, pages_vec, n_alloc,
                         first_token, tokens):
            """Scatter a single-request dense prefill cache (bucket-sized)
            into the combined paged pool at this slot's allocated pages."""
            L, _, S1, Hkv, Dh = cache1.k.shape
            P = cache.page_size
            n1 = S1 // P

            def chunks(single, trailing):
                c = single[:, 0].reshape(L, n1, P, Hkv, trailing)
                return c.transpose(0, 1, 3, 2, 4)  # [L, n1, Hkv, P, tr]

            kv = cache.kv
            kv = kv.at[:, pages_vec[:n1], 0].set(
                chunks(cache1.k, Dh).astype(kv.dtype))
            kv = kv.at[:, pages_vec[:n1], 1].set(
                chunks(cache1.v, Dh).astype(kv.dtype))
            kv_scale = cache.kv_scale
            if kv_scale is not None:
                kv_scale = kv_scale.at[:, pages_vec[:n1], 0].set(
                    chunks(cache1.k_scale, 1)[..., 0])
                kv_scale = kv_scale.at[:, pages_vec[:n1], 1].set(
                    chunks(cache1.v_scale, 1)[..., 0])

            seg_row = jnp.zeros((cache.seg.shape[1],), jnp.int32)
            seg_row = jax.lax.dynamic_update_slice(seg_row, cache1.seg[0], (0,))
            cache = llama.PagedKVCache(
                kv=kv,
                seg=cache.seg.at[slot].set(seg_row),
                page_table=cache.page_table.at[slot].set(pages_vec),
                alloc=cache.alloc.at[slot].set(n_alloc),
                kv_scale=kv_scale,
            )
            tokens = jax.lax.dynamic_update_index_in_dim(
                tokens, first_token, slot, axis=0
            )
            return cache, tokens

        @functools.partial(jax.jit, donate_argnums=(1,))
        def decode(params, cache, tokens, positions, active, keys,
                   temperature, top_p):
            seg = active[:, None].astype(jnp.int32)
            logits, cache = llava_model.decode_step(
                params, cfg, tokens, positions[:, None], seg, cache,
                attn_impl=self._attn_impl,
            )
            nxt = _sample_batch(logits[:, 0], keys, temperature, top_p)
            nxt = jnp.where(active, nxt, 0)
            return nxt[:, None], cache

        @functools.partial(
            jax.jit, static_argnames=("n_steps",), donate_argnums=(1,)
        )
        def decode_n(params, cache, tokens, positions, active, keys,
                     temperature, top_p, *, n_steps):
            """n_steps batched decode steps as ONE device program.

            Per-step sampling keys are fold_in(request_key, position) —
            deterministic per request with no key carry, so the host only
            round-trips once per chunk instead of twice per token. Slots
            whose request finishes mid-chunk keep stepping (their tail
            tokens are discarded host-side; the cache garbage is
            overwritten on the next insert).
            """
            def body(carry, _):
                tokens, positions, cache = carry
                seg = active[:, None].astype(jnp.int32)
                logits, cache = llava_model.decode_step(
                    params, cfg, tokens, positions[:, None], seg, cache,
                    attn_impl=self._attn_impl,
                )
                subs = jax.vmap(jax.random.fold_in)(keys, positions)
                nxt = _sample_batch(logits[:, 0], subs, temperature, top_p)
                nxt = jnp.where(active, nxt, 0)
                return (nxt[:, None], positions + 1, cache), nxt

            (tokens, positions, cache), toks = jax.lax.scan(
                body, (tokens, positions, cache), None, length=n_steps
            )
            return jnp.swapaxes(toks, 0, 1), tokens, cache

        def _sample_batch(logits, keys, temperature, top_p):
            greedy = jnp.argmax(logits, axis=-1)
            scaled = logits / jnp.maximum(temperature[:, None], 1e-6)
            sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep = (cum - probs) < top_p[:, None]
            cutoff = jnp.max(
                jnp.where(keep, sorted_logits, -jnp.inf), axis=-1, keepdims=True
            )
            filtered = jnp.where(scaled >= cutoff, scaled, -jnp.inf)
            sampled = jax.vmap(
                lambda k, l: jax.random.categorical(k, l)
            )(keys, filtered)
            return jnp.where(temperature <= 0.0, greedy, sampled)

        @functools.partial(
            jax.jit, static_argnames=("k",), donate_argnums=(1,)
        )
        def verify(params, cache, tokens, positions, seg, keys,
                   temperature, top_p, *, k):
            """Speculative verify: tokens [B, k+1] (current + k proposals)
            in ONE cache step. Returns per-position greedy continuations
            (exact-match acceptance host-side) plus a sampled token for
            position 0 (slots with temperature > 0 fall back to 1
            token/step)."""
            logits, cache = llava_model.decode_step(
                params, cfg, tokens, positions, seg, cache,
                attn_impl=self._attn_impl,
            )                                       # [B, k+1, V]
            greedy = jnp.argmax(logits, axis=-1)    # [B, k+1]
            sampled0 = _sample_batch(
                logits[:, 0], keys, temperature, top_p
            )                                       # [B]
            # one [B, k+2] output -> ONE host fetch per step
            return jnp.concatenate(
                [greedy, sampled0[:, None]], axis=1
            ), cache

        self._prefill = prefill
        self._insert = insert
        self._insert_paged = insert_paged
        self._decode = decode
        self._decode_n = decode_n
        self._verify = verify

    # -- public API ----------------------------------------------------

    def submit(self, request: Request) -> Request:
        request.submit_ts = time.time()
        self._queue.put(request)
        return request

    def stream(self, request: Request):
        """Yield cumulative text for a submitted request."""
        self.submit(request)
        while True:
            try:
                item = request._chunks.get(timeout=600)
            except queue.Empty:
                return
            if item is None:
                return
            yield item

    def generate(self, request: Request) -> str:
        text = ""
        for text in self.stream(request):
            pass
        return text

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5)
        self._prefill_thread.join(timeout=5)

    @property
    def num_active(self) -> int:
        return sum(1 for s in self._slots if s.request is not None)

    # -- engine loop ----------------------------------------------------

    def _prefill_loop(self):
        """Dedicated prefill pipeline: host tokenization + image prep +
        the prefill program + the first-token fetch all run here,
        OVERLAPPED with the engine loop's decode chunks (device programs
        serialize; the host work and the fetch barrier no longer stall
        decode dispatch). The engine loop only performs the cheap insert.
        TTFT is the first-token fetch in this thread — prefill latency,
        independent of slot availability."""
        while not self._stop.is_set():
            # bound prefill-ahead: each prepared item holds a bucket-sized
            # single-request cache on device until inserted
            if self._ready.qsize() >= 2:
                time.sleep(self.idle_sleep)
                continue
            try:
                req = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            try:
                prep = self._prepare(req)
            except Exception as e:
                logger.error(f"prefill failed: {e}")
                req._chunks.put(None)
                req._done.set()
                continue
            if prep is not None:
                self._ready.put(prep)

    def _prepare(self, req: Request) -> Optional["_Prepared"]:
        from llava_plus_tpu.generate import prepare_multimodal_request

        batch, plan = prepare_multimodal_request(
            self.cfg, self.tokenizer, [req.prompt],
            [req.images] if req.images is not None else None,
            max_seq_len=self.max_seq_len, prefill_bucket=self.prefill_bucket,
        )
        prompt_len = int(plan.lengths[0])
        budget = min(req.max_new_tokens, self.max_seq_len - prompt_len - 1)
        S1 = int(batch.tokens.shape[1])
        needed_pages = 0
        if self.paged:
            P = self.page_size
            needed_pages = max(S1 // P, -(-(prompt_len + budget + 1) // P))

        # single-request bucket prefill is dense (bucket-sized cache)
        cache1 = self._make_cache(batch=1, seq_len=S1, force_dense=True)
        last_logits, cache1 = self._prefill(self.params, batch, cache1)
        key = jax.random.PRNGKey(req.seed)
        key, sub = jax.random.split(key)
        first = sample_token(
            last_logits, sub,
            jnp.float32(req.temperature), jnp.float32(req.top_p),
        )[0]

        # First-token fetch == the barrier on the prefill program; emit it
        # to the client NOW (before any slot/page allocation): TTFT is the
        # prefill latency.
        tid = int(np.asarray(jax.device_get(first)))
        req.first_token_ts = time.time()
        if req.submit_ts:
            self.ttfts.append(req.first_token_ts - req.submit_ts)

        out_ids: List[int] = []
        finished = False
        if tid == self.tokenizer.eos_token_id or budget <= 0:
            finished = True
        else:
            out_ids.append(tid)
            budget -= 1
            text = self.tokenizer.decode(out_ids, skip_special_tokens=True)
            for stop_s in req.stop_strings:
                if stop_s and stop_s in text:
                    text = text.split(stop_s)[0]
                    finished = True
            req._chunks.put(text)
        if finished:
            req._chunks.put(None)
            req._done.set()
            return None  # never occupies a slot

        history = [int(t) for t in np.asarray(batch.tokens[0])[:prompt_len]]
        history.append(tid)
        return _Prepared(
            req=req, cache1=cache1, first=first, first_id=tid,
            prompt_len=prompt_len, budget=budget, key=key,
            out_ids=out_ids, history=history, needed_pages=needed_pages,
        )

    def _admit(self):
        free = [i for i, s in enumerate(self._slots) if s.request is None]
        while free:
            prep = self._waiting
            self._waiting = None
            if prep is None:
                try:
                    prep = self._ready.get_nowait()
                except queue.Empty:
                    break
            slot_id = free.pop(0)
            try:
                self._insert_prepared(slot_id, prep)
            except _PoolExhausted:
                # hold the prepared request until finished slots free pages
                self._waiting = prep
                break
            except Exception as e:
                logger.error(f"insert failed: {e}")
                prep.req._chunks.put(None)
                prep.req._done.set()

    def _insert_prepared(self, slot_id: int, prep: "_Prepared"):
        req = prep.req
        pages: List[int] = []
        if self.paged:
            if len(self._free_pages) < prep.needed_pages:
                raise _PoolExhausted(prep.needed_pages)
            pages = [self._free_pages.pop() for _ in range(prep.needed_pages)]
            maxp = self.max_seq_len // self.page_size
            pages_vec = jnp.asarray((pages + [0] * maxp)[:maxp], jnp.int32)
            try:
                self.cache, self.tokens = self._insert_paged(
                    self.cache, prep.cache1, slot_id, pages_vec,
                    jnp.int32(len(pages) * self.page_size),
                    prep.first[None], self.tokens,
                )
            except Exception:
                self._free_pages.extend(pages)
                raise
        else:
            self.cache, self.tokens = self._insert(
                self.cache, prep.cache1, slot_id, prep.first[None],
                self.tokens,
            )
        slot = self._slots[slot_id]
        slot.request = req
        slot.out_ids = prep.out_ids
        slot.pos = prep.prompt_len
        slot.budget = prep.budget
        slot.key = prep.key
        slot.pages = pages
        slot.history = prep.history
        # the prefill already emitted this slot's first token; the next
        # decode column for it is that same token — do not emit it twice
        slot.skip_next_emit = True

    def _emit_token(self, slot: _Slot, tid: int) -> bool:
        """Emit one decoded token for a slot (eos/budget/stop semantics,
        KeywordsStoppingCriteria's decoded-substring matching). Frees the
        slot and returns True when the request finished."""
        req = slot.request
        finished = False
        if tid == self.tokenizer.eos_token_id or slot.budget <= 0:
            finished = True
        else:
            slot.out_ids.append(tid)
            slot.history.append(tid)
            slot.budget -= 1
            text = self.tokenizer.decode(slot.out_ids, skip_special_tokens=True)
            for stop_s in req.stop_strings:
                if stop_s and stop_s in text:
                    text = text.split(stop_s)[0]
                    finished = True
            req._chunks.put(text)
        if finished:
            req._chunks.put(None)
            req._done.set()
            slot.request = None
            if slot.pages:
                self._free_pages.extend(slot.pages)
                slot.pages = []
        return finished

    def _emit_column(self, tokens_host):
        """Host bookkeeping for one decoded column: emit each active slot's
        token, applying eos/budget/stop; free finished slots."""
        for i, slot in enumerate(self._slots):
            if slot.request is None:
                continue
            if slot.skip_next_emit:
                slot.skip_next_emit = False
                continue
            self._emit_token(slot, int(tokens_host[i]))

    def _current_tokens(self) -> np.ndarray:
        """Host mirror of each slot's current token (= last emitted token,
        slot.history tail) — the speculative pipeline never round-trips
        the device for it."""
        return np.array([
            (slot.history[-1] if slot.request is not None and slot.history
             else 0) for slot in self._slots
        ], np.int32)

    def _propose(self, slot: "_Slot", k: int) -> List[int]:
        """Prompt-lookup proposal: match the longest recent n-gram
        (n = 3, 2, 1) of the history against itself and propose the k
        tokens that followed the earlier occurrence."""
        h = slot.history
        L = len(h)
        for n in (3, 2, 1):
            if L <= n:
                continue
            tail = h[-n:]
            # search latest earlier occurrence (skip the tail itself)
            for j in range(L - n - 1, -1, -1):
                if h[j:j + n] == tail:
                    cont = h[j + n:j + n + k]
                    if cont:
                        return (cont + [0] * k)[:k]
                    break
        return [0] * k

    def _spec_step(self, active_idx):
        """One speculative decode iteration: verify current token + k
        proposals per slot in one program; accept the exactly-matching
        greedy prefix (greedy slots), or one sampled token (temp > 0)."""
        k = self.speculate
        B = self.max_slots
        tokens = np.zeros((B, k + 1), np.int32)
        positions = np.full((B, k + 1), self.max_seq_len, np.int32)
        seg = np.zeros((B, k + 1), np.int32)
        temps = np.zeros((B,), np.float32)
        tops = np.ones((B,), np.float32)
        subs = []
        cur = self._current_tokens()
        proposals = {}
        for i, slot in enumerate(self._slots):
            if slot.request is None:
                subs.append(jax.random.PRNGKey(0))
                continue
            slot.skip_next_emit = False
            req = slot.request
            temps[i] = req.temperature
            tops[i] = req.top_p
            tokens[i, 0] = cur[i]
            positions[i, 0] = slot.pos
            seg[i, 0] = 1
            if req.temperature <= 0.0:
                prop = self._propose(slot, k)
                proposals[i] = prop
                for j, t in enumerate(prop):
                    pos = slot.pos + 1 + j
                    if pos < self.max_seq_len:
                        tokens[i, 1 + j] = t
                        positions[i, 1 + j] = pos
                        seg[i, 1 + j] = 1
            slot.key, sub = jax.random.split(slot.key)
            subs.append(sub)

        out, self.cache = self._verify(
            self.params, self.cache, jnp.asarray(tokens),
            jnp.asarray(positions), jnp.asarray(seg), jnp.stack(subs),
            jnp.asarray(temps), jnp.asarray(tops), k=k,
        )
        out = np.asarray(jax.device_get(out))
        greedy, sampled0 = out[:, :-1], out[:, -1]

        self.spec_steps += 1
        for i, slot in enumerate(self._slots):
            if slot.request is None:
                continue
            req = slot.request
            if req.temperature > 0.0:
                tid = int(sampled0[i])
                slot.pos += 1
                self._emit_token(slot, tid)
                continue
            prop = proposals[i]
            emitted = 0
            finished = False
            # column j's greedy output is the token AFTER tokens[:, j];
            # accept while it equals the next proposal
            for j in range(k + 1):
                if positions[i, j] >= self.max_seq_len or seg[i, j] == 0:
                    break
                tid = int(greedy[i, j])
                finished = self._emit_token(slot, tid)
                emitted += 1
                if finished:
                    break
                if j < k and (seg[i, 1 + j] == 0 or prop[j] != tid):
                    break
            self.spec_emitted += emitted
            self._spec_recent.append(emitted)
            if not finished:
                slot.pos += emitted

    @property
    def spec_acceptance(self) -> float:
        """Mean tokens emitted per speculative step (>= 1.0; k+1 max)."""
        return self.spec_emitted / self.spec_steps if self.spec_steps else 0.0

    def _loop(self):
        while not self._stop.is_set():
            self._admit()
            active_idx = [
                i for i, s in enumerate(self._slots) if s.request is not None
            ]
            if not active_idx:
                time.sleep(self.idle_sleep)
                continue

            if self.speculate:
                if self._spec_pause > 0:
                    # paused: fall through to plain chunked decode below
                    self._spec_pause -= 1
                    if self._spec_pause == 0:
                        # plain -> spec: the plain pipeline holds one not-
                        # yet-emitted token in self.tokens; emit it so the
                        # host mirror (slot.history) is current again
                        self._emit_column(
                            np.asarray(jax.device_get(self.tokens))[:, 0]
                        )
                        self._spec_recent.clear()
                        self._spec_step(active_idx)
                        continue
                else:
                    self._spec_step(active_idx)
                    if (len(self._spec_recent) == self._spec_recent.maxlen
                            and (sum(self._spec_recent)
                                 / len(self._spec_recent)) < 1.3):
                        # acceptance too low to beat the verify overhead:
                        # decode plainly for a while, then re-probe.
                        # spec -> plain: seed the pipeline with the (already
                        # emitted) current tokens and skip their re-emission
                        self._spec_pause = self.spec_pause_len
                        self.spec_pauses += 1
                        self.tokens = jnp.asarray(
                            self._current_tokens()[:, None]
                        )
                        for sl in self._slots:
                            if sl.request is not None:
                                sl.skip_next_emit = True
                    continue

            # Adaptive chunking: with a prepared request waiting to
            # insert, run a short chunk so the next admission point arrives
            # sooner (the request's FIRST token was already emitted by the
            # prefill thread; this bounds its second-token latency).
            k = (1 if (self._waiting is not None or not self._ready.empty())
                 else self.decode_chunk)
            active = np.zeros((self.max_slots,), bool)
            temps = np.zeros((self.max_slots,), np.float32)
            tops = np.ones((self.max_slots,), np.float32)
            positions = np.zeros((self.max_slots,), np.int32)
            keys = []
            for i, slot in enumerate(self._slots):
                if slot.request is not None:
                    active[i] = True
                    temps[i] = slot.request.temperature
                    tops[i] = slot.request.top_p
                    positions[i] = slot.pos
                    keys.append(slot.key)
                else:
                    positions[i] = self.max_seq_len  # drop slot
                    keys.append(jax.random.PRNGKey(0))

            # Dispatch the next chunk BEFORE fetching the current tokens so
            # the host<->device round-trip overlaps device compute. The
            # chunk's active mask is one emission stale: a slot finishing on
            # the fetched token decodes k wasted steps (seg=0 writes are
            # masked; the cache is overwritten on the next insert).
            prev = self.tokens
            if k > 1:
                toks, self.tokens, self.cache = self._decode_n(
                    self.params, self.cache, self.tokens,
                    jnp.asarray(positions), jnp.asarray(active),
                    jnp.stack(keys), jnp.asarray(temps), jnp.asarray(tops),
                    n_steps=k,
                )
            else:
                subs = []
                for i, slot in enumerate(self._slots):
                    if slot.request is not None:
                        slot.key, sub = jax.random.split(slot.key)
                        subs.append(sub)
                    else:
                        subs.append(jax.random.PRNGKey(0))
                toks = None
                self.tokens, self.cache = self._decode(
                    self.params, self.cache, self.tokens,
                    jnp.asarray(positions), jnp.asarray(active),
                    jnp.stack(subs), jnp.asarray(temps), jnp.asarray(tops),
                )

            self._emit_column(np.asarray(jax.device_get(prev))[:, 0])
            if toks is not None:
                cols = np.asarray(jax.device_get(toks))  # [B, k]
                # the chunk's last column is carried in self.tokens and will
                # be emitted (as `prev`) next iteration
                for j in range(k - 1):
                    self._emit_column(cols[:, j])
            for i in active_idx:
                self._slots[i].pos += k
