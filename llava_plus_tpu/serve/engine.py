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
    cache1: object          # bucket-sized prefill cache (device); may be
    #                         shared by a whole prefill batch — `row`
    #                         selects this request's stripe
    row: int
    first_id: int
    prompt_len: int
    budget: int
    key: jax.Array
    out_ids: List[int]
    history: List[int]
    needed_pages: int
    # chain hashes of this prompt's full pages (paged + prefix cache on):
    # published at insert so later requests can reuse the pages
    page_keys: List[bytes] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class _InflightPrefill:
    """A dispatched-but-unfetched prefill batch: the prefill program and
    the first-token sampler are in flight on device; the first-token
    FETCH (the blocking host<->device round trip) has not happened yet.
    The prefill loop keeps up to two of these in flight so batch N+1's
    host work + device program overlap batch N's fetch barrier — in a
    storm the per-batch cost is max(device, host) instead of their sum."""

    reqs: List[Request]
    firsts: jax.Array       # [N] sampled first tokens (device)
    cacheN: object          # bucket-sized prefill cache (device)
    plan: object            # host token plan (lengths, tokens)
    keys: List[jax.Array]
    keymap: Dict[int, List[bytes]]
    s1: int                 # prefill bucket length (cacheN's seq dim)
    t0: float               # dispatch wall-clock (for stage logging)
    t_host: float
    t_dispatch: float


@dataclasses.dataclass
class _PreparedSuffix:
    """A request whose prompt PREFIX was found in the page prefix cache:
    only the suffix still needs prefilling, over the pool (pages
    ``hit_pages`` hold positions [0, prefix_len) already). Unlike
    :class:`_Prepared`, no device work has happened yet — the suffix
    prefill runs on the engine loop (it consumes the live pool cache) and
    the first token is emitted there. ``hit_pages`` were increfed at
    match time and stay pinned until the slot finishes (or insert fails)."""

    req: Request
    hit_pages: List[int]
    prefix_len: int
    suffix_ids: np.ndarray   # fused ids for [prefix_len, prompt_len)
    prompt_len: int
    budget: int
    key: jax.Array
    sub: jax.Array           # first-token sampling key
    history: List[int]       # full fused prompt ids
    needed_pages: int        # FRESH pages beyond the hits
    page_keys: List[bytes]


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
        prefill_batch: int = 4,
        cache_dtype=jnp.bfloat16,
        idle_sleep: float = 0.002,
        decode_chunk: int = 4,
        mesh=None,
        paged: bool = False,
        page_size: int = 128,
        pool_tokens: Optional[int] = None,
        speculate: int = 0,
        spec_chunk: int = 4,
        prefix_cache: bool = True,
        w8a8: bool = False,
    ):
        """``paged=True`` switches the KV cache to a paged pool: pages are
        allocated per request for prompt + budget, so long contexts
        (max_seq_len > 2048) and short chats share one HBM pool densely.
        ``pool_tokens`` sizes the pool (default: max_slots * max_seq_len,
        i.e. no overcommit); requests queue when the pool is exhausted."""
        if w8a8:
            # Dynamic per-token int8 activations for the FLOP-bound
            # prefill matmuls (decode matvecs keep the weight-only path —
            # ops/quant.matmul gates on row count). Trace-time switch:
            # must be set before this engine compiles any program.
            from llava_plus_tpu.ops import quant

            quant.set_w8a8(True)
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
        self.prefill_batch = max(int(prefill_batch), 1)
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
        # k + 1 verify tokens must fit the paged kernel's self block
        # (models/llama.py gates the kernel at T <= 8)
        self.speculate = min(max(int(speculate), 0), 7)
        # verify steps fused per dispatch (chunked like decode_chunk):
        # each chunk is one host round-trip, the dominant per-step cost
        # over the tunneled chip (CHIPBENCH r5: 1-step chunks = 0.66x)
        self.spec_chunk = max(int(spec_chunk), 1)
        if paged:
            assert max_seq_len % page_size == 0
            assert prefill_bucket % page_size == 0
            total = pool_tokens or max_slots * max_seq_len
            self.num_pages = max(total // page_size, max_seq_len // page_size)
            self._free_pages = list(range(self.num_pages))
            # page lifetime is refcounted: one ref per slot page table the
            # page appears in + one while published in the prefix cache; a
            # page returns to the free list only at refcount 0. All
            # refcount / free-list / prefix-cache state is guarded by
            # _page_lock (prefill thread matches, engine loop allocates).
            self._page_refs = [0] * self.num_pages
            self._page_lock = threading.Lock()
            self._prefix = None
            if prefix_cache:
                from llava_plus_tpu.serve.prefix_cache import PagePrefixCache

                self._prefix = PagePrefixCache(
                    incref=self._incref_page, decref=self._decref_page,
                )
        else:
            self.num_pages = 0
            self._prefix = None

        self._queue: "queue.Queue[Request]" = queue.Queue()
        self._ready: "queue.Queue[_Prepared]" = queue.Queue()
        self._slots = [_Slot() for _ in range(max_slots)]
        self._stop = threading.Event()
        self._waiting: Optional[_Prepared] = None  # held back: pool exhausted
        from collections import deque

        self.ttfts: "deque[float]" = deque(maxlen=512)
        # burst-admission observability: arrival storms should show
        # prefill_requests > prefill_dispatches (batched prefills)
        self.prefill_dispatches = 0
        self.prefill_requests = 0
        # tokens of prompt KV served from the page prefix cache (paged)
        self.prefix_hit_tokens = 0
        self.spec_steps = 0
        self.spec_emitted = 0
        # adaptive gating: recent per-step acceptance; when speculation
        # is not paying (content not repetitive), decode plain chunks and
        # re-probe periodically instead of paying the verify overhead
        self._spec_recent: "deque[int]" = deque(maxlen=32)
        self._spec_pause = 0
        self.spec_pause_len = 64  # plain chunks decoded per re-probe cycle
        self.spec_pauses = 0      # times adaptive gating kicked in
        self.spec_refreshes = 0   # device-state rebuilds (membership churn)
        # wall-time breakdown of the speculative loop (diagnosis counters;
        # read by tools/bench_spec.py — negligible overhead)
        self.spec_timers = {"dispatch": 0.0, "fetch": 0.0, "emit": 0.0,
                            "refresh": 0.0, "iters": 0}
        # device-resident speculation pipeline: per-slot (cur, hlen, hist,
        # prop, budget) live on device between steps; the host fetches only
        # each step's [B, k+2] emitted-token row, `spec_depth` steps behind
        self._spec_dev = None
        self._spec_inflight: "deque" = deque()
        self.spec_depth = 2
        # with proposals/acceptance on device a verify step costs ~one
        # decode step; the gate only guards per-token dispatch overhead
        self.spec_min_accept = 1.1

        self._build_programs()
        self.warmup_s = 0.0  # set by warmup()

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
            lm_cfg = (self.cfg.text
                      if self.cfg.language_model_type == "llama"
                      else self.cfg.mpt)
            cache = llama.PagedKVCache.create(
                lm_cfg, batch,
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

    # -- paged-pool page accounting --------------------------------------

    def _incref_page(self, pid: int):
        """Caller holds _page_lock. Only pages already referenced can gain
        references (a page at refcount 0 is on the free list)."""
        assert self._page_refs[pid] > 0
        self._page_refs[pid] += 1

    def _decref_page(self, pid: int):
        """Caller holds _page_lock."""
        self._page_refs[pid] -= 1
        assert self._page_refs[pid] >= 0
        if self._page_refs[pid] == 0:
            self._free_pages.append(pid)

    def _alloc_pages(self, n: int) -> List[int]:
        """Pop ``n`` pages off the free list at refcount 1, evicting LRU
        prefix-cache entries if needed (an evicted entry only frees its
        page when no live slot references it)."""
        with self._page_lock:
            while (len(self._free_pages) < n and self._prefix is not None
                   and self._prefix.evict_lru()):
                pass
            if len(self._free_pages) < n:
                raise _PoolExhausted(n)
            pages = [self._free_pages.pop() for _ in range(n)]
            for p in pages:
                self._page_refs[p] = 1
            return pages

    def _release_pages(self, pages: List[int]):
        with self._page_lock:
            for p in pages:
                self._decref_page(p)

    def _match_prefix(self, keys: List[bytes]) -> List[int]:
        """Longest-prefix page match, pinning the hits (prefill thread).
        The returned pages carry one reference for the matching request;
        released on slot finish or failed insert."""
        if self._prefix is None or not keys:
            return []
        with self._page_lock:
            pages = self._prefix.match(keys)
            for p in pages:
                self._incref_page(p)
            return pages

    def _publish_prefix(self, keys: List[bytes], pages: List[int]):
        if self._prefix is None or not keys:
            return
        with self._page_lock:
            self._prefix.publish(keys, pages[:len(keys)])

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
        def insert(cache, cache1, row, slot, first_token, tokens):
            # cache1 is BUCKET-sized (S1 <= max_seq_len) and may hold a
            # whole prefill batch: copy only row `row`'s stripe into rows
            # [0:S1] of slot `slot` (the prefill never allocates or copies
            # a full max_seq_len cache). The seg row is rebuilt from zeros
            # so stale entries from the slot's previous occupant are never
            # attended.
            def upd(pool, single):
                stripe = jax.lax.dynamic_slice_in_dim(single, row, 1, axis=1)
                return jax.lax.dynamic_update_slice(
                    pool, stripe.astype(pool.dtype),
                    (0, slot) + (0,) * (pool.ndim - 2),
                )

            seg_row = jnp.zeros((1, cache.seg.shape[1]), jnp.int32)
            seg_row = jax.lax.dynamic_update_slice(
                seg_row,
                jax.lax.dynamic_slice_in_dim(cache1.seg, row, 1, axis=0),
                (0, 0),
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
        def insert_paged(cache, cache1, row, slot, pages_vec, n_alloc,
                         first_token, tokens):
            """Scatter one request's stripe of a dense prefill cache
            (bucket-sized, possibly a whole prefill batch) into the
            combined paged pool at this slot's allocated pages."""
            L, _, S1, Hkv, Dh = cache1.k.shape
            P = cache.page_size
            n1 = S1 // P

            def chunks(single, trailing):
                # dense stripe [L, S1, Hkv, tr] -> paged [L, n1, P, Hkv,
                # tr]: the token-major pool layout makes this a pure
                # reshape (no transpose — one page is P contiguous
                # [Hkv, tr] token blocks, same order as the dense cache)
                stripe = jax.lax.dynamic_index_in_dim(
                    single, row, axis=1, keepdims=False
                )
                return stripe.reshape(L, n1, P, Hkv, trailing)

            kv = cache.kv
            kv = kv.at[:, pages_vec[:n1], 0].set(
                chunks(cache1.k, Dh).astype(kv.dtype))
            kv = kv.at[:, pages_vec[:n1], 1].set(
                chunks(cache1.v, Dh).astype(kv.dtype))
            kv_scale = cache.kv_scale
            if kv_scale is not None:
                # scale pages are HEAD-major [L, Np, 2, Hkv, P]
                # (models/llama.py:PagedKVCache): [L, n1, P, Hkv] -> swap
                def schunks(single):
                    return chunks(single, 1)[..., 0].transpose(0, 1, 3, 2)

                kv_scale = kv_scale.at[:, pages_vec[:n1], 0].set(
                    schunks(cache1.k_scale))
                kv_scale = kv_scale.at[:, pages_vec[:n1], 1].set(
                    schunks(cache1.v_scale))

            seg_row = jnp.zeros((cache.seg.shape[1],), jnp.int32)
            seg_row = jax.lax.dynamic_update_slice(
                seg_row,
                jax.lax.dynamic_index_in_dim(
                    cache1.seg, row, axis=0, keepdims=False
                ),
                (0,),
            )
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
        def prefill_suffix(params, cache, slot, pages_vec, n_alloc,
                           prefix_len, suffix_tokens, suffix_seg):
            """Prefill ONLY a prompt's suffix over the paged pool: the
            prefix's KV lives in already-populated (shared) pages —
            pages_vec[:prefix_len // P]. Attaches the page table / alloc /
            prefix seg for this slot, then runs the suffix chunk as a
            multi-token cache continuation (same deferred-write path as
            speculative verify; suffix positions are contiguous from
            prefix_len). Returns the last valid suffix position's logits.

            suffix_tokens / suffix_seg: [1, Tb] right-padded to a bucket.
            Writes land only in the FRESH pages (suffix positions >=
            prefix_len); shared prefix pages are read-only here."""
            Tb = suffix_tokens.shape[1]
            pos_idx = jnp.arange(cache.seg.shape[1], dtype=jnp.int32)
            seg_prefix = (pos_idx < prefix_len).astype(jnp.int32)
            cache = dataclasses.replace(
                cache,
                page_table=cache.page_table.at[slot].set(pages_vec),
                seg=cache.seg.at[slot].set(seg_prefix),
                alloc=cache.alloc.at[slot].set(n_alloc),
            )
            row = llama.PagedKVCache(
                kv=cache.kv,
                seg=jax.lax.dynamic_slice_in_dim(cache.seg, slot, 1, 0),
                page_table=jax.lax.dynamic_slice_in_dim(
                    cache.page_table, slot, 1, 0
                ),
                alloc=jax.lax.dynamic_slice_in_dim(cache.alloc, slot, 1, 0),
                kv_scale=cache.kv_scale,
            )
            positions = (prefix_len
                         + jnp.arange(Tb, dtype=jnp.int32)[None])
            last = jnp.maximum(jnp.sum(suffix_seg, axis=1) - 1, 0)
            if cfg.language_model_type == "llama":
                logits, row = llama.forward(
                    params["language_model"], cfg.text, suffix_tokens,
                    positions=positions, segment_ids=suffix_seg, cache=row,
                    attn_impl="xla", logits_positions=last,
                )
                last_logits = logits[:, 0]
            else:
                logits, row = mpt.forward(
                    params["language_model"], cfg.mpt, suffix_tokens,
                    positions=positions, segment_ids=suffix_seg, cache=row,
                    attn_impl="xla",
                )
                last_logits = jnp.take_along_axis(
                    logits, last[:, None, None], axis=1
                )[:, 0]
            cache = dataclasses.replace(
                cache, kv=row.kv, kv_scale=row.kv_scale,
                seg=jax.lax.dynamic_update_slice(
                    cache.seg, row.seg, (slot, 0)
                ),
            )
            return last_logits, cache

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

        def _propose_dev(hist, hlen, k):
            """Device prompt-lookup proposals: for n = 3, 2, 1 find the
            LATEST earlier occurrence of the history's n-token tail and
            propose the k tokens that followed it (same semantics as the
            reference host search this replaces — proposals now never
            leave the device)."""
            B, S = hist.shape
            idx = jnp.arange(S, dtype=jnp.int32)[None]
            best_j = jnp.full((B,), -1, jnp.int32)
            best_n = jnp.zeros((B,), jnp.int32)
            for n in (3, 2, 1):
                tail_idx = (hlen[:, None] - n
                            + jnp.arange(n, dtype=jnp.int32)[None])
                tail = jnp.take_along_axis(
                    hist, jnp.clip(tail_idx, 0, S - 1), axis=1
                )                                          # [B, n]
                m = jnp.ones((B, S), bool)
                padded = jnp.pad(hist, ((0, 0), (0, n)))
                for i in range(n):
                    m &= padded[:, i:i + S] == tail[:, i:i + 1]
                m &= idx < (hlen - n)[:, None]  # exclude the tail itself
                m &= (hlen > n)[:, None]
                found = jnp.any(m, axis=1)
                jstar = jnp.max(jnp.where(m, idx, -1), axis=1)
                take = found & (best_j < 0)
                best_j = jnp.where(take, jstar, best_j)
                best_n = jnp.where(take, jnp.int32(n), best_n)
            pidx = (best_j[:, None] + best_n[:, None]
                    + jnp.arange(k, dtype=jnp.int32)[None])
            prop = jnp.take_along_axis(
                hist, jnp.clip(pidx, 0, S - 1), axis=1
            )
            ok = (best_j[:, None] >= 0) & (pidx < hlen[:, None])
            return jnp.where(ok, prop, 0)

        eos_id = int(getattr(self.tokenizer, "eos_token_id", 2) or 2)

        def _spec_body(params, cache, cur, hlen, hist, prop, budget,
                       active, keys, temperature, top_p, *, k):
            """ONE fused speculative iteration, all state device-resident:
            verify [cur | k proposals] in one multi-token cache step,
            accept the exactly-matching greedy prefix (greedy slots; temp
            > 0 slots take 1 sampled token), append accepted tokens to the
            on-device history, and compute the NEXT step's proposals.

            Because proposals/acceptance/history never round-trip the
            host, the engine dispatches step N+1 on step N's output
            handles BEFORE fetching N's emitted tokens — the device
            pipeline stays full and a verify step costs the same as a
            plain decode step (the old host-driven verify cost ~2x: keys,
            proposals, and acceptance all serialized on the host between
            steps). Returns ([B, k+2] emitted tokens + count, new state,
            cache)."""
            B = cur.shape[0]
            S = hist.shape[1]
            # position of `cur`; dead slots (hlen == 0) are clamped to 0 —
            # their seg is 0 so nothing is attended or written for them
            pos = jnp.maximum(hlen - 1, 0)
            offs = jnp.arange(k + 1, dtype=jnp.int32)[None]
            tokens = jnp.concatenate([cur[:, None], prop], axis=1)
            positions = pos[:, None] + offs
            act = active.astype(jnp.int32)
            greedy_slot = temperature <= 0.0
            seg = jnp.where(
                offs == 0, act[:, None],
                act[:, None] * greedy_slot[:, None].astype(jnp.int32),
            )
            seg = seg * (positions < S).astype(jnp.int32)
            logits, cache = llava_model.decode_step(
                params, cfg, tokens, positions, seg, cache,
                attn_impl=self._attn_impl,
            )                                        # [B, k+1, V]
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            subs = jax.vmap(jax.random.fold_in)(keys, pos)
            sampled0 = _sample_batch(
                logits[:, 0], subs, temperature, top_p
            ).astype(jnp.int32)

            match = (prop == greedy[:, :k]) & (seg[:, 1:] > 0)
            acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1),
                          axis=1)
            out = jnp.where(
                greedy_slot[:, None], greedy,
                jnp.concatenate(
                    [sampled0[:, None], jnp.zeros((B, k), jnp.int32)], 1
                ),
            )
            e = jnp.where(greedy_slot, acc + 1, 1)
            # stop at the first eos (inclusive: the host sees it and
            # finishes the request; tokens after it would be garbage)
            is_eos = (out == eos_id) & (offs < e[:, None])
            eos_j = jnp.argmax(is_eos, axis=1)
            e = jnp.where(jnp.any(is_eos, axis=1),
                          jnp.minimum(e, eos_j + 1), e)
            # budget/window clamps keep device position in lockstep with
            # what the host will actually append; e == 0 => host finishes
            e = jnp.minimum(e, budget)
            e = jnp.where(active & (seg[:, 0] > 0), e, 0)

            new_cur = jnp.take_along_axis(
                out, jnp.maximum(e - 1, 0)[:, None], axis=1
            )[:, 0]
            new_cur = jnp.where(e > 0, new_cur, cur)
            jidx = jnp.where(offs < e[:, None], hlen[:, None] + offs, S)
            hist = hist.at[jnp.arange(B)[:, None], jidx].set(
                out, mode="drop"
            )
            hlen2 = hlen + e
            prop2 = _propose_dev(hist, hlen2, k)
            ret = jnp.concatenate([out, e[:, None]], axis=1)  # ONE fetch
            return ret, new_cur, hlen2, hist, prop2, budget - e, cache

        @functools.partial(
            jax.jit, static_argnames=("k", "m"),
            donate_argnums=(1, 2, 3, 4, 5, 6),
        )
        def spec_step(params, cache, cur, hlen, hist, prop, budget,
                      active, keys, temperature, top_p, *, k, m=1):
            """m fused speculative iterations in ONE program (`lax.scan`
            over _spec_body), returning the stacked [m, B, k+2] emitted
            rows — one dispatch + ONE host fetch per m verify steps.

            Chunking matters for the same reason plain decode chunks
            (`decode_n`): the per-dispatch/fetch host round-trip is tens
            of ms over the tunneled chip, which at one verify step per
            fetch capped speculation at ~0.66x plain (CHIPBENCH r5 spec
            stage, dispatch+fetch ~= 2x the device step). The scan body
            compiles once; its fixed per-iteration tax (~0.4 ms) is noise
            next to the ~22 ms bandwidth-bound verify step. Post-eos /
            post-budget iterations inside a chunk emit e == 0 rows that
            the host ignores (_spec_collect tracks finished slots), so a
            mid-chunk finish wastes at most m-1 cheap masked steps."""
            if m == 1:
                ret, cur, hlen, hist, prop, budget, cache = _spec_body(
                    params, cache, cur, hlen, hist, prop, budget,
                    active, keys, temperature, top_p, k=k,
                )
                return ret[None], cur, hlen, hist, prop, budget, cache

            def body(carry, _):
                cache, cur, hlen, hist, prop, budget = carry
                ret, cur, hlen, hist, prop, budget, cache = _spec_body(
                    params, cache, cur, hlen, hist, prop, budget,
                    active, keys, temperature, top_p, k=k,
                )
                return (cache, cur, hlen, hist, prop, budget), ret

            (cache, cur, hlen, hist, prop, budget), rets = jax.lax.scan(
                body, (cache, cur, hlen, hist, prop, budget), None,
                length=m,
            )
            return rets, cur, hlen, hist, prop, budget, cache

        @functools.partial(jax.jit, donate_argnums=(0,))
        def set_token(tokens, tid, slot):
            return jax.lax.dynamic_update_slice_in_dim(
                tokens, tid[:, None], slot, axis=0
            )

        self._prefill = prefill
        self._insert = insert
        self._insert_paged = insert_paged
        self._prefill_suffix = prefill_suffix
        self._set_token = set_token
        self._decode = decode
        self._decode_n = decode_n
        self._spec_prog = spec_step
        # batched first-token sampling: one program + ONE fetch for a
        # whole prefill batch (per-request temperature/top_p/key)
        self._first_sample = jax.jit(_sample_batch)

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

    def drain(self, request: Request) -> str:
        """Block until an already-``submit``ted request finishes; final
        text. Lets callers pipeline many requests (submit ahead, drain in
        order) — the eval runners' batched mode (eval/common.py)."""
        text = ""
        while True:
            try:
                item = request._chunks.get(timeout=600)
            except queue.Empty:
                return text
            if item is None:
                return text
            text = item

    def generate(self, request: Request) -> str:
        self.submit(request)
        return self.drain(request)

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5)
        self._prefill_thread.join(timeout=5)

    # -- warmup ----------------------------------------------------------

    def _warmup_prompt(self, prompt_len: int, image: bool) -> str:
        """A prompt whose FUSED length (text tokens + image patches) lands
        in the same prefill bucket as ``prompt_len`` — so warming with it
        compiles exactly the programs real prompts of that length hit."""
        from llava_plus_tpu.constants import IMAGE_TOKEN_INDEX
        from llava_plus_tpu.mm_utils import tokenizer_image_token

        npatch = self.cfg.num_image_tokens
        prompt_len = min(prompt_len, self.max_seq_len - 8)
        bucket = -(-prompt_len // self.prefill_bucket) * self.prefill_bucket
        lo, hi = bucket - self.prefill_bucket + 1, min(
            bucket, self.max_seq_len - 2
        )
        target = hi - 4
        prefix = "<image>\n" if image else ""
        n_words = max(target - (npatch if image else 0), 4)
        for _ in range(12):
            prompt = prefix + " ".join(f"w{i % 31}" for i in range(n_words))
            ids = tokenizer_image_token(prompt, self.tokenizer)
            n_img = sum(1 for t in ids if t == IMAGE_TOKEN_INDEX)
            fused = len(ids) + n_img * (npatch - 1)
            if lo <= fused <= hi:
                return prompt
            # Newton step on the MEASURED tokens-per-word rate (word-level
            # tokenizers are ~1, char-level ~3.5; assuming 1 oscillates)
            per = max(fused / max(n_words, 1), 0.25)
            step = int(round((target - fused) / per))
            n_words = max(
                n_words + (step or (1 if fused < lo else -1)), 1
            )
        return prompt  # best effort: worst case warms a neighbouring bucket

    def warmup(self, prompt_len: int = 768, *, image: bool = True) -> float:
        """Compile the engine's FULL program set before serving: every
        prefill batch size at ``prompt_len``'s bucket (with the vision
        tower when ``image``), the matching insert programs, both decode
        programs, the speculative step (when enabled), and the paged
        suffix-prefill path. Without this, a fresh worker's first requests
        pay multi-second XLA compiles (BENCH_r03 measured a 16-arrival
        storm at 35 s p50 on a cold engine vs <2 s warm).

        Call BEFORE serving traffic (idle engine): warmup drives the
        compiled programs directly on the live cache buffers, which is
        only safe while no slot is occupied. Returns seconds spent and
        records it as ``self.warmup_s``."""
        t0 = time.perf_counter()
        image = image and self.cfg.num_image_tokens > 0
        prompt = self._warmup_prompt(prompt_len, image)
        img_shape = (1, self.cfg.vision.image_size,
                     self.cfg.vision.image_size, 3)
        rng = np.random.default_rng(0)
        maxp = self.max_seq_len // self.page_size if self.paged else 0

        # 1. prefill + insert programs, one pair per admission batch size
        for n in self._prefill_batch_sizes():
            reqs = [
                Request(
                    prompt=prompt,
                    images=(rng.normal(size=img_shape).astype(np.float32)
                            if image else None),
                    max_new_tokens=4, temperature=0.0,
                )
                for _ in range(n)
            ]
            preps = self._prepare(reqs)
            prep = next((p for p in preps if p is not None), None)
            if prep is None:
                continue  # freak eos-on-first-token; insert warms lazily
            # run the insert program WITHOUT occupying a slot (the engine
            # loop is live; a visible dummy occupant would start decoding):
            # slot 0 gets a garbage seg row, which is exactly the state a
            # finished request leaves behind — rebuilt at the next insert
            if self.paged:
                pages = self._alloc_pages(prep.needed_pages)
                pages_vec = jnp.asarray(
                    (pages + [0] * maxp)[:maxp], jnp.int32
                )
                self.cache, self.tokens = self._insert_paged(
                    self.cache, prep.cache1, jnp.int32(prep.row), 0,
                    pages_vec, jnp.int32(len(pages) * self.page_size),
                    jnp.asarray([prep.first_id], jnp.int32), self.tokens,
                )
                self._release_pages(pages)
            else:
                self.cache, self.tokens = self._insert(
                    self.cache, prep.cache1, jnp.int32(prep.row), 0,
                    jnp.asarray([prep.first_id], jnp.int32), self.tokens,
                )
            del preps, prep  # free the bucket-sized prefill cache

        # 2. decode programs (shapes fixed by the slot pool; all-inactive
        # masks mean no cache state is disturbed)
        B = self.max_slots
        positions = jnp.full((B,), self.max_seq_len, jnp.int32)
        active = jnp.zeros((B,), bool)
        keys = jnp.stack([jax.random.PRNGKey(0)] * B)
        temps = jnp.zeros((B,), jnp.float32)
        tops = jnp.ones((B,), jnp.float32)
        self.tokens, self.cache = self._decode(
            self.params, self.cache, self.tokens, positions, active,
            keys, temps, tops,
        )
        if self.decode_chunk > 1:
            _, self.tokens, self.cache = self._decode_n(
                self.params, self.cache, self.tokens, positions, active,
                keys, temps, tops, n_steps=self.decode_chunk,
            )
        self.tokens = self._set_token(
            self.tokens, jnp.asarray([0], jnp.int32), jnp.int32(0)
        )

        # 3. speculative step (hlen == 0 + seg masks: nothing attended,
        # written, or emitted for any slot)
        if self.speculate:
            k, S = self.speculate, self.max_seq_len
            # cur/hlen/hist/prop/budget are donated: each needs its OWN
            # buffer (donating one array twice is an execute-time error)
            def z(*shape):
                return jnp.zeros(shape or (B,), jnp.int32)

            for m in sorted({1, self.spec_chunk}):
                _, _, _, _, _, _, self.cache = self._spec_prog(
                    self.params, self.cache, z(), z(), z(B, S), z(B, k),
                    z(), active, keys, temps, tops, k=self.speculate, m=m,
                )

        # 4. paged suffix prefill (prefix-cache hit path) + its batch-1
        # first-token sampler, at the single-bucket suffix shape
        if self.paged and self._prefix is not None:
            Tb = self.prefill_bucket
            toks = np.zeros((1, Tb), np.int32)
            seg = np.zeros((1, Tb), np.int32)
            toks[0, :8] = 1
            seg[0, :8] = 1
            pages_vec = jnp.zeros((maxp,), jnp.int32)
            last_logits, self.cache = self._prefill_suffix(
                self.params, self.cache, jnp.int32(0), pages_vec,
                jnp.int32(2 * self.page_size), jnp.int32(self.page_size),
                jnp.asarray(toks), jnp.asarray(seg),
            )
            self._first_sample(
                last_logits, keys[:1],
                jnp.zeros((1,), jnp.float32), jnp.ones((1,), jnp.float32),
            )

        np.asarray(jax.device_get(self.tokens))  # retire every compile
        self.warmup_s = time.perf_counter() - t0
        logger.info(
            f"warmup: program set compiled in {self.warmup_s:.1f}s "
            f"(prompt bucket for len {prompt_len}, image={image}, "
            f"batch sizes {self._prefill_batch_sizes()})"
        )
        return self.warmup_s

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
        independent of slot availability.

        The loop runs dispatch and fetch as separate phases, up to two
        batches in flight: while batch N's prefill computes on device,
        batch N+1's host prep + dispatch happen here instead of waiting
        behind N's first-token fetch. In an arrival storm the per-batch
        period becomes max(device, host) rather than host + device +
        round-trip — on the tunneled chip that alone cuts burst p95 TTFT
        by ~25%."""
        from collections import deque

        inflight: "deque[_InflightPrefill]" = deque()
        while not self._stop.is_set():
            dispatched = False
            # -- dispatch phase: admit a batch when the pipeline has room
            # and the insert queue isn't backed up (each in-flight or
            # prepared batch holds a bucket-sized prefill cache on device)
            if len(inflight) < 2 and self._ready.qsize() < 2:
                reqs: List[Request] = []
                try:
                    if inflight:
                        reqs.append(self._queue.get_nowait())
                    else:  # idle: block briefly instead of spinning
                        reqs.append(self._queue.get(timeout=0.05))
                except queue.Empty:
                    pass
                # Burst admission: everything already waiting joins ONE
                # batched prefill program — an arrival storm costs ~one
                # prefill per `prefill_batch` arrivals instead of one
                # each, so storm p95 TTFT is bounded (VERDICT r2 item 2).
                while reqs and len(reqs) < self.prefill_batch:
                    try:
                        reqs.append(self._queue.get_nowait())
                    except queue.Empty:
                        break
                # Prefix-cache routing (paged only): a request whose
                # prompt prefix is already pooled skips the full prefill —
                # only host hashing happens here; its (short) suffix
                # prefill runs on the engine loop, which owns the pool.
                keymap: Dict[int, List[bytes]] = {}
                if reqs and self.paged and self._prefix is not None:
                    remaining = []
                    for r in reqs:
                        try:
                            route = self._route_prefix(r)
                        except Exception as e:
                            logger.error(f"prefix routing failed: {e}")
                            route = []
                        if isinstance(route, _PreparedSuffix):
                            self._ready.put(route)
                        else:
                            keymap[id(r)] = route
                            remaining.append(r)
                    reqs = remaining
                if reqs:
                    try:
                        inflight.append(
                            self._dispatch_prefill(reqs, keymap)
                        )
                        self.prefill_dispatches += 1
                        self.prefill_requests += len(reqs)
                        dispatched = True
                    except Exception as e:
                        logger.error(f"prefill dispatch failed: {e}")
                        for req in reqs:
                            req._chunks.put(None)
                            req._done.set()
            # -- fetch phase: block on the OLDEST batch's first tokens
            # when the pipeline is full, or when there was nothing new to
            # dispatch (idle drain)
            if inflight and (len(inflight) >= 2 or not dispatched):
                inf = inflight.popleft()
                try:
                    preps = self._finish_prefill(inf)
                except Exception as e:
                    logger.error(f"prefill failed: {e}")
                    for req in inf.reqs:
                        req._chunks.put(None)
                        req._done.set()
                    continue
                for prep in preps:
                    if prep is not None:
                        self._ready.put(prep)
            elif not dispatched and not inflight and self._ready.qsize() >= 2:
                time.sleep(self.idle_sleep)
        # stop() raced a dispatched-but-unfetched batch: its requests must
        # still get their terminal chunk, or drain()/stream() callers stall
        # until the queue timeout.
        while inflight:
            inf = inflight.popleft()
            for req in inf.reqs:
                req._chunks.put(None)
                req._done.set()

    def _prefill_batch_sizes(self) -> List[int]:
        """The FIXED set of prefill batch sizes the engine compiles:
        powers of two up to prefill_batch (plus prefill_batch itself).
        Every admission pads to the next size up — without this, each
        distinct storm drain size compiles a fresh multi-second prefill
        program and burst p95 TTFT is dominated by XLA, not the chip."""
        sizes, p = [], 1
        while p < self.prefill_batch:
            sizes.append(p)
            p *= 2
        sizes.append(self.prefill_batch)
        return sizes

    def _route_prefix(self, req: Request):
        """Decide a request's admission path. Returns a
        :class:`_PreparedSuffix` when a usable pooled prefix exists (its
        hit pages are pinned), else the prompt's full-page chain hashes
        for publication by the batch-prefill path.

        A hit is usable when (a) at least one full page matched, (b) every
        image's feature span lies inside the matched prefix (the suffix
        prefill is text-only — it never runs the vision tower; that is the
        point: a multi-turn follow-up skips the ViT entirely), and (c) at
        least one prompt token remains to produce the first-token logits."""
        from llava_plus_tpu.data.multimodal import plan_multimodal_batch
        from llava_plus_tpu.mm_utils import tokenizer_image_token
        from llava_plus_tpu.serve.prefix_cache import (
            image_digest, page_keys,
        )

        ids = np.asarray(
            tokenizer_image_token(req.prompt, self.tokenizer), np.int64
        )
        npatch = self.cfg.num_image_tokens
        plan = plan_multimodal_batch(
            [ids], num_patches=npatch, max_len=self.max_seq_len,
        )
        prompt_len = int(plan.lengths[0])
        fused = np.asarray(plan.tokens[0][:prompt_len])
        n_img = int(plan.num_images[0])
        imgs = None if req.images is None else np.asarray(req.images)
        if n_img and (imgs is None or imgs.shape[0] < n_img):
            return []  # malformed; let the batch path raise/handle
        spans = [
            (int(plan.image_pos[0][j * npatch]), image_digest(imgs[j]))
            for j in range(n_img)
        ]
        P = self.page_size
        keys = page_keys(fused, spans, npatch, P, n_pages=prompt_len // P)

        # same clamp as generate.py:266 — the engine must emit exactly as
        # many tokens as the single-stream generator when context-clamped
        # (the final token needs no further cache write; mid-chunk overrun
        # writes are dropped by the alloc mask / drop-mode scatter)
        budget = min(req.max_new_tokens, self.max_seq_len - prompt_len)
        n_max = (prompt_len - 1) // P
        n_lo = max((-(-(s + npatch) // P) for s, _ in spans), default=1)
        if budget <= 0 or n_max < n_lo:
            return keys
        hit = self._match_prefix(keys[:n_max])
        if len(hit) < n_lo:
            if hit:
                self._release_pages(hit)
            return keys
        prefix_len = len(hit) * P
        total_pages = -(-(prompt_len + budget + 1) // P)
        # same key derivation as _prepare so a request samples identically
        # whichever admission path it takes
        key, sub = jax.random.split(jax.random.PRNGKey(req.seed))
        return _PreparedSuffix(
            req=req,
            hit_pages=hit,
            prefix_len=prefix_len,
            suffix_ids=fused[prefix_len:prompt_len].astype(np.int32),
            prompt_len=prompt_len,
            budget=budget,
            key=key,
            sub=sub,
            history=[int(t) for t in fused],
            needed_pages=max(total_pages - len(hit), 0),
            page_keys=keys,
        )

    def _prepare(self, reqs: List[Request],
                 keymap: Optional[Dict[int, List[bytes]]] = None,
                 ) -> List[Optional["_Prepared"]]:
        """Dispatch + finish in one call (warmup and tests; the serving
        loop pipelines the two phases across batches instead)."""
        return self._finish_prefill(self._dispatch_prefill(reqs, keymap))

    def _dispatch_prefill(self, reqs: List[Request],
                          keymap: Optional[Dict[int, List[bytes]]] = None,
                          ) -> _InflightPrefill:
        """Phase 1: host prep (tokenize, plan, pad to the compiled batch
        size) and dispatch of the prefill program + first-token sampler.
        Returns without blocking on the device."""
        from llava_plus_tpu.generate import prepare_multimodal_request

        n_real = len(reqs)
        N = next(s for s in self._prefill_batch_sizes() if s >= n_real)
        pad = N - n_real
        t0 = time.perf_counter()
        prompts = [r.prompt for r in reqs] + [reqs[-1].prompt] * pad
        images = None
        if any(r.images is not None for r in reqs):
            images = ([r.images for r in reqs]
                      + [reqs[-1].images] * pad)
        batch, plan = prepare_multimodal_request(
            self.cfg, self.tokenizer, prompts, images,
            max_seq_len=self.max_seq_len, prefill_bucket=self.prefill_bucket,
        )
        t_host = time.perf_counter()

        # bucket prefill is dense; one [N, S1] cache shared by the batch
        cacheN = self._make_cache(
            batch=N, seq_len=int(batch.tokens.shape[1]), force_dense=True
        )
        last_logits, cacheN = self._prefill(self.params, batch, cacheN)
        keys, subs = [], []
        for r in reqs:
            key, sub = jax.random.split(jax.random.PRNGKey(r.seed))
            keys.append(key)
            subs.append(sub)
        for _ in range(pad):
            keys.append(keys[-1])
            subs.append(subs[-1])
        firsts = self._first_sample(
            last_logits, jnp.stack(subs),
            jnp.asarray([r.temperature for r in reqs]
                        + [0.0] * pad, jnp.float32),
            jnp.asarray([r.top_p for r in reqs] + [1.0] * pad, jnp.float32),
        )
        return _InflightPrefill(
            reqs=reqs, firsts=firsts, cacheN=cacheN, plan=plan,
            keys=keys, keymap=keymap or {},
            s1=int(batch.tokens.shape[1]), t0=t0, t_host=t_host,
            t_dispatch=time.perf_counter(),
        )

    def _finish_prefill(self, inf: _InflightPrefill,
                        ) -> List[Optional["_Prepared"]]:
        """Phase 2: block on the first-token fetch, emit every client's
        first token, and build the slot-insertion records."""
        reqs, plan, cacheN = inf.reqs, inf.plan, inf.cacheN
        keys, keymap, S1 = inf.keys, inf.keymap, inf.s1
        # First-token fetch == the barrier on the prefill program; emit to
        # every client NOW (before any slot/page allocation): TTFT is the
        # (batched) prefill latency, one fetch for the whole batch.
        tids = np.asarray(jax.device_get(inf.firsts))
        now = time.time()
        logger.debug(
            "prepare n=%d: host=%.3fs dispatch=%.3fs fetch=%.3fs",
            len(tids), inf.t_host - inf.t0, inf.t_dispatch - inf.t_host,
            time.perf_counter() - inf.t_dispatch,
        )
        tokens_host = np.asarray(plan.tokens)

        preps: List[Optional[_Prepared]] = []
        for i, req in enumerate(reqs):
            prompt_len = int(plan.lengths[i])
            budget = min(req.max_new_tokens,
                         self.max_seq_len - prompt_len)  # = generate.py:266
            needed_pages = 0
            if self.paged:
                P = self.page_size
                needed_pages = max(
                    S1 // P, -(-(prompt_len + budget + 1) // P)
                )
            tid = int(tids[i])
            req.first_token_ts = now
            if req.submit_ts:
                self.ttfts.append(now - req.submit_ts)

            out_ids, budget, finished = self._emit_first(req, tid, budget)
            if finished:
                preps.append(None)  # never occupies a slot
                continue

            history = [int(t) for t in tokens_host[i][:prompt_len]]
            history.append(tid)
            preps.append(_Prepared(
                req=req, cache1=cacheN, row=i, first_id=tid,
                prompt_len=prompt_len, budget=budget, key=keys[i],
                out_ids=out_ids, history=history,
                needed_pages=needed_pages,
                page_keys=(keymap or {}).get(id(req), []),
            ))
        return preps

    def _emit_first(self, req: Request, tid: int, budget: int):
        """First-token emission semantics shared by the full-prefill and
        suffix-prefill paths (eos / budget / stop-string checks on the
        first sampled token). Returns (out_ids, budget, finished); when
        finished, the request was fully completed here."""
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
        return out_ids, budget, finished

    def _admit(self) -> int:
        inserted = 0
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
                inserted += 1
            except _PoolExhausted:
                # hold the prepared request until finished slots free pages
                self._waiting = prep
                break
            except Exception as e:
                logger.error(f"insert failed: {e}")
                prep.req._chunks.put(None)
                prep.req._done.set()
        return inserted

    def _insert_prepared(self, slot_id: int, prep):
        if isinstance(prep, _PreparedSuffix):
            return self._insert_suffix(slot_id, prep)
        req = prep.req
        pages: List[int] = []
        if self.paged:
            pages = self._alloc_pages(prep.needed_pages)
            maxp = self.max_seq_len // self.page_size
            pages_vec = jnp.asarray((pages + [0] * maxp)[:maxp], jnp.int32)
            try:
                self.cache, self.tokens = self._insert_paged(
                    self.cache, prep.cache1, jnp.int32(prep.row), slot_id,
                    pages_vec, jnp.int32(len(pages) * self.page_size),
                    jnp.asarray([prep.first_id], jnp.int32), self.tokens,
                )
            except Exception:
                self._release_pages(pages)
                raise
            self._publish_prefix(prep.page_keys, pages)
        else:
            self.cache, self.tokens = self._insert(
                self.cache, prep.cache1, jnp.int32(prep.row), slot_id,
                jnp.asarray([prep.first_id], jnp.int32), self.tokens,
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

    def _insert_suffix(self, slot_id: int, prep: "_PreparedSuffix"):
        """Admit a prefix-cache hit: attach the shared prefix pages to the
        slot, prefill ONLY the suffix over the pool, emit the first token
        (TTFT for hits = suffix prefill, not the full prompt — and no
        vision encode at all), and activate the slot for decode."""
        req = prep.req
        fresh = self._alloc_pages(prep.needed_pages)  # may raise _PoolExhausted
        pages = prep.hit_pages + fresh
        P = self.page_size
        maxp = self.max_seq_len // P
        pages_vec = jnp.asarray((pages + [0] * maxp)[:maxp], jnp.int32)
        suffix_len = prep.prompt_len - prep.prefix_len
        Tb = -(-suffix_len // self.prefill_bucket) * self.prefill_bucket
        toks = np.zeros((1, Tb), np.int32)
        toks[0, :suffix_len] = prep.suffix_ids
        seg = np.zeros((1, Tb), np.int32)
        seg[0, :suffix_len] = 1
        try:
            last_logits, self.cache = self._prefill_suffix(
                self.params, self.cache, jnp.int32(slot_id), pages_vec,
                jnp.int32(len(pages) * P), jnp.int32(prep.prefix_len),
                jnp.asarray(toks), jnp.asarray(seg),
            )
            firsts = self._first_sample(
                last_logits, prep.sub[None],
                jnp.asarray([req.temperature], jnp.float32),
                jnp.asarray([req.top_p], jnp.float32),
            )
            tid = int(np.asarray(jax.device_get(firsts))[0])
        except Exception:
            self._release_pages(pages)  # hit refs are ours too
            raise
        now = time.time()
        req.first_token_ts = now
        if req.submit_ts:
            self.ttfts.append(now - req.submit_ts)
        self.prefix_hit_tokens += prep.prefix_len

        out_ids, budget, finished = self._emit_first(req, tid, prep.budget)
        self._publish_prefix(prep.page_keys, pages)
        if finished:
            # pool rows for this slot were written but the slot stays
            # free; the next occupant's insert rebuilds seg/page_table
            self._release_pages(pages)
            return
        self.tokens = self._set_token(
            self.tokens, jnp.asarray([tid], jnp.int32), jnp.int32(slot_id)
        )
        slot = self._slots[slot_id]
        slot.request = req
        slot.out_ids = out_ids
        slot.pos = prep.prompt_len
        slot.budget = budget
        slot.key = prep.key
        slot.pages = pages
        slot.history = prep.history + [tid]
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
            self._finish_slot(slot)
        return finished

    def _finish_slot(self, slot: _Slot):
        """Complete a slot's request and release its resources."""
        slot.request._chunks.put(None)
        slot.request._done.set()
        slot.request = None
        if slot.pages:
            self._release_pages(slot.pages)
            slot.pages = []

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

    def _spec_refresh(self):
        """(Re)build the device-resident speculation state from the host
        mirrors (slot.history / slot.budget). Called only when slot
        membership changes (admission, stop-string finish, pause
        transitions) — per-step updates otherwise never leave the
        device (see _spec_prog)."""
        t0 = time.perf_counter()
        self.spec_refreshes += 1
        B, S, k = self.max_slots, self.max_seq_len, self.speculate
        hist = np.zeros((B, S), np.int32)
        hlen = np.zeros((B,), np.int32)
        cur = np.zeros((B,), np.int32)
        budget = np.zeros((B,), np.int32)
        prop = np.zeros((B, k), np.int32)
        temps = np.zeros((B,), np.float32)
        tops = np.ones((B,), np.float32)
        active = np.zeros((B,), bool)
        keys = []
        for i, slot in enumerate(self._slots):
            if slot.request is None:
                keys.append(jax.random.PRNGKey(0))
                continue
            h = slot.history[-S:]
            hist[i, : len(h)] = h
            hlen[i] = len(h)
            cur[i] = h[-1]
            budget[i] = slot.budget
            prop[i] = self._propose(slot, k)
            temps[i] = slot.request.temperature
            tops[i] = slot.request.top_p
            active[i] = True
            # spec emission comes from the step outputs only; the first
            # token was already emitted by the prefill thread and enters
            # the step as `cur`, never as an output column
            slot.skip_next_emit = False
            keys.append(slot.key)
        self._spec_dev = {
            "cur": jnp.asarray(cur), "hlen": jnp.asarray(hlen),
            "hist": jnp.asarray(hist), "prop": jnp.asarray(prop),
            "budget": jnp.asarray(budget), "active": jnp.asarray(active),
            "keys": jnp.stack(keys), "temps": jnp.asarray(temps),
            "tops": jnp.asarray(tops),
        }
        self.spec_timers["refresh"] += time.perf_counter() - t0

    def _spec_dispatch(self, m: int = 1):
        """Dispatch one fused chunk of m speculative steps on the CURRENT
        device handles (no host sync): the device pipeline stays full
        while the previous chunk's emitted tokens are still in flight to
        the host."""
        st = self._spec_dev
        t0 = time.perf_counter()
        ret, cur, hlen, hist, prop, budget, self.cache = self._spec_prog(
            self.params, self.cache, st["cur"], st["hlen"], st["hist"],
            st["prop"], st["budget"], st["active"], st["keys"],
            st["temps"], st["tops"], k=self.speculate, m=m,
        )
        self.spec_timers["dispatch"] += time.perf_counter() - t0
        st.update(cur=cur, hlen=hlen, hist=hist, prop=prop, budget=budget)
        # snapshot slot->request identity: a slot that turns over between
        # dispatch and fetch (stop-string finish + admission) must not
        # receive this chunk's tokens
        self._spec_inflight.append(
            (ret, [s.request for s in self._slots])
        )

    def _spec_collect(self) -> bool:
        """Fetch the OLDEST in-flight spec chunk ([m, B, k+2]) and emit
        its tokens row by row. Returns True when slot membership changed
        (the device state is stale and must be refreshed). A slot that
        finishes on row r (eos/stop/budget) skips rows > r: the device
        kept stepping it inside the chunk, but those rows are garbage by
        construction and the refresh rebuilds its state anyway."""
        ret, owners = self._spec_inflight.popleft()
        t0 = time.perf_counter()
        out = np.asarray(jax.device_get(ret))       # [m, B, k+2]
        t1 = time.perf_counter()
        self.spec_timers["fetch"] += t1 - t0
        changed = False
        done = [False] * len(self._slots)
        for row in out:
            row_live = False
            for i, slot in enumerate(self._slots):
                if (done[i] or slot.request is None
                        or slot.request is not owners[i]):
                    continue
                row_live = True
                greedy = slot.request.temperature <= 0.0
                e = int(row[i, -1])
                if e == 0:
                    # device budget hit zero last step: finish, no new
                    # token
                    self._finish_slot(slot)
                    changed = True
                    done[i] = True
                    continue
                finished = False
                delivered = 0
                for j in range(e):
                    finished = self._emit_token(slot, int(row[i, j]))
                    if finished:
                        break
                    delivered += 1
                if greedy:
                    # acceptance metric counts only tokens actually
                    # delivered (the terminating eos/stop column is not)
                    self.spec_emitted += delivered
                    self._spec_recent.append(delivered)
                if finished:
                    changed = True
                    done[i] = True
                else:
                    slot.pos += e
            if row_live:
                # rows where every slot already finished mid-chunk are
                # masked device no-ops, not steps (they would deflate the
                # acceptance metric)
                self.spec_steps += 1
        self.spec_timers["emit"] += time.perf_counter() - t1
        return changed

    def _spec_drain(self):
        """Collect every in-flight spec step (host emission catches up to
        the device). Required before any state refresh or mode switch."""
        while self._spec_inflight:
            self._spec_collect()

    @property
    def spec_acceptance(self) -> float:
        """Mean tokens emitted per speculative step (>= 1.0; k+1 max)."""
        return self.spec_emitted / self.spec_steps if self.spec_steps else 0.0

    def _loop(self):
        while not self._stop.is_set():
            inserted = self._admit()
            active_idx = [
                i for i, s in enumerate(self._slots) if s.request is not None
            ]
            if not active_idx:
                time.sleep(self.idle_sleep)
                continue

            if self.speculate:
                if inserted and self._spec_dev is not None:
                    # new occupant(s): catch the host up, then rebuild the
                    # device state below (in-flight steps were dispatched
                    # before the insert program, so their stale cache
                    # writes are overwritten before anything reads them)
                    self._spec_drain()
                    self._spec_dev = None
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
                        self._spec_dev = None
                        continue
                else:
                    self.spec_timers["iters"] += 1
                    if self._spec_dev is None:
                        self._spec_refresh()
                    # keep the device pipeline `spec_depth` steps ahead of
                    # the host: step N+1 is dispatched on step N's output
                    # HANDLES before N's tokens are fetched, so a verify
                    # step costs one device step (the old host-driven
                    # verify serialized proposals + acceptance on host)
                    # adaptive chunking, mirroring the plain path: a
                    # prepared request waiting to insert gets the next
                    # admission point after ONE verify step; otherwise
                    # amortize the dispatch+fetch round-trip over
                    # spec_chunk fused steps
                    m = (1 if (self._waiting is not None
                               or not self._ready.empty())
                         else self.spec_chunk)
                    while len(self._spec_inflight) < self.spec_depth:
                        self._spec_dispatch(m)
                    if self._spec_collect():
                        # membership changed (eos/stop/budget): catch up
                        # and rebuild next iteration (after _admit)
                        self._spec_drain()
                        self._spec_dev = None
                        continue
                    if (len(self._spec_recent) == self._spec_recent.maxlen
                            and (sum(self._spec_recent)
                                 / len(self._spec_recent))
                            < self.spec_min_accept):
                        # acceptance too low to beat the per-token dispatch
                        # overhead: decode plain chunks a while, re-probe.
                        # spec -> plain: seed the pipeline with the (already
                        # emitted) current tokens and skip their re-emission
                        self._spec_drain()
                        self._spec_pause = self.spec_pause_len
                        self.spec_pauses += 1
                        self._spec_recent.clear()
                        self._spec_dev = None
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
