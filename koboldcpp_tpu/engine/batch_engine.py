"""Continuous-batching engine.

What the reference lacks (SURVEY.md §2.6: "no continuous batching across
requests" — kobold serializes behind modelbusy, koboldcpp.py:1937): a slot
scheduler that admits requests as they arrive, prefills each into its own KV
slot, and advances ALL active sequences with one batched decode step per
iteration.

Round-2 design:
  - prefill runs in <=128-token chunks as SINGLE-ROW (1, b) forwards against
    the admitted slot's cache rows (extracted/re-inserted by a jitted
    dynamic-slice pair) — no n_slots x FLOP waste, and decode ticks interleave
    between chunks so live slots never stall for a newcomer's whole prompt;
  - per-slot context fast-forward AND context shift (PurgeMissingTokens,
    gpttype_adapter.cpp:1504) with RoPE re-rotation on that slot's rows only;
  - anti-slop rewind (gpttype_adapter.cpp:3292) with per-position bans and
    stream hold-back, per slot;
  - LLaVA image splicing (sentinel tokens + embed rows), per slot.

Slot-batched contiguous cache (L-tuples of (B_slots, S, H*D)) with per-slot
lengths (slot==position invariant per row), or the paged pool (kv/paged.py).
"""
from __future__ import annotations

import codecs
import queue
import threading
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..grammar.gbnf import TokenFilter
from ..kv.cache import init_cache
from ..models import llama as model_llama
from ..models.loader import Model
from ..ops.rope import rope_frequencies
from ..sampling import SamplerParams, build_dry_sequences, make_state, sample_logits
from .engine import (GenParams, GenerationResult, Timings, _detok, _find_stop,
                     _kv_quant, _longest_common_run, _shift_rows,
                     antislop_check)

PREFILL_BUCKETS = (16, 32, 64, 128)
PREFILL_CHUNK = 128  # interleave granularity: decode ticks between chunks
# all-greedy steady-state burst length: K decode ticks chained on device per
# host round trip (see _decode_step). Bounded so admits/aborts are picked up
# within K ticks.
BURST_TICKS = int(__import__("os").environ.get("KCPP_BURST_TICKS", "16"))
# in-flight pipelined bursts: the host pulls the OLDEST while the device
# computes the newer ones, so the ~25 ms tunnel RT and the remaining compute
# of the pulled burst are fully hidden ((depth-1)*burst_time >= RT)
BURST_DEPTH = int(__import__("os").environ.get("KCPP_BURST_DEPTH", "4"))


def _bucket(n: int) -> int:
    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    return PREFILL_BUCKETS[-1]


@dataclass
class _Request:
    prompt_tokens: list[int]
    params: GenParams
    on_token: Callable[[int, str], None] | None
    done: threading.Event = field(default_factory=threading.Event)
    result: GenerationResult = field(default_factory=GenerationResult)
    genkey: str = ""
    aborted: bool = False
    text_so_far: str = ""
    images: list[str] = field(default_factory=list)


@dataclass
class _Slot:
    idx: int
    request: _Request | None = None
    context: list[int] = field(default_factory=list)  # tokens in cache
    out_tokens: list[int] = field(default_factory=list)
    out_text: str = ""
    utf8: object = None  # incremental UTF-8 decoder (set on _start_request)
    sampler_state: object = None
    sampler_params: SamplerParams | None = None
    grammar: TokenFilter | None = None
    eos_ids: tuple[int, ...] = ()
    max_new: int = 0
    t_start: float = 0.0
    t_prefill_done: float = 0.0
    prompt_len: int = 0
    # chunked prefill state
    pending_prefill: list[int] = field(default_factory=list)
    emb_by_pos: dict | None = None  # LLaVA: abs position -> embed row
    # final-chunk logits row left ON DEVICE by _prefill_chunk; pulled for all
    # ready slots in ONE transfer at the next decode tick (a per-slot pull
    # costs a full tunnel RT ~25 ms; 8 admissions cost 8 RTs serially)
    pending_first: object = None
    pend_tick: int = 0  # _tick counter when pending_first was set (age cap)
    # decode state: (token, position, append_to_context) for the next step
    feed: tuple[int, int, bool] | None = None
    # anti-slop state
    antislop_bans: dict[int, set[int]] = field(default_factory=dict)
    stream_delay: int = 0
    stream_q: list = field(default_factory=list)  # (tok_index, tok, piece)
    # sampled-token budget: rewound tokens still count against max_length
    # (the reference never refunds remaining_tokens on rewind,
    # gpttype_adapter.cpp:3249,3292)
    sampled: int = 0

    @property
    def active(self) -> bool:
        return self.request is not None

    @property
    def decoding(self) -> bool:
        return self.request is not None and self.feed is not None


IMG_SENTINEL = -999


class BatchedEngine:
    """Drop-in Engine replacement with cross-request continuous batching."""

    def __init__(self, model: Model, max_context: int = 2048, n_slots: int = 4,
                 cache_dtype=jnp.bfloat16, paged: bool = False,
                 page_size: int = 0, pool_fraction: float = 1.0,
                 quantkv: bool = False, clip_model=None,
                 use_contextshift: bool = True, mesh=None):
        # `mesh`: optional jax Mesh the params are sharded over (TP/EP
        # serving — BASELINE config 4).  The worker thread enters it so
        # sharding constraints (ops/moe.py routed EP) resolve at trace time.
        self.mesh = mesh
        self.model = model
        self.cfg = model.cfg
        self.clip = clip_model
        self.tokenizer = model.tokenizer
        self.max_context = max_context
        self.n_slots = n_slots
        self.paged = paged
        self.quantkv = quantkv
        # context shift needs in-place row surgery; the paged pool uses page
        # remaps for the prefix trim only (fast-forward) in this round, and
        # quantized KV disables shift like the reference (koboldcpp.py:840)
        self.use_contextshift = use_contextshift and not paged and not quantkv
        if paged:
            from ..kv.paged import PageAllocator, init_paged_cache

            if page_size <= 0:
                # auto: the paged flash-decode kernels pay ~1 us of fixed
                # cost per grid step (page) on v5e, so bigger pages win —
                # bounded by ~8 double-buffered (P, KD) VMEM blocks
                KD = self.cfg.n_kv_heads * self.cfg.head_dim
                page_size = min(512, max(64, (750_000 // KD) // 64 * 64))
            max_pages = -(-max_context // page_size)
            n_pages = max(1, int(n_slots * max_pages * pool_fraction))
            self.page_size = page_size
            self.allocator = PageAllocator(n_pages, page_size, max_pages)
            self.cache = init_paged_cache(
                self.cfg.n_layers, n_pages, page_size, self.cfg.n_kv_heads,
                self.cfg.head_dim, quantized=_kv_quant(quantkv))
        else:
            self.cache = init_cache(self.cfg.n_layers, n_slots, max_context,
                                    self.cfg.n_kv_heads, self.cfg.head_dim,
                                    dtype=cache_dtype,
                                    quantized=_kv_quant(quantkv))
        self.slots = [_Slot(idx=i) for i in range(n_slots)]
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        self.abort_event = threading.Event()  # abort-all (compat)
        self.last_timings = Timings()
        self.total_gens = 0
        self.generation_finished = True
        self.stream_tokens: list[str] = []
        self._shutdown = False
        self._wake = threading.Event()
        self._pre_rr = 0  # round-robin pointer over prefilling slots
        self._tick_no = 0
        # pipelined K-tick bursts in flight (oldest first): new bursts are
        # dispatched from the device-side token chain while older ones' (K, B)
        # blocks are still in transfer, so the ~25 ms tunnel RT overlaps
        # device compute instead of serializing with it (the r3 batched
        # engine paid one blocking RT per 8-tick burst — ~45% of wall time)
        import collections as _collections
        from concurrent.futures import ThreadPoolExecutor
        self._pending_bursts = _collections.deque()
        # the axon tunnel is pull-based RPC: a D2H read costs a full ~25 ms
        # round trip whenever it is issued, so burst pulls run on their own
        # threads (submitted at dispatch) and overlap both device compute and
        # each other; the worker only joins the OLDEST future
        self._pull_pool = ThreadPoolExecutor(max_workers=max(2, BURST_DEPTH))

        if paged:
            def fwd(params, tokens, positions, cache, page_table):
                return model_llama.forward_paged(
                    params, self.cfg, tokens, positions, cache, page_table,
                    last_only=True)
        else:
            def fwd(params, tokens, positions, cache, page_table=None):
                return model_llama.forward(params, self.cfg, tokens, positions,
                                           cache, last_only=True)

        self._forward = jax.jit(fwd, donate_argnames=("cache",))

        if paged:
            def gfwd(params, tokens, positions, cache, page_table, bias):
                logits, cache = model_llama.forward_paged(
                    params, self.cfg, tokens, positions, cache, page_table,
                    last_only=True)
                nxt = jnp.argmax(logits[:, -1] + bias, axis=-1).astype(jnp.int32)
                return nxt, cache
        else:
            def gfwd(params, tokens, positions, cache, bias, page_table=None):
                logits, cache = model_llama.forward(
                    params, self.cfg, tokens, positions, cache,
                    last_only=True)
                nxt = jnp.argmax(logits[:, -1] + bias, axis=-1).astype(jnp.int32)
                return nxt, cache

        # device-argmax decode step: pulls B token ids per tick instead of a
        # (B, vocab) logits tensor, and skips the host sampler chain entirely
        # when every active slot is greedy-capable (VERDICT r1 item 3/5:
        # "apply the device sampler to the batched engine")
        self._greedy_forward = jax.jit(gfwd, donate_argnames=("cache",))
        self._greedy_forward_raw = gfwd  # traced inside the fused K-burst
        self._greedy_burst_jits: dict = {}   # K -> jitted fused burst
        self._sampled_burst_jits: dict = {}  # (order_key, K) -> jitted burst
        self._bias_dev = None  # (n_slots, V) device bias; None = rebuild
        self._zero_bias_dev = None  # persistent all-zero bias buffer
        self._prefill_row_jit = None
        self._prefill_row_mm_jit = None
        # per-slot device SAMPLING (VERDICT r2 item 6): any mix of greedy and
        # common-preset stochastic slots decodes fully on device; only slots
        # needing the host chain (grammar/DRY/XTC/mirostat/anti-slop) pull
        # their logits row.  Device state: per-slot rep-pen windows (rolled by
        # the step itself; rows rebuilt from slot.context when a slot's
        # context changes outside decode feeds).
        self._sampled_fwd: dict = {}  # effective order key -> jitted step
        self._sampled_fwd_raw: dict = {}  # raw fns for the fused K-burst
        self._recent_W = max_context
        self._recent_dev = jnp.zeros((n_slots, self._recent_W), jnp.int32)
        self._count_dev = jnp.zeros((n_slots,), jnp.int32)
        self._recent_dirty: set[int] = set()
        self._dyn_rows = None  # per-slot knob vectors; None = rebuild
        import os as _os
        self._sample_key = jax.random.PRNGKey(
            int.from_bytes(_os.urandom(4), "little"))
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # -- public API --------------------------------------------------------
    def generate(self, prompt, params: GenParams,
                 on_token: Callable[[int, str], None] | None = None,
                 genkey: str = "") -> GenerationResult:
        req = self.submit(prompt, params, on_token, genkey)
        req.done.wait()
        return req.result

    def submit(self, prompt, params: GenParams,
               on_token: Callable[[int, str], None] | None = None,
               genkey: str = "") -> _Request:
        tk = self.tokenizer
        toks = tk.encode(prompt) if isinstance(prompt, str) else list(prompt)
        if not toks:
            toks = [tk.vocab.bos_id if tk.vocab.bos_id >= 0 else 0]
        budget = max(8, self.max_context - params.max_length)
        if len(toks) > budget:
            keep = 1 if tk.vocab.add_bos else 0
            toks = toks[:keep] + toks[keep + len(toks) - budget:]
        req = _Request(prompt_tokens=toks, params=params, on_token=on_token,
                       genkey=genkey)
        self.queue.put(req)
        self._wake.set()
        return req

    def abort(self, genkey: str = ""):
        for s in self.slots:
            if s.active and (not genkey or s.request.genkey == genkey):
                s.request.aborted = True
        if not genkey:
            self.abort_event.set()

    def token_count(self, text: str) -> list[int]:
        return self.tokenizer.encode(text)

    def reset_context(self):
        for s in self.slots:
            if not s.active:
                s.context = []

    def shutdown(self):
        try:
            self._pull_pool.shutdown(wait=False)
        except Exception:
            pass
        self._shutdown = True
        self._wake.set()

    # -- scheduler loop ----------------------------------------------------
    def _loop(self):
        if self.mesh is not None:
            with self.mesh:
                self._loop_inner()
        else:
            self._loop_inner()

    def _loop_inner(self):
        while not self._shutdown:
            try:
                self._tick()
            except Exception as e:  # noqa: BLE001
                # a device/compile error must not strand waiters on
                # req.done forever (the reference returns status 0 instead
                # of crashing, gpttype_adapter.cpp:3131); fail the active
                # requests and keep serving
                import traceback

                traceback.print_exc()
                self._pending_bursts.clear()
                for s in self.slots:
                    if s.active:
                        try:
                            self._finish(s, f"error: {e}")
                        except Exception:
                            s.request.result = GenerationResult(
                                stop_reason="error")
                            s.request.done.set()
                            s.request = None
                    s.context = []
                    s.feed = None
                    s.pending_prefill = []
                # the failed step may have CONSUMED its donated cache buffer
                # — reusing the stale handle cascades INTERNAL errors forever
                # (observed on the axon backend).  Rebuild a fresh cache.
                try:
                    if self.paged:
                        from ..kv.paged import init_paged_cache

                        self.allocator.free = list(
                            range(self.allocator.n_pages - 1, -1, -1))
                        self.allocator.slot_pages = {}
                        self.cache = init_paged_cache(
                            self.cfg.n_layers, self.allocator.n_pages,
                            self.page_size, self.cfg.n_kv_heads,
                            self.cfg.head_dim,
                            quantized=_kv_quant(self.quantkv))
                    else:
                        self.cache = init_cache(
                            self.cfg.n_layers, self.n_slots,
                            self.max_context, self.cfg.n_kv_heads,
                            self.cfg.head_dim,
                            quantized=_kv_quant(self.quantkv))
                    self._bias_dev = None
                    self._dyn_rows = None
                    self._recent_dirty = set(range(self.n_slots))
                except Exception:
                    traceback.print_exc()

    def _tick(self):
        self._tick_no += 1
        self._admit()
        active = [s for s in self.slots if s.active]
        if not active:
            # pending bursts whose feeds all finished hold only overshoot
            # tokens — drop them (cache rows are invisible beyond context)
            self._pending_bursts.clear()
            self.generation_finished = True
            self._wake.wait(timeout=0.05)
            self._wake.clear()
            return
        self.generation_finished = False
        # one prefill chunk for one prefilling slot (round-robin), then
        # one decode step for every decoding slot — live slots advance
        # between a newcomer's chunks instead of stalling for its prompt
        prefilling = [s for s in active if s.pending_prefill]
        wave = [s for s in prefilling if not s.emb_by_pos]
        if len(wave) >= 2:
            # admission wave: ALL prefilling slots' chunks advance in ONE
            # full-batch dispatch (VERDICT r4 item 3) — a wave of N admits
            # used to cost N round-robined single-row forwards
            self._prefill_wave(wave)
            rest = [s for s in prefilling if s.emb_by_pos]
            if rest:
                self._prefill_chunk(rest[self._pre_rr % len(rest)])
                self._pre_rr += 1
        elif prefilling:
            slot = prefilling[self._pre_rr % len(prefilling)]
            self._pre_rr += 1
            self._prefill_chunk(slot)
        if (any(s.decoding for s in self.slots)
                or any(s.active and s.pending_first is not None
                       for s in self.slots)
                or self._pending_bursts):
            self._decode_step()

    def _admit(self) -> int:
        n = 0
        for slot in self.slots:
            if slot.active:
                continue
            try:
                req = self.queue.get_nowait()
            except queue.Empty:
                break
            self._start_request(slot, req)
            n += 1
        return n

    def _start_request(self, slot: _Slot, req: _Request):
        tk = self.tokenizer
        params = req.params
        slot.request = req
        slot.out_tokens = []
        slot.out_text = ""
        slot.utf8 = codecs.getincrementaldecoder("utf-8")(errors="replace")
        slot.t_start = time.perf_counter()
        slot.feed = None
        slot.pending_first = None
        slot.sampled = 0
        slot.antislop_bans = {}
        slot.stream_q = []
        slot.stream_delay = 0
        slot.emb_by_pos = None
        if params.banned_phrases:
            slot.stream_delay = 3 + max(
                (len(tk.encode(p)) for p in params.banned_phrases), default=0)

        prompt = list(req.prompt_tokens)
        # LLaVA: splice image-patch embeddings after BOS (sentinel segments,
        # gpttype_adapter.cpp:3406-3475); image requests re-evaluate fully
        if params.images and self.clip is not None:
            from ..models.clip import decode_image_base64

            embeds = [np.asarray(self.clip.image_embed(
                decode_image_base64(b))[0], np.float32)
                for b in params.images[:4]]
            all_emb = np.concatenate(embeds, axis=0)
            bos = prompt[:1] if tk.vocab.add_bos else []
            rest = prompt[len(bos):]
            prompt = bos + [IMG_SENTINEL] * len(all_emb) + rest
            slot.emb_by_pos = {len(bos) + i: all_emb[i]
                               for i in range(len(all_emb))}
            slot.context = []

        # per-slot context shift, then fast-forward
        if self.use_contextshift:
            self._context_shift(slot, prompt)
        n = 0
        limit = min(len(slot.context), len(prompt) - 1)
        while n < limit and slot.context[n] == prompt[n]:
            n += 1
        slot.context = slot.context[:n]
        todo = prompt[n:]
        slot.prompt_len = len(todo)
        if self.paged:
            self.allocator.trim(slot.idx, n)

        state = make_state(params.sampler.seed)
        if params.sampler.dry_multiplier > 0:
            breakers = params.dry_sequence_breakers or ["\n", ":", '"', "*"]
            state.dry_sequences = build_dry_sequences(tk, breakers)
        slot.sampler_state = state

        banned = list(params.sampler.banned_tokens)
        eos_ids = tuple(i for i in (tk.vocab.eos_id, tk.vocab.eot_id,
                                    tk.vocab.eom_id) if i is not None and i >= 0)
        if params.use_default_badwordsids:
            banned.extend(eos_ids)
        slot.sampler_params = SamplerParams(
            **{**params.sampler.__dict__, "banned_tokens": tuple(banned)})
        slot.eos_ids = eos_ids
        slot.grammar = TokenFilter(params.grammar, tk) if params.grammar else None
        slot.max_new = min(params.max_length,
                           self.max_context - len(prompt))
        slot.pending_prefill = todo
        self._bias_dev = None  # slot set changed: rebuild device bias rows
        self._dyn_rows = None
        self._recent_dirty.add(slot.idx)

    # -- context shift (per slot) -------------------------------------------
    def _context_shift(self, slot: _Slot, prompt: list[int]):
        """PurgeMissingTokens on one slot's cache rows (gpttype_adapter.cpp:
        1504): drop the scrolled-out gap, slide the reusable tail down, and
        RoPE-re-rotate the moved keys."""
        ctx = slot.context
        if not ctx or len(prompt) < 2:
            return
        p0 = 0
        lim = min(len(ctx), len(prompt))
        while p0 < lim and ctx[p0] == prompt[p0]:
            p0 += 1
        if p0 == 0 or p0 >= len(ctx):
            return
        tail_ctx = ctx[p0:]
        tail_prompt = prompt[p0:]
        best_len, ci, pi = _longest_common_run(tail_ctx, tail_prompt)
        threshold = max(96, len(tail_prompt) // 4)
        if best_len < threshold or ci == 0:
            return
        freqs = rope_frequencies(self.cfg)
        self.cache = _kv_shift_slot_jit(
            self.cache, slot.idx, p0, p0 + ci, freqs,
            self.cfg.rope_type, self.cfg.rope_dim)
        slot.context = ctx[:p0] + ctx[p0 + ci:]
        self._recent_dirty.add(slot.idx)

    # -- prefill (single-row chunks) ----------------------------------------
    def _get_prefill_row(self, multimodal: bool):
        if multimodal:
            if self._prefill_row_mm_jit is None:
                def f(params, tokens, positions, cache, slot_idx,
                      input_embeds, embed_mask):
                    sub = jax.tree_util.tree_map(
                        lambda x: jax.lax.dynamic_slice_in_dim(x, slot_idx, 1, 0),
                        cache)
                    logits, sub = model_llama.forward(
                        params, self.cfg, tokens, positions, sub,
                        last_only=True, input_embeds=input_embeds,
                        embed_mask=embed_mask)
                    new = jax.tree_util.tree_map(
                        lambda full, row: jax.lax.dynamic_update_slice_in_dim(
                            full, row.astype(full.dtype), slot_idx, 0),
                        cache, sub)
                    return logits, new

                self._prefill_row_mm_jit = jax.jit(
                    f, donate_argnames=("cache",))
            return self._prefill_row_mm_jit
        if self._prefill_row_jit is None:
            def f(params, tokens, positions, cache, slot_idx):
                sub = jax.tree_util.tree_map(
                    lambda x: jax.lax.dynamic_slice_in_dim(x, slot_idx, 1, 0),
                    cache)
                logits, sub = model_llama.forward(
                    params, self.cfg, tokens, positions, sub, last_only=True)
                new = jax.tree_util.tree_map(
                    lambda full, row: jax.lax.dynamic_update_slice_in_dim(
                        full, row.astype(full.dtype), slot_idx, 0),
                    cache, sub)
                return logits, new

            self._prefill_row_jit = jax.jit(f, donate_argnames=("cache",))
        return self._prefill_row_jit

    def _prefill_chunk(self, slot: _Slot):
        """Evaluate the next <=PREFILL_CHUNK prompt tokens of `slot` as a
        single-row forward. On the last chunk, sample the first token."""
        req = slot.request
        if req.aborted or self.abort_event.is_set():
            slot.pending_prefill = []
            self._finish(slot, "abort")
            return
        chunk = slot.pending_prefill[:PREFILL_CHUNK]
        pos0 = len(slot.context)
        b = _bucket(len(chunk))
        pad = b - len(chunk)
        tok = np.zeros((1, b), dtype=np.int32)
        ppos = np.full((1, b), -1, dtype=np.int32)
        tok[0, pad:] = [t if t >= 0 else 0 for t in chunk]
        ppos[0, pad:] = np.arange(pos0, pos0 + len(chunk))
        if self.paged:
            self.allocator.ensure(slot.idx, pos0 + len(chunk))
            table = jnp.asarray(
                self.allocator.table(slot.idx)[None].astype(np.int32))
            lg, self.cache = self._forward(
                self.model.params, jnp.asarray(tok), jnp.asarray(ppos),
                self.cache, table)
        elif slot.emb_by_pos and any(t == IMG_SENTINEL for t in chunk):
            mask = np.array(
                [[False] * pad + [t == IMG_SENTINEL for t in chunk]])
            rows = [slot.emb_by_pos[pos0 + j]
                    for j, t in enumerate(chunk) if t == IMG_SENTINEL]
            emb = np.zeros((1, b, rows[0].shape[-1]), dtype=np.float32)
            emb[0, pad:][mask[0, pad:]] = np.stack(rows)
            fn = self._get_prefill_row(multimodal=True)
            lg, self.cache = fn(self.model.params, jnp.asarray(tok),
                                jnp.asarray(ppos), self.cache,
                                jnp.int32(slot.idx), jnp.asarray(emb),
                                jnp.asarray(mask))
        else:
            fn = self._get_prefill_row(multimodal=False)
            lg, self.cache = fn(self.model.params, jnp.asarray(tok),
                                jnp.asarray(ppos), self.cache,
                                jnp.int32(slot.idx))
        slot.context.extend(chunk)
        slot.pending_prefill = slot.pending_prefill[len(chunk):]
        self._recent_dirty.add(slot.idx)
        if not slot.pending_prefill:
            slot.t_prefill_done = time.perf_counter()
            # leave the logits row ON DEVICE: the next decode tick pulls all
            # freshly-prefilled slots' rows in one transfer and samples then
            # (non-final chunks never pull at all)
            slot.pending_first = lg[0, -1]
            slot.pend_tick = self._tick_no

    def _prefill_wave(self, slots: list["_Slot"]):
        """Advance EVERY prefilling slot one chunk in a single full-batch
        forward (VERDICT r4 item 3: amortize the admission wave).

        The decode-tick jit (self._forward) is reused at (B, bucket) shape:
        admitting slots' chunks ride right-aligned in their rows, all other
        rows carry position -1 (KV writes drop, attention output is garbage
        and discarded) — so a wave of N admissions costs ONE dispatch per
        chunk round instead of N round-robined single-row forwards. The
        single-row dynamic-slice path (_prefill_chunk) remains for lone
        mid-stream admissions, where touching only one cache row reads N x
        less attention HBM."""
        live = []
        for s in slots:
            req = s.request
            if req.aborted or self.abort_event.is_set():
                s.pending_prefill = []
                self._finish(s, "abort")
                continue
            live.append(s)
        if not live:
            return
        chunks = {s.idx: s.pending_prefill[:PREFILL_CHUNK] for s in live}
        b = _bucket(max(len(c) for c in chunks.values()))
        B = self.n_slots
        tok = np.zeros((B, b), dtype=np.int32)
        ppos = np.full((B, b), -1, dtype=np.int32)
        for s in live:
            chunk = chunks[s.idx]
            pos0 = len(s.context)
            pad = b - len(chunk)
            tok[s.idx, pad:] = [t if t >= 0 else 0 for t in chunk]
            ppos[s.idx, pad:] = np.arange(pos0, pos0 + len(chunk))
        if self.paged:
            for s in live:
                self.allocator.ensure(s.idx, len(s.context)
                                      + len(chunks[s.idx]))
            table = jnp.asarray(np.stack(
                [self.allocator.table(i) for i in range(B)]).astype(np.int32))
            lg, self.cache = self._forward(
                self.model.params, jnp.asarray(tok), jnp.asarray(ppos),
                self.cache, table)
        else:
            lg, self.cache = self._forward(
                self.model.params, jnp.asarray(tok), jnp.asarray(ppos),
                self.cache)
        for s in live:
            chunk = chunks[s.idx]
            s.context.extend(chunk)
            s.pending_prefill = s.pending_prefill[len(chunk):]
            self._recent_dirty.add(s.idx)
            if not s.pending_prefill:
                s.t_prefill_done = time.perf_counter()
                s.pending_first = lg[s.idx, -1]
                s.pend_tick = self._tick_no

    # -- decode ------------------------------------------------------------
    def _get_greedy_burst(self, K: int):
        """Fused K-tick greedy burst: ONE jitted dispatch runs K self-feeding
        decode steps in a device fori_loop (argmax feeds the next step,
        positions advance on device) — no per-step dispatch or position
        upload crosses the tunnel."""
        fn = self._greedy_burst_jits.get(K)
        if fn is not None:
            return fn
        gf = self._greedy_forward_raw

        def f(params, tok, pos, cache, bias):
            out0 = jnp.zeros((K, tok.shape[0]), jnp.int32)

            def body(k, carry):
                tok, pos, cache, out = carry
                nxt, cache = gf(params, tok, pos, cache, bias)
                out = out.at[k].set(nxt)
                return (nxt[:, None], jnp.where(pos >= 0, pos + 1, pos),
                        cache, out)

            tok, pos, cache, out = jax.lax.fori_loop(
                0, K, body, (tok, pos, cache, out0))
            return out, tok, pos, cache

        fn = jax.jit(f, donate_argnames=("cache",))
        self._greedy_burst_jits[K] = fn
        return fn

    def _get_sampled_burst(self, order_key: tuple, K: int):
        """Fused K-tick device-sampled burst (see _get_greedy_burst); the K
        PRNG keys are the only per-burst host input."""
        fn = self._sampled_burst_jits.get((order_key, K))
        if fn is not None:
            return fn
        self._get_sampled_forward(order_key)  # ensure raw exists
        sf = self._sampled_fwd_raw[order_key]

        def f(params, tok, pos, cache, bias, recent, count, first_roll,
              roll2, keys, dyn, greedy):
            out0 = jnp.zeros((K, tok.shape[0]), jnp.int32)

            def body(k, carry):
                tok, pos, cache, recent, count, out = carry
                roll = jnp.where(k == 0, first_roll, roll2)
                nxt, _lg, cache, recent, count = sf(
                    params, tok, pos, cache, bias, recent, count, roll,
                    keys[k], dyn, greedy)
                out = out.at[k].set(nxt)
                return (nxt[:, None], jnp.where(pos >= 0, pos + 1, pos),
                        cache, recent, count, out)

            tok, pos, cache, recent, count, out = jax.lax.fori_loop(
                0, K, body,
                (tok, pos, cache, recent, count, out0))
            return out, tok, pos, cache, recent, count

        fn = jax.jit(f, donate_argnames=("cache",))
        self._sampled_burst_jits[(order_key, K)] = fn
        return fn

    def _burst_steps_greedy(self, tok_dev, pos_dev, pos_np, K: int) -> dict:
        """Dispatch one fused K-tick greedy burst; returns the un-pulled
        burst record (stack stays on device, D2H started asynchronously).
        K == 1 reuses the plain single-step jit (no extra compile) — it is
        the chain link while prefills/admissions are interleaving."""
        if self._bias_dev is None:
            self._bias_dev = self._bias_device_rows()
        if K == 1:
            nxt, self.cache = self._greedy_forward(
                self.model.params, tok_dev, pos_dev, self.cache,
                self._bias_dev)
            out = nxt[None]
            last_tok = nxt[:, None]
            pos_dev = jnp.where(pos_dev >= 0, pos_dev + 1, pos_dev)
        else:
            f = self._get_greedy_burst(K)
            out, last_tok, pos_dev, self.cache = f(
                self.model.params, tok_dev, pos_dev, self.cache,
                self._bias_dev)
        # start the blocking pull on a pool thread NOW: the tunnel is
        # pull-based, so its RT only overlaps other work when the waiting
        # happens off the scheduler thread
        fut = self._pull_pool.submit(np.asarray, out)
        return {"K": K, "stack": out, "future": fut, "last_tok": last_tok,
                "pos_dev": pos_dev,
                "pos_np": np.where(pos_np >= 0, pos_np + K, pos_np)}

    def _burst_steps_stoch(self, tok_dev, pos_dev, pos_np, K: int, order_key,
                           first_roll, roll2, greedy_mask) -> dict:
        """Dispatch one fused K-tick device-sampled burst (rep-pen windows
        and the sampler chain advance on device)."""
        if self._bias_dev is None:
            self._bias_dev = self._bias_device_rows()
        if K == 1:
            self._sample_key, sub = jax.random.split(self._sample_key)
            sfwd = self._get_sampled_forward(order_key)
            (nxt, _lg, self.cache, self._recent_dev,
             self._count_dev) = sfwd(
                self.model.params, tok_dev, pos_dev, self.cache,
                self._bias_dev, self._recent_dev, self._count_dev,
                first_roll, sub, self._dyn_rows, greedy_mask)
            out = nxt[None]
            last_tok = nxt[:, None]
            pos_dev = jnp.where(pos_dev >= 0, pos_dev + 1, pos_dev)
        else:
            f = self._get_sampled_burst(order_key, K)
            keys = jax.random.split(self._sample_key, K + 1)
            self._sample_key = keys[0]
            (out, last_tok, pos_dev, self.cache, self._recent_dev,
             self._count_dev) = f(
                self.model.params, tok_dev, pos_dev, self.cache,
                self._bias_dev, self._recent_dev, self._count_dev,
                first_roll, roll2, keys[1:], self._dyn_rows, greedy_mask)
        fut = self._pull_pool.submit(np.asarray, out)
        return {"K": K, "stack": out, "future": fut, "last_tok": last_tok,
                "pos_dev": pos_dev,
                "pos_np": np.where(pos_np >= 0, pos_np + K, pos_np)}

    def _emit_burst(self, pb: dict, all_toks: np.ndarray):
        """Host bookkeeping for a pulled (K, B) burst block: consume feeds,
        append the within-burst token chain, emit.  Tokens for slots that
        finished (or whose slot was re-assigned to a NEW request) earlier in
        the burst are overshoot — discarded, their cache rows are invisible
        beyond len(context)."""
        K = pb["K"]
        for s, r in pb["feeds"]:
            if s.request is not r:
                continue
            if s.feed is not None:
                t, p, append = s.feed
                s.feed = None
                if append:
                    s.context.append(t)
        for k in range(K):
            for s, r in pb["feeds"]:
                if s.request is not r or not s.active:
                    continue
                if k > 0:
                    s.feed = None
                    s.context.append(int(all_toks[k - 1, s.idx]))
                if r.aborted or self.abort_event.is_set():
                    self._finish(s, "abort")
                    continue
                if s.sampled >= s.max_new:
                    self._finish(s, "length")
                    continue
                s.sampled += 1
                self._emit_sampled(s, int(all_toks[k, s.idx]))

    def _chain_or_drain(self) -> bool:
        """K-tick bursts are in flight (oldest first).  If the steady state
        holds, keep the pipeline BURST_DEPTH deep: dispatch the next burst
        from the device-side token chain, then pull+emit only the OLDEST —
        dispatched (depth-1) cycles ago, so its compute AND the ~25 ms tunnel
        RT have already overlapped newer bursts (the r3 engine paid one
        blocking RT per burst: 630 t/s against a ~2700 t/s device rate).
        When the steady state breaks, drain everything and fall through to
        the normal tick.  Returns True when the pipeline advanced (this
        tick's decode budget is spent)."""
        pbq = self._pending_bursts
        newest = pbq[-1]
        inflight = sum(pb["K"] for pb in pbq)
        # chaining survives queued admissions and interleaved prefills: the
        # device executes in order, prefill writes touch only rows OUTSIDE
        # the burst feed set, and a newcomer joins by breaking the chain
        # when its first feed appears (feed-set equality below)
        can = (not self.paged
               and not self.abort_event.is_set()
               and all(s.request is r and not r.aborted
                       for s, r in newest["feeds"])
               and not any(s.pending_first is not None
                           for s in self.slots if s.active)
               and {s.idx for s, _ in newest["feeds"]}
               == {s.idx for s in self.slots if s.decoding})
        K_next = 0
        if can:
            # steady state chains full BURST_TICKS links (one compiled burst
            # shape; overshoot past a finished request is discarded); while
            # admissions/prefills are interleaving the chain drops to single
            # steps so newcomers join within one tick of their first feed
            steady = (self.queue.empty()
                      and not any(s.pending_prefill
                                  for s in self.slots if s.active))
            K_next = BURST_TICKS if steady else 1
            if (int(newest["pos_np"].max()) + K_next >= self.max_context
                    or all(s.sampled + inflight >= s.max_new
                           for s, _ in newest["feeds"])):
                K_next = 0  # near the cap / everyone done: drain
        if K_next >= 1:
            pb = newest
            if pb["mode"] == "greedy":
                new = self._burst_steps_greedy(
                    pb["last_tok"], pb["pos_dev"], pb["pos_np"], K_next)
            else:
                if self._dyn_rows is None:
                    from .device_sampler import make_dyn_rows
                    self._dyn_rows = make_dyn_rows(
                        [s.sampler_params or SamplerParams()
                         for s in self.slots], self.max_context)
                new = self._burst_steps_stoch(
                    pb["last_tok"], pb["pos_dev"], pb["pos_np"], K_next,
                    pb["order_key"], pb["roll2"], pb["roll2"],
                    pb["greedy_mask"])
            for key in ("mode", "feeds", "order_key", "roll2", "greedy_mask"):
                if key in pb:
                    new[key] = pb[key]
            pbq.append(new)
            if len(pbq) > BURST_DEPTH:
                old_pb = pbq.popleft()
                self._emit_burst(old_pb, old_pb["future"].result())
            return True
        while pbq:
            old_pb = pbq.popleft()
            self._emit_burst(old_pb, old_pb["future"].result())
        return False

    def _decode_step(self):
        pbq = self._pending_bursts
        # opportunistic non-blocking emits: any burst whose pull already
        # landed is bookkept now, shrinking the pipeline without waiting
        while pbq and pbq[0]["future"].done():
            pb0 = pbq.popleft()
            self._emit_burst(pb0, pb0["future"].result())
        pend = [s for s in self.slots
                if s.active and s.pending_first is not None]
        if pend and (not any(s.pending_prefill for s in self.slots
                             if s.active)
                     or self._tick_no - min(s.pend_tick for s in pend) >= 2):
            # ONE transfer for every freshly-prefilled slot's logits row.
            # While more prefills are still pending (and the oldest row is
            # < 2 ticks old) the pull is deferred so a wave of admissions
            # batches into a single tunnel RT instead of one RT per slot.
            rows = np.asarray(jnp.stack([s.pending_first for s in pend]))
            for i, s in enumerate(pend):
                s.pending_first = None
                self._sample_and_emit(s, rows[i])
        if pbq:
            if self._chain_or_drain():
                return  # chained: this tick's decode budget is spent
        tok = np.zeros((self.n_slots, 1), dtype=np.int32)
        pos = np.full((self.n_slots, 1), -1, dtype=np.int32)
        feeds: list[_Slot] = []
        for s in self.slots:
            if s.decoding:
                t, p, _append = s.feed
                tok[s.idx, 0] = t
                pos[s.idx, 0] = p
                feeds.append(s)
                if self.paged:
                    self.allocator.ensure(s.idx, p + 1)
        if not feeds:
            # nothing to decode (e.g. a drained final burst finished every
            # slot): do NOT run the all-dead-rows fallback forward — it burns
            # a full model step and, fed burst-layout cache buffers, used to
            # trigger a recompile storm (r4 stack-sampling finding)
            return
        table = None
        if self.paged:
            table = jnp.asarray(np.stack(
                [self.allocator.table(i) for i in range(self.n_slots)]
            ).astype(np.int32))
        if feeds and all(self._slot_greedy_ok(s) for s in feeds):
            # device argmax: B int32 ids cross the link, no host sampler
            if self._bias_dev is None:
                self._bias_dev = self._bias_device_rows()
            # K-tick burst (non-paged steady state): the device token chain
            # feeds itself (argmax output -> next step's tokens, positions
            # advance host-side), so K decode ticks need ONE (K, B) pull
            # instead of K round trips — the per-tick ~25 ms tunnel RT was
            # the batched engine's dominant cost. Tokens past a slot's
            # stop (eos/stop-seq) inside a burst are discarded; the orphan
            # cache rows past len(context) are invisible to reuse (same
            # overshoot argument as the single engine's decode chunks).
            K = 1
            if (not self.paged and not any(s.pending_prefill
                                           for s in self.slots if s.active)
                    and self.queue.empty()
                    and any(s.max_new - s.sampled > 1 for s in feeds)):
                K = BURST_TICKS
                if int(pos.max()) + K >= self.max_context:
                    K = 1
            if K > 1:
                # dispatch-only: the (K, B) block stays on device and is
                # pulled by the NEXT tick's _chain_or_drain, overlapped with
                # the following burst's compute
                self._pending_bursts.append({
                    "mode": "greedy",
                    "feeds": [(s, s.request) for s in feeds],
                    **self._burst_steps_greedy(jnp.asarray(tok),
                                               jnp.asarray(pos), pos, K)})
                return
            if self.paged:
                nxt, self.cache = self._greedy_forward(
                    self.model.params, jnp.asarray(tok), jnp.asarray(pos),
                    self.cache, table, self._bias_dev)
                toks = np.asarray(nxt)
                for s in feeds:
                    t, p, append = s.feed
                    s.feed = None
                    if append:
                        s.context.append(t)
                    if s.request.aborted or self.abort_event.is_set():
                        self._finish(s, "abort")
                        continue
                    if s.sampled >= s.max_new:
                        self._finish(s, "length")
                        continue
                    s.sampled += 1
                    self._emit_sampled(s, int(toks[s.idx]))
                return
            # K == 1 (prefills interleaving / queue busy): still pipeline —
            # a synchronous np.asarray here costs a full tunnel RT per tick
            nxt, self.cache = self._greedy_forward(
                self.model.params, jnp.asarray(tok), jnp.asarray(pos),
                self.cache, self._bias_dev)
            stack = nxt[None]  # (1, B)
            self._pending_bursts.append({
                "mode": "greedy", "K": 1,
                "feeds": [(s, s.request) for s in feeds],
                "stack": stack,
                "future": self._pull_pool.submit(np.asarray, stack),
                "last_tok": nxt[:, None],
                "pos_dev": jnp.asarray(
                    np.where(pos >= 0, pos + 1, pos)),
                "pos_np": np.where(pos >= 0, pos + 1, pos)})
            return

        # per-slot device sampling (VERDICT r2 item 6): slots whose preset the
        # device chain covers (greedy OR common stochastic) sample on device;
        # only host-chain slots (grammar/DRY/XTC/mirostat/anti-slop/...) pull
        # their (V,) logits row over the link.
        order_key = self._stoch_order_key(feeds)
        dev_idx = {s.idx for s in feeds
                   if self._slot_greedy_ok(s)
                   or self._slot_stoch_ok(s, order_key)}
        dev_slots = [s for s in feeds if s.idx in dev_idx]
        host_slots = [s for s in feeds if s.idx not in dev_idx]
        if feeds and dev_slots:
            self._sync_recent()
            if self._bias_dev is None:
                self._bias_dev = self._bias_device_rows()
            if self._dyn_rows is None:
                from .device_sampler import make_dyn_rows
                self._dyn_rows = make_dyn_rows(
                    [s.sampler_params or SamplerParams()
                     for s in self.slots], self.max_context)
            greedy = jnp.asarray(np.array(
                [s.idx not in dev_idx or self._slot_greedy_ok(s)
                 for s in self.slots], bool))
            roll = jnp.asarray(np.array(
                [s.decoding and s.feed is not None and s.feed[2]
                 for s in self.slots], bool))
            self._sample_key, sub = jax.random.split(self._sample_key)
            sfwd = self._get_sampled_forward(order_key)
            # K-tick burst (same scheme as the all-greedy path): the device
            # sampler chain is self-feeding — sampled tokens feed the next
            # step, rep-pen windows roll on device — so only the per-tick
            # PRNG keys come from the host. One (K, B) pull per K ticks.
            K = 1
            if (not host_slots and not self.paged
                    and not any(s.pending_prefill
                                for s in self.slots if s.active)
                    and self.queue.empty()
                    and any(s.max_new - s.sampled > 1 for s in feeds)):
                K = BURST_TICKS
                if int(pos.max()) + K >= self.max_context:
                    K = 1
            if K > 1:
                roll2 = jnp.asarray(np.array(
                    [s.decoding for s in self.slots], bool))
                self._pending_bursts.append({
                    "mode": "stoch", "order_key": order_key, "roll2": roll2,
                    "greedy_mask": greedy,
                    "feeds": [(s, s.request) for s in feeds],
                    **self._burst_steps_stoch(jnp.asarray(tok),
                                              jnp.asarray(pos), pos, K,
                                              order_key, roll, roll2,
                                              greedy)})
                return
            args = [self.model.params, jnp.asarray(tok), jnp.asarray(pos),
                    self.cache]
            if self.paged:
                args.append(table)
            (nxt, lg_dev, self.cache, self._recent_dev,
             self._count_dev) = sfwd(
                *args, self._bias_dev, self._recent_dev, self._count_dev,
                roll, sub, self._dyn_rows, greedy)
            toks = np.asarray(nxt)
            host_rows = {}
            if host_slots:
                idx = jnp.asarray([s.idx for s in host_slots])
                rows = np.asarray(lg_dev[idx])
                host_rows = {s.idx: rows[i]
                             for i, s in enumerate(host_slots)}
            for s in feeds:
                t, p, append = s.feed
                s.feed = None
                if append:
                    s.context.append(t)
                if s.idx in dev_idx:
                    if s.request.aborted or self.abort_event.is_set():
                        self._finish(s, "abort")
                        continue
                    if s.sampled >= s.max_new:
                        self._finish(s, "length")
                        continue
                    s.sampled += 1
                    self._emit_sampled(s, int(toks[s.idx]))
                else:
                    self._sample_and_emit(s, host_rows[s.idx])
            return

        if self.paged:
            lg, self.cache = self._forward(
                self.model.params, jnp.asarray(tok), jnp.asarray(pos),
                self.cache, table)
        else:
            lg, self.cache = self._forward(
                self.model.params, jnp.asarray(tok), jnp.asarray(pos),
                self.cache)
        lg = np.asarray(lg)
        # host-sampled tick: the device rep-pen windows missed these feeds
        for s in feeds:
            self._recent_dirty.add(s.idx)
        for s in feeds:
            t, p, append = s.feed
            s.feed = None
            if append:
                s.context.append(t)
            self._sample_and_emit(s, lg[s.idx, 0])

    def _slot_greedy_ok(self, slot: _Slot) -> bool:
        """Token choice is a pure argmax over (logits + static bias row):
        no grammar, no anti-slop state, no order-dependent host samplers."""
        sp = slot.sampler_params
        return (slot.grammar is None
                and not slot.request.params.banned_phrases
                and not slot.antislop_bans
                and sp.temperature == 0.0 and sp.rep_pen == 1.0
                and sp.presence_penalty == 0.0 and sp.dry_multiplier == 0.0
                and sp.xtc_probability == 0.0 and sp.mirostat == 0)

    def _slot_stoch_ok(self, slot: _Slot, order_key: tuple) -> bool:
        """The batched device sampler covers this slot: common stochastic
        preset (temp/top-k/top-p/min-p/rep-pen/bias/ban), rep-pen leading
        the order, and the same effective stage order as the tick's jitted
        chain (mirrors Engine._fast_stoch_ok)."""
        import os

        from .device_sampler import supported_order

        if os.environ.get("KCPP_BATCH_DEV_SAMPLE", "1") != "1":
            return False
        sp = slot.sampler_params
        if not (slot.grammar is None
                and not slot.request.params.banned_phrases
                and not slot.antislop_bans
                and sp.temperature > 0.0 and sp.mirostat == 0
                and sp.dry_multiplier == 0.0 and sp.xtc_probability == 0.0
                and sp.top_a == 0.0 and sp.tfs >= 1.0 and sp.typical_p >= 1.0
                and sp.dynatemp_range == 0.0 and sp.smoothing_factor == 0.0):
            return False
        rep_active = sp.rep_pen != 1.0 or sp.presence_penalty != 0.0
        if not supported_order(sp.sampler_order, rep_active):
            return False
        return self._order_key(sp.sampler_order) == order_key

    @staticmethod
    def _order_key(order) -> tuple:
        from ..sampling.samplers import (KCPP_SAMPLER_TEMP, KCPP_SAMPLER_TOP_K,
                                         KCPP_SAMPLER_TOP_P)
        return tuple(s for s in order if s in (
            KCPP_SAMPLER_TOP_K, KCPP_SAMPLER_TOP_P, KCPP_SAMPLER_TEMP))

    def _stoch_order_key(self, feeds) -> tuple:
        """Effective stage order for this tick's device chain: the first
        stochastic-capable feed's order (slots with a different order fall
        back to the host chain this tick); default order if none."""
        for s in feeds:
            sp = s.sampler_params
            if sp.temperature > 0.0 and s.grammar is None:
                return self._order_key(sp.sampler_order)
        return self._order_key(SamplerParams().sampler_order)

    def _sync_recent(self):
        """Rebuild device rep-pen window rows for slots whose context changed
        outside decode feeds (start/shift/rewind/prefill/host ticks)."""
        if not self._recent_dirty:
            return
        W = self._recent_W
        for idx in list(self._recent_dirty):
            ctx = self.slots[idx].context
            row = np.zeros(W, np.int32)
            tail = ctx[-W:]
            if tail:
                row[-len(tail):] = tail
            self._recent_dev = self._recent_dev.at[idx].set(jnp.asarray(row))
            self._count_dev = self._count_dev.at[idx].set(min(len(ctx), W))
        self._recent_dirty.clear()

    def _get_sampled_forward(self, order_key: tuple):
        """Jitted decode tick: batched forward + device rep-pen window roll +
        per-slot vmapped sampling.  Returns (toks (B,), logits (B, V), cache,
        recent, count); host-chain slots read their logits row from the
        second output."""
        fn = self._sampled_fwd.get(order_key)
        if fn is not None:
            return fn
        from .device_sampler import sample_step_batched
        paged = self.paged
        cfg = self.cfg

        def sfwd(params, tokens, positions, cache, *rest):
            if paged:
                table, bias, recent, count, roll, key, dyn, greedy = rest
                logits, cache = model_llama.forward_paged(
                    params, cfg, tokens, positions, cache, table,
                    last_only=True)
            else:
                bias, recent, count, roll, key, dyn, greedy = rest
                logits, cache = model_llama.forward(
                    params, cfg, tokens, positions, cache, last_only=True)
            l = logits[:, -1]
            # the fed token enters each slot's context before sampling (the
            # host chain samples over context incl. the fed token)
            rolled = jnp.roll(recent, -1, axis=1).at[:, -1].set(tokens[:, 0])
            recent = jnp.where(roll[:, None], rolled, recent)
            count = jnp.where(roll, jnp.minimum(count + 1, recent.shape[1]),
                              count)
            toks = sample_step_batched(l, bias, recent, count, key, dyn,
                                       order_key, greedy)
            return toks, l, cache, recent, count

        fn = jax.jit(sfwd, donate_argnames=("cache",))
        self._sampled_fwd[order_key] = fn
        self._sampled_fwd_raw[order_key] = sfwd
        return fn

    def _build_bias_rows(self) -> np.ndarray:
        rows = np.zeros((self.n_slots, self.cfg.vocab_size), np.float32)
        for s in self.slots:
            if not s.active:
                continue
            sp = s.sampler_params
            for tid, bv in sp.logit_biases.items():
                if 0 <= tid < self.cfg.vocab_size:
                    rows[s.idx, tid] += np.float32(bv)
            for b in sp.banned_tokens:
                if 0 <= b < self.cfg.vocab_size:
                    rows[s.idx, b] = np.float32(-1e30)
        return rows

    def _bias_device_rows(self):
        """(n_slots, V) device bias for the tick. Every request start/finish
        invalidates `_bias_dev`, and a fresh (n_slots, V) f32 upload costs
        ~n_slots*V*4 bytes of tunnel latency per slot change — but the common
        serving case (no logit_bias, no banned tokens) is ALL-ZERO rows, so
        that case reuses one persistent device buffer (never donated; only
        the cache is in the donate lists)."""
        rows = self._build_bias_rows()
        if not rows.any():
            if self._zero_bias_dev is None:
                self._zero_bias_dev = jnp.asarray(rows)
            return self._zero_bias_dev
        return jnp.asarray(rows)

    def _sample_and_emit(self, slot: _Slot, logits: np.ndarray):
        req = slot.request
        params = req.params
        if req.aborted or self.abort_event.is_set():
            self._finish(slot, "abort")
            return
        if slot.sampled >= slot.max_new:
            self._finish(slot, "length")
            return
        gmask = slot.grammar.mask() if slot.grammar is not None else None
        sp = slot.sampler_params
        pos_bans = slot.antislop_bans.get(len(slot.context))
        if pos_bans:
            sp = SamplerParams(**{
                **sp.__dict__,
                "banned_tokens": sp.banned_tokens + tuple(pos_bans)})
        tok = sample_logits(logits, slot.context, self.max_context,
                            sp, slot.sampler_state, grammar_mask=gmask)
        slot.sampled += 1
        if slot.grammar is not None:
            try:
                slot.grammar.accept(tok)
            except ValueError:
                pass
        self._emit_sampled(slot, tok)

    def _emit_sampled(self, slot: _Slot, tok: int):
        """Post-sampling bookkeeping shared by the host-sampler and
        device-argmax paths: emission, stop checks, anti-slop, next feed."""
        req = slot.request
        params = req.params
        slot.out_tokens.append(tok)
        # incremental: holds genuine partials, emits U+FFFD for invalid bytes
        # (buffer-until-valid deadlocks after one bad byte)
        piece = slot.utf8.decode(
            self.tokenizer.decode_token_bytes(tok, skip_special=False))
        if piece:
            slot.out_text += piece
            if slot.stream_delay:
                slot.stream_q.append((len(slot.out_tokens), tok, piece))
            else:
                req.text_so_far = slot.out_text
                if req.on_token:
                    req.on_token(tok, piece)

        if not params.bypass_eos and tok in slot.eos_ids:
            self._finish(slot, "eos")
            return
        if params.stop_sequences:
            hit = _find_stop(slot.out_text, params.stop_sequences)
            if hit is not None:
                if params.trim_stop:
                    slot.out_text = slot.out_text[:hit]
                self._finish(slot, "stop_sequence")
                return

        # anti-slop: banned phrase appeared -> rewind this slot and ban the
        # offending token at its position (gpttype_adapter.cpp:3292-3343)
        if params.banned_phrases:
            rew = antislop_check(self.tokenizer, slot.out_text,
                                 params.banned_phrases, slot.out_tokens)
            if rew is not None:
                n_rewind, ban_tok = rew
                slot.out_tokens = slot.out_tokens[:-n_rewind]
                slot.utf8 = codecs.getincrementaldecoder("utf-8")(
                    errors="replace")
                slot.out_text = slot.utf8.decode(b"".join(
                    self.tokenizer.decode_token_bytes(t, skip_special=False)
                    for t in slot.out_tokens))
                # the just-sampled token is not in context yet, so the cache
                # rewinds one fewer slot than the output does
                slot.context = slot.context[
                    :len(slot.context) - (n_rewind - 1)]
                slot.antislop_bans.setdefault(
                    len(slot.context), set()).add(ban_tok)
                self._recent_dirty.add(slot.idx)
                slot.stream_q = [e for e in slot.stream_q
                                 if e[0] <= len(slot.out_tokens)]
                # replay: recompute logits at the rewound tail (re-evaluates
                # context[-1] at its own position; cache rewrite is identical)
                slot.feed = (slot.context[-1], len(slot.context) - 1, False)
                return

        # emit pieces that are now beyond rewind reach
        while (slot.stream_q
               and slot.stream_q[0][0] <= len(slot.out_tokens)
               - slot.stream_delay):
            _, qt, qp = slot.stream_q.pop(0)
            req.text_so_far += qp
            if req.on_token:
                req.on_token(qt, qp)

        if slot.sampled >= slot.max_new:
            self._finish(slot, "length")
            return
        slot.feed = (tok, len(slot.context), True)

    def _finish(self, slot: _Slot, reason: str):
        req = slot.request
        for _, qt, qp in slot.stream_q:  # flush held-back pieces
            req.text_so_far += qp
            if req.on_token:
                req.on_token(qt, qp)
        slot.stream_q = []
        tail = slot.utf8.decode(b"", final=True) if slot.utf8 else ""
        if tail:  # flush trailing partial UTF-8 (lossy, like reference detok)
            slot.out_text += tail
        req.text_so_far = slot.out_text
        slot.feed = None
        slot.pending_prefill = []
        slot.pending_first = None
        now = time.perf_counter()
        t = Timings(
            prompt_tokens=slot.prompt_len,
            gen_tokens=len(slot.out_tokens),
            prompt_time=(slot.t_prefill_done or now) - slot.t_start,
            gen_time=now - (slot.t_prefill_done or now))
        req.result = GenerationResult(
            text=slot.out_text, tokens=list(slot.out_tokens),
            stop_reason=reason, timings=t)
        self.last_timings = t
        self.total_gens += 1
        # slot.context already equals exactly the tokens present in the cache
        # (prompt + generated-and-fed), which the next request fast-forwards on
        slot.request = None
        self._bias_dev = None
        self._dyn_rows = None
        req.done.set()


@partial(jax.jit, static_argnames=("rope_type", "rot_dim"),
         donate_argnames=("cache",))
def _kv_shift_slot_jit(cache, slot_idx, start, end, freqs,
                       rope_type: str, rot_dim: int):
    """Context-shift surgery on ONE slot's cache rows: extract row slot_idx
    from every (B, S, ...) leaf, apply the slide+re-rotate (_shift_rows), and
    re-insert. Other slots' rows are untouched (aliased through donation)."""
    from ..kv.cache import KVCache, _is_layers, _leaf4

    h = getattr(cache, "heads", None)

    def shift_leafpair(kl, vl):
        krow = jax.lax.dynamic_slice_in_dim(kl, slot_idx, 1, 0)
        vrow = jax.lax.dynamic_slice_in_dim(vl, slot_idx, 1, 0)
        shp = krow.shape
        k4, v4 = _shift_rows(_leaf4(krow, h), _leaf4(vrow, h),
                             start, end, freqs, rope_type, rot_dim)
        k = jax.lax.dynamic_update_slice_in_dim(
            kl, k4.reshape(shp).astype(kl.dtype), slot_idx, 0)
        v = jax.lax.dynamic_update_slice_in_dim(
            vl, v4.reshape(shp).astype(vl.dtype), slot_idx, 0)
        return k, v

    if _is_layers(cache.k):
        pairs = [shift_leafpair(kl, vl) for kl, vl in zip(cache.k, cache.v)]
        kw = {"heads": h} if hasattr(cache, "heads") else {}
        if hasattr(cache, "k_scale"):
            # Q8 KV: scales move with their rows (no re-rotation of scales —
            # rotation changes K values, so shift re-rotates the DEQUANTIZED
            # rows; for simplicity Q8-KV slots fall back to full re-eval)
            raise NotImplementedError(
                "context shift with quantized KV is disabled "
                "(reference also disables it, koboldcpp.py:840-845)")
        return KVCache(k=tuple(p[0] for p in pairs),
                       v=tuple(p[1] for p in pairs), **kw)
    k, v = shift_leafpair(cache.k, cache.v)
    return KVCache(k=k, v=v)
