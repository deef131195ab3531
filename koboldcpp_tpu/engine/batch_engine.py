"""Continuous-batching engine.

What the reference lacks (SURVEY.md §2.6: "no continuous batching across
requests" — kobold serializes behind modelbusy, koboldcpp.py:1937): a slot
scheduler that admits requests as they arrive, prefills each into its own KV
slot, and advances ALL active sequences with one batched decode step per
iteration. The per-slot context fast-forward trick carries over (each slot
keeps its own token history).

Round-1 layout: slot-batched contiguous cache (L, B_slots, S, H, D) with
per-slot lengths (slot==position invariant per row). The page-table layout
(kv/paged.py) replaces the S axis in round 2 without changing this scheduler.
"""
from __future__ import annotations

import codecs
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..grammar.gbnf import TokenFilter
from ..kv.cache import init_cache
from ..models import llama as model_llama
from ..models.loader import Model
from ..sampling import SamplerParams, build_dry_sequences, make_state, sample_logits
from .engine import GenParams, GenerationResult, Timings, _detok, _find_stop

PREFILL_BUCKETS = (16, 32, 64, 128, 256, 512)


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

    @property
    def active(self) -> bool:
        return self.request is not None


class BatchedEngine:
    """Drop-in Engine replacement with cross-request continuous batching."""

    def __init__(self, model: Model, max_context: int = 2048, n_slots: int = 4,
                 cache_dtype=jnp.bfloat16, paged: bool = False,
                 page_size: int = 64, pool_fraction: float = 1.0,
                 quantkv: bool = False):
        self.model = model
        self.cfg = model.cfg
        self.tokenizer = model.tokenizer
        self.max_context = max_context
        self.n_slots = n_slots
        self.paged = paged
        if paged:
            from ..kv.paged import PageAllocator, init_paged_cache

            max_pages = -(-max_context // page_size)
            n_pages = max(1, int(n_slots * max_pages * pool_fraction))
            self.page_size = page_size
            self.allocator = PageAllocator(n_pages, page_size, max_pages)
            self.cache = init_paged_cache(
                self.cfg.n_layers, n_pages, page_size, self.cfg.n_kv_heads,
                self.cfg.head_dim, quantized=quantkv)
        else:
            self.cache = init_cache(self.cfg.n_layers, n_slots, max_context,
                                    self.cfg.n_kv_heads, self.cfg.head_dim,
                                    dtype=cache_dtype)
        self.slots = [_Slot(idx=i) for i in range(n_slots)]
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        self.abort_event = threading.Event()  # abort-all (compat)
        self.last_timings = Timings()
        self.total_gens = 0
        self.generation_finished = True
        self.stream_tokens: list[str] = []
        self._shutdown = False
        self._wake = threading.Event()

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
        self._shutdown = True
        self._wake.set()

    # -- scheduler loop ----------------------------------------------------
    def _loop(self):
        while not self._shutdown:
            admitted = self._admit()
            n_active = sum(s.active for s in self.slots)
            if n_active == 0:
                self.generation_finished = True
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            self.generation_finished = False
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

        # per-slot context fast-forward
        prompt = req.prompt_tokens
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

        # prefill this slot (others unaffected; single-row batch)
        logits = self._prefill(slot, todo, n)
        slot.context.extend(todo)
        slot.t_prefill_done = time.perf_counter()
        self._sample_and_emit(slot, logits)

    def _table(self) -> jnp.ndarray:
        rows = np.stack([self.allocator.table(i) for i in range(self.n_slots)])
        return jnp.asarray(rows.astype(np.int32))

    def _run_forward(self, tok: np.ndarray, ppos: np.ndarray):
        if self.paged:
            return self._forward(self.model.params, jnp.asarray(tok),
                                 jnp.asarray(ppos), self.cache, self._table())
        return self._forward(self.model.params, jnp.asarray(tok),
                             jnp.asarray(ppos), self.cache)

    def _prefill(self, slot: _Slot, tokens: list[int], start_pos: int) -> np.ndarray:
        logits = None
        pos = start_pos
        i = 0
        while i < len(tokens):
            chunk = tokens[i:i + PREFILL_BUCKETS[-1]]
            b = _bucket(len(chunk))
            pad = b - len(chunk)
            tok = np.zeros((self.n_slots, b), dtype=np.int32)
            ppos = np.full((self.n_slots, b), -1, dtype=np.int32)
            tok[slot.idx, pad:] = chunk
            ppos[slot.idx, pad:] = np.arange(pos, pos + len(chunk))
            if self.paged:
                self.allocator.ensure(slot.idx, pos + len(chunk))
            lg, self.cache = self._run_forward(tok, ppos)
            logits = np.asarray(lg[slot.idx, -1])
            pos += len(chunk)
            i += len(chunk)
        return logits

    def _decode_step(self):
        tok = np.zeros((self.n_slots, 1), dtype=np.int32)
        pos = np.full((self.n_slots, 1), -1, dtype=np.int32)
        for s in self.slots:
            if s.active and s.out_tokens:
                tok[s.idx, 0] = s.out_tokens[-1]
                pos[s.idx, 0] = len(s.context)
                if self.paged:
                    self.allocator.ensure(s.idx, len(s.context) + 1)
        lg, self.cache = self._run_forward(tok, pos)
        lg = np.asarray(lg)
        for s in self.slots:
            if not s.active:
                continue
            if not s.out_tokens:
                continue  # prefill path already sampled
            s.context.append(s.out_tokens[-1])
            self._sample_and_emit(s, lg[s.idx, 0])

    def _sample_and_emit(self, slot: _Slot, logits: np.ndarray):
        req = slot.request
        params = req.params
        if req.aborted or self.abort_event.is_set():
            self._finish(slot, "abort")
            return
        if len(slot.out_tokens) >= slot.max_new:
            self._finish(slot, "length")
            return
        gmask = slot.grammar.mask() if slot.grammar is not None else None
        tok = sample_logits(logits, slot.context, self.max_context,
                            slot.sampler_params, slot.sampler_state,
                            grammar_mask=gmask)
        if slot.grammar is not None:
            try:
                slot.grammar.accept(tok)
            except ValueError:
                pass
        slot.out_tokens.append(tok)
        # incremental: holds genuine partials, emits U+FFFD for invalid bytes
        # (buffer-until-valid deadlocks after one bad byte)
        piece = slot.utf8.decode(
            self.tokenizer.decode_token_bytes(tok, skip_special=False))
        if piece:
            slot.out_text += piece
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
        if len(slot.out_tokens) >= slot.max_new:
            self._finish(slot, "length")

    def _finish(self, slot: _Slot, reason: str):
        req = slot.request
        tail = slot.utf8.decode(b"", final=True) if slot.utf8 else ""
        if tail:  # flush trailing partial UTF-8 (lossy, like reference detok)
            slot.out_text += tail
            req.text_so_far = slot.out_text
        now = time.perf_counter()
        t = Timings(
            prompt_tokens=slot.prompt_len,
            gen_tokens=len(slot.out_tokens),
            prompt_time=slot.t_prefill_done - slot.t_start,
            gen_time=now - slot.t_prefill_done)
        req.result = GenerationResult(
            text=slot.out_text, tokens=list(slot.out_tokens),
            stop_reason=reason, timings=t)
        self.last_timings = t
        self.total_gens += 1
        # slot.context already equals exactly the tokens present in the cache
        # (prompt + generated-and-fed), which the next request fast-forwards on
        slot.request = None
        req.done.set()
