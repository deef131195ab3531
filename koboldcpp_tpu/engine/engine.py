"""Generation engine: the serving hot loop.

Counterpart of gpttype_generate (/root/reference/gpttype_adapter.cpp:2453-3535):
prefill (chunked, shape-bucketed jit) -> sample -> stream -> stop checks, with
kobold's signature KV-reuse tricks:
  - context fast-forward (longest common prefix, model_adapter.cpp:424)
  - context shift (mid-cache trim + RoPE re-rotation, gpttype_adapter.cpp:1504)
  - anti-slop rewind (banned phrases, gpttype_adapter.cpp:3292)

Single-sequence round-1 engine (matches the reference's one-at-a-time design);
the continuous-batching scheduler builds on the same jitted step functions.
"""
from __future__ import annotations

import codecs
import os
import threading
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..grammar.gbnf import TokenFilter
from ..kv.cache import KVCache, init_cache
from ..models import llama as model_llama
from ..models.config import ModelConfig
from ..models.loader import Model
from ..ops.rope import rope_frequencies
from ..sampling import SamplerParams, build_dry_sequences, make_state, sample_logits

PREFILL_BUCKETS = (16, 32, 64, 128, 256, 512)
# Tokens per device call on the greedy/stochastic fast paths. Each call costs
# one host->device dispatch (~30 ms over the axon tunnel, ~100 us locally);
# overshoot past a stop condition is computed-then-discarded, so larger K
# trades a little wasted tail compute for fewer round trips.  With pipelined
# dispatch the host loop period per chunk is ~(tunnel RTT + processing), so K
# must be large enough that the device's chunk time exceeds the RTT or the
# host becomes the bottleneck (K=32 ~= 40 ms device time at 800 t/s vs 23 ms
# RTT — device-bound with margin).
FAST_DECODE_K = int(os.environ.get("KCPP_FAST_DECODE_K", "32"))


@dataclass
class GenParams:
    """Per-request generation controls (generation_inputs, expose.h:76-175)."""

    max_length: int = 128
    sampler: SamplerParams = field(default_factory=SamplerParams)
    stop_sequences: list[str] = field(default_factory=list)
    grammar: str = ""
    grammar_retain_state: bool = False
    use_default_badwordsids: bool = False  # ban EOS
    banned_phrases: list[str] = field(default_factory=list)  # anti-slop
    dry_sequence_breakers: list[str] = field(default_factory=list)
    trim_stop: bool = True
    bypass_eos: bool = False
    images: list[str] = field(default_factory=list)  # base64, LLaVA splice


@dataclass
class Timings:
    prompt_tokens: int = 0
    gen_tokens: int = 0
    prompt_time: float = 0.0
    gen_time: float = 0.0

    @property
    def prompt_tps(self) -> float:
        return self.prompt_tokens / self.prompt_time if self.prompt_time > 0 else 0.0

    @property
    def gen_tps(self) -> float:
        return self.gen_tokens / self.gen_time if self.gen_time > 0 else 0.0


@dataclass
class GenerationResult:
    text: str = ""
    tokens: list[int] = field(default_factory=list)
    stop_reason: str = "length"  # length | eos | stop_sequence | abort
    timings: Timings = field(default_factory=Timings)


def _bucket(n: int) -> int:
    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    return PREFILL_BUCKETS[-1]


def _kv_quant(quantkv) -> bool | int:
    """--quantkv level -> init_cache quantized arg: 0/False off, 1/True Q8,
    2 -> Q4_0-equivalent packed nibbles (reference F16/Q8_0/Q4_0 ladder,
    gpttype_adapter.cpp:1958-1959)."""
    if quantkv in (2, 4):
        return 4
    return bool(quantkv)


class Engine:
    def __init__(self, model: Model, max_context: int = 2048,
                 cache_dtype=jnp.bfloat16, compute_dtype=None, clip_model=None,
                 quantkv: bool = False, use_smartcontext: bool = False,
                 use_contextshift: bool = True, pp_mesh=None, sp_mesh=None):
        self.model = model
        self._pull_pool = None
        self.clip = clip_model  # models.clip.ClipModel for LLaVA requests
        self.quantkv = quantkv
        self.use_smartcontext = use_smartcontext
        self.use_contextshift = use_contextshift and not use_smartcontext
        self.smartcontext: list[int] = []  # saved halved-prompt buffer
        self.cfg = model.cfg
        self.tokenizer = model.tokenizer
        self.max_context = max_context
        self.cache_dtype = cache_dtype
        # recurrent archs (mamba/rwkv6) keep fixed-shape states, not a KV ring;
        # context shift / smart context / rewind don't apply (reference
        # requires full-prefix match for recurrent, model_adapter.cpp:424)
        self.recurrent = self.cfg.is_recurrent
        # encoder-only embedding models (bert/t5encoder): no generation loop,
        # served via Engine.embed (the llama.cpp-server /embeddings role)
        self.embedding = self.cfg.is_embedding
        # encoder-decoder (t5): prompt goes through the encoder each request,
        # decoder cache is fresh per request (the reference re-runs
        # llama_encode per call; no cross-request KV reuse applies)
        self.encdec = self.cfg.is_encoder_decoder
        if self.embedding:
            self.use_contextshift = False
            self.use_smartcontext = False
            self.cache = None
        elif self.encdec:
            self.use_contextshift = False
            self.use_smartcontext = False
            self.cache = None  # built per request (encoder length varies)
            self._enc_cache_len = 0
        elif self.recurrent:
            self.use_contextshift = False
            self.use_smartcontext = False
            self._model_mod = self._recurrent_mod()
            self.cache = self._model_mod.init_state(self.cfg, 1)
        elif self.cfg.arch in ("deepseek2", "minicpm3"):
            # MLA: K rows carry [nope | shared rope] so the generic k-shift
            # re-rotation doesn't apply; fast-forward still does
            from ..models import deepseek2 as _ds2

            self._ds2 = _ds2
            self.use_contextshift = False
            self.use_smartcontext = False
            self.cache = _ds2.init_cache(self.cfg, 1, max_context,
                                         dtype=cache_dtype)
        else:
            self.cache = init_cache(self.cfg.n_layers, 1, max_context,
                                    self.cfg.n_kv_heads, self.cfg.head_dim,
                                    dtype=cache_dtype,
                                    quantized=_kv_quant(quantkv))
        self.context_tokens: list[int] = []  # tokens currently in the cache
        self.abort_event = threading.Event()
        self.lock = threading.Lock()  # the modelbusy equivalent
        self._grammar_cache: tuple[str, TokenFilter] | None = None
        self.last_timings = Timings()
        self.total_gens = 0
        # streaming state for the polling API
        self.stream_tokens: list[str] = []
        self.generation_finished = True

        if self.embedding:
            if self.cfg.arch in ("bert", "nomic-bert", "jina-bert-v2"):
                from ..models import bert as _emb

                self._embed_fn = jax.jit(
                    partial(_emb.forward_embed, cfg=self.cfg))
            else:  # t5encoder
                from ..models import t5 as _t5e

                self._embed_fn = jax.jit(partial(_t5e.encode, cfg=self.cfg))
            self.use_flash_prefill = False
        elif self.encdec:
            from ..models import t5 as _t5

            self._t5 = _t5
            self._forward = jax.jit(
                partial(_t5.forward, cfg=self.cfg), donate_argnames=("cache",))
            self._encode = jax.jit(partial(_t5.encode, cfg=self.cfg))
            self.use_flash_prefill = False
        elif self.recurrent:
            self._forward = jax.jit(
                partial(self._model_mod.forward, cfg=self.cfg),
                donate_argnames=("cache",))
            self.use_flash_prefill = False
        elif self.cfg.arch in ("deepseek2", "minicpm3"):
            self._forward = jax.jit(
                partial(self._ds2.forward, cfg=self.cfg, last_only=True),
                donate_argnames=("cache",))
            self.use_flash_prefill = False
        elif sp_mesh is not None:
            # ---- sequence-parallel serving (--seqparallel N): the KV
            # cache's sequence axis shards over the sp mesh axis so no chip
            # holds more than S/n keys — ring-attention prefill (one ICI hop
            # per step), pmax/psum online-softmax decode.  The prompt
            # evaluates in ONE full-width forward (end-padded to the shard
            # width); context reuse via fast-forward still applies (decode
            # rows land on their owner chips), chunked prefill does not.
            from ..parallel.sequence import shard_cache_sp, sp_forward

            self._std_path = False
            self.use_flash_prefill = False
            self.use_contextshift = False
            self.use_smartcontext = False
            self.sp_mesh = sp_mesh
            self._n_sp = sp_mesh.shape["sp"]
            if max_context % self._n_sp:
                raise ValueError(
                    f"--seqparallel {self._n_sp} must divide the context "
                    f"size {max_context}")
            self.cache = shard_cache_sp(self.cache, sp_mesh)

            def _sp_fwd(params, tokens, positions, cache, last_index):
                logits, cache = sp_forward(
                    params, self.cfg, tokens, positions, cache, sp_mesh,
                    last_index=last_index)
                return logits[:, -1:], cache

            self._sp_forward = jax.jit(_sp_fwd, donate_argnames=("cache",))

            def _fwd(params, tokens, positions, cache):
                return self._sp_forward(params, tokens, positions, cache,
                                        jnp.int32(0))

            self._forward = _fwd  # T=1 decode steps (last_index unused)
        elif pp_mesh is not None:
            # ---- pipeline-parallel serving (--pipeline N): layer stages
            # over the pp mesh axis, GPipe microbatch schedule for prefill
            # AND decode (T=1 steps through the same schedule with M=1 at
            # B=1 — single-stream PP decode is inherently stage-sequential).
            # Context shift needs per-layer cache surgery the stage-sharded
            # stacked cache doesn't support yet; fast-forward still applies.
            from ..kv.cache import stack_cache
            from ..models.llama import stack_layers
            from ..parallel.pipeline import (pipeline_forward,
                                             shard_stacked_for_pp)

            n_stages = pp_mesh.shape["pp"]
            if self.cfg.n_layers % n_stages:
                raise ValueError(
                    f"--pipeline {n_stages} must divide n_layers "
                    f"{self.cfg.n_layers}")
            sparams = stack_layers(model.params)
            if "layers_stacked" not in sparams:
                raise ValueError(
                    "pipeline serving needs homogeneous layers "
                    "(stack_layers could not stack this model)")
            self._std_path = False
            self.use_flash_prefill = False
            self.use_contextshift = False
            self.use_smartcontext = False
            self.pp_mesh = pp_mesh
            sparams, self.cache = shard_stacked_for_pp(
                sparams, stack_cache(self.cache), pp_mesh)
            model.params = sparams

            import math

            def _pp_fwd(params, tokens, positions, cache):
                # B=1 serving: M = gcd(B, stages) microbatches (M=1 single
                # stream — PP decode is stage-sequential for one sequence)
                M = math.gcd(tokens.shape[0], n_stages)
                logits, cache = pipeline_forward(
                    params, self.cfg, tokens, positions, cache, pp_mesh,
                    microbatches=M)
                return logits[:, -1:], cache

            self._forward = jax.jit(_pp_fwd, donate_argnames=("cache",))
        else:
            self._std_path = True  # llama-family forward: greedy fast path ok
            self._forward = jax.jit(
                partial(model_llama.forward, cfg=self.cfg, last_only=True),
                static_argnames=(),
                donate_argnames=("cache",),
            )

            def _greedy_chunk(params, logits0, cache, start_pos, ban_mask):
                """K greedy tokens per device call (amortizes host-device
                round trips; the reference pays one C call per token but no
                PCIe hop — on a tunneled TPU each hop is ~25 ms)."""
                def body(i, carry):
                    logits, cache, toks = carry
                    nxt = jnp.argmax(logits + ban_mask).astype(jnp.int32)
                    toks = toks.at[i].set(nxt)
                    new_logits, cache = model_llama.forward(
                        params, self.cfg, nxt[None, None],
                        jnp.full((1, 1), start_pos + i, jnp.int32),
                        cache, last_only=True)
                    return new_logits[0, -1], cache, toks
                logits, cache, toks = jax.lax.fori_loop(
                    0, FAST_DECODE_K, body,
                    (logits0, cache, jnp.zeros((FAST_DECODE_K,), jnp.int32)))
                return toks, logits, cache

            self._greedy_chunk = jax.jit(_greedy_chunk,
                                         donate_argnames=("cache",))
            self._forward_flash = jax.jit(
                partial(model_llama.forward, cfg=self.cfg, flash_prefill=True),
                static_argnames=(),
                donate_argnames=("cache",),
            )
            # flash prefill: TPU-only pallas kernel, needs block-sized chunks
            self.use_flash_prefill = (jax.default_backend() not in ("cpu",)
                                      and self.cfg.head_dim in (64, 128, 256)
                                      and not self.cfg.use_alibi)

    def embed(self, texts: list[str]) -> np.ndarray:
        """Pooled embeddings for each text (bert/t5encoder models).
        Pooling mode from {arch}.pooling_type (mean default, CLS for 2)."""
        if not self.embedding:
            raise ValueError("loaded model is not an embedding model")
        from ..models.bert import pool

        mode = {2: "cls"}.get(
            (self.cfg.extras or {}).get("pooling", 1), "mean")
        out = []
        with self.lock:
            for text in texts:
                ids = self.tokenizer.encode(text)
                if not ids:
                    ids = [0]
                ids = ids[:self.max_context]
                n = len(ids)
                b = _bucket(n)
                tok = jnp.asarray(
                    np.array([ids + [0] * (b - n)], np.int32))
                pos = jnp.asarray(np.array(
                    [list(range(n)) + [-1] * (b - n)], np.int32))
                hidden = self._embed_fn(self.model.params, tokens=tok,
                                        positions=pos)
                out.append(np.asarray(pool(hidden, pos, mode))[0])
        return np.stack(out)

    def _run_encoder(self, prompt_tokens: list[int]):
        """Encode the prompt and build a fresh decoder cache with projected
        cross K/V (t5.prepare_cross)."""
        n = len(prompt_tokens)
        b = _bucket(n)
        tok = jnp.asarray(np.array([prompt_tokens + [0] * (b - n)], np.int32))
        pos = jnp.asarray(np.array([list(range(n)) + [-1] * (b - n)], np.int32))
        enc_out = self._encode(self.model.params, tokens=tok, positions=pos)
        cache = self._t5.init_cache(self.cfg, 1, self.max_context, b)
        self.cache = self._t5.prepare_cross(
            self.model.params, self.cfg, enc_out, pos >= 0, cache)

    def _recurrent_mod(self):
        if self.cfg.arch == "mamba":
            from ..models import mamba
            return mamba
        if self.cfg.arch == "rwkv4":
            from ..models import rwkv4
            return rwkv4
        from ..models import rwkv6
        return rwkv6

    def _reset_recurrent_state(self):
        self.cache = self._model_mod.init_state(self.cfg, 1)

    # -- low-level steps ---------------------------------------------------
    def _sp_eval(self, tokens: list[int], start_pos: int):
        """Sequence-parallel evaluation: a fresh full prompt goes through
        the ring-attention prefill in ONE end-padded forward; single tokens
        (and tail re-evals after fast-forward) step through the distributed
        decode."""
        import jax.numpy as _jnp

        if len(tokens) == 1:
            tok = _jnp.asarray([[tokens[0]]], _jnp.int32)
            pos = _jnp.asarray([[start_pos]], _jnp.int32)
            logits, self.cache = self._forward(
                self.model.params, tok, pos, self.cache)
            return logits[0, -1]
        if start_pos > 0:
            # ring prefill assumes a fresh [0, T) prompt; a reused-context
            # tail steps through decode (each row lands on its owner chip)
            out = None
            for i, t in enumerate(tokens):
                out = self._sp_eval([t], start_pos + i)
            return out
        n = self._n_sp
        b = min(-(-len(tokens) // (16 * n)) * (16 * n), self.max_context)
        toks = list(tokens) + [0] * (b - len(tokens))
        tok = _jnp.asarray([toks], _jnp.int32)
        pos = _jnp.asarray([list(range(b))], _jnp.int32)
        logits, self.cache = self._sp_forward(
            self.model.params, tok, pos, self.cache,
            _jnp.int32(len(tokens) - 1))
        return logits[0, -1]

    def _eval_chunk(self, tokens: list[int], start_pos: int):
        """Evaluate tokens at positions [start_pos, ...); returns the last
        token's logits as a DEVICE array (callers that host-sample convert
        with np.asarray; the fast decode paths feed it straight back to the
        device — skipping the ~2x25 ms tunnel round trip per request)."""
        if getattr(self, "sp_mesh", None) is not None:
            return self._sp_eval(tokens, start_pos)
        n = len(tokens)
        b = _bucket(n)
        pad = b - n
        if self.recurrent:
            # right-pad: state updates are gated on position >= 0, and the
            # conv/scan must see real tokens contiguously from the state
            tok = jnp.asarray(np.array([tokens + [0] * pad], dtype=np.int32))
            pos = jnp.asarray(np.array(
                [list(range(start_pos, start_pos + n)) + [-1] * pad],
                dtype=np.int32))
            logits, self.cache = self._forward(
                self.model.params, tokens=tok, positions=pos, cache=self.cache,
                last_index=jnp.array([n - 1], dtype=jnp.int32))
            return logits[0, -1]
        if self.use_flash_prefill and start_pos == 0 and b >= 128:
            # pad at the END so row index == position (causal alignment);
            # gather logits at the last real row
            tok = jnp.asarray(np.array([tokens + [0] * pad], dtype=np.int32))
            pos = jnp.asarray(np.array(
                [list(range(n)) + [-1] * pad], dtype=np.int32))
            logits, self.cache = self._forward_flash(
                self.model.params, tokens=tok, positions=pos, cache=self.cache,
                last_index=jnp.array([n - 1], dtype=jnp.int32))
            return logits[0, -1]
        tok = jnp.asarray(np.array([[0] * pad + tokens], dtype=np.int32))
        pos = jnp.asarray(
            np.array([[-1] * pad + list(range(start_pos, start_pos + n))],
                     dtype=np.int32))
        logits, self.cache = self._forward(self.model.params, tokens=tok,
                                           positions=pos, cache=self.cache)
        return logits[0, -1]

    IMG_SENTINEL = -999  # context placeholder for image-patch positions

    def _eval_chunk_embeds(self, tokens: list[int], embeds: np.ndarray,
                           start_pos: int) -> np.ndarray:
        """Evaluate a mixed chunk: rows where tokens == IMG_SENTINEL take the
        corresponding row of `embeds` (B=1). LLaVA image splicing."""
        n = len(tokens)
        b = _bucket(n)
        pad = b - n
        tok_arr = np.array([[0] * pad + [t if t >= 0 else 0 for t in tokens]],
                           dtype=np.int32)
        pos = np.array([[-1] * pad + list(range(start_pos, start_pos + n))],
                       dtype=np.int32)
        mask = np.array([[False] * pad + [t == self.IMG_SENTINEL for t in tokens]])
        emb = np.zeros((1, b, embeds.shape[-1]), dtype=np.float32)
        emb[0, pad:][mask[0, pad:]] = embeds
        if not hasattr(self, "_forward_mm"):
            self._forward_mm = jax.jit(
                partial(model_llama.forward, cfg=self.cfg, last_only=True),
                donate_argnames=("cache",))
        logits, self.cache = self._forward_mm(
            self.model.params, tokens=jnp.asarray(tok_arr),
            positions=jnp.asarray(pos), cache=self.cache,
            input_embeds=jnp.asarray(emb), embed_mask=jnp.asarray(mask))
        return logits[0, -1]

    def eval_tokens(self, tokens: list[int], start_pos: int,
                    emb_by_pos: dict[int, np.ndarray] | None = None) -> np.ndarray:
        """Chunked prefill (n_batch equivalent); returns logits of last token.
        emb_by_pos maps absolute positions of IMG_SENTINEL tokens to their
        image-patch embedding rows."""
        if getattr(self, "sp_mesh", None) is not None and not emb_by_pos:
            return self._sp_eval(tokens, start_pos)
        logits = None
        pos = start_pos
        i = 0
        while i < len(tokens):
            chunk = tokens[i:i + PREFILL_BUCKETS[-1]]
            if emb_by_pos and any(t == self.IMG_SENTINEL for t in chunk):
                rows = np.stack([emb_by_pos[pos + j]
                                 for j, t in enumerate(chunk)
                                 if t == self.IMG_SENTINEL])
                logits = self._eval_chunk_embeds(chunk, rows, pos)
            else:
                logits = self._eval_chunk(chunk, pos)
            pos += len(chunk)
            i += len(chunk)
        return logits

    # -- context reuse -----------------------------------------------------
    def _fast_forward(self, prompt: list[int]) -> int:
        """Longest common prefix with the cached context (ContextFastForward,
        model_adapter.cpp:424). Returns n_past. Always re-evals >=1 token.

        Recurrent models can only continue from the state's exact point: the
        whole cached context must be a strict prefix of the prompt (the
        reference's RWKV/Mamba full-subset rule); otherwise the state resets
        and everything re-evaluates."""
        if self.encdec:
            return 0
        if self.recurrent:
            ctx = self.context_tokens
            if ctx and len(ctx) <= len(prompt) - 1 and prompt[:len(ctx)] == ctx:
                return len(ctx)
            self._reset_recurrent_state()
            return 0
        n = 0
        limit = min(len(self.context_tokens), len(prompt) - 1)
        while n < limit and self.context_tokens[n] == prompt[n]:
            n += 1
        return n

    def _context_shift(self, prompt: list[int]) -> list[int] | None:
        """Smart purge (PurgeMissingTokens, gpttype_adapter.cpp:1504): when the
        history scrolled (chat trimmed at top), drop the gap from the cache and
        re-rotate shifted keys instead of re-evaluating everything.

        Returns the prompt with positions remapped... in this TPU design we
        instead surgically rewrite the cache; returns None if not applicable.
        """
        ctx = self.context_tokens
        if not ctx or len(prompt) < 2:
            return None
        # find first divergence
        p0 = 0
        lim = min(len(ctx), len(prompt))
        while p0 < lim and ctx[p0] == prompt[p0]:
            p0 += 1
        if p0 == 0 or p0 >= len(ctx):
            return None
        # find the longest run of the remaining cache that reappears in the
        # new prompt after the divergence point
        short_fall = max(0, len(prompt) - self.max_context)
        tail_ctx = ctx[p0:]
        tail_prompt = prompt[p0:]
        best_len, ci, pi = _longest_common_run(tail_ctx, tail_prompt)
        threshold = max(96, len(tail_prompt) // 4)
        if best_len < threshold or ci == 0:
            return None
        # remove cache positions [p0, p0+ci), shift the rest down
        self._kv_remove_shift(p0, p0 + ci)
        self.context_tokens = ctx[:p0] + ctx[p0 + ci:]
        return prompt

    def _smart_context(self, prompt: list[int]) -> list[int]:
        """Legacy smart context (ContextFastForward, model_adapter.cpp:424-558).

        When the cache is nearly full and the incoming prompt diverges far from
        it, chop the un-reusable half of the prompt off and remember the kept
        tail (`smartcontext`); later prompts that still contain that tail are
        trimmed to it, so only genuinely-new text is evaluated. Positions are
        deliberately discontinuous (the reference accepts the same lossiness).
        Returns the (possibly trimmed) prompt to feed the normal
        fast-forward path.
        """
        nctx = self.max_context
        ctx_thresh = int(nctx * 0.8)     # SCCtxLenThreshold
        inp_thresh = int(nctx * 0.6)     # SCInpLenThreshold
        past_thresh = int(nctx * 0.5)    # SCPastLenThreshold
        tok_thresh = 32 + int(nctx * 0.05)  # SCTokThreshold

        n_past = self._fast_forward(prompt)
        rem = prompt[n_past:]
        reused = False
        if self.smartcontext and len(rem) >= inp_thresh:
            # reuse: the remembered buffer must reappear (prefix-anchored run)
            blen, ci, pi = _longest_common_run(self.smartcontext, rem)
            if blen > tok_thresh and ci == 0:
                rem = rem[pi:]
                reused = True
            else:
                self.smartcontext = []
        else:
            self.smartcontext = []
        if (not reused and not self.smartcontext
                and len(self.context_tokens) >= ctx_thresh
                and len(rem) >= inp_thresh
                and len(self.context_tokens) - n_past > past_thresh):
            # trigger: keep the tail half, remember it as the anchor
            shift = int(len(rem) * 0.5)  # SCTruncationRatio
            self.smartcontext = rem[shift:]
            rem = self.smartcontext
        # composed prompt: reused prefix + trimmed remainder; the ordinary
        # fast-forward then also reuses any of rem already evaluated last time
        # (the reference's offset_fix continuation loop, model_adapter.cpp:508)
        return prompt[:n_past] + rem

    def _kv_remove_shift(self, start: int, end: int):
        """Delete cache slots [start, end) and slide later slots down,
        re-rotating K by the position delta (the reference's kv_seq_rm +
        kv_seq_add + k-shift graph, src/llama.cpp:16268)."""
        delta = end - start
        n_used = len(self.context_tokens)
        freqs = rope_frequencies(self.cfg)
        self.cache = _kv_shift_jit(self.cache, start, end, n_used, freqs,
                                   self.cfg.rope_type, self.cfg.rope_dim)

    def _fast_greedy_ok(self, params: GenParams, grammar) -> bool:
        """Device-side K-token greedy decode is bit-identical to the host
        loop only when no logit-modifying host sampler is active (at temp 0
        rep-pen/DRY/bias/XTC/mirostat can change the argmax); token bans are
        handled with an on-device mask. Disable with KCPP_FAST_DECODE=0."""
        import os

        if os.environ.get("KCPP_FAST_DECODE", "1") != "1":
            return False
        if not getattr(self, "_std_path", False):
            return False
        sp = params.sampler
        return (grammar is None and not params.banned_phrases
                and sp.temperature == 0.0 and sp.rep_pen == 1.0
                and sp.presence_penalty == 0.0 and sp.dry_multiplier == 0.0
                and not sp.logit_biases and sp.xtc_probability == 0.0
                and sp.mirostat == 0)

    def _fast_stoch_ok(self, params: GenParams, grammar) -> bool:
        """Device-side K-token stochastic decode covers the common preset:
        temp/top-k/top-p/min-p/rep-pen/bias/ban with rep-pen leading the
        order. Distribution-identical to the host chain (different PRNG
        draw). Anything fancier (DRY, XTC, mirostat, dynatemp, smoothing,
        top-a, TFS, typical, grammar, anti-slop) falls back to the host
        loop. Disable with KCPP_FAST_DECODE=0."""
        import os

        from .device_sampler import supported_order

        if os.environ.get("KCPP_FAST_DECODE", "1") != "1":
            return False
        if not getattr(self, "_std_path", False):
            return False
        sp = params.sampler
        if not (grammar is None and not params.banned_phrases
                and sp.temperature > 0.0 and sp.mirostat == 0
                and sp.dry_multiplier == 0.0 and sp.xtc_probability == 0.0
                and sp.top_a == 0.0 and sp.tfs >= 1.0 and sp.typical_p >= 1.0
                and sp.dynatemp_range == 0.0 and sp.smoothing_factor == 0.0):
            return False
        rep_active = sp.rep_pen != 1.0 or sp.presence_penalty != 0.0
        return supported_order(sp.sampler_order, rep_active)

    def _get_stoch_chunk(self, order: tuple):
        """Jitted stochastic chunk, cached per effective stage order (only
        the relative order of top-k/top-p/temp changes the dataflow)."""
        from ..sampling.samplers import (KCPP_SAMPLER_TEMP, KCPP_SAMPLER_TOP_K,
                                         KCPP_SAMPLER_TOP_P)
        from .device_sampler import make_stoch_chunk

        key = tuple(s for s in order if s in (
            KCPP_SAMPLER_TOP_K, KCPP_SAMPLER_TOP_P, KCPP_SAMPLER_TEMP))
        if not hasattr(self, "_stoch_chunks"):
            self._stoch_chunks = {}
        fn = self._stoch_chunks.get(key)
        if fn is None:
            def fwd(params, tokens, positions, cache):
                return model_llama.forward(params, self.cfg, tokens,
                                           positions, cache, last_only=True)

            fn = make_stoch_chunk(fwd, self.cfg, FAST_DECODE_K, key)
            self._stoch_chunks[key] = fn
        return fn

    # -- grammar -----------------------------------------------------------
    def _get_grammar(self, params: GenParams) -> TokenFilter | None:
        if not params.grammar:
            return None
        if (params.grammar_retain_state and self._grammar_cache
                and self._grammar_cache[0] == params.grammar):
            return self._grammar_cache[1]
        tf = TokenFilter(params.grammar, self.tokenizer)
        self._grammar_cache = (params.grammar, tf)
        return tf

    # -- main entry --------------------------------------------------------
    def abort(self):
        self.abort_event.set()

    def generate(self, prompt: str | list[int], params: GenParams,
                 on_token: Callable[[int, str], None] | None = None) -> GenerationResult:
        with self.lock:
            return self._generate_locked(prompt, params, on_token)

    def _generate_locked(self, prompt, params, on_token) -> GenerationResult:
        if self.embedding:
            raise ValueError(
                "embedding-only model (bert/t5encoder) cannot generate text; "
                "use the embeddings endpoints")
        self.abort_event.clear()
        self.generation_finished = False
        self.stream_tokens = []
        tk = self.tokenizer
        result = GenerationResult()
        t0 = time.perf_counter()

        if isinstance(prompt, str):
            prompt_tokens = tk.encode(prompt)
        else:
            prompt_tokens = list(prompt)
        if not prompt_tokens:
            prompt_tokens = [tk.vocab.bos_id if tk.vocab.bos_id >= 0 else 0]
        # clamp to context window, keeping the tail (reference trims the head)
        budget = max(8, self.max_context - params.max_length)
        if len(prompt_tokens) > budget:
            keep_first = 1 if tk.vocab.add_bos else 0
            overflow = len(prompt_tokens) - budget
            prompt_tokens = (prompt_tokens[:keep_first]
                             + prompt_tokens[keep_first + overflow:])

        # LLaVA: splice image-patch embeddings after BOS (reference uses
        # sentinel segments, gpttype_adapter.cpp:3406-3475)
        emb_by_pos: dict[int, np.ndarray] | None = None
        if params.images and self.clip is not None:
            from ..models.clip import decode_image_base64

            embeds = [np.asarray(self.clip.image_embed(
                decode_image_base64(b))[0], np.float32)
                for b in params.images[:4]]
            all_emb = np.concatenate(embeds, axis=0)
            bos = prompt_tokens[:1] if tk.vocab.add_bos else []
            rest = prompt_tokens[len(bos):]
            prompt_tokens = (bos + [self.IMG_SENTINEL] * len(all_emb) + rest)
            emb_by_pos = {len(bos) + i: all_emb[i] for i in range(len(all_emb))}
            self.context_tokens = []  # image requests re-evaluate fully

        # context reuse: smart context (legacy) OR context shift, then
        # fast-forward
        if self.encdec:
            # T5: prompt -> encoder (llama_encode equivalent), decoder starts
            # fresh from decoder_start_token_id each request
            self._run_encoder(prompt_tokens)
            self.context_tokens = []
            n_past = 0
            todo = [self.cfg.extras.get("decoder_start", 0)]
        else:
            if self.use_smartcontext:
                prompt_tokens = self._smart_context(prompt_tokens)
            elif self.use_contextshift:
                self._context_shift(prompt_tokens)
            n_past = self._fast_forward(prompt_tokens)
            self.context_tokens = self.context_tokens[:n_past]
            todo = prompt_tokens[n_past:]

        grammar = self._get_grammar(params)
        if grammar is not None and not params.grammar_retain_state:
            grammar.reset()

        state = make_state(params.sampler.seed)
        if params.sampler.dry_multiplier > 0:
            breakers = params.dry_sequence_breakers or ["\n", ":", '"', "*"]
            state.dry_sequences = build_dry_sequences(tk, breakers)

        sampler = params.sampler
        eos_ids = [i for i in (tk.vocab.eos_id, tk.vocab.eot_id, tk.vocab.eom_id)
                   if i is not None and i >= 0]
        banned = list(sampler.banned_tokens)
        if params.use_default_badwordsids:
            banned.extend(eos_ids)
        sampler_banned = tuple(banned)

        # prefill
        logits = self.eval_tokens(todo, n_past, emb_by_pos)
        self.context_tokens.extend(todo)
        t1 = time.perf_counter()

        # decode loop
        out_tokens: list[int] = []
        out_text = ""
        # incremental UTF-8: holds back genuinely-partial sequences but emits
        # U+FFFD immediately for invalid bytes (a plain buffer-until-valid
        # scheme deadlocks on the first invalid byte)
        utf8 = codecs.getincrementaldecoder("utf-8")(errors="replace")
        stop_reason = "length"
        sp = SamplerParams(**{**sampler.__dict__, "banned_tokens": sampler_banned})
        max_len = min(params.max_length, self.max_context - len(self.context_tokens))
        # anti-slop bans are per-POSITION (antislop_banned_token_ids,
        # gpttype_adapter.cpp:128,3219): rewinding to a spot bans the offending
        # token only when resampling that spot, not globally.
        antislop_bans: dict[int, set[int]] = {}
        # streaming hold-back (delayed_generated_tokens,
        # gpttype_adapter.cpp:127,2538): with phrase bans active, emission
        # lags by the longest phrase's token count so rewound text is never
        # streamed to the client.
        stream_delay = 0
        if params.banned_phrases:
            stream_delay = 3 + max(
                (len(tk.encode(p)) for p in params.banned_phrases), default=0)
        stream_q: list[tuple[int, int, str]] = []  # (token_index, tok, piece)

        fast_kind = None
        if self._fast_greedy_ok(params, grammar):
            fast_kind = "greedy"
        elif self._fast_stoch_ok(params, grammar):
            fast_kind = "stoch"
        if fast_kind is not None:
            # ---- device-side decode chunks (FAST_DECODE_K tokens/call) ----
            bias = np.zeros(self.cfg.vocab_size, np.float32)
            for tid, bv in sampler.logit_biases.items():
                if 0 <= tid < self.cfg.vocab_size:
                    bias[tid] += np.float32(bv)
            for b in sampler_banned:
                if 0 <= b < self.cfg.vocab_size:
                    bias[b] = np.float32(-1e30)
            bias_mask = jnp.asarray(bias)
            logits_dev = jnp.asarray(logits)
            if fast_kind == "stoch":
                from .device_sampler import make_dyn

                W = self.max_context
                rec = np.zeros(W, np.int32)
                tail = self.context_tokens[-W:]
                if tail:
                    rec[-len(tail):] = tail
                recent = jnp.asarray(rec)
                count = jnp.int32(min(len(self.context_tokens), W))
                seed = sampler.seed
                key = jax.random.PRNGKey(
                    seed if seed >= 0
                    else int(np.random.default_rng().integers(2 ** 31)))
                dyn = make_dyn(sampler, self.max_context)
                stoch_chunk = self._get_stoch_chunk(sampler.sampler_order)

            # ---- pipelined dispatch: keep PIPELINE_DEPTH chunks in flight so
            # the host's blocking token pull (one tunnel round trip) overlaps
            # the device computing the NEXT chunk. The device feedback loop is
            # self-contained (argmax/sampler feeds the next step on device), so
            # chunk N+1 depends only on device state, never on host processing.
            # The reference's serving loop adds ~0 overhead over llama_decode
            # (gpttype_adapter.cpp:3037); this is the TPU-tunnel equivalent.
            # Overshoot past a stop is bounded by depth*K discarded tokens.
            from collections import deque

            # depth 4: the r4 sweep (256-token gens, K=32) measured 863/879
            # t/s at depth 3/4 — deeper in-flight chunks hide the pull RT
            depth = max(1, int(os.environ.get("KCPP_PIPELINE_DEPTH", "4")))
            pending: deque = deque()
            # pull-based tunnel: issue each chunk's D2H on a pool thread at
            # dispatch so its RT overlaps the host loop (KCPP_PULL_POOL=0
            # reverts to blocking pulls at pop time)
            use_pool = os.environ.get("KCPP_PULL_POOL", "1") == "1"
            if use_pool and self._pull_pool is None:
                from concurrent.futures import ThreadPoolExecutor
                self._pull_pool = ThreadPoolExecutor(max_workers=4)
            dispatch_pos = len(self.context_tokens)
            dispatched = 0

            def _dispatch_chunk():
                nonlocal logits_dev, dispatch_pos, dispatched
                nonlocal recent, count, key
                if fast_kind == "greedy":
                    toks, logits_dev, self.cache = self._greedy_chunk(
                        self.model.params, logits_dev, self.cache,
                        dispatch_pos, bias_mask)
                else:
                    (toks, logits_dev, self.cache, recent, count,
                     key) = stoch_chunk(
                        self.model.params, logits_dev, self.cache,
                        jnp.int32(dispatch_pos), bias_mask,
                        recent, count, key, dyn)
                dispatch_pos += FAST_DECODE_K
                dispatched += FAST_DECODE_K
                pending.append(self._pull_pool.submit(np.asarray, toks)
                               if use_pool else toks)

            done = False
            while len(out_tokens) < max_len and not done:
                if self.abort_event.is_set():
                    stop_reason = "abort"
                    break
                while len(pending) < depth and dispatched < max_len:
                    _dispatch_chunk()
                toks = pending.popleft()
                toks = toks.result() if use_pool else np.asarray(toks)
                for tok in toks.tolist():
                    if self.abort_event.is_set():
                        stop_reason = "abort"
                        done = True
                        break
                    if len(out_tokens) >= max_len:
                        done = True
                        break
                    out_tokens.append(tok)
                    piece = utf8.decode(
                        tk.decode_token_bytes(tok, skip_special=False))
                    if piece:
                        out_text += piece
                        self.stream_tokens.append(piece)
                        if on_token:
                            on_token(tok, piece)
                    if not params.bypass_eos and tok in eos_ids:
                        stop_reason = "eos"
                        done = True
                        break
                    if params.stop_sequences:
                        hit = _find_stop(out_text, params.stop_sequences)
                        if hit is not None:
                            if params.trim_stop:
                                out_text = out_text[:hit]
                            stop_reason = "stop_sequence"
                            done = True
                            break
                    self.context_tokens.append(tok)
            pending.clear()  # in-flight chunk results past a stop: discard
            # chunk overshoot beyond a stop wrote cache slots past
            # len(context_tokens); slot==position masking makes them
            # invisible and later tokens overwrite them
            max_len = 0  # skip the host loop below

        if max_len > 0:  # host-sampled loop: pull the prefill logits once
            logits = np.asarray(logits)
        for _ in range(max_len):
            if self.abort_event.is_set():
                stop_reason = "abort"
                break
            gmask = None
            if grammar is not None:
                gmask = grammar.mask()
            pos_bans = antislop_bans.get(len(self.context_tokens))
            sp_step = sp if not pos_bans else SamplerParams(
                **{**sp.__dict__,
                   "banned_tokens": sp.banned_tokens + tuple(pos_bans)})
            tok = sample_logits(logits, self.context_tokens, self.max_context,
                                sp_step, state, grammar_mask=gmask)
            if grammar is not None:
                try:
                    grammar.accept(tok)
                except ValueError:
                    pass
            out_tokens.append(tok)

            piece = utf8.decode(tk.decode_token_bytes(tok, skip_special=False))
            if piece:
                out_text += piece
                if stream_delay:
                    stream_q.append((len(out_tokens), tok, piece))
                else:
                    self.stream_tokens.append(piece)
                    if on_token:
                        on_token(tok, piece)

            if not params.bypass_eos and tok in eos_ids:
                stop_reason = "eos"
                break

            # string stop sequences over accumulated output
            if params.stop_sequences:
                hit = _find_stop(out_text, params.stop_sequences)
                if hit is not None:
                    if params.trim_stop:
                        out_text = out_text[:hit]
                    stop_reason = "stop_sequence"
                    break

            # anti-slop: banned phrase appeared -> rewind and ban that token
            if params.banned_phrases:
                rew = self._antislop_check(out_text, params.banned_phrases, out_tokens)
                if rew is not None:
                    n_rewind, ban_tok = rew
                    out_tokens = out_tokens[:-n_rewind]
                    # resync the incremental decoder with the rewound stream
                    utf8 = codecs.getincrementaldecoder("utf-8")(errors="replace")
                    out_text = utf8.decode(b"".join(
                        tk.decode_token_bytes(t, skip_special=False)
                        for t in out_tokens))
                    # the just-sampled token is not in context yet, so the
                    # cache rewinds one fewer slot than the output does
                    self.context_tokens = self.context_tokens[
                        :len(self.context_tokens) - (n_rewind - 1)]
                    antislop_bans.setdefault(
                        len(self.context_tokens), set()).add(ban_tok)
                    stream_q = [e for e in stream_q if e[0] <= len(out_tokens)]
                    logits = self._replay_logits()
                    continue

            # emit pieces that are now beyond rewind reach
            while stream_q and stream_q[0][0] <= len(out_tokens) - stream_delay:
                _, qt, qp = stream_q.pop(0)
                self.stream_tokens.append(qp)
                if on_token:
                    on_token(qt, qp)

            # feed the token back
            logits = np.asarray(
                self._eval_chunk([tok], len(self.context_tokens)))
            self.context_tokens.append(tok)

        for _, qt, qp in stream_q:  # flush held-back pieces
            self.stream_tokens.append(qp)
            if on_token:
                on_token(qt, qp)
        out_text += utf8.decode(b"", final=True)  # flush trailing partial

        t2 = time.perf_counter()
        self.last_timings = Timings(
            prompt_tokens=len(todo), gen_tokens=len(out_tokens),
            prompt_time=t1 - t0, gen_time=t2 - t1)
        self.total_gens += 1
        self.generation_finished = True

        result.text = out_text
        result.tokens = out_tokens
        result.stop_reason = stop_reason
        result.timings = self.last_timings
        return result

    def _replay_logits(self) -> np.ndarray:
        """Recompute logits at the current context tail (after a rewind).
        A recurrent state cannot rewind — reset and re-evaluate the whole
        (linear-time) context instead."""
        if self.recurrent:
            self._reset_recurrent_state()
            return np.asarray(self.eval_tokens(self.context_tokens, 0))
        last = self.context_tokens[-1]
        return np.asarray(
            self._eval_chunk([last], len(self.context_tokens) - 1))

    def _antislop_check(self, text: str, phrases: list[str],
                        out_tokens: list[int]) -> tuple[int, int] | None:
        return antislop_check(self.tokenizer, text, phrases, out_tokens)

    # -- utility API -------------------------------------------------------
    def token_count(self, text: str) -> list[int]:
        return self.tokenizer.encode(text)

    def reset_context(self):
        self.context_tokens = []

    # -- state save/restore (llama_state_* counterpart, src/llama.cpp:20833;
    #    the kobold path instead re-evals via context shift, but the API
    #    exists for slot-save/session semantics) --------------------------
    def save_state(self, path: str):
        if self.recurrent:
            leaves, treedef = jax.tree_util.tree_flatten(self.cache)
            np.savez_compressed(
                path, recurrent=np.array(1),
                context_tokens=np.asarray(self.context_tokens, dtype=np.int64),
                max_context=self.max_context,
                **{f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)})
            return
        from ..kv.cache import stack_cache

        stacked = stack_cache(self.cache)
        np.savez_compressed(
            path,
            k=np.asarray(stacked.k), v=np.asarray(stacked.v),
            context_tokens=np.asarray(self.context_tokens, dtype=np.int64),
            max_context=self.max_context)

    def load_state(self, path: str):
        from ..kv.cache import KVCache

        data = np.load(path)
        if int(data["max_context"]) != self.max_context:
            raise ValueError("state was saved with a different context size")
        if self.recurrent:
            if "recurrent" not in data:
                raise ValueError("state file is not a recurrent-model state")
            _, treedef = jax.tree_util.tree_flatten(
                self._model_mod.init_state(self.cfg, 1))
            leaves = [jnp.asarray(data[f"leaf{i}"])
                      for i in range(treedef.num_leaves)]
            self.cache = jax.tree_util.tree_unflatten(treedef, leaves)
        else:
            from ..kv.cache import _is_layers, unstack_cache

            loaded = KVCache(k=jnp.asarray(data["k"], dtype=self.cache_dtype),
                             v=jnp.asarray(data["v"], dtype=self.cache_dtype))
            self.cache = (unstack_cache(loaded,
                                        heads=getattr(self.cache, "heads",
                                                      None))
                          if _is_layers(self.cache.k) else loaded)
        self.context_tokens = [int(t) for t in data["context_tokens"]]


def antislop_check(tk, text: str, phrases: list[str],
                   out_tokens: list[int]) -> tuple[int, int] | None:
    """Walk generated tokens from the END, accumulating text, until the
    banned phrase is covered; rewind that many tokens and ban the first
    (gpttype_adapter.cpp:3306-3330 backwards scan)."""
    low = text.lower()
    for ph in phrases:
        pl = ph.lower()
        if pl not in low:
            continue
        tail = b""
        for n in range(len(out_tokens) - 1, -1, -1):
            tail = tk.decode_token_bytes(out_tokens[n],
                                         skip_special=False) + tail
            if pl in tail.decode("utf-8", errors="ignore").lower():
                return len(out_tokens) - n, out_tokens[n]
    return None


def _detok(tk, tokens: list[int]) -> str:
    return b"".join(tk.decode_token_bytes(t, skip_special=False)
                    for t in tokens).decode("utf-8", errors="replace")


def _find_stop(text: str, stops: list[str]) -> int | None:
    from ..utils.native import find_first_stop

    return find_first_stop(text, stops)


def _longest_common_run(a: list[int], b: list[int]) -> tuple[int, int, int]:
    """Longest run of consecutive equal tokens; returns (length, start_in_a,
    start_in_b). Counterpart of arr_longest_common_substring
    (model_adapter.cpp:382); native C++ when available."""
    from ..utils.native import longest_common_run

    return longest_common_run(a, b)


def _shift_rows(kl, vl, start, end, freqs, rope_type: str, rot_dim: int):
    """Core context-shift math on one layer's (..., S, H, D) k/v pair: slide
    slots [end, ...) down to start and RoPE-re-rotate moved K rows by -delta.
    start/end may be traced scalars (shared by the single-slot and per-slot
    batched shift jits)."""
    delta = end - start
    S = kl.shape[-3]
    idx = jnp.arange(S)
    src = jnp.where(idx >= start, idx + delta, idx)  # slot i reads i+delta
    src = jnp.minimum(src, S - 1)
    k = jnp.take(kl, src, axis=-3)
    v = jnp.take(vl, src, axis=-3)
    # re-rotate moved keys by -delta
    angle = -delta * freqs  # (rot/2,)
    cos = jnp.cos(angle)
    sin = jnp.sin(angle)
    d = kl.shape[-1]
    rot = rot_dim or d
    kf = k.astype(jnp.float32)
    if rope_type == "neox":
        k1 = kf[..., : rot // 2]
        k2 = kf[..., rot // 2: rot]
        r1 = k1 * cos - k2 * sin
        r2 = k1 * sin + k2 * cos
        k_rot = jnp.concatenate([r1, r2, kf[..., rot:]], axis=-1)
    else:
        kr = kf[..., :rot].reshape(kf.shape[:-1] + (rot // 2, 2))
        k1 = kr[..., 0]
        k2 = kr[..., 1]
        r1 = k1 * cos - k2 * sin
        r2 = k1 * sin + k2 * cos
        k_rot = jnp.concatenate(
            [jnp.stack([r1, r2], axis=-1).reshape(kf.shape[:-1] + (rot,)),
             kf[..., rot:]], axis=-1)
    moved = (idx >= start)[:, None, None]
    k = jnp.where(moved, k_rot.astype(kl.dtype), k)
    return k, v


@partial(jax.jit, static_argnames=("rope_type", "rot_dim"), donate_argnames=("cache",))
def _kv_shift_jit(cache: KVCache, start: int, end: int, n_used: int,
                  freqs: jnp.ndarray, rope_type: str, rot_dim: int) -> KVCache:
    """Slide cache slots [end, n_used) down to start and RoPE-re-rotate K by
    -delta. Positions are static per call (retraces per unique shift); the
    continuous-batching paged cache replaces this with page-table remaps.

    Works on either cache layout: per-layer tuples of (B, S, H, D) or a
    stacked (L, B, S, H, D) array (deepseek2) — S is axis -3 in both."""
    from ..kv.cache import _is_layers, _leaf4

    def shift_one(kl, vl):
        return _shift_rows(kl, vl, start, end, freqs, rope_type, rot_dim)

    if _is_layers(cache.k):
        h = getattr(cache, "heads", None)

        def one(kl, vl):
            shp = kl.shape
            k4, v4 = shift_one(_leaf4(kl, h), _leaf4(vl, h))
            return k4.reshape(shp), v4.reshape(shp)

        pairs = [one(kl, vl) for kl, vl in zip(cache.k, cache.v)]
        return KVCache(k=tuple(p[0] for p in pairs),
                       v=tuple(p[1] for p in pairs), heads=h)
    k, v = shift_one(cache.k, cache.v)
    return KVCache(k=k, v=v)
