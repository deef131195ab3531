"""Benchmark: steady-state decode + prefill throughput on synthetic Q4_K
models of the BASELINE.json shapes — TinyLlama-1.1B (config 1), Llama2-13B
(config 3 @8K/16K paged-q8), a real-width Llama2-70B slice (config 5
kernels-at-width evidence) and Llama2-7B, one chip.

Timing methodology: the axon tunnel makes per-call host syncs cost ~30ms and
`block_until_ready` unreliable, so the measured loops run ON DEVICE
(lax.fori_loop with the KV cache as carry, greedy argmax feeding the next
step) and are synced once by pulling a scalar; the measured tunnel round-trip
is subtracted. This measures true device step time, like the reference's
GenerationSpeed T/s (koboldcpp.py:4320).

Evidence durability (VERDICT r4 item 1): the bench emits ONE CUMULATIVE JSON
line after EVERY completed section — the driver captures stdout tail, so the
latest line always survives a timeout — and runs under a wall-clock budget
(KCPP_BENCH_BUDGET_S, default 1800 s): sections that don't fit are skipped
with a logged notice (extra["sections_skipped"]) instead of overrunning.
Section order is value-first: 1.1B core -> served -> 1.1B 16K -> engine ->
13B -> 70B slice -> 7B. This mirrors the reference's own print-as-you-go
philosophy (per-request timings logged on every generation,
/root/reference/gpttype_adapter.cpp:3513-3520; CSV appended per run,
koboldcpp.py:4340-4348) rather than a single exit-time line.

vs_baseline = measured / HBM-roofline decode rate (the reference publishes no
absolute numbers — BASELINE.md; >=0.85 of roofline is the north-star target).

KCPP_BENCH_MODEL=1b skips the 13B/70B/7B passes (quick iteration); =7b runs
7B as the primary metric; =13b runs the 13B subset (used by the subprocess).
"""
from __future__ import annotations

import gc
import json
from functools import partial
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# 13B-class shapes want XLA's scoped-VMEM limit raised (bigger kernel row
# tiles: 69 -> 76% of streamed roofline) while 1.1B-class models run ~9%
# FASTER at the default 16 MiB — the knob is per-process, so main() runs the
# 13B sections in a subprocess with this env (set before jax imports).
if os.environ.get("KCPP_BENCH_MODEL", "") == "13b":
    os.environ.setdefault("LIBTPU_INIT_ARGS",
                          "--xla_tpu_scoped_vmem_limit_kib=65536")
    os.environ.setdefault("KCPP_VMEM_BUDGET_MB", "48")
    # one 13B param build (~80 s host rng + upload) serves all sections
    os.environ.setdefault("KCPP_SYNTH_CACHE", "1")

# Long-context paged decode wants MORE outstanding MSA prefetches: XLA's
# memory-space assignment stages the KV page pools into VMEM ahead of the
# attention custom calls, and at the default outstanding-copy limit the core
# blocks in copy-done ~230 us/step at 1.1B 16K (profiled). 12 outstanding:
# 605 -> 650 t/s (66.5% of roofline). Short-context decode runs ~4% FASTER
# at the default, so the knob is per-process and main() runs the 16K section
# in a subprocess with this env (set before jax imports).
_MSA_PREFETCH_ARGS = ("--xla_vf_vmem_max_outstanding_prefetches=12 "
                      "--xla_vf_vmem_max_outstanding_evictions=12")
if os.environ.get("KCPP_BENCH_MODEL", "") == "16k":
    os.environ.setdefault("LIBTPU_INIT_ARGS", _MSA_PREFETCH_ARGS)

import jax
import jax.numpy as jnp
import numpy as np

from koboldcpp_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

# SIGUSR1 dumps all thread stacks — the bench runs long device loops and a
# hang diagnosis must not require killing the process
import faulthandler
import signal

faulthandler.register(signal.SIGUSR1)

_T0 = time.perf_counter()
# 1800 s fits every section incl. 7B even when the shared compile service
# throws a 75-225 s outlier at the 13B first call (measured full runs:
# 1037-1432 s without 7B); per-section cumulative emission means a harder
# external kill still leaves the driver tail holding every completed
# section, so a generous budget only ever ADDS sections.
_BUDGET_S = float(os.environ.get("KCPP_BENCH_BUDGET_S", "1800"))


def time_left() -> float:
    return _BUDGET_S - (time.perf_counter() - _T0)


def measure_latency() -> float:
    f = jax.jit(lambda x: x + 1)
    x = jnp.ones(())
    float(f(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def roofline(params, cfg, prefill_len, n_decode):
    """(resident_roofline_tps, streamed_roofline_tps, weight_bytes,
    streamed_bytes) for the decode loop."""
    def nbytes(tree):
        return sum(x.nbytes for x in jax.tree_util.tree_leaves(tree)
                   if hasattr(x, "nbytes"))

    weight_bytes = nbytes(params) - nbytes(params["tok_embd"])

    def streamed_bytes(tree):
        """Bytes the decode kernels actually read per step: packed QTensors
        carry both kernel-layout and legacy/2-D fields; only one set
        streams."""
        from koboldcpp_tpu.ops.linear import QTensor
        from koboldcpp_tpu.ops.quant_matmul import (_MATVEC_FIELDS,
                                                    _MATVEC_FIELDS_Q4K)
        total = 0
        for leaf in jax.tree_util.tree_leaves(
                tree, is_leaf=lambda x: isinstance(x, QTensor)):
            if not isinstance(leaf, QTensor):
                continue
            names = {"q4_k": _MATVEC_FIELDS_Q4K}.get(
                leaf.kind) or _MATVEC_FIELDS.get(leaf.kind)
            if names and all(n in leaf.data for n in names):
                total += sum(leaf.data[n].nbytes for n in names)
            else:
                total += sum(v.nbytes for v in leaf.data.values())
        return total

    streamed = streamed_bytes(params) - nbytes(params["tok_embd"])
    kv_bytes = 2 * cfg.n_layers * (prefill_len + n_decode // 2) \
        * cfg.n_kv_heads * cfg.head_dim * 2
    hbm_bw = 819e9  # v5e HBM ~819 GB/s
    return (hbm_bw / (weight_bytes + kv_bytes),
            hbm_bw / (streamed + kv_bytes), weight_bytes, streamed)


def bench_model(cfg, latency: float, kind: str, scan: bool = True,
                batched: bool = True, emit=None) -> dict:
    """Prefill/decode/scan/batched throughput for one model shape.

    emit(partial_out) is called after each sub-metric completes so the
    section's progress survives a later crash/timeout."""
    from koboldcpp_tpu.kv.cache import init_cache
    from koboldcpp_tpu.models import llama
    from koboldcpp_tpu.models.llama import stack_layers
    from koboldcpp_tpu.models.synthetic import synthetic_params

    def tick(out):
        if emit is not None:
            emit(dict(out))

    params = synthetic_params(cfg, kind=kind, seed=0)
    # the stacked copy doubles weight HBM — only build it when the scan
    # section will run (13B-class shapes OOM otherwise)
    sparams = stack_layers(params) if scan else None
    big = cfg.hidden_size >= 4096
    # 7B-class: halve the cache working set (the chip is shared; B=8 MHA
    # caches at S=1024 are 4.3 GB)
    max_seq = 512 if big else 1024
    prefill_len = 256 if big else 512
    n_decode = 256
    use_flash = jax.default_backend() != "cpu" and cfg.head_dim in (64, 128, 256)

    @jax.jit
    def prefill(params, tokens, positions, cache):
        logits, cache = llama.forward(params, cfg, tokens, positions, cache,
                                      last_only=True, flash_prefill=use_flash)
        return logits, cache

    @jax.jit
    def decode_n(dparams, cache, tok0, start_pos):
        def body(i, carry):
            tok, cache, acc = carry
            logits, cache = llama.forward(
                dparams, cfg, tok, jnp.full((1, 1), start_pos + i, jnp.int32),
                cache, last_only=True)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
            return nxt, cache, acc + logits[0, -1, 0]
        tok, cache, acc = jax.lax.fori_loop(
            0, n_decode, body, (tok0, cache, jnp.float32(0)))
        return tok, cache, acc

    rng = np.random.default_rng(0)
    ptoks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, prefill_len)),
                        dtype=jnp.int32)
    ppos = jnp.arange(prefill_len, dtype=jnp.int32)[None, :]

    out: dict = {}
    # ---- roofline (cheap, emit first so % context survives) ---------------
    roof, sroof, wb, sb = roofline(params, cfg, prefill_len, n_decode)
    out["roofline_tps"] = round(roof, 1)
    out["streamed_roofline_tps"] = round(sroof, 1)
    out["weight_gb"] = round(wb / 1e9, 3)
    out["streamed_gb"] = round(sb / 1e9, 3)
    out["prefill_len"] = prefill_len
    out["flash_prefill"] = use_flash

    # ---- prefill ----------------------------------------------------------
    cache = init_cache(cfg.n_layers, 1, max_seq, cfg.n_kv_heads, cfg.head_dim)
    t0 = time.perf_counter()
    logits, cache = prefill(params, ptoks, ppos, cache)
    _ = float(logits.sum())
    out["first_call_s"] = round(time.perf_counter() - t0, 2)

    n_pre = 10
    t0 = time.perf_counter()
    for _ in range(n_pre - 1):
        logits, cache = prefill(params, ptoks, ppos, cache)
    _ = float(logits.sum())  # one sync at the end
    dt = max(time.perf_counter() - t0 - latency, 1e-6)
    out["prefill_tps"] = round((n_pre - 1) * prefill_len / dt, 1)
    tick(out)

    # ---- decode -----------------------------------------------------------
    tok0 = jnp.full((1, 1), 7, jnp.int32)
    t0 = time.perf_counter()
    tok, cache, acc = decode_n(params, cache, tok0, prefill_len)
    _ = float(acc)  # compile + run once
    out["decode_compile_s"] = round(time.perf_counter() - t0, 2)
    cache2 = init_cache(cfg.n_layers, 1, max_seq, cfg.n_kv_heads, cfg.head_dim)
    logits, cache2 = prefill(params, ptoks, ppos, cache2)
    dt = 1e9  # min over repeats: the shared chip has contention spikes
    for _ in range(3):
        t0 = time.perf_counter()
        tok, _c, acc = decode_n(params, cache2, tok0, prefill_len)
        _ = float(acc)
        dt = min(dt, max(time.perf_counter() - t0 - latency, 1e-6))
    out["decode_tps"] = round(n_decode / dt, 2)
    kv_bytes = 2 * cfg.n_layers * (prefill_len + n_decode // 2) \
        * cfg.n_kv_heads * cfg.head_dim * 2
    out["effective_gbs"] = round(out["decode_tps"] * (sb + kv_bytes) / 1e9, 1)
    out["pct_streamed_roofline"] = round(out["decode_tps"] / sroof, 4)
    tick(out)
    del cache, cache2, _c

    # ---- scan decode (pooled cache + stacked-weight kernels) --------------
    # weights stay out of scan xs (scalar-prefetch layer indexing), the
    # cache pool rides the carry — the big-model serving path (VERDICT r2
    # item 1): one body trace, no per-layer weight slice copies.
    out["scan_decode_tps"], out["scan_compile_s"] = 0.0, 0.0
    if scan and time_left() > 90:
        try:
            from koboldcpp_tpu.kv.cache import init_pool_cache

            @jax.jit
            def decode_n_scan(sp, pcache, tok0, start_pos):
                def body(i, carry):
                    tok, cache, acc = carry
                    logits, cache = llama.forward_stacked(
                        sp, cfg, tok,
                        jnp.full((1, 1), start_pos + i, jnp.int32),
                        cache, last_only=True)
                    nxt = jnp.argmax(logits[:, -1],
                                     axis=-1).astype(jnp.int32)[:, None]
                    return nxt, cache, acc + logits[0, -1, 0]
                tok, pcache, acc = jax.lax.fori_loop(
                    0, n_decode, body, (tok0, pcache, jnp.float32(0)))
                return tok, pcache, acc

            pc = init_pool_cache(cfg.n_layers, 1, max_seq, cfg.n_kv_heads,
                                 cfg.head_dim)
            t0 = time.perf_counter()
            tok, pc, acc = decode_n_scan(sparams, pc, tok0, prefill_len)
            _ = float(acc)
            out["scan_compile_s"] = round(time.perf_counter() - t0, 2)
            dt = 1e9
            for _ in range(3):
                pc2 = init_pool_cache(cfg.n_layers, 1, max_seq,
                                      cfg.n_kv_heads, cfg.head_dim)
                t0 = time.perf_counter()
                tok, pc2, acc = decode_n_scan(sparams, pc2, tok0, prefill_len)
                _ = float(acc)
                dt = min(dt, max(time.perf_counter() - t0 - latency, 1e-6))
            out["scan_decode_tps"] = round(n_decode / dt, 2)
            tick(out)
            del pc, pc2
        except Exception as e:
            print(f"scan bench skipped: {e!r}", file=sys.stderr)
    elif scan:
        print("scan bench skipped: budget", file=sys.stderr)

    # ---- batched decode (continuous-batching throughput, 8 slots) ---------
    out["batched_decode_tps_8slots"] = 0.0
    if batched and time_left() > 60:
        B = 8

        @partial(jax.jit, donate_argnums=(1,))
        def decode_n_batched(dparams, cache, tok0, start_pos):
            def body(i, carry):
                tok, cache, acc = carry
                logits, cache = llama.forward(
                    dparams, cfg, tok,
                    jnp.full((B, 1), start_pos + i, jnp.int32), cache,
                    last_only=True)
                nxt = jnp.argmax(logits[:, -1],
                                 axis=-1).astype(jnp.int32)[:, None]
                return nxt, cache, acc + logits[0, -1, 0]
            tok, cache, acc = jax.lax.fori_loop(
                0, n_decode, body, (tok0, cache, jnp.float32(0)))
            return tok, cache, acc

        btok = jnp.full((B, 1), 7, jnp.int32)
        bcache = init_cache(cfg.n_layers, B, max_seq, cfg.n_kv_heads,
                            cfg.head_dim)
        tok, bcache, acc = decode_n_batched(params, bcache, btok, 64)
        _ = float(acc)
        del bcache
        dt = 1e9
        for _ in range(3):
            bcache2 = init_cache(cfg.n_layers, B, max_seq, cfg.n_kv_heads,
                                 cfg.head_dim)
            t0 = time.perf_counter()
            tok, bcache2, acc = decode_n_batched(params, bcache2, btok, 64)
            _ = float(acc)
            dt = min(dt, max(time.perf_counter() - t0 - latency, 1e-6))
            del bcache2
        out["batched_decode_tps_8slots"] = round(B * n_decode / dt, 1)
        tick(out)

        # 16-slot aggregate throughput: beyond T=8 the T-flat 2-D kernel
        # serves and aggregate rate keeps scaling (the r4 kernel study:
        # exact-q4_k T=8 decode is pinned by scale-application compute, so
        # MORE SLOTS is the sanctioned throughput lever)
        try:
            B2 = 16

            @partial(jax.jit, donate_argnums=(1,))
            def decode_n_b16(dparams, cache, tok0, start_pos):
                def body(i, carry):
                    tok, cache, acc = carry
                    logits, cache = llama.forward(
                        dparams, cfg, tok,
                        jnp.full((B2, 1), start_pos + i, jnp.int32), cache,
                        last_only=True)
                    nxt = jnp.argmax(logits[:, -1],
                                     axis=-1).astype(jnp.int32)[:, None]
                    return nxt, cache, acc + logits[0, -1, 0]
                tok, cache, acc = jax.lax.fori_loop(
                    0, n_decode, body, (tok0, cache, jnp.float32(0)))
                return tok, cache, acc

            btok2 = jnp.full((B2, 1), 7, jnp.int32)
            bc = init_cache(cfg.n_layers, B2, max_seq // 2, cfg.n_kv_heads,
                            cfg.head_dim)
            tok, bc, acc = decode_n_b16(params, bc, btok2, 64)
            _ = float(acc)
            del bc
            dt = 1e9
            for _ in range(3):
                bc2 = init_cache(cfg.n_layers, B2, max_seq // 2,
                                 cfg.n_kv_heads, cfg.head_dim)
                t0 = time.perf_counter()
                tok, bc2, acc = decode_n_b16(params, bc2, btok2, 64)
                _ = float(acc)
                dt = min(dt, max(time.perf_counter() - t0 - latency, 1e-6))
                del bc2
            out["batched_decode_tps_16slots"] = round(B2 * n_decode / dt, 1)
            tick(out)
        except Exception as e:
            print(f"batched-16 bench skipped: {e!r}", file=sys.stderr)
    elif batched:
        print("batched bench skipped: budget", file=sys.stderr)

    del params, sparams
    gc.collect()
    return out


def bench_longctx(cfg, latency: float, kind: str, S: int = 16384,
                  n_decode: int = 128, prefix: str | None = None,
                  quant: str = "q8", page_size: int = 0) -> dict:
    """BASELINE config-3 shape: long-context decode over the PAGED pool with
    quantized KV — measures the paged flash-decode kernel's DMA clamping
    at real context depth (VERDICT r2 weak #8). quant: "q8" | "q4"."""
    from koboldcpp_tpu.kv.paged import init_paged_cache
    from koboldcpp_tpu.models import llama
    from koboldcpp_tpu.models.synthetic import synthetic_params

    # page-size sweep on v5e (16K q8, Pallas q8 kernel): 256 -> 361 t/s,
    # 512 -> 458, 1024 -> 504, 2048 -> 505 — the paged kernels pay ~1 us of
    # fixed cost per grid step (page), so TPU wants big pages; plateau at 1K.
    # VMEM bounds the block: ~8 double-buffered (P, KD) buffers must fit
    # scoped VMEM, so wide-KD (MHA 13B-class) models cap the page smaller.
    KD = cfg.n_kv_heads * cfg.head_dim
    if not page_size:
        # q4 tiles are half the bytes per token: the same VMEM budget
        # affords bigger pages (13B 16K q4: P=512 -> 58.5%, P=1024 -> 59.7%)
        budget = 6_000_000 if quant == "q4" else 1_500_000
        page_size = min(1024, max(256, (budget // KD) // 256 * 256))
    n_pages = S // page_size + 2
    params = synthetic_params(cfg, kind=kind, seed=0)
    pcache = init_paged_cache(cfg.n_layers, n_pages, page_size,
                              cfg.n_kv_heads, cfg.head_dim,
                              quantized=quant)
    table = jnp.asarray(np.arange(S // page_size + 1, dtype=np.int32)[None])

    @partial(jax.jit, donate_argnums=(1,))
    def decode_n(params, pcache, tok0, start_pos):
        def body(i, carry):
            tok, pcache, acc = carry
            logits, pcache = llama.forward_paged(
                params, cfg, tok, jnp.full((1, 1), start_pos + i, jnp.int32),
                pcache, table, last_only=True)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
            return nxt, pcache, acc + logits[0, -1, 0]
        tok, pcache, acc = jax.lax.fori_loop(
            0, n_decode, body, (tok0, pcache, jnp.float32(0)))
        return tok, pcache, acc

    tok0 = jnp.full((1, 1), 7, jnp.int32)
    start = S - n_decode - 64
    tok, pcache, acc = decode_n(params, pcache, tok0, start)
    _ = float(acc)
    dt = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        tok, pcache, acc = decode_n(params, pcache, tok0, start)
        _ = float(acc)
        dt = min(dt, max(time.perf_counter() - t0 - latency, 1e-6))
    tps = n_decode / dt
    # per-step bytes: streamed weights + quantized KV read at context depth
    _, _, wb, sb = roofline(params, cfg, 0, 0)
    kv_elem = (cfg.head_dim + 2) if quant == "q8" else (cfg.head_dim // 2 + 2)
    kv = 2 * cfg.n_layers * S * cfg.n_kv_heads * kv_elem
    del params, pcache
    gc.collect()
    if prefix is None:
        prefix, tail = "decode_16k", f"paged_{quant}_tps"
        return {f"{prefix}_{tail}": round(tps, 2),
                "ctx": S,
                f"effective_gbs_16k": round(tps * (sb + kv) / 1e9, 1),
                f"roofline_16k_tps": round(819e9 / (sb + kv), 1)}
    roof = 819e9 / (sb + kv)
    return {f"{prefix}_paged_{quant}_tps": round(tps, 2),
            f"{prefix}_ctx": S,
            f"{prefix}_roofline_tps": round(roof, 1),
            f"{prefix}_pct_roofline": round(tps / roof, 4)}


def bench_batched_engine(cfg, kind: str, emit=None) -> dict:
    """BatchedEngine throughput with 8 concurrent requests: all-greedy vs
    7 greedy + 1 stochastic slot, plus 16-slot all-greedy.

    Reporting convention (VERDICT r4 item 3): MIN-OF-3 successful runs —
    the engine must beat the bar reproducibly, not best-of. Transient device
    flakes (the axon backend intermittently fails a tick; the engine
    recovers) don't count as samples and are retried."""
    import threading

    from koboldcpp_tpu.engine.batch_engine import BatchedEngine
    from koboldcpp_tpu.engine.engine import GenParams
    from koboldcpp_tpu.models.loader import Model
    from koboldcpp_tpu.models.synthetic import synthetic_params
    from koboldcpp_tpu.sampling.samplers import SamplerParams
    from koboldcpp_tpu.tokenizers import Tokenizer
    from koboldcpp_tpu.tokenizers.vocab import vocab_from_metadata

    params = synthetic_params(cfg, kind=kind, seed=0)
    md = {"tokenizer.ggml.model": "gpt2",
          "tokenizer.ggml.tokens": [f"tok{i}" for i in range(cfg.vocab_size)],
          "tokenizer.ggml.token_type": np.full(cfg.vocab_size, 1, np.int32),
          "tokenizer.ggml.bos_token_id": np.uint32(1),
          "tokenizer.ggml.eos_token_id": np.uint32(2),
          "tokenizer.ggml.add_bos_token": False}
    model = Model(cfg, params, Tokenizer(vocab_from_metadata(md)))
    eng = BatchedEngine(model, max_context=512, n_slots=8)
    out: dict = {}

    def tick():
        if emit is not None:
            emit(dict(out))

    def run_batch(n_slots: int, stoch_slots: int, engine) -> float:
        # 256-token gens (the VERDICT r3 item-2 "Done" criterion length)
        greedy = GenParams(max_length=256, bypass_eos=True,
                           sampler=SamplerParams(temperature=0.0, rep_pen=1.0))
        stoch = GenParams(max_length=256, bypass_eos=True,
                          sampler=SamplerParams(temperature=0.8, top_p=0.9,
                                                top_k=60, rep_pen=1.05))
        reqs = [stoch if i < stoch_slots else greedy for i in range(n_slots)]
        results = [None] * n_slots

        def worker(i):
            results[i] = engine.generate([1, 5 + i, 9], reqs[i])

        t0 = time.perf_counter()
        ths = [threading.Thread(target=worker, args=(i,))
               for i in range(n_slots)]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        dt = time.perf_counter() - t0
        if any(r is None or r.stop_reason.startswith("error")
               for r in results):
            return 0.0  # transient device flake — caller retries
        return sum(len(r.tokens) for r in results) / dt

    def min_of_3(n_slots, stoch, engine):
        vals: list[float] = []
        for _ in range(6):  # up to 3 flake retries
            v = run_batch(n_slots, stoch, engine)
            if v > 0:
                vals.append(v)
            if len(vals) >= 3:
                break
        return min(vals) if vals else 0.0

    run_batch(8, 0, eng)  # warm compiles (prefill buckets + greedy step)
    g = min_of_3(8, 0, eng)
    out["engine_batched8_greedy_tps"] = round(g, 1)
    tick()
    run_batch(8, 1, eng)  # warm the sampled step
    s = min_of_3(8, 1, eng)
    out["engine_batched8_1stoch_tps"] = round(s, 1)
    out["stoch_vs_greedy"] = round(s / g, 3) if g else 0.0
    tick()
    eng.shutdown()
    # 16-slot engine-level serving (slots are the aggregate-throughput
    # lever beyond T=8 — see batched_decode_tps_16slots)
    g16 = 0.0
    try:
        eng = BatchedEngine(model, max_context=512, n_slots=16)
        run_batch(16, 0, eng)  # warm
        g16 = min_of_3(16, 0, eng)
        eng.shutdown()
    except Exception as e:
        print(f"engine batched-16 skipped: {e!r}", file=sys.stderr)
    out["engine_batched16_greedy_tps"] = round(g16, 1)
    tick()
    del params, model, eng
    gc.collect()
    return out


def bench_served(cfg, params_kind: str, max_seq: int,
                 latency: float = 0.0) -> tuple[float, float]:
    """Engine-level served greedy throughput (host in the loop).

    Returns (latency-adjusted tps, raw tps). The adjusted number subtracts
    ONE tunnel round trip, the same convention decode_tps/prefill_tps use
    (`dt - latency` above): the ~25 ms axon tunnel RT is a dev-harness
    artifact, not a property of the serving stack — a co-located host pays
    microseconds for the same dispatch+pull. The raw wall-clock number is
    reported alongside."""
    try:
        from koboldcpp_tpu.engine.engine import Engine, GenParams
        from koboldcpp_tpu.models.loader import Model
        from koboldcpp_tpu.models.synthetic import synthetic_params
        from koboldcpp_tpu.sampling.samplers import SamplerParams
        from koboldcpp_tpu.tokenizers import Tokenizer
        from koboldcpp_tpu.tokenizers.vocab import vocab_from_metadata

        params = synthetic_params(cfg, kind=params_kind, seed=0)
        md = {"tokenizer.ggml.model": "gpt2",
              "tokenizer.ggml.tokens": [f"tok{i}"
                                        for i in range(cfg.vocab_size)],
              "tokenizer.ggml.token_type": np.full(cfg.vocab_size, 1,
                                                   np.int32),
              "tokenizer.ggml.bos_token_id": np.uint32(1),
              "tokenizer.ggml.eos_token_id": np.uint32(2),
              "tokenizer.ggml.add_bos_token": False}
        model = Model(cfg, params, Tokenizer(vocab_from_metadata(md)))
        eng = Engine(model, max_context=max_seq)
        gp = GenParams(max_length=256,
                       sampler=SamplerParams(temperature=0.0, rep_pen=1.0))
        eng.generate([1, 5, 9], gp)  # warm
        served_tps = raw_tps = 0.0
        for _ in range(3):  # best-of-3: shared chip has contention spikes
            eng.reset_context()
            t0 = time.perf_counter()
            r = eng.generate([1, 5, 9], gp)
            dt = time.perf_counter() - t0
            raw_tps = max(raw_tps, len(r.tokens) / dt)
            served_tps = max(served_tps,
                             len(r.tokens) / max(dt - latency, 1e-6))
        del params, model, eng
        gc.collect()
        return round(served_tps, 1), round(raw_tps, 1)
    except Exception:
        return 0.0, 0.0


def bench_70b_slice(latency: float, kind: str, n_decode: int = 128) -> dict:
    """Config-5 kernels-at-width evidence (VERDICT r4 item 8): a TP=1 slice
    of the REAL Llama-2-70B shape (hidden 8192, 64-head GQA-8, ffn 28672) at
    8 layers with packed q4_k Pallas kernels, measured decode t/s vs its own
    streamed-bytes roofline. Proves the kernels at 70B width on real
    hardware; the 80-layer whole model is a multi-chip config by HBM size."""
    from koboldcpp_tpu.kv.cache import init_cache
    from koboldcpp_tpu.models import llama
    from koboldcpp_tpu.models.synthetic import LLAMA2_70B_SLICE8, \
        synthetic_params

    cfg = LLAMA2_70B_SLICE8
    params = synthetic_params(cfg, kind=kind, seed=0)
    max_seq = 256
    use_flash = jax.default_backend() != "cpu"

    @jax.jit
    def decode_n(dparams, cache, tok0, start_pos):
        def body(i, carry):
            tok, cache, acc = carry
            logits, cache = llama.forward(
                dparams, cfg, tok, jnp.full((1, 1), start_pos + i, jnp.int32),
                cache, last_only=True)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
            return nxt, cache, acc + logits[0, -1, 0]
        tok, cache, acc = jax.lax.fori_loop(
            0, n_decode, body, (tok0, cache, jnp.float32(0)))
        return tok, cache, acc

    cache = init_cache(cfg.n_layers, 1, max_seq, cfg.n_kv_heads, cfg.head_dim)
    tok0 = jnp.full((1, 1), 7, jnp.int32)
    t0 = time.perf_counter()
    tok, cache, acc = decode_n(params, cache, tok0, 64)
    _ = float(acc)
    compile_s = time.perf_counter() - t0
    dt = 1e9
    for _ in range(3):
        cache2 = init_cache(cfg.n_layers, 1, max_seq, cfg.n_kv_heads,
                            cfg.head_dim)
        t0 = time.perf_counter()
        tok, cache2, acc = decode_n(params, cache2, tok0, 64)
        _ = float(acc)
        dt = min(dt, max(time.perf_counter() - t0 - latency, 1e-6))
        del cache2
    tps = n_decode / dt
    _, sroof, wb, sb = roofline(params, cfg, 64, n_decode)
    del params, cache
    gc.collect()
    return {"70b_slice_decode_tps": round(tps, 2),
            "70b_slice_layers": cfg.n_layers,
            "70b_slice_streamed_gb": round(sb / 1e9, 3),
            "70b_slice_streamed_roofline_tps": round(sroof, 1),
            "70b_slice_pct_streamed_roofline": round(tps / sroof, 4),
            "70b_slice_compile_s": round(compile_s, 2)}


def _last_json(text: str):
    """Last parseable JSON object line in `text` (partial-output rescue)."""
    for line in reversed((text or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except Exception:
                continue
    return None


def main_13b(latency: float, kind: str):
    """13B subset (run in a subprocess for the scoped-VMEM env). Emits a
    cumulative plain-dict JSON line after every section so the parent (or the
    driver tail) can rescue partial results on timeout."""
    from koboldcpp_tpu.models.synthetic import LLAMA2_13B
    r: dict = {}

    def emit():
        print(json.dumps(r), flush=True)

    if time_left() > 60:
        try:
            r13 = bench_model(LLAMA2_13B, latency, kind, scan=False,
                              batched=False)
            r["13b_decode_tps"] = r13["decode_tps"]
            r["13b_pct_streamed_roofline"] = r13["pct_streamed_roofline"]
            r["13b_first_call_s"] = r13["first_call_s"]
        except Exception as e:
            print(f"13b decode bench skipped: {e!r}", file=sys.stderr)
            r["13b_decode_error"] = repr(e)[:200]
        emit()
        gc.collect()
    else:
        r["13b_skipped"] = "budget"
    # 16K first (the round-5 standing milestone), then 70B slice, then 8K —
    # value order under the sub-budget
    if time_left() > 120:
        try:
            r.update(bench_longctx(LLAMA2_13B, latency, kind, S=16384,
                                   prefix="13b_16k", quant="q4"))
        except Exception as e:
            print(f"13b 16k bench skipped: {e!r}", file=sys.stderr)
            r["13b_16k_error"] = repr(e)[:200]
        emit()
        gc.collect()
    else:
        r["13b_16k_skipped"] = "budget"
    # 70B-width slice rides in this subprocess: the 28672-wide down-proj
    # needs the raised scoped-VMEM env (without it the matvec falls to XLA
    # dequant and measures 31 t/s = 17% instead of ~101 = 55%)
    if time_left() > 150:
        try:
            r.update(bench_70b_slice(latency, kind))
        except Exception as e:
            print(f"70b slice bench skipped: {e!r}", file=sys.stderr)
            r["70b_slice_error"] = repr(e)[:200]
        emit()
        gc.collect()
    else:
        r["70b_slice_skipped"] = "budget"
    if time_left() > 120:
        try:
            r.update(bench_longctx(LLAMA2_13B, latency, kind, S=8192,
                                   prefix="13b_8k"))
        except Exception as e:
            print(f"13b 8k bench skipped: {e!r}", file=sys.stderr)
            r["13b_8k_error"] = repr(e)[:200]
        emit()
    else:
        r["13b_8k_skipped"] = "budget"
    emit()


def main():
    from koboldcpp_tpu.models.synthetic import LLAMA2_7B, TINYLLAMA_1_1B

    mode = os.environ.get("KCPP_BENCH_MODEL", "")
    kind = os.environ.get("KCPP_BENCH_KIND", "q4_k")
    latency = measure_latency()

    if mode == "13b":
        main_13b(latency, kind)
        return

    if mode == "16k":
        # 1.1B 16K paged-q8 under the MSA-prefetch env (see _MSA_PREFETCH_ARGS)
        try:
            r16 = bench_longctx(TINYLLAMA_1_1B, latency, kind)
        except Exception as e:
            r16 = {"longctx_16k_error": repr(e)[:200]}
        print(json.dumps(r16))
        return

    if mode == "7b":
        r7 = bench_model(LLAMA2_7B, latency, kind)
        result = {
            "metric": "decode_tokens_per_sec_llama2_7b_q4k_1chip",
            "value": r7["decode_tps"],
            "unit": "tokens/s",
            "vs_baseline": round(r7["decode_tps"] / r7["roofline_tps"], 4),
            "extra": {**r7, "tunnel_latency_ms": round(latency * 1e3, 1),
                      "device": str(jax.devices()[0])},
        }
        print(json.dumps(result))
        return

    # ---- cumulative emitter: full merged line after every section ---------
    result = {
        "metric": "decode_tokens_per_sec_tinyllama1.1b_q4k_1chip",
        "value": 0.0,
        "unit": "tokens/s",
        "vs_baseline": 0.0,
        "extra": {
            "tunnel_latency_ms": round(latency * 1e3, 1),
            "device": str(jax.devices()[0]),
            "budget_s": _BUDGET_S,
            "sections_skipped": [],
        },
    }
    extra = result["extra"]

    def emit():
        extra["bench_elapsed_s"] = round(time.perf_counter() - _T0, 1)
        print(json.dumps(result), flush=True)

    def skip(name, why="budget"):
        extra["sections_skipped"].append(name)
        print(f"section {name} skipped: {why}", file=sys.stderr)
        emit()

    # ---- section 1: 1.1B core --------------------------------------------
    def core_tick(partial):
        extra.update({k: v for k, v in partial.items() if k != "decode_tps"})
        if "decode_tps" in partial:
            result["value"] = partial["decode_tps"]
            result["vs_baseline"] = round(
                partial["decode_tps"] / partial["roofline_tps"], 4)
        emit()

    r1 = bench_model(TINYLLAMA_1_1B, latency, kind, emit=core_tick)
    core_tick(r1)

    # ---- section 2: served single-stream ----------------------------------
    if time_left() > 60:
        served, served_raw = bench_served(TINYLLAMA_1_1B, kind, 1024,
                                          latency=latency)
        # RAW wall clock is the headline (VERDICT r3 weak #3); the
        # tunnel-adjusted figure (decode_tps's convention) rides beside
        extra["served_greedy_tps"] = served_raw
        extra["served_greedy_tps_tunnel_adjusted"] = served
        emit()
    else:
        skip("served")

    # ---- section 3: 1.1B 16K paged-q8 long context ------------------------
    # subprocess: the MSA-prefetch env lifts 16K ~7% but costs short-context
    # decode ~4%, so neither setting can serve both sections in one process
    if time_left() > 120:
        import subprocess
        r16 = None
        try:
            env16 = dict(os.environ, KCPP_BENCH_MODEL="16k")
            out16 = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env16,
                capture_output=True, text=True,
                timeout=max(180, min(600, int(time_left()))))
            r16 = _last_json(out16.stdout)
            if out16.returncode != 0:
                print(f"16k subprocess rc={out16.returncode}: "
                      f"{(out16.stderr or '')[-300:]}", file=sys.stderr)
        except Exception as e:
            print(f"16k subprocess failed: {e!r}", file=sys.stderr)
        if r16 and "decode_16k_paged_q8_tps" in r16:
            extra.update(r16)
        else:
            try:  # in-process fallback (default env, ~7% below the knob)
                extra.update(bench_longctx(TINYLLAMA_1_1B, latency, kind))
            except Exception as e:
                print(f"16k bench skipped: {e!r}", file=sys.stderr)
        emit()
    else:
        skip("longctx_16k")

    # ---- section 4: batched engine (min-of-3) -----------------------------
    if os.environ.get("KCPP_BENCH_ENGINE", "1") != "1":
        skip("engine", "env-disabled")
    elif time_left() > 240:
        def eng_tick(partial):
            extra.update(partial)
            b8 = extra.get("batched_decode_tps_8slots") or 0
            b16 = extra.get("batched_decode_tps_16slots") or 0
            if b8 and partial.get("engine_batched8_greedy_tps"):
                extra["engine_vs_kernel_8"] = round(
                    partial["engine_batched8_greedy_tps"] / b8, 3)
            if b16 and partial.get("engine_batched16_greedy_tps"):
                extra["engine_vs_kernel_16"] = round(
                    partial["engine_batched16_greedy_tps"] / b16, 3)
            emit()
        try:
            be = bench_batched_engine(TINYLLAMA_1_1B, kind, emit=eng_tick)
            eng_tick(be)
        except Exception as e:
            print(f"batched-engine bench skipped: {e!r}", file=sys.stderr)
            emit()
    else:
        skip("engine")

    # ---- section 5: 13B (config 3) in a subprocess ------------------------
    # the 13B-friendly scoped-VMEM env applies to it alone; the subprocess
    # emits cumulative lines, so even a timeout yields its completed sections
    if (mode != "1b" and time_left() > 300
            and os.environ.get("KCPP_BENCH_13B", "1") == "1"):
        import subprocess
        # the subprocess now carries 13B decode/16K/70B/8K — give it nearly
        # everything that's left (7B is the lowest-value trailing section)
        sub_budget = max(240, int(time_left()) - 90)
        env = dict(os.environ, KCPP_BENCH_MODEL="13b",
                   KCPP_BENCH_BUDGET_S=str(sub_budget))
        b13, out13 = {}, None
        try:
            out13 = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=sub_budget + 120)
            b13 = _last_json(out13.stdout) or {}
        except subprocess.TimeoutExpired as e:
            b13 = _last_json(e.stdout if isinstance(e.stdout, str) else
                             (e.stdout or b"").decode("utf-8", "replace")) \
                or {"13b_error": "subprocess timeout"}
        except Exception as e:
            print(f"13b bench skipped: {e!r}", file=sys.stderr)
            b13 = {"13b_error": repr(e)[:200]}
        if out13 is not None and out13.returncode != 0:
            print(f"13b subprocess rc={out13.returncode}: "
                  f"{(out13.stderr or '')[-500:]}", file=sys.stderr)
        extra.update(b13)
        emit()
    elif mode != "1b":
        skip("13b")

    # ---- section 6: 70B-width slice (config 5 kernel evidence) ------------
    # normally measured inside the 13B subprocess (scoped-VMEM env, see
    # main_13b); run here only as a fallback when that didn't produce it
    if (mode != "1b" and "70b_slice_decode_tps" not in extra
            and time_left() > 180):
        try:
            extra.update(bench_70b_slice(latency, kind))
        except Exception as e:
            print(f"70b slice bench skipped: {e!r}", file=sys.stderr)
        emit()
    elif mode != "1b" and "70b_slice_decode_tps" not in extra:
        skip("70b_slice")

    # ---- section 7: 7B ----------------------------------------------------
    if mode != "1b" and time_left() > 240:
        try:
            extra["7b"] = bench_model(LLAMA2_7B, latency, kind)
        except Exception as e:
            print(f"7b bench skipped: {e!r}", file=sys.stderr)
        emit()
    elif mode != "1b":
        skip("7b")

    emit()


if __name__ == "__main__":
    main()
