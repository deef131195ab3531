"""Benchmark: steady-state decode throughput on a TinyLlama-1.1B-shaped
Q4_K-packed synthetic model (BASELINE.json config 1 shape), single chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/s", "vs_baseline": N}
vs_baseline = measured / HBM-roofline decode rate for this chip (the
reference repo publishes no absolute numbers — BASELINE.md — so roofline
fraction is the comparable figure; >= 0.85 is the north-star target).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from koboldcpp_tpu.kv.cache import init_cache
    from koboldcpp_tpu.models import llama
    from koboldcpp_tpu.models.synthetic import TINYLLAMA_1_1B, synthetic_params

    cfg = TINYLLAMA_1_1B
    params = synthetic_params(cfg, kind="q4_k", seed=0)

    max_seq = 1024
    prefill_len = 512
    cache = init_cache(cfg.n_layers, 1, max_seq, cfg.n_kv_heads, cfg.head_dim)

    def step(params, tokens, positions, cache):
        return llama.forward(params, cfg, tokens, positions, cache, last_only=True)

    jstep = jax.jit(step, donate_argnames=("cache",))

    # ---- prefill ----------------------------------------------------------
    rng = np.random.default_rng(0)
    ptoks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, prefill_len)), dtype=jnp.int32)
    ppos = jnp.arange(prefill_len, dtype=jnp.int32)[None, :]
    t0 = time.perf_counter()
    logits, cache = jstep(params, ptoks, ppos, cache)
    logits.block_until_ready()
    prefill_compile_s = time.perf_counter() - t0

    # ---- decode -----------------------------------------------------------
    def decode_once(pos, cache):
        tok = jnp.full((1, 1), 7, dtype=jnp.int32)
        p = jnp.full((1, 1), pos, dtype=jnp.int32)
        logits, cache = jstep(params, tok, p, cache)
        return logits, cache

    pos = prefill_len
    for _ in range(8):  # warmup / compile
        logits, cache = decode_once(pos, cache)
        pos += 1
    logits.block_until_ready()

    n_steps = 128
    t0 = time.perf_counter()
    for _ in range(n_steps):
        logits, cache = decode_once(pos, cache)
        pos += 1
    logits.block_until_ready()
    dt = time.perf_counter() - t0
    decode_tps = n_steps / dt

    # ---- roofline ---------------------------------------------------------
    # bytes touched per decode step ~= packed weight bytes + kv-cache read
    def nbytes(tree):
        return sum(x.nbytes for x in jax.tree_util.tree_leaves(tree)
                   if hasattr(x, "nbytes"))

    weight_bytes = nbytes(params)
    kv_bytes = 2 * cfg.n_layers * pos * cfg.n_kv_heads * cfg.head_dim * 2
    hbm_bw = 819e9  # v5e HBM ~819 GB/s
    roofline_tps = hbm_bw / (weight_bytes + kv_bytes)

    result = {
        "metric": "decode_tokens_per_sec_tinyllama1.1b_q4k_1chip",
        "value": round(decode_tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(decode_tps / roofline_tps, 4),
        "extra": {
            "roofline_tps": round(roofline_tps, 1),
            "weight_gb": round(weight_bytes / 1e9, 3),
            "prefill_len": prefill_len,
            "prefill_first_call_s": round(prefill_compile_s, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
