"""Targeted batched-decode A/B runner (faster turnaround than bench.py).

Runs ONLY the batched B-slot decode loop (default B=8) on the synthetic
TinyLlama, min-of-3. Variant knobs come from the env (KCPP_Q4K_2D,
KCPP_ROW_TILE, KCPP_FFN_FUSED, KCPP_MATVEC_MAX_T...).

Usage: python tools/bench_batched.py [B] [n_decode]
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from koboldcpp_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def main():
    from koboldcpp_tpu.kv.cache import init_cache
    from koboldcpp_tpu.models import llama
    from koboldcpp_tpu.models.synthetic import (LLAMA2_7B, TINYLLAMA_1_1B,
                                                synthetic_params)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_decode = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cfg = (LLAMA2_7B if os.environ.get("KCPP_BENCH_MODEL", "") == "7b"
           else TINYLLAMA_1_1B)
    params = synthetic_params(
        cfg, kind=os.environ.get("KCPP_BENCH_KIND", "q4_k"), seed=0)
    max_seq = 512 if cfg.hidden_size >= 4096 else 1024

    @partial(jax.jit, donate_argnums=(1,))
    def decode_n_batched(dparams, cache, tok0, start_pos):
        def body(i, carry):
            tok, cache, acc = carry
            logits, cache = llama.forward(
                dparams, cfg, tok,
                jnp.full((B, 1), start_pos + i, jnp.int32), cache,
                last_only=True)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
            return nxt, cache, acc + logits[0, -1, 0]
        return jax.lax.fori_loop(0, n_decode, body,
                                 (tok0, cache, jnp.float32(0)))

    print(f"device: {jax.devices()[0]}  B={B} n={n_decode} "
          f"Q4K_2D={os.environ.get('KCPP_Q4K_2D', 'sexp')} "
          f"ROW_TILE={os.environ.get('KCPP_ROW_TILE', '256')} "
          f"MAX_T={os.environ.get('KCPP_MATVEC_MAX_T', '4')} "
          f"FFN_FUSED={os.environ.get('KCPP_FFN_FUSED', '0')}", flush=True)
    btok = jnp.full((B, 1), 7, jnp.int32)
    bcache = init_cache(cfg.n_layers, B, max_seq, cfg.n_kv_heads, cfg.head_dim)
    t0 = time.perf_counter()
    tok, bcache, acc = decode_n_batched(params, bcache, btok, 64)
    _ = float(acc)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    del bcache
    dt = 1e9
    for _ in range(3):
        bcache2 = init_cache(cfg.n_layers, B, max_seq, cfg.n_kv_heads,
                             cfg.head_dim)
        t0 = time.perf_counter()
        tok, bcache2, acc = decode_n_batched(params, bcache2, btok, 64)
        _ = float(acc)
        dt = min(dt, time.perf_counter() - t0)
        del bcache2
    print(f"batched_tps: {B * n_decode / dt:.1f}  "
          f"({dt / n_decode * 1e3:.3f} ms/step)")


if __name__ == "__main__":
    main()
