"""Profile the 1.1B 16K paged-q8 decode step and print per-op device time.

Same methodology as tools/profile_step.py (chrome trace, TensorCore track)
but over the bench_longctx program — the ground truth for the VERDICT r4
item-4 long-context gap dissection.

Usage: python tools/profile_16k.py [q8|q4] [S]
"""
from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

TRACE_DIR = "/tmp/kcpp_prof16k"


def run_traced(quant: str, S: int, n_decode: int = 64):
    from functools import partial

    from koboldcpp_tpu.kv.paged import init_paged_cache
    from koboldcpp_tpu.models import llama
    from koboldcpp_tpu.models import synthetic
    from koboldcpp_tpu.models.synthetic import synthetic_params

    cfg = getattr(synthetic, os.environ.get("KCPP_PROFILE_MODEL",
                                            "TINYLLAMA_1_1B"))
    KD = cfg.n_kv_heads * cfg.head_dim
    budget = 6_000_000 if quant == "q4" else 1_500_000
    page_size = min(1024, max(256, (budget // KD) // 256 * 256))
    n_pages = S // page_size + 2
    params = synthetic_params(cfg, kind="q4_k", seed=0)
    pcache = init_paged_cache(cfg.n_layers, n_pages, page_size,
                              cfg.n_kv_heads, cfg.head_dim, quantized=quant)
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
        return jax.lax.fori_loop(0, n_decode, body,
                                 (tok0, pcache, jnp.float32(0)))

    tok0 = jnp.full((1, 1), 7, jnp.int32)
    start = S - 2 * n_decode - 64
    tok, pcache, acc = decode_n(params, pcache, tok0, start)
    _ = float(acc)  # compile+run
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        tok, pcache, acc = decode_n(params, pcache, tok0, start + n_decode)
        _ = float(acc)
    return n_decode


def main():
    quant = sys.argv[1] if len(sys.argv) > 1 else "q8"
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    n = run_traced(quant, S)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import profile_step
    profile_step.TRACE_DIR = TRACE_DIR
    profile_step.parse(n, 1)


if __name__ == "__main__":
    main()
