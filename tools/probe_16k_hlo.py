"""Probe the compiled HLO of the 1.1B 16K paged-q8 decode step.

Hypothesis (PERF_NOTES round-5 16K dissection): the ~25 us/layer in-situ
gap vs the isolated kernel rate is XLA materializing pool-sized copies
around the aliased attention custom calls inside the fori_loop body.
This compiles the EXACT bench_longctx program and counts copy/fusion ops
touching pool-shaped buffers.

Usage: python tools/probe_16k_hlo.py [q8|q4]
"""
import os
import re
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from koboldcpp_tpu.kv.paged import init_paged_cache
from koboldcpp_tpu.models import llama
from koboldcpp_tpu.models.synthetic import TINYLLAMA_1_1B, synthetic_params


def main():
    quant = sys.argv[1] if len(sys.argv) > 1 else "q8"
    cfg = TINYLLAMA_1_1B
    S, n_decode = 16384, 128
    KD = cfg.n_kv_heads * cfg.head_dim
    budget = 6_000_000 if quant == "q4" else 1_500_000
    page_size = min(1024, max(256, (budget // KD) // 256 * 256))
    n_pages = S // page_size + 2
    params = synthetic_params(cfg, kind="q4_k", seed=0)
    pcache = init_paged_cache(cfg.n_layers, n_pages, page_size,
                              cfg.n_kv_heads, cfg.head_dim, quantized=quant)
    table = jnp.asarray(np.arange(S // page_size + 1, dtype=np.int32)[None])
    print(f"page_size={page_size} n_pages={n_pages} col={pcache.col} "
          f"pool_shape={pcache.k[0].shape} {pcache.k[0].dtype}")

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
    lowered = decode_n.lower(params, pcache, tok0, start)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"HLO text: {len(txt)} chars")
    out = os.environ.get("KCPP_PROBE_HLO_OUT")
    if out:
        with open(out, "w") as f:
            f.write(txt)
        print(f"wrote {out}")

    # pool-shaped buffers: (NP*kd, P) int8/uint8 col layout or (NP*P, KD)
    pool_shape = pcache.k[0].shape
    pool_re = re.escape(f"{pool_shape[0]},{pool_shape[1]}")
    scale_shape = pcache.k_scale[0].shape
    scale_re = re.escape(f"{scale_shape[0]},{scale_shape[1]}")
    n_copy = n_fusion_pool = n_custom = 0
    copy_lines = []
    for line in txt.splitlines():
        ls = line.strip()
        if re.search(rf"\b(s8|u8|bf16)\[{pool_re}\]", ls):
            if ls.startswith("%") or " = " in ls:
                if "copy(" in ls or "copy-start" in ls:
                    n_copy += 1
                    copy_lines.append(ls[:200])
                elif "fusion" in ls and "custom-call" not in ls:
                    n_fusion_pool += 1
                    if len(copy_lines) < 40:
                        copy_lines.append("FUSION: " + ls[:200])
                elif "custom-call" in ls:
                    n_custom += 1
        elif re.search(rf"\b(bf16)\[{scale_re}\]", ls):
            if "copy(" in ls:
                n_copy += 1
                copy_lines.append("SCALE " + ls[:200])
    print(f"pool-shaped: custom-calls={n_custom} copies={n_copy} "
          f"fusions={n_fusion_pool}")
    for l in copy_lines[:40]:
        print("  ", l)

    ma = compiled.memory_analysis()
    print("memory:", ma)


if __name__ == "__main__":
    main()
