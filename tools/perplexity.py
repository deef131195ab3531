"""Perplexity evaluation tool (wikitext-2 style).

Counterpart of llama.cpp's perplexity example (referenced from
/root/reference/Makefile:574): identical chunking so Δppl comparisons against
the reference's own tooling are apples-to-apples — non-overlapping n_ctx
windows, NLL accumulated over the second half of each window.
"""
from __future__ import annotations

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def perplexity(model, text: str, n_ctx: int = 512, n_batch: int = 512,
               verbose: bool = True) -> float:
    import jax
    import jax.numpy as jnp

    from koboldcpp_tpu.kv.cache import init_cache
    from koboldcpp_tpu.models import llama

    tk = model.tokenizer
    tokens = tk.encode(text)
    n_chunks = len(tokens) // n_ctx
    if n_chunks == 0:
        raise ValueError(f"need at least {n_ctx} tokens, got {len(tokens)}")

    def fwd(params, toks, positions, cache):
        return llama.forward(params, model.cfg, toks, positions, cache,
                             last_only=False)

    jfwd = jax.jit(fwd, donate_argnames=("cache",))
    first_eval = max(1, min(512, n_ctx // 2))

    total_nll = 0.0
    total_cnt = 0
    for ci in range(n_chunks):
        chunk = tokens[ci * n_ctx:(ci + 1) * n_ctx]
        chunk[0] = tk.vocab.bos_id if tk.vocab.bos_id >= 0 else chunk[0]
        cache = init_cache(model.cfg.n_layers, 1, n_ctx, model.cfg.n_kv_heads,
                           model.cfg.head_dim)
        toks = jnp.asarray(np.array([chunk], dtype=np.int32))
        pos = jnp.arange(n_ctx, dtype=jnp.int32)[None, :]
        logits, cache = jfwd(model.params, toks, pos, cache)
        # gather the target NLLs ON DEVICE: transferring the full (T, vocab)
        # log-softmax (16 MB/window at 8K vocab) stalls on slow links
        lp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
        targets = jnp.asarray(np.array(chunk[1:], dtype=np.int32))
        nll_dev = -jnp.take_along_axis(lp[:-1], targets[:, None], axis=-1)[:, 0]
        nll = np.asarray(nll_dev)
        sel = nll[first_eval - 1:]
        total_nll += float(sel.sum())
        total_cnt += len(sel)
        if verbose:
            print(f"[{ci + 1}/{n_chunks}] ppl so far: "
                  f"{math.exp(total_nll / total_cnt):.4f}", flush=True)
    return math.exp(total_nll / total_cnt)


def main():
    ap = argparse.ArgumentParser(description="Compute perplexity of a GGUF model")
    ap.add_argument("model")
    ap.add_argument("--file", required=True, help="text file (e.g. wikitext-2)")
    ap.add_argument("--ctx", type=int, default=512)
    args = ap.parse_args()

    from koboldcpp_tpu.models.loader import load_model

    model = load_model(args.model)
    with open(args.file, errors="replace") as f:
        text = f.read()
    ppl = perplexity(model, text, n_ctx=args.ctx)
    print(f"Final perplexity: {ppl:.4f}")


if __name__ == "__main__":
    main()
