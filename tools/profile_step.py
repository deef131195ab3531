"""Profile a decode step (T=1 and batched T=8) and print per-op time.

Runs the bench.py decode loop under jax.profiler.trace, then parses the
chrome-trace JSON for the TensorCore track and aggregates durations by op
name. This is the ground-truth dissection of where the in-situ step time goes
(microbenches distort pipelining; the profiler does not).

Usage: python tools/profile_step.py [B]   (default B=8)
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

TRACE_DIR = "/tmp/kcpp_prof"


def run_traced(B: int, n_decode: int = 64):
    from koboldcpp_tpu.kv.cache import init_cache
    from koboldcpp_tpu.models import llama
    from koboldcpp_tpu.models.synthetic import TINYLLAMA_1_1B, synthetic_params

    cfg = TINYLLAMA_1_1B
    params = synthetic_params(cfg, kind="q4_k", seed=0)
    max_seq = 1024

    @jax.jit
    def decode_n(params, cache, tok0, start_pos):
        def body(i, carry):
            tok, cache, acc = carry
            logits, cache = llama.forward(
                params, cfg, tok,
                jnp.full((B, 1), start_pos + i, jnp.int32), cache,
                last_only=True)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
            return nxt, cache, acc + logits[0, -1, 0]
        return jax.lax.fori_loop(0, n_decode, body,
                                 (tok0, cache, jnp.float32(0)))

    cache = init_cache(cfg.n_layers, B, max_seq, cfg.n_kv_heads, cfg.head_dim)
    tok0 = jnp.full((B, 1), 7, jnp.int32)
    tok, cache, acc = decode_n(params, cache, tok0, 64)
    _ = float(acc)  # compile+run
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        tok, cache, acc = decode_n(params, cache, tok0, 64 + n_decode)
        _ = float(acc)
    return n_decode


def parse(n_decode: int, B: int):
    paths = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found"); return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # find device (TensorCore) process ids
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Tensor" in n or "/device" in n.lower()}
    agg = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e["name"]
        dur = e.get("dur", 0)  # us
        agg[name] += dur
        total += dur
    print(f"\n== B={B}: device op time over {n_decode} steps "
          f"(per-step us, track total {total/n_decode:.0f} us/step) ==")
    for name, dur in agg.most_common(40):
        print(f"{dur/n_decode:9.1f} us  {100*dur/total:5.1f}%  {name[:110]}")
    print(f"pids: { {p: pid_names[p] for p in dev_pids} }")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = run_traced(B)
    parse(n, B)


if __name__ == "__main__":
    main()
