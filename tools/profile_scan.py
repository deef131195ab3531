"""Profile the pooled-cache scan decode step vs unrolled at B=1 and print
per-op device time (chrome trace, TensorCore track).

Usage: python tools/profile_scan.py [scan|unroll]
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

TRACE_DIR = "/tmp/kcpp_prof_scan"


def run_traced(mode: str, n_decode: int = 64):
    from koboldcpp_tpu.kv.cache import init_cache, init_pool_cache
    from koboldcpp_tpu.models import llama
    from koboldcpp_tpu.models.synthetic import TINYLLAMA_1_1B, synthetic_params

    cfg = TINYLLAMA_1_1B
    params = synthetic_params(cfg, kind="q4_k", seed=0)
    sparams = llama.stack_layers(params)
    max_seq = 1024

    use_scan = mode == "scan"
    dparams = sparams if use_scan else params

    @jax.jit
    def decode_n(params, cache, tok0, start_pos):
        def body(i, carry):
            tok, cache, acc = carry
            fwd = llama.forward_stacked if use_scan else llama.forward
            logits, cache = fwd(
                params, cfg, tok,
                jnp.full((1, 1), start_pos + i, jnp.int32), cache,
                last_only=True)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
            return nxt, cache, acc + logits[0, -1, 0]
        return jax.lax.fori_loop(0, n_decode, body,
                                 (tok0, cache, jnp.float32(0)))

    if use_scan:
        cache = init_pool_cache(cfg.n_layers, 1, max_seq, cfg.n_kv_heads,
                                cfg.head_dim)
    else:
        cache = init_cache(cfg.n_layers, 1, max_seq, cfg.n_kv_heads,
                           cfg.head_dim)
    tok0 = jnp.full((1, 1), 7, jnp.int32)
    tok, cache, acc = decode_n(dparams, cache, tok0, 64)
    _ = float(acc)  # compile+run
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        tok, cache, acc = decode_n(dparams, cache, tok0, 64 + n_decode)
        _ = float(acc)
    return n_decode


def parse(n_decode: int, mode: str):
    paths = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found"); return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Tensor" in n or "/device" in n.lower()}
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e["name"].rstrip("0123456789").rstrip(".")
        if name.startswith("jit_") or name == "while" or name == "scan":
            continue  # enclosing spans double-count their children
        agg[name] += e.get("dur", 0)
        cnt[name] += 1
        total += e.get("dur", 0)
    print(f"\n== {mode}: device op time over {n_decode} steps "
          f"(per-step us, op total {total/n_decode:.0f} us/step) ==")
    for name, dur in agg.most_common(60):
        print(f"{dur/n_decode:9.1f} us  {100*dur/total:5.1f}%  "
              f"n={cnt[name]:6d}  {name[:100]}")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "scan"
    n = run_traced(mode)
    parse(n, mode)


if __name__ == "__main__":
    main()
