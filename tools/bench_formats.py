"""Per-format decode-matvec throughput table (VERDICT r2 item 3: every
format within 15% of q4_k's effective GB/s).

Times a chained device loop over ONE TinyLlama-gateup-shaped matvec
(11264 x 2048) per format and prints streamed-bytes GB/s — the per-kernel
counterpart of bench.py's whole-model decode metric.  IQ formats are built
from random valid raw blocks; K-quants/q8_0 from quantized gaussians.

Usage: python tools/bench_formats.py [json]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from koboldcpp_tpu.gguf import quants as nq
from koboldcpp_tpu.gguf.constants import GGMLType, GGML_BLOCK_SIZES
from koboldcpp_tpu.ops import quant_matmul as qm
from koboldcpp_tpu.ops.linear import from_gguf
from koboldcpp_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

OUT_F, IN_F = 11264, 2048
N = 128

FORMATS = [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_0,
           GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_0, GGMLType.Q5_1,
           GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ3_XXS,
           GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ4_NL]


def make_qt(t: GGMLType):
    rng = np.random.default_rng(int(t))
    if t.name.startswith("IQ1") or t.name.startswith("IQ2") \
            or t.name.startswith("IQ3"):
        # no full quantizer set for these; random valid raw streams the
        # same bytes through the same kernel
        blk, sz = GGML_BLOCK_SIZES[t]
        raw = rng.integers(0, 256, (OUT_F, IN_F // blk * sz), np.uint8)
        b = raw.reshape(OUT_F, IN_F // blk, sz)
        b[:, :, 1] = 0x2C  # finite f16 scales
        if t == GGMLType.IQ1_M:
            pass
        return from_gguf(raw, t, (OUT_F, IN_F), packed=True)
    w = (rng.standard_normal((OUT_F, IN_F)) * 0.05).astype(np.float32)
    return from_gguf(nq.quantize(w, t), t, (OUT_F, IN_F), packed=True)


def streamed_bytes(qt) -> int:
    names = ({"q4_k": qm._MATVEC_FIELDS_Q4K,
              "q5_k": qm._MATVEC_FIELDS_Q5K}.get(qt.kind)
             or qm._MATVEC_FIELDS.get(qt.kind))
    if names and all(n in qt.data for n in names):
        return sum(qt.data[n].nbytes for n in names)
    return sum(v.nbytes for v in qt.data.values())


def bench_format(t: GGMLType) -> dict:
    qt = make_qt(t)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((1, IN_F)) * 0.5,
                     jnp.bfloat16)

    @jax.jit
    def loop(x0):
        def body(i, x):
            y = qm.matmul_packed(x, qt)
            return x * 0 + y[:, :IN_F].astype(jnp.bfloat16) * 1e-3
        return jax.lax.fori_loop(0, N, body, x0)[0, 0]

    float(loop(x0))
    dt = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x0))
        dt = min(dt, time.perf_counter() - t0)
    us = dt / N * 1e6
    sb = streamed_bytes(qt)
    return {"kind": qt.kind, "bpw": round(sb * 8 / (OUT_F * IN_F), 2),
            "us_per_call": round(us, 1), "gbs": round(sb / us / 1e3, 1)}


def main():
    out = {}
    for t in FORMATS:
        try:
            r = bench_format(t)
            out[t.name] = r
            print(f"{t.name:9s} kind={r['kind']:7s} {r['bpw']:5.2f} bpw  "
                  f"{r['us_per_call']:7.1f} us  {r['gbs']:6.1f} GB/s",
                  flush=True)
        except Exception as e:
            print(f"{t.name}: FAIL {type(e).__name__}: {str(e)[:90]}",
                  flush=True)
    if len(sys.argv) > 1 and sys.argv[1] == "json":
        print(json.dumps(out))


if __name__ == "__main__":
    main()
