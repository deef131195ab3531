"""Throughput-mode timing of ONE packed matmul shape at batch T: N
independent calls per sync (outputs accumulated, inputs constant) so calls
pipeline like the in-situ decode step and per-call time is honest.

Usage: [envs] python tools/bench_one_mm.py [T] [out_f] [in_f] [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from koboldcpp_tpu.gguf import GGMLType, quants
from koboldcpp_tpu.ops import linear, quant_matmul

T = int(sys.argv[1]) if len(sys.argv) > 1 else 8
out_f = int(sys.argv[2]) if len(sys.argv) > 2 else 11264
in_f = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
N = int(sys.argv[4]) if len(sys.argv) > 4 else 64
kind = getattr(GGMLType, os.environ.get("KCPP_BENCH_KIND", "q4_k").upper())

rng = np.random.default_rng(0)
w = (rng.standard_normal((out_f, in_f)) * 0.05).astype(np.float32)
raw = quants.quantize(w, kind)
qt = linear.from_gguf(raw, kind, (out_f, in_f), packed=True)
x = jnp.asarray(rng.standard_normal((T, in_f)) * 0.3, jnp.bfloat16)


@jax.jit
def many(x):
    def body(i, acc):
        # vary x per iteration so XLA can't hoist the loop-invariant call
        xi = x * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
        y = quant_matmul.matmul_packed(xi, qt)
        return acc + y[0, 0] * 1e-9 + y[T - 1, out_f - 1] * 1e-9
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))


t0 = time.perf_counter()
v = float(many(x))
cs = time.perf_counter() - t0
lat = []
for _ in range(3):
    t0 = time.perf_counter()
    float(jnp.float32(1) + 1)
    lat.append(time.perf_counter() - t0)
latency = min(lat)
dt = 1e9
for _ in range(5):
    t0 = time.perf_counter()
    v = float(many(x))
    dt = min(dt, time.perf_counter() - t0 - latency)
per = dt / N
qs_b = int(qt.data["qs2"].nbytes) if "qs2" in qt.data else \
    int(qt.data["q"].nbytes)
tot_b = sum(int(a.nbytes) for a in qt.data.values()
            if a.shape[0] != out_f or a.ndim != 2 or True)
print(f"T={T} {out_f}x{in_f} SBQ={os.environ.get('KCPP_SBQ','1')} "
      f"I8={os.environ.get('KCPP_Q4K_I8','1')}: per_call={per*1e6:.1f}us "
      f"eff={qs_b/per/1e9:.0f}GB/s(qs) compile={cs:.1f}s v={v:.4f}")
