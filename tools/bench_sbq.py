"""On-TPU A/B of the SBQ batched kernel vs the i8_t / 2-D paths.

Measures a chained T-batched matmul loop over the TinyLlama-1.1B layer
shapes (qkv/wo/gateup/down), synced by pulling a scalar (the axon tunnel
makes block_until_ready unreliable — PERF_NOTES).  Usage:
    python tools/bench_sbq.py [T] [n_iters]
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
N = int(sys.argv[2]) if len(sys.argv) > 2 else 50

# TinyLlama-1.1B layer shapes (out_f, in_f)
SHAPES = [(2304, 2048), (2048, 2048), (11264, 2048), (2048, 5632)]


def build(shape, seed):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal(shape) * 0.05).astype(np.float32)
    raw = quants.quantize(w, GGMLType.Q4_K)
    return linear.from_gguf(raw, GGMLType.Q4_K, shape, packed=True), \
        quants.dequantize(raw, GGMLType.Q4_K).reshape(shape)


qts = []
refs = []
for i, s in enumerate(SHAPES):
    qt, wref = build(s, i)
    qts.append(qt)
    refs.append(wref)

x0 = jnp.asarray(np.random.default_rng(9).standard_normal((T, 2048)) * 0.3,
                 jnp.bfloat16)


def chain(x):
    # mimic a layer: qkv -> (slice to 2048) -> wo -> gateup -> (slice) -> down
    y = quant_matmul.matmul_packed(x, qts[0])
    y = y[:, :2048]
    y = quant_matmul.matmul_packed(y.astype(jnp.bfloat16), qts[1])
    z = quant_matmul.matmul_packed(y.astype(jnp.bfloat16), qts[2])
    z = jnp.tanh(z[:, :5632] * 0.001)
    w = quant_matmul.matmul_packed(z.astype(jnp.bfloat16), qts[3])
    return (w * 0.001).astype(jnp.bfloat16)


@jax.jit
def loop(x):
    def body(i, x):
        return chain(x)
    x = jax.lax.fori_loop(0, N, body, x)
    return x[0, 0]


def parity():
    y = quant_matmul.matmul_packed(x0, qts[0])
    want = np.asarray(x0, np.float32) @ refs[0].T
    got = np.asarray(y, np.float32)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    return err


def run():
    t0 = time.perf_counter()
    v = float(loop(x0))
    compile_s = time.perf_counter() - t0
    dt = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        v = float(loop(x0))
        dt = min(dt, time.perf_counter() - t0)
    return compile_s, dt / N, v


mode = os.environ.get("KCPP_SBQ", "1")
err = parity()
cs, per_iter, v = run()
wbytes = sum(q.data["qs2"].nbytes for q in qts)
print(f"SBQ={mode} T={T}: parity_err={err:.4f} compile={cs:.1f}s "
      f"per_chain={per_iter*1e6:.0f}us "
      f"eff_qs_GBps={wbytes/per_iter/1e9:.0f} v={v:.3f}")
