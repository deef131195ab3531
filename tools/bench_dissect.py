"""Dissect batched-decode kernel time: chained-dependency timing.

Chains N kernel calls through a real data dependency (y feeds the next x) so
DMA pipelining matches in-situ behavior, unlike scalar-feedback loops which
drain the pipe every iteration. Compares kernel variants at T in {1, 8} on the
gate/up shape (11264, 2048) to find what bounds the batched path.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(step, x0, n=64, reps=5):
    """step: x -> x (same shape). Time n chained calls, min secs/call."""
    @jax.jit
    def loop(x):
        def body(i, x):
            return step(x)
        return jax.lax.fori_loop(0, n, body, x)

    y = loop(x0)
    y.block_until_ready()
    float(y.ravel()[0])  # force through tunnel
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(x0).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) / n


def main():
    from koboldcpp_tpu.ops import quant_matmul
    from koboldcpp_tpu.models import synthetic

    rng = np.random.default_rng(0)
    out_f, in_f = 11264, 2048
    w = (rng.standard_normal((out_f, in_f)) * 0.02).astype(np.float32)
    print(f"device: {jax.devices()[0]}  shape ({out_f}, {in_f})")

    results = {}
    variants = {}

    qt_q4k = synthetic._rand_q4k(rng, out_f, in_f)
    wb_q4k = sum(v.nbytes for v in qt_q4k.data.values())

    def mk_q4k(T):
        def step(x):
            y = quant_matmul.matmul_packed(x, qt_q4k)  # (T, out_f)
            return y[:, :in_f].astype(jnp.bfloat16) * 1e-3
        return step
    variants["q4_k"] = (mk_q4k, wb_q4k)

    qt_q8 = synthetic._rand_q8_0(rng, out_f, in_f)
    wb_q8 = sum(v.nbytes for v in qt_q8.data.values())

    qt_i8 = synthetic._rand_q4k_i8(rng, out_f, in_f)
    wb_i8 = sum(v.nbytes for v in qt_i8.data.values())

    def mk_i8(T):
        def step(x):
            y = quant_matmul.matmul_packed(x, qt_i8)
            return y[:, :in_f].astype(jnp.bfloat16) * 1e-3
        return step
    variants["q4_k_i8"] = (mk_i8, wb_i8)

    def mk_q8(T):
        def step(x):
            y = quant_matmul.matmul_packed(x, qt_q8)
            return y[:, :in_f].astype(jnp.bfloat16) * 1e-3
        return step
    variants["q8_0"] = (mk_q8, wb_q8)

    wbf = jnp.asarray(w.T, jnp.bfloat16)  # (in_f, out_f)

    def mk_bf16(T):
        def step(x):
            y = jnp.dot(x, wbf, preferred_element_type=jnp.float32)
            return y[:, :in_f].astype(jnp.bfloat16) * 1e-3
        return step
    variants["bf16"] = (mk_bf16, wbf.nbytes)

    for name, (mk, wb) in variants.items():
        for T in (1, 8):
            print(f"compiling {name} T={T}...", flush=True)
            x0 = jnp.asarray(rng.standard_normal((T, in_f)), jnp.bfloat16)
            lat = chain_time(mk(T), x0)
            gbs = wb / lat / 1e9
            results[(name, T)] = (lat, gbs)
            sys.stdout.flush(); print(f"{name:8s} T={T}: {lat*1e6:7.1f} us  {gbs:6.0f} GB/s "
                  f"(weights {wb/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
