"""Microbenchmark: per-matmul-shape kernel timing on the real chip.

Times the packed Q4_K kernels (2-D vs T=1 row matvec) per TinyLlama shape and
sums a matmul-only step estimate. Device-side loops (fori_loop) + one scalar
pull; min over repeats (shared chip — contention spikes make medians useless).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(f, n=512, reps=5):
    """Run f n times on device (serial dependency via scalar feedback),
    return min seconds/call."""
    @jax.jit
    def loop(x0):
        def body(i, acc):
            y = f(acc)
            return acc + y.ravel()[0].astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, n, body, x0)

    x0 = jnp.float32(0.0)
    float(loop(x0))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(x0))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n


def main():
    from koboldcpp_tpu.models.synthetic import TINYLLAMA_1_1B, synthetic_params
    from koboldcpp_tpu.ops import quant_matmul

    cfg = TINYLLAMA_1_1B
    params = synthetic_params(cfg, kind="q4_k", seed=0)
    layer = params["layers"][0]

    shapes = {
        "wqkv": layer["wqkv"],
        "wo": layer["wo"],
        "w_gateup": layer["w_gateup"],
        "w_down": layer["w_down"],
        "output": params["output"],
    }
    print(f"device: {jax.devices()[0]}")
    Ts = [int(t) for t in os.environ.get("KCPP_BENCH_TS", "1,8").split(",")]
    lay = {T: 0.0 for T in Ts}
    for name, qt in shapes.items():
        out_f, in_f = qt.shape
        wb = sum(v.nbytes for v in qt.data.values())
        for T in Ts:
            x = jnp.ones((T, in_f), jnp.bfloat16)

            def g(acc, qt=qt, x=x):
                return quant_matmul.matmul_packed(
                    x + acc.astype(jnp.bfloat16) * 0, qt)

            lat = timed(g, n=512)
            gbs = wb / lat / 1e9
            print(f"{name:9s} ({out_f:6d},{in_f:5d}) T={T}: {lat*1e6:7.1f} us "
                  f"{gbs:6.0f} GB/s")
            if name != "output":
                lay[T] += lat
    for T in Ts:
        step = lay[T] * cfg.n_layers
        print(f"T={T}: matmul-only step (x{cfg.n_layers} layers, no "
              f"head/attn): {step*1e3:.2f} ms "
              f"-> {T/ (step + 0.0):0.0f} t/s matmul-bound ceiling"
              if step else "")


if __name__ == "__main__":
    main()
