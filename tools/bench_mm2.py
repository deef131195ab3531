"""Microbench: Q4_K batched-matmul kernel variants on the real chip.

Compares, per TinyLlama matmul shape and T in KCPP_BENCH_TS:
  cur2d    — the shipped scale-expansion 2-D kernel (_packed_matmul_2d)
  magic2d  — magic-number dequant 2-D variant (bit-OR nibbles into bf16
             mantissas, affine corrections folded into group-sum dots;
             candidate to replace cur2d for T>MATVEC_MAX_T and prefill)
  row      — the T<=8 masked-stack row kernel (decode path, for crossover)
  xla      — dequant-to-bf16 + XLA matmul (prefill baseline)

Parity-checks each variant against the XLA dequant matmul first.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from koboldcpp_tpu.ops import quant_matmul as qm
from koboldcpp_tpu.ops.linear import dequant_xla

ROW_TILE = qm.ROW_TILE
T_TILE = qm.T_TILE


def _q4k_magic_kernel(xl_ref, xh_ref, xsl_ref, xsh_ref, xs_ref,
                      qs_ref, slo_ref, shi_ref, m_ref, o_ref):
    """Magic-number 2-D Q4_K: w = s*n decomposed as 0.125*s*(128+8n) - 16*s,
    so the per-weight work is 3 bit-ops + 1 mul (no int->float converts);
    the -16*s and min terms fold into rank-G dots against plane group sums."""
    qs = qs_ref[:].astype(jnp.int32)
    C2 = qs.shape[1]
    lo = jax.lax.bitcast_convert_type(
        (((qs & 0xF) << 3) | 0x4300).astype(jnp.uint16), jnp.bfloat16)
    hi = jax.lax.bitcast_convert_type(
        (((qs >> 1) & 0x78) | 0x4300).astype(jnp.uint16), jnp.bfloat16)
    E = qm._expand_mat(C2 // 32, C2, 32)
    acc = qm._dot_t(xl_ref[:], lo * qm._sexp(slo_ref[:], E))
    acc += qm._dot_t(xh_ref[:], hi * qm._sexp(shi_ref[:], E))
    acc *= 0.125
    acc -= 16.0 * qm._dot_t(xsl_ref[:], slo_ref[:].astype(jnp.float32))
    acc -= 16.0 * qm._dot_t(xsh_ref[:], shi_ref[:].astype(jnp.float32))
    acc -= qm._dot_t(xs_ref[:], m_ref[:])
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_f", "in_f", "row_tile"))
def magic2d(x, qs2, slo, shi, m, out_f: int, in_f: int, row_tile: int = ROW_TILE):
    T = x.shape[0]
    t_tile = min(T_TILE, T)
    xl, xh = qm._plane_split2(x, in_f)
    xsl = qm._group_sums(xl, in_f // 2, 32)
    xsh = qm._group_sums(xh, in_f // 2, 32)
    xs = qm._group_sums(x, in_f, 32)
    G2 = in_f // 64
    x_shapes = (in_f // 2, in_f // 2, G2, G2, in_f // 32)
    w_shapes = (in_f // 2, G2, G2, in_f // 32)
    return pl.pallas_call(
        _q4k_magic_kernel,
        grid=(out_f // row_tile, pl.cdiv(T, t_tile)),
        in_specs=[pl.BlockSpec((t_tile, s), lambda o, t: (t, 0),
                               memory_space=pltpu.VMEM) for s in x_shapes]
        + [pl.BlockSpec((row_tile, s), lambda o, t: (o, 0),
                        memory_space=pltpu.VMEM) for s in w_shapes],
        out_specs=pl.BlockSpec((t_tile, row_tile), lambda o, t: (t, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, out_f), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * in_f * out_f,
            bytes_accessed=qs2.nbytes + slo.nbytes + shi.nbytes + m.nbytes
            + x.nbytes + T * out_f * 2,
            transcendentals=0),
    )(xl, xh, xsl, xsh, xs, qs2, slo, shi, m)


def timed(f, n=256, reps=5):
    @jax.jit
    def loop(x0):
        def body(i, acc):
            y = f(acc)
            return acc + y.ravel()[0].astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, n, body, x0)

    x0 = jnp.float32(0.0)
    float(loop(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(x0))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n


def main():
    from koboldcpp_tpu.models.synthetic import TINYLLAMA_1_1B, synthetic_params

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
    Ts = [int(t) for t in os.environ.get("KCPP_BENCH_TS", "1,4,8,16,64,512").split(",")]
    rt = int(os.environ.get("KCPP_BENCH_RT", str(ROW_TILE)))

    # parity check on one shape
    qt = shapes["w_down"]
    out_f, in_f = qt.shape
    key = jax.random.PRNGKey(0)
    xt = jax.random.normal(key, (8, in_f), jnp.bfloat16)
    w = dequant_xla(qt)
    ref = (xt @ w.T).astype(jnp.float32)
    got = magic2d(xt, qt.data["qs2"], qt.data["scale_lo"], qt.data["scale_hi"],
                  qt.data["min"], out_f=out_f, in_f=in_f).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"magic2d parity rel-err: {err:.2e}")
    assert err < 5e-2, "magic2d mismatch"

    totals = {}
    for name, qt in shapes.items():
        out_f, in_f = qt.shape
        wb = sum(v.nbytes for v in qt.data.values())
        for T in Ts:
            x = jax.random.normal(key, (T, in_f), jnp.bfloat16)
            fields = tuple(qt.data[n] for n in qm._FIELD_LISTS["q4_k"])
            mv_fields = tuple(qt.data[n] for n in qm._MATVEC_FIELDS_Q4K)

            variants = {}
            variants["cur2d"] = lambda a, x=x, f=fields: qm._packed_matmul_2d(
                x + a * 0, f, kind="q4_k", out_f=out_f, in_f=in_f,
                interpret=False)
            variants["magic2d"] = lambda a, x=x, qt=qt: magic2d(
                x + a * 0, qt.data["qs2"], qt.data["scale_lo"],
                qt.data["scale_hi"], qt.data["min"], out_f=out_f, in_f=in_f,
                row_tile=rt)
            if T <= 8:
                i8 = T == 1 and os.environ.get("KCPP_Q4K_I8", "1") == "1"
                variants["row"] = lambda a, x=x, f=mv_fields, i8=i8: \
                    qm._packed_matvec_q4k(
                        x + a * 0, f, kind="q4_k", out_f=out_f, in_f=in_f,
                        interpret=False, i8=i8, raw=T == 1)
            if T >= 64:
                w = dequant_xla(qt)
                variants["xla"] = lambda a, x=x, w=w: (x + a * 0) @ w.T

            row = [f"{name:9s} T={T:<4d} w={wb/1e6:6.1f}MB"]
            for vn, fn in variants.items():
                try:
                    us = timed(fn, n=128 if T >= 64 else 256) * 1e6
                    gbs = wb / (us * 1e-6) / 1e9
                    row.append(f"{vn}: {us:7.1f}us {gbs:6.0f}GB/s")
                    totals.setdefault((vn, T), 0.0)
                    totals[(vn, T)] += us
                except Exception as e:  # noqa: BLE001
                    row.append(f"{vn}: FAIL {type(e).__name__}")
            print("  ".join(row), flush=True)

    print("\nper-layer matmul sums (wqkv+wo+gateup+down):")
    for (vn, T), us in sorted(totals.items(), key=lambda kv: (kv[0][1], kv[0][0])):
        print(f"  T={T:<4d} {vn:8s} {us:8.1f}us")


if __name__ == "__main__":
    main()
