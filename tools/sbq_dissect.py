"""Dissect the SBQ batched kernel: time stripped-down variants of the
gateup-shape (11264x2048) T=8 matmul to find the binding resource.

Variants (each intentionally WRONG numerically except 'full'):
  full      - the real SBQ kernel math
  noexp     - pexp replaced by constant 37 (E-dots removed)
  nomult    - wa/wb = nibbles directly (scale multiplies+casts removed)
  nodots2   - only lo-plane P-dots (half the main MXU work)
  dmaonly   - kernel reads qs tile, does one trivial reduce (pure stream)
  i8t       - the existing per-32 i8_t path (dispatch, reference point)
  2d        - the existing 2-D scale-expansion kernel
  dense     - plain XLA bf16 matmul of the same logical shape
Usage: python tools/sbq_dissect.py [T] [N]
"""
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

from koboldcpp_tpu.gguf import GGMLType, quants
from koboldcpp_tpu.ops import linear, quant_matmul as qm

T = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N = int(sys.argv[2]) if len(sys.argv) > 2 else 512
out_f, in_f = 11264, 2048
C2 = in_f // 2
GS = in_f // 64
nsb = in_f // 256
rt = int(os.environ.get('RT', '256'))

rng = np.random.default_rng(0)
w = (rng.standard_normal((out_f, in_f)) * 0.05).astype(np.float32)
raw = quants.quantize(w, GGMLType.Q4_K)
qt = linear.from_gguf(raw, GGMLType.Q4_K, (out_f, in_f), packed=True)
x = jnp.asarray(rng.standard_normal((T, in_f)) * 0.3, jnp.bfloat16)
wd = jnp.asarray(w, jnp.bfloat16)

FIELDS = tuple(qt.data[n] for n in qm._SBQ_FIELDS_Q4K)


def variant_kernel(mode):
    def kern(x_ref, qs_ref, scp_lo_ref, scp_hi_ref, d_ref, mlo_ref, mhi_ref,
             o_ref, ml_s, mh_s, sx_s, xs_s):
        @pl.when(pl.program_id(0) == 0)
        def _prep():
            qm._sbq_prep(x_ref, ml_s, mh_s, sx_s, xs_s, T)

        q = qs_ref[:].astype(jnp.int32)
        lo = q & 0xF
        hi = q >> 4
        Ei = qm._expand_mat_i8(GS, C2, 32)

        if mode == "dmaonly":
            o_ref[:] = (q.astype(jnp.float32).sum(axis=1, keepdims=True)
                        * jnp.ones((1, o_ref.shape[1]), jnp.float32)
                        )[:T].astype(o_ref.dtype)
            return

        if mode == "screw3":
            # screw with fully sequential plane processing (lower VMEM
            # pressure: lo-plane temps die before hi-plane temps are born)
            def pdot3(m, wk):
                return jax.lax.dot_general(
                    m, wk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)

            va = jnp.zeros((T * nsb, o_ref.shape[1]), jnp.float32)
            for sp_ref, qq, m_s, coli in ((scp_lo_ref, lo, ml_s, 0),
                                          (scp_hi_ref, hi, mh_s, 1)):
                sp = sp_ref[:].astype(jnp.int32)
                sc8 = (8 * (sp >> 4) + (sp & 15)).astype(jnp.int8)
                sexp = jax.lax.dot_general(
                    sc8, Ei, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                wfull = sexp * qq
                va += (16 * pdot3(m_s[:], (wfull >> 4).astype(jnp.int8))
                       + pdot3(m_s[:], (wfull & 15).astype(jnp.int8))
                       ).astype(jnp.float32) * sx_s[:, coli:coli + 1]
            t = qm._sbq_combine(va, sx_s, xs_s, d_ref, mlo_ref, mhi_ref,
                                T, nsb)
            o_ref[:] = t.astype(o_ref.dtype)
            return

        if mode == "screw":
            # single-mult variant: reconstruct raw sc (tiny sidecar math),
            # ONE E-dot per plane -> scexp; w = scexp*q <= 945; split the
            # PRODUCT into nibble planes: sum sc*q*xq = 16*D_hi + D_lo exact.
            sp_lo = scp_lo_ref[:].astype(jnp.int32)
            sp_hi = scp_hi_ref[:].astype(jnp.int32)
            sc_lo = (8 * (sp_lo >> 4) + (sp_lo & 15)).astype(jnp.int8)
            sc_hi = (8 * (sp_hi >> 4) + (sp_hi & 15)).astype(jnp.int8)
            sexp_lo = jax.lax.dot_general(
                sc_lo, Ei, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            sexp_hi = jax.lax.dot_general(
                sc_hi, Ei, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            w_lo = sexp_lo * lo
            w_hi = sexp_hi * hi
            wa_lo = (w_lo >> 4).astype(jnp.int8)
            wb_lo = (w_lo & 15).astype(jnp.int8)
            wa_hi = (w_hi >> 4).astype(jnp.int8)
            wb_hi = (w_hi & 15).astype(jnp.int8)

            def pdot2(m_s, wk):
                return jax.lax.dot_general(
                    m_s[:], wk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)

            va = (16 * pdot2(ml_s, wa_lo) + pdot2(ml_s, wb_lo)
                  ).astype(jnp.float32) * sx_s[:, 0:1]
            va += ((16 * pdot2(mh_s, wa_hi) + pdot2(mh_s, wb_hi))
                   .astype(jnp.float32) * sx_s[:, 1:2])
            t = qm._sbq_combine(va, sx_s, xs_s, d_ref, mlo_ref, mhi_ref,
                                T, nsb)
            o_ref[:] = t.astype(o_ref.dtype)  # 16*Dhi+Dlo == sum sc*q*xq
            return

        if mode == "screw2":
            # screw + per-256-superblock activation quant (q8_K class):
            # lo/hi planes share sx, so the plane dots merge into single
            # K=2*C2 cat-dots (2 dots instead of 4).
            sp_lo = scp_lo_ref[:].astype(jnp.int32)
            sp_hi = scp_hi_ref[:].astype(jnp.int32)
            sc_lo = (8 * (sp_lo >> 4) + (sp_lo & 15)).astype(jnp.int8)
            sc_hi = (8 * (sp_hi >> 4) + (sp_hi & 15)).astype(jnp.int8)
            sexp_lo = jax.lax.dot_general(
                sc_lo, Ei, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            sexp_hi = jax.lax.dot_general(
                sc_hi, Ei, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            w_lo = sexp_lo * lo
            w_hi = sexp_hi * hi
            wa = jnp.concatenate([(w_lo >> 4).astype(jnp.int8),
                                  (w_hi >> 4).astype(jnp.int8)], axis=1)
            wb = jnp.concatenate([(w_lo & 15).astype(jnp.int8),
                                  (w_hi & 15).astype(jnp.int8)], axis=1)
            mcat = jnp.concatenate([ml_s[:], mh_s[:]], axis=1)

            def pdot2(m, wk):
                return jax.lax.dot_general(
                    m, wk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)

            va = (16 * pdot2(mcat, wa) + pdot2(mcat, wb)
                  ).astype(jnp.float32) * sx_s[:, 0:1]
            t = qm._sbq_combine(va, sx_s, xs_s, d_ref, mlo_ref, mhi_ref,
                                T, nsb)
            o_ref[:] = t.astype(o_ref.dtype)
            return

        if mode == "noexp":
            pexp_lo = jnp.full(lo.shape, 37, jnp.int32)
            pexp_hi = pexp_lo
        else:
            pexp_lo = jax.lax.dot_general(
                scp_lo_ref[:], Ei, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            pexp_hi = jax.lax.dot_general(
                scp_hi_ref[:], Ei, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        if mode == "nomult":
            wa_lo = lo.astype(jnp.int8)
            wb_lo = lo.astype(jnp.int8)
            wa_hi = hi.astype(jnp.int8)
            wb_hi = hi.astype(jnp.int8)
        else:
            wa_lo = ((pexp_lo >> 4) * lo).astype(jnp.int8)
            wb_lo = ((pexp_lo & 15) * lo).astype(jnp.int8)
            wa_hi = ((pexp_hi >> 4) * hi).astype(jnp.int8)
            wb_hi = ((pexp_hi & 15) * hi).astype(jnp.int8)

        def pdot(m_s, wk):
            return jax.lax.dot_general(m_s[:], wk, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.int32)

        va = (8 * pdot(ml_s, wa_lo) + pdot(ml_s, wb_lo)).astype(jnp.float32) \
            * sx_s[:, 0:1]
        if mode != "nodots2":
            va += ((8 * pdot(mh_s, wa_hi) + pdot(mh_s, wb_hi))
                   .astype(jnp.float32) * sx_s[:, 1:2])
        t = qm._sbq_combine(va, sx_s, xs_s, d_ref, mlo_ref, mhi_ref, T, nsb)
        o_ref[:] = t.astype(o_ref.dtype)
    return kern


def make_call(mode):
    scratch = [pltpu.VMEM((T * nsb, C2), jnp.int8),
               pltpu.VMEM((T * nsb, C2), jnp.int8),
               pltpu.VMEM((T * nsb, 2), jnp.float32),
               pltpu.VMEM((2 * T, GS), jnp.bfloat16)]
    f = pl.pallas_call(
        variant_kernel(mode),
        grid=(out_f // rt,),
        in_specs=[pl.BlockSpec((T, in_f), lambda o: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rt, C2), lambda o: (o, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rt, GS), lambda o: (o, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rt, GS), lambda o: (o, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((nsb, rt), lambda o: (0, o),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((GS, rt), lambda o: (0, o),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((GS, rt), lambda o: (0, o),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, rt), lambda o: (0, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, out_f), x.dtype),
        scratch_shapes=scratch,
    )

    def call(xi):
        return f(xi, *FIELDS)
    return call


def timeit(fn):
    @jax.jit
    def many(x):
        def body(i, acc):
            xi = x * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
            y = fn(xi)
            return acc + y[0, 0].astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    t0 = time.perf_counter()
    float(many(x))
    cs = time.perf_counter() - t0
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.float32(1) + 1)
        lat.append(time.perf_counter() - t0)
    latency = min(lat)
    dt = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        float(many(x))
        dt = min(dt, time.perf_counter() - t0 - latency)
    return dt / N, cs


modes = sys.argv[3].split(",") if len(sys.argv) > 3 else \
    ["dmaonly", "noexp", "nomult", "nodots2", "full", "i8t", "2d", "dense"]
for mode in modes:
    if mode == "i8t":
        os.environ["KCPP_SBQ"] = "0"
        os.environ["KCPP_Q4K_I8"] = "1"
        fn = functools.partial(qm.matmul_packed, qt=qt)
        per, cs = timeit(lambda xi: qm.matmul_packed(xi, qt))
        os.environ["KCPP_SBQ"] = "1"
    elif mode == "2d":
        per, cs = timeit(lambda xi: qm._packed_matmul_2d(
            xi, tuple(qt.data[n] for n in qm._FIELD_LISTS["q4_k"]),
            kind="q4_k", out_f=out_f, in_f=in_f, interpret=False))
    elif mode == "dense":
        per, cs = timeit(lambda xi: jnp.dot(
            xi, wd.T, preferred_element_type=jnp.float32))
    else:
        per, cs = timeit(make_call(mode))
    qs_b = qt.data["qs2"].nbytes
    print(f"{mode:8s}: {per*1e6:7.1f} us/call  {qs_b/per/1e9:5.0f} GB/s(qs)"
          f"  compile {cs:.1f}s", flush=True)
