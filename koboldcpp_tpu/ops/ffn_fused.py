"""Fused decode-FFN megakernel: gateup matvec + SwiGLU + down matvec in ONE
pallas_call.

TPU counterpart of keeping the mmvq weight stream saturated across the whole
FFN (the reference launches separate mmvq kernels per projection,
/root/reference/ggml/src/ggml-cuda/mmvq.cu): at T=1 decode is pure weight
streaming, and every kernel boundary drains the double-buffered DMA pipeline
(~measured 271 GB/s effective vs ~330 GB/s in-kernel ceiling, PERF_NOTES).
One grid covers n_gu gateup row-tiles then n_dn down row-tiles; the SwiGLU
activation and the down-side x-prep (plane split, masked expansion stacks,
group sums) happen in VMEM scratch at the phase boundary, so no XLA prep
fusions and no pipeline drain between the two matmuls.

Index maps clamp across phases (min/max): Pallas skips the DMA when a block
index repeats, so the clamped phase holds its last block without re-fetching.

Requires the v2 contiguous-plane Q4_K packing (ops/linear.py pack_q4_k):
the in-kernel activation plane split is two 128-lane-aligned reshapes + a
static slice, which Mosaic allows (interleaved 32-col splits are not).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .linear import QTensor
from .quant_matmul import (_dot_t, _expand_mat, _q4k_row_math, _sexp,
                           _use_interpret, _pallas_enabled,
                           _FIELD_LISTS, _MATVEC_FIELDS_Q4K)

_VMEM_BUDGET = 12 * 1024 * 1024


def _enabled() -> bool:
    """Opt-in: in-situ A/B on v5e measured the megakernel NEUTRAL at 7B
    (98.6 vs 98.7 t/s) and slightly behind at 1.1B (663 vs 688) — the v2
    row-output matvec kernel already streams at ~580 GB/s, so the boundary
    drain it was built to hide is no longer the bottleneck, and the phase-
    boundary act/prep stores cost more than they save (PERF_NOTES)."""
    return os.environ.get("KCPP_FFN_FUSED", "0") == "1"


def _ffn_kernel(mlg_ref, mhg_ref, xslg_ref, xshg_ref,
                qs_gu, slo_gu, shi_gu, mlo_gu, mhi_gu,
                qs_dn, slo_dn, shi_dn, mlo_dn, mhi_dn,
                o_ref,
                gu_acc, mld, mhd, xsld, xshd,
                *, n_gu: int):
    i = pl.program_id(0)

    @pl.when(i < n_gu)
    def _gateup():
        t = _q4k_row_math(mlg_ref[:], mhg_ref[:], xslg_ref[:], xshg_ref[:],
                          qs_gu[:].astype(jnp.int32), slo_gu[:], shi_gu[:],
                          mlo_gu[:], mhi_gu[:])
        gu_acc[pl.dslice(i, 1), :] = t

    @pl.when(i == n_gu)
    def _act_prep():
        rtg = gu_acc.shape[1]
        act = gu_acc[:].reshape(1, n_gu * rtg)        # (1, 2F) f32
        F = act.shape[1] // 2
        g = act[:, :F]
        u = act[:, F:]
        a = u * g * jax.lax.logistic(g)               # silu(g) * u
        a3 = a.reshape(F // 256, 256)                 # minor dim stays aligned
        xl = a3[:, :128].reshape(1, F // 2)
        xh = a3[:, 128:].reshape(1, F // 2)
        GSf = F // 64
        Ed = _expand_mat(GSf, F // 2, 32)
        mld[:] = Ed * xl.astype(jnp.bfloat16)
        mhd[:] = Ed * xh.astype(jnp.bfloat16)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (F // 2, GSf), 0) // 32
        gidx = jax.lax.broadcasted_iota(jnp.int32, (F // 2, GSf), 1)
        EdT = (cidx == gidx).astype(jnp.float32)
        xsld[:] = jax.lax.dot_general(
            xl, EdT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        xshd[:] = jax.lax.dot_general(
            xh, EdT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @pl.when(i >= n_gu)
    def _down():
        t = _q4k_row_math(mld[:], mhd[:], xsld[:], xshd[:],
                          qs_dn[:].astype(jnp.int32), slo_dn[:], shi_dn[:],
                          mlo_dn[:], mhi_dn[:])
        o_ref[:] = t.astype(o_ref.dtype)


def _ffn_kernel_2d(xl_ref, xh_ref, xs_ref,
                   qs_gu, slo_gu, shi_gu, m_gu,
                   qs_dn, slo_dn, shi_dn, m_dn,
                   o_ref,
                   gu_acc, xld, xhd, xsd,
                   *, n_gu: int, rtg: int):
    """Batched (T<=T_TILE) FFN megakernel using the 2-D scale-expansion math
    in both phases (the masked-stack row math's P-dot MACs grow with T, so
    the T=1 kernel's structure doesn't scale; this one's per-tile cost is
    T-flat).  gu_acc collects gateup row tiles via statically-unrolled lane
    slices (dynamic lane stores are not Mosaic-legal); the SwiGLU + down-side
    plane split / logical group sums run at the phase boundary in VMEM."""
    i = pl.program_id(0)

    @pl.when(i < n_gu)
    def _gateup():
        qs = qs_gu[:].astype(jnp.int32)
        C2 = qs.shape[1]
        lo = (qs & 0xF).astype(jnp.bfloat16)
        hi = (qs >> 4).astype(jnp.bfloat16)
        E = _expand_mat(C2 // 32, C2, 32)
        acc = _dot_t(xl_ref[:], lo * _sexp(slo_gu[:], E))
        acc += _dot_t(xh_ref[:], hi * _sexp(shi_gu[:], E))
        acc -= _dot_t(xs_ref[:], m_gu[:])
        for k in range(n_gu):  # static unroll: lane offsets must be static
            @pl.when(i == k)
            def _store(k=k):
                gu_acc[:, k * rtg:(k + 1) * rtg] = acc

    @pl.when(i == n_gu)
    def _act_prep():
        act = gu_acc[:]                               # (T, 2F) f32
        F = act.shape[1] // 2
        T = act.shape[0]
        g = act[:, :F]
        u = act[:, F:]
        a = u * g * jax.lax.logistic(g)               # silu(g) * u
        a3 = a.reshape(T, F // 256, 256)              # minor dim stays aligned
        xld[:] = a3[:, :, :128].reshape(T, F // 2).astype(jnp.bfloat16)
        xhd[:] = a3[:, :, 128:].reshape(T, F // 2).astype(jnp.bfloat16)
        # logical per-32 group sums as an MXU dot against an iota 0/1 matrix
        cidx = jax.lax.broadcasted_iota(jnp.int32, (F, F // 32), 0) // 32
        gidx = jax.lax.broadcasted_iota(jnp.int32, (F, F // 32), 1)
        E32 = (cidx == gidx).astype(jnp.float32)
        xsd[:] = jax.lax.dot_general(
            a, E32, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @pl.when(i >= n_gu)
    def _down():
        qs = qs_dn[:].astype(jnp.int32)
        F2 = qs.shape[1]
        lo = (qs & 0xF).astype(jnp.bfloat16)
        hi = (qs >> 4).astype(jnp.bfloat16)
        E = _expand_mat(F2 // 32, F2, 32)
        acc = _dot_t(xld[:], lo * _sexp(slo_dn[:], E))
        acc += _dot_t(xhd[:], hi * _sexp(shi_dn[:], E))
        acc -= _dot_t(xsd[:], m_dn[:])
        o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("C", "F", "rtg", "rtd", "interpret"))
def _ffn_fused_call_2d(x, gu_fields, dn_fields, C: int, F: int,
                       rtg: int, rtd: int, interpret: bool):
    from .quant_matmul import _plane_split2, _group_sums

    T = x.shape[0]
    n_gu = 2 * F // rtg
    n_dn = C // rtd
    GSc, C2 = C // 64, C // 2
    F2 = F // 2

    xl, xh = _plane_split2(x, C)
    xs = _group_sums(x, C, 32)

    const = lambda r, c: pl.BlockSpec(  # noqa: E731
        (r, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    gu_w = ([pl.BlockSpec((rtg, C2), lambda i: (jnp.minimum(i, n_gu - 1), 0),
                          memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((rtg, g), lambda i: (jnp.minimum(i, n_gu - 1), 0),
                            memory_space=pltpu.VMEM)
               for g in (C // 64, C // 64, C // 32)])
    dn_w = ([pl.BlockSpec((rtd, F2), lambda i: (jnp.maximum(i - n_gu, 0), 0),
                          memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((rtd, g), lambda i: (jnp.maximum(i - n_gu, 0), 0),
                            memory_space=pltpu.VMEM)
               for g in (F // 64, F // 64, F // 32)])

    return pl.pallas_call(
        functools.partial(_ffn_kernel_2d, n_gu=n_gu, rtg=rtg),
        grid=(n_gu + n_dn,),
        in_specs=[const(T, C2), const(T, C2), const(T, C // 32)]
        + gu_w + dn_w,
        out_specs=pl.BlockSpec((T, rtd), lambda i: (0, jnp.maximum(i - n_gu, 0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((T, 2 * F), jnp.float32),    # gateup activations
            pltpu.VMEM((T, F2), jnp.bfloat16),      # down xl
            pltpu.VMEM((T, F2), jnp.bfloat16),      # down xh
            pltpu.VMEM((T, F // 32), jnp.bfloat16),  # down group sums
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * (C * 2 * F + F * C),
            bytes_accessed=sum(f.nbytes for f in gu_fields + dn_fields)
            + x.nbytes + T * C * 2,
            transcendentals=T * F,
        ),
        interpret=interpret,
    )(xl, xh, xs, *gu_fields, *dn_fields)


@functools.partial(jax.jit,
                   static_argnames=("C", "F", "rtg", "rtd", "interpret"))
def _ffn_fused_call(x, gu_fields, dn_fields, C: int, F: int,
                    rtg: int, rtd: int, interpret: bool):
    from .quant_matmul import _plane_split2, _group_sums

    n_gu = 2 * F // rtg
    n_dn = C // rtd
    GSc, C2 = C // 64, C // 2
    GSf, F2 = F // 64, F // 2

    xl, xh = _plane_split2(x, C)
    Ec = _expand_mat(GSc, C2, 32)
    mlg = Ec * xl.astype(jnp.bfloat16)
    mhg = Ec * xh.astype(jnp.bfloat16)
    xslg = _group_sums(xl, C2, 32)
    xshg = _group_sums(xh, C2, 32)

    const = lambda r, c: pl.BlockSpec(  # noqa: E731
        (r, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    gu_w = ([pl.BlockSpec((rtg, C2), lambda i: (jnp.minimum(i, n_gu - 1), 0),
                          memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((g, rtg), lambda i: (0, jnp.minimum(i, n_gu - 1)),
                            memory_space=pltpu.VMEM)
               for g in (GSc,) * 4])
    dn_w = ([pl.BlockSpec((rtd, F2), lambda i: (jnp.maximum(i - n_gu, 0), 0),
                          memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((g, rtd), lambda i: (0, jnp.maximum(i - n_gu, 0)),
                            memory_space=pltpu.VMEM)
               for g in (GSf,) * 4])

    return pl.pallas_call(
        functools.partial(_ffn_kernel, n_gu=n_gu),
        grid=(n_gu + n_dn,),
        in_specs=[const(GSc, C2), const(GSc, C2), const(1, GSc),
                  const(1, GSc)] + gu_w + dn_w,
        out_specs=pl.BlockSpec((1, rtd), lambda i: (0, jnp.maximum(i - n_gu, 0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_gu, rtg), jnp.float32),   # gateup row tiles
            pltpu.VMEM((GSf, F2), jnp.bfloat16),    # down Ml
            pltpu.VMEM((GSf, F2), jnp.bfloat16),    # down Mh
            pltpu.VMEM((1, GSf), jnp.bfloat16),     # down xsl
            pltpu.VMEM((1, GSf), jnp.bfloat16),     # down xsh
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * C * 2 * F + 2 * F * C,
            bytes_accessed=sum(f.nbytes for f in gu_fields + dn_fields)
            + x.nbytes + C * 2,
            transcendentals=F),
        interpret=interpret,
    )(mlg, mhg, xslg, xshg, *gu_fields, *dn_fields)


def _tile(out_f: int) -> int | None:
    for rt in (512, 256):
        if out_f % rt == 0:
            return rt
    return None


FUSED_MAX_T = int(os.environ.get("KCPP_FFN_FUSED_MAX_T", "8"))


def _ffn_fused_batched(x, w_gateup: QTensor, w_down: QTensor,
                       T: int, lead, C: int):
    F2out, Cg = w_gateup.shape
    Cd, F = w_down.shape
    if Cg != C or Cd != C or F2out != 2 * F:
        return None
    if C % 256 or F % 256:
        return None

    def vmem_use(rtg, rtd):
        wb = (rtg * (C // 2 + 2 * (C // 64) * 2 + (C // 32) * 2)
              + rtd * (F // 2 + 2 * (F // 64) * 2 + (F // 32) * 2))
        scratch = T * 2 * F * 4 + 2 * T * (F // 2) * 2 + T * (F // 32) * 2
        xops = 2 * T * (C // 2) * 2 + T * (C // 32) * 2
        return 2 * wb + scratch + xops  # weights double-buffered

    rtg = rtd = None
    for cg in (512, 256):
        for cd in (512, 256):
            if (2 * F) % cg == 0 and C % cd == 0 and \
                    vmem_use(cg, cd) <= _VMEM_BUDGET:
                rtg, rtd = cg, cd
                break
        if rtg is not None:
            break
    if rtg is None:
        return None
    x2 = x.reshape(T, C)
    if x2.dtype != jnp.bfloat16:
        x2 = x2.astype(jnp.bfloat16)
    gu_fields = tuple(w_gateup.data[n] for n in _FIELD_LISTS["q4_k"])
    dn_fields = tuple(w_down.data[n] for n in _FIELD_LISTS["q4_k"])
    y = _ffn_fused_call_2d(x2, gu_fields, dn_fields, C=C, F=F,
                           rtg=rtg, rtd=rtd, interpret=_use_interpret())
    return y.reshape(*lead, C)


def ffn_fused(x: jnp.ndarray, w_gateup: QTensor, w_down: QTensor):
    """SwiGLU FFN at T<=FUSED_MAX_T through the megakernel (T=1: row-math
    phases; T>1: 2-D scale-expansion phases); None if not covered."""
    if not (_enabled() and _pallas_enabled()):
        return None
    if not (isinstance(w_gateup, QTensor) and isinstance(w_down, QTensor)):
        return None  # LayerRef (scan stacked path) — composed matvecs cover it
    if w_gateup.kind != "q4_k" or w_down.kind != "q4_k":
        return None
    if any(n not in w_gateup.data or n not in w_down.data
           for n in _MATVEC_FIELDS_Q4K + _FIELD_LISTS["q4_k"]):
        return None
    lead = x.shape[:-1]
    C = x.shape[-1]
    n_tok = 1
    for d in lead:
        n_tok *= d
    if n_tok > FUSED_MAX_T:
        return None
    if n_tok != 1:
        return _ffn_fused_batched(x, w_gateup, w_down, n_tok, lead, C)
    F2out, Cg = w_gateup.shape
    Cd, Fd = w_down.shape
    F = F2out // 2
    if Cg != C or Cd != C or Fd != F or F2out % 2:
        return None
    if C % 256 or F % 256:
        return None
    def vmem_use(rtg, rtd):
        # double-buffered weight tiles + prep scratch
        return (2 * (rtg * C // 2 + rtd * F // 2)  # qs tiles (u8), 2 buffers
                + 2 * 2 * 4 * (C // 64 * rtg + F // 64 * rtd) // 2  # scales
                + 2 * F * 4                        # gu_acc
                + 2 * (F // 64) * (F // 2) * 2     # Ml/Mh
                + 2 * (C // 64) * (C // 2) * 2 * 2)  # mlg/mhg (bf16, 2 bufs)

    rtg = rtd = None
    for cg in (512, 256):
        for cd in (512, 256):
            if (2 * F) % cg == 0 and C % cd == 0 and \
                    vmem_use(cg, cd) <= _VMEM_BUDGET:
                rtg, rtd = cg, cd
                break
        if rtg is not None:
            break
    if rtg is None:
        return None
    x2 = x.reshape(1, C)
    if x2.dtype != jnp.bfloat16:
        x2 = x2.astype(jnp.bfloat16)
    gu_fields = tuple(w_gateup.data[n] for n in _MATVEC_FIELDS_Q4K)
    dn_fields = tuple(w_down.data[n] for n in _MATVEC_FIELDS_Q4K)
    y = _ffn_fused_call(x2, gu_fields, dn_fields, C=C, F=F, rtg=rtg, rtd=rtd,
                        interpret=_use_interpret())
    return y.reshape(*lead, C)
