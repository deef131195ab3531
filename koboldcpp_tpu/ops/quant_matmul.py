"""Fused dequant+matmul Pallas kernels for packed QTensors.

TPU counterpart of ggml-cuda's mmq/mmvq and the CPU vec_dot paths
(/root/reference/ggml/src/ggml-cuda/mmq.cuh, mmvq.cu): weights stay packed in
HBM; each grid step DMAs a packed tile to VMEM, dequantizes on-chip and feeds
the MXU.

Kernel construction notes (this jaxlib's Mosaic):
- u8 bit ops must go through i32; no u8->bf16 casts; no rank>=4 reshapes or
  minor-dim interleaves in-kernel. The nibble planes therefore contract
  against PRE-SPLIT activations (xl/xh built by XLA outside the kernel), so
  no in-kernel shuffles are needed at all.
- per-32-column scales expand through an MXU dot with an iota-built 0/1
  expansion matrix (decode is HBM-bound; the extra MXU work is free).
- the Q4_K/Q5_K "min" term folds into a rank-G dot against per-group sums of
  x (the same trick as mmq's q8_1 bsums), so mins never get expanded.

`matmul_packed(x, qt)` returns None when no kernel covers (kind, shape);
callers fall back to the XLA dequant path in ops/linear.py.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .linear import QTensor

ROW_TILE = int(__import__("os").environ.get("KCPP_ROW_TILE", "256"))  # output-feature tile
# decode (T=1) matvec uses bigger weight tiles: fewer grid steps, and the
# magic-number kernel's VPU work is light enough that VMEM-resident tiles of
# 512 rows still pipeline (A/B: 391 -> 416 t/s; T>1 keeps 256 — 512 halves
# batched-8 throughput from VMEM pressure)
DECODE_ROW_TILE = int(__import__("os").environ.get("KCPP_DECODE_ROW_TILE", "512"))
T_TILE = 256    # token tile for prefill
# Largest batch the q4_k row kernel serves (T*GS masked-stack P-dots); above
# this the 2-D scale-expansion kernel takes over. In-situ decode-step A/B on
# v5e (TinyLlama shapes): row kernel wins 2.8x at T=1, ~1.5x at T=2, neutral
# at T=4, loses at T=8 (P-dot MACs scale with T while the 2-D kernel's
# per-tile structural cost is T-flat).
MATVEC_MAX_T = int(__import__("os").environ.get("KCPP_MATVEC_MAX_T", "4"))
# scoped-VMEM budget for tile selection: matches XLA's default 16 MiB scoped
# limit minus headroom.  Raise together with
# --xla_tpu_scoped_vmem_limit_kib (v5e has 128 MiB physical VMEM).
VMEM_BUDGET = int(float(__import__("os").environ.get(
    "KCPP_VMEM_BUDGET_MB", "13")) * 1024 * 1024)


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _mm_i8(kind: str, in_f: int = 1 << 20) -> bool:
    """int8-MXU decode variant gate for the q8_0/q6_k/q2_k/q3_k row matvecs
    (KCPP_MM_I8, default on after the round-3/4 on-TPU A/Bs — PERF_NOTES).
    Read in the non-jitted dispatch and passed as a static arg.  The k-quant
    trio needs in_f >= 512: their per-plane i8 scratch is (in_f//64,
    in_f//4) and Mosaic rejects < 8 sublanes (v5e)."""
    if kind not in ("q8_0", "q6_k", "q2_k", "q3_k"):
        return False
    if kind in ("q6_k", "q2_k", "q3_k") and in_f < 512:
        return False
    return os.environ.get("KCPP_MM_I8", "1") == "1"


def _pallas_enabled() -> bool:
    """On-TPU default comes from KCPP_PALLAS_MM (set after A/B benchmarks);
    the CPU interpreter exercises the kernels (tests) unless the env
    EXPLICITLY disables them (interpret mode at 70B widths is minutes per
    matmul — the multichip dryrun's 70B section opts out)."""
    if os.environ.get("KCPP_PALLAS_MM", "1") == "0":
        return False
    return True if jax.default_backend() == "cpu" \
        else os.environ.get("KCPP_PALLAS_MM", "1") == "1"


def _expand_mat(G: int, C: int, group: int) -> jnp.ndarray:
    """(G, C) 0/1 matrix with E[g, c] = (c // group == g), built from iota."""
    gidx = jax.lax.broadcasted_iota(jnp.int32, (G, C), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (G, C), 1) // group
    return (gidx == cidx).astype(jnp.bfloat16)


def _dot_t(x, w):  # x (T, K) . w (R, K) -> (T, R) f32
    return jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _sexp(s, E):
    """scale expansion on the MXU: s (R, G) @ E (G, C) -> bf16 (R, C)."""
    return jax.lax.dot_general(s, E, (((0 + 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def _q4k_kernel(xl_ref, xh_ref, xs_ref, qs_ref, slo_ref, shi_ref, m_ref, o_ref):
    """v2 (contiguous-plane) layout: byte b of superblock s holds logical
    cols 256s+b (lo) and 256s+128+b (hi); byte b's scale group is b//32 in
    plane-ordered scale_lo/scale_hi, so E is the same sequential expansion."""
    qs = qs_ref[:].astype(jnp.int32)
    C2 = qs.shape[1]
    lo = (qs & 0xF).astype(jnp.bfloat16)
    hi = (qs >> 4).astype(jnp.bfloat16)  # u8 source: high nibble needs no mask
    E = _expand_mat(C2 // 32, C2, 32)
    acc = _dot_t(xl_ref[:], lo * _sexp(slo_ref[:], E))
    acc += _dot_t(xh_ref[:], hi * _sexp(shi_ref[:], E))
    acc -= _dot_t(xs_ref[:], m_ref[:])
    o_ref[:] = acc.astype(o_ref.dtype)


def _rowk_combine(Pl, Ph, xsl, xsh, slo_t, shi_t, mlo_t, mhi_t,
                  mult: float, fold: float):
    """Shared row-kernel combine: y = mult * sum_g s_gr * P_tgr
    - fold * sum_g s_gr * xs_tg - sum_g m_gr * xs_tg (per plane lo/hi)."""
    slo = slo_t.astype(jnp.float32)  # (GS, R)
    shi = shi_t.astype(jnp.float32)
    GS = slo_t.shape[0]
    T = xsl.shape[0]
    if T == 1:
        t = jnp.sum(Pl * slo + Ph * shi, axis=0, keepdims=True)  # (1, R)
    else:
        slo_r = jnp.concatenate([slo] * T, axis=0)  # (T*GS, R) lane-aligned
        shi_r = jnp.concatenate([shi] * T, axis=0)
        prod = Pl * slo_r + Ph * shi_r
        t = prod.reshape(T, GS, prod.shape[1]).sum(axis=1)  # (T, R)
    t *= mult
    xslf = xsl.astype(jnp.float32)  # (T, GS)
    xshf = xsh.astype(jnp.float32)
    t -= fold * jax.lax.dot_general(
        xslf, slo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    t -= fold * jax.lax.dot_general(
        xshf, shi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    t -= jax.lax.dot_general(
        xslf, mlo_t.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    t -= jax.lax.dot_general(
        xshf, mhi_t.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return t


def _pdots(ml, mh, lo, hi):
    Pl = jax.lax.dot_general(ml, lo, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (T*GS, R)
    Ph = jax.lax.dot_general(mh, hi, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return Pl, Ph


def _q4k_row_math(ml, mh, xsl, xsh, q, slo_t, shi_t, mlo_t, mhi_t):
    """T<=8 q4_k matvec math producing a ROW (T, R) output: magic-number
    dequant (bit-OR nibbles into bf16 mantissas, value = 128 + 8n — no
    int->float converts, no per-weight scale muls) + per-group partial dots
    against the activation-masked expansion stacks Ml/Mh (T*GS, C2); scales
    and mins arrive lane-transposed (GS, R) so every combine is an MXU dot or
    an elementwise op — no in-kernel transposes anywhere.

      y_tr = sum_g s_gr/8 * (P_tgr - 128*xsl_tg) - sum_g m_gr * xs_tg
    with P_tgr = sum_{c in g} magic(q_rc) * x_tc.

    The P-dot MACs scale with T*GS rows, so this is the decode path (T small);
    prefill keeps the scale-expansion 2-D kernel.
    """
    lo = jax.lax.bitcast_convert_type(
        (((q & 0xF) << 3) | 0x4300).astype(jnp.uint16), jnp.bfloat16)
    hi = jax.lax.bitcast_convert_type(
        (((q >> 1) & 0x78) | 0x4300).astype(jnp.uint16), jnp.bfloat16)
    Pl, Ph = _pdots(ml, mh, lo, hi)
    return _rowk_combine(Pl, Ph, xsl, xsh, slo_t, shi_t, mlo_t, mhi_t,
                         mult=0.125, fold=16.0)


def _q5k_row_math(ml, mh, xsl, xsh, q, hb, slo_t, shi_t, mlo_t, mhi_t):
    """Q5_K analog of _q4k_row_math: the 5th bit ORs in from the hb sidecar
    (bit 0 = lo-plane col, bit 1 = hi-plane col, elementwise-aligned with
    qs2), magic value = 128 + 4*q5, so mult=0.25 and the affine fold is 32."""
    lo = jax.lax.bitcast_convert_type(
        ((((q & 0xF) << 2) | ((hb & 1) << 6)) | 0x4300).astype(jnp.uint16),
        jnp.bfloat16)
    hi = jax.lax.bitcast_convert_type(
        ((((q >> 2) & 0x3C) | (((hb >> 1) & 1) << 6)) | 0x4300)
        .astype(jnp.uint16), jnp.bfloat16)
    Pl, Ph = _pdots(ml, mh, lo, hi)
    return _rowk_combine(Pl, Ph, xsl, xsh, slo_t, shi_t, mlo_t, mhi_t,
                         mult=0.25, fold=32.0)


def _q4k_decode_kernel(ml_ref, mh_ref, xsl_ref, xsh_ref,
                       qs_ref, slo_ref, shi_ref, mlo_ref, mhi_ref, o_ref):
    t = _q4k_row_math(ml_ref[:], mh_ref[:], xsl_ref[:], xsh_ref[:],
                      qs_ref[:].astype(jnp.int32), slo_ref[:], shi_ref[:],
                      mlo_ref[:], mhi_ref[:])
    o_ref[:] = t.astype(o_ref.dtype)


def _q5k_decode_kernel(ml_ref, mh_ref, xsl_ref, xsh_ref,
                       qs_ref, hb_ref, slo_ref, shi_ref, mlo_ref, mhi_ref,
                       o_ref):
    t = _q5k_row_math(ml_ref[:], mh_ref[:], xsl_ref[:], xsh_ref[:],
                      qs_ref[:].astype(jnp.int32),
                      hb_ref[:].astype(jnp.int32), slo_ref[:], shi_ref[:],
                      mlo_ref[:], mhi_ref[:])
    o_ref[:] = t.astype(o_ref.dtype)


def _q4k_decode_kernel_raw(x_ref, qs_ref, slo_ref, shi_ref, mlo_ref, mhi_ref,
                           o_ref, ml_s, mh_s, xs_s):
    """T=1 variant taking RAW x: the plane split, group sums and masked
    expansion build in-kernel (v2 contiguous-plane layout makes them plain
    128-aligned reshapes/slices, legal in Mosaic) — saves the per-call XLA
    x-prep fusions, ~130 us/step of decode glue on a 22-layer model. The
    prep runs once (first row tile) into VMEM scratch and is reused by the
    remaining tiles."""
    @pl.when(pl.program_id(0) == 0)
    def _prep():
        x = x_ref[:]                      # (1, in_f) bf16
        in_f = x.shape[1]
        nsb = in_f // 256
        C2 = in_f // 2
        GS = in_f // 64
        x3 = x.reshape(nsb, 256)
        xl = x3[:, :128].reshape(1, C2)
        xh = x3[:, 128:].reshape(1, C2)
        E = _expand_mat(GS, C2, 32)
        ml_s[:] = E * xl
        mh_s[:] = E * xh
        # per-32-group sums as an MXU dot against E (contract over columns)
        xs_s[0:1] = jax.lax.dot_general(
            xl, E, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        xs_s[1:2] = jax.lax.dot_general(
            xh, E, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    t = _q4k_row_math(ml_s[:], mh_s[:], xs_s[0:1], xs_s[1:2],
                      qs_ref[:].astype(jnp.int32), slo_ref[:], shi_ref[:],
                      mlo_ref[:], mhi_ref[:])
    o_ref[:] = t.astype(o_ref.dtype)


def _i8_prep(x_ref, mli_s, mhi_s, sx_s, xs_s):
    """Shared prep for the int8 decode kernels (first row tile only):
    plane-split x, quantize each 32-group to int8 (q8_1-equivalent — the
    same activation quantization mmq feeds dp4a with, ggml-cuda/mmq.cuh),
    masked-expand into block-diagonal int8 M stacks, and keep EXACT f32
    group sums for the min terms."""
    x = x_ref[:]                      # (1, in_f) bf16
    in_f = x.shape[1]
    nsb = in_f // 256
    C2 = in_f // 2
    GS = in_f // 64
    x3 = x.reshape(nsb, 256)
    xl = x3[:, :128].reshape(1, C2)
    xh = x3[:, 128:].reshape(1, C2)
    E = _expand_mat(GS, C2, 32)
    # chunk the expansion over group rows: one-shot (GS, C2) f32 temps blow
    # scoped VMEM for wide layers (13B w_down in_f=13824: 2 x 6 MB temps ->
    # "exceeded scoped vmem limit"). Chunks must divide GS and stay 8-row
    # aligned (Mosaic sublane stores); fall back to one shot when no such
    # divisor exists (e.g. GS=172) — those sizes fit anyway.
    if GS * C2 * 8 <= 6 * 1024 * 1024:
        CH = GS
    else:
        CH = next((c for c in range(64, 7, -8) if GS % c == 0), GS)
    for c in range(GS // CH):
        r0 = c * CH
        Ec = jax.lax.slice(E, (r0, 0), (r0 + CH, C2))
        mlb = (Ec * xl).astype(jnp.float32)   # (CH, C2) block-diagonal
        mhb = (Ec * xh).astype(jnp.float32)
        al = jnp.maximum(jnp.max(jnp.abs(mlb), axis=1, keepdims=True), 1e-20)
        ah = jnp.maximum(jnp.max(jnp.abs(mhb), axis=1, keepdims=True), 1e-20)
        mli_s[r0:r0 + CH] = jnp.round(
            mlb * (127.0 / al)).astype(jnp.int32).astype(jnp.int8)
        mhi_s[r0:r0 + CH] = jnp.round(
            mhb * (127.0 / ah)).astype(jnp.int32).astype(jnp.int8)
        sx_s[r0:r0 + CH, 0:1] = al / 127.0
        sx_s[r0:r0 + CH, 1:2] = ah / 127.0
    # exact group sums (min terms stay activation-exact)
    xs_s[0:1] = jax.lax.dot_general(
        xl, E, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    xs_s[1:2] = jax.lax.dot_general(
        xh, E, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def _i8_combine(Pl, Ph, sx_s, xs_s, slo_ref, shi_ref, mlo_ref, mhi_ref):
    """y_r = sum_g sx_g*(s_gr*P_gr) - sum_g m_gr*xsum_g, both planes."""
    slo = slo_ref[:].astype(jnp.float32)   # (GS, R)
    shi = shi_ref[:].astype(jnp.float32)
    t = jnp.sum(Pl.astype(jnp.float32) * sx_s[:, 0:1] * slo
                + Ph.astype(jnp.float32) * sx_s[:, 1:2] * shi,
                axis=0, keepdims=True)     # (1, R)
    xsl = xs_s[0:1].astype(jnp.float32)    # (1, GS)
    xsh = xs_s[1:2].astype(jnp.float32)
    t -= jax.lax.dot_general(
        xsl, mlo_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    t -= jax.lax.dot_general(
        xsh, mhi_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return t


def _i8_pdots(mli, mhi, lo_i8, hi_i8):
    Pl = jax.lax.dot_general(mli, lo_i8, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)  # (GS, R)
    Ph = jax.lax.dot_general(mhi, hi_i8, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
    return Pl, Ph


def _q4k_decode_kernel_i8(x_ref, qs_ref, slo_ref, shi_ref, mlo_ref, mhi_ref,
                          o_ref, mli_s, mhi_s, sx_s, xs_s):
    """T=1 q4_k matvec on the int8 MXU path (mmq's actual trick,
    ggml-cuda/mmq.cuh:25-60): per-32-group int8 activations dot int8 nibble
    weights with i32 accumulation, scale products applied to the (GS, R)
    partials. The bf16 P-dot runs the MXU at 32/128 row occupancy and is
    the measured decode limiter; the i8 dot doubles contraction throughput
    per pass. Activation int8 noise matches llama.cpp's q8_1 serving."""
    @pl.when(pl.program_id(0) == 0)
    def _prep():
        _i8_prep(x_ref, mli_s, mhi_s, sx_s, xs_s)

    q = qs_ref[:].astype(jnp.int32)
    lo = (q & 0xF).astype(jnp.int8)
    hi = (q >> 4).astype(jnp.int8)
    Pl, Ph = _i8_pdots(mli_s[:], mhi_s[:], lo, hi)
    t = _i8_combine(Pl, Ph, sx_s, xs_s, slo_ref, shi_ref, mlo_ref, mhi_ref)
    o_ref[:] = t.astype(o_ref.dtype)


def _i8_prep_t(x_ref, mli_s, mhi_s, sx_s, xs_s, T: int):
    """T>1 generalization of _i8_prep: per-token block-diagonal int8
    expansion stacks (T*GS, C2) with per-(token, group) scales — the i8
    analog of the bf16 batched row kernel's masked stacks."""
    x = x_ref[:]                      # (T, in_f) bf16
    in_f = x.shape[1]
    nsb = in_f // 256
    C2 = in_f // 2
    GS = in_f // 64
    x3 = x.reshape(T * nsb, 256)
    xl = x3[:, :128].reshape(T, C2)
    xh = x3[:, 128:].reshape(T, C2)
    E = _expand_mat(GS, C2, 32)
    mlb = (E[None] * xl[:, None, :].astype(jnp.bfloat16)).reshape(
        T * GS, C2).astype(jnp.float32)
    mhb = (E[None] * xh[:, None, :].astype(jnp.bfloat16)).reshape(
        T * GS, C2).astype(jnp.float32)
    al = jnp.maximum(jnp.max(jnp.abs(mlb), axis=1, keepdims=True), 1e-20)
    ah = jnp.maximum(jnp.max(jnp.abs(mhb), axis=1, keepdims=True), 1e-20)
    mli_s[:] = jnp.round(mlb * (127.0 / al)).astype(jnp.int32).astype(jnp.int8)
    mhi_s[:] = jnp.round(mhb * (127.0 / ah)).astype(jnp.int32).astype(jnp.int8)
    sx_s[:, 0:1] = al / 127.0
    sx_s[:, 1:2] = ah / 127.0
    # exact (T, GS) group sums per plane for the min terms
    xs_s[0:T] = jax.lax.dot_general(
        xl, E, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    xs_s[T:] = jax.lax.dot_general(
        xh, E, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def _q4k_decode_kernel_i8_t(x_ref, qs_ref, slo_ref, shi_ref, mlo_ref,
                            mhi_ref, o_ref, mli_s, mhi_s, sx_s, xs_s, *,
                            T: int):
    """T<=8 q4_k matvec on the int8 MXU path: per-token int8 expansion
    stacks (the P-dot MACs grow with T like the bf16 batched kernel, but
    the i8 dot doubles contraction throughput per MXU pass)."""
    @pl.when(pl.program_id(0) == 0)
    def _prep():
        _i8_prep_t(x_ref, mli_s, mhi_s, sx_s, xs_s, T)

    q = qs_ref[:].astype(jnp.int32)
    lo = (q & 0xF).astype(jnp.int8)
    hi = (q >> 4).astype(jnp.int8)
    Pl, Ph = _i8_pdots(mli_s[:], mhi_s[:], lo, hi)  # (T*GS, R) i32
    GS = Pl.shape[0] // T
    R = Pl.shape[1]
    slo = slo_ref[:].astype(jnp.float32)            # (GS, R)
    shi = shi_ref[:].astype(jnp.float32)
    slo_r = jnp.concatenate([slo] * T, axis=0)      # (T*GS, R)
    shi_r = jnp.concatenate([shi] * T, axis=0)
    prod = (Pl.astype(jnp.float32) * sx_s[:, 0:1] * slo_r
            + Ph.astype(jnp.float32) * sx_s[:, 1:2] * shi_r)
    t = prod.reshape(T, GS, R).sum(axis=1)          # (T, R)
    xsl = xs_s[0:T].astype(jnp.float32)             # (T, GS)
    xsh = xs_s[T:].astype(jnp.float32)
    t -= jax.lax.dot_general(
        xsl, mlo_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    t -= jax.lax.dot_general(
        xsh, mhi_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = t.astype(o_ref.dtype)


def _q5k_decode_kernel_i8_t(x_ref, qs_ref, hb_ref, slo_ref, shi_ref,
                            mlo_ref, mhi_ref, o_ref, mli_s, mhi_s, sx_s,
                            xs_s, *, T: int):
    @pl.when(pl.program_id(0) == 0)
    def _prep():
        _i8_prep_t(x_ref, mli_s, mhi_s, sx_s, xs_s, T)

    q = qs_ref[:].astype(jnp.int32)
    hb = hb_ref[:].astype(jnp.int32)
    lo = ((q & 0xF) | ((hb & 1) << 4)).astype(jnp.int8)
    hi = ((q >> 4) | (((hb >> 1) & 1) << 4)).astype(jnp.int8)
    Pl, Ph = _i8_pdots(mli_s[:], mhi_s[:], lo, hi)
    GS = Pl.shape[0] // T
    R = Pl.shape[1]
    slo = slo_ref[:].astype(jnp.float32)
    shi = shi_ref[:].astype(jnp.float32)
    slo_r = jnp.concatenate([slo] * T, axis=0)
    shi_r = jnp.concatenate([shi] * T, axis=0)
    prod = (Pl.astype(jnp.float32) * sx_s[:, 0:1] * slo_r
            + Ph.astype(jnp.float32) * sx_s[:, 1:2] * shi_r)
    t = prod.reshape(T, GS, R).sum(axis=1)
    xsl = xs_s[0:T].astype(jnp.float32)
    xsh = xs_s[T:].astype(jnp.float32)
    t -= jax.lax.dot_general(
        xsl, mlo_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    t -= jax.lax.dot_general(
        xsh, mhi_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = t.astype(o_ref.dtype)


def _sbq_prep(x_ref, ml_s, mh_s, sx_s, xs_s, T: int):
    """SBQ activation prep (first row tile only): plane-split x, quantize each
    128-col plane segment (= one superblock's half) to int8, and build T-major
    block-diagonal stacks (T*nsb, C2) — 8x fewer M rows than the per-32-group
    stacks of _i8_prep_t, which is where the old batched kernel's GS x MAC
    waste lived.  The t-major repeat-interleave of token rows is done as a
    selection dot (Mosaic has no element-wise repeat); per-(t, sb) activation
    scales land in sx_s t-major, exact per-32 group sums in xs_s (min terms
    stay activation-exact)."""
    x = x_ref[:]                      # (T, in_f) bf16
    in_f = x.shape[1]
    nsb = in_f // 256
    C2 = in_f // 2
    GS = in_f // 64
    x3 = x.reshape(T * nsb, 256)
    xl = x3[:, :128].reshape(T, C2)
    xh = x3[:, 128:].reshape(T, C2)
    rows = T * nsb
    rr = jax.lax.broadcasted_iota(jnp.int32, (rows, T), 0) // nsb
    tt = jax.lax.broadcasted_iota(jnp.int32, (rows, T), 1)
    sel = (rr == tt).astype(jnp.bfloat16)           # (rows, T) 0/1
    cseg = jax.lax.broadcasted_iota(jnp.int32, (rows, C2), 1) // 128
    rsb = jax.lax.broadcasted_iota(jnp.int32, (rows, C2), 0) % nsb
    mask = cseg == rsb
    for xp, mi, col in ((xl, ml_s, 0), (xh, mh_s, 1)):
        seg = xp.reshape(rows, 128).astype(jnp.float32)
        a = jnp.maximum(jnp.max(jnp.abs(seg), axis=1, keepdims=True), 1e-20)
        qseg = jnp.round(seg * (127.0 / a))         # exact ints in [-127,127]
        qfull = qseg.reshape(T, C2).astype(jnp.bfloat16)  # <=127: bf16-exact
        rep = jax.lax.dot_general(sel, qfull, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        mi[:] = jnp.where(mask, rep, 0.0).astype(jnp.int32).astype(jnp.int8)
        sx_s[:, col:col + 1] = a / 127.0
    E = _expand_mat(GS, C2, 32)
    xs_s[0:T] = jax.lax.dot_general(
        xl, E, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    xs_s[T:] = jax.lax.dot_general(
        xh, E, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def _expand_mat_i8(G: int, C: int, group: int) -> jnp.ndarray:
    gidx = jax.lax.broadcasted_iota(jnp.int32, (G, C), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (G, C), 1) // group
    return (gidx == cidx).astype(jnp.int8)


def _sbq_combine(va, sx_s, xs_s, d_ref, mlo_ref, mhi_ref, T, nsb):
    """y_tr = sum_sb d_sbr * va_(t,sb)r - min-term group-sum dots."""
    dT = d_ref[:].astype(jnp.float32)               # (nsb, R)
    drep = jnp.concatenate([dT] * T, axis=0)        # (T*nsb, R) t-major
    comb = va * drep
    R = comb.shape[1]
    t = comb.reshape(T, nsb, R).sum(axis=1)         # (T, R)
    t -= jax.lax.dot_general(
        xs_s[0:T].astype(jnp.float32), mlo_ref[:].astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    t -= jax.lax.dot_general(
        xs_s[T:].astype(jnp.float32), mhi_ref[:].astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return t


def _q4k_decode_kernel_sbq(x_ref, qs_ref, scp_lo_ref, scp_hi_ref, d_ref,
                           mlo_ref, mhi_ref, o_ref, ml_s, mh_s, sx_s, xs_s,
                           *, T: int):
    """Batched (2<=T<=16) q4_k kernel with the SUPERBLOCK scale layout
    (VERDICT r3 item 1 — the mmq-style rework, ggml-cuda/mmq.cuh:9-60):
    q4_k's scale factors as d(f16/superblock) * sc(6-bit int/32-group), so the
    INTEGER sub-scale folds into the int8 weights in-kernel
    (sc = 8*sch + scl; sch*q, scl*q <= 105 both fit i8) and the contraction
    runs per 128-col plane segment — M stacks of T*nsb rows instead of
    T*in/64.  At T=8 that cuts the P-dot MAC waste 8x, turning the kernel
    from MXU-bound back to HBM-bound.  d and the per-segment activation
    scales apply on the small (T*nsb, R) partials; mins stay per-32
    group-sum dots (exact activations)."""
    @pl.when(pl.program_id(0) == 0)
    def _prep():
        _sbq_prep(x_ref, ml_s, mh_s, sx_s, xs_s, T)

    q = qs_ref[:].astype(jnp.int32)    # (R, C2)
    C2 = q.shape[1]
    GS = C2 // 32
    nsb = C2 // 128
    lo = q & 0xF
    hi = q >> 4
    Ei = _expand_mat_i8(GS, C2, 32)

    def sexp_i(scp_ref):
        """Raw 6-bit sc from the packed sidecar (tiny (R, GS) math), then
        per-32-column expansion as an i8 MXU dot -> (R, C2) i32."""
        sp = scp_ref[:].astype(jnp.int32)
        sc8 = (8 * (sp >> 4) + (sp & 15)).astype(jnp.int8)
        return jax.lax.dot_general(sc8, Ei, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def pdot(m_s, w):                  # (T*nsb, C2) i8 . (R, C2) i8 -> i32
        return jax.lax.dot_general(m_s[:], w, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    # single-mult product split: w = sc*q <= 945, and 16*(w>>4) + (w&15) == w
    # exactly, so the sc*q*xq sum is two i8 dots per plane — no per-weight
    # sch/scl splitting (the A/B that got gateup 65.5 -> 31.4 us/call).
    sexp_lo = sexp_i(scp_lo_ref)
    sexp_hi = sexp_i(scp_hi_ref)
    w_lo = sexp_lo * lo
    w_hi = sexp_hi * hi
    va = ((16 * pdot(ml_s, (w_lo >> 4).astype(jnp.int8))
           + pdot(ml_s, (w_lo & 15).astype(jnp.int8))).astype(jnp.float32)
          * sx_s[:, 0:1]
          + (16 * pdot(mh_s, (w_hi >> 4).astype(jnp.int8))
             + pdot(mh_s, (w_hi & 15).astype(jnp.int8))).astype(jnp.float32)
          * sx_s[:, 1:2])
    t = _sbq_combine(va, sx_s, xs_s, d_ref, mlo_ref, mhi_ref, T, nsb)
    o_ref[:] = t.astype(o_ref.dtype)


def _q5k_decode_kernel_sbq(x_ref, qs_ref, hb_ref, scp_lo_ref, scp_hi_ref,
                           d_ref, mlo_ref, mhi_ref, o_ref, ml_s, mh_s, sx_s,
                           xs_s, *, T: int):
    """Q5_K SBQ: q5 = q4 + 16h <= 31, w = sc*q5 <= 1953, product-nibble
    split w = 16*(w>>4) + (w&15) with w>>4 <= 122 — same two i8 dots per
    plane as q4_k, just a wider product."""
    @pl.when(pl.program_id(0) == 0)
    def _prep():
        _sbq_prep(x_ref, ml_s, mh_s, sx_s, xs_s, T)

    q = qs_ref[:].astype(jnp.int32)
    hb = hb_ref[:].astype(jnp.int32)
    C2 = q.shape[1]
    GS = C2 // 32
    nsb = C2 // 128
    q5_lo = (q & 0xF) | ((hb & 1) << 4)
    q5_hi = (q >> 4) | (((hb >> 1) & 1) << 4)
    Ei = _expand_mat_i8(GS, C2, 32)

    def sexp_i(scp_ref):
        sp = scp_ref[:].astype(jnp.int32)
        sc8 = (8 * (sp >> 4) + (sp & 15)).astype(jnp.int8)
        return jax.lax.dot_general(sc8, Ei, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def pdot(m_s, w):
        return jax.lax.dot_general(m_s[:], w, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    w_lo = sexp_i(scp_lo_ref) * q5_lo
    w_hi = sexp_i(scp_hi_ref) * q5_hi
    va = ((16 * pdot(ml_s, (w_lo >> 4).astype(jnp.int8))
           + pdot(ml_s, (w_lo & 15).astype(jnp.int8))).astype(jnp.float32)
          * sx_s[:, 0:1]
          + (16 * pdot(mh_s, (w_hi >> 4).astype(jnp.int8))
             + pdot(mh_s, (w_hi & 15).astype(jnp.int8))).astype(jnp.float32)
          * sx_s[:, 1:2])
    t = _sbq_combine(va, sx_s, xs_s, d_ref, mlo_ref, mhi_ref, T, nsb)
    o_ref[:] = t.astype(o_ref.dtype)


def _q5k_decode_kernel_i8(x_ref, qs_ref, hb_ref, slo_ref, shi_ref,
                          mlo_ref, mhi_ref, o_ref, mli_s, mhi_s, sx_s, xs_s):
    """Q5_K int8 decode: 5th bit ORs in from the hb sidecar (q5 in 0..31
    fits int8)."""
    @pl.when(pl.program_id(0) == 0)
    def _prep():
        _i8_prep(x_ref, mli_s, mhi_s, sx_s, xs_s)

    q = qs_ref[:].astype(jnp.int32)
    hb = hb_ref[:].astype(jnp.int32)
    lo = ((q & 0xF) | ((hb & 1) << 4)).astype(jnp.int8)
    hi = ((q >> 4) | (((hb >> 1) & 1) << 4)).astype(jnp.int8)
    Pl, Ph = _i8_pdots(mli_s[:], mhi_s[:], lo, hi)
    t = _i8_combine(Pl, Ph, sx_s, xs_s, slo_ref, shi_ref, mlo_ref, mhi_ref)
    o_ref[:] = t.astype(o_ref.dtype)


def _q4k_magic_kernel(xl_ref, xh_ref, xsl_ref, xsh_ref, xs_ref,
                      qs_ref, slo_ref, shi_ref, m_ref, o_ref):
    """Magic-number 2-D Q4_K variant (KCPP_Q4K_2D=magic): w = s*n decomposed
    as 0.125*s*(128+8n) - 16*s so the per-weight work is bit-ops + one mul
    (no int->float converts); the -16*s and min terms fold into rank-G dots
    against plane group sums. In-situ A/B decides vs _q4k_kernel."""
    qs = qs_ref[:].astype(jnp.int32)
    C2 = qs.shape[1]
    lo = jax.lax.bitcast_convert_type(
        (((qs & 0xF) << 3) | 0x4300).astype(jnp.uint16), jnp.bfloat16)
    hi = jax.lax.bitcast_convert_type(
        (((qs >> 1) & 0x78) | 0x4300).astype(jnp.uint16), jnp.bfloat16)
    E = _expand_mat(C2 // 32, C2, 32)
    acc = _dot_t(xl_ref[:], lo * _sexp(slo_ref[:], E))
    acc += _dot_t(xh_ref[:], hi * _sexp(shi_ref[:], E))
    acc *= 0.125
    acc -= 16.0 * _dot_t(xsl_ref[:], slo_ref[:].astype(jnp.float32))
    acc -= 16.0 * _dot_t(xsh_ref[:], shi_ref[:].astype(jnp.float32))
    acc -= _dot_t(xs_ref[:], m_ref[:])
    o_ref[:] = acc.astype(o_ref.dtype)


def _q5k_kernel(xl_ref, xh_ref, xs_ref, qs_ref, hb_ref,
                slo_ref, shi_ref, m_ref, o_ref):
    """2-D Q5_K: v2 contiguous-plane nibbles + hb 5th-bit sidecar (same
    elementwise alignment), scale expansion on the MXU like _q4k_kernel."""
    qs = qs_ref[:].astype(jnp.int32)
    hb = hb_ref[:].astype(jnp.int32)
    C2 = qs.shape[1]
    lo = ((qs & 0xF) | ((hb & 1) << 4)).astype(jnp.bfloat16)
    hi = ((qs >> 4) | ((hb >> 1) & 1) << 4).astype(jnp.bfloat16)
    E = _expand_mat(C2 // 32, C2, 32)
    acc = _dot_t(xl_ref[:], lo * _sexp(slo_ref[:], E))
    acc += _dot_t(xh_ref[:], hi * _sexp(shi_ref[:], E))
    acc -= _dot_t(xs_ref[:], m_ref[:])
    o_ref[:] = acc.astype(o_ref.dtype)


def _q6k_decode_kernel(x0_ref, x1_ref, x2_ref, x3_ref, xs_ref,
                       ql_ref, qh_ref, s_ref, o_ref):
    """T=1 Q6_K matvec: magic bf16 values (128 + 2*q6), group-dot scale
    combine per plane; s*(q6-32) = (s/2)*v - 96*s with the constant folded
    into the plane-major group-sum dot (same scheme as _q4k_decode_kernel)."""
    ql = ql_ref[:].astype(jnp.int32)
    qh = qh_ref[:].astype(jnp.int32)
    C2 = ql.shape[1]
    C4 = C2 // 2
    qlA, qlB = ql[:, :C4], ql[:, C4:]

    def magic(nib_sh1, hi2_sh5):
        return jax.lax.bitcast_convert_type(
            (nib_sh1 | hi2_sh5 | 0x4300).astype(jnp.uint16), jnp.bfloat16)

    p0 = magic((qlA << 1) & 0x1E, (qh & 3) << 5)
    p1 = magic((qlB << 1) & 0x1E, ((qh >> 2) & 3) << 5)
    p2 = magic((qlA >> 3) & 0x1E, ((qh >> 4) & 3) << 5)
    p3 = magic((qlB >> 3) & 0x1E, ((qh >> 6) & 3) << 5)
    GS = C4 // 16
    E = _expand_mat(GS, C4, 16)
    s = s_ref[:].astype(jnp.float32)  # (R, in/16) plane-major
    n = s.shape[1] // 4
    t = jnp.zeros((ql.shape[0], 1), jnp.float32)
    for i, (p, xp) in enumerate(((p0, x0_ref), (p1, x1_ref),
                                 (p2, x2_ref), (p3, x3_ref))):
        M = E * xp[0][None, :].astype(jnp.bfloat16)
        P = jax.lax.dot_general(p, M, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        t += jnp.sum(P * s[:, i * n:(i + 1) * n], axis=1, keepdims=True)
    t *= 0.5
    t -= 96.0 * jax.lax.dot_general(
        s, xs_ref[:].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = t.astype(o_ref.dtype)


def _q8_0_decode_kernel(x_ref, q_ref, s_ref, o_ref):
    """T=1 Q8_0 matvec: i8 -> bf16 cast + group-dot scale combine (no
    per-weight scale muls, no expansion intermediates)."""
    q = q_ref[:].astype(jnp.bfloat16)  # (R, C)
    C = q.shape[1]
    GS = C // 32
    E = _expand_mat(GS, C, 32)
    M = E * x_ref[0][None, :].astype(jnp.bfloat16)
    P = jax.lax.dot_general(q, M, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (R, GS)
    t = jnp.sum(P * s_ref[:].astype(jnp.float32), axis=1, keepdims=True)
    o_ref[:] = t.astype(o_ref.dtype)


def _q8_0_row_kernel_i8(x_ref, q_ref, st_ref, o_ref, mi_s, sx_s):
    """T=1 Q8_0 matvec on the int8 MXU path: the weights are ALREADY int8,
    so this is a pure relayout of the q4_k i8 trick (mmq/mmvq q8_0 path,
    ggml-cuda/mmvq.cu) — per-32-group int8 activation quantization in-kernel,
    i8xi8->i32 P-dot (double contraction throughput per MXU pass vs the
    bf16-cast kernel), scale products on the (GS, R) partials."""
    @pl.when(pl.program_id(0) == 0)
    def _prep():
        x = x_ref[:]                      # (1, C) bf16
        C = x.shape[1]
        GS = C // 32
        E = _expand_mat(GS, C, 32)
        mb = (E * x).astype(jnp.float32)  # (GS, C) block-diagonal
        a = jnp.maximum(jnp.max(jnp.abs(mb), axis=1, keepdims=True), 1e-20)
        mi_s[:] = jnp.round(mb * (127.0 / a)).astype(jnp.int32).astype(jnp.int8)
        sx_s[:] = a / 127.0

    q = q_ref[:]                          # (R, C) int8
    P = jax.lax.dot_general(mi_s[:], q, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)  # (GS, R)
    t = jnp.sum(P.astype(jnp.float32) * sx_s[:]
                * st_ref[:].astype(jnp.float32), axis=0, keepdims=True)
    o_ref[:] = t.astype(o_ref.dtype)


def _q6k_row_kernel_i8(x0_ref, x1_ref, x2_ref, x3_ref, xs_ref,
                       ql_ref, qh_ref, st_ref, o_ref,
                       m0_s, m1_s, m2_s, m3_s, sx_s):
    """T=1 Q6_K matvec on the int8 MXU path: 6-bit plane values expand to
    int8 (nibble | 2-bit high, 0..63 fits i8 — ggml's vec_dot_q6_K does the
    same expansion before dp4a), activations quantize per-16-group to int8
    per plane, i32 P-dots, and the -32 offset folds into an EXACT f32
    group-sum dot so only the product term carries activation-quant noise."""
    @pl.when(pl.program_id(0) == 0)
    def _prep():
        C4 = x0_ref.shape[1]
        GS = C4 // 16
        E = _expand_mat(GS, C4, 16)
        for xp, mi, col in ((x0_ref, m0_s, 0), (x1_ref, m1_s, 1),
                            (x2_ref, m2_s, 2), (x3_ref, m3_s, 3)):
            mb = (E * xp[:]).astype(jnp.float32)
            a = jnp.maximum(jnp.max(jnp.abs(mb), axis=1, keepdims=True), 1e-20)
            mi[:] = jnp.round(mb * (127.0 / a)).astype(jnp.int32).astype(jnp.int8)
            sx_s[:, col:col + 1] = a / 127.0

    ql = ql_ref[:].astype(jnp.int32)
    qh = qh_ref[:].astype(jnp.int32)
    C2 = ql.shape[1]
    C4 = C2 // 2
    qlA, qlB = ql[:, :C4], ql[:, C4:]
    p0 = ((qlA & 0xF) | ((qh & 3) << 4)).astype(jnp.int8)
    p1 = ((qlB & 0xF) | (((qh >> 2) & 3) << 4)).astype(jnp.int8)
    p2 = (((qlA >> 4) & 0xF) | (((qh >> 4) & 3) << 4)).astype(jnp.int8)
    p3 = (((qlB >> 4) & 0xF) | (((qh >> 6) & 3) << 4)).astype(jnp.int8)
    st = st_ref[:].astype(jnp.float32)  # (in/16, R) plane-major
    n = st.shape[0] // 4
    t = jnp.zeros((1, st.shape[1]), jnp.float32)
    for i, (p, mi) in enumerate(((p0, m0_s), (p1, m1_s),
                                 (p2, m2_s), (p3, m3_s))):
        P = jax.lax.dot_general(mi[:], p, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)  # (GS, R)
        t += jnp.sum(P.astype(jnp.float32) * sx_s[:, i:i + 1]
                     * st[i * n:(i + 1) * n], axis=0, keepdims=True)
    t -= 32.0 * jax.lax.dot_general(
        xs_ref[:].astype(jnp.float32), st, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = t.astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# native IQ layouts (pack_iq_native): 2-bit code planes + sign sidecars,
# decoded arithmetically — the grid alphabets are {8,25,43} (iq2),
# 2k+1 / 4+8k (iq3), {-1,0,1} (iq1).  Ref: ggml-common.h:336-419.
# ---------------------------------------------------------------------------

def _q2k_row_kernel_i8(x0_ref, x1_ref, x2_ref, x3_ref, xs_ref,
                       qs_ref, st_ref, mt_ref, o_ref,
                       m0_s, m1_s, m2_s, m3_s, sx_s):
    """T=1 Q2_K matvec on the int8 MXU path (the q6_k i8 port applied to the
    2-bit planes — VERDICT r3 item 9): plane values (qs>>2j)&3 are already
    i8-ready, activations quantize per-16-group per plane, and the min term
    stays an EXACT f32 group-sum dot."""
    @pl.when(pl.program_id(0) == 0)
    def _prep():
        _iq_i8_prep((x0_ref, x1_ref, x2_ref, x3_ref),
                    (m0_s, m1_s, m2_s, m3_s), sx_s, 16)

    qs = qs_ref[:].astype(jnp.int32)
    st = st_ref[:].astype(jnp.float32)  # (in/16, R) plane-major
    n = st.shape[0] // 4
    t = jnp.zeros((1, st.shape[1]), jnp.float32)
    for j, mi in enumerate((m0_s, m1_s, m2_s, m3_s)):
        p = ((qs >> (2 * j)) & 3).astype(jnp.int8)
        P = jax.lax.dot_general(mi[:], p, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        t += jnp.sum(P.astype(jnp.float32) * sx_s[:, j:j + 1]
                     * st[j * n:(j + 1) * n], axis=0, keepdims=True)
    t -= jax.lax.dot_general(
        xs_ref[:].astype(jnp.float32), mt_ref[:].astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[:] = t.astype(o_ref.dtype)


def _q3k_row_kernel_i8(x0_ref, x1_ref, x2_ref, x3_ref, xs_ref,
                       qs_ref, hm_ref, st_ref, o_ref,
                       m0_s, m1_s, m2_s, m3_s, sx_s):
    """T=1 Q3_K matvec on the int8 MXU path: 3-bit plane values (2-bit plane
    | hm third bit, 0..7 fits i8); the -4 offset folds into an exact
    group-sum dot like q6_k's -32."""
    @pl.when(pl.program_id(0) == 0)
    def _prep():
        _iq_i8_prep((x0_ref, x1_ref, x2_ref, x3_ref),
                    (m0_s, m1_s, m2_s, m3_s), sx_s, 16)

    qs = qs_ref[:].astype(jnp.int32)
    hm = hm_ref[:].astype(jnp.int32)
    st = st_ref[:].astype(jnp.float32)
    n = st.shape[0] // 4
    t = jnp.zeros((1, st.shape[1]), jnp.float32)
    for j, mi in enumerate((m0_s, m1_s, m2_s, m3_s)):
        p = (((qs >> (2 * j)) & 3)
             | (((hm >> j) & 1) << 2)).astype(jnp.int8)
        P = jax.lax.dot_general(mi[:], p, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        t += jnp.sum(P.astype(jnp.float32) * sx_s[:, j:j + 1]
                     * st[j * n:(j + 1) * n], axis=0, keepdims=True)
    t -= 4.0 * jax.lax.dot_general(
        xs_ref[:].astype(jnp.float32), st, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = t.astype(o_ref.dtype)


def _q6k_i8f_row_kernel(x_ref, q_ref, st_ref, o_ref, m_s, sx_s):
    """T=1 matvec over the EXPANDED q6_k layout (pack_q6_k_i8f: signed i8
    values q-32, natural element order): ONE full-width i8 MXU dot per row
    block — no plane extraction VPU work at all, which is what capped the
    dense 6-bit layout at ~0.66x q4_k effective GB/s (VERDICT r4 item 7).
    Activations quantize per-16-group to int8 (the same q8-class noise the
    reference's vec_dot_q6_K applies, ggml-quants.c)."""
    @pl.when(pl.program_id(0) == 0)
    def _prep():
        C = x_ref.shape[1]
        GS = C // 16
        E = _expand_mat(GS, C, 16)
        mb = (E * x_ref[:]).astype(jnp.float32)
        a = jnp.maximum(jnp.max(jnp.abs(mb), axis=1, keepdims=True), 1e-20)
        m_s[:] = jnp.round(mb * (127.0 / a)).astype(jnp.int32).astype(jnp.int8)
        sx_s[:] = a / 127.0

    P = jax.lax.dot_general(m_s[:], q_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)  # (GS, R)
    st = st_ref[:].astype(jnp.float32)                          # (in/16, R)
    t = jnp.sum(P.astype(jnp.float32) * sx_s[:] * st, axis=0,
                keepdims=True)
    o_ref[:] = t.astype(o_ref.dtype)


def _n4_prep(x0_ref, x1_ref, m0_s, m1_s, sx_s):
    """Quantize the two half activations per-16-group to int8."""
    C2 = x0_ref.shape[1]
    GS2 = C2 // 16
    E = _expand_mat(GS2, C2, 16)
    for col, (xp, mi) in enumerate(((x0_ref, m0_s), (x1_ref, m1_s))):
        mb = (E * xp[:]).astype(jnp.float32)
        a = jnp.maximum(jnp.max(jnp.abs(mb), axis=1, keepdims=True), 1e-20)
        mi[:] = jnp.round(mb * (127.0 / a)).astype(jnp.int32).astype(jnp.int8)
        sx_s[:, col:col + 1] = a / 127.0


def _n4_product(q_ref, st, m0_s, m1_s, sx_s):
    """Two half dots over plane-split nibbles: byte c = elem c | elem
    c+C/2 << 4, so lo/hi nibbles are the contiguous halves — 2 extraction
    ops for 2 values per byte (the dense 2-bit layout paid ~10 lane ops for
    4 values per byte)."""
    q = q_ref[:].astype(jnp.int32)               # (R, C2)
    GS2 = st.shape[0] // 2
    t = jnp.zeros((1, st.shape[1]), jnp.float32)
    for j, (nib, mi) in enumerate((((q & 0xF), m0_s), ((q >> 4), m1_s))):
        P = jax.lax.dot_general(mi[:], nib.astype(jnp.int8),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        t += jnp.sum(P.astype(jnp.float32) * sx_s[:, j:j + 1]
                     * st[j * GS2:(j + 1) * GS2], axis=0, keepdims=True)
    return t


def _q3k_n4_row_kernel(x0_ref, x1_ref, xs_ref, q_ref, st_ref, o_ref,
                       m0_s, m1_s, sx_s):
    """T=1 matvec over the nibble-repacked q3_k layout (pack_q3_k_n4:
    biased values 0..7); the -4 offset stays an EXACT f32 group-sum dot."""
    @pl.when(pl.program_id(0) == 0)
    def _prep():
        _n4_prep(x0_ref, x1_ref, m0_s, m1_s, sx_s)

    st = st_ref[:].astype(jnp.float32)
    t = _n4_product(q_ref, st, m0_s, m1_s, sx_s)
    t -= 4.0 * jax.lax.dot_general(
        xs_ref[:].astype(jnp.float32), st, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = t.astype(o_ref.dtype)


def _q2k_n4_row_kernel(x0_ref, x1_ref, xs_ref, q_ref, st_ref, mt_ref, o_ref,
                       m0_s, m1_s, sx_s):
    """T=1 matvec over the nibble-repacked q2_k layout (values 0..3, per-16
    min sidecar as an exact f32 dot)."""
    @pl.when(pl.program_id(0) == 0)
    def _prep():
        _n4_prep(x0_ref, x1_ref, m0_s, m1_s, sx_s)

    st = st_ref[:].astype(jnp.float32)
    t = _n4_product(q_ref, st, m0_s, m1_s, sx_s)
    t -= jax.lax.dot_general(
        xs_ref[:].astype(jnp.float32), mt_ref[:].astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[:] = t.astype(o_ref.dtype)


def _iq_i8_prep(xrefs, mrefs, sx_s, G: int):
    """Quantize the 4 plane activations per-G-group to int8 (q8_1-equivalent,
    same as _i8_prep / _q6k_row_kernel_i8 but parameterized group size)."""
    C4 = xrefs[0].shape[1]
    GS = C4 // G
    E = _expand_mat(GS, C4, G)
    for col, (xp, mi) in enumerate(zip(xrefs, mrefs)):
        mb = (E * xp[:]).astype(jnp.float32)
        a = jnp.maximum(jnp.max(jnp.abs(mb), axis=1, keepdims=True), 1e-20)
        mi[:] = jnp.round(mb * (127.0 / a)).astype(jnp.int32).astype(jnp.int8)
        sx_s[:, col:col + 1] = a / 127.0


def _iq2_vals(qs, j):
    """2-bit code -> unsigned alphabet value {8, 25, 43}."""
    c = (qs >> (2 * j)) & 3
    return 8 + 17 * c + (c >> 1)


def _iq2p_row_kernel_i8(x0_ref, x1_ref, x2_ref, x3_ref, qs_ref, sg_ref,
                        st_ref, o_ref, m0_s, m1_s, m2_s, m3_s, sx_s, *,
                        G: int):
    """T=1 iq2_* matvec: codes decode to {8,25,43} with shifts, signs apply
    as (1-2s) i32 multiplies, i8 MXU dots per plane.  The sign sidecar packs
    plane halves (bit j = lo half, bit 4+j = hi half), and groups never
    straddle the half boundary, so each plane runs as two half-dots — no
    in-kernel interleaving."""
    @pl.when(pl.program_id(0) == 0)
    def _prep():
        _iq_i8_prep((x0_ref, x1_ref, x2_ref, x3_ref),
                    (m0_s, m1_s, m2_s, m3_s), sx_s, G)

    qs = qs_ref[:].astype(jnp.int32)   # (R, C4)
    sg = sg_ref[:].astype(jnp.int32)   # (R, C8)
    C8 = qs.shape[1] // 2
    st = st_ref[:].astype(jnp.float32)  # (in/G, R) plane-major
    n = st.shape[0] // 4
    t = jnp.zeros((1, st.shape[1]), jnp.float32)
    for j, mi in enumerate((m0_s, m1_s, m2_s, m3_s)):
        v = _iq2_vals(qs, j)
        s_lo = (sg >> j) & 1
        s_hi = (sg >> (4 + j)) & 1
        v_lo = (v[:, :C8] * (1 - 2 * s_lo)).astype(jnp.int8)
        v_hi = (v[:, C8:] * (1 - 2 * s_hi)).astype(jnp.int8)
        m = mi[:]
        P = (jax.lax.dot_general(m[:, :C8], v_lo, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32)
             + jax.lax.dot_general(m[:, C8:], v_hi, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32))
        t += jnp.sum(P.astype(jnp.float32) * sx_s[:, j:j + 1]
                     * st[j * n:(j + 1) * n], axis=0, keepdims=True)
    o_ref[:] = t.astype(o_ref.dtype)


def _iq3_vals(qs, hs, j, xxs: bool):
    k = ((qs >> (2 * j)) & 3) | (((hs >> j) & 1) << 2)
    if xxs:
        return jnp.where(k == 7, 62, 4 + 8 * k)  # iq3_xxs alphabet
    return 2 * k + 1                             # iq3_s alphabet


def _iq3p_row_kernel_i8(x0_ref, x1_ref, x2_ref, x3_ref, qs_ref, hs_ref,
                        st_ref, o_ref, m0_s, m1_s, m2_s, m3_s, sx_s, *,
                        G: int, xxs: bool):
    """T=1 iq3_xxs/iq3_s matvec: 3-bit code = 2-bit plane + hs bit j;
    sign = hs bit 4+j (elementwise aligned — no half split needed)."""
    @pl.when(pl.program_id(0) == 0)
    def _prep():
        _iq_i8_prep((x0_ref, x1_ref, x2_ref, x3_ref),
                    (m0_s, m1_s, m2_s, m3_s), sx_s, G)

    qs = qs_ref[:].astype(jnp.int32)
    hs = hs_ref[:].astype(jnp.int32)
    st = st_ref[:].astype(jnp.float32)
    n = st.shape[0] // 4
    t = jnp.zeros((1, st.shape[1]), jnp.float32)
    for j, mi in enumerate((m0_s, m1_s, m2_s, m3_s)):
        v = _iq3_vals(qs, hs, j, xxs)
        s = (hs >> (4 + j)) & 1
        p = (v * (1 - 2 * s)).astype(jnp.int8)
        P = jax.lax.dot_general(mi[:], p, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        t += jnp.sum(P.astype(jnp.float32) * sx_s[:, j:j + 1]
                     * st[j * n:(j + 1) * n], axis=0, keepdims=True)
    o_ref[:] = t.astype(o_ref.dtype)


def _iq1p_row_kernel_i8(x0_ref, x1_ref, x2_ref, x3_ref, xs_ref, qs_ref,
                        st_ref, mt_ref, o_ref, m0_s, m1_s, m2_s, m3_s, sx_s,
                        *, G: int):
    """T=1 iq1_s/iq1_m matvec: 2-bit code -> {-1,0,1} directly; the per-group
    IQ1 delta folds into min_pt = -(s*delta) via an EXACT f32 group-sum dot
    (the q4_k min-term machinery), so only the product term carries
    activation-quant noise."""
    @pl.when(pl.program_id(0) == 0)
    def _prep():
        _iq_i8_prep((x0_ref, x1_ref, x2_ref, x3_ref),
                    (m0_s, m1_s, m2_s, m3_s), sx_s, G)

    qs = qs_ref[:].astype(jnp.int32)
    st = st_ref[:].astype(jnp.float32)
    n = st.shape[0] // 4
    t = jnp.zeros((1, st.shape[1]), jnp.float32)
    for j, mi in enumerate((m0_s, m1_s, m2_s, m3_s)):
        p = (((qs >> (2 * j)) & 3) - 1).astype(jnp.int8)
        P = jax.lax.dot_general(mi[:], p, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        t += jnp.sum(P.astype(jnp.float32) * sx_s[:, j:j + 1]
                     * st[j * n:(j + 1) * n], axis=0, keepdims=True)
    t -= jax.lax.dot_general(
        xs_ref[:].astype(jnp.float32), mt_ref[:].astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[:] = t.astype(o_ref.dtype)


def _iq2p_kernel(x0_ref, x1_ref, x2_ref, x3_ref, qs_ref, sg_ref, s_ref,
                 o_ref, *, G: int):
    """2-D (prefill) iq2 kernel: bf16 values * MXU scale expansion, per
    plane halves (sign sidecar packs halves)."""
    qs = qs_ref[:].astype(jnp.int32)
    sg = sg_ref[:].astype(jnp.int32)
    C4 = qs.shape[1]
    C8 = C4 // 2
    n = C4 // G
    E = _expand_mat(n, C4, G)
    s = s_ref[:]  # (R, in/G) bf16 plane-major
    acc = jnp.zeros((x0_ref.shape[0], qs.shape[0]), jnp.float32)
    for j, xp in enumerate((x0_ref, x1_ref, x2_ref, x3_ref)):
        v = _iq2_vals(qs, j)
        s_lo = (sg >> j) & 1
        s_hi = (sg >> (4 + j)) & 1
        v_lo = (v[:, :C8] * (1 - 2 * s_lo)).astype(jnp.bfloat16)
        v_hi = (v[:, C8:] * (1 - 2 * s_hi)).astype(jnp.bfloat16)
        se = _sexp(s[:, j * n:(j + 1) * n], E)  # (R, C4)
        acc += _dot_t(xp[:][:, :C8], v_lo * se[:, :C8])
        acc += _dot_t(xp[:][:, C8:], v_hi * se[:, C8:])
    o_ref[:] = acc.astype(o_ref.dtype)


def _iq3p_kernel(x0_ref, x1_ref, x2_ref, x3_ref, qs_ref, hs_ref, s_ref,
                 o_ref, *, G: int, xxs: bool):
    qs = qs_ref[:].astype(jnp.int32)
    hs = hs_ref[:].astype(jnp.int32)
    C4 = qs.shape[1]
    n = C4 // G
    E = _expand_mat(n, C4, G)
    s = s_ref[:]
    acc = jnp.zeros((x0_ref.shape[0], qs.shape[0]), jnp.float32)
    for j, xp in enumerate((x0_ref, x1_ref, x2_ref, x3_ref)):
        v = _iq3_vals(qs, hs, j, xxs)
        sgn = (hs >> (4 + j)) & 1
        p = (v * (1 - 2 * sgn)).astype(jnp.bfloat16)
        acc += _dot_t(xp[:], p * _sexp(s[:, j * n:(j + 1) * n], E))
    o_ref[:] = acc.astype(o_ref.dtype)


def _iq1p_kernel(x0_ref, x1_ref, x2_ref, x3_ref, xs_ref, qs_ref, s_ref,
                 m_ref, o_ref, *, G: int):
    qs = qs_ref[:].astype(jnp.int32)
    C4 = qs.shape[1]
    n = C4 // G
    E = _expand_mat(n, C4, G)
    s = s_ref[:]
    acc = jnp.zeros((x0_ref.shape[0], qs.shape[0]), jnp.float32)
    for j, xp in enumerate((x0_ref, x1_ref, x2_ref, x3_ref)):
        p = (((qs >> (2 * j)) & 3) - 1).astype(jnp.bfloat16)
        acc += _dot_t(xp[:], p * _sexp(s[:, j * n:(j + 1) * n], E))
    acc -= _dot_t(xs_ref[:], m_ref[:])
    o_ref[:] = acc.astype(o_ref.dtype)


def _q8_0_row_kernel(x_ref, q_ref, st_ref, o_ref):
    """Row-output (1, R) Q8_0 matvec: P-dot against the activation-masked
    expansion stack + lane-transposed scales (GS, R) — no in-kernel
    transposes, no (R, T)-oriented combines (the column-output orientation
    capped streaming at ~330 GB/s; see PERF_NOTES round 1)."""
    q = q_ref[:].astype(jnp.bfloat16)  # (R, C)
    C = q.shape[1]
    GS = C // 32
    E = _expand_mat(GS, C, 32)
    M = E * x_ref[0][None, :].astype(jnp.bfloat16)       # (GS, C)
    P = jax.lax.dot_general(M, q, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (GS, R)
    t = jnp.sum(P * st_ref[:].astype(jnp.float32), axis=0, keepdims=True)
    o_ref[:] = t.astype(o_ref.dtype)


def _q6k_row_kernel(x0_ref, x1_ref, x2_ref, x3_ref, xs_ref,
                    ql_ref, qh_ref, st_ref, o_ref):
    """Row-output (1, R) Q6_K matvec: magic bf16 plane decode (value =
    128 + 2*q6) + per-plane P-dots against masked 16-group stacks, scales
    lane-transposed (in/16, R) plane-major; s*(q6-32) = (s/2)*v - 96*s with
    the constant folded into a group-sum dot."""
    ql = ql_ref[:].astype(jnp.int32)
    qh = qh_ref[:].astype(jnp.int32)
    C2 = ql.shape[1]
    C4 = C2 // 2
    qlA, qlB = ql[:, :C4], ql[:, C4:]

    def magic(nib_sh1, hi2_sh5):
        return jax.lax.bitcast_convert_type(
            (nib_sh1 | hi2_sh5 | 0x4300).astype(jnp.uint16), jnp.bfloat16)

    p0 = magic((qlA << 1) & 0x1E, (qh & 3) << 5)
    p1 = magic((qlB << 1) & 0x1E, ((qh >> 2) & 3) << 5)
    p2 = magic((qlA >> 3) & 0x1E, ((qh >> 4) & 3) << 5)
    p3 = magic((qlB >> 3) & 0x1E, ((qh >> 6) & 3) << 5)
    GS = C4 // 16
    E = _expand_mat(GS, C4, 16)
    st = st_ref[:].astype(jnp.float32)  # (in/16, R) plane-major
    n = st.shape[0] // 4
    t = jnp.zeros((1, st.shape[1]), jnp.float32)
    for i, (p, xp) in enumerate(((p0, x0_ref), (p1, x1_ref),
                                 (p2, x2_ref), (p3, x3_ref))):
        M = E * xp[0][None, :].astype(jnp.bfloat16)      # (GS, C4)
        P = jax.lax.dot_general(M, p, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (GS, R)
        t += jnp.sum(P * st[i * n:(i + 1) * n], axis=0, keepdims=True)
    t *= 0.5
    t -= 96.0 * jax.lax.dot_general(
        xs_ref[:].astype(jnp.float32), st, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = t.astype(o_ref.dtype)


def _q6k_kernel(x0_ref, x1_ref, x2_ref, x3_ref, xs_ref,
                ql_ref, qh_ref, s_ref, o_ref):
    """Q6_K via 4 constant-shift bit planes; value = s * (q6 - 32), with the
    -32 folded into a dot against per-16-group sums of x (xs)."""
    ql = ql_ref[:].astype(jnp.int32)   # (R, C/2): [plane-pair A | plane-pair B]
    qh = qh_ref[:].astype(jnp.int32)   # (R, C/4): 2-bit quads, planes 0-3
    C2 = ql.shape[1]
    C4 = C2 // 2
    qlA, qlB = ql[:, :C4], ql[:, C4:]

    def bf(v):
        return v.astype(jnp.bfloat16)

    p0 = bf((qlA & 0xF) | ((qh & 3) << 4))
    p1 = bf((qlB & 0xF) | (((qh >> 2) & 3) << 4))
    p2 = bf(((qlA >> 4) & 0xF) | (((qh >> 4) & 3) << 4))
    p3 = bf(((qlB >> 4) & 0xF) | (((qh >> 6) & 3) << 4))
    E = _expand_mat(C4 // 16, C4, 16)
    s = s_ref[:]  # (R, C/16) bf16, plane-major [s0|s1|s2|s3]
    n = s.shape[1] // 4
    acc = _dot_t(x0_ref[:], p0 * _sexp(s[:, :n], E))
    acc += _dot_t(x1_ref[:], p1 * _sexp(s[:, n:2 * n], E))
    acc += _dot_t(x2_ref[:], p2 * _sexp(s[:, 2 * n:3 * n], E))
    acc += _dot_t(x3_ref[:], p3 * _sexp(s[:, 3 * n:], E))
    acc -= 32.0 * _dot_t(xs_ref[:], s)
    o_ref[:] = acc.astype(o_ref.dtype)


def _q2k_kernel(x0_ref, x1_ref, x2_ref, x3_ref, xs_ref,
                qs_ref, s_ref, m_ref, o_ref):
    """2-D Q2_K: the raw qs stream is already plane-structured (byte 32h+l of
    a superblock = 2-bit planes j=0..3 of elements 128h+32j+l), so the four
    planes decode with constant shifts; w = s*q - m with s/m pre-decoded
    bf16 plane-major per 16-col sub-group (the min term folds into a dot
    against per-16 plane-major group sums xs)."""
    qs = qs_ref[:].astype(jnp.int32)   # (R, C/4)
    C4 = qs.shape[1]
    E = _expand_mat(C4 // 16, C4, 16)
    s = s_ref[:]  # (R, C/16) bf16, plane-major [s0|s1|s2|s3]
    n = s.shape[1] // 4
    acc = jnp.zeros((x0_ref.shape[0], qs.shape[0]), jnp.float32)
    for j, xp in enumerate((x0_ref, x1_ref, x2_ref, x3_ref)):
        p = ((qs >> (2 * j)) & 3).astype(jnp.bfloat16)
        acc += _dot_t(xp[:], p * _sexp(s[:, j * n:(j + 1) * n], E))
    acc -= _dot_t(xs_ref[:], m_ref[:])
    o_ref[:] = acc.astype(o_ref.dtype)


def _q3k_kernel(x0_ref, x1_ref, x2_ref, x3_ref, xs_ref,
                qs_ref, hm_ref, s_ref, o_ref):
    """2-D Q3_K: 2-bit planes from the raw qs stream + 3rd bit from the hm2
    sidecar (bit j of byte (2s+h, l) = element 128h+32j+l's high bit);
    w = s*(q3-4) with the -4 folded into a dot against plane-major group
    sums (s is the signed 6-bit sub-scale pre-multiplied by d)."""
    qs = qs_ref[:].astype(jnp.int32)
    hm = hm_ref[:].astype(jnp.int32)
    C4 = qs.shape[1]
    E = _expand_mat(C4 // 16, C4, 16)
    s = s_ref[:]  # (R, C/16) bf16, plane-major
    n = s.shape[1] // 4
    acc = jnp.zeros((x0_ref.shape[0], qs.shape[0]), jnp.float32)
    for j, xp in enumerate((x0_ref, x1_ref, x2_ref, x3_ref)):
        p = (((qs >> (2 * j)) & 3)
             | (((hm >> j) & 1) << 2)).astype(jnp.bfloat16)
        acc += _dot_t(xp[:], p * _sexp(s[:, j * n:(j + 1) * n], E))
    acc -= 4.0 * _dot_t(xs_ref[:], s.astype(jnp.float32))
    o_ref[:] = acc.astype(o_ref.dtype)


def _q2k_row_kernel(x0_ref, x1_ref, x2_ref, x3_ref, xs_ref,
                    qs_ref, st_ref, mt_ref, o_ref):
    """Row-output (1, R) Q2_K matvec: magic bf16 plane decode (value =
    128 + 32*q2) + per-plane P-dots against masked 16-group stacks; scales
    and mins lane-transposed (in/16, R) plane-major.  s*q = (s/32)*v - 4*s,
    the constant and the min term both fold into group-sum dots."""
    qs = qs_ref[:].astype(jnp.int32)
    C4 = qs.shape[1]
    GS = C4 // 16
    E = _expand_mat(GS, C4, 16)
    st = st_ref[:].astype(jnp.float32)  # (in/16, R) plane-major
    n = st.shape[0] // 4
    t = jnp.zeros((1, st.shape[1]), jnp.float32)
    for j, xp in enumerate((x0_ref, x1_ref, x2_ref, x3_ref)):
        p = jax.lax.bitcast_convert_type(
            ((((qs << 5) >> (2 * j)) & 0x60) | 0x4300).astype(jnp.uint16),
            jnp.bfloat16)
        M = E * xp[0][None, :].astype(jnp.bfloat16)      # (GS, C4)
        P = jax.lax.dot_general(M, p, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (GS, R)
        t += jnp.sum(P * st[j * n:(j + 1) * n], axis=0, keepdims=True)
    t *= 0.03125  # 1/32
    xs = xs_ref[:].astype(jnp.float32)  # (1, in/16) plane-major
    t -= 4.0 * jax.lax.dot_general(
        xs, st, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    t -= jax.lax.dot_general(
        xs, mt_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = t.astype(o_ref.dtype)


def _q3k_row_kernel(x0_ref, x1_ref, x2_ref, x3_ref, xs_ref,
                    qs_ref, hm_ref, st_ref, o_ref):
    """Row-output (1, R) Q3_K matvec: magic value = 128 + 16*q3 (2-bit plane
    OR'd with the hm2 third bit into the bf16 mantissa); s*(q3-4) =
    (s/16)*v - 12*s with the constant folded into a group-sum dot."""
    qs = qs_ref[:].astype(jnp.int32)
    hm = hm_ref[:].astype(jnp.int32)
    C4 = qs.shape[1]
    GS = C4 // 16
    E = _expand_mat(GS, C4, 16)
    st = st_ref[:].astype(jnp.float32)  # (in/16, R) plane-major
    n = st.shape[0] // 4
    t = jnp.zeros((1, st.shape[1]), jnp.float32)
    for j, xp in enumerate((x0_ref, x1_ref, x2_ref, x3_ref)):
        p = jax.lax.bitcast_convert_type(
            (((((qs << 4) >> (2 * j)) & 0x30) | (((hm >> j) & 1) << 6))
             | 0x4300).astype(jnp.uint16), jnp.bfloat16)
        M = E * xp[0][None, :].astype(jnp.bfloat16)
        P = jax.lax.dot_general(M, p, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        t += jnp.sum(P * st[j * n:(j + 1) * n], axis=0, keepdims=True)
    t *= 0.0625  # 1/16
    t -= 12.0 * jax.lax.dot_general(
        xs_ref[:].astype(jnp.float32), st, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = t.astype(o_ref.dtype)


def _q8_0_kernel(x_ref, q_ref, s_ref, o_ref):
    q = q_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
    C = q.shape[1]
    E = _expand_mat(C // 32, C, 32)
    acc = _dot_t(x_ref[:], q * _sexp(s_ref[:], E))
    o_ref[:] = acc.astype(o_ref.dtype)


def _q4k_i8_kernel(x_ref, xs_ref, q_ref, s_ref, m_ref, o_ref):
    """int8-relaid Q4_K: no nibble ops — cast + scale + dot, min term folded."""
    q = q_ref[:].astype(jnp.bfloat16)  # i8 -> bf16 direct (Mosaic-supported)
    C = q.shape[1]
    E = _expand_mat(C // 32, C, 32)
    acc = _dot_t(x_ref[:], q * _sexp(s_ref[:], E))
    acc -= _dot_t(xs_ref[:], m_ref[:])
    o_ref[:] = acc.astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# host-side prep (XLA ops: plane splits + group sums) and dispatch
# ---------------------------------------------------------------------------

def _plane_split2(x: jnp.ndarray, in_f: int):
    """x (T, C) -> (xl, xh) in v2 contiguous-plane order: byte b of
    superblock s pairs cols 256s+b (lo) and 256s+128+b (hi)."""
    T = x.shape[0]
    x3 = x.reshape(T, in_f // 256, 256)
    xl = x3[:, :, :128].reshape(T, in_f // 2)
    xh = x3[:, :, 128:].reshape(T, in_f // 2)
    return xl, xh


def _group_sums(x: jnp.ndarray, in_f: int, group: int):
    T = x.shape[0]
    return (x.astype(jnp.float32).reshape(T, in_f // group, group)
            .sum(-1).astype(jnp.bfloat16))


def _specs_x(t_tile, shapes):
    return [pl.BlockSpec((t_tile, s), lambda o, t: (t, 0),
                         memory_space=pltpu.VMEM) for s in shapes]


def _specs_w(shapes, rt: int = ROW_TILE):
    return [pl.BlockSpec((rt, s), lambda o, t: (o, 0),
                         memory_space=pltpu.VMEM) for s in shapes]


def _q4k_matvec_rt(kind: str, out_f: int, in_f: int, T: int, i8: bool,
                   raw: bool) -> int | None:
    """Row tile for the q4_k/q5_k matvec kernels, or None when no tile
    >= 128 lanes fits scoped VMEM (ultra-wide in_f, e.g. a 70B down-proj
    at 28672: the (GS, C2) scratch alone approaches the budget) — callers
    fall through to the 2-D kernel.  Big tiles pipeline better, but the
    double-buffered qs tile, the stacks/scratch AND the kernel's in-body
    unpack temps (~6*rt*C2 bytes) must fit scoped VMEM."""
    GS = in_f // 64
    C2 = in_f // 2
    n_qfields = 2 if kind == "q5_k" else 1  # qs2 (+ hb)
    scratch_b = (2 * T * GS * C2 if (i8 or raw)    # i8/bf16 plane stacks
                 else 2 * 2 * T * GS * C2 * 2)     # XLA-built bf16 stacks x2
    budget = VMEM_BUDGET - scratch_b
    for cand in (DECODE_ROW_TILE, ROW_TILE, 128):
        if (out_f % cand == 0
                and 2 * cand * (n_qfields * C2 + 8 * GS) + 6 * cand * C2
                <= budget):
            return cand
    return None


@functools.partial(jax.jit, static_argnames=("kind", "out_f", "in_f", "interpret",
                                             "i8", "raw"))
def _packed_matvec_q4k(x, fields: tuple, kind: str, out_f: int, in_f: int,
                       interpret: bool, i8: bool = False, raw: bool = False):
    """T<=8 q4_k/q5_k matvec through the row-output kernels.
    Returns (T, out_f).

    `i8`/`raw` are decided by the (non-jitted) dispatch layer `matmul_packed`
    from the KCPP_Q4K_I8 / KCPP_Q4K_RAW_X env flags and arrive as static args,
    so flipping the env between calls actually changes the compiled path
    instead of hitting the jit cache (round-2 advisor finding)."""
    T = x.shape[0]
    GS = in_f // 64
    C2 = in_f // 2
    if raw or i8:
        # kernel does its own plane split / group sums / masked expansion
        x_args = (x,)
        x_rows = (T,)
        x_shapes = (in_f,)
    else:
        xl, xh = _plane_split2(x, in_f)
        E = _expand_mat(GS, C2, 32)  # (GS, C2) 0/1
        # activation-masked expansion stacks: Ml[t*GS+g, c] = E[g,c]*xl[t,c]
        if T == 1:
            ml = E * xl.astype(jnp.bfloat16)
            mh = E * xh.astype(jnp.bfloat16)
        else:
            ml = (E[None] * xl.astype(jnp.bfloat16)[:, None, :]).reshape(
                T * GS, C2)
            mh = (E[None] * xh.astype(jnp.bfloat16)[:, None, :]).reshape(
                T * GS, C2)
        x_args = (ml, mh, _group_sums(xl, C2, 32), _group_sums(xh, C2, 32))
        x_rows = (T * GS, T * GS, T, T)
        x_shapes = (C2, C2, GS, GS)
    n_qfields = 2 if kind == "q5_k" else 1  # qs2 (+ hb)
    rt = _q4k_matvec_rt(kind, out_f, in_f, T, i8, raw)
    assert rt is not None  # dispatch checked feasibility
    scratch = []
    if i8 and T > 1:
        # T<=8 batched i8: per-token expansion stacks (T*GS rows) with
        # per-(token, plane) activation scales — the batched-8 serving path
        scratch = [pltpu.VMEM((T * GS, C2), jnp.int8),
                   pltpu.VMEM((T * GS, C2), jnp.int8),
                   pltpu.VMEM((T * GS, 2), jnp.float32),
                   pltpu.VMEM((2 * T, GS), jnp.bfloat16)]
        kernel = functools.partial(
            _q5k_decode_kernel_i8_t if kind == "q5_k"
            else _q4k_decode_kernel_i8_t, T=T)
    elif i8:
        scratch = [pltpu.VMEM((GS, C2), jnp.int8),
                   pltpu.VMEM((GS, C2), jnp.int8),
                   pltpu.VMEM((GS, 2), jnp.float32),
                   pltpu.VMEM((2, GS), jnp.bfloat16)]
        kernel = (_q5k_decode_kernel_i8 if kind == "q5_k"
                  else _q4k_decode_kernel_i8)
    elif raw:
        scratch = [pltpu.VMEM((GS, C2), jnp.bfloat16),
                   pltpu.VMEM((GS, C2), jnp.bfloat16),
                   pltpu.VMEM((2, GS), jnp.bfloat16)]
        kernel = _q4k_decode_kernel_raw
    elif kind == "q5_k":
        kernel = _q5k_decode_kernel
    else:
        kernel = _q4k_decode_kernel
    return pl.pallas_call(
        kernel,
        grid=(out_f // rt,),
        in_specs=[pl.BlockSpec((r, s), lambda o: (0, 0),
                               memory_space=pltpu.VMEM)
                  for r, s in zip(x_rows, x_shapes)]
        + [pl.BlockSpec((rt, C2), lambda o: (o, 0),
                        memory_space=pltpu.VMEM)] * n_qfields
        + [pl.BlockSpec((GS, rt), lambda o: (0, o),
                        memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((T, rt), lambda o: (0, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, out_f), x.dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * in_f * out_f,
            bytes_accessed=sum(f.nbytes for f in fields) + x.nbytes
            + T * out_f * 2,
            transcendentals=0),
        interpret=interpret,
    )(*x_args, *fields)


@functools.partial(jax.jit, static_argnames=("kind", "out_f", "in_f",
                                             "interpret"))
def _packed_matvec_q4k_sbq(x, fields: tuple, kind: str, out_f: int, in_f: int,
                           interpret: bool):
    """2<=T<=16 q4_k/q5_k batched matvec through the SBQ superblock-layout
    kernels (integer sub-scales folded into i8 weights; per-superblock
    contraction).  Returns (T, out_f)."""
    T = x.shape[0]
    nsb = in_f // 256
    C2 = in_f // 2
    GS = in_f // 64
    n_q = 2 if kind == "q5_k" else 1
    # VMEM model: the in-kernel i32 decode temps (pexp x2, nibbles x2, i8
    # weight planes) cost ~28 bytes per packed byte; pick the largest row
    # tile that keeps them + the double-buffered qs tile under scoped VMEM.
    rt = 64
    for cand in (512, 256, 128, 64):
        if out_f % cand == 0 and 30 * cand * C2 <= VMEM_BUDGET - 1024 * 1024:
            rt = cand
            break
    scratch = [pltpu.VMEM((T * nsb, C2), jnp.int8),
               pltpu.VMEM((T * nsb, C2), jnp.int8),
               pltpu.VMEM((T * nsb, 2), jnp.float32),
               pltpu.VMEM((2 * T, GS), jnp.bfloat16)]
    kernel = functools.partial(
        _q5k_decode_kernel_sbq if kind == "q5_k" else _q4k_decode_kernel_sbq,
        T=T)
    return pl.pallas_call(
        kernel,
        grid=(out_f // rt,),
        in_specs=[pl.BlockSpec((T, in_f), lambda o: (0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((rt, C2), lambda o: (o, 0),
                        memory_space=pltpu.VMEM)] * n_q
        + [pl.BlockSpec((rt, GS), lambda o: (o, 0),
                        memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((nsb, rt), lambda o: (0, o),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((GS, rt), lambda o: (0, o),
                        memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((T, rt), lambda o: (0, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, out_f), x.dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * in_f * out_f,
            bytes_accessed=sum(f.nbytes for f in fields) + x.nbytes
            + T * out_f * 2,
            transcendentals=0),
        interpret=interpret,
    )(x, *fields)


@functools.partial(jax.jit, static_argnames=("kind", "out_f", "in_f",
                                             "interpret", "i8", "group"))
def _packed_matvec(x, fields: tuple, kind: str, out_f: int, in_f: int,
                   interpret: bool, i8: bool = False, group: int = 0):
    """T=1 fast path through the row-output *_row_kernel variants for
    q6_k/q8_0/native-IQ (lane-transposed scale sidecars; same design as the
    q4_k decode kernel); returns (1, out_f).  `i8` (decided by the
    non-jitted dispatch from KCPP_MM_I8) selects the int8 MXU variants for
    q6_k/q8_0 — the mmvq-equivalent ports (VERDICT r2 item 3).  `group` is
    the static scale-group size for the IQ kinds."""
    T = x.shape[0]
    scratch = []
    if kind in _IQ_KINDS:
        G = group
        C4 = in_f // 4
        x4 = x.reshape(1, in_f // 128, 128)
        planes = [x4[:, :, i * 32:(i + 1) * 32].reshape(1, C4)
                  for i in range(4)]
        if kind == "iq1p":
            xs = jnp.concatenate(
                [_group_sums(p, C4, G) for p in planes], axis=1)
            x_args = (*planes, xs)
            x_rows = (1,) * 5
            x_shapes = (C4,) * 4 + (in_f // G,)
        else:
            x_args = tuple(planes)
            x_rows = (1,) * 4
            x_shapes = (C4,) * 4
        GS4 = C4 // G
        scratch = [pltpu.VMEM((GS4, C4), jnp.int8) for _ in range(4)] \
            + [pltpu.VMEM((GS4, 4), jnp.float32)]
        kernel = {
            "iq2p": functools.partial(_iq2p_row_kernel_i8, G=G),
            "iq3px": functools.partial(_iq3p_row_kernel_i8, G=G, xxs=True),
            "iq3ps": functools.partial(_iq3p_row_kernel_i8, G=G, xxs=False),
            "iq1p": functools.partial(_iq1p_row_kernel_i8, G=G),
        }[kind]
        st_rows = in_f // G
    elif kind in ("q6_k", "q2_k", "q3_k"):
        x4 = x.reshape(1, in_f // 128, 128)
        planes = [x4[:, :, i * 32:(i + 1) * 32].reshape(1, in_f // 4)
                  for i in range(4)]
        xs = jnp.concatenate(
            [_group_sums(p, in_f // 4, 16) for p in planes], axis=1)
        x_args = (*planes, xs)
        x_rows = (1,) * 5
        x_shapes = (in_f // 4,) * 4 + (in_f // 16,)
        if i8 and kind in ("q6_k", "q2_k", "q3_k"):
            kernel = {"q6_k": _q6k_row_kernel_i8, "q2_k": _q2k_row_kernel_i8,
                      "q3_k": _q3k_row_kernel_i8}[kind]
            C4, GS4 = in_f // 4, in_f // 64
            scratch = [pltpu.VMEM((GS4, C4), jnp.int8) for _ in range(4)] \
                + [pltpu.VMEM((GS4, 4), jnp.float32)]
        else:
            kernel = {"q6_k": _q6k_row_kernel, "q2_k": _q2k_row_kernel,
                      "q3_k": _q3k_row_kernel}[kind]
        st_rows = in_f // 16
    elif kind == "q8_0":
        x_args = (x,)
        x_rows = (1,)
        x_shapes = (in_f,)
        if i8:
            kernel = _q8_0_row_kernel_i8
            GS = in_f // 32
            scratch = [pltpu.VMEM((GS, in_f), jnp.int8),
                       pltpu.VMEM((GS, 1), jnp.float32)]
        else:
            kernel = _q8_0_row_kernel
        st_rows = in_f // 32
    elif kind == "q6_k_i8f":
        x_args = (x,)
        x_rows = (1,)
        x_shapes = (in_f,)
        kernel = _q6k_i8f_row_kernel
        GS = in_f // 16
        scratch = [pltpu.VMEM((GS, in_f), jnp.int8),
                   pltpu.VMEM((GS, 1), jnp.float32)]
        st_rows = in_f // 16
    elif kind in ("q3_k_n4", "q2_k_n4"):
        C2 = in_f // 2
        x_args = (x[:, :C2], x[:, C2:], _group_sums(x, in_f, 16))
        x_rows = (1, 1, 1)
        x_shapes = (C2, C2, in_f // 16)
        kernel = (_q3k_n4_row_kernel if kind == "q3_k_n4"
                  else _q2k_n4_row_kernel)
        GS2 = C2 // 16
        scratch = [pltpu.VMEM((GS2, C2), jnp.int8) for _ in range(2)] \
            + [pltpu.VMEM((GS2, 2), jnp.float32)]
        st_rows = in_f // 16
    else:
        raise ValueError(kind)
    rt = (DECODE_ROW_TILE if T == 1 and out_f % DECODE_ROW_TILE == 0
          else ROW_TILE)

    def row_spec(width):
        return pl.BlockSpec((rt, width), lambda o: (o, 0),
                            memory_space=pltpu.VMEM)

    # weight-stream specs + trailing lane-transposed (st_rows, rt) sidecars
    n_t = 1
    if kind == "q6_k":
        w_in_specs = [row_spec(in_f // 2), row_spec(in_f // 4)]
    elif kind == "q2_k":
        w_in_specs = [row_spec(in_f // 4)]
        n_t = 2  # scale_pt + min_pt
    elif kind == "q3_k":
        w_in_specs = [row_spec(in_f // 4), row_spec(in_f // 4)]
    elif kind == "iq2p":
        w_in_specs = [row_spec(in_f // 4), row_spec(in_f // 8)]
    elif kind in ("iq3px", "iq3ps"):
        w_in_specs = [row_spec(in_f // 4), row_spec(in_f // 4)]
    elif kind == "iq1p":
        w_in_specs = [row_spec(in_f // 4)]
        n_t = 2  # scale_pt + min_pt
    elif kind in ("q3_k_n4", "q2_k_n4"):
        w_in_specs = [row_spec(in_f // 2)]
        if kind == "q2_k_n4":
            n_t = 2  # scale_t + min_t
    else:
        w_in_specs = [row_spec(in_f)]
    return pl.pallas_call(
        kernel,
        grid=(out_f // rt,),
        in_specs=[pl.BlockSpec((r, s), lambda o: (0, 0),
                               memory_space=pltpu.VMEM)
                  for r, s in zip(x_rows, x_shapes)]
        + w_in_specs
        + [pl.BlockSpec((st_rows, rt), lambda o: (0, o),
                        memory_space=pltpu.VMEM)] * n_t,
        out_specs=pl.BlockSpec((1, rt), lambda o: (0, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, out_f), x.dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * in_f * out_f,
            bytes_accessed=sum(f.nbytes for f in fields) + x.nbytes
            + T * out_f * 2,
            transcendentals=0),
        interpret=interpret,
    )(*x_args, *fields)


@functools.partial(jax.jit, static_argnames=("kind", "out_f", "in_f", "interpret",
                                             "q4k_2d", "group"))
def _packed_matmul_2d(x, fields: tuple, kind: str, out_f: int, in_f: int,
                      interpret: bool, q4k_2d: str = "sexp", group: int = 0):
    T = x.shape[0]
    t_tile = min(T_TILE, T)
    # VMEM-aware tile selection: the in-kernel bf16 dequant temps cost
    # ~14 bytes per packed position and the x tiles ~4 bytes/col; wide
    # layers (13B w_down in_f=13824) blow the 16M scoped limit at the
    # 256x256 default (seen as a compile-time stack OOM on v5e)
    C2v = in_f // 2
    rt = 128 if out_f % 256 else 256

    def fits(rt_, tt_):
        return 12 * rt_ * C2v + 4 * tt_ * C2v <= VMEM_BUDGET + 1024 * 1024

    for cand_rt, cand_tt in ((ROW_TILE, t_tile), (128, t_tile),
                             (ROW_TILE, 128), (128, 128),
                             (ROW_TILE, 64), (128, 64)):
        if out_f % cand_rt == 0 and fits(cand_rt, min(cand_tt, t_tile)):
            rt = cand_rt
            t_tile = min(cand_tt, t_tile)
            break
    grid = (out_f // rt, pl.cdiv(T, t_tile))

    if kind in _IQ_KINDS:
        G = group
        C4 = in_f // 4
        Tn = x.shape[0]
        x4 = x.reshape(Tn, in_f // 128, 128)
        planes = [x4[:, :, i * 32:(i + 1) * 32].reshape(Tn, C4)
                  for i in range(4)]
        if kind == "iq1p":
            xs = jnp.concatenate(
                [_group_sums(p, C4, G) for p in planes], axis=1)
            x_args = (*planes, xs)
            x_shapes = (C4,) * 4 + (in_f // G,)
            kernel = functools.partial(_iq1p_kernel, G=G)
            w_shapes = (C4, in_f // G, in_f // G)
        else:
            x_args = tuple(planes)
            x_shapes = (C4,) * 4
            kernel = {
                "iq2p": functools.partial(_iq2p_kernel, G=G),
                "iq3px": functools.partial(_iq3p_kernel, G=G, xxs=True),
                "iq3ps": functools.partial(_iq3p_kernel, G=G, xxs=False),
            }[kind]
            w_shapes = ((C4, in_f // 8, in_f // G) if kind == "iq2p"
                        else (C4, C4, in_f // G))
    elif kind == "q4_k":
        xl, xh = _plane_split2(x, in_f)
        xs = _group_sums(x, in_f, 32)  # logical groups (min term)
        if q4k_2d == "magic":
            xsl = _group_sums(xl, in_f // 2, 32)
            xsh = _group_sums(xh, in_f // 2, 32)
            x_args = (xl, xh, xsl, xsh, xs)
            x_shapes = (in_f // 2, in_f // 2, in_f // 64, in_f // 64,
                        in_f // 32)
            kernel = _q4k_magic_kernel
        else:
            x_args = (xl, xh, xs)
            x_shapes = (in_f // 2, in_f // 2, in_f // 32)
            kernel = _q4k_kernel
        w_shapes = (in_f // 2, in_f // 64, in_f // 64, in_f // 32)
    elif kind == "q5_k":
        xl, xh = _plane_split2(x, in_f)
        xs = _group_sums(x, in_f, 32)
        x_args = (xl, xh, xs)
        x_shapes = (in_f // 2, in_f // 2, in_f // 32)
        kernel = _q5k_kernel
        w_shapes = (in_f // 2, in_f // 2, in_f // 64, in_f // 64, in_f // 32)
    elif kind in ("q6_k", "q2_k", "q3_k"):
        Tn = x.shape[0]
        x4 = x.reshape(Tn, in_f // 128, 128)
        planes = [x4[:, :, i * 32:(i + 1) * 32].reshape(Tn, in_f // 4)
                  for i in range(4)]
        xs4 = [_group_sums(p, in_f // 4, 16) for p in planes]
        xs = jnp.concatenate(xs4, axis=1)  # matches s plane order
        x_args = (*planes, xs)
        x_shapes = (in_f // 4,) * 4 + (in_f // 16,)
        kernel = {"q6_k": _q6k_kernel, "q2_k": _q2k_kernel,
                  "q3_k": _q3k_kernel}[kind]
        w_shapes = {"q6_k": (in_f // 2, in_f // 4, in_f // 16),
                    "q2_k": (in_f // 4, in_f // 16, in_f // 16),
                    "q3_k": (in_f // 4, in_f // 4, in_f // 16)}[kind]
    elif kind == "q8_0":
        x_args = (x,)
        x_shapes = (in_f,)
        kernel = _q8_0_kernel
        w_shapes = (in_f, in_f // 32)
    elif kind == "q4_k_i8":
        xs = _group_sums(x, in_f, 32)
        x_args = (x, xs)
        x_shapes = (in_f, in_f // 32)
        kernel = _q4k_i8_kernel
        w_shapes = (in_f, in_f // 32, in_f // 32)
    else:
        raise ValueError(kind)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_specs_x(t_tile, x_shapes) + _specs_w(w_shapes, rt),
        out_specs=pl.BlockSpec((t_tile, rt), lambda o, t: (t, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, out_f), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * in_f * out_f,
            bytes_accessed=sum(f.nbytes for f in fields) + x.nbytes + T * out_f * 2,
            transcendentals=0),
        interpret=interpret,
    )(*x_args, *fields)


_FIELD_LISTS = {
    "q4_k": ("qs2", "scale_lo", "scale_hi", "min"),
    "q4_k_i8": ("q", "scale", "min"),
    "q5_k": ("qs2", "hb", "scale_lo", "scale_hi", "min"),
    "q6_k": ("ql2", "qh2", "scale_p"),
    "q2_k": ("qs2", "scale_p", "min_p"),
    "q3_k": ("qs2", "hm2", "scale_p"),
    "q8_0": ("q", "scale"),
    "q6_k_i8f": ("q", "scale"),
    "q3_k_n4": ("q", "scale"),
    "q2_k_n4": ("q", "scale", "min"),
    "iq2p": ("qs2", "sg", "scale_p"),
    "iq3px": ("qs2", "hs", "scale_p"),
    "iq3ps": ("qs2", "hs", "scale_p"),
    "iq1p": ("qs2", "scale_p", "min_p"),
}
_MATVEC_FIELDS_Q4K = ("qs2", "slo_t", "shi_t", "mlo_t", "mhi_t")
_MATVEC_FIELDS_Q5K = ("qs2", "hb", "slo_t", "shi_t", "mlo_t", "mhi_t")
_SBQ_FIELDS_Q4K = ("qs2", "scp_lo", "scp_hi", "d_sbt", "mlo_t", "mhi_t")
_SBQ_FIELDS_Q5K = ("qs2", "hb", "scp_lo", "scp_hi", "d_sbt", "mlo_t", "mhi_t")
_MATVEC_FIELDS = {"q6_k": ("ql2", "qh2", "scale_pt"),
                  "q2_k": ("qs2", "scale_pt", "min_pt"),
                  "q3_k": ("qs2", "hm2", "scale_pt"),
                  "q6_k_i8f": ("q", "scale_t"),
                  "q3_k_n4": ("q", "scale_t"),
                  "q2_k_n4": ("q", "scale_t", "min_t"),
                  "q8_0": ("q", "scale_t"),
                  "iq2p": ("qs2", "sg", "scale_pt"),
                  "iq3px": ("qs2", "hs", "scale_pt"),
                  "iq3ps": ("qs2", "hs", "scale_pt"),
                  "iq1p": ("qs2", "scale_pt", "min_pt")}
_IQ_KINDS = ("iq2p", "iq3px", "iq3ps", "iq1p")


def _iq_group(qt: QTensor) -> int:
    """Scale-group size of a native-IQ QTensor (static, from field shape).
    scale_p's LAST dim is n_groups whether or not the fields carry a
    leading layer axis (stack_layers)."""
    return qt.shape[1] // qt.data["scale_p"].shape[-1]


class _SqView:
    """Kernel-ref adapter presenting a (1, *dims) block as its squeezed
    (*dims) self, so the shared matvec kernel bodies (written against 2-D
    weight refs) also serve layer-STACKED fields whose BlockSpec carries a
    leading block dim of 1 selected by the scalar-prefetched layer index."""
    __slots__ = ("r",)

    def __init__(self, r):
        self.r = r

    def __getitem__(self, idx):
        if idx == slice(None):
            return self.r[0]
        if isinstance(idx, tuple):
            return self.r[(0,) + idx]
        return self.r[(0, idx)]

    @property
    def shape(self):
        return self.r.shape[1:]

    @property
    def dtype(self):
        return self.r.dtype


def _stacked_kernel(kernel, n_x: int, n_w: int):
    """Wrap a matvec kernel for the stacked-weight pallas_call: the scalar
    ref arrives first (consumed by the index maps, unused in the body) and
    the n_w weight refs after the n_x activation refs get the leading-1
    squeeze view."""
    def wrapped(li_ref, *refs):
        del li_ref
        xs = refs[:n_x]
        ws = tuple(_SqView(r) for r in refs[n_x:n_x + n_w])
        rest = refs[n_x + n_w:]
        kernel(*xs, *ws, *rest)
    return wrapped


@functools.partial(jax.jit, static_argnames=("kind", "out_f", "in_f",
                                             "interpret", "i8"))
def _packed_matvec_q4k_stacked(x, li, fields: tuple, kind: str, out_f: int,
                               in_f: int, interpret: bool, i8: bool):
    """T=1 q4_k/q5_k matvec against LAYER-STACKED packed fields.

    Each field in `fields` carries a leading layer axis (stack_layers);
    the kernel's BlockSpec index maps select layer `li` through scalar
    prefetch, so a lax.scan decode body reads each layer's packed weights
    straight from HBM — XLA never materializes a per-layer slice copy
    (the copy+write-back tripled HBM traffic and held scan decode at 46%
    of unrolled in BENCH_r02)."""
    T = x.shape[0]
    GS = in_f // 64
    C2 = in_f // 2
    n_qfields = 2 if kind == "q5_k" else 1  # qs2 (+ hb)
    budget = VMEM_BUDGET - 2 * 2 * T * GS * C2 * 2
    rt = ROW_TILE
    for cand in (DECODE_ROW_TILE, ROW_TILE, 128):
        if out_f % cand == 0 and 2 * cand * (n_qfields * C2 + 8 * GS) <= budget:
            rt = cand
            break
    if i8:
        scratch = [pltpu.VMEM((GS, C2), jnp.int8),
                   pltpu.VMEM((GS, C2), jnp.int8),
                   pltpu.VMEM((GS, 2), jnp.float32),
                   pltpu.VMEM((2, GS), jnp.bfloat16)]
        kernel = (_q5k_decode_kernel_i8 if kind == "q5_k"
                  else _q4k_decode_kernel_i8)
    else:
        scratch = [pltpu.VMEM((GS, C2), jnp.bfloat16),
                   pltpu.VMEM((GS, C2), jnp.bfloat16),
                   pltpu.VMEM((2, GS), jnp.bfloat16)]
        kernel = _q4k_decode_kernel_raw
    n_layers = fields[0].shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(out_f // rt,),
        in_specs=[pl.BlockSpec((T, in_f), lambda o, p: (0, 0))]
        + [pl.BlockSpec((1, rt, C2), lambda o, p: (p[0], o, 0))] * n_qfields
        + [pl.BlockSpec((1, GS, rt), lambda o, p: (p[0], 0, o))] * 4,
        out_specs=pl.BlockSpec((T, rt), lambda o, p: (0, o)),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        _stacked_kernel(kernel, 1, n_qfields + 4),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, out_f), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * in_f * out_f,
            bytes_accessed=sum(f.nbytes for f in fields) // n_layers
            + x.nbytes + T * out_f * 2,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(li, jnp.int32).reshape(1), x, *fields)


@functools.partial(jax.jit, static_argnames=("kind", "out_f", "in_f",
                                             "interpret", "i8", "group"))
def _packed_matvec_stacked(x, li, fields: tuple, kind: str, out_f: int,
                           in_f: int, interpret: bool, i8: bool = False,
                           group: int = 0):
    """Stacked-field analog of _packed_matvec (q6_k/q2_k/q3_k/q8_0/native-IQ
    row matvecs) for the lax.scan decode body — see
    _packed_matvec_q4k_stacked."""
    T = x.shape[0]
    scratch = []
    if kind in _IQ_KINDS:
        G = group
        C4 = in_f // 4
        x4 = x.reshape(1, in_f // 128, 128)
        planes = [x4[:, :, i * 32:(i + 1) * 32].reshape(1, C4)
                  for i in range(4)]
        if kind == "iq1p":
            xs = jnp.concatenate(
                [_group_sums(p, C4, G) for p in planes], axis=1)
            x_args = (*planes, xs)
            x_rows = (1,) * 5
            x_shapes = (C4,) * 4 + (in_f // G,)
        else:
            x_args = tuple(planes)
            x_rows = (1,) * 4
            x_shapes = (C4,) * 4
        GS4 = C4 // G
        scratch = [pltpu.VMEM((GS4, C4), jnp.int8) for _ in range(4)] \
            + [pltpu.VMEM((GS4, 4), jnp.float32)]
        kernel = {
            "iq2p": functools.partial(_iq2p_row_kernel_i8, G=G),
            "iq3px": functools.partial(_iq3p_row_kernel_i8, G=G, xxs=True),
            "iq3ps": functools.partial(_iq3p_row_kernel_i8, G=G, xxs=False),
            "iq1p": functools.partial(_iq1p_row_kernel_i8, G=G),
        }[kind]
        st_rows = in_f // G
    elif kind in ("q6_k", "q2_k", "q3_k"):
        x4 = x.reshape(1, in_f // 128, 128)
        planes = [x4[:, :, i * 32:(i + 1) * 32].reshape(1, in_f // 4)
                  for i in range(4)]
        xs = jnp.concatenate(
            [_group_sums(p, in_f // 4, 16) for p in planes], axis=1)
        x_args = (*planes, xs)
        x_rows = (1,) * 5
        x_shapes = (in_f // 4,) * 4 + (in_f // 16,)
        if i8 and kind in ("q6_k", "q2_k", "q3_k"):
            kernel = {"q6_k": _q6k_row_kernel_i8, "q2_k": _q2k_row_kernel_i8,
                      "q3_k": _q3k_row_kernel_i8}[kind]
            C4, GS4 = in_f // 4, in_f // 64
            scratch = [pltpu.VMEM((GS4, C4), jnp.int8) for _ in range(4)] \
                + [pltpu.VMEM((GS4, 4), jnp.float32)]
        else:
            kernel = {"q6_k": _q6k_row_kernel, "q2_k": _q2k_row_kernel,
                      "q3_k": _q3k_row_kernel}[kind]
        st_rows = in_f // 16
    elif kind == "q8_0":
        x_args = (x,)
        x_rows = (1,)
        x_shapes = (in_f,)
        if i8:
            kernel = _q8_0_row_kernel_i8
            GS = in_f // 32
            scratch = [pltpu.VMEM((GS, in_f), jnp.int8),
                       pltpu.VMEM((GS, 1), jnp.float32)]
        else:
            kernel = _q8_0_row_kernel
        st_rows = in_f // 32
    else:
        raise ValueError(kind)
    rt = (DECODE_ROW_TILE if T == 1 and out_f % DECODE_ROW_TILE == 0
          else ROW_TILE)

    def row_spec3(width):
        return pl.BlockSpec((1, rt, width), lambda o, p: (p[0], o, 0))

    n_t = 1
    if kind == "q6_k":
        w_in_specs = [row_spec3(in_f // 2), row_spec3(in_f // 4)]
    elif kind == "q2_k":
        w_in_specs = [row_spec3(in_f // 4)]
        n_t = 2  # scale_pt + min_pt
    elif kind == "q3_k":
        w_in_specs = [row_spec3(in_f // 4), row_spec3(in_f // 4)]
    elif kind == "iq2p":
        w_in_specs = [row_spec3(in_f // 4), row_spec3(in_f // 8)]
    elif kind in ("iq3px", "iq3ps"):
        w_in_specs = [row_spec3(in_f // 4), row_spec3(in_f // 4)]
    elif kind == "iq1p":
        w_in_specs = [row_spec3(in_f // 4)]
        n_t = 2  # scale_pt + min_pt
    else:
        w_in_specs = [row_spec3(in_f)]
    n_layers = fields[0].shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(out_f // rt,),
        in_specs=[pl.BlockSpec((r, s), lambda o, p: (0, 0))
                  for r, s in zip(x_rows, x_shapes)]
        + w_in_specs
        + [pl.BlockSpec((1, st_rows, rt), lambda o, p: (p[0], 0, o))] * n_t,
        out_specs=pl.BlockSpec((1, rt), lambda o, p: (0, o)),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        _stacked_kernel(kernel, len(x_args), len(w_in_specs) + n_t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, out_f), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * in_f * out_f,
            bytes_accessed=sum(f.nbytes for f in fields) // n_layers
            + x.nbytes + T * out_f * 2,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(li, jnp.int32).reshape(1), *x_args, *fields)


def matmul_packed_stacked(x: jnp.ndarray, qt: QTensor, li):
    """Dispatch a T=1 matvec against a layer-STACKED QTensor (data fields
    carry a leading layer axis, logical shape is still per-layer (out, in));
    `li` is a traced layer index.  Returns None when no stacked kernel
    covers (kind, shape) — the caller falls back to dynamic-slicing the
    layer out (the pre-round-3 scan behavior)."""
    if qt.kind not in _FIELD_LISTS or not _pallas_enabled():
        return None
    out_f, in_f = qt.shape
    if out_f % ROW_TILE or in_f % 256:
        return None
    lead = x.shape[:-1]
    x2 = x.reshape(-1, in_f)
    if x2.shape[0] != 1 or os.environ.get("KCPP_Q4K_DECODE", "1") != "1":
        return None
    if x2.dtype != jnp.bfloat16:
        x2 = x2.astype(jnp.bfloat16)
    if qt.kind in ("q4_k", "q5_k"):
        mv = _MATVEC_FIELDS_Q5K if qt.kind == "q5_k" else _MATVEC_FIELDS_Q4K
        if not all(n in qt.data for n in mv):
            return None
        i8 = in_f >= 512 and os.environ.get("KCPP_Q4K_I8", "1") == "1"
        if in_f < 512 or (not i8 and qt.kind == "q5_k"):
            return None  # tiny layers / bf16 q5_k: dynamic-slice fallback
        if _q4k_matvec_rt(qt.kind, out_f, in_f, 1, i8, True) is None:
            return None  # ultra-wide in_f: no VMEM-feasible row tile
        y = _packed_matvec_q4k_stacked(
            x2, jnp.asarray(li, jnp.int32),
            tuple(qt.data[n] for n in mv), kind=qt.kind,
            out_f=out_f, in_f=in_f, interpret=_use_interpret(), i8=i8)
        return y.reshape(*lead, out_f)
    if (qt.kind in _MATVEC_FIELDS
            and all(n in qt.data for n in _MATVEC_FIELDS[qt.kind])
            and (qt.kind not in _IQ_KINDS or in_f >= 32 * _iq_group(qt))):
        y = _packed_matvec_stacked(
            x2, jnp.asarray(li, jnp.int32),
            tuple(qt.data[n] for n in _MATVEC_FIELDS[qt.kind]),
            kind=qt.kind, out_f=out_f, in_f=in_f, interpret=_use_interpret(),
            i8=_mm_i8(qt.kind, in_f),
            group=_iq_group(qt) if qt.kind in _IQ_KINDS else 0)
        return y.reshape(*lead, out_f)
    return None


def matmul_packed(x: jnp.ndarray, qt: QTensor):
    """Dispatch to a Pallas kernel if one covers this QTensor, else None."""
    if qt.kind not in _FIELD_LISTS or not _pallas_enabled():
        return None
    out_f, in_f = qt.shape
    if out_f % ROW_TILE or in_f % 256:
        return None
    names = _FIELD_LISTS[qt.kind]
    if any(n not in qt.data for n in names):
        return None  # tensor packed before kernel-layout fields existed
    fields = tuple(qt.data[n] for n in names)

    lead = x.shape[:-1]
    x2 = x.reshape(-1, in_f)
    if x2.dtype != jnp.bfloat16:
        x2 = x2.astype(jnp.bfloat16)
    if qt.kind in ("q6_k_i8f", "q3_k_n4", "q2_k_n4"):
        # expanded serving layouts (VERDICT r4 item 7): T=1 streams the
        # expanded plane through its matvec kernel; T>1 (batched decode /
        # prefill) re-dispatches through the DENSE layout's kernels when the
        # pack carried those fields (pack_*_n4 / pack_q6_k_i8f do; synthetic
        # bench tensors don't), else XLA dequant serves.
        # Scratch bound: the full-width per-16 activation expansion is
        # (in/16, in) i8 (q6_k_i8f) / 2 x (in/32, in/2) (nibble kinds).
        if x2.shape[0] != 1:
            dense_kind = {"q6_k_i8f": "q6_k", "q3_k_n4": "q3_k",
                          "q2_k_n4": "q2_k"}[qt.kind]
            if all(n in qt.data for n in _FIELD_LISTS[dense_kind]):
                return matmul_packed(
                    x, QTensor(kind=dense_kind, shape=qt.shape, data=qt.data))
            return None
        if in_f % 256:
            return None
        if qt.kind == "q6_k_i8f":
            if (in_f // 16) * in_f > 6 * 1024 * 1024 or in_f // 16 < 8:
                return None
        elif (in_f // 32) * (in_f // 2) > 3 * 1024 * 1024 or in_f // 32 < 8:
            return None
        mv = _MATVEC_FIELDS[qt.kind]
        if not all(n in qt.data for n in mv):
            return None
        y = _packed_matvec(x2, tuple(qt.data[n] for n in mv), kind=qt.kind,
                           out_f=out_f, in_f=in_f, interpret=_use_interpret())
        return y.reshape(*lead, out_f)
    # The q4_k row kernel generalizes to small T by stacking per-token masked
    # expansions (T*GS rows) — its P-dot MACs grow with T, but the 2-D
    # scale-expansion kernel's per-tile structural cost is ~2.2x the row
    # kernel's streaming time regardless of T (profiled in-situ), so small
    # batches stay ahead. MATVEC_MAX_T bounds the trade for the bf16 row
    # kernels; the q4_k/q5_k *i8_t* variants stay ahead of the 2-D kernel up
    # to T=8 (fori-synced batched-8 decode on v5e: i8_t 2572 vs 2-D 2398 vs
    # bf16 row 1583 tok/s), so the i8 path extends the window to 8.
    T2 = x2.shape[0]
    # SBQ superblock-layout batched kernel (the VERDICT r3 item-1 scale-layout
    # rework): 2<=T<=16 q4_k/q5_k with per-superblock contraction — 8x fewer
    # P-dot MACs than the per-32-group stacks.  ON-TPU RESULT (r4 A/B,
    # PERF_NOTES): the MAC savings move the cost to the VPU (the in-kernel
    # sc*q multiply + product-nibble splits, ~13 i32 lane-ops/byte) and the
    # kernel lands ~1.4x SLOWER than i8_t at T=8 (52 vs 36 us on the 1.1B
    # gateup; in-situ batched-8 2423 vs 2688 t/s).  Exact-q4_k batched decode
    # is jointly VPU/MXU-bound whichever side carries the per-32 scales, so
    # this stays OPT-IN (KCPP_SBQ=1) as the documented alternative layout.
    if (qt.kind in ("q4_k", "q5_k") and 2 <= T2 <= 16
            and in_f % 256 == 0 and in_f >= 2048
            and "scp_lo" in qt.data and "d_sbt" in qt.data
            and os.environ.get("KCPP_SBQ", "0") == "1"
            and os.environ.get("KCPP_Q4K_DECODE", "1") == "1"):
        mv = _SBQ_FIELDS_Q5K if qt.kind == "q5_k" else _SBQ_FIELDS_Q4K
        if all(n in qt.data for n in mv):
            y = _packed_matvec_q4k_sbq(
                x2, tuple(qt.data[n] for n in mv), kind=qt.kind,
                out_f=out_f, in_f=in_f, interpret=_use_interpret())
            return y.reshape(*lead, out_f)
    i8_q45 = (qt.kind in ("q4_k", "q5_k") and in_f % 256 == 0 and in_f >= 512
              and os.environ.get("KCPP_Q4K_I8", "1") == "1"
              # T>1 scratch is (T*GS, C2) int8 x2 + f32 prep chunks; cap it
              # so wide-KD models (7B/13B FFN widths) fall to the 2-D kernel
              and (T2 == 1
                   or T2 * (in_f // 64) * (in_f // 2) <= 4 * 1024 * 1024))
    max_t = 8 if i8_q45 else MATVEC_MAX_T
    if (T2 <= max_t
            and os.environ.get("KCPP_Q4K_DECODE", "1") == "1"):
        mv45 = _MATVEC_FIELDS_Q5K if qt.kind == "q5_k" else _MATVEC_FIELDS_Q4K
        if (qt.kind in ("q4_k", "q5_k")
                and all(n in qt.data for n in mv45)
                and _q4k_matvec_rt(
                    qt.kind, out_f, in_f, T2, i8_q45,
                    i8_q45 or (qt.kind == "q4_k" and T2 == 1
                               and in_f >= 512)) is not None):
            # int8 MXU path — DEFAULT ON after the round-2 on-TPU A/B: decode
            # 800 -> 1068 t/s (86% of the streamed-bytes roofline; BENCH_r02),
            # served greedy 664 -> 790.  Activation int8 noise is the same
            # class llama.cpp serves with (q8_1 activations, ggml-cuda/
            # mmq.cuh:25-60, which applies the same q8_1 activations to both
            # formats); QUALITY.md bounds that class at <0.05 ppl (measured
            # on q4_k; q5_k is covered by the kernel-level absolute-error
            # tests rather than a separate ppl run).
            # KCPP_Q4K_I8=0 reverts.  Env is read here, in the non-jitted
            # dispatch, and passed as a static arg (advisor r2 finding).
            # GS = in_f//64 must be >= 8: Mosaic rejects the (GS, C2)
            # scratch layout below 8 sublanes (measured on v5e: GS=4 fails,
            # GS=8 works) — tiny layers take the host-prep bf16 kernel
            # T>1 rides the same i8 path through the *_i8_t kernels (per-
            # token expansion stacks): the batched-8 serving decode
            i8 = i8_q45
            raw = i8 or (qt.kind == "q4_k" and T2 == 1 and in_f % 256 == 0
                         and in_f >= 512
                         and os.environ.get("KCPP_Q4K_RAW_X", "1") == "1")
            y = _packed_matvec_q4k(
                x2, tuple(qt.data[n] for n in mv45),
                kind=qt.kind, out_f=out_f, in_f=in_f,
                interpret=_use_interpret(), i8=i8, raw=raw)
            return y.reshape(*lead, out_f)
        if (qt.kind in _MATVEC_FIELDS and x2.shape[0] == 1
                and all(n in qt.data for n in _MATVEC_FIELDS[qt.kind])
                and (qt.kind not in _IQ_KINDS
                     or in_f >= 32 * _iq_group(qt))):
            # int8 MXU path for q8_0 (pure relayout — weights are already
            # int8) and q6_k (6-bit -> i8 expansion): the mmvq-equivalent
            # ports of the q4_k i8 win.  KCPP_MM_I8=0 reverts.  IQ kinds
            # need >= 8 scratch sublanes (in_f >= 32*G), else the 2-D
            # kernel serves.
            y = _packed_matvec(
                x2, tuple(qt.data[n] for n in _MATVEC_FIELDS[qt.kind]),
                kind=qt.kind, out_f=out_f, in_f=in_f,
                interpret=_use_interpret(), i8=_mm_i8(qt.kind, in_f),
                group=_iq_group(qt) if qt.kind in _IQ_KINDS else 0)
            return y.reshape(*lead, out_f)
    # ultra-wide in_f (70B-class down-proj, unsharded): even the smallest
    # 2-D tile (rt=128, tt=64) blows scoped VMEM — fall back to XLA dequant
    if 12 * 128 * (in_f // 2) + 4 * 64 * (in_f // 2) > VMEM_BUDGET + 1024 * 1024:
        return None
    y = _packed_matmul_2d(x2, fields, kind=qt.kind, out_f=out_f, in_f=in_f,
                          interpret=_use_interpret(),
                          q4k_2d=os.environ.get("KCPP_Q4K_2D", "sexp"),
                          group=_iq_group(qt) if qt.kind in _IQ_KINDS else 0)
    return y.reshape(*lead, out_f)
