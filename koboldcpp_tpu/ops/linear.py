"""Weight containers + matmul dispatch.

A `QTensor` is a jit-friendly pytree holding either a dense (bf16) weight or a
packed quantized layout that stays packed in HBM and is dequantized inside the
matmul kernel (Pallas; XLA fallback).  Logical weight shape is (out, in) and
matmul computes x @ W^T, matching ggml's mul_mat contract
(/root/reference/ggml/src/ggml.c ggml_mul_mat).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType, QK_K
from ..gguf import quants as nq


@partial(jax.tree_util.register_dataclass,
         data_fields=["data"], meta_fields=["kind", "shape"])
@dataclass
class QTensor:
    kind: str  # "dense" | "q8_0" | "q4_k" | "q5_k" | "q6_k"
    shape: tuple[int, ...]  # logical (out, in)
    data: dict[str, Any] = field(default_factory=dict)

    @property
    def out_features(self) -> int:
        return self.shape[0]

    @property
    def in_features(self) -> int:
        return self.shape[1]


def dense(w: jnp.ndarray | np.ndarray, dtype=jnp.bfloat16) -> QTensor:
    w = jnp.asarray(w, dtype=dtype)
    return QTensor(kind="dense", shape=tuple(w.shape), data={"w": w})


# ---------------------------------------------------------------------------
# packed HBM layouts (built on host from GGUF raw bytes, no dequant round-trip)
# ---------------------------------------------------------------------------

def pack_q8_0(raw: np.ndarray, shape: tuple[int, int]) -> QTensor:
    """Q8_0: int8 values + bf16 scale per 32-block."""
    rows, cols = shape
    blocks = np.ascontiguousarray(raw).reshape(rows, cols // 32, 34)
    d = blocks[:, :, 0:2].copy().view(np.float16).astype(np.float32)[..., 0]
    q = blocks[:, :, 2:].copy().view(np.int8).reshape(rows, cols)
    scale = d.reshape(rows, cols // 32)
    return QTensor(kind="q8_0", shape=shape, data={
        "q": jnp.asarray(q),
        "scale": jnp.asarray(scale, dtype=jnp.bfloat16),
        # lane-transposed sidecar for the row-output decode matvec
        "scale_t": jnp.asarray(scale.T, dtype=jnp.bfloat16),
    })


def _unpack_k_scales_np(raw_scales: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    sc, mn = nq._unpack_scale_min_k4(raw_scales)
    return sc, mn


def pack_q4_k(raw: np.ndarray, shape: tuple[int, int]) -> QTensor:
    """Q4_K: contiguous-plane nibble packing + pre-decoded bf16 scales/mins.

    Byte j of superblock s packs logical cols (256s+j | 256s+128+j << 4), so a
    kernel splits activations into nibble planes with contiguous 128-col
    slices instead of ggml's 32-col interleave (Mosaic cannot reshape
    minor-dim groups < 128 in-kernel; PERF_NOTES megakernel note).  The split
    stays *within* each 256-col superblock so TP col-sharding at superblock
    granularity keeps every shard self-consistent.

    Plane scale order: lo-plane scale groups of superblock s are logical
    sub-blocks 8s..8s+3, hi-plane 8s+4..8s+7 (byte b -> scale b//32 in both
    planes).  `*_t` fields are lane-transposed (group, row) copies for the
    row-output decode kernel / FFN megakernel.
    """
    rows, cols = shape
    nsb = cols // QK_K
    blocks = np.ascontiguousarray(raw).reshape(rows, nsb, 144)
    d = blocks[:, :, 0:2].copy().view(np.float16).astype(np.float32)[..., 0]
    dmin = blocks[:, :, 2:4].copy().view(np.float16).astype(np.float32)[..., 0]
    sc, mn = _unpack_k_scales_np(blocks[:, :, 4:16].reshape(-1, 12))
    scales = (d.reshape(-1, 1) * sc).reshape(rows, nsb * 8)
    mins = (dmin.reshape(-1, 1) * mn).reshape(rows, nsb * 8)
    qs = blocks[:, :, 16:].reshape(rows, nsb, 4, 32)
    lo = qs & 0xF
    hi = qs >> 4
    # logical col order: ggml byte j of 64-group g holds cols 64g+j | 64g+32+j
    q = np.stack([lo, hi], axis=3).reshape(rows, nsb, QK_K)
    qs2 = (q[:, :, :128] | (q[:, :, 128:] << 4)).reshape(rows, cols // 2)
    s4 = scales.reshape(rows, nsb, 2, 4)   # (R, S, plane, sub)
    m4 = mins.reshape(rows, nsb, 2, 4)
    s_lo = s4[:, :, 0].reshape(rows, nsb * 4)
    s_hi = s4[:, :, 1].reshape(rows, nsb * 4)
    m_lo = m4[:, :, 0].reshape(rows, nsb * 4)
    m_hi = m4[:, :, 1].reshape(rows, nsb * 4)
    # SBQ sidecars (batched T<=16 decode kernel): INTEGER 6-bit sub-scales
    # packed 16*(sc>>3) + (sc&7) <= 119 (i8), plane-ordered like scale_lo/hi,
    # plus the f16 superblock d lane-transposed (nsb, rows).  The kernel folds
    # the integer sub-scale into the int8 weights (sch*q, scl*q <= 105) so the
    # P-dots contract per SUPERBLOCK (T*nsb stack rows) instead of per 32-group
    # (T*in/64 rows) — the mmq-style scale-layout rework (VERDICT r3 item 1).
    sci = sc.astype(np.int32).reshape(rows, nsb, 2, 4)
    scp = (16 * (sci >> 3) + (sci & 7)).astype(np.int8)
    # NOTE: no logical-order "scale" field — dequant_xla reconstructs it from
    # scale_lo/scale_hi (saves in_f/16 bytes/row of HBM on every q4_k tensor)
    return QTensor(kind="q4_k", shape=shape, data={
        "qs2": jnp.asarray(qs2),
        "min": jnp.asarray(mins, dtype=jnp.bfloat16),
        # plane-ordered per-32-col scales for the 2-D kernel
        "scale_lo": jnp.asarray(s_lo, dtype=jnp.bfloat16),
        "scale_hi": jnp.asarray(s_hi, dtype=jnp.bfloat16),
        # lane-transposed (group, row) copies for the row decode kernel
        "slo_t": jnp.asarray(s_lo.T, dtype=jnp.bfloat16),
        "shi_t": jnp.asarray(s_hi.T, dtype=jnp.bfloat16),
        "mlo_t": jnp.asarray(m_lo.T, dtype=jnp.bfloat16),
        "mhi_t": jnp.asarray(m_hi.T, dtype=jnp.bfloat16),
        # SBQ batched-decode sidecars
        "scp_lo": jnp.asarray(scp[:, :, 0].reshape(rows, nsb * 4)),
        "scp_hi": jnp.asarray(scp[:, :, 1].reshape(rows, nsb * 4)),
        "d_sbt": jnp.asarray(d.T.copy(), dtype=jnp.float32),
    })


def pack_q5_k(raw: np.ndarray, shape: tuple[int, int]) -> QTensor:
    """Q5_K in the same v2 contiguous-plane layout as pack_q4_k, plus a
    superblock-local high-bit sidecar: byte b of superblock s packs the low
    nibbles of logical cols 256s+b / 256s+128+b in qs2 and their 5th bits in
    bits 0/1 of hb (so the kernel ORs hb into the bf16 mantissa with the
    same elementwise alignment as qs2 — no expansion, fully superblock-local
    for TP col-sharding).  Scale/min fields mirror pack_q4_k exactly.
    Reference layout: dequantize_row_q5_K, ggml/src/ggml-quants.c (qs byte l
    of 64-group k = cols 64k+l lo / 64k+32+l hi; qh byte l bit b = col
    32b+l)."""
    rows, cols = shape
    nsb = cols // QK_K
    blocks = np.ascontiguousarray(raw).reshape(rows, nsb, 176)
    d = blocks[:, :, 0:2].copy().view(np.float16).astype(np.float32)[..., 0]
    dmin = blocks[:, :, 2:4].copy().view(np.float16).astype(np.float32)[..., 0]
    sc, mn = _unpack_k_scales_np(blocks[:, :, 4:16].reshape(-1, 12))
    scales = (d.reshape(-1, 1) * sc).reshape(rows, nsb * 8)
    mins = (dmin.reshape(-1, 1) * mn).reshape(rows, nsb * 8)
    qh = blocks[:, :, 16:48].reshape(rows, nsb, 1, 32)
    qs = blocks[:, :, 48:].reshape(rows, nsb, 4, 32)
    lo = qs & 0xF
    hi = qs >> 4
    # logical col order: ggml byte l of 64-group k holds cols 64k+l | 64k+32+l
    q4 = np.stack([lo, hi], axis=3).reshape(rows, nsb, QK_K)
    bits = ((qh >> np.arange(8, dtype=np.uint8)[None, None, :, None]) & 1)
    q = q4 + (bits.reshape(rows, nsb, QK_K) << 4)  # logical 5-bit values
    qs2 = ((q[:, :, :128] & 0xF)
           | ((q[:, :, 128:] & 0xF) << 4)).reshape(rows, cols // 2)
    hb = ((q[:, :, :128] >> 4)
          | ((q[:, :, 128:] >> 4) << 1)).reshape(rows, cols // 2)
    s4 = scales.reshape(rows, nsb, 2, 4)   # (R, S, plane, sub)
    m4 = mins.reshape(rows, nsb, 2, 4)
    s_lo = s4[:, :, 0].reshape(rows, nsb * 4)
    s_hi = s4[:, :, 1].reshape(rows, nsb * 4)
    m_lo = m4[:, :, 0].reshape(rows, nsb * 4)
    m_hi = m4[:, :, 1].reshape(rows, nsb * 4)
    sci = sc.astype(np.int32).reshape(rows, nsb, 2, 4)
    scp = (16 * (sci >> 3) + (sci & 7)).astype(np.int8)  # SBQ (see pack_q4_k)
    return QTensor(kind="q5_k", shape=shape, data={
        "qs2": jnp.asarray(qs2.astype(np.uint8)),
        "hb": jnp.asarray(hb.astype(np.uint8)),
        "min": jnp.asarray(mins, dtype=jnp.bfloat16),
        "scale_lo": jnp.asarray(s_lo, dtype=jnp.bfloat16),
        "scale_hi": jnp.asarray(s_hi, dtype=jnp.bfloat16),
        "slo_t": jnp.asarray(s_lo.T, dtype=jnp.bfloat16),
        "shi_t": jnp.asarray(s_hi.T, dtype=jnp.bfloat16),
        "mlo_t": jnp.asarray(m_lo.T, dtype=jnp.bfloat16),
        "mhi_t": jnp.asarray(m_hi.T, dtype=jnp.bfloat16),
        "scp_lo": jnp.asarray(scp[:, :, 0].reshape(rows, nsb * 4)),
        "scp_hi": jnp.asarray(scp[:, :, 1].reshape(rows, nsb * 4)),
        "d_sbt": jnp.asarray(d.T.copy(), dtype=jnp.float32),
    })


def pack_q6_k(raw: np.ndarray, shape: tuple[int, int]) -> QTensor:
    rows, cols = shape
    nsb = cols // QK_K
    blocks = np.ascontiguousarray(raw).reshape(rows, nsb, 210)
    ql = blocks[:, :, :128].reshape(rows, nsb * 128)
    qh = blocks[:, :, 128:192].reshape(rows, nsb * 64)
    sc8 = blocks[:, :, 192:208].view(np.int8).astype(np.float32)
    d = blocks[:, :, 208:210].copy().view(np.float16).astype(np.float32)[..., 0]
    scales = (d[..., None] * sc8).reshape(rows, nsb * 16)  # per 16-col sub-block
    # kernel-layout views (constant-shift plane decode, see quant_matmul.py):
    # ql2 = [bytes l (planes 0,2) | bytes l+32 (planes 1,3)], each [S, half, l]
    ql5 = ql.reshape(rows, nsb, 2, 2, 32)  # (S, half, byte-group, l)
    ql2 = np.concatenate([ql5[:, :, :, 0, :].reshape(rows, -1),
                          ql5[:, :, :, 1, :].reshape(rows, -1)], axis=1)
    # scales plane-major: natural idx = 16S + 8h + 2j + t -> plane j [S, h, t]
    s5 = scales.reshape(rows, nsb, 2, 4, 2)
    scale_p = np.concatenate([s5[:, :, :, j, :].reshape(rows, -1)
                              for j in range(4)], axis=1)
    qh_arr = jnp.asarray(qh)  # shared buffer: qh is already plane-shift layout
    return QTensor(kind="q6_k", shape=shape, data={
        "ql": jnp.asarray(ql),
        "qh": qh_arr,
        "scale": jnp.asarray(scales, dtype=jnp.bfloat16),
        "ql2": jnp.asarray(ql2),
        "qh2": qh_arr,  # same device buffer as qh (no duplicate HBM)
        "scale_p": jnp.asarray(scale_p, dtype=jnp.bfloat16),
        # lane-transposed sidecar for the row-output decode matvec
        "scale_pt": jnp.asarray(scale_p.T, dtype=jnp.bfloat16),
    })


def pack_q2_k(raw: np.ndarray, shape: tuple[int, int]) -> QTensor:
    """Q2_K packed layout for the plane kernels.

    qs already ships plane-structured (dequantize_row_q2_K,
    ggml/src/ggml-quants.c: byte 32h+l of a superblock holds 2-bit planes
    j=0..3 for elements 128h+32j+l), so `qs2` is the raw qs stream flattened
    to (rows, cols//4).  Sub-scales/mins (16 per superblock, groups of 16;
    logical group 8h+2j+t) are pre-decoded to bf16 and stored PLANE-MAJOR
    like pack_q6_k's scale_p: [plane j | superblock | half | t].  `*_pt`
    fields are lane-transposed copies for the row decode kernel."""
    rows, cols = shape
    nsb = cols // QK_K
    blocks = np.ascontiguousarray(raw).reshape(rows, nsb, 84)
    sc = blocks[:, :, :16]
    qs = blocks[:, :, 16:80].reshape(rows, nsb * 64)
    d = blocks[:, :, 80:82].copy().view(np.float16).astype(np.float32)[..., 0]
    dmin = blocks[:, :, 82:84].copy().view(np.float16).astype(np.float32)[..., 0]
    scales = d[..., None] * (sc & 0xF).astype(np.float32)   # (rows, nsb, 16)
    mins = dmin[..., None] * (sc >> 4).astype(np.float32)
    # logical group order 8h+2j+t -> plane-major (j | s,h,t), like pack_q6_k
    s5 = scales.reshape(rows, nsb, 2, 4, 2)
    m5 = mins.reshape(rows, nsb, 2, 4, 2)
    scale_p = np.concatenate([s5[:, :, :, j, :].reshape(rows, -1)
                              for j in range(4)], axis=1)
    min_p = np.concatenate([m5[:, :, :, j, :].reshape(rows, -1)
                            for j in range(4)], axis=1)
    return QTensor(kind="q2_k", shape=shape, data={
        "qs2": jnp.asarray(qs),
        "scale_p": jnp.asarray(scale_p, dtype=jnp.bfloat16),
        "min_p": jnp.asarray(min_p, dtype=jnp.bfloat16),
        "scale_pt": jnp.asarray(scale_p.T, dtype=jnp.bfloat16),
        "min_pt": jnp.asarray(min_p.T, dtype=jnp.bfloat16),
    })


def pack_q3_k(raw: np.ndarray, shape: tuple[int, int]) -> QTensor:
    """Q3_K packed layout: same plane-structured 2-bit stream as Q2_K plus a
    high-bit sidecar re-laid per half at pack time — hm2 byte (2s+h, l) bit j
    is the 3rd bit of element 256s+128h+32j+l (from hmask byte l bit 4h+j,
    dequantize_row_q3_K ggml/src/ggml-quants.c).  Scales are the signed
    6-bit sub-scales (d * (sc-32)) pre-decoded to bf16, plane-major."""
    rows, cols = shape
    nsb = cols // QK_K
    blocks = np.ascontiguousarray(raw).reshape(rows, nsb, 110)
    hmask = blocks[:, :, :32]
    qs = blocks[:, :, 32:96].reshape(rows, nsb * 64)
    sc16 = (nq._unpack_q3_scales(blocks[:, :, 96:108].reshape(-1, 12))
            .astype(np.float32) - 32.0).reshape(rows, nsb, 16)
    d = blocks[:, :, 108:110].copy().view(np.float16).astype(np.float32)[..., 0]
    scales = d[..., None] * sc16
    hm2 = np.concatenate([(hmask >> 0) & 0xF, (hmask >> 4) & 0xF],
                         axis=2).reshape(rows, nsb * 64)
    s5 = scales.reshape(rows, nsb, 2, 4, 2)
    scale_p = np.concatenate([s5[:, :, :, j, :].reshape(rows, -1)
                              for j in range(4)], axis=1)
    return QTensor(kind="q3_k", shape=shape, data={
        "qs2": jnp.asarray(qs),
        "hm2": jnp.asarray(hm2.astype(np.uint8)),
        "scale_p": jnp.asarray(scale_p, dtype=jnp.bfloat16),
        "scale_pt": jnp.asarray(scale_p.T, dtype=jnp.bfloat16),
    })


def pack_q4_k_i8(raw: np.ndarray, shape: tuple[int, int]) -> QTensor:
    """Q4_K re-laid-out as per-group int8: EXACT same decoded values
    (q in 0..15 stored as int8; w = q*scale - min as before) at 8.5 bits/weight
    in HBM instead of 4.75. Trades ~80% more weight traffic for a dequant that
    is 1 cast + 1 multiply per weight — ~2x faster decode on v5e, where the
    nibble unpack is VPU-bound (PERF_NOTES.md)."""
    rows, cols = shape
    nsb = cols // QK_K
    blocks = np.ascontiguousarray(raw).reshape(rows, nsb, 144)
    d = blocks[:, :, 0:2].copy().view(np.float16).astype(np.float32)[..., 0]
    dmin = blocks[:, :, 2:4].copy().view(np.float16).astype(np.float32)[..., 0]
    sc, mn = _unpack_k_scales_np(blocks[:, :, 4:16].reshape(-1, 12))
    scales = (d.reshape(-1, 1) * sc).reshape(rows, nsb * 8)
    mins = (dmin.reshape(-1, 1) * mn).reshape(rows, nsb * 8)
    qs = blocks[:, :, 16:].reshape(rows, nsb, 4, 32)
    lo = (qs & 0xF).astype(np.int8)
    hi = (qs >> 4).astype(np.int8)
    q = np.stack([lo, hi], axis=3).reshape(rows, cols)  # logical col order
    return QTensor(kind="q4_k_i8", shape=shape, data={
        "q": jnp.asarray(q),
        "scale": jnp.asarray(scales, dtype=jnp.bfloat16),
        "min": jnp.asarray(mins, dtype=jnp.bfloat16),
    })


def _q4k_packer(raw, shape):
    import os

    if os.environ.get("KCPP_Q4K_LAYOUT", "packed") == "i8":
        return pack_q4_k_i8(raw, shape)
    return pack_q4_k(raw, shape)


# ---------------------------------------------------------------------------
# expanded serving layouts for the per-16-group trio (VERDICT r4 item 7):
# the dense 2/3/6-bit plane layouts are VPU-expansion-bound on v5e (every
# byte expands to 2-4 values with shift/mask lane ops, so kernel time is set
# by the VPU while bytes shrink — effective GB/s stalls at 0.5-0.66x q4_k).
# These repacks trade HBM bytes for near-zero in-kernel expansion:
#   q6_k  -> "q6_k_i8f": signed i8 values (q-32), ONE full-width i8 MXU dot,
#            no plane extraction at all (8 bpw + 1 bpw scale rows)
#   q3_k  -> "q3_k_n4":  plane-split nibbles (lo half | hi half, the same
#            packing the Q4 KV cache uses), 2 extract ops + 2 dots
#   q2_k  -> "q2_k_n4":  same nibble container (values 0..3) + min sidecar
# Selection: KCPP_KQ_LAYOUT=expanded at load time (opt-in; the dense
# layouts remain the HBM-tight default).
# ---------------------------------------------------------------------------


def _q6k_logical_values(raw: np.ndarray, shape) -> tuple[np.ndarray, np.ndarray]:
    """(values q6 0..63 logical order (R, C), per-16 scales (R, C/16))."""
    rows, cols = shape
    nsb = cols // QK_K
    blocks = np.ascontiguousarray(raw).reshape(rows, nsb, 210)
    ql = blocks[:, :, :128].reshape(rows, nsb, 2, 2, 32)  # (S, half, bg, l)
    qh = blocks[:, :, 128:192].reshape(rows, nsb, 2, 32)  # (S, half, l)
    sc8 = blocks[:, :, 192:208].view(np.int8).astype(np.float32)
    d = blocks[:, :, 208:210].copy().view(np.float16).astype(np.float32)[..., 0]
    scales = (d[..., None] * sc8).reshape(rows, nsb * 16)
    lo = (ql & 0xF).astype(np.int32)       # planes j=0 (bg 0), j=1 (bg 1)
    hi = (ql >> 4).astype(np.int32)        # planes j=2, j=3
    qhi = qh.astype(np.int32)
    planes = np.stack([
        lo[:, :, :, 0, :] | ((qhi & 3) << 4),
        lo[:, :, :, 1, :] | (((qhi >> 2) & 3) << 4),
        hi[:, :, :, 0, :] | (((qhi >> 4) & 3) << 4),
        hi[:, :, :, 1, :] | (((qhi >> 6) & 3) << 4),
    ], axis=3)  # (rows, nsb, half, plane, 32): elem 256s+128h+32j+l
    q = planes.reshape(rows, cols)
    return q, scales


def pack_q6_k_i8f(raw: np.ndarray, shape: tuple[int, int]) -> QTensor:
    """Q6_K as full signed int8 (EXACT same decoded values, w = v*scale with
    v = q-32): zero in-kernel expansion, one i8 MXU dot per row block.

    Carries the DENSE layout's kernel fields alongside: T=1 decode streams
    the expanded i8 plane, T>1 (batched decode / prefill) streams the dense
    6.56 bpw fields through the existing kernels — per-path bandwidth at
    the cost of holding both layouts resident (the q4_k multi-layout
    QTensor precedent)."""
    q, scales = _q6k_logical_values(raw, shape)
    v = (q - 32).astype(np.int8)
    data = dict(pack_q6_k(raw, shape).data)
    data.update({
        "q": jnp.asarray(v),
        "scale_t": jnp.asarray(scales.T.copy(), dtype=jnp.bfloat16),
    })
    return QTensor(kind="q6_k_i8f", shape=shape, data=data)


def _nibble_plane_split(q: np.ndarray) -> np.ndarray:
    """(R, C) small ints -> (R, C/2) bytes: byte c = elem c | elem c+C/2 <<4
    (the kv/paged.py plane-split convention)."""
    C = q.shape[1]
    return (q[:, :C // 2] | (q[:, C // 2:] << 4)).astype(np.uint8)


def pack_q3_k_n4(raw: np.ndarray, shape: tuple[int, int]) -> QTensor:
    """Q3_K as plane-split nibbles (biased values 0..7; the -4 offset stays
    an exact f32 group-sum correction like the dense kernel's)."""
    rows, cols = shape
    nsb = cols // QK_K
    blocks = np.ascontiguousarray(raw).reshape(rows, nsb, 110)
    hmask = blocks[:, :, :32]
    qs = blocks[:, :, 32:96].reshape(rows, nsb, 64)
    sc16 = (nq._unpack_q3_scales(blocks[:, :, 96:108].reshape(-1, 12))
            .astype(np.float32) - 32.0).reshape(rows, nsb, 16)
    d = blocks[:, :, 108:110].copy().view(np.float16).astype(np.float32)[..., 0]
    scales = (d[..., None] * sc16).reshape(rows, nsb * 16)
    # logical element 256s+128h+32j+l: 2-bit from qs byte 32h+l bits 2j,
    # third bit from hmask byte l bit 4h+j
    qs5 = qs.reshape(rows, nsb, 2, 32).astype(np.int32)    # (S, h, l)
    hm5 = hmask.astype(np.int32)                           # (S, l)
    planes = []
    for h in range(2):
        for j in range(4):
            lo2 = (qs5[:, :, h, :] >> (2 * j)) & 3
            b3 = (hm5 >> (4 * h + j)) & 1
            planes.append(lo2 | (b3 << 2))
    # order: h-major j-minor -> logical (s, h, j, l)
    q = np.stack(planes, axis=2).reshape(rows, nsb, 2, 4, 32) \
        .reshape(rows, cols)
    data = dict(pack_q3_k(raw, shape).data)  # dense fields for T>1 paths
    data.update({
        "q": jnp.asarray(_nibble_plane_split(q)),
        "scale": jnp.asarray(scales, dtype=jnp.bfloat16),
        "scale_t": jnp.asarray(scales.T.copy(), dtype=jnp.bfloat16),
    })
    return QTensor(kind="q3_k_n4", shape=shape, data=data)


def pack_q2_k_n4(raw: np.ndarray, shape: tuple[int, int]) -> QTensor:
    """Q2_K as plane-split nibbles (values 0..3) + per-16 min sidecar
    (w = q*scale - min, exact min via the f32 group-sum dot)."""
    rows, cols = shape
    nsb = cols // QK_K
    blocks = np.ascontiguousarray(raw).reshape(rows, nsb, 84)
    sc = blocks[:, :, :16]
    qs = blocks[:, :, 16:80].reshape(rows, nsb, 2, 32).astype(np.int32)
    d = blocks[:, :, 80:82].copy().view(np.float16).astype(np.float32)[..., 0]
    dmin = blocks[:, :, 82:84].copy().view(np.float16).astype(np.float32)[..., 0]
    scales = (d[..., None] * (sc & 0xF).astype(np.float32)
              ).reshape(rows, nsb * 16)
    mins = (dmin[..., None] * (sc >> 4).astype(np.float32)
            ).reshape(rows, nsb * 16)
    planes = [(qs[:, :, h, :] >> (2 * j)) & 3
              for h in range(2) for j in range(4)]
    q = np.stack(planes, axis=2).reshape(rows, nsb, 2, 4, 32) \
        .reshape(rows, cols)
    data = dict(pack_q2_k(raw, shape).data)  # dense fields for T>1 paths
    data.update({
        "q": jnp.asarray(_nibble_plane_split(q)),
        "scale": jnp.asarray(scales, dtype=jnp.bfloat16),
        "scale_t": jnp.asarray(scales.T.copy(), dtype=jnp.bfloat16),
        "min": jnp.asarray(mins, dtype=jnp.bfloat16),
        "min_t": jnp.asarray(mins.T.copy(), dtype=jnp.bfloat16),
    })
    return QTensor(kind="q2_k_n4", shape=shape, data=data)


def _kq_packer(dense_fn, expanded_fn):
    import os

    def pick(raw, shape):
        if os.environ.get("KCPP_KQ_LAYOUT", "dense") == "expanded":
            return expanded_fn(raw, shape)
        return dense_fn(raw, shape)

    return pick


def _fields_4bit_planes(q: np.ndarray, scales: np.ndarray, mins: np.ndarray,
                        shape, hi_bits: np.ndarray | None = None) -> QTensor:
    """Assemble q4_k/q5_k-kind fields from logical-order values.

    q: (rows, cols) ints (low 4 bits packed; bit 4 via hi_bits); scales/mins:
    (rows, cols//32) per-32-group such that w = q*scale - min. Emits the v2
    contiguous-plane superblock layout (see pack_q4_k) so every existing
    Pallas kernel + TP sharding rule applies unchanged."""
    rows, cols = shape
    nsb = cols // QK_K
    qs = q.reshape(rows, nsb, QK_K)
    qs2 = ((qs[:, :, :128] & 0xF)
           | ((qs[:, :, 128:] & 0xF) << 4)).reshape(rows, cols // 2)
    s4 = scales.reshape(rows, nsb, 2, 4)
    m4 = mins.reshape(rows, nsb, 2, 4)
    s_lo = s4[:, :, 0].reshape(rows, nsb * 4)
    s_hi = s4[:, :, 1].reshape(rows, nsb * 4)
    m_lo = m4[:, :, 0].reshape(rows, nsb * 4)
    m_hi = m4[:, :, 1].reshape(rows, nsb * 4)
    data = {
        "qs2": jnp.asarray(qs2.astype(np.uint8)),
        "min": jnp.asarray(mins.reshape(rows, nsb * 8), dtype=jnp.bfloat16),
        "scale_lo": jnp.asarray(s_lo, dtype=jnp.bfloat16),
        "scale_hi": jnp.asarray(s_hi, dtype=jnp.bfloat16),
        "slo_t": jnp.asarray(s_lo.T, dtype=jnp.bfloat16),
        "shi_t": jnp.asarray(s_hi.T, dtype=jnp.bfloat16),
        "mlo_t": jnp.asarray(m_lo.T, dtype=jnp.bfloat16),
        "mhi_t": jnp.asarray(m_hi.T, dtype=jnp.bfloat16),
    }
    if hi_bits is not None:
        hb = hi_bits.reshape(rows, nsb, QK_K)
        data["hb"] = jnp.asarray(
            ((hb[:, :, :128] & 1) | ((hb[:, :, 128:] & 1) << 1))
            .reshape(rows, cols // 2).astype(np.uint8))
        return QTensor(kind="q5_k", shape=shape, data=data)
    return QTensor(kind="q4_k", shape=shape, data=data)


def pack_q4_0(raw: np.ndarray, shape: tuple[int, int]) -> QTensor:
    """Q4_0 (32-elem blocks, fp16 d, w=(q-8)d — ggml-common.h:144) re-laid
    into the q4_k v2 plane layout: scale=d, min=8d (the -8 offset folds into
    the K-quant min term), so the q4_k kernels serve it as-is at 4.5 bpw."""
    rows, cols = shape
    nb = cols // 32
    blocks = np.ascontiguousarray(raw).reshape(rows, nb, 18)
    d = blocks[:, :, 0:2].copy().view(np.float16).astype(np.float32)[..., 0]
    qs = blocks[:, :, 2:]  # byte j: elem j lo, elem j+16 hi
    lo = qs & 0xF
    hi = qs >> 4
    q = np.concatenate([lo, hi], axis=2).reshape(rows, cols)
    return _fields_4bit_planes(q, d, 8.0 * d, shape)


def pack_q4_1(raw: np.ndarray, shape: tuple[int, int]) -> QTensor:
    """Q4_1 (w = q*d + m): scale=d, min=-m."""
    rows, cols = shape
    nb = cols // 32
    blocks = np.ascontiguousarray(raw).reshape(rows, nb, 20)
    d = blocks[:, :, 0:2].copy().view(np.float16).astype(np.float32)[..., 0]
    m = blocks[:, :, 2:4].copy().view(np.float16).astype(np.float32)[..., 0]
    qs = blocks[:, :, 4:]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=2).reshape(rows, cols)
    return _fields_4bit_planes(q, d, -m, shape)


def pack_q5_0(raw: np.ndarray, shape: tuple[int, int]) -> QTensor:
    """Q5_0 (w = (q5-16)d): q5_k layout with scale=d, min=16d."""
    rows, cols = shape
    nb = cols // 32
    blocks = np.ascontiguousarray(raw).reshape(rows, nb, 22)
    d = blocks[:, :, 0:2].copy().view(np.float16).astype(np.float32)[..., 0]
    qh = blocks[:, :, 2:6].copy().view(np.uint32)[..., 0]  # (rows, nb)
    qs = blocks[:, :, 6:]
    j = np.arange(16, dtype=np.uint32)
    b_lo = (qh[..., None] >> j) & 1          # elems 0..15
    b_hi = (qh[..., None] >> (j + 16)) & 1   # elems 16..31
    q = np.concatenate([qs & 0xF, qs >> 4], axis=2).reshape(rows, cols)
    hi5 = np.concatenate([b_lo, b_hi], axis=2).reshape(rows, cols)
    q = q | (hi5.astype(np.uint8) << 4)
    return _fields_4bit_planes(q, d, 16.0 * d, shape, hi_bits=q >> 4)


def pack_q5_1(raw: np.ndarray, shape: tuple[int, int]) -> QTensor:
    """Q5_1 (w = q5*d + m): q5_k layout with scale=d, min=-m."""
    rows, cols = shape
    nb = cols // 32
    blocks = np.ascontiguousarray(raw).reshape(rows, nb, 24)
    d = blocks[:, :, 0:2].copy().view(np.float16).astype(np.float32)[..., 0]
    m = blocks[:, :, 2:4].copy().view(np.float16).astype(np.float32)[..., 0]
    qh = blocks[:, :, 4:8].copy().view(np.uint32)[..., 0]
    qs = blocks[:, :, 8:]
    j = np.arange(16, dtype=np.uint32)
    b_lo = (qh[..., None] >> j) & 1
    b_hi = (qh[..., None] >> (j + 16)) & 1
    q = np.concatenate([qs & 0xF, qs >> 4], axis=2).reshape(rows, cols)
    hi5 = np.concatenate([b_lo, b_hi], axis=2).reshape(rows, cols)
    q = q | (hi5.astype(np.uint8) << 4)
    return _fields_4bit_planes(q, d, -m, shape, hi_bits=q >> 4)


_IQ_NATIVE_KINDS = {
    GGMLType.IQ2_XXS: "iq2p", GGMLType.IQ2_XS: "iq2p", GGMLType.IQ2_S: "iq2p",
    GGMLType.IQ3_XXS: "iq3px", GGMLType.IQ3_S: "iq3ps",
    GGMLType.IQ1_S: "iq1p", GGMLType.IQ1_M: "iq1p",
}
# code maps: |grid value| -> small code the kernel decodes arithmetically
_IQ2_CODE = np.zeros(64, np.uint8)
_IQ2_CODE[[8, 25, 43]] = [0, 1, 2]          # v = 8 + 17c + (c>>1)
_IQ3X_CODE = np.zeros(64, np.uint8)
_IQ3X_CODE[[4, 12, 20, 28, 36, 44, 52, 62]] = np.arange(8)  # v = 4+8k (+2@7)
_IQ3S_CODE = np.zeros(16, np.uint8)
_IQ3S_CODE[[1, 3, 5, 7, 9, 11, 13, 15]] = np.arange(8)      # v = 2k+1


def pack_iq_native(raw: np.ndarray, shape: tuple[int, int],
                   ggml_type: GGMLType) -> QTensor:
    """Native low-bit serving layout for the codebook IQ formats.

    The grids' value alphabets are tiny and arithmetically decodable
    (iq2: {8,25,43}; iq3_s: 2k+1; iq3_xxs: 4+8k (+2 at k=7); iq1: {-1,0,1}),
    so instead of re-expanding to int8 at 8.5 bpw (the r2 stopgap) the
    codebook entries become per-element CODES in q2_k-style 2-bit plane
    streams plus sign-bit sidecars, decoded with shifts/xors inside the
    kernel — no in-kernel LUT gather.  HBM footprint: iq2 ~3.5-4 bpw,
    iq3 ~4.5-5, iq1 ~2.5-4 (vs 8.5 before; native file bpw is 2.06-3.44 —
    the remaining gap is the vector-quantized grid index the TPU cannot
    gather at stream rate).  Reference layouts: ggml-common.h:336-419.

    Plane semantics match pack_q2_k: byte b of the (R, C/4) stream holds
    2-bit planes j=0..3; plane j covers logical cols 128*blk + 32*j + l.
    Per-G scales ride plane-major (scale_p (R, in/G) + lane-transposed
    scale_pt); IQ1's per-group delta folds into min_p/min_pt = -(s*delta),
    the exact q2_k min-term machinery."""
    rows, cols = shape
    v, scales, delta, G = nq.iq_decompose(raw.reshape(rows, -1), ggml_type)
    v = v.reshape(rows, cols).astype(np.int16)
    scales = scales.reshape(rows, cols // G)
    kind = _IQ_NATIVE_KINDS[ggml_type]

    v4 = v.reshape(rows, cols // 128, 4, 32)       # (R, blk, plane, l)
    mag = np.abs(v4).astype(np.int64)
    sgn = (v4 < 0).astype(np.uint8)
    if kind == "iq2p":
        code = _IQ2_CODE[mag]
    elif kind == "iq3px":
        code = _IQ3X_CODE[mag]
    elif kind == "iq3ps":
        code = _IQ3S_CODE[mag]
    else:  # iq1p: v in {-1,0,1} -> c = v+1
        code = (v4 + 1).astype(np.uint8)
        sgn = None
    qs2 = np.zeros((rows, cols // 128, 32), np.uint8)
    for j in range(4):
        qs2 |= (code[:, :, j, :] & 3) << (2 * j)
    data = {"qs2": jnp.asarray(qs2.reshape(rows, cols // 4))}
    if kind == "iq2p":
        # signs (R, C/8): bit j = plane j position e (lo half), bit 4+j =
        # plane j position e + C/8 (hi half) — halves are contiguous plane
        # runs, so the kernel reassembles with a lane-aligned concat
        sp = sgn.transpose(0, 2, 1, 3).reshape(rows, 4, cols // 4)
        sg = np.zeros((rows, cols // 8), np.uint8)
        for j in range(4):
            sg |= (sp[:, j, :cols // 8] << j) | (sp[:, j, cols // 8:] << (4 + j))
        data["sg"] = jnp.asarray(sg)
    elif kind in ("iq3px", "iq3ps"):
        # hs (R, C/4): bits 0..3 = high code bit per plane, 4..7 = sign
        hs = np.zeros((rows, cols // 128, 32), np.uint8)
        for j in range(4):
            hs |= ((code[:, :, j, :] >> 2) & 1) << j
            hs |= sgn[:, :, j, :] << (4 + j)
        data["hs"] = jnp.asarray(hs.reshape(rows, cols // 4))

    # plane-major scale order: plane j plane-group k (m = 32//G groups per
    # 32-run) <-> logical group 4m*(k//m) + m*j + (k%m)
    m = 32 // G
    n_g = cols // G
    n_p = n_g // 4  # groups per plane
    j_idx = np.repeat(np.arange(4), n_p)
    k_idx = np.tile(np.arange(n_p), 4)
    lg = 4 * m * (k_idx // m) + m * j_idx + (k_idx % m)
    sp_arr = scales[:, lg]  # (R, n_g) plane-major
    data["scale_p"] = jnp.asarray(sp_arr, dtype=jnp.bfloat16)
    data["scale_pt"] = jnp.asarray(sp_arr.T, dtype=jnp.bfloat16)
    if delta is not None:
        mp = -(scales * delta.reshape(rows, n_g))[:, lg]
        data["min_p"] = jnp.asarray(mp, dtype=jnp.bfloat16)
        data["min_pt"] = jnp.asarray(mp.T, dtype=jnp.bfloat16)
    return QTensor(kind=kind, shape=shape, data=data)


def pack_q8_expand(raw: np.ndarray, shape: tuple[int, int],
                   ggml_type: GGMLType = GGMLType.IQ4_NL) -> QTensor:
    """IQ/TQ grid-codebook formats: exact dequant (gguf/quants.py) then
    per-32-group int8 requantization into q8_0-kind fields — the existing
    q8_0 Pallas kernels serve them packed at 8.5 bpw HBM (vs 16 for the r1
    dequant-to-bf16 fallback). The extra int8 step adds <=0.4% noise on top
    of the formats' own 2-4 bpw error (measured in QUALITY.md); a true
    grid-LUT nibble kernel is the follow-up. Ref layouts:
    ggml/src/ggml-common.h:336-419."""
    rows, cols = shape
    w = nq.dequantize(raw.reshape(rows, -1), ggml_type).reshape(rows, cols)
    g = w.reshape(rows, cols // 32, 32).astype(np.float32)
    amax = np.abs(g).max(axis=2)
    scale = amax / 127.0
    inv = np.where(scale > 0, 1.0 / np.maximum(scale, 1e-30), 0.0)
    q = np.clip(np.round(g * inv[..., None]), -127, 127).astype(np.int8)
    return QTensor(kind="q8_0", shape=shape, data={
        "q": jnp.asarray(q.reshape(rows, cols)),
        "scale": jnp.asarray(scale, dtype=jnp.bfloat16),
        "scale_t": jnp.asarray(scale.T, dtype=jnp.bfloat16),
    })


_Q8_EXPAND_TYPES = (
    GGMLType.IQ4_NL, GGMLType.IQ4_XS, GGMLType.IQ3_XXS, GGMLType.IQ3_S,
    GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S, GGMLType.IQ1_S,
    GGMLType.IQ1_M, GGMLType.TQ1_0, GGMLType.TQ2_0,
)


def _iq_packer(raw, shape, ggml_type):
    """IQ1/IQ2/IQ3: native low-bit plane layout (default) or the r2 int8
    re-expansion (KCPP_IQ_NATIVE=0 reverts)."""
    import os

    if os.environ.get("KCPP_IQ_NATIVE", "1") == "1" and shape[1] % QK_K == 0:
        return pack_iq_native(raw, shape, ggml_type)
    return pack_q8_expand(raw, shape, ggml_type=ggml_type)


_PACKERS = {
    GGMLType.Q8_0: pack_q8_0,
    GGMLType.Q2_K: _kq_packer(pack_q2_k, pack_q2_k_n4),
    GGMLType.Q3_K: _kq_packer(pack_q3_k, pack_q3_k_n4),
    GGMLType.Q4_K: _q4k_packer,
    GGMLType.Q5_K: pack_q5_k,
    GGMLType.Q6_K: _kq_packer(pack_q6_k, pack_q6_k_i8f),
    GGMLType.Q4_0: pack_q4_0,
    GGMLType.Q4_1: pack_q4_1,
    GGMLType.Q5_0: pack_q5_0,
    GGMLType.Q5_1: pack_q5_1,
}
for _t in _Q8_EXPAND_TYPES:
    _PACKERS[_t] = partial(pack_q8_expand, ggml_type=_t)
for _t in _IQ_NATIVE_KINDS:
    _PACKERS[_t] = partial(_iq_packer, ggml_type=_t)


_32COL_TYPES = (GGMLType.Q8_0,) + _Q8_EXPAND_TYPES
_BLOCK32_TYPES = (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1)


def from_gguf(raw: np.ndarray, ggml_type: GGMLType, shape: tuple[int, ...],
              packed: bool = True, dtype=jnp.bfloat16) -> QTensor:
    """Build a QTensor from GGUF raw bytes. 2-D weights of supported types keep
    their packed layout; everything else dequantizes to a dense array."""
    if packed and len(shape) == 2 and ggml_type in _PACKERS:
        cols = shape[1]
        need = 32 if ggml_type in _32COL_TYPES else QK_K
        if cols % need == 0:
            return _PACKERS[ggml_type](raw, shape)  # type: ignore[arg-type]
        if ggml_type in _BLOCK32_TYPES and cols % 32 == 0:
            # odd widths: still serve packed through the int8 expansion
            return pack_q8_expand(raw, shape, ggml_type=ggml_type)
    x = nq.dequantize(raw.reshape(-1, raw.shape[-1]), ggml_type).reshape(shape)
    return dense(x, dtype=dtype)


# ---------------------------------------------------------------------------
# dequant (XLA path — fused where possible; Pallas kernels override in ops/)
# ---------------------------------------------------------------------------

def dequant_xla(qt: QTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Unpack a packed QTensor to a dense (out, in) array with XLA vector ops."""
    rows, cols = qt.shape
    if qt.kind == "dense":
        return qt.data["w"].astype(dtype)
    if qt.kind == "q8_0":
        q = qt.data["q"].astype(jnp.float32).reshape(rows, cols // 32, 32)
        s = qt.data["scale"].astype(jnp.float32)[..., None]
        return (q * s).reshape(rows, cols).astype(dtype)
    if qt.kind == "q4_k_i8":
        q = qt.data["q"].astype(jnp.float32).reshape(rows, cols // 32, 32)
        s = qt.data["scale"].astype(jnp.float32)[..., None]
        m = qt.data["min"].astype(jnp.float32)[..., None]
        return (q * s - m).reshape(rows, cols).astype(dtype)
    if qt.kind == "q6_k_i8f":
        q = qt.data["q"].astype(jnp.float32).reshape(rows, cols // 16, 16)
        s = qt.data["scale"].astype(jnp.float32)[..., None]
        return (q * s).reshape(rows, cols).astype(dtype)
    if qt.kind in ("q3_k_n4", "q2_k_n4"):
        p = qt.data["q"].astype(jnp.int32)
        q = jnp.concatenate([p & 0xF, p >> 4], axis=1)  # plane-split order
        bias = 4.0 if qt.kind == "q3_k_n4" else 0.0
        qf = (q.astype(jnp.float32) - bias).reshape(rows, cols // 16, 16)
        s = qt.data["scale"].astype(jnp.float32)[..., None]
        out = qf * s
        if "min" in qt.data:
            out = out - qt.data["min"].astype(jnp.float32)[..., None]
        return out.reshape(rows, cols).astype(dtype)
    if qt.kind == "q4_k":
        qs = qt.data["qs2"].reshape(rows, -1, 128)  # (rows, nsb, 128)
        lo = (qs & 0xF).astype(jnp.int8)    # cols 256s + [0, 128)
        hi = (qs >> 4).astype(jnp.int8)     # cols 256s + [128, 256)
        q = jnp.concatenate([lo, hi], axis=2).reshape(rows, cols)
        if "scale" in qt.data:
            s = qt.data["scale"].astype(jnp.float32).reshape(rows, -1, 1)
        else:  # logical order = [lo-plane groups | hi-plane groups] per sb
            slo = qt.data["scale_lo"].astype(jnp.float32).reshape(rows, -1, 4)
            shi = qt.data["scale_hi"].astype(jnp.float32).reshape(rows, -1, 4)
            s = jnp.concatenate([slo, shi], axis=2).reshape(rows, -1, 1)
        m = qt.data["min"].astype(jnp.float32).reshape(rows, -1, 1)
        qf = q.astype(jnp.float32).reshape(rows, -1, 32)
        return (qf * s - m).reshape(rows, cols).astype(dtype)
    if qt.kind == "q5_k":
        qs = qt.data["qs2"].reshape(rows, -1, 128)  # (rows, nsb, 128)
        hb = qt.data["hb"].reshape(rows, -1, 128)
        lo = ((qs & 0xF) | ((hb & 1) << 4)).astype(jnp.int8)
        hi = ((qs >> 4) | ((hb >> 1) & 1) << 4).astype(jnp.int8)
        q = jnp.concatenate([lo, hi], axis=2).reshape(rows, cols)
        slo = qt.data["scale_lo"].astype(jnp.float32).reshape(rows, -1, 4)
        shi = qt.data["scale_hi"].astype(jnp.float32).reshape(rows, -1, 4)
        s = jnp.concatenate([slo, shi], axis=2).reshape(rows, -1, 1)
        m = qt.data["min"].astype(jnp.float32).reshape(rows, -1, 1)
        qf = q.astype(jnp.float32).reshape(rows, -1, 32)
        return (qf * s - m).reshape(rows, cols).astype(dtype)
    if qt.kind == "q6_k":
        ql = qt.data["ql"].reshape(rows, -1, 2, 32)  # (rows, nsb*2, plane-pair, 32)
        qh = qt.data["qh"].reshape(rows, -1, 32)     # (rows, nsb*2, 32)
        lo0 = (ql[:, :, 0, :] & 0xF).astype(jnp.int32)   # plane j=0
        lo1 = (ql[:, :, 1, :] & 0xF).astype(jnp.int32)   # plane j=1
        hi0 = (ql[:, :, 0, :] >> 4).astype(jnp.int32)    # plane j=2
        hi1 = (ql[:, :, 1, :] >> 4).astype(jnp.int32)    # plane j=3
        qhi = qh.astype(jnp.int32)
        planes = jnp.stack([
            lo0 | ((qhi & 3) << 4),
            lo1 | (((qhi >> 2) & 3) << 4),
            hi0 | (((qhi >> 4) & 3) << 4),
            hi1 | (((qhi >> 6) & 3) << 4),
        ], axis=2)  # (rows, nhalf, 4, 32)
        q = planes.reshape(rows, cols) - 32
        s = qt.data["scale"].astype(jnp.float32).reshape(rows, -1, 1)
        qf = q.astype(jnp.float32).reshape(rows, -1, 16)
        return (qf * s).reshape(rows, cols).astype(dtype)
    if qt.kind in ("iq2p", "iq3px", "iq3ps", "iq1p"):
        cols4 = cols // 4
        qs = qt.data["qs2"].reshape(rows, cols // 128, 32).astype(jnp.int32)
        if qt.kind == "iq2p":
            sg = qt.data["sg"].reshape(rows, cols // 8).astype(jnp.int32)
        elif qt.kind != "iq1p":
            hs = qt.data["hs"].reshape(rows, cols // 128, 32).astype(jnp.int32)
        planes = []
        for j in range(4):
            c = (qs >> (2 * j)) & 3
            if qt.kind == "iq2p":
                v = 8 + 17 * c + (c >> 1)
                s_pl = jnp.concatenate(
                    [(sg >> j) & 1, (sg >> (4 + j)) & 1],
                    axis=1).reshape(rows, cols // 128, 32)
                v = v * (1 - 2 * s_pl)
            elif qt.kind in ("iq3px", "iq3ps"):
                k = c | (((hs >> j) & 1) << 2)
                v = (jnp.where(k == 7, 62, 4 + 8 * k)
                     if qt.kind == "iq3px" else 2 * k + 1)
                v = v * (1 - 2 * ((hs >> (4 + j)) & 1))
            else:  # iq1p
                v = c - 1
            planes.append(v)
        q = jnp.stack(planes, axis=2).reshape(rows, cols).astype(jnp.float32)
        # invert the plane-major scale permutation (pack_iq_native lg map)
        n_g = qt.data["scale_p"].shape[1]
        G = cols // n_g
        m = 32 // G
        n_p = n_g // 4
        j_idx = np.repeat(np.arange(4), n_p)
        k_idx = np.tile(np.arange(n_p), 4)
        lg = 4 * m * (k_idx // m) + m * j_idx + (k_idx % m)
        inv = np.argsort(lg)
        s = qt.data["scale_p"][:, inv].astype(jnp.float32)[..., None]
        out = q.reshape(rows, n_g, G) * s
        if "min_p" in qt.data:
            out = out - qt.data["min_p"][:, inv].astype(jnp.float32)[..., None]
        return out.reshape(rows, cols).astype(dtype)
    if qt.kind in ("q2_k", "q3_k"):
        qs = qt.data["qs2"].reshape(rows, -1, 32).astype(jnp.int32)  # (R,G,32)
        G = qs.shape[1]
        if qt.kind == "q3_k":
            hm = qt.data["hm2"].reshape(rows, G, 32).astype(jnp.int32)
            planes = jnp.stack(
                [((qs >> (2 * j)) & 3) | (((hm >> j) & 1) << 2)
                 for j in range(4)], axis=2)  # (R, G, 4, 32)
            q = planes.reshape(rows, cols).astype(jnp.float32) - 4.0
        else:
            planes = jnp.stack([(qs >> (2 * j)) & 3 for j in range(4)], axis=2)
            q = planes.reshape(rows, cols).astype(jnp.float32)
        # plane-major (j | g,t) scales -> logical (g | j,t) order
        def logical(sp):
            return (sp.astype(jnp.float32).reshape(rows, 4, G, 2)
                    .transpose(0, 2, 1, 3).reshape(rows, -1, 1))
        s = logical(qt.data["scale_p"])
        out = q.reshape(rows, -1, 16) * s
        if qt.kind == "q2_k":
            out = out - logical(qt.data["min_p"])
        return out.reshape(rows, cols).astype(dtype)
    raise ValueError(f"unknown QTensor kind {qt.kind}")


# imatrix collection hook (tools/imatrix.py): when set, every eager matmul
# records sum-of-squared activations per input column — the importance
# statistics the reference's examples/imatrix collects via ggml callbacks
_COLLECTOR = None


class ActivationCollector:
    """Accumulates per-column sum(x^2) for named QTensors (imatrix)."""

    def __init__(self, names: dict[int, str]):
        self.names = names  # id(QTensor) -> tensor name
        self.sums: dict[str, np.ndarray] = {}
        self.counts: dict[str, int] = {}

    def record(self, qt: QTensor, x) -> None:
        name = self.names.get(id(qt))
        if name is None or isinstance(x, jax.core.Tracer):
            return
        x2 = np.asarray(x, np.float32).reshape(-1, qt.in_features)
        s = (x2 * x2).sum(axis=0)
        if name in self.sums:
            self.sums[name] += s
            self.counts[name] += x2.shape[0]
        else:
            self.sums[name] = s
            self.counts[name] = x2.shape[0]

    def weights(self) -> dict[str, np.ndarray]:
        return {n: s / max(self.counts[n], 1) for n, s in self.sums.items()}


class LayerRef:
    """A (layer-stacked QTensor, traced layer index) pair.

    `matmul` serves it through the scalar-prefetch stacked Pallas kernels
    (quant_matmul.matmul_packed_stacked) so a lax.scan decode body reads
    per-layer packed weights straight from HBM; when no stacked kernel
    covers the tensor, the layer is dynamic-sliced out and takes the
    regular path (the pre-round-3 scan behavior)."""
    __slots__ = ("qt", "li")

    def __init__(self, qt: QTensor, li):
        self.qt = qt
        self.li = li

    @property
    def kind(self):
        return self.qt.kind

    @property
    def shape(self):
        return self.qt.shape

    def take(self) -> QTensor:
        """Dynamic-slice this layer out of the stacked fields."""
        return QTensor(kind=self.qt.kind, shape=self.qt.shape,
                       data={n: a[self.li] for n, a in self.qt.data.items()})


def matmul(x: jnp.ndarray, qt: QTensor, out_dtype=None) -> jnp.ndarray:
    """y = x @ W^T for any QTensor. x: (..., in) -> (..., out)."""
    if isinstance(qt, LayerRef):
        out_dtype = out_dtype or x.dtype
        from . import quant_matmul
        y = quant_matmul.matmul_packed_stacked(x, qt.qt, qt.li)
        if y is not None:
            return y.astype(out_dtype)
        qt = qt.take()
    if _COLLECTOR is not None:
        _COLLECTOR.record(qt, x)
    out_dtype = out_dtype or x.dtype
    if qt.kind == "dense":
        w = qt.data["w"]
    else:
        from . import quant_matmul
        y = quant_matmul.matmul_packed(x, qt)
        if y is not None:
            return y.astype(out_dtype)
        w = dequant_xla(qt, dtype=x.dtype)
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.astype(out_dtype)
