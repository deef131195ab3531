"""Fused dequant+matmul Pallas kernels for packed QTensors.

TPU counterpart of ggml-cuda's mmq/mmvq and the CPU vec_dot paths
(/root/reference/ggml/src/ggml-cuda/mmq.cuh, mmvq.cu,
/root/reference/ggml/src/ggml-quants.c): weights stay packed in HBM
(4.5-6.5 bits/weight); each grid step DMAs a packed tile to VMEM, unpacks with
VPU bit ops (static reshapes only — the load-time repack in ops/linear.py was
chosen so nibble planes land in column order), rescales to bf16 and feeds the
MXU. Decode is HBM-bandwidth-bound, so the ~3.5x traffic cut vs bf16 is the
speed-of-light lever.

`matmul_packed(x, qt)` returns None when no kernel covers (kind, shape);
callers fall back to the XLA dequant path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .linear import QTensor

ROW_TILE = 256  # output-feature tile (8 superblocks)
T_TILE = 256    # token tile for prefill


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _to_bf16(q):
    """Mosaic-safe integer -> bf16 cast (no direct u8/i8 -> bf16 on TPU)."""
    return q.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _expand_scales(s, group: int):
    """(R, C/group) -> (R, C) by repeating each column group times."""
    R, G = s.shape
    return jnp.broadcast_to(s[:, :, None], (R, G, group)).reshape(R, G * group)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _q4k_kernel(x_ref, qs_ref, scale_ref, min_ref, out_ref):
    qs = qs_ref[:]
    R, C2 = qs.shape
    G = C2 // 32
    lo = (qs & 0xF).reshape(R, G, 1, 32)
    hi = (qs >> 4).reshape(R, G, 1, 32)
    q = _to_bf16(jnp.concatenate([lo, hi], axis=2).reshape(R, C2 * 2))
    s = _expand_scales(scale_ref[:].astype(jnp.bfloat16), 32)
    m = _expand_scales(min_ref[:].astype(jnp.bfloat16), 32)
    w = q * s - m
    out_ref[:] = jax.lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _q5k_kernel(x_ref, qs_ref, qh_ref, scale_ref, min_ref, out_ref):
    qs = qs_ref[:]
    R, C2 = qs.shape
    C = C2 * 2
    G = C2 // 32
    lo = (qs & 0xF).reshape(R, G, 1, 32)
    hi = (qs >> 4).reshape(R, G, 1, 32)
    q4 = jnp.concatenate([lo, hi], axis=2).reshape(R, C)
    # qh: (R, C/8) bytes; bit sb of byte e%32 -> col 32*sb + e%32 per superblock
    qh = qh_ref[:].reshape(R, C // 256, 1, 32)
    sb = jnp.arange(8, dtype=jnp.uint8).reshape(1, 1, 8, 1)
    bits = ((qh >> sb) & 1).reshape(R, C)
    q = _to_bf16(q4 + (bits << 4))
    s = _expand_scales(scale_ref[:].astype(jnp.bfloat16), 32)
    m = _expand_scales(min_ref[:].astype(jnp.bfloat16), 32)
    w = q * s - m
    out_ref[:] = jax.lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _q6k_kernel(x_ref, ql_ref, qh_ref, scale_ref, out_ref):
    ql = ql_ref[:]
    R = ql.shape[0]
    C = ql.shape[1] * 2
    H = C // 128  # 128-col halves
    ql = ql.reshape(R, H, 2, 32)       # [half, byte-pair-plane, 32]
    qh = qh_ref[:].reshape(R, H, 1, 32).astype(jnp.int32)
    lo0 = (ql[:, :, 0:1, :] & 0xF).astype(jnp.int32)
    lo1 = (ql[:, :, 1:2, :] & 0xF).astype(jnp.int32)
    hi0 = (ql[:, :, 0:1, :] >> 4).astype(jnp.int32)
    hi1 = (ql[:, :, 1:2, :] >> 4).astype(jnp.int32)
    planes = jnp.concatenate([
        lo0 | ((qh & 3) << 4),
        lo1 | (((qh >> 2) & 3) << 4),
        hi0 | (((qh >> 4) & 3) << 4),
        hi1 | (((qh >> 6) & 3) << 4),
    ], axis=2)  # (R, H, 4, 32)
    q = _to_bf16(planes.reshape(R, C) - 32)
    s = _expand_scales(scale_ref[:].astype(jnp.bfloat16), 16)
    w = q * s
    out_ref[:] = jax.lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _q8_0_kernel(x_ref, q_ref, scale_ref, out_ref):
    q = _to_bf16(q_ref[:])
    s = _expand_scales(scale_ref[:].astype(jnp.bfloat16), 32)
    w = q * s
    out_ref[:] = jax.lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

_KERNELS = {
    "q4_k": (_q4k_kernel, ("qs", "scale", "min"), {"qs": 2, "scale": 32, "min": 32}),
    "q5_k": (_q5k_kernel, ("qs", "qh", "scale", "min"),
             {"qs": 2, "qh": 8, "scale": 32, "min": 32}),
    "q6_k": (_q6k_kernel, ("ql", "qh", "scale"), {"ql": 2, "qh": 4, "scale": 16}),
    "q8_0": (_q8_0_kernel, ("q", "scale"), {"q": 1, "scale": 32}),
}


@functools.partial(jax.jit, static_argnames=("kind", "out_f", "in_f", "interpret"))
def _packed_matmul_2d(x, *fields, kind: str, out_f: int, in_f: int,
                      interpret: bool):
    """x: (T, C) bf16 -> (T, out_f) f32-accumulated bf16."""
    kernel, names, divisors = _KERNELS[kind]
    T = x.shape[0]
    t_tile = min(T_TILE, T)
    grid = (out_f // ROW_TILE, pl.cdiv(T, t_tile))

    in_specs = [pl.BlockSpec((t_tile, in_f), lambda o, t: (t, 0),
                             memory_space=pltpu.VMEM)]
    for name in names:
        cols = in_f // divisors[name]
        in_specs.append(pl.BlockSpec((ROW_TILE, cols), lambda o, t: (o, 0),
                                     memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((t_tile, ROW_TILE), lambda o, t: (t, o),
                            memory_space=pltpu.VMEM)

    flops = 2 * T * in_f * out_f
    bytes_accessed = sum(f.nbytes for f in fields) + x.nbytes + T * out_f * 2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((T, out_f), x.dtype),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(x, *fields)


def _pallas_enabled() -> bool:
    """The XLA path fuses dequant into the matmul and measures ~84-100% of the
    packed-weight HBM roofline on v5e (see bench.py), and this jaxlib's Mosaic
    rejects the concat/reshape patterns these kernels use on real TPU — so the
    Pallas path is opt-in on TPU (KCPP_PALLAS_MM=1) and always-on under the
    CPU interpreter (where tests validate kernel semantics)."""
    import os

    if jax.default_backend() == "cpu":
        return True
    return os.environ.get("KCPP_PALLAS_MM", "0") == "1"


def matmul_packed(x: jnp.ndarray, qt: QTensor):
    """Dispatch to a Pallas kernel if one covers this QTensor, else None."""
    if qt.kind not in _KERNELS or not _pallas_enabled():
        return None
    out_f, in_f = qt.shape
    if out_f % ROW_TILE or in_f % 256:
        return None
    _, names, _ = _KERNELS[qt.kind]
    fields = [qt.data[n] for n in names]

    lead = x.shape[:-1]
    x2 = x.reshape(-1, in_f)
    if x2.dtype not in (jnp.bfloat16, jnp.float32):
        x2 = x2.astype(jnp.bfloat16)
    y = _packed_matmul_2d(x2, *fields, kind=qt.kind, out_f=out_f, in_f=in_f,
                          interpret=_use_interpret())
    return y.reshape(*lead, out_f)
