"""Fused decode-attention Pallas kernel (the fattn-vec/mmvq-era decode path).

TPU counterpart of ggml-cuda's fattn vec kernels for single-token decode
(/root/reference/ggml/src/ggml-cuda/fattn.cu:298 dispatch, fattn-vec-f16
kernels): one kernel per layer replaces the XLA chain
[rope(q) -> scores einsum -> mask -> softmax -> out einsum], reading the K/V
cache directly from HBM. The KV write stays an XLA dynamic-update-slice
(in-place on the donated cache); the kernel is read-only so no cache
write-back traffic is added.

Layout trick (GQA without rank-3 ops): K/V viewed as (S, Hkv*D). The query
expands to (H, Hkv*D) with zeros outside each head's own D-block
(pltpu.repeat + iota mask), so scores = one MXU dot (H, S); the output comes
back as (H, Hkv*D) and the caller gathers each head's block — one cheap XLA
op. Positions > pos are masked; softmax runs in f32 on the VPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
            H: int, Hkv: int, D: int, BS: int, scale: float, softcap: float):
    """Online-softmax flash decode: grid over S-blocks, scratch carries the
    running max/denominator/accumulator (same scheme as the flash prefill
    kernel, block size BS)."""
    s = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    KD = Hkv * D
    G = H // Hkv

    @pl.when(s == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:].astype(jnp.float32)  # (H, D)
    qrep = pltpu.repeat(q, Hkv, axis=1)  # (H, KD) tiled copies
    hidx = jax.lax.broadcasted_iota(jnp.int32, (H, KD), 0) // G
    bidx = jax.lax.broadcasted_iota(jnp.int32, (H, KD), 1) // D
    qexp = jnp.where(hidx == bidx, qrep, 0.0).astype(jnp.bfloat16)

    scores = jax.lax.dot_general(
        qexp, k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (H, BS)
    if softcap > 0:
        scores = softcap * jnp.tanh(scores / softcap)
    pos = pos_ref[0]
    sidx = jax.lax.broadcasted_iota(jnp.int32, (H, BS), 1) + s * BS
    scores = jnp.where(sidx <= pos, scores, -1e30)

    m_prev = m_ref[:]                     # (H, 1)
    m_blk = jnp.max(scores, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_blk)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)           # (H, BS)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (H, KD)
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = m_new

    @pl.when(s == n_blocks - 1)
    def _final():
        acc = acc_ref[:] / l_ref[:]          # (H, KD)
        # select each head's own D-block and fold to (H, D): zero the other
        # blocks (hidx/bidx mask) then sum block-columns via a selection dot
        acc = jnp.where(hidx == bidx, acc, 0.0)
        kdi = jax.lax.broadcasted_iota(jnp.int32, (KD, D), 0) % D
        di = jax.lax.broadcasted_iota(jnp.int32, (KD, D), 1)
        R = (kdi == di).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            acc, R, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "scale", "softcap", "interpret"))
def decode_attention(q: jnp.ndarray, k_layer: jnp.ndarray, v_layer: jnp.ndarray,
                     pos: jnp.ndarray, n_heads: int, scale: float,
                     softcap: float = 0.0,
                     interpret: bool = False) -> jnp.ndarray:
    """q: (H, D) post-rope; k_layer/v_layer: (S, Hkv, D) bf16 cache views
    (already containing this step's K/V at `pos`); pos: () int32 current
    position. Returns (H, D) f32 attention output. B=1 decode only."""
    S, Hkv, D = k_layer.shape
    H = n_heads
    KD = Hkv * D
    k2 = k_layer.reshape(S, KD)
    v2 = v_layer.reshape(S, KD)
    BS = min(512, S)
    out_full = pl.pallas_call(
        functools.partial(_kernel, H=H, Hkv=Hkv, D=D, BS=BS, scale=scale,
                          softcap=softcap),
        grid=(pl.cdiv(S, BS),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((H, D), lambda s: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BS, KD), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BS, KD), lambda s: (s, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((H, D), lambda s: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, KD), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * H * S * D, bytes_accessed=k2.nbytes + v2.nbytes,
            transcendentals=H * S),
        interpret=interpret,
    )(pos.reshape(1).astype(jnp.int32), q.astype(jnp.bfloat16), k2, v2)
    return out_full


def supported(B: int, T: int, Hkv: int, D: int) -> bool:
    """Kernel applies to single-token single-sequence decode with a
    lane-aligned fused KV width."""
    return B == 1 and T == 1 and (Hkv * D) % 128 == 0
