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


# ---------------------------------------------------------------------------
# batched, position-bounded variant
# ---------------------------------------------------------------------------

def _bkernel(pos_ref, q_ref, knew_ref, vnew_ref, k_ref, v_ref,
             o_ref, ko_ref, vo_ref, m_ref, l_ref, acc_ref, *,
             H: int, Hkv: int, D: int, BS: int, scale: float, softcap: float,
             pos_off: int = 0):
    """Grid (B, S_blocks): per-sequence online softmax with DMA CLAMPED to the
    live prefix — the k/v index maps clamp the block index at
    (pos_b-1) // BS, so blocks past a sequence's position re-address the same
    block (no refetch) and pl.when skips their compute. Decode attention
    bandwidth scales with the actual context, not max_seq.

    Reads the PRE-UPDATE cache (history < pos) and folds the current token's
    self-attention in analytically from k_new/v_new; the cache WRITE also
    happens in-kernel, into outputs that alias the cache inputs
    (input_output_aliases) with a write-block index map that is constant per
    sequence — so exactly ONE block per cache is written back. An XLA scatter
    after a custom-call read of the same carried buffer cannot alias and
    copies the whole cache every layer (profiled at ~3.7 ms/step on a
    22-layer model); aliased in-kernel writes keep the chain in place."""
    s = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    b = pl.program_id(0)
    KD = Hkv * D
    G = H // Hkv
    pos = pos_ref[pos_off + b]
    wblk = jnp.minimum(pos // BS, n_blocks - 1)

    @pl.when(s == wblk)
    def _write():
        # the input block here IS the write block (clamped index map); copy
        # it through and insert this step's K/V row. pos >= S (decode-chunk
        # overshoot past the cache) copies through unchanged — kv_write's
        # mode="drop" equivalent.
        # row-blend instead of a dynamic row store (Mosaic needs 8-aligned
        # sublane indices for stores; a masked full-block write doesn't)
        row = pos - wblk * BS
        in_range = pos < n_blocks * BS
        ridx = jax.lax.broadcasted_iota(jnp.int32, (BS, KD), 0)
        sel = (ridx == row) & in_range
        ko_ref[0] = jnp.where(sel, jnp.broadcast_to(knew_ref[0], (BS, KD)),
                              k_ref[0])
        vo_ref[0] = jnp.where(sel, jnp.broadcast_to(vnew_ref[0], (BS, KD)),
                              v_ref[0])

    def qexp_mask():
        hidx = jax.lax.broadcasted_iota(jnp.int32, (H, KD), 0) // G
        bidx = jax.lax.broadcasted_iota(jnp.int32, (H, KD), 1) // D
        return hidx == bidx

    @pl.when(s == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s * BS < pos)
    def _compute():
        q = q_ref[0].astype(jnp.float32)  # (H, D)
        qrep = pltpu.repeat(q, Hkv, axis=1)  # (H, KD)
        sel = qexp_mask()
        qexp = jnp.where(sel, qrep, 0.0).astype(jnp.bfloat16)

        scores = jax.lax.dot_general(
            qexp, k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (H, BS)
        if softcap > 0:
            scores = softcap * jnp.tanh(scores / softcap)
        sidx = jax.lax.broadcasted_iota(jnp.int32, (H, BS), 1) + s * BS
        scores = jnp.where(sidx < pos, scores, -1e30)  # history only

        m_prev = m_ref[:]                     # (H, 1)
        m_blk = jnp.max(scores, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_blk)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)           # (H, BS)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (H, KD)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(s == n_blocks - 1)
    def _final():
        q = q_ref[0].astype(jnp.float32)
        qrep = pltpu.repeat(q, Hkv, axis=1)
        sel = qexp_mask()
        qexp = jnp.where(sel, qrep, 0.0)
        # current token's self contribution (k_new/v_new, not yet in cache)
        knew = knew_ref[0].astype(jnp.float32)   # (1, KD)
        vnew = vnew_ref[0].astype(jnp.float32)
        s_self = jax.lax.dot_general(
            qexp, knew, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (H, 1)
        if softcap > 0:
            s_self = softcap * jnp.tanh(s_self / softcap)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, s_self)
        alpha = jnp.exp(m_prev - m_new)
        p_self = jnp.exp(s_self - m_new)         # (H, 1)
        l = l_ref[:] * alpha + p_self
        acc = acc_ref[:] * alpha + p_self * vnew  # (H, KD)
        acc = acc / l
        acc = jnp.where(sel, acc, 0.0)
        kdi = jax.lax.broadcasted_iota(jnp.int32, (KD, D), 0) % D
        di = jax.lax.broadcasted_iota(jnp.int32, (KD, D), 1)
        R = (kdi == di).astype(jnp.float32)
        o_ref[0] = jax.lax.dot_general(
            acc, R, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "n_kv_heads", "scale",
                                    "softcap", "interpret"))
def decode_attention_batched(q: jnp.ndarray, k_new: jnp.ndarray,
                             v_new: jnp.ndarray, k_layer: jnp.ndarray,
                             v_layer: jnp.ndarray, positions: jnp.ndarray,
                             n_heads: int, n_kv_heads: int, scale: float,
                             softcap: float = 0.0,
                             interpret: bool = False) -> jnp.ndarray:
    """q: (B, H, D) post-rope; k_new/v_new: (B, Hkv, D) this step's post-rope
    K/V (NOT yet written to the cache); k_layer/v_layer: (B, S, Hkv*D) bf16
    FUSED cache buffers holding history < position (fused so the custom call
    takes them with zero reshapes — reshaping a custom-call operand copies
    the buffer); positions: (B,) i32. Returns (out (B, H, D) f32, k_upd,
    v_upd (B, S, Hkv*D) updated caches aliasing the inputs)."""
    B, S, KD = k_layer.shape
    Hkv = n_kv_heads
    D = KD // Hkv
    H = n_heads
    k2 = k_layer
    v2 = v_layer
    kn = k_new.reshape(B, 1, KD)
    vn = v_new.reshape(B, 1, KD)
    # S-block size bounded by scoped VMEM: 4 cache blocks live double-buffered
    # (k/v in + aliased k/v out) at BS*KD*2 bytes each, plus the (H, KD) f32
    # accumulator — MHA-wide KD (e.g. 7B: 32*128) needs smaller blocks
    BS = min(256, S)
    while BS > 16 and 16 * BS * KD + 4 * H * KD > 8 * 1024 * 1024:
        BS //= 2
    nb = pl.cdiv(S, BS)
    # dead rows (position < 0, inactive batch slots): pos // BS would be -1 —
    # a NEGATIVE block index in the DMA maps, i.e. an out-of-bounds read AND
    # (through input_output_aliases) an out-of-bounds write one block before
    # the cache buffer. Route them to the overshoot path instead (pos at the
    # padded extent): write degrades to a copy-through, no row matches.
    positions = jnp.where(positions >= 0, positions, nb * BS)

    def kv_map(b, s, pos_ref):
        # clamp at the write block (pos // BS): covers all history blocks
        # plus the block this step's K/V lands in
        last = jnp.minimum(pos_ref[b] // BS, nb - 1)
        return (b, jnp.minimum(s, last), 0)

    def w_map(b, s, pos_ref):
        return (b, jnp.minimum(pos_ref[b] // BS, nb - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nb),
        in_specs=[pl.BlockSpec((1, H, D), lambda b, s, p: (b, 0, 0)),
                  pl.BlockSpec((1, 1, KD), lambda b, s, p: (b, 0, 0)),
                  pl.BlockSpec((1, 1, KD), lambda b, s, p: (b, 0, 0)),
                  pl.BlockSpec((1, BS, KD), kv_map),
                  pl.BlockSpec((1, BS, KD), kv_map)],
        out_specs=[pl.BlockSpec((1, H, D), lambda b, s, p: (b, 0, 0)),
                   pl.BlockSpec((1, BS, KD), w_map),
                   pl.BlockSpec((1, BS, KD), w_map)],
        scratch_shapes=[pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, KD), jnp.float32)],
    )
    out, k_upd, v_upd = pl.pallas_call(
        functools.partial(_bkernel, H=H, Hkv=Hkv, D=D, BS=BS, scale=scale,
                          softcap=softcap),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, H, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, S, KD), k_layer.dtype),
                   jax.ShapeDtypeStruct((B, S, KD), v_layer.dtype)],
        # operand indices INCLUDE the scalar-prefetch arg: 4 = k2, 5 = v2
        input_output_aliases={4: 1, 5: 2},
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * D,
            bytes_accessed=k2.nbytes + v2.nbytes,
            transcendentals=B * H * S),
        interpret=interpret,
    )(positions.astype(jnp.int32), q.astype(jnp.bfloat16),
      kn.astype(jnp.bfloat16), vn.astype(jnp.bfloat16), k2, v2)
    return out, k_upd, v_upd


def supported_batched(T: int, Hkv: int, D: int) -> bool:
    return T == 1 and (Hkv * D) % 128 == 0


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "n_kv_heads", "scale",
                                    "softcap", "interpret"))
def decode_attention_rows(q: jnp.ndarray, k_new: jnp.ndarray,
                          v_new: jnp.ndarray, k_pool: jnp.ndarray,
                          v_pool: jnp.ndarray, positions: jnp.ndarray,
                          base: jnp.ndarray, n_heads: int, n_kv_heads: int,
                          scale: float, softcap: float = 0.0,
                          interpret: bool = False):
    """decode_attention_batched over a ROW WINDOW of a pooled cache.

    k_pool/v_pool: (N, S, Hkv*D) fused buffers holding ALL layers' caches
    stacked row-major ((layer, batch) -> row layer*B + batch); `base` is a
    traced scalar selecting rows [base, base+B). This is the lax.scan decode
    path's cache primitive (VERDICT r1 item 6): the scan carries the whole
    pool and each iteration's kernel reads/writes only its layer's rows
    through scalar-prefetched index maps + aliased outputs — the cache never
    passes through an XLA slice, so scan cannot materialize per-layer copies.
    """
    B = q.shape[0]
    N, S, KD = k_pool.shape
    Hkv = n_kv_heads
    D = KD // Hkv
    H = n_heads
    kn = k_new.reshape(B, 1, KD)
    vn = v_new.reshape(B, 1, KD)
    BS = min(256, S)
    while BS > 16 and 16 * BS * KD + 4 * H * KD > 8 * 1024 * 1024:
        BS //= 2
    nb = pl.cdiv(S, BS)

    # dead rows (position < 0) → overshoot copy-through; a raw -1 would put a
    # negative block index into the DMA maps (OOB read + aliased OOB write)
    positions = jnp.where(positions >= 0, positions, nb * BS)
    # scalar prefetch layout: [base, pos_0, ..., pos_{B-1}]
    scalars = jnp.concatenate(
        [jnp.asarray(base, jnp.int32).reshape(1),
         positions.astype(jnp.int32).reshape(B)])

    def kv_map(b, s, pref):
        last = jnp.minimum(pref[1 + b] // BS, nb - 1)
        return (pref[0] + b, jnp.minimum(s, last), 0)

    def w_map(b, s, pref):
        return (pref[0] + b, jnp.minimum(pref[1 + b] // BS, nb - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nb),
        in_specs=[pl.BlockSpec((1, H, D), lambda b, s, p: (b, 0, 0)),
                  pl.BlockSpec((1, 1, KD), lambda b, s, p: (b, 0, 0)),
                  pl.BlockSpec((1, 1, KD), lambda b, s, p: (b, 0, 0)),
                  pl.BlockSpec((1, BS, KD), kv_map),
                  pl.BlockSpec((1, BS, KD), kv_map)],
        out_specs=[pl.BlockSpec((1, H, D), lambda b, s, p: (b, 0, 0)),
                   pl.BlockSpec((1, BS, KD), w_map),
                   pl.BlockSpec((1, BS, KD), w_map)],
        scratch_shapes=[pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, KD), jnp.float32)],
    )
    out, k_upd, v_upd = pl.pallas_call(
        functools.partial(_bkernel, H=H, Hkv=Hkv, D=D, BS=BS, scale=scale,
                          softcap=softcap, pos_off=1),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, H, D), jnp.float32),
                   jax.ShapeDtypeStruct((N, S, KD), k_pool.dtype),
                   jax.ShapeDtypeStruct((N, S, KD), v_pool.dtype)],
        # operand indices INCLUDE the scalar-prefetch arg: 4 = k_pool, 5 = v
        input_output_aliases={4: 1, 5: 2},
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * D,
            bytes_accessed=B * S * KD * 4,
            transcendentals=B * H * S),
        interpret=interpret,
    )(scalars, q.astype(jnp.bfloat16),
      kn.astype(jnp.bfloat16), vn.astype(jnp.bfloat16), k_pool, v_pool)
    return out, k_upd, v_upd


# ---------------------------------------------------------------------------
# Q8-quantized-KV variant (--quantkv 1 + flash decode)
# ---------------------------------------------------------------------------

def _bqkernel(pos_ref, q_ref, knew_ref, vnew_ref, kqn_ref, vqn_ref,
              ksn_ref, vsn_ref, k_ref, v_ref, ks_ref, vs_ref,
              o_ref, ko_ref, vo_ref, kso_ref, vso_ref, m_ref, l_ref, acc_ref,
              *, H: int, Hkv: int, D: int, BS: int, scale: float,
              softcap: float):
    """Q8 cache decode: int8 blocks dequantize in-kernel (cast + per-row
    scale expansion through an (Hkv, KD) 0/1 dot — 1.95x less attention
    HBM traffic than bf16); otherwise the same pre-update-read + analytic
    self-contribution + aliased write-block scheme as _bkernel. The new row
    arrives both dequantized (knew/vnew, for the self term — matching what
    the cache will hold) and quantized (kqn/ksn, written to the cache)."""
    s = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    b = pl.program_id(0)
    KD = Hkv * D
    G = H // Hkv
    pos = pos_ref[b]
    wblk = jnp.minimum(pos // BS, n_blocks - 1)

    def head_expand():
        hidx = jax.lax.broadcasted_iota(jnp.int32, (Hkv, KD), 0)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (Hkv, KD), 1) // D
        return (hidx == cidx).astype(jnp.bfloat16)

    @pl.when(s == wblk)
    def _write():
        row = pos - wblk * BS
        in_range = pos < n_blocks * BS
        ridx = jax.lax.broadcasted_iota(jnp.int32, (BS, KD), 0)
        sel = (ridx == row) & in_range
        ko_ref[0] = jnp.where(sel, jnp.broadcast_to(kqn_ref[0], (BS, KD)),
                              k_ref[0])
        vo_ref[0] = jnp.where(sel, jnp.broadcast_to(vqn_ref[0], (BS, KD)),
                              v_ref[0])
        rids = jax.lax.broadcasted_iota(jnp.int32, (BS, Hkv), 0)
        sels = (rids == row) & in_range
        kso_ref[0] = jnp.where(sels, jnp.broadcast_to(ksn_ref[0], (BS, Hkv)),
                               ks_ref[0])
        vso_ref[0] = jnp.where(sels, jnp.broadcast_to(vsn_ref[0], (BS, Hkv)),
                               vs_ref[0])

    def qexp_mask():
        hidx = jax.lax.broadcasted_iota(jnp.int32, (H, KD), 0) // G
        bidx = jax.lax.broadcasted_iota(jnp.int32, (H, KD), 1) // D
        return hidx == bidx

    @pl.when(s == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s * BS < pos)
    def _compute():
        E = head_expand()
        ksx = jax.lax.dot_general(
            ks_ref[0].astype(jnp.bfloat16), E, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        vsx = jax.lax.dot_general(
            vs_ref[0].astype(jnp.bfloat16), E, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        kd = k_ref[0].astype(jnp.bfloat16) * ksx   # (BS, KD)
        vd = v_ref[0].astype(jnp.bfloat16) * vsx
        q = q_ref[0].astype(jnp.float32)
        qrep = pltpu.repeat(q, Hkv, axis=1)
        sel = qexp_mask()
        qexp = jnp.where(sel, qrep, 0.0).astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            qexp, kd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if softcap > 0:
            scores = softcap * jnp.tanh(scores / softcap)
        sidx = jax.lax.broadcasted_iota(jnp.int32, (H, BS), 1) + s * BS
        scores = jnp.where(sidx < pos, scores, -1e30)
        m_prev = m_ref[:]
        m_blk = jnp.max(scores, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_blk)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(s == n_blocks - 1)
    def _final():
        q = q_ref[0].astype(jnp.float32)
        qrep = pltpu.repeat(q, Hkv, axis=1)
        sel = qexp_mask()
        qexp = jnp.where(sel, qrep, 0.0)
        knew = knew_ref[0].astype(jnp.float32)
        vnew = vnew_ref[0].astype(jnp.float32)
        s_self = jax.lax.dot_general(
            qexp, knew, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if softcap > 0:
            s_self = softcap * jnp.tanh(s_self / softcap)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, s_self)
        alpha = jnp.exp(m_prev - m_new)
        p_self = jnp.exp(s_self - m_new)
        l = l_ref[:] * alpha + p_self
        acc = acc_ref[:] * alpha + p_self * vnew
        acc = acc / l
        acc = jnp.where(sel, acc, 0.0)
        kdi = jax.lax.broadcasted_iota(jnp.int32, (KD, D), 0) % D
        di = jax.lax.broadcasted_iota(jnp.int32, (KD, D), 1)
        R = (kdi == di).astype(jnp.float32)
        o_ref[0] = jax.lax.dot_general(
            acc, R, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "n_kv_heads", "scale",
                                    "softcap", "interpret"))
def decode_attention_batched_q8(q, k_new, v_new, k_pool, v_pool, ks_pool,
                                vs_pool, positions, n_heads: int,
                                n_kv_heads: int, scale: float,
                                softcap: float = 0.0,
                                interpret: bool = False):
    """Q8-KV batched decode. q: (B, H, D); k_new/v_new: (B, Hkv, D) bf16
    (unquantized); k_pool/v_pool: (B, S, Hkv*D) int8; ks/vs_pool:
    (B, S, Hkv) bf16 scales. Quantizes the new row here (matching
    kv/cache.py _q8 semantics) and the self term uses the dequantized
    values, so results match the write-then-read XLA path exactly. Returns
    (out, k', v', ks', vs')."""
    B, S, KD = k_pool.shape
    Hkv = n_kv_heads
    D = KD // Hkv
    H = n_heads

    def q8(x):  # (B, Hkv, D) -> int8 (B, 1, KD), scale (B, 1, Hkv), deq
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        sc = amax / 127.0
        inv = jnp.where(sc > 0, 1.0 / sc, 0.0)
        qv = jnp.round(x.astype(jnp.float32) * inv[..., None]).astype(jnp.int8)
        deq = (qv.astype(jnp.float32)
               * sc.astype(jnp.bfloat16).astype(jnp.float32)[..., None])
        return (qv.reshape(B, 1, KD), sc.astype(jnp.bfloat16).reshape(B, 1, Hkv),
                deq.astype(jnp.bfloat16).reshape(B, 1, KD))

    kq, ksn, kdq = q8(k_new)
    vq, vsn, vdq = q8(v_new)
    BS = min(256, S)
    while BS > 16 and 12 * BS * KD + 4 * H * KD > 8 * 1024 * 1024:
        BS //= 2
    nb = pl.cdiv(S, BS)
    # dead rows (position < 0) → overshoot copy-through; a raw -1 would put a
    # negative block index into the DMA maps (OOB read + aliased OOB write)
    positions = jnp.where(positions >= 0, positions, nb * BS)

    def kv_map(b, s, pos_ref):
        last = jnp.minimum(pos_ref[b] // BS, nb - 1)
        return (b, jnp.minimum(s, last), 0)

    def w_map(b, s, pos_ref):
        return (b, jnp.minimum(pos_ref[b] // BS, nb - 1), 0)

    bmap = lambda b, s, p: (b, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nb),
        in_specs=[pl.BlockSpec((1, H, D), bmap),
                  pl.BlockSpec((1, 1, KD), bmap),
                  pl.BlockSpec((1, 1, KD), bmap),
                  pl.BlockSpec((1, 1, KD), bmap),
                  pl.BlockSpec((1, 1, KD), bmap),
                  pl.BlockSpec((1, 1, Hkv), bmap),
                  pl.BlockSpec((1, 1, Hkv), bmap),
                  pl.BlockSpec((1, BS, KD), kv_map),
                  pl.BlockSpec((1, BS, KD), kv_map),
                  pl.BlockSpec((1, BS, Hkv), kv_map),
                  pl.BlockSpec((1, BS, Hkv), kv_map)],
        out_specs=[pl.BlockSpec((1, H, D), bmap),
                   pl.BlockSpec((1, BS, KD), w_map),
                   pl.BlockSpec((1, BS, KD), w_map),
                   pl.BlockSpec((1, BS, Hkv), w_map),
                   pl.BlockSpec((1, BS, Hkv), w_map)],
        scratch_shapes=[pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, KD), jnp.float32)],
    )
    out, k2, v2, ks2, vs2 = pl.pallas_call(
        functools.partial(_bqkernel, H=H, Hkv=Hkv, D=D, BS=BS, scale=scale,
                          softcap=softcap),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, H, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, S, KD), jnp.int8),
                   jax.ShapeDtypeStruct((B, S, KD), jnp.int8),
                   jax.ShapeDtypeStruct((B, S, Hkv), jnp.bfloat16),
                   jax.ShapeDtypeStruct((B, S, Hkv), jnp.bfloat16)],
        # indices include the scalar-prefetch arg: 8..11 = pools
        input_output_aliases={8: 1, 9: 2, 10: 3, 11: 4},
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * D,
            bytes_accessed=k_pool.nbytes + v_pool.nbytes,
            transcendentals=B * H * S),
        interpret=interpret,
    )(positions.astype(jnp.int32), q.astype(jnp.bfloat16), kdq, vdq,
      kq, vq, ksn, vsn, k_pool, v_pool, ks_pool, vs_pool)
    return out, k2, v2, ks2, vs2


# ---------------------------------------------------------------------------
# paged variant: pages addressed through the slot page table
# ---------------------------------------------------------------------------

def _pkernel(pos_ref, tab_ref, q_ref, knew_ref, vnew_ref, k_ref, v_ref,
             o_ref, ko_ref, vo_ref, m_ref, l_ref, acc_ref, *,
             H: int, Hkv: int, D: int, P: int, scale: float, softcap: float):
    """Paged decode attention: grid (B, MP); the k/v block for step s is the
    PAGE tab[b, min(s, last)] of the fused (NP*P, KD) pool — the page table
    drives the DMA directly (vLLM-style paged attention, TPU-native). Same
    pre-update-read + analytic self-contribution + aliased write-block scheme
    as _bkernel; the write block is the page holding pos."""
    s = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    b = pl.program_id(0)
    KD = Hkv * D
    G = H // Hkv
    pos = pos_ref[b]
    wblk = jnp.minimum(pos // P, n_blocks - 1)

    @pl.when(s == wblk)
    def _write():
        row = pos - wblk * P
        in_range = pos < n_blocks * P
        ridx = jax.lax.broadcasted_iota(jnp.int32, (P, KD), 0)
        sel = (ridx == row) & in_range
        ko_ref[:] = jnp.where(sel, jnp.broadcast_to(knew_ref[0], (P, KD)),
                              k_ref[:])
        vo_ref[:] = jnp.where(sel, jnp.broadcast_to(vnew_ref[0], (P, KD)),
                              v_ref[:])

    def qexp_mask():
        hidx = jax.lax.broadcasted_iota(jnp.int32, (H, KD), 0) // G
        bidx = jax.lax.broadcasted_iota(jnp.int32, (H, KD), 1) // D
        return hidx == bidx

    @pl.when(s == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s * P < pos)
    def _compute():
        q = q_ref[0].astype(jnp.float32)  # (H, D)
        qrep = pltpu.repeat(q, Hkv, axis=1)
        sel = qexp_mask()
        qexp = jnp.where(sel, qrep, 0.0).astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            qexp, k_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (H, P)
        if softcap > 0:
            scores = softcap * jnp.tanh(scores / softcap)
        sidx = jax.lax.broadcasted_iota(jnp.int32, (H, P), 1) + s * P
        scores = jnp.where(sidx < pos, scores, -1e30)
        m_prev = m_ref[:]
        m_blk = jnp.max(scores, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_blk)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(s == n_blocks - 1)
    def _final():
        q = q_ref[0].astype(jnp.float32)
        qrep = pltpu.repeat(q, Hkv, axis=1)
        sel = qexp_mask()
        qexp = jnp.where(sel, qrep, 0.0)
        knew = knew_ref[0].astype(jnp.float32)
        vnew = vnew_ref[0].astype(jnp.float32)
        s_self = jax.lax.dot_general(
            qexp, knew, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if softcap > 0:
            s_self = softcap * jnp.tanh(s_self / softcap)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, s_self)
        alpha = jnp.exp(m_prev - m_new)
        p_self = jnp.exp(s_self - m_new)
        l = l_ref[:] * alpha + p_self
        acc = acc_ref[:] * alpha + p_self * vnew
        acc = acc / l
        acc = jnp.where(sel, acc, 0.0)
        kdi = jax.lax.broadcasted_iota(jnp.int32, (KD, D), 0) % D
        di = jax.lax.broadcasted_iota(jnp.int32, (KD, D), 1)
        R = (kdi == di).astype(jnp.float32)
        o_ref[0] = jax.lax.dot_general(
            acc, R, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "n_kv_heads", "page_size",
                                    "scale", "softcap", "interpret"))
def decode_attention_paged(q: jnp.ndarray, k_new: jnp.ndarray,
                           v_new: jnp.ndarray, k_pool: jnp.ndarray,
                           v_pool: jnp.ndarray, page_table: jnp.ndarray,
                           positions: jnp.ndarray, n_heads: int,
                           n_kv_heads: int, page_size: int, scale: float,
                           softcap: float = 0.0,
                           interpret: bool = False):
    """q: (B, H, D); k_new/v_new: (B, Hkv, D); k_pool/v_pool: (NP*P, Hkv*D)
    fused page pools; page_table: (B, MP) int32; positions: (B,). Returns
    (out (B, H, D) f32, k_pool', v_pool' aliased updated pools)."""
    B, H = q.shape[:2]
    Hkv = n_kv_heads
    P = page_size
    KD = k_pool.shape[1]
    D = KD // Hkv
    MP = page_table.shape[1]
    NP = k_pool.shape[0] // P
    kn = k_new.reshape(B, 1, KD)
    vn = v_new.reshape(B, 1, KD)
    # dead slots (position < 0) map to the overshoot path: the write block
    # degrades to a self-copy of one page and the (unused) output is garbage
    positions = jnp.where(positions >= 0, positions, MP * P)

    def kv_map(b, s, pos_ref, tab_ref):
        last = jnp.minimum(pos_ref[b] // P, MP - 1)
        page = tab_ref[b, jnp.minimum(s, last)]
        return (jnp.clip(page, 0, NP - 1), 0)

    def w_map(b, s, pos_ref, tab_ref):
        # constant per sequence: the page holding pos — the kernel fills the
        # whole block exactly once (at s == pos // P), so no other page's
        # aliased out-block ever writes back uninitialized VMEM
        wblk = jnp.minimum(pos_ref[b] // P, MP - 1)
        return (jnp.clip(tab_ref[b, wblk], 0, NP - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, MP),
        in_specs=[pl.BlockSpec((1, H, D), lambda b, s, p, t: (b, 0, 0)),
                  pl.BlockSpec((1, 1, KD), lambda b, s, p, t: (b, 0, 0)),
                  pl.BlockSpec((1, 1, KD), lambda b, s, p, t: (b, 0, 0)),
                  pl.BlockSpec((P, KD), kv_map),
                  pl.BlockSpec((P, KD), kv_map)],
        out_specs=[pl.BlockSpec((1, H, D), lambda b, s, p, t: (b, 0, 0)),
                   pl.BlockSpec((P, KD), w_map),
                   pl.BlockSpec((P, KD), w_map)],
        scratch_shapes=[pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, KD), jnp.float32)],
    )
    out, k_upd, v_upd = pl.pallas_call(
        functools.partial(_pkernel, H=H, Hkv=Hkv, D=D, P=P, scale=scale,
                          softcap=softcap),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, H, D), jnp.float32),
                   jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
                   jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype)],
        # operand indices INCLUDE the 2 scalar-prefetch args: 5 = k_pool
        input_output_aliases={5: 1, 6: 2},
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * MP * P * D,
            bytes_accessed=2 * B * MP * P * KD * 2,
            transcendentals=B * H * MP * P),
        interpret=interpret,
    )(positions.astype(jnp.int32), page_table.astype(jnp.int32),
      q.astype(jnp.bfloat16), kn.astype(jnp.bfloat16),
      vn.astype(jnp.bfloat16), k_pool, v_pool)
    return out, k_upd, v_upd

# ---------------------------------------------------------------------------
# paged + Q8-quantized variant: page-table DMA maps x in-kernel q8 math
# (--quantkv 1 serving; the reference's quantized unified KV cache,
#  src/llama.cpp:2788 type_k/type_v + gpttype_adapter.cpp:1958)
# ---------------------------------------------------------------------------

def _pq8kernel(pos_ref, tab_ref, q_ref, knew_ref, vnew_ref, kqn_ref, vqn_ref,
               ksn_ref, vsn_ref, k_ref, v_ref, ks_ref, vs_ref,
               o_ref, ko_ref, vo_ref, kso_ref, vso_ref, m_ref, l_ref, acc_ref,
               *, H: int, Hkv: int, HS: int, D: int, P: int, scale: float,
               softcap: float):
    """Paged Q8 decode attention: _pkernel's page addressing with _bqkernel's
    int8 block dequant (cast + per-row scale expansion through an (Hkv, KD)
    0/1 dot) and quantized write-block insert. The XLA fallback this replaces
    gathered + dequantized the WHOLE context per layer per step (profiled at
    ~2.2 ms/step of fusion+copy at 16K on 1.1B).

    Scale sidecars are TRANSPOSED (HS, P) page tiles (kv/paged.py): token t
    is column t, row h is kv-head h's scale, HS = Hkv rounded up to the bf16
    sublane tile. A (P, Hkv) block lane-pads Hkv -> 128 in the DMA — at
    Hkv=4 that doubled the kernel's HBM traffic (round-5 16K dissection)."""
    s = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    b = pl.program_id(0)
    KD = Hkv * D
    G = H // Hkv
    pos = pos_ref[b]
    wblk = jnp.minimum(pos // P, n_blocks - 1)

    @pl.when(s == wblk)
    def _write():
        row = pos - wblk * P
        in_range = pos < n_blocks * P
        ridx = jax.lax.broadcasted_iota(jnp.int32, (P, KD), 0)
        sel = (ridx == row) & in_range
        ko_ref[:] = jnp.where(sel, jnp.broadcast_to(kqn_ref[0], (P, KD)),
                              k_ref[:])
        vo_ref[:] = jnp.where(sel, jnp.broadcast_to(vqn_ref[0], (P, KD)),
                              v_ref[:])
        cids = jax.lax.broadcasted_iota(jnp.int32, (HS, P), 1)
        sels = (cids == row) & in_range
        kso_ref[:] = jnp.where(sels, jnp.broadcast_to(ksn_ref[0], (HS, P)),
                               ks_ref[:])
        vso_ref[:] = jnp.where(sels, jnp.broadcast_to(vsn_ref[0], (HS, P)),
                               vs_ref[:])

    def qexp_mask():
        hidx = jax.lax.broadcasted_iota(jnp.int32, (H, KD), 0) // G
        bidx = jax.lax.broadcasted_iota(jnp.int32, (H, KD), 1) // D
        return hidx == bidx

    @pl.when(s == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s * P < pos)
    def _compute():
        # per-row q8 scales apply to the SMALL (H, P) score/weight matrices,
        # not the (P, KD) value planes: for head h only kv-head h//G's
        # columns survive the group masking, so scores[h, p] scales by
        # ks[h//G, p] and the softmax weights by vs[h//G, p] EXACTLY —
        # dequant reduces to a plain i8->bf16 cast (the old (P, Hkv)@(Hkv,
        # KD) expansion dots cost ~105 M MAC/step at 13B: ~3 ms of the 23 ms
        # 8K step). Transposed (HS, P) tiles expand through one (H, HS) 0/1
        # dot; padded rows >= Hkv never match hidx and contribute zero.
        hidx = jax.lax.broadcasted_iota(jnp.int32, (H, HS), 0) // G
        kidx = jax.lax.broadcasted_iota(jnp.int32, (H, HS), 1)
        Eh = (hidx == kidx).astype(jnp.bfloat16)   # (H, HS) 0/1
        ksx = jax.lax.dot_general(
            Eh, ks_ref[:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (H, P)
        vsx = jax.lax.dot_general(
            Eh, vs_ref[:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        kd = k_ref[:].astype(jnp.bfloat16)         # (P, KD) pure cast
        vd = v_ref[:].astype(jnp.bfloat16)
        q = q_ref[0].astype(jnp.float32)  # (H, D)
        qrep = pltpu.repeat(q, Hkv, axis=1)
        sel = qexp_mask()
        qexp = jnp.where(sel, qrep, 0.0).astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            qexp, kd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * ksx * scale  # (H, P)
        if softcap > 0:
            scores = softcap * jnp.tanh(scores / softcap)
        sidx = jax.lax.broadcasted_iota(jnp.int32, (H, P), 1) + s * P
        scores = jnp.where(sidx < pos, scores, -1e30)
        m_prev = m_ref[:]
        m_blk = jnp.max(scores, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_blk)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            (p * vsx).astype(jnp.bfloat16), vd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(s == n_blocks - 1)
    def _final():
        q = q_ref[0].astype(jnp.float32)
        qrep = pltpu.repeat(q, Hkv, axis=1)
        sel = qexp_mask()
        qexp = jnp.where(sel, qrep, 0.0)
        knew = knew_ref[0].astype(jnp.float32)
        vnew = vnew_ref[0].astype(jnp.float32)
        s_self = jax.lax.dot_general(
            qexp, knew, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if softcap > 0:
            s_self = softcap * jnp.tanh(s_self / softcap)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, s_self)
        alpha = jnp.exp(m_prev - m_new)
        p_self = jnp.exp(s_self - m_new)
        l = l_ref[:] * alpha + p_self
        acc = acc_ref[:] * alpha + p_self * vnew
        acc = acc / l
        acc = jnp.where(sel, acc, 0.0)
        kdi = jax.lax.broadcasted_iota(jnp.int32, (KD, D), 0) % D
        di = jax.lax.broadcasted_iota(jnp.int32, (KD, D), 1)
        R = (kdi == di).astype(jnp.float32)
        o_ref[0] = jax.lax.dot_general(
            acc, R, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "n_kv_heads", "page_size",
                                    "scale", "softcap", "interpret"))
def decode_attention_paged_q8(q: jnp.ndarray, k_new: jnp.ndarray,
                              v_new: jnp.ndarray, k_pool: jnp.ndarray,
                              v_pool: jnp.ndarray, ks_pool: jnp.ndarray,
                              vs_pool: jnp.ndarray, page_table: jnp.ndarray,
                              positions: jnp.ndarray, n_heads: int,
                              n_kv_heads: int, page_size: int, scale: float,
                              softcap: float = 0.0,
                              interpret: bool = False):
    """q: (B, H, D); k_new/v_new: (B, Hkv, D) bf16 (unquantized);
    k_pool/v_pool: (NP*P, Hkv*D) int8 fused page pools; ks/vs_pool:
    (NP*HS, P) bf16 TRANSPOSED per-head scale tiles (kv/paged.py);
    page_table: (B, MP) int32;
    positions: (B,). Quantizes the new row here (kv/paged.py _quantize_q8
    semantics — per-(row, head) amax/127) and uses the dequantized values
    for the self term, so results match the write-then-gather XLA path.
    Returns (out (B, H, D) f32, k', v', ks', vs' aliased updated pools)."""
    B, H = q.shape[:2]
    Hkv = n_kv_heads
    P = page_size
    KD = k_pool.shape[1]
    D = KD // Hkv
    MP = page_table.shape[1]
    NP = k_pool.shape[0] // P
    HS = ks_pool.shape[0] // NP   # transposed scale tile rows (kv/paged.py)

    def q8(x):  # (B, Hkv, D) -> int8 (B, 1, KD), scale col (B, HS, 1), deq
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        sc = amax / 127.0
        inv = jnp.where(sc > 0, 1.0 / sc, 0.0)
        qv = jnp.round(x.astype(jnp.float32) * inv[..., None]).astype(jnp.int8)
        deq = (qv.astype(jnp.float32)
               * sc.astype(jnp.bfloat16).astype(jnp.float32)[..., None])
        scp = jnp.pad(sc.astype(jnp.bfloat16), ((0, 0), (0, HS - Hkv)))
        return (qv.reshape(B, 1, KD),
                scp.reshape(B, HS, 1),
                deq.astype(jnp.bfloat16).reshape(B, 1, KD))

    kq, ksn, kdq = q8(k_new)
    vq, vsn, vdq = q8(v_new)
    # dead slots (position < 0) -> overshoot copy-through (see paged bf16)
    positions = jnp.where(positions >= 0, positions, MP * P)

    def kv_map(b, s, pos_ref, tab_ref):
        last = jnp.minimum(pos_ref[b] // P, MP - 1)
        page = tab_ref[b, jnp.minimum(s, last)]
        return (jnp.clip(page, 0, NP - 1), 0)

    def w_map(b, s, pos_ref, tab_ref):
        wblk = jnp.minimum(pos_ref[b] // P, MP - 1)
        return (jnp.clip(tab_ref[b, wblk], 0, NP - 1), 0)

    bmap3 = lambda b, s, p, t: (b, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, MP),
        in_specs=[pl.BlockSpec((1, H, D), bmap3),
                  pl.BlockSpec((1, 1, KD), bmap3),
                  pl.BlockSpec((1, 1, KD), bmap3),
                  pl.BlockSpec((1, 1, KD), bmap3),
                  pl.BlockSpec((1, 1, KD), bmap3),
                  pl.BlockSpec((1, HS, 1), bmap3),
                  pl.BlockSpec((1, HS, 1), bmap3),
                  pl.BlockSpec((P, KD), kv_map),
                  pl.BlockSpec((P, KD), kv_map),
                  pl.BlockSpec((HS, P), kv_map),
                  pl.BlockSpec((HS, P), kv_map)],
        out_specs=[pl.BlockSpec((1, H, D), bmap3),
                   pl.BlockSpec((P, KD), w_map),
                   pl.BlockSpec((P, KD), w_map),
                   pl.BlockSpec((HS, P), w_map),
                   pl.BlockSpec((HS, P), w_map)],
        scratch_shapes=[pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, KD), jnp.float32)],
    )
    out, k2, v2, ks2, vs2 = pl.pallas_call(
        functools.partial(_pq8kernel, H=H, Hkv=Hkv, HS=HS, D=D, P=P,
                          scale=scale, softcap=softcap),
        compiler_params=_paged_cp(),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, H, D), jnp.float32),
                   jax.ShapeDtypeStruct(k_pool.shape, jnp.int8),
                   jax.ShapeDtypeStruct(v_pool.shape, jnp.int8),
                   jax.ShapeDtypeStruct(ks_pool.shape, jnp.bfloat16),
                   jax.ShapeDtypeStruct(vs_pool.shape, jnp.bfloat16)],
        # indices include the 2 scalar-prefetch args: 9..12 = pools
        input_output_aliases={9: 1, 10: 2, 11: 3, 12: 4},
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * MP * P * D,
            bytes_accessed=2 * B * MP * P * KD,
            transcendentals=B * H * MP * P),
        interpret=interpret,
    )(positions.astype(jnp.int32), page_table.astype(jnp.int32),
      q.astype(jnp.bfloat16), kdq, vdq, kq, vq, ksn, vsn,
      k_pool, v_pool, ks_pool, vs_pool)
    return out, k2, v2, ks2, vs2


def _paged_cp():
    """Compiler params for the quantized paged kernels: a raised per-kernel
    VMEM limit (default 32 MiB) lets Mosaic double-buffer the page blocks
    more aggressively in-situ — measured +4% on 1.1B 16K paged-q8 decode
    (544-548 vs 524-525 t/s, 3 runs each). KCPP_PAGED_VMEM_MB overrides.
    Never caps BELOW a larger process-wide scoped-VMEM limit (the 13B bench
    subprocess runs with 64 MiB via LIBTPU_INIT_ARGS)."""
    import os
    import re as _re

    mb = int(os.environ.get("KCPP_PAGED_VMEM_MB", "32") or 0)
    if not mb:
        return None
    m = _re.search(r"scoped_vmem_limit_kib=(\d+)",
                   os.environ.get("LIBTPU_INIT_ARGS", ""))
    if m:
        mb = max(mb, int(m.group(1)) >> 10)
    return pltpu.CompilerParams(vmem_limit_bytes=mb << 20)


# ---------------------------------------------------------------------------
# COLUMN-layout paged quantized variants: K/V pages stored as (KD', P) tiles
# (kv/paged.py PagedKVCache.kd) so the HBM minor dim is the page length, not
# the per-token width — narrow-KD (GQA) models lose ~25% of DMA bandwidth on
# (P, 256 B) rows (measured 558 vs 746 GB/s on v5e).  Same math as the row
# kernels; the new token inserts as a COLUMN, and the score/output dots
# contract the KD axis directly from the (KD, P) tile (no in-kernel
# transpose anywhere).  Scale sidecars are transposed (HS, P) page tiles in
# BOTH value layouts (kv/paged.py) — a (rows, Hkv) layout lane-pads Hkv to
# 128 in every DMA, which at Hkv=4 DOUBLED the kernel's HBM traffic.
# ---------------------------------------------------------------------------

def _pq8c_kernel(pos_ref, tab_ref, q_ref, knew_ref, vnew_ref, kqn_ref,
                 vqn_ref, ksn_ref, vsn_ref, k_ref, v_ref, ks_ref, vs_ref,
                 o_ref, ko_ref, vo_ref, kso_ref, vso_ref, m_ref, l_ref,
                 acc_ref, *, H: int, Hkv: int, HS: int, D: int, P: int,
                 scale: float, softcap: float):
    """Column-layout paged Q8 decode attention (see _pq8kernel for the
    scheme; k/v blocks are (KD, P) tiles, new rows arrive as (KD, 1)
    columns, scale sidecars are transposed (HS, P) tiles)."""
    s = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    b = pl.program_id(0)
    KD = Hkv * D
    G = H // Hkv
    pos = pos_ref[b]
    wblk = jnp.minimum(pos // P, n_blocks - 1)

    @pl.when(s == wblk)
    def _write():
        colpos = pos - wblk * P
        in_range = pos < n_blocks * P
        cidx = jax.lax.broadcasted_iota(jnp.int32, (KD, P), 1)
        sel = (cidx == colpos) & in_range
        ko_ref[:] = jnp.where(sel, jnp.broadcast_to(kqn_ref[0], (KD, P)),
                              k_ref[:])
        vo_ref[:] = jnp.where(sel, jnp.broadcast_to(vqn_ref[0], (KD, P)),
                              v_ref[:])
        cids = jax.lax.broadcasted_iota(jnp.int32, (HS, P), 1)
        sels = (cids == colpos) & in_range
        kso_ref[:] = jnp.where(sels, jnp.broadcast_to(ksn_ref[0], (HS, P)),
                               ks_ref[:])
        vso_ref[:] = jnp.where(sels, jnp.broadcast_to(vsn_ref[0], (HS, P)),
                               vs_ref[:])

    def qexp_mask():
        hidx = jax.lax.broadcasted_iota(jnp.int32, (H, KD), 0) // G
        bidx = jax.lax.broadcasted_iota(jnp.int32, (H, KD), 1) // D
        return hidx == bidx

    @pl.when(s == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s * P < pos)
    def _compute():
        hidx = jax.lax.broadcasted_iota(jnp.int32, (H, HS), 0) // G
        kidx = jax.lax.broadcasted_iota(jnp.int32, (H, HS), 1)
        Eh = (hidx == kidx).astype(jnp.bfloat16)   # (H, HS) 0/1
        ksx = jax.lax.dot_general(
            Eh, ks_ref[:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (H, P)
        vsx = jax.lax.dot_general(
            Eh, vs_ref[:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        kd = k_ref[:].astype(jnp.bfloat16)         # (KD, P) pure cast
        vd = v_ref[:].astype(jnp.bfloat16)
        q = q_ref[0].astype(jnp.float32)           # (H, D)
        qrep = pltpu.repeat(q, Hkv, axis=1)
        sel = qexp_mask()
        qexp = jnp.where(sel, qrep, 0.0).astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            qexp, kd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * ksx * scale  # (H, P)
        if softcap > 0:
            scores = softcap * jnp.tanh(scores / softcap)
        sidx = jax.lax.broadcasted_iota(jnp.int32, (H, P), 1) + s * P
        scores = jnp.where(sidx < pos, scores, -1e30)
        m_prev = m_ref[:]
        m_blk = jnp.max(scores, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_blk)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            (p * vsx).astype(jnp.bfloat16), vd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (H, KD)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(s == n_blocks - 1)
    def _final():
        q = q_ref[0].astype(jnp.float32)
        qrep = pltpu.repeat(q, Hkv, axis=1)
        sel = qexp_mask()
        qexp = jnp.where(sel, qrep, 0.0)
        knew = knew_ref[0].astype(jnp.float32)   # (1, KD)
        vnew = vnew_ref[0].astype(jnp.float32)
        s_self = jax.lax.dot_general(
            qexp, knew, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if softcap > 0:
            s_self = softcap * jnp.tanh(s_self / softcap)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, s_self)
        alpha = jnp.exp(m_prev - m_new)
        p_self = jnp.exp(s_self - m_new)
        l = l_ref[:] * alpha + p_self
        acc = acc_ref[:] * alpha + p_self * vnew
        acc = acc / l
        acc = jnp.where(sel, acc, 0.0)
        kdi = jax.lax.broadcasted_iota(jnp.int32, (KD, D), 0) % D
        di = jax.lax.broadcasted_iota(jnp.int32, (KD, D), 1)
        R = (kdi == di).astype(jnp.float32)
        o_ref[0] = jax.lax.dot_general(
            acc, R, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "n_kv_heads", "page_size",
                                    "scale", "softcap", "interpret"))
def decode_attention_paged_q8c(q: jnp.ndarray, k_new: jnp.ndarray,
                               v_new: jnp.ndarray, k_pool: jnp.ndarray,
                               v_pool: jnp.ndarray, ks_pool: jnp.ndarray,
                               vs_pool: jnp.ndarray, page_table: jnp.ndarray,
                               positions: jnp.ndarray, n_heads: int,
                               n_kv_heads: int, page_size: int, scale: float,
                               softcap: float = 0.0,
                               interpret: bool = False):
    """Column-layout Q8 paged decode: k_pool/v_pool are (NP*KD, P) int8
    (page p = rows [p*KD, (p+1)*KD)); everything else as
    decode_attention_paged_q8."""
    B, H = q.shape[:2]
    Hkv = n_kv_heads
    P = page_size
    KD = Hkv * (q.shape[2])
    D = q.shape[2]
    MP = page_table.shape[1]
    NP = k_pool.shape[0] // KD
    HS = ks_pool.shape[0] // NP   # transposed scale tile rows (kv/paged.py)

    def q8(x):  # (B, Hkv, D) -> int8 col (B, KD, 1), scale col (B, HS, 1)
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        sc = amax / 127.0
        inv = jnp.where(sc > 0, 1.0 / sc, 0.0)
        qv = jnp.round(x.astype(jnp.float32) * inv[..., None]).astype(jnp.int8)
        deq = (qv.astype(jnp.float32)
               * sc.astype(jnp.bfloat16).astype(jnp.float32)[..., None])
        scp = jnp.pad(sc.astype(jnp.bfloat16), ((0, 0), (0, HS - Hkv)))
        return (qv.reshape(B, KD, 1),
                scp.reshape(B, HS, 1),
                deq.astype(jnp.bfloat16).reshape(B, 1, KD))

    kq, ksn, kdq = q8(k_new)
    vq, vsn, vdq = q8(v_new)
    positions = jnp.where(positions >= 0, positions, MP * P)

    def kv_map(b, s, pos_ref, tab_ref):
        last = jnp.minimum(pos_ref[b] // P, MP - 1)
        page = tab_ref[b, jnp.minimum(s, last)]
        return (jnp.clip(page, 0, NP - 1), 0)

    def w_map(b, s, pos_ref, tab_ref):
        wblk = jnp.minimum(pos_ref[b] // P, MP - 1)
        return (jnp.clip(tab_ref[b, wblk], 0, NP - 1), 0)

    bmap3 = lambda b, s, p, t: (b, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, MP),
        in_specs=[pl.BlockSpec((1, H, D), bmap3),
                  pl.BlockSpec((1, 1, KD), bmap3),
                  pl.BlockSpec((1, 1, KD), bmap3),
                  pl.BlockSpec((1, KD, 1), bmap3),
                  pl.BlockSpec((1, KD, 1), bmap3),
                  pl.BlockSpec((1, HS, 1), bmap3),
                  pl.BlockSpec((1, HS, 1), bmap3),
                  pl.BlockSpec((KD, P), kv_map),
                  pl.BlockSpec((KD, P), kv_map),
                  pl.BlockSpec((HS, P), kv_map),
                  pl.BlockSpec((HS, P), kv_map)],
        out_specs=[pl.BlockSpec((1, H, D), bmap3),
                   pl.BlockSpec((KD, P), w_map),
                   pl.BlockSpec((KD, P), w_map),
                   pl.BlockSpec((HS, P), w_map),
                   pl.BlockSpec((HS, P), w_map)],
        scratch_shapes=[pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, KD), jnp.float32)],
    )
    out, k2, v2, ks2, vs2 = pl.pallas_call(
        functools.partial(_pq8c_kernel, H=H, Hkv=Hkv, HS=HS, D=D, P=P,
                          scale=scale, softcap=softcap),
        compiler_params=_paged_cp(),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, H, D), jnp.float32),
                   jax.ShapeDtypeStruct(k_pool.shape, jnp.int8),
                   jax.ShapeDtypeStruct(v_pool.shape, jnp.int8),
                   jax.ShapeDtypeStruct(ks_pool.shape, jnp.bfloat16),
                   jax.ShapeDtypeStruct(vs_pool.shape, jnp.bfloat16)],
        # indices include the 2 scalar-prefetch args: 9..12 = pools
        input_output_aliases={9: 1, 10: 2, 11: 3, 12: 4},
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * MP * P * D,
            bytes_accessed=2 * B * MP * P * KD,
            transcendentals=B * H * MP * P),
        interpret=interpret,
    )(positions.astype(jnp.int32), page_table.astype(jnp.int32),
      q.astype(jnp.bfloat16), kdq, vdq,
      kq.reshape(B, KD, 1), vq.reshape(B, KD, 1), ksn, vsn,
      k_pool, v_pool, ks_pool, vs_pool)
    return out, k2, v2, ks2, vs2


def _pq4c_kernel(pos_ref, tab_ref, q_ref, knew_ref, vnew_ref, kqn_ref,
                 vqn_ref, ksn_ref, vsn_ref, k_ref, v_ref, ks_ref, vs_ref,
                 o_ref, ko_ref, vo_ref, kso_ref, vso_ref, m_ref, l_ref,
                 acc_ref, *, H: int, Hkv: int, HS: int, D: int, P: int,
                 scale: float, softcap: float):
    """Column-layout paged Q4 decode attention: (KD2, P) packed-nibble
    tiles; unpack = two VPU ops + a SUBLANE concat producing (KD, P) in
    plane order (see _pq4kernel for the plane-order masks/fold-back)."""
    s = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    b = pl.program_id(0)
    KD = Hkv * D
    KD2 = KD // 2
    D2 = D // 2
    G = H // Hkv
    pos = pos_ref[b]
    wblk = jnp.minimum(pos // P, n_blocks - 1)

    @pl.when(s == wblk)
    def _write():
        colpos = pos - wblk * P
        in_range = pos < n_blocks * P
        cidx = jax.lax.broadcasted_iota(jnp.int32, (KD2, P), 1)
        sel = (cidx == colpos) & in_range
        ko_ref[:] = jnp.where(sel, jnp.broadcast_to(kqn_ref[0], (KD2, P)),
                              k_ref[:])
        vo_ref[:] = jnp.where(sel, jnp.broadcast_to(vqn_ref[0], (KD2, P)),
                              v_ref[:])
        cids = jax.lax.broadcasted_iota(jnp.int32, (HS, P), 1)
        sels = (cids == colpos) & in_range
        kso_ref[:] = jnp.where(sels, jnp.broadcast_to(ksn_ref[0], (HS, P)),
                               ks_ref[:])
        vso_ref[:] = jnp.where(sels, jnp.broadcast_to(vsn_ref[0], (HS, P)),
                               vs_ref[:])

    def plane_masks():
        cm = jax.lax.broadcasted_iota(jnp.int32, (H, KD), 1)
        hh = (cm % KD2) // D2
        hq = jax.lax.broadcasted_iota(jnp.int32, (H, KD), 0) // G
        return hq == hh

    def qexp_perm():
        q = q_ref[0].astype(jnp.float32)
        qlo = pltpu.repeat(q[:, :D2], Hkv, axis=1)   # (H, KD2)
        qhi = pltpu.repeat(q[:, D2:], Hkv, axis=1)
        qcat = jnp.concatenate([qlo, qhi], axis=1)   # (H, KD) plane order
        return jnp.where(plane_masks(), qcat, 0.0)

    @pl.when(s == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s * P < pos)
    def _compute():
        hidx = jax.lax.broadcasted_iota(jnp.int32, (H, HS), 0) // G
        kidx = jax.lax.broadcasted_iota(jnp.int32, (H, HS), 1)
        Eh = (hidx == kidx).astype(jnp.bfloat16)
        ksx = jax.lax.dot_general(
            Eh, ks_ref[:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (H, P)
        vsx = jax.lax.dot_general(
            Eh, vs_ref[:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        p8 = k_ref[:].astype(jnp.int32)            # (KD2, P)
        kd = jnp.concatenate([(p8 & 0xF) - 8, (p8 >> 4) - 8],
                             axis=0).astype(jnp.bfloat16)  # (KD, P) planes
        pv8 = v_ref[:].astype(jnp.int32)
        vd = jnp.concatenate([(pv8 & 0xF) - 8, (pv8 >> 4) - 8],
                             axis=0).astype(jnp.bfloat16)
        qexp = qexp_perm().astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            qexp, kd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * ksx * scale  # (H, P)
        if softcap > 0:
            scores = softcap * jnp.tanh(scores / softcap)
        sidx = jax.lax.broadcasted_iota(jnp.int32, (H, P), 1) + s * P
        scores = jnp.where(sidx < pos, scores, -1e30)
        m_prev = m_ref[:]
        m_blk = jnp.max(scores, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_blk)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            (p * vsx).astype(jnp.bfloat16), vd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (H, KD) plane order
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(s == n_blocks - 1)
    def _final():
        qexp = qexp_perm()
        knew = knew_ref[0].astype(jnp.float32)   # (1, KD) plane order
        vnew = vnew_ref[0].astype(jnp.float32)
        s_self = jax.lax.dot_general(
            qexp, knew, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if softcap > 0:
            s_self = softcap * jnp.tanh(s_self / softcap)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, s_self)
        alpha = jnp.exp(m_prev - m_new)
        p_self = jnp.exp(s_self - m_new)
        l = l_ref[:] * alpha + p_self
        acc = acc_ref[:] * alpha + p_self * vnew
        acc = acc / l
        acc = jnp.where(plane_masks(), acc, 0.0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (KD, D), 0)
        di = jax.lax.broadcasted_iota(jnp.int32, (KD, D), 1)
        R = (((ci // KD2) * D2 + (ci % D2)) == di).astype(jnp.float32)
        o_ref[0] = jax.lax.dot_general(
            acc, R, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "n_kv_heads", "page_size",
                                    "scale", "softcap", "interpret"))
def decode_attention_paged_q4c(q: jnp.ndarray, k_new: jnp.ndarray,
                               v_new: jnp.ndarray, k_pool: jnp.ndarray,
                               v_pool: jnp.ndarray, ks_pool: jnp.ndarray,
                               vs_pool: jnp.ndarray, page_table: jnp.ndarray,
                               positions: jnp.ndarray, n_heads: int,
                               n_kv_heads: int, page_size: int, scale: float,
                               softcap: float = 0.0,
                               interpret: bool = False):
    """Column-layout Q4 paged decode: k_pool/v_pool are (NP*KD2, P) uint8
    plane-split nibble tiles (page p = rows [p*KD2, (p+1)*KD2))."""
    B, H = q.shape[:2]
    Hkv = n_kv_heads
    P = page_size
    D = q.shape[2]
    KD = Hkv * D
    KD2 = KD // 2
    D2 = D // 2
    MP = page_table.shape[1]
    NP = k_pool.shape[0] // KD2
    HS = ks_pool.shape[0] // NP   # transposed scale tile rows (kv/paged.py)

    def q4(x):  # (B, Hkv, D) -> packed col (B, KD2, 1), scale col, deq-planes
        from ..kv.paged import _quantize_q4

        packed, sc = _quantize_q4(x)           # (B, Hkv, D2) u8, (B, Hkv)
        p = packed.astype(jnp.int32)
        lo = (p & 0xF) - 8
        hi = (p >> 4) - 8
        scf = sc.astype(jnp.float32)[..., None]
        deq_lo = (lo.astype(jnp.float32) * scf).reshape(B, KD2)
        deq_hi = (hi.astype(jnp.float32) * scf).reshape(B, KD2)
        deq = jnp.concatenate([deq_lo, deq_hi], axis=-1)  # plane order
        scp = jnp.pad(sc, ((0, 0), (0, HS - Hkv)))
        return (packed.reshape(B, KD2, 1),
                scp.reshape(B, HS, 1),
                deq.astype(jnp.bfloat16).reshape(B, 1, KD))

    kq, ksn, kdq = q4(k_new)
    vq, vsn, vdq = q4(v_new)
    positions = jnp.where(positions >= 0, positions, MP * P)

    def kv_map(b, s, pos_ref, tab_ref):
        last = jnp.minimum(pos_ref[b] // P, MP - 1)
        page = tab_ref[b, jnp.minimum(s, last)]
        return (jnp.clip(page, 0, NP - 1), 0)

    def w_map(b, s, pos_ref, tab_ref):
        wblk = jnp.minimum(pos_ref[b] // P, MP - 1)
        return (jnp.clip(tab_ref[b, wblk], 0, NP - 1), 0)

    bmap3 = lambda b, s, p, t: (b, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, MP),
        in_specs=[pl.BlockSpec((1, H, D), bmap3),
                  pl.BlockSpec((1, 1, KD), bmap3),
                  pl.BlockSpec((1, 1, KD), bmap3),
                  pl.BlockSpec((1, KD2, 1), bmap3),
                  pl.BlockSpec((1, KD2, 1), bmap3),
                  pl.BlockSpec((1, HS, 1), bmap3),
                  pl.BlockSpec((1, HS, 1), bmap3),
                  pl.BlockSpec((KD2, P), kv_map),
                  pl.BlockSpec((KD2, P), kv_map),
                  pl.BlockSpec((HS, P), kv_map),
                  pl.BlockSpec((HS, P), kv_map)],
        out_specs=[pl.BlockSpec((1, H, D), bmap3),
                   pl.BlockSpec((KD2, P), w_map),
                   pl.BlockSpec((KD2, P), w_map),
                   pl.BlockSpec((HS, P), w_map),
                   pl.BlockSpec((HS, P), w_map)],
        scratch_shapes=[pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, KD), jnp.float32)],
    )
    out, k2, v2, ks2, vs2 = pl.pallas_call(
        functools.partial(_pq4c_kernel, H=H, Hkv=Hkv, HS=HS, D=D, P=P,
                          scale=scale, softcap=softcap),
        compiler_params=_paged_cp(),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, H, D), jnp.float32),
                   jax.ShapeDtypeStruct(k_pool.shape, jnp.uint8),
                   jax.ShapeDtypeStruct(v_pool.shape, jnp.uint8),
                   jax.ShapeDtypeStruct(ks_pool.shape, jnp.bfloat16),
                   jax.ShapeDtypeStruct(vs_pool.shape, jnp.bfloat16)],
        input_output_aliases={9: 1, 10: 2, 11: 3, 12: 4},
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * MP * P * D,
            bytes_accessed=B * MP * P * KD,
            transcendentals=B * H * MP * P),
        interpret=interpret,
    )(positions.astype(jnp.int32), page_table.astype(jnp.int32),
      q.astype(jnp.bfloat16), kdq, vdq, kq, vq, ksn, vsn,
      k_pool, v_pool, ks_pool, vs_pool)
    return out, k2, v2, ks2, vs2


# ---------------------------------------------------------------------------
# paged + Q4-quantized variant (--quantkv 2 + --paged; the 13B@16K enabler)
# ---------------------------------------------------------------------------

def _pq4kernel(pos_ref, tab_ref, q_ref, knew_ref, vnew_ref, kqn_ref, vqn_ref,
               ksn_ref, vsn_ref, k_ref, v_ref, ks_ref, vs_ref,
               o_ref, ko_ref, vo_ref, kso_ref, vso_ref, m_ref, l_ref, acc_ref,
               *, H: int, Hkv: int, HS: int, D: int, P: int, scale: float,
               softcap: float):
    """Paged Q4 decode attention (plane-split nibbles, kv/paged.py
    _quantize_q4): cache blocks are (P, KD//2) uint8 where byte i of a
    head's block packs (elem i) | (elem i+D//2 << 4). Unpack = two VPU ops +
    one lane concat yielding the D axis in PLANE ORDER per head
    ([0..D/2) then [D/2..D)); no cross-lane interleave. The query expansion,
    GQA head masks and the final (KD, D) fold-back are rebuilt for the
    permuted column order with iota arithmetic, so the permutation costs
    nothing. Scales stay per (row, head) and apply on the score side like
    _pq8kernel. The new row arrives pre-permuted (knew/vnew dequantized in
    plane order) for the analytic self term. Halves attention HBM traffic
    vs q8 — the difference between 13B@16K fitting on one chip and OOM."""
    s = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    b = pl.program_id(0)
    KD = Hkv * D
    KD2 = KD // 2
    D2 = D // 2
    G = H // Hkv
    pos = pos_ref[b]
    wblk = jnp.minimum(pos // P, n_blocks - 1)

    @pl.when(s == wblk)
    def _write():
        row = pos - wblk * P
        in_range = pos < n_blocks * P
        ridx = jax.lax.broadcasted_iota(jnp.int32, (P, KD2), 0)
        sel = (ridx == row) & in_range
        ko_ref[:] = jnp.where(sel, jnp.broadcast_to(kqn_ref[0], (P, KD2)),
                              k_ref[:])
        vo_ref[:] = jnp.where(sel, jnp.broadcast_to(vqn_ref[0], (P, KD2)),
                              v_ref[:])
        cids = jax.lax.broadcasted_iota(jnp.int32, (HS, P), 1)
        sels = (cids == row) & in_range
        kso_ref[:] = jnp.where(sels, jnp.broadcast_to(ksn_ref[0], (HS, P)),
                               ks_ref[:])
        vso_ref[:] = jnp.where(sels, jnp.broadcast_to(vsn_ref[0], (HS, P)),
                               vs_ref[:])

    def plane_masks():
        # column c of the unpacked (.., KD) plane-order axis belongs to
        # kv-head (c % KD2) // D2; its within-head dim is
        # (c // KD2) * D2 + (c % D2)
        cm = jax.lax.broadcasted_iota(jnp.int32, (H, KD), 1)
        hh = (cm % KD2) // D2
        hq = jax.lax.broadcasted_iota(jnp.int32, (H, KD), 0) // G
        return hq == hh

    def qexp_perm():
        # q (H, D) -> (H, KD) in plane order: tile q[:, :D2] across heads for
        # the lo half, q[:, D2:] for the hi half, mask to own head's columns
        q = q_ref[0].astype(jnp.float32)
        qlo = pltpu.repeat(q[:, :D2], Hkv, axis=1)   # (H, KD2)
        qhi = pltpu.repeat(q[:, D2:], Hkv, axis=1)
        qcat = jnp.concatenate([qlo, qhi], axis=1)   # (H, KD) plane order
        return jnp.where(plane_masks(), qcat, 0.0)

    @pl.when(s == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s * P < pos)
    def _compute():
        # score-side per-(row, head) scales, exactly like _pq8kernel
        hidx = jax.lax.broadcasted_iota(jnp.int32, (H, HS), 0) // G
        kidx = jax.lax.broadcasted_iota(jnp.int32, (H, HS), 1)
        Eh = (hidx == kidx).astype(jnp.bfloat16)   # (H, HS) 0/1
        ksx = jax.lax.dot_general(
            Eh, ks_ref[:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (H, P)
        vsx = jax.lax.dot_general(
            Eh, vs_ref[:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        p8 = k_ref[:].astype(jnp.int32)            # (P, KD2) packed
        kd = jnp.concatenate([(p8 & 0xF) - 8, (p8 >> 4) - 8],
                             axis=1).astype(jnp.bfloat16)  # (P, KD) planes
        pv8 = v_ref[:].astype(jnp.int32)
        vd = jnp.concatenate([(pv8 & 0xF) - 8, (pv8 >> 4) - 8],
                             axis=1).astype(jnp.bfloat16)
        qexp = qexp_perm().astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            qexp, kd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * ksx * scale  # (H, P)
        if softcap > 0:
            scores = softcap * jnp.tanh(scores / softcap)
        sidx = jax.lax.broadcasted_iota(jnp.int32, (H, P), 1) + s * P
        scores = jnp.where(sidx < pos, scores, -1e30)
        m_prev = m_ref[:]
        m_blk = jnp.max(scores, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_blk)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            (p * vsx).astype(jnp.bfloat16), vd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(s == n_blocks - 1)
    def _final():
        qexp = qexp_perm()
        knew = knew_ref[0].astype(jnp.float32)   # (1, KD) plane order
        vnew = vnew_ref[0].astype(jnp.float32)
        s_self = jax.lax.dot_general(
            qexp, knew, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if softcap > 0:
            s_self = softcap * jnp.tanh(s_self / softcap)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, s_self)
        alpha = jnp.exp(m_prev - m_new)
        p_self = jnp.exp(s_self - m_new)
        l = l_ref[:] * alpha + p_self
        acc = acc_ref[:] * alpha + p_self * vnew
        acc = acc / l
        acc = jnp.where(plane_masks(), acc, 0.0)
        # fold plane-order (H, KD) back to (H, D): column c contributes to
        # output dim (c // KD2) * D2 + (c % D2)
        ci = jax.lax.broadcasted_iota(jnp.int32, (KD, D), 0)
        di = jax.lax.broadcasted_iota(jnp.int32, (KD, D), 1)
        R = (((ci // KD2) * D2 + (ci % D2)) == di).astype(jnp.float32)
        o_ref[0] = jax.lax.dot_general(
            acc, R, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "n_kv_heads", "page_size",
                                    "scale", "softcap", "interpret"))
def decode_attention_paged_q4(q: jnp.ndarray, k_new: jnp.ndarray,
                              v_new: jnp.ndarray, k_pool: jnp.ndarray,
                              v_pool: jnp.ndarray, ks_pool: jnp.ndarray,
                              vs_pool: jnp.ndarray, page_table: jnp.ndarray,
                              positions: jnp.ndarray, n_heads: int,
                              n_kv_heads: int, page_size: int, scale: float,
                              softcap: float = 0.0,
                              interpret: bool = False):
    """q: (B, H, D); k_new/v_new: (B, Hkv, D) bf16 (unquantized);
    k_pool/v_pool: (NP*P, Hkv*D//2) uint8 plane-split nibble page pools;
    ks/vs_pool: (NP*HS, P) bf16 transposed per-head scale tiles
    (kv/paged.py); page_table: (B, MP) int32; positions: (B,).
    Quantizes the new row here
    (kv/paged.py _quantize_q4 semantics) and uses the dequantized values for
    the self term, so results match the write-then-gather XLA path. Returns
    (out (B, H, D) f32, k', v', ks', vs' aliased updated pools)."""
    B, H = q.shape[:2]
    Hkv = n_kv_heads
    P = page_size
    KD2 = k_pool.shape[1]
    KD = KD2 * 2
    D = KD // Hkv
    D2 = D // 2
    MP = page_table.shape[1]
    NP = k_pool.shape[0] // P
    HS = ks_pool.shape[0] // NP   # transposed scale tile rows (kv/paged.py)

    def q4(x):  # (B, Hkv, D) -> packed (B, 1, KD2), scale col (B, HS, 1),
        #         dequantized-in-plane-order (B, 1, KD)
        # shares kv/paged.py _quantize_q4 so the in-kernel write block is
        # bit-identical to paged.write's, and derives the self-term values
        # from the PACKED bytes (matching what the cache will hold)
        from ..kv.paged import _quantize_q4

        packed, sc = _quantize_q4(x)           # (B, Hkv, D2) u8, (B, Hkv)
        p = packed.astype(jnp.int32)
        lo = (p & 0xF) - 8
        hi = (p >> 4) - 8
        scf = sc.astype(jnp.float32)[..., None]
        deq_lo = (lo.astype(jnp.float32) * scf).reshape(B, KD2)
        deq_hi = (hi.astype(jnp.float32) * scf).reshape(B, KD2)
        deq = jnp.concatenate([deq_lo, deq_hi], axis=-1)  # plane order
        scp = jnp.pad(sc, ((0, 0), (0, HS - Hkv)))
        return (packed.reshape(B, 1, KD2),
                scp.reshape(B, HS, 1),
                deq.astype(jnp.bfloat16).reshape(B, 1, KD))

    kq, ksn, kdq = q4(k_new)
    vq, vsn, vdq = q4(v_new)
    # dead slots (position < 0) -> overshoot copy-through (see paged bf16)
    positions = jnp.where(positions >= 0, positions, MP * P)

    def kv_map(b, s, pos_ref, tab_ref):
        last = jnp.minimum(pos_ref[b] // P, MP - 1)
        page = tab_ref[b, jnp.minimum(s, last)]
        return (jnp.clip(page, 0, NP - 1), 0)

    def w_map(b, s, pos_ref, tab_ref):
        wblk = jnp.minimum(pos_ref[b] // P, MP - 1)
        return (jnp.clip(tab_ref[b, wblk], 0, NP - 1), 0)

    bmap3 = lambda b, s, p, t: (b, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, MP),
        in_specs=[pl.BlockSpec((1, H, D), bmap3),
                  pl.BlockSpec((1, 1, KD), bmap3),
                  pl.BlockSpec((1, 1, KD), bmap3),
                  pl.BlockSpec((1, 1, KD2), bmap3),
                  pl.BlockSpec((1, 1, KD2), bmap3),
                  pl.BlockSpec((1, HS, 1), bmap3),
                  pl.BlockSpec((1, HS, 1), bmap3),
                  pl.BlockSpec((P, KD2), kv_map),
                  pl.BlockSpec((P, KD2), kv_map),
                  pl.BlockSpec((HS, P), kv_map),
                  pl.BlockSpec((HS, P), kv_map)],
        out_specs=[pl.BlockSpec((1, H, D), bmap3),
                   pl.BlockSpec((P, KD2), w_map),
                   pl.BlockSpec((P, KD2), w_map),
                   pl.BlockSpec((HS, P), w_map),
                   pl.BlockSpec((HS, P), w_map)],
        scratch_shapes=[pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, KD), jnp.float32)],
    )
    out, k2, v2, ks2, vs2 = pl.pallas_call(
        functools.partial(_pq4kernel, H=H, Hkv=Hkv, HS=HS, D=D, P=P,
                          scale=scale, softcap=softcap),
        compiler_params=_paged_cp(),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, H, D), jnp.float32),
                   jax.ShapeDtypeStruct(k_pool.shape, jnp.uint8),
                   jax.ShapeDtypeStruct(v_pool.shape, jnp.uint8),
                   jax.ShapeDtypeStruct(ks_pool.shape, jnp.bfloat16),
                   jax.ShapeDtypeStruct(vs_pool.shape, jnp.bfloat16)],
        # indices include the 2 scalar-prefetch args: 9..12 = pools
        input_output_aliases={9: 1, 10: 2, 11: 3, 12: 4},
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * MP * P * D,
            bytes_accessed=B * MP * P * KD,
            transcendentals=B * H * MP * P),
        interpret=interpret,
    )(positions.astype(jnp.int32), page_table.astype(jnp.int32),
      q.astype(jnp.bfloat16), kdq, vdq, kq, vq, ksn, vsn,
      k_pool, v_pool, ks_pool, vs_pool)
    return out, k2, v2, ks2, vs2
