"""KV cache (contiguous, slot == absolute position).

Round-1 engine layout: per-model stacked (L, B, S, H_kv, D) bf16 arrays with
scatter writes by position. The paged allocator (kv/paged.py) generalizes this
for continuous batching; this simple cache keeps the invariant slot == position
which makes causal masking a comparison against the query position.

Counterpart of llama.cpp's llama_kv_cache ring/cells
(/root/reference/src/llama.cpp:2772) redesigned for static XLA shapes.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass, data_fields=["k", "v"], meta_fields=[])
@dataclass
class KVCache:
    k: jnp.ndarray  # (L, B, S, H_kv, D)
    v: jnp.ndarray

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]

    @property
    def batch(self) -> int:
        return self.k.shape[1]


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "v", "k_scale", "v_scale"], meta_fields=[])
@dataclass
class QuantKVCache:
    """Q8-quantized KV (--quantkv 1 equivalent; reference type_k/type_v
    Q8_0, gpttype_adapter.cpp:1958): int8 values + bf16 scale per
    (slot, head) row — 8.x bits/value vs bf16's 16."""

    k: jnp.ndarray  # (L, B, S, H_kv, D) int8
    v: jnp.ndarray
    k_scale: jnp.ndarray  # (L, B, S, H_kv) bf16
    v_scale: jnp.ndarray

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]

    @property
    def batch(self) -> int:
        return self.k.shape[1]


def init_cache(n_layers: int, batch: int, max_seq: int, n_kv_heads: int,
               head_dim: int, dtype=jnp.bfloat16, quantized: bool = False):
    shape = (n_layers, batch, max_seq, n_kv_heads, head_dim)
    if quantized:
        return QuantKVCache(
            k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(shape[:-1], jnp.bfloat16),
            v_scale=jnp.zeros(shape[:-1], jnp.bfloat16))
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def _q8(x: jnp.ndarray):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / scale, 0.0)
    q = jnp.round(x.astype(jnp.float32) * inv[..., None]).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def write(cache, layer: int, positions: jnp.ndarray,
          k_new: jnp.ndarray, v_new: jnp.ndarray):
    """Scatter k/v (B, T, H_kv, D) into slots given by positions (B, T).
    Out-of-range positions (e.g. -1 padding) are dropped."""
    b_idx = jnp.arange(k_new.shape[0])[:, None]
    if isinstance(cache, QuantKVCache):
        qk, sk = _q8(k_new)
        qv, sv = _q8(v_new)
        return QuantKVCache(
            k=cache.k.at[layer, b_idx, positions].set(qk, mode="drop"),
            v=cache.v.at[layer, b_idx, positions].set(qv, mode="drop"),
            k_scale=cache.k_scale.at[layer, b_idx, positions].set(sk, mode="drop"),
            v_scale=cache.v_scale.at[layer, b_idx, positions].set(sv, mode="drop"))
    k = cache.k.at[layer, b_idx, positions].set(k_new.astype(cache.k.dtype), mode="drop")
    v = cache.v.at[layer, b_idx, positions].set(v_new.astype(cache.v.dtype), mode="drop")
    return KVCache(k=k, v=v)


def read(cache, layer: int):
    """Layer view as bf16 (dequantized when Q8)."""
    if isinstance(cache, QuantKVCache):
        k = (cache.k[layer].astype(jnp.float32)
             * cache.k_scale[layer].astype(jnp.float32)[..., None])
        v = (cache.v[layer].astype(jnp.float32)
             * cache.v_scale[layer].astype(jnp.float32)[..., None])
        return k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    return cache.k[layer], cache.v[layer]
