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


def init_cache(n_layers: int, batch: int, max_seq: int, n_kv_heads: int,
               head_dim: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (n_layers, batch, max_seq, n_kv_heads, head_dim)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def write(cache: KVCache, layer: int, positions: jnp.ndarray,
          k_new: jnp.ndarray, v_new: jnp.ndarray) -> KVCache:
    """Scatter k/v (B, T, H_kv, D) into slots given by positions (B, T).
    Out-of-range positions (e.g. -1 padding) are dropped."""
    b_idx = jnp.arange(k_new.shape[0])[:, None]
    k = cache.k.at[layer, b_idx, positions].set(k_new.astype(cache.k.dtype), mode="drop")
    v = cache.v.at[layer, b_idx, positions].set(v_new.astype(cache.v.dtype), mode="drop")
    return KVCache(k=k, v=v)
