"""Paged KV cache with optional Q8 quantization.

TPU-native counterpart of llama.cpp's cell-based unified KV cache +
quantized K/V types (/root/reference/src/llama.cpp:2772 llama_kv_cache,
type_k/type_v :2788, --quantkv gpttype_adapter.cpp:1958): a global page pool
(L, n_pages, page_size, H_kv, D) and an int32 page table per slot. Pages are
assigned by a host-side allocator; all device ops (write/gather) are static-
shape gathers/scatters driven by the table, so the whole step stays jittable.

Q8 mode stores values as int8 with a per-(page-row, head) bf16 scale —
the --quantkv 1 equivalent (8.25 bits/value vs bf16's 16).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "v", "k_scale", "v_scale"],
         meta_fields=["page_size", "quantized"])
@dataclass
class PagedKVCache:
    k: jnp.ndarray        # (L, NP, P, H, D) bf16 | int8
    v: jnp.ndarray
    k_scale: jnp.ndarray  # (L, NP, P, H) bf16; dummy (1,) when not quantized
    v_scale: jnp.ndarray
    page_size: int
    quantized: bool

    @property
    def n_layers(self) -> int:
        return self.k.shape[0]

    @property
    def n_pages(self) -> int:
        return self.k.shape[1]


def init_paged_cache(n_layers: int, n_pages: int, page_size: int,
                     n_kv_heads: int, head_dim: int,
                     quantized: bool = False) -> PagedKVCache:
    shape = (n_layers, n_pages, page_size, n_kv_heads, head_dim)
    if quantized:
        return PagedKVCache(
            k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(shape[:-1], jnp.bfloat16),
            v_scale=jnp.zeros(shape[:-1], jnp.bfloat16),
            page_size=page_size, quantized=True)
    return PagedKVCache(
        k=jnp.zeros(shape, jnp.bfloat16), v=jnp.zeros(shape, jnp.bfloat16),
        k_scale=jnp.zeros((1,), jnp.bfloat16),
        v_scale=jnp.zeros((1,), jnp.bfloat16),
        page_size=page_size, quantized=False)


def _quantize_q8(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., D) -> int8 values + (...,) scale."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / scale, 0.0)
    q = jnp.round(x.astype(jnp.float32) * inv[..., None]).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def write(cache: PagedKVCache, layer: int, page_table: jnp.ndarray,
          positions: jnp.ndarray, k_new: jnp.ndarray,
          v_new: jnp.ndarray) -> PagedKVCache:
    """Scatter k/v (B, T, H, D) at (B, T) positions via the page table.

    page_table: (B, MP) int32 global page ids. Out-of-range positions drop.
    """
    P = cache.page_size
    b_idx = jnp.arange(k_new.shape[0])[:, None]
    page_idx = positions // P          # (B, T) index into the slot's table
    offset = positions % P
    gpage = page_table[b_idx, jnp.clip(page_idx, 0, page_table.shape[1] - 1)]
    gpage = jnp.where(positions >= 0, gpage, -1)  # drop padding rows
    if cache.quantized:
        qk, sk = _quantize_q8(k_new)
        qv, sv = _quantize_q8(v_new)
        k = cache.k.at[layer, gpage, offset].set(qk, mode="drop")
        v = cache.v.at[layer, gpage, offset].set(qv, mode="drop")
        ks = cache.k_scale.at[layer, gpage, offset].set(sk, mode="drop")
        vs = cache.v_scale.at[layer, gpage, offset].set(sv, mode="drop")
        return PagedKVCache(k=k, v=v, k_scale=ks, v_scale=vs,
                            page_size=P, quantized=True)
    k = cache.k.at[layer, gpage, offset].set(k_new.astype(cache.k.dtype), mode="drop")
    v = cache.v.at[layer, gpage, offset].set(v_new.astype(cache.v.dtype), mode="drop")
    return PagedKVCache(k=k, v=v, k_scale=cache.k_scale, v_scale=cache.v_scale,
                        page_size=P, quantized=False)


def gather(cache: PagedKVCache, layer: int,
           page_table: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Materialize per-slot K/V: (B, MP*P, H, D) bf16 (dequantized if Q8).

    The XLA-attention path consumes this directly; the paged flash-decode
    Pallas kernel reads pages in place instead.
    """
    P = cache.page_size
    B, MP = page_table.shape
    k = cache.k[layer, page_table]  # (B, MP, P, H, D)
    v = cache.v[layer, page_table]
    if cache.quantized:
        ks = cache.k_scale[layer, page_table].astype(jnp.float32)
        vs = cache.v_scale[layer, page_table].astype(jnp.float32)
        k = (k.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
        v = (v.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
    H, D = k.shape[-2], k.shape[-1]
    return (k.reshape(B, MP * P, H, D), v.reshape(B, MP * P, H, D))


class PageAllocator:
    """Host-side free-list allocator mapping slots to page lists.

    Counterpart of llama_kv_cache find_slot/seq_rm bookkeeping
    (/root/reference/src/llama.cpp:3656,3967), page-granular."""

    def __init__(self, n_pages: int, page_size: int, max_pages_per_slot: int):
        self.n_pages = n_pages
        self.page_size = page_size
        self.max_pages = max_pages_per_slot
        self.free: list[int] = list(range(n_pages - 1, -1, -1))
        self.slot_pages: dict[int, list[int]] = {}

    def ensure(self, slot: int, n_tokens: int) -> list[int]:
        """Grow slot's page list to cover n_tokens; returns the page list."""
        pages = self.slot_pages.setdefault(slot, [])
        need = -(-n_tokens // self.page_size)
        if need > self.max_pages:
            raise MemoryError(f"slot {slot}: {n_tokens} tokens exceed "
                              f"{self.max_pages} pages")
        while len(pages) < need:
            if not self.free:
                raise MemoryError("KV page pool exhausted")
            pages.append(self.free.pop())
        return pages

    def trim(self, slot: int, n_tokens: int):
        """Release pages beyond n_tokens (context rewind / truncation)."""
        pages = self.slot_pages.get(slot, [])
        keep = -(-n_tokens // self.page_size) if n_tokens > 0 else 0
        while len(pages) > keep:
            self.free.append(pages.pop())

    def release(self, slot: int):
        self.trim(slot, 0)
        self.slot_pages.pop(slot, None)

    def table(self, slot: int) -> np.ndarray:
        """Padded int32 page-table row for this slot (unused entries -> 0,
        masked out by position bounds at attention time)."""
        row = np.zeros(self.max_pages, dtype=np.int32)
        pages = self.slot_pages.get(slot, [])
        row[:len(pages)] = pages
        return row

    @property
    def n_free(self) -> int:
        return len(self.free)
