"""Paged KV cache with optional Q8/Q4 quantization.

TPU-native counterpart of llama.cpp's cell-based unified KV cache +
quantized K/V types (/root/reference/src/llama.cpp:2772 llama_kv_cache,
type_k/type_v :2788, --quantkv gpttype_adapter.cpp:1958-1959 F16/Q8_0/Q4_0):
a per-layer page pool and an int32 page table per slot. Pages are assigned
by a host-side allocator; all device ops (write/gather) are static-shape
gathers/scatters driven by the table, so the whole step stays jittable.

Layout: per-layer TUPLE leaves (same reasoning as kv/cache.py — a stacked
array forces slice copies per layer). ALL pools are FUSED 2-D buffers:
page p owns rows [p*P, (p+1)*P), which is exactly the block shape the paged
flash-decode kernels address through the page table, zero-copy. bf16 pools
are (NP*P, H*D); Q8 pools are (NP*P, H*D) int8 + (NP*P, H) bf16 per-row
per-head scales — the same sidecar layout decode_attention_batched_q8 reads,
so the paged q8 kernel streams int8 in place (1.95x less attention HBM
traffic than bf16, measured on the slot-batched variant).

Q4 pools (--quantkv 2 equivalent, the 13B@16K enabler) halve that again:
(NP*P, H*D//2) uint8 with PLANE-SPLIT nibble packing — byte i of a head's
D//2-byte block holds elem i in the low nibble and elem i+D//2 in the high
nibble. In-kernel unpack is then two VPU ops + a lane concat producing the
D axis in [lo-plane, hi-plane] order per head; no cross-lane interleave is
ever needed (scores/output fold-back absorb the permutation through iota
masks — see ops/flash_decode.py _pq4kernel).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "v", "k_scale", "v_scale"],
         meta_fields=["page_size", "quantized", "heads", "bits", "kd"])
@dataclass
class PagedKVCache:
    k: tuple              # L x (NP*P, H*D) bf16 | int8 (q8) | (NP*P, H*D//2) u8 (q4)
    #                       COLUMN layout (kd > 0): L x (NP*kd, P) — page p
    #                       is a (kd, P) tile, token t is COLUMN t. Used for
    #                       narrow-KD (GQA) models where (P, KD) rows would
    #                       make the DMA minor dim < 512 B (~25% of HBM
    #                       bandwidth lost — measured 558 vs 746 GB/s
    #                       streaming 256 B-minor vs 1 KiB-minor int8).
    v: tuple
    k_scale: tuple        # L x (NP*HS, P) bf16; dummy (1,) when not quantized.
    v_scale: tuple        # TRANSPOSED page tiles: page p owns rows
    #                       [p*HS, (p+1)*HS), token t is COLUMN t, row h is
    #                       kv-head h's scale; HS = Hkv rounded up to 16
    #                       (bf16 sublane tile). A (rows, Hkv) row layout
    #                       lane-pads Hkv -> 128 in every DMA: at Hkv=4
    #                       that 32x bloat DOUBLED the attention kernel's
    #                       HBM traffic (measured 321 vs 582 GB/s in-situ,
    #                       PERF_NOTES round-5 16K dissection).
    page_size: int
    quantized: bool
    heads: int = 0        # n_kv_heads
    bits: int = 8         # 8 (int8 rows) or 4 (plane-split packed nibbles)
    kd: int = 0           # per-token stored K/V width; >0 selects COLUMN layout

    @property
    def n_layers(self) -> int:
        return len(self.k)

    @property
    def col(self) -> bool:
        return self.kd > 0

    @property
    def n_pages(self) -> int:
        if self.col:
            return self.k[0].shape[0] // self.kd
        return self.k[0].shape[0] // self.page_size

    @property
    def scale_rows(self) -> int:
        """Per-page sublane rows of the transposed scale tiles."""
        return _scale_rows(self.heads)

    def with_layer(self, layer: int, k, v, k_scale=None, v_scale=None):
        """Functional single-layer replacement preserving metadata."""
        return PagedKVCache(
            k=_rep(self.k, layer, k), v=_rep(self.v, layer, v),
            k_scale=(self.k_scale if k_scale is None
                     else _rep(self.k_scale, layer, k_scale)),
            v_scale=(self.v_scale if v_scale is None
                     else _rep(self.v_scale, layer, v_scale)),
            page_size=self.page_size, quantized=self.quantized,
            heads=self.heads, bits=self.bits, kd=self.kd)


def _scale_rows(n_kv_heads: int) -> int:
    """Hkv rounded up to the bf16 sublane tile (16 rows): transposed scale
    pages must start on a tile boundary for clean Mosaic block DMA."""
    return -(-n_kv_heads // 16) * 16


def init_paged_cache(n_layers: int, n_pages: int, page_size: int,
                     n_kv_heads: int, head_dim: int,
                     quantized: bool | str = False) -> PagedKVCache:
    """quantized: False = bf16; True/1/8/"q8" = int8 + per-(row, head)
    scales; 4/"q4" = plane-split packed nibbles (Q4_0-equivalent, half the
    q8 HBM). Accepts the same numeric levels as kv/cache.py init_cache.

    Quantized pools whose per-token stored width is narrower than ~1 KiB
    (GQA models) automatically use the COLUMN layout (see PagedKVCache.kd)
    for full-rate DMA in the paged flash-decode kernels."""
    if quantized:
        bits = 4 if quantized in ("q4", 4) else 8
        kd = n_kv_heads * head_dim
        kdq = kd // 2 if bits == 4 else kd
        col = kdq < 1024 and kdq % 8 == 0 and page_size % 128 == 0
        vdt = jnp.uint8 if bits == 4 else jnp.int8
        kv_shape = (n_pages * kdq, page_size) if col else \
            (n_pages * page_size, kdq)
        hs = _scale_rows(n_kv_heads)
        return PagedKVCache(
            k=tuple(jnp.zeros(kv_shape, vdt) for _ in range(n_layers)),
            v=tuple(jnp.zeros(kv_shape, vdt) for _ in range(n_layers)),
            k_scale=tuple(jnp.zeros((n_pages * hs, page_size), jnp.bfloat16)
                          for _ in range(n_layers)),
            v_scale=tuple(jnp.zeros((n_pages * hs, page_size), jnp.bfloat16)
                          for _ in range(n_layers)),
            page_size=page_size, quantized=True, heads=n_kv_heads, bits=bits,
            kd=kdq if col else 0)
    shape = (n_pages * page_size, n_kv_heads * head_dim)
    return PagedKVCache(
        k=tuple(jnp.zeros(shape, jnp.bfloat16) for _ in range(n_layers)),
        v=tuple(jnp.zeros(shape, jnp.bfloat16) for _ in range(n_layers)),
        k_scale=tuple(jnp.zeros((1,), jnp.bfloat16) for _ in range(n_layers)),
        v_scale=tuple(jnp.zeros((1,), jnp.bfloat16) for _ in range(n_layers)),
        page_size=page_size, quantized=False, heads=n_kv_heads)


def _quantize_q8(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., D) -> int8 values + (...,) scale."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / scale, 0.0)
    q = jnp.round(x.astype(jnp.float32) * inv[..., None]).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def _quantize_q4(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., D) -> plane-split packed (..., D//2) uint8 + (...,) scale.

    Values clip to [-8, 7] (+8 biased nibbles, reference Q4_0 semantics);
    byte i packs (elem i) | (elem i+D//2 << 4)."""
    D = x.shape[-1]
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = amax / 7.0
    inv = jnp.where(scale > 0, 1.0 / scale, 0.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv[..., None]),
                 -8, 7).astype(jnp.int32) + 8
    lo = q[..., :D // 2]
    hi = q[..., D // 2:]
    return (lo | (hi << 4)).astype(jnp.uint8), scale.astype(jnp.bfloat16)


def _dequantize_q4(packed: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _quantize_q4: (..., D//2) u8 + (...,) -> (..., D) bf16."""
    p = packed.astype(jnp.int32)
    lo = (p & 0xF) - 8
    hi = (p >> 4) - 8
    q = jnp.concatenate([lo, hi], axis=-1)
    return (q.astype(jnp.float32)
            * scale.astype(jnp.float32)[..., None]).astype(jnp.bfloat16)


def _rep(tup, i, new):
    return tup[:i] + (new,) + tup[i + 1:]


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
    valid = (positions >= 0) & (gpage >= 0)
    rows_total = cache.page_size * cache.n_pages
    rows = jnp.where(valid, gpage * P + offset, rows_total)  # OOB -> dropped
    B, T = k_new.shape[:2]
    if cache.quantized:
        quant = _quantize_q4 if cache.bits == 4 else _quantize_q8
        qk, sk = quant(k_new)
        qv, sv = quant(v_new)
        NP = cache.n_pages
        pg = jnp.where(valid, gpage, NP).reshape(-1)          # OOB -> dropped
        off = offset.reshape(-1)
        if cache.col:
            # column layout: token t of page p is column t of the (kd, P)
            # tile at rows [p*kd, (p+1)*kd)
            kd = cache.kd
            qk2 = qk.reshape(B * T, kd)
            qv2 = qv.reshape(B * T, kd)
            k3 = cache.k[layer].reshape(NP, kd, P)
            v3 = cache.v[layer].reshape(NP, kd, P)
            k = k3.at[pg, :, off].set(qk2, mode="drop").reshape(NP * kd, P)
            v = v3.at[pg, :, off].set(qv2, mode="drop").reshape(NP * kd, P)
        else:
            k = cache.k[layer].at[rows].set(qk.reshape(B, T, -1), mode="drop")
            v = cache.v[layer].at[rows].set(qv.reshape(B, T, -1), mode="drop")
        # transposed scale tiles: token t is column t of page pg's (HS, P)
        # tile (rows [pg*HS, (pg+1)*HS)); heads pad to HS with zeros
        HS = cache.scale_rows
        H = cache.heads
        pad = [(0, 0), (0, HS - H)]
        sk2 = jnp.pad(sk.reshape(B * T, H), pad)
        sv2 = jnp.pad(sv.reshape(B * T, H), pad)
        ks3 = cache.k_scale[layer].reshape(NP, HS, P)
        vs3 = cache.v_scale[layer].reshape(NP, HS, P)
        ks = ks3.at[pg, :, off].set(sk2, mode="drop").reshape(NP * HS, P)
        vs = vs3.at[pg, :, off].set(sv2, mode="drop").reshape(NP * HS, P)
        return cache.with_layer(layer, k, v, ks, vs)
    k = cache.k[layer].at[rows].set(
        k_new.reshape(B, T, -1).astype(jnp.bfloat16), mode="drop")
    v = cache.v[layer].at[rows].set(
        v_new.reshape(B, T, -1).astype(jnp.bfloat16), mode="drop")
    return cache.with_layer(layer, k, v)


def gather(cache: PagedKVCache, layer: int,
           page_table: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Materialize per-slot K/V: (B, MP*P, H, D) bf16 (dequantized if
    quantized).

    The XLA-attention path consumes this directly; the paged flash-decode
    Pallas kernels read pages in place instead."""
    P = cache.page_size
    B, MP = page_table.shape
    tab = jnp.clip(page_table, 0, cache.n_pages - 1)
    rows = (tab[:, :, None] * P
            + jnp.arange(P)[None, None, :]).reshape(B, MP * P)
    H = cache.heads
    if cache.col:
        kd = cache.kd
        k3 = cache.k[layer].reshape(cache.n_pages, kd, P)
        v3 = cache.v[layer].reshape(cache.n_pages, kd, P)
        k = jnp.swapaxes(k3[tab], 2, 3).reshape(B, MP * P, kd)
        v = jnp.swapaxes(v3[tab], 2, 3).reshape(B, MP * P, kd)
        KD = kd
    else:
        k = cache.k[layer][rows]  # (B, MP*P, KD[/2])
        v = cache.v[layer][rows]
        KD = k.shape[-1]
    k = k.reshape(B, MP * P, H, KD // H)
    v = v.reshape(B, MP * P, H, KD // H)
    if cache.quantized:
        # transposed scale tiles -> (B, MP*P, H)
        HS = cache.scale_rows
        ks3 = cache.k_scale[layer].reshape(cache.n_pages, HS, P)
        vs3 = cache.v_scale[layer].reshape(cache.n_pages, HS, P)
        ks = jnp.swapaxes(ks3[tab], 2, 3)[..., :H].reshape(B, MP * P, H)
        vs = jnp.swapaxes(vs3[tab], 2, 3)[..., :H].reshape(B, MP * P, H)
        if cache.bits == 4:
            return _dequantize_q4(k, ks), _dequantize_q4(v, vs)
        k = (k.astype(jnp.float32) * ks.astype(jnp.float32)[..., None]
             ).astype(jnp.bfloat16)
        v = (v.astype(jnp.float32) * vs.astype(jnp.float32)[..., None]
             ).astype(jnp.bfloat16)
    return k, v


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
