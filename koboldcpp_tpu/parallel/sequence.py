"""Sequence-parallel (SP) serving: ring-attention prefill + distributed
flash-decode over a sequence-sharded KV cache.

TPU-native long-context serving (SURVEY.md §5.7, BASELINE configs 3/5):
the KV cache's sequence axis shards over the mesh's `sp` axis so no chip
ever holds more than S/n keys.  Prefill processes the prompt with each
chip computing its T/n token slice through every layer; attention is
ring attention (K/V rotate one ICI hop per step, online softmax).  Decode
replicates the single-token compute, each chip attends over its own KV
rows, and the partial (max, denominator, numerator) triples combine with
a pmax/psum online-softmax merge — the cross-chip counterpart of the
flash-decode kernel's block combine.

The reference has no sequence parallelism at all (its long-context story
is single-device KV surgery, gpttype_adapter.cpp:1504); this is the
mechanism that lets one serving process hold contexts larger than a
chip's HBM comfortably allows.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..kv.cache import KVCache, stack_cache
from ..models.config import ModelConfig
from ..models.llama import _ffn, rms_norm
from ..ops import linear
from ..ops.linear import QTensor
from ..ops.rope import apply_rope, rope_frequencies, yarn_attn_scale

_NEG = -1e30


def shard_cache_sp(cache: KVCache, mesh: Mesh, axis: str = "sp") -> KVCache:
    """Per-layer fused (B, S, KD) cache -> stacked (L, B, S, KD) with S
    sharded over `axis`."""
    k = cache.k if not isinstance(cache.k, (tuple, list)) \
        else jnp.stack(list(cache.k))
    v = cache.v if not isinstance(cache.v, (tuple, list)) \
        else jnp.stack(list(cache.v))
    spec = NamedSharding(mesh, P(None, None, axis, None))
    return KVCache(k=jax.device_put(k, spec), v=jax.device_put(v, spec))


def _qkv(layer, h, cfg, B, T, positions, freqs):
    qdim = cfg.n_heads * cfg.head_dim
    kvdim = cfg.n_kv_heads * cfg.head_dim
    if "wqkv" in layer:
        qkv = linear.matmul(h, layer["wqkv"])
        q, k, v = (qkv[..., :qdim], qkv[..., qdim:qdim + kvdim],
                   qkv[..., qdim + kvdim:])
    else:
        q = linear.matmul(h, layer["wq"])
        k = linear.matmul(h, layer["wk"])
        v = linear.matmul(h, layer["wv"])
    q = q.reshape(B, T, cfg.n_heads, cfg.head_dim)
    k = k.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
    v = v.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
    q = apply_rope(q, positions, freqs, cfg.rope_type, cfg.rope_dim)
    k = apply_rope(k, positions, freqs, cfg.rope_type, cfg.rope_dim)
    return q, k, v


def sp_forward(params: dict, cfg: ModelConfig, tokens: jnp.ndarray,
               positions: jnp.ndarray, cache: KVCache, mesh: Mesh,
               axis: str = "sp", last_only: bool = True, last_index=None):
    """Llama-family forward with the sequence axis sharded over `axis`.

    tokens/positions: (B, T) — T > 1 is the ring-attention PREFILL path
    (T must divide the axis size; positions must be the contiguous range
    [0, T) — a fresh-context full-prompt evaluation); T == 1 is the
    distributed DECODE step (token replicated, KV rows owned per chip).
    cache: stacked (L, B, S, KD) with S sharded (shard_cache_sp).
    Returns (logits (B, 1 or T, V) replicated, cache still S-sharded).
    """
    n = mesh.shape[axis]
    B, T = tokens.shape
    L, _, S, KD = cache.k.shape
    Hkv = cfg.n_kv_heads
    D = cfg.head_dim
    freqs = rope_frequencies(cfg)
    scale = (cfg.attn_scale if cfg.attn_scale > 0
             else cfg.head_dim ** -0.5) * yarn_attn_scale(cfg)

    emb_w = params["tok_embd"]
    emb_w = emb_w.data["w"] if isinstance(emb_w, QTensor) else emb_w
    out_w = params["output"]
    out_norm = params["output_norm"]
    layers = params["layers"]

    decode = T == 1

    def body(tokens, positions, k_all, v_all):
        idx = lax.axis_index(axis)
        S_loc = k_all.shape[2]
        row0 = idx * S_loc
        Tl = tokens.shape[1]
        x = emb_w[tokens]
        if cfg.embedding_scale:
            x = x * jnp.asarray(cfg.embedding_scale, x.dtype)

        new_k, new_v = [], []
        for li, layer in enumerate(layers):
            h = rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
            q, k, v = _qkv(layer, h, cfg, B, Tl, positions, freqs)
            if decode:
                # masked owner write: local row = pos - row0; other chips'
                # updates fall out of bounds and drop
                loc = positions[:, 0] - row0
                b_idx = jnp.arange(B)
                kl = k_all[li].at[b_idx, loc].set(
                    k[:, 0].reshape(B, KD).astype(k_all.dtype), mode="drop")
                vl = v_all[li].at[b_idx, loc].set(
                    v[:, 0].reshape(B, KD).astype(v_all.dtype), mode="drop")
                # distributed flash-decode: local partial softmax + psum
                kk = kl.reshape(B, S_loc, Hkv, D)
                vv = vl.reshape(B, S_loc, Hkv, D)
                rep = cfg.n_heads // Hkv
                kk = jnp.repeat(kk, rep, axis=2)
                vv = jnp.repeat(vv, rep, axis=2)
                slot = row0 + jnp.arange(S_loc)
                mask = slot[None, :] <= positions[:, 0][:, None]  # (B, S_loc)
                s = jnp.einsum("bhd,bshd->bhs",
                               q[:, 0].astype(jnp.float32),
                               kk.astype(jnp.float32)) * scale
                s = jnp.where(mask[:, None, :], s, _NEG)
                m_loc = s.max(axis=-1)                       # (B, H)
                p = jnp.exp(s - m_loc[..., None])
                l_loc = p.sum(axis=-1)
                o_loc = jnp.einsum("bhs,bshd->bhd", p,
                                   vv.astype(jnp.float32))
                m = lax.pmax(m_loc, axis_name=axis)
                corr = jnp.exp(m_loc - m)
                l_tot = lax.psum(corr * l_loc, axis_name=axis)
                o = lax.psum(corr[..., None] * o_loc, axis_name=axis)
                attn = (o / jnp.maximum(l_tot[..., None], 1e-30))
                attn = attn[:, None].astype(x.dtype)         # (B, 1, H, D)
                new_k.append(kl)
                new_v.append(vl)
            else:
                # ring-attention prefill over the T-sharded slices
                from .ring_attention import _block_attn  # noqa: F401

                attn = _ring_attn_local(q, k, v, axis, n, scale)
                # cache rows: redistribute the T-sharded K/V into the
                # S-sharded cache (gather + take own range; prefill is
                # compute-bound, the per-layer gather rides ICI)
                kg = lax.all_gather(k.reshape(B, Tl, KD), axis_name=axis,
                                    axis=1, tiled=True)  # (B, T, KD)
                vg = lax.all_gather(v.reshape(B, Tl, KD), axis_name=axis,
                                    axis=1, tiled=True)
                Tg = kg.shape[1]
                kl = k_all[li]
                vl = v_all[li]
                take = jnp.minimum(jnp.maximum(Tg - row0, 0), S_loc)
                # rows [row0, row0+S_loc) of the global sequence
                src_k = lax.dynamic_slice_in_dim(
                    jnp.pad(kg, ((0, 0), (0, S_loc), (0, 0))),
                    row0, S_loc, axis=1)
                src_v = lax.dynamic_slice_in_dim(
                    jnp.pad(vg, ((0, 0), (0, S_loc), (0, 0))),
                    row0, S_loc, axis=1)
                rows = jnp.arange(S_loc)[None, :, None] < take
                kl = jnp.where(rows, src_k.astype(kl.dtype), kl)
                vl = jnp.where(rows, src_v.astype(vl.dtype), vl)
                new_k.append(kl)
                new_v.append(vl)
            attn = attn.reshape(B, Tl, cfg.n_heads * D)
            x = x + linear.matmul(attn, layer["wo"])
            h = rms_norm(x, layer["ffn_norm"], cfg.rms_norm_eps)
            x = x + _ffn(h, layer, cfg.act)

        if last_only and not decode:
            # gather the last REAL token's activation (end-padded prompts:
            # last_index < T-1) from its owner chip; psum-broadcast
            li = jnp.asarray(T - 1 if last_index is None else last_index,
                             jnp.int32)
            owner = li // Tl
            x_sel = lax.dynamic_slice_in_dim(x, li % Tl, 1, axis=1)
            x = lax.psum(jnp.where(idx == owner, x_sel, 0.0), axis_name=axis)
        x = rms_norm(x, out_norm, cfg.rms_norm_eps)
        logits = linear.matmul(x, out_w, out_dtype=jnp.float32)
        return logits, jnp.stack(new_k), jnp.stack(new_v)

    tok_spec = P(None, axis) if not decode else P()
    cache_spec = P(None, None, axis, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(tok_spec, tok_spec, cache_spec, cache_spec),
        out_specs=(P(), cache_spec, cache_spec), check_rep=False)
    logits, k_c, v_c = fn(tokens, positions, cache.k, cache.v)
    return logits, KVCache(k=k_c, v=v_c)


def _ring_attn_local(q, k, v, axis, n, scale):
    """Ring attention body over already-local (B, Tl, H/Hkv, D) slices
    (the in-shard-map version of parallel.ring_attention.ring_attention)."""
    from .ring_attention import _block_attn

    B, Tl, H, D = q.shape
    Hkv = k.shape[2]
    if Hkv != H:
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    idx = lax.axis_index(axis)
    q_pos = idx * Tl + jnp.arange(Tl)
    o = jnp.zeros((B, H, Tl, D), jnp.float32)
    m = jnp.full((B, H, Tl), _NEG, jnp.float32)
    l = jnp.zeros((B, H, Tl), jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]
    for s_i in range(n):
        kv_idx = (idx - s_i) % n
        k_pos = kv_idx * Tl + jnp.arange(Tl)
        mask = q_pos[:, None] >= k_pos[None, :]
        s = _block_attn(q.astype(jnp.float32), k.astype(jnp.float32),
                        v, mask, scale)
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bhts,bshd->bhtd", p, v.astype(jnp.float32))
        m = m_new
        if s_i != n - 1:
            k = lax.ppermute(k, axis_name=axis, perm=perm)
            v = lax.ppermute(v, axis_name=axis, perm=perm)
    o = o / jnp.maximum(l[..., None], 1e-30)
    return o.transpose(0, 2, 1, 3).astype(q.dtype)
