"""Pipeline parallelism: layer stages over a mesh axis with microbatching.

TPU-native PP (SURVEY.md §2.6): the stacked layer pytree (models/llama.py:
stack_layers) is sharded on its layer axis over mesh axis `pp`; each device
owns L/n consecutive layers. The batch splits into M microbatches that flow
through the stages GPipe-style: at tick t, stage s processes microbatch
t - s (when valid) and hands its activations to stage s+1 via a single-hop
`ppermute` (ICI neighbour traffic only). n + M - 1 ticks drain the pipe;
bubble fraction = (n-1)/(n+M-1), so pick M >= n.

Scope: rms-norm llama-family stacks (same coverage as forward_stacked).
The KV cache covers the FULL batch: each stage holds (L/n, B, S, Hkv, D)
and updates the microbatch slice it processed at each tick, so the returned
cache is valid for every sequence and PP decode (T=1 steps through the same
schedule) works across calls. The reference has no PP at all (its RPC
backend splits whole tensors, not stages).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..kv.cache import KVCache
from ..models.config import ModelConfig
from ..models.llama import _ffn, attention, rms_norm
from ..ops import linear
from ..ops.rope import apply_rope, rope_frequencies, yarn_attn_scale
from ..ops.linear import QTensor


def shard_stacked_for_pp(params: dict, cache: KVCache, mesh: Mesh,
                         axis: str = "pp"):
    """Place the stacked layer pytree and cache with the layer axis sharded
    over `axis`; everything else replicated."""
    lspec = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    out = dict(params)
    out["layers_stacked"] = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, lspec), params["layers_stacked"])
    for k in ("tok_embd", "output", "output_norm", "output_bias"):
        if k in out:
            out[k] = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), out[k])
    from ..kv.cache import stack_cache

    cache = stack_cache(cache)  # PP shards the layer axis: stacked layout
    cache = KVCache(k=jax.device_put(cache.k, lspec),
                    v=jax.device_put(cache.v, lspec))
    return out, cache


def pipeline_forward(params: dict, cfg: ModelConfig, tokens: jnp.ndarray,
                     positions: jnp.ndarray, cache: KVCache, mesh: Mesh,
                     axis: str = "pp", microbatches: int = None):
    """Stacked-layer forward with layers stage-sharded over `axis`.

    tokens: (B, T) with B divisible by `microbatches` (default: axis size).
    Returns (logits replicated, cache sharded on its layer axis).
    """
    n = mesh.shape[axis]
    M = microbatches or n
    B, T = tokens.shape
    assert B % M == 0, f"batch {B} must divide into {M} microbatches"
    Bm = B // M
    S = cache.max_seq
    freqs = rope_frequencies(cfg)
    scale = (cfg.attn_scale if cfg.attn_scale > 0
             else cfg.head_dim ** -0.5) * yarn_attn_scale(cfg)
    qdim = cfg.n_heads * cfg.head_dim
    kvdim = cfg.n_kv_heads * cfg.head_dim

    def stage_scan(x, stacked, k_c, v_c, pos, mask):
        """Run this stage's local layers (scan) on one microbatch."""
        def body(x, xs):
            layer, k_cache, v_cache = xs
            h = rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
            if "wqkv" in layer:
                qkv = linear.matmul(h, layer["wqkv"])
                q, k, v = (qkv[..., :qdim], qkv[..., qdim:qdim + kvdim],
                           qkv[..., qdim + kvdim:])
            else:
                q = linear.matmul(h, layer["wq"])
                k = linear.matmul(h, layer["wk"])
                v = linear.matmul(h, layer["wv"])
            q = q.reshape(Bm, T, cfg.n_heads, cfg.head_dim)
            k = k.reshape(Bm, T, cfg.n_kv_heads, cfg.head_dim)
            v = v.reshape(Bm, T, cfg.n_kv_heads, cfg.head_dim)
            q = apply_rope(q, pos, freqs, cfg.rope_type, cfg.rope_dim)
            k = apply_rope(k, pos, freqs, cfg.rope_type, cfg.rope_dim)
            b_idx = jnp.arange(Bm)[:, None]
            k_cache = k_cache.at[b_idx, pos].set(k.astype(k_cache.dtype),
                                                 mode="drop")
            v_cache = v_cache.at[b_idx, pos].set(v.astype(v_cache.dtype),
                                                 mode="drop")
            attn_out = attention(q, k_cache, v_cache, mask, scale,
                                 cfg.attn_logit_softcap)
            attn_out = attn_out.reshape(Bm, T, cfg.n_heads * cfg.head_dim)
            x = x + linear.matmul(attn_out, layer["wo"])
            h = rms_norm(x, layer["ffn_norm"], cfg.rms_norm_eps)
            x = x + _ffn(h, layer, cfg.act)
            return x, (k_cache, v_cache)

        x, (k_c, v_c) = lax.scan(body, x, (stacked, k_c, v_c))
        return x, k_c, v_c

    def body(tokens, positions, stacked, k0, v0, emb_w, out_w, out_norm):
        stage = lax.axis_index(axis)
        # microbatch views
        tok_mb = tokens.reshape(M, Bm, T)
        pos_mb = positions.reshape(M, Bm, T)
        emb_all = emb_w[tok_mb]  # (M, Bm, T, H); only stage 0's is consumed
        if cfg.embedding_scale:
            emb_all = emb_all * jnp.asarray(cfg.embedding_scale, emb_all.dtype)
        slot_ids = jnp.arange(S)
        mask_all = slot_ids[None, None, None, :] <= pos_mb[..., None]

        H = emb_all.shape[-1]
        send = jnp.zeros((Bm, T, H), emb_all.dtype)
        out = jnp.zeros((M, Bm, T, H), emb_all.dtype)
        # full-batch cache viewed per microbatch: (L/n, M, Bm, S, Hkv, D)
        Lloc = k0.shape[0]
        k_r = k0.reshape(Lloc, M, Bm, *k0.shape[2:])
        v_r = v0.reshape(Lloc, M, Bm, *v0.shape[2:])
        perm = [(i, i + 1) for i in range(n - 1)]  # stage s -> s+1, no wrap
        for t in range(n + M - 1):
            recv = lax.ppermute(send, axis_name=axis, perm=perm)
            cand = emb_all[t] if t < M else jnp.zeros_like(send)
            h_in = jnp.where(stage == 0, cand, recv)
            mb = jnp.clip(t - stage, 0, M - 1)  # this stage's microbatch id
            valid = (stage <= t) & ((t - stage) < M)
            pos = lax.dynamic_index_in_dim(pos_mb, mb, 0, keepdims=False)
            mask = lax.dynamic_index_in_dim(mask_all, mb, 0, keepdims=False)
            k_mb = lax.dynamic_index_in_dim(k_r, mb, 1, keepdims=False)
            v_mb = lax.dynamic_index_in_dim(v_r, mb, 1, keepdims=False)
            h_out, k_new, v_new = stage_scan(h_in, stacked, k_mb, v_mb,
                                             pos, mask)
            k_r = lax.dynamic_update_index_in_dim(
                k_r, jnp.where(valid, k_new, k_mb), mb, 1)
            v_r = lax.dynamic_update_index_in_dim(
                v_r, jnp.where(valid, v_new, v_mb), mb, 1)
            if 0 <= t - (n - 1) < M:  # static: the drain tick for this mb
                out = out.at[t - (n - 1)].set(
                    jnp.where(stage == n - 1, h_out, 0))
            send = h_out
        k_c = k_r.reshape(k0.shape)
        v_c = v_r.reshape(v0.shape)
        out = lax.psum(out, axis_name=axis)  # only the last stage is nonzero
        x = out.reshape(B, T, H)
        x = rms_norm(x, out_norm, cfg.rms_norm_eps)
        logits = jnp.einsum("bth,vh->btv", x.astype(jnp.float32),
                            out_w.astype(jnp.float32))
        return logits, k_c, v_c

    emb_w = params["tok_embd"]
    emb_w = emb_w.data["w"] if isinstance(emb_w, QTensor) else emb_w
    out_w = params["output"]
    out_w = out_w.data["w"] if isinstance(out_w, QTensor) else out_w

    lspec = P(axis)
    rep = P()
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(rep, rep, jax.tree_util.tree_map(lambda _: lspec,
                                                   params["layers_stacked"]),
                  lspec, lspec, rep, rep, rep),
        out_specs=(rep, lspec, lspec), check_rep=False)
    logits, k_c, v_c = fn(tokens, positions, params["layers_stacked"],
                          cache.k, cache.v, emb_w, out_w,
                          params["output_norm"])
    return logits, KVCache(k=k_c, v=v_c)
