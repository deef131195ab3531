"""Llama-family forward pass in JAX (covers llama/mistral/qwen2/gemma-style
decoder-only transformers, incl. GQA, optional QKV bias, logit softcap, MoE).

Op sequence mirrors the reference graph builder `build_llama`
(/root/reference/src/llama.cpp:10453-10617, SURVEY.md Appendix B), re-expressed
as functional JAX on bf16 with f32 accumulation. Attention is XLA-native here;
the Pallas flash-decode kernel plugs in via ops.attention.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..kv.cache import KVCache, read as kv_read, write as kv_write
from ..ops import linear
from ..ops.linear import QTensor
from ..ops.norms import layer_norm, rms_norm
from ..ops.rope import apply_rope, rope_frequencies, yarn_attn_scale
from .config import ModelConfig

Params = dict[str, Any]


def _norm(x: jnp.ndarray, store: Params, key: str, cfg: ModelConfig) -> jnp.ndarray:
    if cfg.norm_type == "layer":
        return layer_norm(x, store[key], store.get(key + "_bias"), cfg.rms_norm_eps)
    return rms_norm(x, store[key], cfg.rms_norm_eps)


def _flash_decode_ok(cfg: ModelConfig) -> bool:
    # Default ON since the fused-KD cache layout + in-kernel aliased writes
    # (no XLA copies): decode 752 -> 800 t/s, batched-8 2457 -> 2732 on v5e.
    # The kernel's DMA clamps at each sequence's position, so attention
    # bandwidth scales with live context, not max_seq.
    if os.environ.get("KCPP_FLASH_DECODE", "1") != "1":
        return False
    from ..ops import flash_decode

    return flash_decode.supported_batched(1, cfg.n_kv_heads, cfg.head_dim)


def _softcap(x: jnp.ndarray, cap: float) -> jnp.ndarray:
    if cap and cap > 0:
        return cap * jnp.tanh(x / cap)
    return x


def flash_prefill_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            positions: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Causal self-attention over the current chunk via the TPU Pallas flash
    kernel (counterpart of the reference's --flashattention fattn path,
    /root/reference/ggml/src/ggml-cuda/fattn.cu). Valid when the chunk is the
    whole context so far (prefill from position 0). q: (B, T, H, D);
    k/v: (B, T, Hkv, D); padding rows have position < 0."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    B, T, H, D = q.shape
    Hkv = k.shape[2]
    G = H // Hkv
    # repeat kv heads for GQA (flash kernel wants matching head counts)
    if G > 1:
        k = jnp.repeat(k, G, axis=2)
        v = jnp.repeat(v, G, axis=2)
    qh = q.transpose(0, 2, 1, 3)  # (B, H, T, D)
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)
    seg = jnp.where(positions >= 0, 0, 1).astype(jnp.int32)  # pad rows isolated
    out = flash_attention(qh, kh, vh,
                          segment_ids=SegmentIds(q=seg, kv=seg),
                          causal=True, sm_scale=scale)
    return out.transpose(0, 2, 1, 3)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              mask: jnp.ndarray, scale: float, softcap: float = 0.0,
              bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """q: (B, T, H, D); k/v: (B, S, Hkv, D); mask: (B, T, S) bool.
    GQA via head-group reshape. bias: optional additive (B, H, T, S) scores
    bias (ALiBi). Returns (B, T, H, D)."""
    B, T, H, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = H // Hkv
    qg = q.reshape(B, T, Hkv, G, D)
    scores = jnp.einsum("bthgd,bshd->bhgts", qg, k,
                        preferred_element_type=jnp.float32) * scale
    scores = _softcap(scores, softcap)
    if bias is not None:
        scores = scores + bias.reshape(B, Hkv, G, T, S)
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask[:, None, None, :, :], scores, neg)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgts,bshd->bthgd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, T, H, D).astype(q.dtype)


def alibi_slopes(n_heads: int, bias_max: float = 8.0) -> jnp.ndarray:
    """Per-head ALiBi slopes, HF MPT build_mpt_alibi_tensor semantics (matches
    llama.cpp soft_max_ext max_bias form for power-of-2 head counts)."""
    import math

    n2 = 2 ** math.ceil(math.log2(n_heads))
    base = jnp.arange(1, n2 + 1, dtype=jnp.float32) * (bias_max / n2)
    slopes = 1.0 / jnp.exp2(base)
    if n2 != n_heads:
        slopes = jnp.concatenate([slopes[1::2], slopes[::2]])[:n_heads]
    return slopes


def _scaled(y: jnp.ndarray, layer: Params, key: str) -> jnp.ndarray:
    """bitnet per-projection scalar weight scale (wq_scale & co,
    build_bitnet, /root/reference/src/llama.cpp:15048-15145)."""
    s = layer.get(key)
    return y if s is None else y * s.astype(y.dtype)


def _ffn(x: jnp.ndarray, layer: Params, act_name: str = "silu",
         gated: bool = True, eps: float = 1e-5) -> jnp.ndarray:
    actf = {"silu": jax.nn.silu,
            "gelu_exact": partial(jax.nn.gelu, approximate=False),
            "relu2": lambda v: jnp.square(jax.nn.relu(v))}.get(
        act_name, partial(jax.nn.gelu, approximate=True))
    if not gated:  # gpt2/neox-style up -> act -> down (with biases)
        up = linear.matmul(x, layer["w_up"])
        if "b_up" in layer:
            up = up + layer["b_up"].astype(up.dtype)
        act = actf(up.astype(jnp.float32)).astype(x.dtype)
        down = linear.matmul(act, layer["w_down"])
        if "b_down" in layer:
            down = down + layer["b_down"].astype(down.dtype)
        return down
    if "w_gateup" in layer:  # fused gate+up (one kernel launch)
        if (act_name == "silu" and "b_gate" not in layer and "b_up" not in layer
                and "b_down" not in layer and "ffn_sub_norm" not in layer
                and "ffn_down_scale" not in layer):
            # T=1 decode: whole FFN as ONE pallas call (ops/ffn_fused.py)
            from ..ops.ffn_fused import ffn_fused

            y = ffn_fused(x, layer["w_gateup"], layer["w_down"])
            if y is not None:
                return y
        gu = linear.matmul(x, layer["w_gateup"])
        F = gu.shape[-1] // 2
        gate, up = gu[..., :F], gu[..., F:]
    else:
        gate = _scaled(linear.matmul(x, layer["w_gate"]), layer, "ffn_gate_scale")
        up = _scaled(linear.matmul(x, layer["w_up"]), layer, "ffn_up_scale")
    if "b_gate" in layer:  # jais gated FFN carries biases on all three mats
        gate = gate + layer["b_gate"].astype(gate.dtype)
    if "b_up" in layer:
        up = up + layer["b_up"].astype(up.dtype)
    act = actf(gate.astype(jnp.float32)).astype(x.dtype) * up
    if "ffn_sub_norm" in layer:  # bitnet: rms between activation and down-proj
        act = rms_norm(act, layer["ffn_sub_norm"], eps)
    down = _scaled(linear.matmul(act, layer["w_down"]), layer, "ffn_down_scale")
    if "b_down" in layer:
        down = down + layer["b_down"].astype(down.dtype)
    return down


def _moe_ffn(x: jnp.ndarray, layer: Params, cfg: ModelConfig) -> jnp.ndarray:
    """Mixtral-style sparse MoE.

    Counterpart of llm_build_moe_ffn + the CUDA mul_mat_id path
    (/root/reference/ggml/src/ggml-cuda.cu:2063). Two formulations:
    - gather (default): per-token top-k expert gather — minimal FLOPs/HBM on
      one device.
    - dense-EP (cfg.moe_dense_ep): every expert computed for every token with
      router weights zeroed for unselected pairs; the expert axis shards over
      the tp mesh axis (parallel/sharding.py) and XLA psums the combine —
      expert parallelism without ragged all-to-all.
    """
    B, T, C = x.shape
    moe_act = {"gelu": partial(jax.nn.gelu, approximate=True)}.get(
        (cfg.extras or {}).get("moe_act", "silu"), jax.nn.silu)  # grok: GELU
    xt = x.reshape(-1, C)
    router = linear.matmul(xt, layer["ffn_gate_inp"]).astype(jnp.float32)  # (N, E)
    weights = jax.nn.softmax(router, axis=-1)
    topw, topi = jax.lax.top_k(weights, cfg.n_experts_used)  # (N, k)
    if cfg.moe_norm_topk:  # mixtral renormalizes; qwen2moe does not
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)

    wg = layer["ffn_gate_exps"].data["w"]  # (E, F, C)
    wu = layer["ffn_up_exps"].data["w"]
    wd = layer["ffn_down_exps"].data["w"]

    if cfg.moe_sorted_ep:
        # routed expert parallelism: static-capacity sorted dispatch with
        # the expert axis over the mesh's ep axis (ops/moe.py; the CUDA
        # mul_mat_id row-mapping counterpart)
        from ..ops.moe import moe_ffn_ep

        out = moe_ffn_ep(xt, topi, topw.astype(jnp.float32), wg, wu, wd,
                         moe_act, capacity_factor=cfg.moe_capacity_factor)
    elif cfg.moe_dense_ep:
        E = wg.shape[0]
        # scatter top-k weights back to a dense (N, E) combine matrix
        dense_w = jnp.zeros((xt.shape[0], E), jnp.float32)
        dense_w = dense_w.at[jnp.arange(xt.shape[0])[:, None], topi].set(topw)
        g = jnp.einsum("nc,efc->nef", xt, wg, preferred_element_type=jnp.float32)
        u = jnp.einsum("nc,efc->nef", xt, wu, preferred_element_type=jnp.float32)
        a = (moe_act(g) * u).astype(xt.dtype)
        d = jnp.einsum("nef,ecf->nec", a, wd, preferred_element_type=jnp.float32)
        out = jnp.einsum("nec,ne->nc", d, dense_w)
    else:
        g = jnp.einsum("nc,nkfc->nkf", xt, wg[topi],
                       preferred_element_type=jnp.float32)
        u = jnp.einsum("nc,nkfc->nkf", xt, wu[topi],
                       preferred_element_type=jnp.float32)
        a = moe_act(g) * u
        d = jnp.einsum("nkf,nkcf->nkc", a.astype(xt.dtype), wd[topi],
                       preferred_element_type=jnp.float32)
        out = jnp.einsum("nkc,nk->nc", d, topw)
    if "ffn_up_shexp" in layer:  # qwen2moe shared expert, sigmoid-gated
        sg = jax.nn.silu(linear.matmul(xt, layer["ffn_gate_shexp"])
                         .astype(jnp.float32))
        su = linear.matmul(xt, layer["ffn_up_shexp"]).astype(jnp.float32)
        sd = linear.matmul((sg * su).astype(xt.dtype), layer["ffn_down_shexp"])
        gate = jax.nn.sigmoid(
            linear.matmul(xt, layer["ffn_gate_inp_shexp"]).astype(jnp.float32))
        out = out + sd.astype(jnp.float32) * gate
    return out.reshape(B, T, C).astype(x.dtype)


def forward(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
            positions: jnp.ndarray, cache: KVCache,
            last_only: bool = False,
            flash_prefill: bool = False,
            last_index: jnp.ndarray | None = None,
            input_embeds: jnp.ndarray | None = None,
            embed_mask: jnp.ndarray | None = None) -> tuple[jnp.ndarray, KVCache]:
    """tokens, positions: (B, T) int32. Returns (logits f32, updated cache).

    Causal mask derives from the slot==position cache invariant:
    slot s visible to query at position p iff s <= p.
    """
    B, T = tokens.shape
    S = cache.max_seq
    freqs = rope_frequencies(cfg)
    mscale = yarn_attn_scale(cfg)

    emb_w = params["tok_embd"]
    x = emb_w.data["w"][tokens] if isinstance(emb_w, QTensor) else emb_w[tokens]
    if cfg.embedding_scale:
        x = x * jnp.asarray(cfg.embedding_scale, dtype=x.dtype)
    if cfg.learned_pos and "pos_embd" in params:
        x = x + params["pos_embd"][jnp.clip(positions, 0)].astype(x.dtype)
    if "tok_norm" in params:  # bloom word-embedding layernorm
        x = layer_norm(x, params["tok_norm"], params.get("tok_norm_bias"),
                       cfg.rms_norm_eps)
    if input_embeds is not None:
        # multimodal splice: rows with embed_mask take pre-computed embeddings
        # (LLaVA image patches; reference splices via sentinel tokens,
        # gpttype_adapter.cpp:3406-3475)
        x = jnp.where(embed_mask[:, :, None], input_embeds.astype(x.dtype), x)

    slot_ids = jnp.arange(S)
    mask = slot_ids[None, None, :] <= positions[:, :, None]  # (B, T, S)
    local_mask = mask
    if cfg.sliding_window:
        local_mask = mask & (slot_ids[None, None, :]
                             > positions[:, :, None] - cfg.sliding_window)

    qdim = cfg.n_heads * cfg.head_dim
    kvdim = cfg.n_kv_heads * cfg.head_dim
    base_scale = cfg.attn_scale if cfg.attn_scale > 0 else cfg.head_dim ** -0.5
    scale = base_scale * mscale
    alibi = None
    if cfg.use_alibi:  # slope * (k_pos - q_pos): row-affine, so equals the
        # HF last-row formulation up to a softmax-invariant per-row constant
        dist = (slot_ids[None, None, :] - positions[:, :, None]).astype(jnp.float32)
        alibi = (alibi_slopes(cfg.n_heads, cfg.alibi_bias_max)[None, :, None, None]
                 * dist[:, None, :, :])  # (B, H, T, S)
    swin_norm = bool(cfg.extras.get("swin_norm")) if cfg.extras else False
    ex = cfg.extras or {}
    head_counts = ex.get("head_counts")  # openelm per-layer head counts
    kv_head_counts = ex.get("kv_head_counts")
    for li, layer in enumerate(params["layers"]):
        x0 = x  # layer input (arctic MoE branch reads it, build_arctic :14750)
        nh = head_counts[li] if head_counts else cfg.n_heads
        nkv = kv_head_counts[li] if kv_head_counts else cfg.n_kv_heads
        h = x if swin_norm else _norm(x, layer, "attn_norm", cfg)
        if "wqkv" in layer and head_counts:
            # openelm head-major fused projection: rows ordered
            # [q heads | k heads | v heads] of head_dim each (build_openelm,
            # src/llama.cpp:14425-14437)
            qkv = linear.matmul(h, layer["wqkv"])
            qkv = qkv.reshape(B, T, nh + 2 * nkv, cfg.head_dim)
            q = qkv[:, :, :nh]
            k = qkv[:, :, nh:nh + nkv]
            v = qkv[:, :, nh + nkv:]
        elif "wqkv" in layer:  # fused projection (one kernel launch)
            qkv = linear.matmul(h, layer["wqkv"])
            if "bqkv" in layer:
                qkv = qkv + layer["bqkv"].astype(qkv.dtype)
            q = qkv[..., :qdim]
            k = qkv[..., qdim:qdim + kvdim]
            v = qkv[..., qdim + kvdim:]
        else:
            q = _scaled(linear.matmul(h, layer["wq"]), layer, "wq_scale")
            k = _scaled(linear.matmul(h, layer["wk"]), layer, "wk_scale")
            v = _scaled(linear.matmul(h, layer["wv"]), layer, "wv_scale")
        if "bq" in layer:
            q = q + layer["bq"].astype(q.dtype)
            k = k + layer["bk"].astype(k.dtype)
            v = v + layer["bv"].astype(v.dtype)
        if cfg.clamp_kqv > 0:  # mpt clip_qkv
            c = cfg.clamp_kqv
            q, k, v = (jnp.clip(t, -c, c) for t in (q, k, v))
        per_head_qk = bool(ex.get("qk_norm_per_head"))
        qk_head_rms = bool(ex.get("qk_head_rms"))  # openelm (D,)-affine RMS
        if "attn_q_norm" in layer and not (per_head_qk or qk_head_rms):
            # olmoe flat-projection QK RMSNorm
            q = rms_norm(q, layer["attn_q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, layer["attn_k_norm"], cfg.rms_norm_eps)
        q = q.reshape(B, T, nh, cfg.head_dim)
        k = k.reshape(B, T, nkv, cfg.head_dim)
        v = v.reshape(B, T, nkv, cfg.head_dim)
        if "attn_q_norm" in layer and qk_head_rms:
            # openelm per-head RMSNorm with a shared (head_dim,) weight
            q = rms_norm(q, layer["attn_q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, layer["attn_k_norm"], cfg.rms_norm_eps)
        if "attn_q_norm" in layer and per_head_qk:
            # chameleon per-head LayerNorm with (H, D) affine
            # (build_chameleon, src/llama.cpp:14463-14486)
            q = layer_norm(q, layer["attn_q_norm"],
                           layer.get("attn_q_norm_bias"), cfg.rms_norm_eps)
            k = layer_norm(k, layer["attn_k_norm"],
                           layer.get("attn_k_norm_bias"), cfg.rms_norm_eps)
        if cfg.use_rope:
            q = apply_rope(q, positions, freqs, cfg.rope_type, cfg.rope_dim)
            k = apply_rope(k, positions, freqs, cfg.rope_type, cfg.rope_dim)

        # gemma2 alternates local (even) / global (odd) attention layers
        is_local = bool(cfg.sliding_window) and (
            cfg.sliding_window_pattern == 0 or li % cfg.sliding_window_pattern == 0)
        layer_mask = local_mask if is_local else mask

        from ..kv.cache import QuantKVCache

        use_flash_dec = (T == 1 and not is_local and alibi is None
                         and nkv == cfg.n_kv_heads
                         and isinstance(cache, (KVCache, QuantKVCache))
                         and getattr(cache, "heads", None)  # fused-KD leaves
                         and getattr(cache, "bits", 8) == 8  # q4 KV: XLA path
                         and _flash_decode_ok(cfg))
        if nkv < cfg.n_kv_heads:  # openelm: pad up to the cache's head count
            pad = jnp.zeros((B, T, cfg.n_kv_heads - nkv, cfg.head_dim), k.dtype)
            cache = kv_write(cache, li, positions,
                             jnp.concatenate([k, pad], axis=2),
                             jnp.concatenate([v, pad.astype(v.dtype)], axis=2))
        elif not use_flash_dec:
            cache = kv_write(cache, li, positions, k, v)
        layer_alibi = None
        if alibi is not None:
            layer_alibi = alibi if nh == cfg.n_heads else \
                (alibi_slopes(nh, cfg.alibi_bias_max)[None, :, None, None]
                 * (slot_ids[None, None, :] - positions[:, :, None]
                    ).astype(jnp.float32)[:, None, :, :])
        if (flash_prefill and not cfg.attn_logit_softcap and not is_local
                and alibi is None):
            # prefill-from-zero: chunk == entire context, no cache read needed
            attn_out = flash_prefill_attention(q, k, v, positions, scale)
        elif use_flash_dec:
            # single-token decode: fused position-bounded attention kernel
            # over the per-layer cache buffers (ops/flash_decode.py, the
            # fattn-vec equivalent); DMA clamps at each sequence's position.
            # The kernel also WRITES this step's K/V into the cache through
            # aliased outputs (one block written back per sequence) — an XLA
            # scatter after a custom-call read of the same buffer cannot
            # alias and copies the whole cache every layer.
            from ..kv.cache import _replace
            from ..ops import flash_decode

            if isinstance(cache, QuantKVCache):
                (out, k_upd, v_upd, ks_upd,
                 vs_upd) = flash_decode.decode_attention_batched_q8(
                    q[:, 0], k[:, 0].astype(jnp.bfloat16),
                    v[:, 0].astype(jnp.bfloat16),
                    cache.k[li], cache.v[li],
                    cache.k_scale[li], cache.v_scale[li], positions[:, 0],
                    nh, nkv, scale, cfg.attn_logit_softcap,
                    interpret=jax.default_backend() == "cpu")
                cache = QuantKVCache(
                    k=_replace(tuple(cache.k), li, k_upd),
                    v=_replace(tuple(cache.v), li, v_upd),
                    k_scale=_replace(tuple(cache.k_scale), li, ks_upd),
                    v_scale=_replace(tuple(cache.v_scale), li, vs_upd),
                    heads=cache.heads)
            else:
                out, k_upd, v_upd = flash_decode.decode_attention_batched(
                    q[:, 0], k[:, 0].astype(cache.k[li].dtype),
                    v[:, 0].astype(cache.v[li].dtype),
                    cache.k[li], cache.v[li], positions[:, 0],
                    nh, nkv, scale, cfg.attn_logit_softcap,
                    interpret=jax.default_backend() == "cpu")
                cache = KVCache(k=_replace(tuple(cache.k), li, k_upd),
                                v=_replace(tuple(cache.v), li, v_upd),
                                heads=cache.heads)
            attn_out = out[:, None].astype(x.dtype)
        else:
            ck, cv = kv_read(cache, li)
            if nkv < cfg.n_kv_heads:
                ck, cv = ck[:, :, :nkv], cv[:, :, :nkv]
            attn_out = attention(q, ck, cv, layer_mask, scale,
                                 cfg.attn_logit_softcap, bias=layer_alibi)
        attn_out = attn_out.reshape(B, T, nh * cfg.head_dim)
        if "attn_sub_norm" in layer:  # bitnet: rms between attention and wo
            attn_out = rms_norm(attn_out, layer["attn_sub_norm"], cfg.rms_norm_eps)
        attn_out = _scaled(linear.matmul(attn_out, layer["wo"]), layer, "wo_scale")
        if "bo" in layer:
            attn_out = attn_out + layer["bo"].astype(attn_out.dtype)
        if "attn_post_norm" in layer:  # gemma2 sandwich norm (grok attn_out_norm)
            attn_out = rms_norm(attn_out, layer["attn_post_norm"], cfg.rms_norm_eps)
        if swin_norm:  # chameleon-30b: norm after the branch, not before
            attn_out = _norm(attn_out, layer, "attn_norm", cfg)

        res_s = cfg.residual_scale or 1.0  # granite scales branch adds
        if ex.get("plamo_parallel"):
            # plamo: FFN reads the SAME attn_norm output; layer out =
            # x + attn_out + ffn_out (build_plamo, src/llama.cpp:12713-12737)
            ffn_in = h
            x = x + res_s * attn_out
        elif cfg.parallel_residual:  # neox/gptj: both branches read the same x
            ffn_in = _norm(x, layer, "ffn_norm", cfg)
            x = x + res_s * attn_out
        else:
            x = x + res_s * attn_out
            ffn_in = x if swin_norm else _norm(x, layer, "ffn_norm", cfg)
        if "ffn_gate_inp" in layer and "ffn_norm_exps" not in layer:
            ffn_out = _moe_ffn(ffn_in, layer, cfg)
        else:
            ffn_out = _ffn(ffn_in, layer, cfg.act, cfg.ffn_gated,
                           eps=cfg.rms_norm_eps)
        if "ffn_post_norm" in layer:
            ffn_out = rms_norm(ffn_out, layer["ffn_post_norm"], cfg.rms_norm_eps)
        if swin_norm:
            ffn_out = _norm(ffn_out, layer, "ffn_norm", cfg)
        x = x + res_s * ffn_out
        if "ffn_norm_exps" in layer:
            # arctic: residual MoE branch on the LAYER INPUT, added after the
            # dense FFN residual (build_arctic, src/llama.cpp:14746-14766)
            moe_in = rms_norm(x0, layer["ffn_norm_exps"], cfg.rms_norm_eps)
            x = x + _moe_ffn(moe_in, layer, cfg)

    if last_index is not None:
        x = x[jnp.arange(B), last_index][:, None, :]
    elif last_only:
        x = x[:, -1:, :]
    x = _norm(x, params, "output_norm", cfg)
    logits = linear.matmul(x, params["output"], out_dtype=jnp.float32)
    if "output_bias" in params:  # phi2 lm_head bias
        logits = logits + params["output_bias"]
    if cfg.logit_scale:  # command-r
        logits = logits * cfg.logit_scale
    logits = _softcap(logits, cfg.final_logit_softcap)
    return logits, cache


def forward_paged(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
                  positions: jnp.ndarray, pcache, page_table: jnp.ndarray,
                  last_only: bool = False):
    """forward() over a paged KV pool (kv/paged.py): writes route through the
    per-slot page table; attention reads the gathered pages. Virtual slot
    index == absolute position, so the same causal mask applies.

    tokens/positions: (B, T); page_table: (B, MP) int32 global page ids.
    """
    from ..kv import paged

    B, T = tokens.shape
    S = page_table.shape[1] * pcache.page_size
    freqs = rope_frequencies(cfg)
    mscale = yarn_attn_scale(cfg)

    emb_w = params["tok_embd"]
    x = emb_w.data["w"][tokens] if isinstance(emb_w, QTensor) else emb_w[tokens]
    if cfg.embedding_scale:
        x = x * jnp.asarray(cfg.embedding_scale, dtype=x.dtype)

    slot_ids = jnp.arange(S)
    mask = slot_ids[None, None, :] <= positions[:, :, None]
    qdim = cfg.n_heads * cfg.head_dim
    kvdim = cfg.n_kv_heads * cfg.head_dim
    base_scale = cfg.attn_scale if cfg.attn_scale > 0 else cfg.head_dim ** -0.5
    scale = base_scale * mscale
    alibi = None
    if cfg.use_alibi:  # slope * (k_pos - q_pos): row-affine, so equals the
        # HF last-row formulation up to a softmax-invariant per-row constant
        dist = (slot_ids[None, None, :] - positions[:, :, None]).astype(jnp.float32)
        alibi = (alibi_slopes(cfg.n_heads, cfg.alibi_bias_max)[None, :, None, None]
                 * dist[:, None, :, :])  # (B, H, T, S)
    for li, layer in enumerate(params["layers"]):
        h = _norm(x, layer, "attn_norm", cfg)
        if "wqkv" in layer:
            qkv = linear.matmul(h, layer["wqkv"])
            q = qkv[..., :qdim]
            k = qkv[..., qdim:qdim + kvdim]
            v = qkv[..., qdim + kvdim:]
        else:
            q = linear.matmul(h, layer["wq"])
            k = linear.matmul(h, layer["wk"])
            v = linear.matmul(h, layer["wv"])
        if "bq" in layer:
            q = q + layer["bq"].astype(q.dtype)
            k = k + layer["bk"].astype(k.dtype)
            v = v + layer["bv"].astype(v.dtype)
        q = q.reshape(B, T, cfg.n_heads, cfg.head_dim)
        k = k.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
        v = v.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
        if cfg.use_rope:
            q = apply_rope(q, positions, freqs, cfg.rope_type, cfg.rope_dim)
            k = apply_rope(k, positions, freqs, cfg.rope_type, cfg.rope_dim)
        use_flash_dec = (T == 1 and alibi is None and _flash_decode_ok(cfg))
        if use_flash_dec and pcache.quantized:
            # paged Q8/Q4 flash-decode: page-table DMA maps + in-kernel
            # dequant/quantized write (ops/flash_decode.py _pq8kernel /
            # _pq4kernel) — replaces an XLA gather+dequant of the WHOLE
            # context per layer
            from ..ops import flash_decode

            if getattr(pcache, "kd", 0) > 0:  # column (transposed-page) pools
                kern = (flash_decode.decode_attention_paged_q4c
                        if getattr(pcache, "bits", 8) == 4
                        else flash_decode.decode_attention_paged_q8c)
            elif getattr(pcache, "bits", 8) == 4:
                kern = flash_decode.decode_attention_paged_q4
            else:
                kern = flash_decode.decode_attention_paged_q8
            out, k_upd, v_upd, ks_upd, vs_upd = kern(
                q[:, 0], k[:, 0].astype(jnp.bfloat16),
                v[:, 0].astype(jnp.bfloat16),
                pcache.k[li], pcache.v[li],
                pcache.k_scale[li], pcache.v_scale[li],
                page_table, positions[:, 0],
                cfg.n_heads, cfg.n_kv_heads, pcache.page_size, scale,
                cfg.attn_logit_softcap,
                interpret=jax.default_backend() == "cpu")
            pcache = pcache.with_layer(li, k_upd, v_upd, ks_upd, vs_upd)
            attn_out = out[:, None].astype(x.dtype)
        elif use_flash_dec:
            # paged flash-decode: pages addressed through the table, cache
            # write in-kernel via aliased outputs (ops/flash_decode.py)
            from ..ops import flash_decode

            out, k_upd, v_upd = flash_decode.decode_attention_paged(
                q[:, 0], k[:, 0].astype(jnp.bfloat16),
                v[:, 0].astype(jnp.bfloat16),
                pcache.k[li], pcache.v[li], page_table, positions[:, 0],
                cfg.n_heads, cfg.n_kv_heads, pcache.page_size, scale,
                cfg.attn_logit_softcap,
                interpret=jax.default_backend() == "cpu")
            pcache = pcache.with_layer(li, k_upd, v_upd)
            attn_out = out[:, None].astype(x.dtype)
        else:
            pcache = paged.write(pcache, li, page_table, positions, k, v)
            ck, cv = paged.gather(pcache, li, page_table)
            attn_out = attention(q, ck.astype(x.dtype), cv.astype(x.dtype),
                                 mask, scale, cfg.attn_logit_softcap)
        attn_out = attn_out.reshape(B, T, qdim)
        x = x + linear.matmul(attn_out, layer["wo"])
        h = _norm(x, layer, "ffn_norm", cfg)
        if "ffn_gate_inp" in layer:
            x = x + _moe_ffn(h, layer, cfg)
        else:
            x = x + _ffn(h, layer, cfg.act, cfg.ffn_gated)

    if last_only:
        x = x[:, -1:, :]
    x = _norm(x, params, "output_norm", cfg)
    logits = linear.matmul(x, params["output"], out_dtype=jnp.float32)
    if "output_bias" in params:  # phi2 lm_head bias
        logits = logits + params["output_bias"]
    if cfg.logit_scale:  # command-r
        logits = logits * cfg.logit_scale
    logits = _softcap(logits, cfg.final_logit_softcap)
    return logits, pcache


# ---------------------------------------------------------------------------
# scan-based forward: one compiled layer body for all layers
# ---------------------------------------------------------------------------

def stack_layers(params: Params) -> Params:
    """Stack homogeneous per-layer params into leading-axis arrays so the
    forward pass can lax.scan over layers (one trace instead of n_layers —
    compile time drops ~n_layers-fold, HLO shrinks likewise).

    Returns a new params dict with "layers_stacked"; falls back (returns the
    input) when layers aren't homogeneous (e.g. mixed MoE/dense)."""
    layers = params["layers"]
    if not layers:
        return params
    keys = set(layers[0].keys())
    if any(set(l.keys()) != keys for l in layers):
        return params

    def stack_field(k):
        vals = [l[k] for l in layers]
        if isinstance(vals[0], QTensor):
            kinds = {v.kind for v in vals}
            shapes = {v.shape for v in vals}
            if len(kinds) != 1 or len(shapes) != 1:
                return None
            data = {}
            for name in vals[0].data:
                arrs = [v.data[name] for v in vals]
                if len({a.shape for a in arrs}) != 1:
                    return None
                data[name] = jnp.stack(arrs)
            return QTensor(kind=vals[0].kind, shape=vals[0].shape, data=data)
        if len({v.shape for v in vals}) != 1:
            return None
        return jnp.stack(vals)

    stacked = {}
    for k in keys:
        s = stack_field(k)
        if s is None:
            return params
        stacked[k] = s
    out = dict(params)
    out.pop("layers")
    out["layers_stacked"] = stacked
    return out


def _take_layer(stacked: Params, li) -> Params:
    """Slice layer li out of stacked params (used by scan's xs instead)."""
    out = {}
    for k, v in stacked.items():
        if isinstance(v, QTensor):
            out[k] = QTensor(kind=v.kind, shape=v.shape,
                             data={n: a[li] for n, a in v.data.items()})
        else:
            out[k] = v[li]
    return out


def _layer_view(stacked: Params, li) -> Params:
    """Per-layer view for the scan decode body: packed QTensors become
    LayerRefs (linear.matmul serves them via scalar-prefetch stacked Pallas
    kernels — weights stream from HBM with no per-layer XLA slice copies);
    small per-layer arrays (norms, biases) dynamic-slice, which is cheap."""
    out = {}
    for k, v in stacked.items():
        if isinstance(v, QTensor):
            out[k] = (linear.LayerRef(v, li) if v.kind != "dense"
                      else QTensor(kind="dense", shape=v.shape,
                                   data={n: a[li] for n, a in v.data.items()}))
        else:
            out[k] = v[li]
    return out


def forward_stacked(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
                    positions: jnp.ndarray, cache: KVCache,
                    last_only: bool = False) -> tuple[jnp.ndarray, KVCache]:
    """forward() over stack_layers() output using lax.scan (text-only path)."""
    B, T = tokens.shape
    S = cache.max_seq
    freqs = rope_frequencies(cfg)
    mscale = yarn_attn_scale(cfg)

    emb_w = params["tok_embd"]
    x = emb_w.data["w"][tokens] if isinstance(emb_w, QTensor) else emb_w[tokens]
    if cfg.embedding_scale:
        x = x * jnp.asarray(cfg.embedding_scale, dtype=x.dtype)

    slot_ids = jnp.arange(S)
    mask = slot_ids[None, None, :] <= positions[:, :, None]
    local_mask = mask
    if cfg.sliding_window:
        local_mask = mask & (slot_ids[None, None, :]
                             > positions[:, :, None] - cfg.sliding_window)

    qdim = cfg.n_heads * cfg.head_dim
    kvdim = cfg.n_kv_heads * cfg.head_dim
    base_scale = cfg.attn_scale if cfg.attn_scale > 0 else cfg.head_dim ** -0.5
    scale = base_scale * mscale
    stacked = params["layers_stacked"]
    n_layers = stacked["attn_norm"].shape[0]  # static: from the stacked leaf
    if cfg.sliding_window and cfg.sliding_window_pattern:
        local_flags = jnp.arange(n_layers) % cfg.sliding_window_pattern == 0
    else:
        local_flags = jnp.full((n_layers,), bool(cfg.sliding_window))

    def qkv_of(layer, h):
        if "wqkv" in layer:
            qkv = linear.matmul(h, layer["wqkv"])
            q, k, v = (qkv[..., :qdim], qkv[..., qdim:qdim + kvdim],
                       qkv[..., qdim + kvdim:])
        else:
            q = linear.matmul(h, layer["wq"])
            k = linear.matmul(h, layer["wk"])
            v = linear.matmul(h, layer["wv"])
        if "bq" in layer:
            q = q + layer["bq"].astype(q.dtype)
            k = k + layer["bk"].astype(k.dtype)
            v = v + layer["bv"].astype(v.dtype)
        q = q.reshape(B, T, cfg.n_heads, cfg.head_dim)
        k = k.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
        v = v.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
        q = apply_rope(q, positions, freqs, cfg.rope_type, cfg.rope_dim)
        k = apply_rope(k, positions, freqs, cfg.rope_type, cfg.rope_dim)
        return q, k, v

    def tail_of(layer, x, attn_out):
        attn_out = attn_out.reshape(B, T, cfg.n_heads * cfg.head_dim)
        attn_out = linear.matmul(attn_out, layer["wo"])
        if "attn_post_norm" in layer:
            attn_out = rms_norm(attn_out, layer["attn_post_norm"], cfg.rms_norm_eps)
        x = x + attn_out
        h = rms_norm(x, layer["ffn_norm"], cfg.rms_norm_eps)
        ffn_out = _ffn(h, layer, cfg.act)
        if "ffn_post_norm" in layer:
            ffn_out = rms_norm(ffn_out, layer["ffn_post_norm"], cfg.rms_norm_eps)
        return x + ffn_out

    def body(x, xs):
        layer, is_local, k_cache, v_cache = xs
        h = rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
        q, k, v = qkv_of(layer, h)
        b_idx = jnp.arange(B)[:, None]
        k_cache = k_cache.at[b_idx, positions].set(
            k.astype(k_cache.dtype), mode="drop")
        v_cache = v_cache.at[b_idx, positions].set(
            v.astype(v_cache.dtype), mode="drop")
        layer_mask = jnp.where(is_local, local_mask, mask)
        attn_out = attention(q, k_cache, v_cache, layer_mask, scale,
                             cfg.attn_logit_softcap)
        x = tail_of(layer, x, attn_out)
        return x, (k_cache, v_cache)

    from ..kv.cache import _is_layers, is_pooled, stack_cache, unstack_cache

    pooled = is_pooled(cache)
    use_rows_kernel = (pooled and T == 1 and not cfg.sliding_window
                       and not cfg.use_alibi and _flash_decode_ok(cfg))
    if use_rows_kernel:
        # pooled-cache decode: the cache pool rides the CARRY and each
        # layer's kernel addresses its own rows (base = l*B) via scalar
        # prefetch + aliased outputs — no XLA cache slices in the scan
        from ..ops import flash_decode

        interp = jax.default_backend() == "cpu"

        def body_pool(carry, li):
            # weights stay OUT of scan xs: the _layer_view LayerRefs hit the
            # scalar-prefetch stacked kernels, so XLA never materializes a
            # per-layer weight slice (scan xs slicing read+wrote every weight
            # byte per step — the 490 vs 1068 t/s gap in BENCH_r02)
            x, k_pool, v_pool = carry
            layer = _layer_view(stacked, li)
            h = rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
            q, k, v = qkv_of(layer, h)
            out, k_pool, v_pool = flash_decode.decode_attention_rows(
                q[:, 0], k[:, 0].astype(k_pool.dtype),
                v[:, 0].astype(v_pool.dtype), k_pool, v_pool,
                positions[:, 0], li * B, cfg.n_heads, cfg.n_kv_heads,
                scale, cfg.attn_logit_softcap, interpret=interp)
            x = tail_of(layer, x, out[:, None].astype(x.dtype))
            return (x, k_pool, v_pool), None

        # modest unroll: XLA can overlap one layer's weight DMA with the
        # previous layer's compute across in-body boundaries; at unroll=1
        # every scan iteration is a scheduling barrier (measured ~24us/layer
        # idle, tools/profile_scan.py). Compile cost scales with the factor.
        unroll = int(os.environ.get("KCPP_SCAN_UNROLL", "4"))
        unroll = max(1, min(unroll, n_layers))
        while n_layers % unroll:
            unroll -= 1
        (x, k_all, v_all), _ = jax.lax.scan(
            body_pool, (x, cache.k, cache.v), jnp.arange(n_layers),
            unroll=unroll)
        new_cache = KVCache(k=k_all, v=v_all, heads=cache.heads)
    else:
        per_layer = _is_layers(cache.k)
        heads = getattr(cache, "heads", None)
        if pooled:
            from ..kv.cache import unpool_cache

            cache = stack_cache(unpool_cache(cache, n_layers))
        st = stack_cache(cache)
        x, (k_all, v_all) = jax.lax.scan(
            body, x, (stacked, local_flags, st.k, st.v))
        new_cache = KVCache(k=k_all, v=v_all)
        if pooled:
            from ..kv.cache import pool_cache

            new_cache = pool_cache(new_cache)
        elif per_layer:
            new_cache = unstack_cache(new_cache, heads=heads)

    if last_only:
        x = x[:, -1:, :]
    x = rms_norm(x, params["output_norm"], cfg.rms_norm_eps)
    logits = linear.matmul(x, params["output"], out_dtype=jnp.float32)
    if "output_bias" in params:  # phi2 lm_head bias
        logits = logits + params["output_bias"]
    if cfg.logit_scale:  # command-r
        logits = logits * cfg.logit_scale
    logits = _softcap(logits, cfg.final_logit_softcap)
    return logits, new_cache
