"""DeepSeek-V2 (MLA, multi-head latent attention) forward pass in JAX.

Counterpart of the reference's build_deepseek2
(/root/reference/src/llama.cpp:14792-15018):
- Q through an optional LoRA bottleneck (wq_a -> rmsnorm -> wq_b; "lite"
  models use a plain wq);
- per head, Q/K split into a no-position part (nope, first dims) and a roped
  part (last n_rot dims); the roped K is a single shared head (MQA-style,
  repeated across heads);
- K/V decompressed from a rank-`kv_lora_rank` latent (wkv_a_mqa -> rmsnorm ->
  wkv_b). This implementation materializes full K/V into the cache like the
  reference (the latent-cache absorb trick is a later optimization);
- YaRN pre-scaling: kq_scale = mscale^2 / sqrt(d_k) with
  mscale = attn_factor * (1 + yarn_log_mul * ln(1/freq_scale)), and RoPE run
  with attn_factor' = 1/(1 + 0.1 ln(1/freq_scale)) (llama.cpp:14801-14804);
- leading dense layers then MoE with softmax router, un-normalized top-k
  scaled by expert_weights_scale, plus an always-on shared expert.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from ..kv.cache import KVCache
from ..ops import linear
from ..ops.linear import QTensor
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_frequencies
from .config import ModelConfig

Params = dict[str, Any]


def init_cache(cfg: ModelConfig, batch: int, max_seq: int,
               dtype=jnp.bfloat16) -> KVCache:
    """K rows are qk_nope+qk_rope wide, V rows v_head_dim wide."""
    dk = cfg.head_dim
    dv = cfg.extras["v_head_dim"]
    return KVCache(
        k=jnp.zeros((cfg.n_layers, batch, max_seq, cfg.n_heads, dk), dtype),
        v=jnp.zeros((cfg.n_layers, batch, max_seq, cfg.n_heads, dv), dtype))


def _scales(cfg: ModelConfig) -> tuple[float, float]:
    """(kq_scale, rope_attn_factor) with DeepSeek's YaRN pre-scaling."""
    dk = cfg.head_dim
    if cfg.rope_scaling_type == "yarn" and cfg.rope_scaling_factor != 1.0:
        log_inv_fs = math.log(cfg.rope_scaling_factor)  # ln(1/freq_scale)
        mscale = cfg.rope_attn_factor * (
            1.0 + cfg.extras.get("yarn_log_mul", 0.1) * log_inv_fs)
        return mscale * mscale / math.sqrt(dk), 1.0 / (1.0 + 0.1 * log_inv_fs)
    return 1.0 / math.sqrt(dk), 1.0


def _moe(x: jnp.ndarray, layer: Params, cfg: ModelConfig) -> jnp.ndarray:
    """Softmax router, top-k un-normalized, scaled by expert_weights_scale;
    shared expert added unconditionally (llm_build_moe_ffn call with
    norm_w=false, scale_w=true, llama.cpp:14972-14996)."""
    B, T, C = x.shape
    xt = x.reshape(-1, C)
    router = linear.matmul(xt, layer["ffn_gate_inp"]).astype(jnp.float32)
    weights = jax.nn.softmax(router, axis=-1)
    topw, topi = jax.lax.top_k(weights, cfg.n_experts_used)
    topw = topw * cfg.extras.get("expert_weights_scale", 1.0)

    wg = layer["ffn_gate_exps"].data["w"]
    wu = layer["ffn_up_exps"].data["w"]
    wd = layer["ffn_down_exps"].data["w"]
    g = jnp.einsum("nc,nkfc->nkf", xt, wg[topi],
                   preferred_element_type=jnp.float32)
    u = jnp.einsum("nc,nkfc->nkf", xt, wu[topi],
                   preferred_element_type=jnp.float32)
    a = jax.nn.silu(g) * u
    d = jnp.einsum("nkf,nkcf->nkc", a.astype(xt.dtype), wd[topi],
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("nkc,nk->nc", d, topw)

    sg = jax.nn.silu(linear.matmul(xt, layer["ffn_gate_shexp"]).astype(jnp.float32))
    su = linear.matmul(xt, layer["ffn_up_shexp"]).astype(jnp.float32)
    sd = linear.matmul((sg * su).astype(xt.dtype), layer["ffn_down_shexp"])
    return (out + sd.astype(jnp.float32)).reshape(B, T, C).astype(x.dtype)


def forward(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
            positions: jnp.ndarray, cache: KVCache,
            last_only: bool = False,
            last_index: jnp.ndarray | None = None
            ) -> tuple[jnp.ndarray, KVCache]:
    B, T = tokens.shape
    S = cache.max_seq
    H = cfg.n_heads
    dk = cfg.head_dim
    dv = cfg.extras["v_head_dim"]
    d_rope = cfg.rope_dim
    d_nope = dk - d_rope
    freqs = rope_frequencies(cfg)
    kq_scale, rope_factor = _scales(cfg)

    emb_w = params["tok_embd"]
    x = emb_w.data["w"][tokens] if isinstance(emb_w, QTensor) else emb_w[tokens]
    if cfg.embedding_scale:  # minicpm3 (build_minicpm3: scale_embd = 12)
        x = x * jnp.asarray(cfg.embedding_scale, x.dtype)
    res_s = cfg.residual_scale or 1.0
    slot_ids = jnp.arange(S)
    mask = slot_ids[None, None, :] <= positions[:, :, None]
    b_idx = jnp.arange(B)[:, None]

    k_cache, v_cache = cache.k, cache.v
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
        if "wq_a" in layer:
            q = linear.matmul(h, layer["wq_a"])
            q = rms_norm(q, layer["q_a_norm"], cfg.rms_norm_eps)
            q = linear.matmul(q, layer["wq_b"])
        else:
            q = linear.matmul(h, layer["wq"])
        q = q.reshape(B, T, H, dk)
        q_nope, q_pe = q[..., :d_nope], q[..., d_nope:]

        kv_pe = linear.matmul(h, layer["wkv_a_mqa"])  # (B,T,rank+d_rope)
        rank = kv_pe.shape[-1] - d_rope
        kv_c = rms_norm(kv_pe[..., :rank], layer["kv_a_norm"], cfg.rms_norm_eps)
        k_pe = kv_pe[..., rank:].reshape(B, T, 1, d_rope)
        kv = linear.matmul(kv_c, layer["wkv_b"]).reshape(B, T, H, d_nope + dv)
        k_nope, v = kv[..., :d_nope], kv[..., d_nope:]

        # NOTE: HF/original DeepSeek weights use interleaved-pair rope (the
        # remote code de-interleaves then rotate_halfs, net = adjacent pairs)
        # -> cfg.rope_type "norm" for deepseek2; minicpm3 is NEOX
        # (llama_rope_type, src/llama.cpp:19744).
        q_pe = apply_rope(q_pe, positions, freqs, cfg.rope_type, d_rope,
                          mscale=rope_factor)
        k_pe = apply_rope(k_pe, positions, freqs, cfg.rope_type, d_rope,
                          mscale=rope_factor)
        qh = jnp.concatenate([q_nope, q_pe], axis=-1)
        kh = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_pe, (B, T, H, d_rope))], axis=-1)

        k_cache = k_cache.at[li, b_idx, positions].set(
            kh.astype(k_cache.dtype), mode="drop")
        v_cache = v_cache.at[li, b_idx, positions].set(
            v.astype(v_cache.dtype), mode="drop")

        scores = jnp.einsum("bthd,bshd->bhts", qh, k_cache[li],
                            preferred_element_type=jnp.float32) * kq_scale
        scores = jnp.where(mask[:, None, :, :], scores,
                           jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhts,bshd->bthd", p.astype(x.dtype), v_cache[li],
                          preferred_element_type=jnp.float32)
        attn = attn.reshape(B, T, H * dv).astype(x.dtype)
        x = x + res_s * linear.matmul(attn, layer["wo"])

        h = rms_norm(x, layer["ffn_norm"], cfg.rms_norm_eps)
        if "ffn_gate_inp" in layer:
            x = x + res_s * _moe(h, layer, cfg)
        else:
            g = jax.nn.silu(linear.matmul(h, layer["w_gate"])
                            .astype(jnp.float32)).astype(h.dtype)
            u = linear.matmul(h, layer["w_up"])
            x = x + res_s * linear.matmul(g * u, layer["w_down"])

    cache = KVCache(k=k_cache, v=v_cache)
    if last_index is not None:
        x = x[jnp.arange(B), last_index][:, None, :]
    elif last_only:
        x = x[:, -1:, :]
    x = rms_norm(x, params["output_norm"], cfg.rms_norm_eps)
    logits = linear.matmul(x, params["output"], out_dtype=jnp.float32)
    if cfg.logit_scale:  # minicpm3: 256 / n_embd
        logits = logits * cfg.logit_scale
    return logits, cache


def load_params(reader, cfg: ModelConfig, packed: bool = True,
                dtype=jnp.bfloat16) -> Params:
    def qt(name):
        info = reader.tensors[name]
        return linear.from_gguf(reader.tensor_raw(name), info.ggml_type,
                                info.shape, packed=packed, dtype=dtype)

    def dense(name):
        import numpy as np

        return jnp.asarray(np.asarray(reader.tensor_data(name)), jnp.float32)

    names = set(reader.tensors)
    tok_info = reader.tensors["token_embd.weight"]
    tok_embd = linear.from_gguf(reader.tensor_raw("token_embd.weight"),
                                tok_info.ggml_type, tok_info.shape,
                                packed=False, dtype=dtype)
    params: Params = {
        "tok_embd": tok_embd,
        "output_norm": dense("output_norm.weight"),
        "output": qt("output.weight") if "output.weight" in names else tok_embd,
        "layers": [],
    }
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        layer: dict[str, Any] = {
            "attn_norm": dense(p + "attn_norm.weight"),
            "wkv_a_mqa": qt(p + "attn_kv_a_mqa.weight"),
            "kv_a_norm": dense(p + "attn_kv_a_norm.weight"),
            "wkv_b": qt(p + "attn_kv_b.weight"),
            "wo": qt(p + "attn_output.weight"),
            "ffn_norm": dense(p + "ffn_norm.weight"),
        }
        if p + "attn_q_a.weight" in names:
            layer["wq_a"] = qt(p + "attn_q_a.weight")
            layer["q_a_norm"] = dense(p + "attn_q_a_norm.weight")
            layer["wq_b"] = qt(p + "attn_q_b.weight")
        else:
            layer["wq"] = qt(p + "attn_q.weight")
        if p + "ffn_gate_inp.weight" in names:
            layer["ffn_gate_inp"] = qt(p + "ffn_gate_inp.weight")
            for key, tname in (("ffn_gate_exps", "ffn_gate_exps.weight"),
                               ("ffn_up_exps", "ffn_up_exps.weight"),
                               ("ffn_down_exps", "ffn_down_exps.weight")):
                info = reader.tensors[p + tname]
                layer[key] = linear.from_gguf(
                    reader.tensor_raw(p + tname), info.ggml_type, info.shape,
                    packed=False, dtype=dtype)
            for key, tname in (("ffn_gate_shexp", "ffn_gate_shexp.weight"),
                               ("ffn_up_shexp", "ffn_up_shexp.weight"),
                               ("ffn_down_shexp", "ffn_down_shexp.weight")):
                layer[key] = qt(p + tname)
        else:
            layer["w_gate"] = qt(p + "ffn_gate.weight")
            layer["w_up"] = qt(p + "ffn_up.weight")
            layer["w_down"] = qt(p + "ffn_down.weight")
        params["layers"].append(layer)
    return params
