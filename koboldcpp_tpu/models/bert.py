"""BERT-family encoders (embedding models) in JAX.

Counterpart of the reference's build_bert (/root/reference/src/llama.cpp:11439)
covering all three arch branches:
  - bert:         LN(tok + pos + type) embeddings; biased q/k/v; gelu FFN
  - nomic-bert:   NEOX rope instead of positions; fused unbias wqkv;
                  gated-silu FFN (:11507-11533,11604-11610)
  - jina-bert-v2: ALiBi bias (-slope*|i-j|, :16739); optional QK LayerNorm;
                  gated-gelu FFN with down bias; optional attn_norm_2 re-add
                  (:11581-11584)
Post-norm encoder: x = LN(x + attn(x)) then x = LN(x + ffn(x)); pooling per
{arch}.pooling_type (0 none, 1 mean, 2 CLS), llama_pooling_type semantics.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops import linear
from ..ops.linear import QTensor
from ..ops.norms import layer_norm
from .config import ModelConfig

Params = dict[str, Any]


def forward_embed(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
                  positions: jnp.ndarray) -> jnp.ndarray:
    """tokens/positions (B, S); position < 0 marks padding. Returns the final
    hidden states (B, S, C) f32 (pooling is applied by the caller)."""
    B, S = tokens.shape
    valid = positions >= 0
    eps = cfg.rms_norm_eps
    emb_w = params["tok_embd"]
    x = emb_w.data["w"][tokens] if isinstance(emb_w, QTensor) else emb_w[tokens]
    if "pos_embd" in params:  # bert learned positions
        x = x + params["pos_embd"][jnp.clip(positions, 0)].astype(x.dtype)
    if "token_types" in params:  # all-zero token types (single segment)
        x = x + params["token_types"][0][None, None, :].astype(x.dtype)
    x = layer_norm(x, params["tok_norm"], params.get("tok_norm_bias"), eps)

    mask = valid[:, None, :] & valid[:, :, None]  # (B, S, S) bidirectional
    H, D = cfg.n_heads, cfg.head_dim
    scale = D ** -0.5
    alibi = None
    if cfg.use_alibi:  # jina: -slope * |i - j| (llama.cpp :16739)
        from .llama import alibi_slopes

        dist = -jnp.abs(positions[:, None, :] - positions[:, :, None]
                        ).astype(jnp.float32)  # (B, S, S)
        alibi = (alibi_slopes(H, cfg.alibi_bias_max)[None, :, None, None]
                 * dist[:, None, :, :])  # (B, H, S, S)
    freqs = None
    if cfg.use_rope:  # nomic: NEOX rope on q/k
        from ..ops.rope import rope_frequencies

        freqs = rope_frequencies(cfg)
    for layer in params["layers"]:
        if "wqkv" in layer:  # nomic fused projection, no biases
            qkv = linear.matmul(x, layer["wqkv"])
            q = qkv[..., :H * D]
            k = qkv[..., H * D:2 * H * D]
            v = qkv[..., 2 * H * D:]
        else:
            q = linear.matmul(x, layer["wq"]) + layer["bq"].astype(x.dtype)
            k = linear.matmul(x, layer["wk"]) + layer["bk"].astype(x.dtype)
            v = linear.matmul(x, layer["wv"]) + layer["bv"].astype(x.dtype)
        if "attn_q_norm" in layer:  # jina optional full-width QK LayerNorm
            q = layer_norm(q, layer["attn_q_norm"],
                           layer.get("attn_q_norm_bias"), eps)
            k = layer_norm(k, layer["attn_k_norm"],
                           layer.get("attn_k_norm_bias"), eps)
        q = q.reshape(B, S, H, D)
        k = k.reshape(B, S, H, D)
        v = v.reshape(B, S, H, D)
        if freqs is not None:
            from ..ops.rope import apply_rope

            pos = jnp.clip(positions, 0)
            q = apply_rope(q, pos, freqs, cfg.rope_type, cfg.rope_dim)
            k = apply_rope(k, pos, freqs, cfg.rope_type, cfg.rope_dim)
        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32) * scale
        if alibi is not None:
            scores = scores + alibi
        scores = jnp.where(mask[:, None, :, :], scores,
                           jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhts,bshd->bthd", p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
        attn = attn.reshape(B, S, H * D).astype(x.dtype)
        attn = linear.matmul(attn, layer["wo"])
        if "bo" in layer:
            attn = attn + layer["bo"].astype(x.dtype)
        h = layer_norm(x + attn, layer["attn_out_norm"],
                       layer.get("attn_out_norm_bias"), eps)
        if "attn_norm_2" in layer:  # jina "mixed" layers re-add the input
            h = layer_norm(h + x, layer["attn_norm_2"],
                           layer.get("attn_norm_2_bias"), eps)
        x = h

        if "w_gate" in layer:  # nomic (silu) / jina (gelu) gated FFN
            gate = linear.matmul(x, layer["w_gate"])
            up = linear.matmul(x, layer["w_up"])
            actf = jax.nn.silu if cfg.act == "silu" else \
                lambda v_: jax.nn.gelu(v_, approximate=True)
            act = actf(gate.astype(jnp.float32)).astype(x.dtype) * up
        else:
            up = linear.matmul(x, layer["w_up"]) + layer["b_up"].astype(x.dtype)
            act = jax.nn.gelu(up.astype(jnp.float32),
                              approximate=False).astype(x.dtype)
        down = linear.matmul(act, layer["w_down"])
        if "b_down" in layer:
            down = down + layer["b_down"].astype(x.dtype)
        x = layer_norm(x + down, layer["layer_out_norm"],
                       layer.get("layer_out_norm_bias"), eps)
    return x.astype(jnp.float32)


def pool(hidden: jnp.ndarray, positions: jnp.ndarray, mode: str) -> jnp.ndarray:
    """hidden (B, S, C) -> (B, C). mode: mean | cls | none(->mean)."""
    valid = (positions >= 0).astype(jnp.float32)
    if mode == "cls":
        return hidden[:, 0]
    s = jnp.einsum("bsc,bs->bc", hidden, valid)
    return s / jnp.maximum(valid.sum(axis=1, keepdims=True), 1.0)


def load_params(reader, cfg: ModelConfig, packed: bool = True,
                dtype=jnp.bfloat16) -> Params:
    import numpy as np

    def qt(name):
        info = reader.tensors[name]
        return linear.from_gguf(reader.tensor_raw(name), info.ggml_type,
                                info.shape, packed=packed, dtype=dtype)

    def dense(name):
        return jnp.asarray(np.asarray(reader.tensor_data(name)), jnp.float32)

    names = set(reader.tensors)
    tok_info = reader.tensors["token_embd.weight"]
    params: Params = {
        "tok_embd": linear.from_gguf(reader.tensor_raw("token_embd.weight"),
                                     tok_info.ggml_type, tok_info.shape,
                                     packed=False, dtype=dtype),
        "tok_norm": dense("token_embd_norm.weight"),
        "tok_norm_bias": dense("token_embd_norm.bias"),
        "layers": [],
    }
    if "position_embd.weight" in names:
        params["pos_embd"] = dense("position_embd.weight")
    if "token_types.weight" in names:
        params["token_types"] = dense("token_types.weight")
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        layer: Params = {
            "wo": qt(p + "attn_output.weight"),
            "attn_out_norm": dense(p + "attn_output_norm.weight"),
            "attn_out_norm_bias": dense(p + "attn_output_norm.bias"),
            "w_up": qt(p + "ffn_up.weight"),
            "w_down": qt(p + "ffn_down.weight"),
            "layer_out_norm": dense(p + "layer_output_norm.weight"),
            "layer_out_norm_bias": dense(p + "layer_output_norm.bias"),
        }
        if p + "attn_qkv.weight" in names:  # nomic fused projection
            layer["wqkv"] = qt(p + "attn_qkv.weight")
        else:
            layer.update({
                "wq": qt(p + "attn_q.weight"), "bq": dense(p + "attn_q.bias"),
                "wk": qt(p + "attn_k.weight"), "bk": dense(p + "attn_k.bias"),
                "wv": qt(p + "attn_v.weight"), "bv": dense(p + "attn_v.bias"),
            })
        for key, tname in (("bo", "attn_output.bias"),
                           ("b_up", "ffn_up.bias"),
                           ("b_down", "ffn_down.bias"),
                           ("attn_q_norm", "attn_q_norm.weight"),
                           ("attn_q_norm_bias", "attn_q_norm.bias"),
                           ("attn_k_norm", "attn_k_norm.weight"),
                           ("attn_k_norm_bias", "attn_k_norm.bias"),
                           ("attn_norm_2", "attn_norm_2.weight"),
                           ("attn_norm_2_bias", "attn_norm_2.bias")):
            if p + tname in names:
                layer[key] = dense(p + tname)
        if p + "ffn_gate.weight" in names:
            layer["w_gate"] = qt(p + "ffn_gate.weight")
        params["layers"].append(layer)
    return params
