"""BERT-family encoder (embedding models) in JAX.

Counterpart of the reference's build_bert (/root/reference/src/llama.cpp,
LLM_ARCH_BERT) — post-norm transformer encoder: embeddings =
LN(tok + pos + token_type), each layer x = LN(x + attn(x)) then
x = LN(x + ffn(x)); pooling per {arch}.pooling_type (0 none, 1 mean, 2 CLS),
matching llama.cpp's llama_pooling_type semantics.
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
    x = x + params["pos_embd"][jnp.clip(positions, 0)].astype(x.dtype)
    if "token_types" in params:  # all-zero token types (single segment)
        x = x + params["token_types"][0][None, None, :].astype(x.dtype)
    x = layer_norm(x, params["tok_norm"], params.get("tok_norm_bias"), eps)

    mask = valid[:, None, :] & valid[:, :, None]  # (B, S, S) bidirectional
    H, D = cfg.n_heads, cfg.head_dim
    scale = D ** -0.5
    for layer in params["layers"]:
        q = (linear.matmul(x, layer["wq"]) + layer["bq"].astype(x.dtype)
             ).reshape(B, S, H, D)
        k = (linear.matmul(x, layer["wk"]) + layer["bk"].astype(x.dtype)
             ).reshape(B, S, H, D)
        v = (linear.matmul(x, layer["wv"]) + layer["bv"].astype(x.dtype)
             ).reshape(B, S, H, D)
        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask[:, None, :, :], scores,
                           jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhts,bshd->bthd", p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
        attn = attn.reshape(B, S, H * D).astype(x.dtype)
        attn = linear.matmul(attn, layer["wo"]) + layer["bo"].astype(x.dtype)
        x = layer_norm(x + attn, layer["attn_out_norm"],
                       layer.get("attn_out_norm_bias"), eps)

        up = linear.matmul(x, layer["w_up"]) + layer["b_up"].astype(x.dtype)
        act = jax.nn.gelu(up.astype(jnp.float32), approximate=False).astype(x.dtype)
        down = linear.matmul(act, layer["w_down"]) + layer["b_down"].astype(x.dtype)
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
        "pos_embd": dense("position_embd.weight"),
        "tok_norm": dense("token_embd_norm.weight"),
        "tok_norm_bias": dense("token_embd_norm.bias"),
        "layers": [],
    }
    if "token_types.weight" in names:
        params["token_types"] = dense("token_types.weight")
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        params["layers"].append({
            "wq": qt(p + "attn_q.weight"), "bq": dense(p + "attn_q.bias"),
            "wk": qt(p + "attn_k.weight"), "bk": dense(p + "attn_k.bias"),
            "wv": qt(p + "attn_v.weight"), "bv": dense(p + "attn_v.bias"),
            "wo": qt(p + "attn_output.weight"),
            "bo": dense(p + "attn_output.bias"),
            "attn_out_norm": dense(p + "attn_output_norm.weight"),
            "attn_out_norm_bias": dense(p + "attn_output_norm.bias"),
            "w_up": qt(p + "ffn_up.weight"), "b_up": dense(p + "ffn_up.bias"),
            "w_down": qt(p + "ffn_down.weight"),
            "b_down": dense(p + "ffn_down.bias"),
            "layer_out_norm": dense(p + "layer_output_norm.weight"),
            "layer_out_norm_bias": dense(p + "layer_output_norm.bias"),
        })
    return params
