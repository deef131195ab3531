"""T5 encoder-decoder forward pass in JAX.

Counterpart of the reference's build_t5_encoder / build_t5_decoder
(/root/reference/src/llama.cpp:15170,15302) and
llama_relative_position_bucket (:16551). Key T5 semantics mirrored:
- no attention scaling (soft_max_ext scale 1.0);
- learned relative-position bucket bias, layer 0's table shared by all layers;
  encoder bidirectional buckets, decoder causal buckets, cross-attention
  un-biased;
- RMSNorm everywhere, ReLU FFN (gated GELU when ffn_gate tensors exist —
  flan-T5);
- decoder self-attention KV cached slot==position; cross-attention K/V
  computed once per request from the encoder output (prepare_cross).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import linear
from ..ops.linear import QTensor
from ..ops.norms import rms_norm
from .config import ModelConfig

Params = dict[str, Any]

T5_MAX_DISTANCE = 128  # hardcoded in the reference (llama.cpp:16553)


@partial(jax.tree_util.register_dataclass,
         data_fields=["self_k", "self_v", "cross_k", "cross_v", "enc_valid"],
         meta_fields=[])
@dataclass
class T5Cache:
    self_k: jnp.ndarray   # (L, B, S, H, D) decoder self-attn
    self_v: jnp.ndarray
    cross_k: jnp.ndarray  # (L, B, Senc, H, D) projected encoder output
    cross_v: jnp.ndarray
    enc_valid: jnp.ndarray  # (B, Senc) bool

    @property
    def max_seq(self) -> int:
        return self.self_k.shape[2]


def init_cache(cfg: ModelConfig, batch: int, max_seq: int, enc_seq: int,
               dtype=jnp.float32) -> T5Cache:
    shape = (cfg.n_layers, batch, max_seq, cfg.n_kv_heads, cfg.head_dim)
    cshape = (cfg.n_layers, batch, enc_seq, cfg.n_kv_heads, cfg.head_dim)
    return T5Cache(self_k=jnp.zeros(shape, dtype), self_v=jnp.zeros(shape, dtype),
                   cross_k=jnp.zeros(cshape, dtype),
                   cross_v=jnp.zeros(cshape, dtype),
                   enc_valid=jnp.zeros((batch, enc_seq), bool))


def relative_buckets(rel_pos: jnp.ndarray, n_buckets: int,
                     bidirectional: bool) -> jnp.ndarray:
    """rel_pos = key_pos - query_pos (llama_relative_position_bucket)."""
    nb = n_buckets // 2 if bidirectional else n_buckets
    max_exact = nb // 2
    if bidirectional:
        base = jnp.where(rel_pos > 0, nb, 0)
        rel = jnp.abs(rel_pos)
    else:
        base = jnp.zeros_like(rel_pos)
        rel = -jnp.minimum(rel_pos, 0)
    import math

    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        * (nb - max_exact) / math.log(T5_MAX_DISTANCE / max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return base + jnp.where(rel < max_exact, rel, large)


def _pos_bias(rel_b: jnp.ndarray, q_pos: jnp.ndarray, k_pos: jnp.ndarray,
              n_buckets: int, bidirectional: bool) -> jnp.ndarray:
    """rel_b: (n_buckets, H); q_pos (B, T); k_pos (S,) -> (B, H, T, S)."""
    rel = k_pos[None, None, :] - q_pos[:, :, None]  # (B, T, S)
    buckets = relative_buckets(rel, n_buckets, bidirectional)
    bias = rel_b.astype(jnp.float32)[buckets]  # (B, T, S, H)
    return bias.transpose(0, 3, 1, 2)


def _attn(q, k, v, mask, bias=None):
    """Unscaled T5 attention. q: (B,T,H,D); k/v: (B,S,H,D); mask (B,T,S)."""
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias
    scores = jnp.where(mask[:, None, :, :], scores, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _proj_qkv(x, layer, prefix, cfg, B, T):
    q = linear.matmul(x, layer[prefix + "q"]).reshape(B, T, cfg.n_heads, cfg.head_dim)
    k = linear.matmul(x, layer[prefix + "k"]).reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
    v = linear.matmul(x, layer[prefix + "v"]).reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
    return q, k, v


def _ffn(x, layer, cfg):
    if "ffn_gate" in layer:  # flan: gelu-gated
        g = jax.nn.gelu(linear.matmul(x, layer["ffn_gate"]).astype(jnp.float32),
                        approximate=True).astype(x.dtype)
        u = linear.matmul(x, layer["ffn_up"])
        return linear.matmul(g * u, layer["ffn_down"])
    u = jax.nn.relu(linear.matmul(x, layer["ffn_up"]).astype(jnp.float32))
    return linear.matmul(u.astype(x.dtype), layer["ffn_down"])


def encode(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
           positions: jnp.ndarray) -> jnp.ndarray:
    """Encoder pass. tokens/positions (B, S); position < 0 marks padding.
    Returns normalized encoder states (B, S, C)."""
    B, S = tokens.shape
    emb_w = params["tok_embd"]
    x = emb_w.data["w"][tokens] if isinstance(emb_w, QTensor) else emb_w[tokens]
    valid = positions >= 0
    mask = valid[:, None, :] & valid[:, :, None]  # (B, S, S)
    nb = cfg.extras["rel_buckets"]
    pos = jnp.maximum(positions, 0)

    enc = params["enc_layers"]
    rel_b0 = enc[0]["attn_rel_b"]
    for layer in enc:
        h = rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
        q, k, v = _proj_qkv(h, layer, "attn_", cfg, B, S)
        rel_b = layer.get("attn_rel_b", rel_b0)
        bias = _pos_bias_enc(rel_b, pos, nb)
        attn = _attn(q, k, v, mask, bias)
        x = x + linear.matmul(attn.reshape(B, S, -1), layer["attn_o"])
        h = rms_norm(x, layer["ffn_norm"], cfg.rms_norm_eps)
        x = x + _ffn(h, layer, cfg)
    return rms_norm(x, params["enc_output_norm"], cfg.rms_norm_eps)


def _pos_bias_enc(rel_b, pos, nb):
    """Encoder bias with per-row positions: (B, S) x (B, S) -> (B, H, S, S)."""
    rel = pos[:, None, :] - pos[:, :, None]
    buckets = relative_buckets(rel, nb, True)
    return rel_b.astype(jnp.float32)[buckets].transpose(0, 3, 1, 2)


def prepare_cross(params: Params, cfg: ModelConfig, enc_out: jnp.ndarray,
                  enc_valid: jnp.ndarray, cache: T5Cache) -> T5Cache:
    """Project encoder states to per-layer cross K/V once per request."""
    B, S, _ = enc_out.shape
    ck, cv = [], []
    for layer in params["dec_layers"]:
        k = linear.matmul(enc_out, layer["cross_attn_k"]).reshape(
            B, S, cfg.n_kv_heads, cfg.head_dim)
        v = linear.matmul(enc_out, layer["cross_attn_v"]).reshape(
            B, S, cfg.n_kv_heads, cfg.head_dim)
        ck.append(k.astype(cache.cross_k.dtype))
        cv.append(v.astype(cache.cross_v.dtype))
    return T5Cache(self_k=cache.self_k, self_v=cache.self_v,
                   cross_k=jnp.stack(ck), cross_v=jnp.stack(cv),
                   enc_valid=enc_valid)


def forward(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
            positions: jnp.ndarray, cache: T5Cache,
            last_only: bool = False,
            last_index: jnp.ndarray | None = None
            ) -> tuple[jnp.ndarray, T5Cache]:
    """Decoder pass over cached cross K/V. tokens/positions (B, T);
    slot == position invariant like the llama cache."""
    B, T = tokens.shape
    S = cache.max_seq
    nb = cfg.extras["rel_buckets"]
    emb_w = params["tok_embd"]
    x = emb_w.data["w"][tokens] if isinstance(emb_w, QTensor) else emb_w[tokens]

    slot_ids = jnp.arange(S)
    mask = slot_ids[None, None, :] <= positions[:, :, None]
    cross_mask = jnp.broadcast_to(cache.enc_valid[:, None, :],
                                  (B, T, cache.enc_valid.shape[1]))
    pos = jnp.maximum(positions, 0)
    b_idx = jnp.arange(B)[:, None]

    dec = params["dec_layers"]
    rel_b0 = dec[0]["attn_rel_b"]
    self_k, self_v = cache.self_k, cache.self_v
    for li, layer in enumerate(dec):
        h = rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
        q, k, v = _proj_qkv(h, layer, "attn_", cfg, B, T)
        self_k = self_k.at[li, b_idx, positions].set(
            k.astype(self_k.dtype), mode="drop")
        self_v = self_v.at[li, b_idx, positions].set(
            v.astype(self_v.dtype), mode="drop")
        rel_b = layer.get("attn_rel_b", rel_b0)
        bias = _pos_bias(rel_b, pos, slot_ids, nb, False)
        attn = _attn(q, self_k[li], self_v[li], mask, bias)
        x = x + linear.matmul(attn.reshape(B, T, -1), layer["attn_o"])

        h = rms_norm(x, layer["cross_attn_norm"], cfg.rms_norm_eps)
        cq = linear.matmul(h, layer["cross_attn_q"]).reshape(
            B, T, cfg.n_heads, cfg.head_dim)
        cattn = _attn(cq, cache.cross_k[li], cache.cross_v[li], cross_mask)
        x = x + linear.matmul(cattn.reshape(B, T, -1), layer["cross_attn_o"])

        h = rms_norm(x, layer["ffn_norm"], cfg.rms_norm_eps)
        x = x + _ffn(h, layer, cfg)

    new_cache = T5Cache(self_k=self_k, self_v=self_v, cross_k=cache.cross_k,
                        cross_v=cache.cross_v, enc_valid=cache.enc_valid)
    if last_index is not None:
        x = x[jnp.arange(B), last_index][:, None, :]
    elif last_only:
        x = x[:, -1:, :]
    x = rms_norm(x, params["output_norm"], cfg.rms_norm_eps)
    logits = linear.matmul(x, params["output"], out_dtype=jnp.float32)
    return logits, new_cache


def load_params(reader, cfg: ModelConfig, packed: bool = True,
                dtype=jnp.bfloat16) -> Params:
    """GGUF -> params for t5 (tensor names per reference
    gguf-py MODEL_TENSORS[T5]: enc.blk.* / dec.blk.* prefixes)."""
    import numpy as np

    def qt(name):
        info = reader.tensors[name]
        return linear.from_gguf(reader.tensor_raw(name), info.ggml_type,
                                info.shape, packed=packed, dtype=dtype)

    def dense(name):
        return jnp.asarray(np.asarray(reader.tensor_data(name)), jnp.float32)

    names = set(reader.tensors)
    tok_info = reader.tensors["token_embd.weight"]
    tok_embd = linear.from_gguf(reader.tensor_raw("token_embd.weight"),
                                tok_info.ggml_type, tok_info.shape,
                                packed=False, dtype=dtype)
    params: Params = {
        "tok_embd": tok_embd,
        "enc_output_norm": dense("enc.output_norm.weight"),
        "output": qt("output.weight") if "output.weight" in names else tok_embd,
        "enc_layers": [], "dec_layers": [],
    }
    if "dec.output_norm.weight" in names:
        params["output_norm"] = dense("dec.output_norm.weight")
    for i in range(cfg.n_layers):
        p = f"enc.blk.{i}."
        layer = {
            "attn_norm": dense(p + "attn_norm.weight"),
            "attn_q": qt(p + "attn_q.weight"),
            "attn_k": qt(p + "attn_k.weight"),
            "attn_v": qt(p + "attn_v.weight"),
            "attn_o": qt(p + "attn_o.weight"),
            "ffn_norm": dense(p + "ffn_norm.weight"),
            "ffn_up": qt(p + "ffn_up.weight"),
            "ffn_down": qt(p + "ffn_down.weight"),
        }
        if p + "attn_rel_b.weight" in names:
            layer["attn_rel_b"] = dense(p + "attn_rel_b.weight")
        if p + "ffn_gate.weight" in names:
            layer["ffn_gate"] = qt(p + "ffn_gate.weight")
        params["enc_layers"].append(layer)
    for i in range(cfg.n_layers):
        p = f"dec.blk.{i}."
        if p + "attn_norm.weight" not in names:  # t5encoder: no decoder
            break
        layer = {
            "attn_norm": dense(p + "attn_norm.weight"),
            "attn_q": qt(p + "attn_q.weight"),
            "attn_k": qt(p + "attn_k.weight"),
            "attn_v": qt(p + "attn_v.weight"),
            "attn_o": qt(p + "attn_o.weight"),
            "cross_attn_norm": dense(p + "cross_attn_norm.weight"),
            "cross_attn_q": qt(p + "cross_attn_q.weight"),
            "cross_attn_k": qt(p + "cross_attn_k.weight"),
            "cross_attn_v": qt(p + "cross_attn_v.weight"),
            "cross_attn_o": qt(p + "cross_attn_o.weight"),
            "ffn_norm": dense(p + "ffn_norm.weight"),
            "ffn_up": qt(p + "ffn_up.weight"),
            "ffn_down": qt(p + "ffn_down.weight"),
        }
        if p + "attn_rel_b.weight" in names:
            layer["attn_rel_b"] = dense(p + "attn_rel_b.weight")
        if p + "ffn_gate.weight" in names:
            layer["ffn_gate"] = qt(p + "ffn_gate.weight")
        params["dec_layers"].append(layer)
    return params
