"""RWKV6 ("Finch") forward pass in JAX.

Counterpart of the reference's build_rwkv6 graph
(/root/reference/src/llama.cpp:15961-16070), llm_build_rwkv6_time_mix
(:9852-9995), llm_build_rwkv6_channel_mix (:9997-10017) and the
ggml_rwkv_wkv recurrence (/root/reference/ggml/src/ggml.c:16724:
out[t,j] = sum_i r[t,i] * (first[i]*k[t,i]*v[t,j] + S[i,j]);
S[i,j] = w[t,i]*S[i,j] + k[t,i]*v[t,j]).

State per layer = token-shift rows (last *normalized* hidden of the time-mix
and channel-mix branches) + the per-head D x D wkv matrix (kv/recurrent.py).
The wkv recurrence runs as lax.scan over time; everything else is batched
matmuls. Padding rows (position < 0, right-padded) carry state through.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..kv.recurrent import RWKVState, init_rwkv_state
from ..ops import linear
from ..ops.linear import QTensor
from ..ops.norms import layer_norm
from .config import ModelConfig

Params = dict[str, Any]

GROUP_NORM_EPS = 64e-5  # ggml_norm eps in the time-mix head norm


def init_state(cfg: ModelConfig, batch: int) -> RWKVState:
    return init_rwkv_state(cfg.n_layers, batch, cfg.hidden_size,
                           cfg.n_heads, cfg.head_dim)


def _last_valid_row(x: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, C); n_valid: (B,) count of valid rows -> (B, C)."""
    idx = jnp.clip(n_valid - 1, 0)[:, None, None]
    return jnp.take_along_axis(x, idx, axis=1)[:, 0]


def _time_mix(xn: jnp.ndarray, layer: Params, cfg: ModelConfig,
              shift: jnp.ndarray, wkv: jnp.ndarray, valid: jnp.ndarray):
    """xn: (B, T, C) normalized input; shift: (B, C) previous row;
    wkv: (B, H, D, D). Returns (out, new_wkv)."""
    B, T, C = xn.shape
    H, D = cfg.n_heads, cfg.head_dim

    x_prev = jnp.concatenate([shift[:, None, :].astype(xn.dtype),
                              xn[:, :-1]], axis=1)
    sx = x_prev - xn

    # 5-way data-dependent lerp factors through the tiny w1/w2 bottleneck
    xxx = xn + sx * layer["lerp_x"]
    z = jnp.tanh(linear.matmul(xxx, layer["w1"]).astype(jnp.float32))
    E = z.shape[-1] // 5
    z = z.reshape(B, T, 5, E)
    m = jnp.einsum("btge,gce->gbtc", z, layer["w2"].astype(jnp.float32))
    mw, mk, mv, mr, mg = (m[i].astype(xn.dtype) for i in range(5))

    xw = xn + sx * (mw + layer["lerp_w"])
    xk = xn + sx * (mk + layer["lerp_k"])
    xv = xn + sx * (mv + layer["lerp_v"])
    xr = xn + sx * (mr + layer["lerp_r"])
    xg = xn + sx * (mg + layer["lerp_g"])

    r = linear.matmul(xr, layer["wr"]).astype(jnp.float32).reshape(B, T, H, D)
    k = linear.matmul(xk, layer["wk"]).astype(jnp.float32).reshape(B, T, H, D)
    v = linear.matmul(xv, layer["wv"]).astype(jnp.float32).reshape(B, T, H, D)
    g = jax.nn.silu(linear.matmul(xg, layer["wg"]).astype(jnp.float32))

    w = (layer["decay"].astype(jnp.float32)
         + linear.matmul(jnp.tanh(
             linear.matmul(xw, layer["decay_w1"]).astype(jnp.float32)
         ).astype(xn.dtype), layer["decay_w2"]).astype(jnp.float32))
    w = jnp.exp(-jnp.exp(w)).reshape(B, T, H, D)

    first = layer["first"].astype(jnp.float32)  # (H, D)

    def step(S, inp):
        r_t, k_t, v_t, w_t, valid_t = inp  # (B,H,D) x4, (B,)
        kv = k_t[..., :, None] * v_t[..., None, :]          # (B,H,D,D)
        acc = first[None, :, :, None] * kv + S
        y_t = jnp.einsum("bhij,bhi->bhj", acc, r_t)          # (B,H,D)
        S_new = w_t[..., :, None] * S + kv
        S = jnp.where(valid_t[:, None, None, None], S_new, S)
        return S, y_t

    wkv_new, ys = jax.lax.scan(
        step, wkv,
        (r.transpose(1, 0, 2, 3), k.transpose(1, 0, 2, 3),
         v.transpose(1, 0, 2, 3), w.transpose(1, 0, 2, 3), valid.T))
    y = ys.transpose(1, 0, 2, 3).reshape(B, T, H, D)

    # per-head norm (ggml_norm over D, eps 64e-5) + full-width affine ln_x
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.var(y, axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + GROUP_NORM_EPS)
    y = y.reshape(B, T, C)
    y = y * layer["ln_x"].astype(jnp.float32) + layer["ln_x_b"].astype(jnp.float32)

    y = (y * g).astype(xn.dtype)
    return linear.matmul(y, layer["wo"]), wkv_new


def _channel_mix(xn: jnp.ndarray, layer: Params, shift: jnp.ndarray):
    x_prev = jnp.concatenate([shift[:, None, :].astype(xn.dtype),
                              xn[:, :-1]], axis=1)
    sx = x_prev - xn
    xk = xn + sx * layer["c_lerp_k"]
    xr = xn + sx * layer["c_lerp_r"]
    r = jax.nn.sigmoid(linear.matmul(xr, layer["cr"]).astype(jnp.float32))
    k = jnp.square(jax.nn.relu(
        linear.matmul(xk, layer["ck"]).astype(jnp.float32))).astype(xn.dtype)
    return (r * linear.matmul(k, layer["cv"]).astype(jnp.float32)).astype(xn.dtype)


def forward(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
            positions: jnp.ndarray, cache: RWKVState,
            last_only: bool = False,
            last_index: jnp.ndarray | None = None
            ) -> tuple[jnp.ndarray, RWKVState]:
    """tokens/positions: (B, T) int32; rows with position < 0 are padding
    (right-padded) and do not advance the state."""
    B, T = tokens.shape
    valid = positions >= 0
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=1)
    eps = cfg.rms_norm_eps
    rescale = cfg.extras.get("rescale_every", 0) if cfg.extras else 0

    emb_w = params["tok_embd"]
    x = emb_w.data["w"][tokens] if isinstance(emb_w, QTensor) else emb_w[tokens]
    x = layer_norm(x, params["tok_norm"], params["tok_norm_b"], eps)

    new_att, new_ffn, new_wkv = [], [], []
    for li, layer in enumerate(params["layers"]):
        xn_att = layer_norm(x, layer["attn_norm"], layer["attn_norm_b"], eps)
        out, wkv_li = _time_mix(xn_att, layer, cfg, cache.att_shift[li],
                                cache.wkv[li], valid)
        x = x + out.astype(x.dtype)
        new_wkv.append(wkv_li)
        new_att.append(_last_valid_row(xn_att, n_valid).astype(jnp.float32))

        xn_ffn = layer_norm(x, layer["attn_norm_2"], layer["attn_norm_2_b"], eps)
        x = x + _channel_mix(xn_ffn, layer, cache.ffn_shift[li]).astype(x.dtype)
        new_ffn.append(_last_valid_row(xn_ffn, n_valid).astype(jnp.float32))

        if rescale and (li + 1) % rescale == 0:
            x = x * jnp.asarray(0.5, x.dtype)

    state = RWKVState(att_shift=jnp.stack(new_att),
                      ffn_shift=jnp.stack(new_ffn),
                      wkv=jnp.stack(new_wkv))

    if last_index is not None:
        x = x[jnp.arange(B), last_index][:, None, :]
    elif last_only:
        x = x[:, -1:, :]
    x = layer_norm(x, params["output_norm"], params["output_norm_b"], eps)
    logits = linear.matmul(x, params["output"], out_dtype=jnp.float32)
    return logits, state


def load_params(reader, cfg: ModelConfig, packed: bool = True,
                dtype=jnp.bfloat16) -> Params:
    """GGUF -> params for rwkv6 (tensor names per reference
    gguf-py/gguf/constants.py MODEL_TENSORS[RWKV6]; shape conventions set by
    the reference converter's transposes, convert_hf_to_gguf.py:2900-2904)."""
    import numpy as np

    def qt(name):
        info = reader.tensors[name]
        return linear.from_gguf(reader.tensor_raw(name), info.ggml_type,
                                info.shape, packed=packed, dtype=dtype)

    def dense(name, flat=False):
        a = np.asarray(reader.tensor_data(name), np.float32)
        return jnp.asarray(a.reshape(-1) if flat else a)

    names = set(reader.tensors)
    tok_info = reader.tensors["token_embd.weight"]
    tok_embd = linear.from_gguf(reader.tensor_raw("token_embd.weight"),
                                tok_info.ggml_type, tok_info.shape,
                                packed=False, dtype=dtype)
    params: Params = {
        "tok_embd": tok_embd,
        "tok_norm": dense("token_embd_norm.weight"),
        "tok_norm_b": dense("token_embd_norm.bias"),
        "output_norm": dense("output_norm.weight"),
        "output_norm_b": dense("output_norm.bias"),
        "output": qt("output.weight") if "output.weight" in names else tok_embd,
        "layers": [],
    }
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        E2 = reader.tensors[p + "time_mix_w2.weight"].shape  # (5, C, E)
        layer = {
            "attn_norm": dense(p + "attn_norm.weight"),
            "attn_norm_b": dense(p + "attn_norm.bias"),
            "attn_norm_2": dense(p + "attn_norm_2.weight"),
            "attn_norm_2_b": dense(p + "attn_norm_2.bias"),
            "lerp_x": dense(p + "time_mix_lerp_x.weight", flat=True),
            "lerp_w": dense(p + "time_mix_lerp_w.weight", flat=True),
            "lerp_k": dense(p + "time_mix_lerp_k.weight", flat=True),
            "lerp_v": dense(p + "time_mix_lerp_v.weight", flat=True),
            "lerp_r": dense(p + "time_mix_lerp_r.weight", flat=True),
            "lerp_g": dense(p + "time_mix_lerp_g.weight", flat=True),
            "w1": qt(p + "time_mix_w1.weight"),
            "w2": dense(p + "time_mix_w2.weight"),  # (5, C, E)
            "first": dense(p + "time_mix_first.weight"),  # (H, D)
            "decay": dense(p + "time_mix_decay.weight", flat=True),
            "decay_w1": qt(p + "time_mix_decay_w1.weight"),
            "decay_w2": qt(p + "time_mix_decay_w2.weight"),
            "wk": qt(p + "time_mix_key.weight"),
            "wv": qt(p + "time_mix_value.weight"),
            "wr": qt(p + "time_mix_receptance.weight"),
            "wg": qt(p + "time_mix_gate.weight"),
            "ln_x": dense(p + "time_mix_ln.weight"),
            "ln_x_b": dense(p + "time_mix_ln.bias"),
            "wo": qt(p + "time_mix_output.weight"),
            "c_lerp_k": dense(p + "channel_mix_lerp_k.weight", flat=True),
            "c_lerp_r": dense(p + "channel_mix_lerp_r.weight", flat=True),
            "ck": qt(p + "channel_mix_key.weight"),
            "cr": qt(p + "channel_mix_receptance.weight"),
            "cv": qt(p + "channel_mix_value.weight"),
        }
        params["layers"].append(layer)
    return params
