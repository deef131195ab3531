"""RWKV v4 ("Raven"/"Pile" era) forward pass in JAX.

Counterpart of the reference's legacy rwkv runtime
(/root/reference/otherarch/rwkv_v3.cpp: rwkv_att :1008, rwkv_att_rkv :868,
rwkv_att_wkv :934, rwkv_ffn :1045, rwkv_carry_x :813, serial/sequential
graphs :1447-1720; rwkv_v2.cpp is the same architecture on older ggml).

Per layer the state is 5 vectors of n_embd (rwkv_init_state :1767):
token-shift carries for the time-mix and channel-mix branches (the last
*normalized* hidden row each, rwkv_carry_x) plus the wkv accumulators
aa/bb/pp.  pp is the running max exponent of the numerically-stabilized
streaming softmax (init -1e30).  time_decay arrives from the file already
transformed to -exp(w) by the rwkv.cpp converter (our tools/convert_rwkv.py
applies the same transform), so the graph uses it additively, exactly like
rwkv_att_wkv's `ww = pp + time_decay`.

The wkv recurrence runs as lax.scan over time; everything else is batched
matmuls.  Padding rows (position < 0, right-padded) carry state through.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..kv.recurrent import RWKV4State, init_rwkv4_state
from ..ops import linear
from ..ops.linear import QTensor
from ..ops.norms import layer_norm
from .config import ModelConfig

Params = dict[str, Any]

LN_EPS = 1e-5  # ggml_v3_norm eps (ggml_v3.h GGML_V3 default 1e-5)


def init_state(cfg: ModelConfig, batch: int) -> RWKV4State:
    return init_rwkv4_state(cfg.n_layers, batch, cfg.hidden_size)


def _last_valid_row(x: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, C); n_valid: (B,) count of valid rows -> (B, C)."""
    idx = jnp.clip(n_valid - 1, 0)[:, None, None]
    return jnp.take_along_axis(x, idx, axis=1)[:, 0]


def _mix(xn: jnp.ndarray, x_prev: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """x * time_mix + x_prev * (1 - time_mix) (rwkv_att_rkv :877-893)."""
    return xn * t + x_prev * (1.0 - t)


def _shifted(xn: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([shift[:, None, :].astype(xn.dtype), xn[:, :-1]],
                           axis=1)


def _time_mix(xn, layer, shift, aa, bb, pp, valid):
    """xn: (B, T, C) ln1-normalized input; shift/aa/bb/pp: (B, C).
    Returns (out, new_aa, new_bb, new_pp); out is the att.output projection
    input r*wkv already projected."""
    x_prev = _shifted(xn, shift)
    xk = _mix(xn, x_prev, layer["tm_k"])
    xv = _mix(xn, x_prev, layer["tm_v"])
    xr = _mix(xn, x_prev, layer["tm_r"])

    r = jax.nn.sigmoid(
        linear.matmul(xr, layer["wr"]).astype(jnp.float32))   # (B, T, C)
    k = linear.matmul(xk, layer["wk"]).astype(jnp.float32)
    v = linear.matmul(xv, layer["wv"]).astype(jnp.float32)

    first = layer["first"].astype(jnp.float32)   # (C,)
    decay = layer["decay"].astype(jnp.float32)   # (C,) == -exp(w), additive

    def step(carry, inp):
        aa_t, bb_t, pp_t = carry
        k_t, v_t, valid_t = inp                   # (B, C) x2, (B,)
        # wkv output (rwkv_att_wkv :944-955)
        ww = first + k_t
        qq = jnp.maximum(pp_t, ww)
        e1 = jnp.exp(pp_t - qq)
        e2 = jnp.exp(ww - qq)
        y_t = (e1 * aa_t + e2 * v_t) / (e1 * bb_t + e2)
        # state update (:958-976)
        ww2 = pp_t + decay
        qq2 = jnp.maximum(ww2, k_t)
        e1 = jnp.exp(ww2 - qq2)
        e2 = jnp.exp(k_t - qq2)
        keep = valid_t[:, None]
        carry = (jnp.where(keep, e1 * aa_t + e2 * v_t, aa_t),
                 jnp.where(keep, e1 * bb_t + e2, bb_t),
                 jnp.where(keep, qq2, pp_t))
        return carry, y_t

    (aa, bb, pp), ys = jax.lax.scan(
        step, (aa, bb, pp),
        (k.transpose(1, 0, 2), v.transpose(1, 0, 2), valid.T))
    wkv = ys.transpose(1, 0, 2)                   # (B, T, C)
    out = linear.matmul((r * wkv).astype(xn.dtype), layer["wo"])
    return out, aa, bb, pp


def _channel_mix(xn, layer, shift):
    """rwkv_ffn (:1045-1073): r = sigmoid(rw@xr); k = relu(kw@xk)^2;
    out = r * (vw@k)."""
    x_prev = _shifted(xn, shift)
    xk = _mix(xn, x_prev, layer["cm_k"])
    xr = _mix(xn, x_prev, layer["cm_r"])
    r = jax.nn.sigmoid(linear.matmul(xr, layer["cr"]).astype(jnp.float32))
    k = jnp.square(jax.nn.relu(
        linear.matmul(xk, layer["ck"]).astype(jnp.float32))).astype(xn.dtype)
    return (r * linear.matmul(k, layer["cv"]).astype(jnp.float32)
            ).astype(xn.dtype)


def forward(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
            positions: jnp.ndarray, cache: RWKV4State,
            last_only: bool = False,
            last_index: jnp.ndarray | None = None
            ) -> tuple[jnp.ndarray, RWKV4State]:
    """tokens/positions: (B, T) int32; rows with position < 0 are padding
    (right-padded) and do not advance the state."""
    B, T = tokens.shape
    valid = positions >= 0
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=1)

    emb_w = params["tok_embd"]
    x = emb_w.data["w"][tokens] if isinstance(emb_w, QTensor) else emb_w[tokens]
    # ln0 applied once to the embedding (serial graph, rwkv_v3.cpp:1640-1652)
    x = layer_norm(x, params["tok_norm"], params["tok_norm_b"], LN_EPS)

    new_att, new_ffn, new_aa, new_bb, new_pp = [], [], [], [], []
    for li, layer in enumerate(params["layers"]):
        xn_att = layer_norm(x, layer["ln1"], layer["ln1_b"], LN_EPS)
        out, aa, bb, pp = _time_mix(xn_att, layer, cache.att_shift[li],
                                    cache.aa[li], cache.bb[li], cache.pp[li],
                                    valid)
        x = x + out.astype(x.dtype)
        new_att.append(_last_valid_row(xn_att, n_valid).astype(jnp.float32))
        new_aa.append(aa)
        new_bb.append(bb)
        new_pp.append(pp)

        xn_ffn = layer_norm(x, layer["ln2"], layer["ln2_b"], LN_EPS)
        x = x + _channel_mix(xn_ffn, layer, cache.ffn_shift[li]).astype(x.dtype)
        new_ffn.append(_last_valid_row(xn_ffn, n_valid).astype(jnp.float32))

    state = RWKV4State(att_shift=jnp.stack(new_att),
                       ffn_shift=jnp.stack(new_ffn),
                       aa=jnp.stack(new_aa), bb=jnp.stack(new_bb),
                       pp=jnp.stack(new_pp))

    if last_index is not None:
        x = x[jnp.arange(B), last_index][:, None, :]
    elif last_only:
        x = x[:, -1:, :]
    x = layer_norm(x, params["output_norm"], params["output_norm_b"], LN_EPS)
    logits = linear.matmul(x, params["output"], out_dtype=jnp.float32)
    return logits, state


def load_params(reader, cfg: ModelConfig, packed: bool = True,
                dtype=jnp.bfloat16) -> Params:
    """Reader tensor names are the rwkv6-style GGUF translations emitted by
    gguf/legacy.py's LegacyRwkvReader (original .bin names per rwkv_set_params,
    /root/reference/otherarch/rwkv_v3.cpp:747-789)."""
    import numpy as np

    def qt(name):
        info = reader.tensors[name]
        return linear.from_gguf(reader.tensor_raw(name), info.ggml_type,
                                info.shape, packed=packed, dtype=dtype)

    def dense(name, flat=False):
        a = np.asarray(reader.tensor_data(name), np.float32)
        return jnp.asarray(a.reshape(-1) if flat else a)

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
        "output": qt("output.weight"),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        layer = {
            "ln1": dense(p + "attn_norm.weight"),
            "ln1_b": dense(p + "attn_norm.bias"),
            "ln2": dense(p + "attn_norm_2.weight"),
            "ln2_b": dense(p + "attn_norm_2.bias"),
            "tm_k": dense(p + "time_mix_lerp_k.weight", flat=True),
            "tm_v": dense(p + "time_mix_lerp_v.weight", flat=True),
            "tm_r": dense(p + "time_mix_lerp_r.weight", flat=True),
            "first": dense(p + "time_mix_first.weight", flat=True),
            "decay": dense(p + "time_mix_decay.weight", flat=True),
            "wk": qt(p + "time_mix_key.weight"),
            "wv": qt(p + "time_mix_value.weight"),
            "wr": qt(p + "time_mix_receptance.weight"),
            "wo": qt(p + "time_mix_output.weight"),
            "cm_k": dense(p + "channel_mix_lerp_k.weight", flat=True),
            "cm_r": dense(p + "channel_mix_lerp_r.weight", flat=True),
            "ck": qt(p + "channel_mix_key.weight"),
            "cr": qt(p + "channel_mix_receptance.weight"),
            "cv": qt(p + "channel_mix_value.weight"),
        }
        params["layers"].append(layer)
    return params
