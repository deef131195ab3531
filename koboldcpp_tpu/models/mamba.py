"""Mamba (selective state-space) forward pass in JAX.

Counterpart of the reference's llm_build_mamba
(/root/reference/src/llama.cpp:9717-9845) + the ggml_ssm_conv / ggml_ssm_scan
ops (/root/reference/ggml/src/ggml.c:16308: softplus(dt) happens INSIDE the
scan op; ssm_a is stored as -exp(A_log) by the converter,
/root/reference/convert_hf_to_gguf.py:2975). TPU-first design notes:

- the depthwise causal conv is 4 shifted multiplies (K is tiny), not a conv op;
- the selective scan runs as lax.scan over time with the (B, d_inner, d_state)
  state as carry — a recurrence XLA can't parallelize, but per-step work is
  pure VPU elementwise so decode cost is dominated by the matmuls anyway;
- padding rows (position < 0) carry state through unchanged, so the engine can
  right-pad chunks to its static bucket shapes.

State reuse rules (full-prefix match only, no rewind) live in the engine;
see kv/recurrent.py.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..kv.recurrent import MambaState, init_mamba_state
from ..ops import linear
from ..ops.linear import QTensor
from ..ops.norms import rms_norm
from .config import ModelConfig

Params = dict[str, Any]


def init_state(cfg: ModelConfig, batch: int) -> MambaState:
    return init_mamba_state(cfg.n_layers, batch, cfg.ssm_d_inner,
                            cfg.ssm_d_conv, cfg.ssm_d_state)


def _mamba_mixer(x: jnp.ndarray, layer: Params, cfg: ModelConfig,
                 conv_state: jnp.ndarray, ssm_state: jnp.ndarray,
                 valid: jnp.ndarray):
    """One Mamba mixer over a chunk. x: (B, T, C) f32; conv_state:
    (B, d_inner, K-1); ssm_state: (B, d_inner, N); valid: (B, T) bool.
    Returns (out (B,T,C), new_conv_state, new_ssm_state)."""
    B, T, _ = x.shape
    K = cfg.ssm_d_conv
    d_inner = cfg.ssm_d_inner
    d_state = cfg.ssm_d_state
    dt_rank = cfg.ssm_dt_rank

    xz = linear.matmul(x, layer["ssm_in"])  # (B, T, 2*d_inner)
    xs, z = xz[..., :d_inner], xz[..., d_inner:]

    # depthwise causal conv over time. Invalid rows must not contribute:
    # zero their inputs (they sit AFTER all valid rows, so windows of valid
    # outputs never see them).
    xs = jnp.where(valid[..., None], xs, 0.0)
    xcols = xs.transpose(0, 2, 1)  # (B, d_inner, T)
    conv_x = jnp.concatenate([conv_state.astype(xcols.dtype), xcols], axis=-1)
    w = layer["ssm_conv1d"].astype(conv_x.dtype)  # (d_inner, K)
    y = jnp.zeros((B, d_inner, T), conv_x.dtype)
    for k in range(K):
        y = y + w[None, :, k, None] * jax.lax.dynamic_slice_in_dim(
            conv_x, k, T, axis=-1)
    y = y + layer["ssm_conv1d_b"].astype(y.dtype)[None, :, None]
    xc = jax.nn.silu(y.astype(jnp.float32)).transpose(0, 2, 1)  # (B, T, d_inner)

    # new conv state = last K-1 input columns ending at the last VALID row
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=1)  # (B,)
    idx = n_valid[:, None] + jnp.arange(K - 1)[None, :]  # (B, K-1) into conv_x
    new_conv = jnp.take_along_axis(conv_x, idx[:, None, :], axis=-1)

    # ssm projections
    x_db = linear.matmul(xc.astype(x.dtype), layer["ssm_x"]).astype(jnp.float32)
    dt = x_db[..., :dt_rank]
    Bm = x_db[..., dt_rank:dt_rank + d_state]
    Cm = x_db[..., dt_rank + d_state:]
    if cfg.ssm_dt_b_c_rms:  # FalconMamba normalizes dt/B/C
        ones = jnp.ones((), jnp.float32)
        dt = rms_norm(dt, jnp.broadcast_to(ones, (dt_rank,)), cfg.rms_norm_eps)
        Bm = rms_norm(Bm, jnp.broadcast_to(ones, (d_state,)), cfg.rms_norm_eps)
        Cm = rms_norm(Cm, jnp.broadcast_to(ones, (d_state,)), cfg.rms_norm_eps)
    dt = (linear.matmul(dt.astype(x.dtype), layer["ssm_dt"]).astype(jnp.float32)
          + layer["ssm_dt_b"].astype(jnp.float32))
    dt = jax.nn.softplus(dt)  # (B, T, d_inner); ggml does this inside ssm_scan

    A = layer["ssm_a"].astype(jnp.float32)  # (d_inner, d_state), already -exp
    dA = jnp.exp(dt[..., None] * A[None, None])  # (B, T, d_inner, N)
    dBx = (dt * xc)[..., None] * Bm[:, :, None, :]  # (B, T, d_inner, N)

    def step(h, inp):
        dA_t, dBx_t, C_t, v_t = inp
        h_new = h * dA_t + dBx_t
        h = jnp.where(v_t[:, None, None], h_new, h)
        y_t = jnp.einsum("bdn,bn->bd", h, C_t)
        return h, y_t

    h, ys = jax.lax.scan(
        step, ssm_state,
        (dA.transpose(1, 0, 2, 3), dBx.transpose(1, 0, 2, 3),
         Cm.transpose(1, 0, 2), valid.T))
    ys = ys.transpose(1, 0, 2)  # (B, T, d_inner)

    ys = ys + xc * layer["ssm_d"].astype(jnp.float32)[None, None]
    ys = ys * jax.nn.silu(z.astype(jnp.float32))
    out = linear.matmul(ys.astype(x.dtype), layer["ssm_out"])
    return out, new_conv, h


def forward(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
            positions: jnp.ndarray, cache: MambaState,
            last_only: bool = False,
            last_index: jnp.ndarray | None = None
            ) -> tuple[jnp.ndarray, MambaState]:
    """tokens/positions: (B, T) int32 (positions only flag validity: rows with
    position < 0 are padding and do not advance the state). Returns
    (logits f32, updated state)."""
    B, T = tokens.shape
    valid = positions >= 0

    emb_w = params["tok_embd"]
    x = emb_w.data["w"][tokens] if isinstance(emb_w, QTensor) else emb_w[tokens]

    new_conv = []
    new_ssm = []
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
        out, conv_li, ssm_li = _mamba_mixer(
            h, layer, cfg, cache.conv[li], cache.ssm[li], valid)
        new_conv.append(conv_li)
        new_ssm.append(ssm_li)
        x = x + out.astype(x.dtype)

    state = MambaState(conv=jnp.stack(new_conv), ssm=jnp.stack(new_ssm))

    if last_index is not None:
        x = x[jnp.arange(B), last_index][:, None, :]
    elif last_only:
        x = x[:, -1:, :]
    x = rms_norm(x, params["output_norm"], cfg.rms_norm_eps)
    logits = linear.matmul(x, params["output"], out_dtype=jnp.float32)
    return logits, state


def load_params(reader, cfg: ModelConfig, packed: bool = True,
                dtype=jnp.bfloat16) -> Params:
    """GGUF -> params for the mamba arch (tensor names per
    /root/reference/gguf-py/gguf/constants.py:443-449)."""
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
        "output_norm": dense("output_norm.weight"),
        "output": qt("output.weight") if "output.weight" in names else tok_embd,
        "layers": [],
    }
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        params["layers"].append({
            "attn_norm": dense(p + "attn_norm.weight"),
            "ssm_in": qt(p + "ssm_in.weight"),
            "ssm_conv1d": dense(p + "ssm_conv1d.weight"),
            "ssm_conv1d_b": dense(p + "ssm_conv1d.bias"),
            "ssm_x": qt(p + "ssm_x.weight"),
            "ssm_dt": qt(p + "ssm_dt.weight"),
            "ssm_dt_b": dense(p + "ssm_dt.bias"),
            "ssm_a": dense(p + "ssm_a"),
            "ssm_d": dense(p + "ssm_d"),
            "ssm_out": qt(p + "ssm_out.weight"),
        })
    return params
