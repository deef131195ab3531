"""GGUF -> device params loader.

Counterpart of llama_model_loader + gpttype_load_model
(/root/reference/src/llama.cpp:4358, /root/reference/gpttype_adapter.cpp:1642):
maps llama.cpp tensor names into the params pytree consumed by models/llama.py,
keeping supported 2-D weights packed (QTensor) for the fused Pallas kernels.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFReader
from ..gguf.constants import GGMLType
from ..ops import linear
from ..tokenizers import Tokenizer
from .config import ModelConfig, config_from_metadata

Params = dict[str, Any]


def _load_tensor(reader: GGUFReader, name: str, packed: bool, dtype=jnp.bfloat16):
    info = reader.tensors[name]
    raw = reader.tensor_raw(name)
    return linear.from_gguf(raw, info.ggml_type, info.shape, packed=packed, dtype=dtype)


def _load_dense(reader: GGUFReader, name: str, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(reader.tensor_data(name), dtype=dtype)


def load_params(reader: GGUFReader, cfg: ModelConfig, packed: bool = True,
                dtype=jnp.bfloat16) -> Params:
    names = set(reader.tensors)

    def opt(layer: dict, key: str, tensor_name: str, kind: str):
        if tensor_name in names:
            if kind == "qt":
                layer[key] = _load_tensor(reader, tensor_name, packed, dtype)
            else:
                layer[key] = _load_dense(reader, tensor_name)

    # embeddings stay dense (token gather) in bf16
    tok_embd_info = reader.tensors["token_embd.weight"]
    tok_embd = linear.from_gguf(reader.tensor_raw("token_embd.weight"),
                                tok_embd_info.ggml_type, tok_embd_info.shape,
                                packed=False, dtype=dtype)
    params: Params = {
        "tok_embd": tok_embd,
        "output_norm": _load_dense(reader, "output_norm.weight"),
        "layers": [],
    }
    if "output_norm.bias" in names:
        params["output_norm_bias"] = _load_dense(reader, "output_norm.bias")
    if "position_embd.weight" in names:  # gpt2 learned positions
        params["pos_embd"] = _load_dense(reader, "position_embd.weight")
    if "output.weight" in names:
        params["output"] = _load_tensor(reader, "output.weight", packed, dtype)
    else:  # tied embeddings
        params["output"] = tok_embd

    def fused(names_in: list[str]) -> Any | None:
        """Row-concatenate same-type same-width tensors into one QTensor
        (single fused kernel launch per projection group)."""
        infos = [reader.tensors[n] for n in names_in]
        if len({i.ggml_type for i in infos}) != 1:
            return None
        if len({i.shape[1] for i in infos}) != 1:
            return None
        raw = np.concatenate([reader.tensor_raw(n) for n in names_in], axis=0)
        out_rows = sum(i.shape[0] for i in infos)
        return linear.from_gguf(raw, infos[0].ggml_type,
                                (out_rows, infos[0].shape[1]),
                                packed=packed, dtype=dtype)

    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        layer: dict[str, Any] = {
            "attn_norm": _load_dense(reader, p + "attn_norm.weight"),
            "wo": _load_tensor(reader, p + "attn_output.weight", packed, dtype),
            "ffn_norm": _load_dense(reader, p + "ffn_norm.weight"),
        }
        if p + "attn_qkv.weight" in names:  # phi3-style pre-fused projection
            layer["wqkv"] = _load_tensor(reader, p + "attn_qkv.weight", packed, dtype)
        else:
            qkv = fused([p + "attn_q.weight", p + "attn_k.weight", p + "attn_v.weight"])
            if qkv is not None:
                layer["wqkv"] = qkv
            else:
                layer["wq"] = _load_tensor(reader, p + "attn_q.weight", packed, dtype)
                layer["wk"] = _load_tensor(reader, p + "attn_k.weight", packed, dtype)
                layer["wv"] = _load_tensor(reader, p + "attn_v.weight", packed, dtype)
        for key, tname in (("attn_post_norm", "attn_post_norm.weight"),
                           ("ffn_post_norm", "ffn_post_norm.weight")):
            opt(layer, key, p + tname, "dense")
        for key, tname in (("bq", "attn_q.bias"), ("bk", "attn_k.bias"),
                           ("bv", "attn_v.bias"), ("bqkv", "attn_qkv.bias"),
                           ("bo", "attn_output.bias"),
                           ("b_up", "ffn_up.bias"), ("b_down", "ffn_down.bias"),
                           ("attn_norm_bias", "attn_norm.bias"),
                           ("ffn_norm_bias", "ffn_norm.bias")):
            opt(layer, key, p + tname, "dense")
        if p + "ffn_gate_inp.weight" in names:  # MoE block
            layer["ffn_gate_inp"] = _load_tensor(reader, p + "ffn_gate_inp.weight", packed, dtype)
            for key, tname in (("ffn_gate_exps", "ffn_gate_exps.weight"),
                               ("ffn_up_exps", "ffn_up_exps.weight"),
                               ("ffn_down_exps", "ffn_down_exps.weight")):
                # 3-D expert stacks load dense for now (EP sharding later)
                info = reader.tensors[p + tname]
                layer[key] = linear.from_gguf(reader.tensor_raw(p + tname),
                                              info.ggml_type, info.shape, packed=False, dtype=dtype)
        else:
            up_info = reader.tensors.get(p + "ffn_up.weight")
            if (p + "ffn_gate.weight" not in names and up_info is not None
                    and up_info.shape[0] == 2 * cfg.intermediate_size):
                # phi3-style pre-fused [gate; up]
                layer["w_gateup"] = _load_tensor(reader, p + "ffn_up.weight",
                                                 packed, dtype)
            elif p + "ffn_gate.weight" in names:
                gu = fused([p + "ffn_gate.weight", p + "ffn_up.weight"])
                if gu is not None:
                    layer["w_gateup"] = gu
                else:
                    layer["w_gate"] = _load_tensor(reader, p + "ffn_gate.weight", packed, dtype)
                    layer["w_up"] = _load_tensor(reader, p + "ffn_up.weight", packed, dtype)
            else:
                layer["w_up"] = _load_tensor(reader, p + "ffn_up.weight", packed, dtype)
            layer["w_down"] = _load_tensor(reader, p + "ffn_down.weight", packed, dtype)
        params["layers"].append(layer)
    return params


class Model:
    """Loaded model bundle: config + params + tokenizer."""

    def __init__(self, cfg: ModelConfig, params: Params, tokenizer: Tokenizer):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer


def load_model(path: str, packed: bool = True, dtype=jnp.bfloat16) -> Model:
    with GGUFReader(path) as r:
        cfg = config_from_metadata(r.metadata)
        tokenizer = Tokenizer.from_metadata(r.metadata)
        params = load_params(r, cfg, packed=packed, dtype=dtype)
    return Model(cfg, params, tokenizer)
