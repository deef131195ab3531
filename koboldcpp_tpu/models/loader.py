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


class LoraAdapter:
    """GGUF LoRA adapter (llama_lora_adapter_init_internal,
    /root/reference/src/llama.cpp:18740-18882): general.type=="adapter",
    adapter.type=="lora", tensor pairs `<base>.lora_a` (r, in) /
    `<base>.lora_b` (out, r), merged as W + mult * (alpha/r) * B @ A.
    The reference applies A/B at eval time; on TPU we merge at load so the
    hot path stays a single fused matmul (affected tensors become dense)."""

    def __init__(self, path: str, multiplier: float = 1.0):
        self.multiplier = multiplier
        self.pairs: dict[str, dict[str, np.ndarray]] = {}
        with GGUFReader(path) as r:
            md = r.metadata
            gtype = str(md.get("general.type", ""))
            if gtype != "adapter":
                raise ValueError(f"expected general.type 'adapter', got {gtype!r}")
            atype = str(md.get("adapter.type", ""))
            if atype != "lora":
                raise ValueError(f"expected adapter.type 'lora', got {atype!r}")
            a = md.get("adapter.lora.alpha", 0.0)
            self.alpha = float(a.item() if hasattr(a, "item") else a or 0.0)
            for name in r.tensors:
                if name.endswith(".lora_a"):
                    self.pairs.setdefault(name[:-7], {})["a"] = np.asarray(
                        r.tensor_data(name), np.float32)
                elif name.endswith(".lora_b"):
                    self.pairs.setdefault(name[:-7], {})["b"] = np.asarray(
                        r.tensor_data(name), np.float32)
                else:
                    raise ValueError(f"LoRA tensor {name!r} has unexpected suffix")
        for base, p in self.pairs.items():
            if "a" not in p or "b" not in p:
                raise ValueError(f"LoRA pair for {base!r} missing a component")

    def delta(self, name: str) -> np.ndarray | None:
        p = self.pairs.get(name)
        if p is None:
            return None
        a, b = p["a"], p["b"]  # (r, in), (out, r)
        rank = a.shape[0]
        scale = self.multiplier * (self.alpha / rank if self.alpha else 1.0)
        return scale * (b @ a)


def load_params(reader: GGUFReader, cfg: ModelConfig, packed: bool = True,
                dtype=jnp.bfloat16,
                loras: list[LoraAdapter] | None = None) -> Params:
    names = set(reader.tensors)
    lora_names = set()
    for ad in loras or ():
        lora_names |= set(ad.pairs)

    def _merged_dense(tensor_name: str):
        """Dequantized base weight + all adapter deltas, as a dense QTensor."""
        info = reader.tensors[tensor_name]
        w = np.asarray(linear.from_gguf(
            reader.tensor_raw(tensor_name), info.ggml_type, info.shape,
            packed=False, dtype=jnp.float32).data["w"], np.float32)
        for ad in loras or ():
            d = ad.delta(tensor_name)
            if d is not None:
                if d.shape != w.shape:
                    raise ValueError(
                        f"LoRA delta shape {d.shape} != {w.shape} for {tensor_name}")
                w = w + d
        return linear.dense(w, dtype=dtype)

    def qt(tensor_name: str):
        if tensor_name in lora_names:
            return _merged_dense(tensor_name)
        return _load_tensor(reader, tensor_name, packed, dtype)

    def opt(layer: dict, key: str, tensor_name: str, kind: str):
        if tensor_name in names:
            if kind == "qt":
                layer[key] = qt(tensor_name)
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
    if "token_embd_norm.weight" in names:  # bloom embedding layernorm
        params["tok_norm"] = _load_dense(reader, "token_embd_norm.weight")
        if "token_embd_norm.bias" in names:
            params["tok_norm_bias"] = _load_dense(reader, "token_embd_norm.bias")
    if "output.weight" in names:
        params["output"] = qt("output.weight")
        if "output.bias" in names:  # phi2 lm_head bias
            params["output_bias"] = _load_dense(reader, "output.bias")
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
        if any(n in lora_names for n in names_in):
            return linear.dense(np.concatenate(
                [np.asarray(_merged_dense(n).data["w"], np.float32)
                 for n in names_in], axis=0), dtype=dtype)
        raw = np.concatenate([reader.tensor_raw(n) for n in names_in], axis=0)
        out_rows = sum(i.shape[0] for i in infos)
        return linear.from_gguf(raw, infos[0].ggml_type,
                                (out_rows, infos[0].shape[1]),
                                packed=packed, dtype=dtype)

    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        layer: dict[str, Any] = {
            "attn_norm": _load_dense(reader, p + "attn_norm.weight"),
            "wo": qt(p + "attn_output.weight"),
        }
        if p + "ffn_norm.weight" in names:  # absent for plamo (one shared norm)
            layer["ffn_norm"] = _load_dense(reader, p + "ffn_norm.weight")
        # bitnet carries per-projection scalar weight scales; fusing would
        # merge differently-scaled projections, so keep them split
        has_scales = p + "attn_q.scale" in names or p + "ffn_up.scale" in names
        if p + "attn_qkv.weight" in names:  # phi3-style pre-fused projection
            layer["wqkv"] = qt(p + "attn_qkv.weight")
        else:
            qkv = None if has_scales else fused(
                [p + "attn_q.weight", p + "attn_k.weight", p + "attn_v.weight"])
            if qkv is not None:
                layer["wqkv"] = qkv
            else:
                layer["wq"] = qt(p + "attn_q.weight")
                layer["wk"] = qt(p + "attn_k.weight")
                layer["wv"] = qt(p + "attn_v.weight")
        for key, tname in (("attn_post_norm", "attn_post_norm.weight"),
                           ("ffn_post_norm", "ffn_post_norm.weight"),
                           ("attn_q_norm", "attn_q_norm.weight"),
                           ("attn_k_norm", "attn_k_norm.weight"),
                           ("attn_q_norm_bias", "attn_q_norm.bias"),
                           ("attn_k_norm_bias", "attn_k_norm.bias"),
                           # grok rms post-norms (build_grok :11045,:11076)
                           ("attn_post_norm", "attn_output_norm.weight"),
                           ("ffn_post_norm", "layer_output_norm.weight"),
                           # bitnet sub-norms + scales (build_bitnet)
                           ("attn_sub_norm", "attn_sub_norm.weight"),
                           ("ffn_sub_norm", "ffn_sub_norm.weight"),
                           ("wq_scale", "attn_q.scale"),
                           ("wk_scale", "attn_k.scale"),
                           ("wv_scale", "attn_v.scale"),
                           ("wo_scale", "attn_output.scale"),
                           ("ffn_gate_scale", "ffn_gate.scale"),
                           ("ffn_up_scale", "ffn_up.scale"),
                           ("ffn_down_scale", "ffn_down.scale"),
                           # arctic residual-MoE norm (build_arctic :14750)
                           ("ffn_norm_exps", "ffn_norm_exps.weight")):
            opt(layer, key, p + tname, "dense")
        for key, tname in (("bq", "attn_q.bias"), ("bk", "attn_k.bias"),
                           ("bv", "attn_v.bias"), ("bqkv", "attn_qkv.bias"),
                           ("bo", "attn_output.bias"),
                           ("b_gate", "ffn_gate.bias"),  # jais
                           ("b_up", "ffn_up.bias"), ("b_down", "ffn_down.bias"),
                           ("attn_norm_bias", "attn_norm.bias"),
                           ("ffn_norm_bias", "ffn_norm.bias")):
            opt(layer, key, p + tname, "dense")
        if p + "ffn_gate_inp.weight" in names:  # MoE block
            layer["ffn_gate_inp"] = qt(p + "ffn_gate_inp.weight")
            # qwen2moe shared expert (always-on, sigmoid-gated)
            for key, tname in (("ffn_gate_shexp", "ffn_gate_shexp.weight"),
                               ("ffn_up_shexp", "ffn_up_shexp.weight"),
                               ("ffn_down_shexp", "ffn_down_shexp.weight"),
                               ("ffn_gate_inp_shexp", "ffn_gate_inp_shexp.weight")):
                opt(layer, key, p + tname, "qt")
            for key, tname in (("ffn_gate_exps", "ffn_gate_exps.weight"),
                               ("ffn_up_exps", "ffn_up_exps.weight"),
                               ("ffn_down_exps", "ffn_down_exps.weight")):
                # 3-D expert stacks load dense for now (EP sharding later)
                info = reader.tensors[p + tname]
                layer[key] = linear.from_gguf(reader.tensor_raw(p + tname),
                                              info.ggml_type, info.shape, packed=False, dtype=dtype)
        # dense FFN (also alongside MoE for arctic's residual-MoE layers)
        if p + "ffn_up.weight" in names:
            up_info = reader.tensors.get(p + "ffn_up.weight")
            if (p + "ffn_gate.weight" not in names and up_info is not None
                    and up_info.shape[0] == 2 * cfg.intermediate_size
                    and cfg.ffn_gated):
                # phi3/chatglm-style pre-fused [gate; up]
                layer["w_gateup"] = qt(p + "ffn_up.weight")
            elif p + "ffn_gate.weight" in names:
                gu = None
                if not has_scales and p + "ffn_gate.bias" not in names:
                    gu = fused([p + "ffn_gate.weight", p + "ffn_up.weight"])
                if gu is not None:
                    layer["w_gateup"] = gu
                else:
                    layer["w_gate"] = qt(p + "ffn_gate.weight")
                    layer["w_up"] = qt(p + "ffn_up.weight")
            else:
                layer["w_up"] = qt(p + "ffn_up.weight")
            layer["w_down"] = qt(p + "ffn_down.weight")
        params["layers"].append(layer)
    return params


class Model:
    """Loaded model bundle: config + params + tokenizer."""

    def __init__(self, cfg: ModelConfig, params: Params, tokenizer: Tokenizer):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer


def load_model(path: str, packed: bool = True, dtype=jnp.bfloat16,
               loras: list[tuple[str, float]] | None = None) -> Model:
    """loras: [(adapter_gguf_path, multiplier), ...] merged into the base
    weights at load (lora_filename/lora_multiplier, expose.h:132-133)."""
    from ..gguf.sniff import FileFormat, check_file_format, describe_or_raise

    describe_or_raise(path)  # precise error for unsupported containers
    adapters = [LoraAdapter(lp, mult) for lp, mult in (loras or [])]
    fmt = check_file_format(path)
    if fmt is not FileFormat.GGUF:
        # legacy pre-GGUF containers (gguf/legacy.py)
        from ..gguf import legacy

        if fmt in legacy.LEGACY_OTHERARCH_FORMATS:
            _Reader = legacy.LegacyOtherArchReader
        elif fmt in legacy.LEGACY_RWKV_FORMATS:
            _Reader = legacy.LegacyRwkvReader
        else:
            _Reader = legacy.LegacyLlamaReader
    else:
        from ..gguf.reader import open_gguf

        _Reader = open_gguf  # transparently merges gguf-split shard sets
    with _Reader(path) as r:
        cfg = config_from_metadata(r.metadata)
        tokenizer = Tokenizer.from_metadata(r.metadata)
        if cfg.arch in ("bert", "nomic-bert", "jina-bert-v2"):
            from . import bert

            params = bert.load_params(r, cfg, packed=packed, dtype=dtype)
        elif cfg.arch == "t5encoder":
            from . import t5

            params = t5.load_params(r, cfg, packed=packed, dtype=dtype)
        elif cfg.arch == "mamba":
            from . import mamba

            params = mamba.load_params(r, cfg, packed=packed, dtype=dtype)
        elif cfg.arch in ("deepseek2", "minicpm3"):
            from . import deepseek2

            params = deepseek2.load_params(r, cfg, packed=packed, dtype=dtype)
        elif cfg.arch == "t5":
            from . import t5

            params = t5.load_params(r, cfg, packed=packed, dtype=dtype)
        elif cfg.arch == "rwkv6":
            from . import rwkv6

            params = rwkv6.load_params(r, cfg, packed=packed, dtype=dtype)
        elif cfg.arch == "rwkv4":
            from . import rwkv4

            params = rwkv4.load_params(r, cfg, packed=packed, dtype=dtype)
        else:
            params = load_params(r, cfg, packed=packed, dtype=dtype,
                                 loras=adapters or None)
    return Model(cfg, params, tokenizer)
