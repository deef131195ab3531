"""HF PEFT LoRA -> GGUF adapter converter.

Counterpart of the reference's convert_lora_to_gguf.py: maps PEFT tensor names
(base_model.model.model.layers.N.self_attn.q_proj.lora_A.weight) to GGUF
adapter pairs (blk.N.attn_q.weight.lora_a / .lora_b) with adapter.type=lora
metadata (src/llama.cpp:18776-18795 load contract). For llama-family q/k
projections the base converter permutes weight ROWS into adjacent-pair rope
order, so lora_b's rows get the same permute (lora_a multiplies the input and
is unchanged).

Usage: python convert_lora.py adapter_dir_or_file out.gguf [--arch llama]
       [--nhead N] [--nkvhead N]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from koboldcpp_tpu.gguf.writer import GGUFWriter  # noqa: E402
from convert_hf import permute_qk  # noqa: E402

# PEFT module name -> (gguf base tensor, needs_qk_permute)
_PROJ_MAP = {
    "self_attn.q_proj": ("attn_q.weight", "q"),
    "self_attn.k_proj": ("attn_k.weight", "k"),
    "self_attn.v_proj": ("attn_v.weight", None),
    "self_attn.o_proj": ("attn_output.weight", None),
    "mlp.gate_proj": ("ffn_gate.weight", None),
    "mlp.up_proj": ("ffn_up.weight", None),
    "mlp.down_proj": ("ffn_down.weight", None),
}


def _load_peft_state(path: str) -> tuple[dict, dict]:
    """Returns (state_dict, adapter_config). Accepts a PEFT directory or a
    single .safetensors/.bin file."""
    cfg = {}
    if os.path.isdir(path):
        cfg_path = os.path.join(path, "adapter_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
        for cand in ("adapter_model.safetensors", "adapter_model.bin"):
            fp = os.path.join(path, cand)
            if os.path.exists(fp):
                path = fp
                break
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path), cfg
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}, cfg


def convert_peft_lora(path: str, out_path: str, arch: str = "llama",
                      n_head: int | None = None,
                      n_kv_head: int | None = None,
                      permute: bool = True) -> str:
    state, cfg = _load_peft_state(path)
    alpha = float(cfg.get("lora_alpha", 0.0))
    w = GGUFWriter(out_path, architecture=arch)
    w.add("general.type", "adapter")
    w.add("adapter.type", "lora")
    w.add("adapter.lora.alpha", np.float32(alpha))

    for key, val in state.items():
        val = np.asarray(val, dtype=np.float32)
        # base_model.model.<hf path>.lora_A.weight
        if ".lora_A." in key:
            kind, hf = "a", key.split(".lora_A.")[0]
        elif ".lora_B." in key:
            kind, hf = "b", key.split(".lora_B.")[0]
        else:
            continue
        hf = hf.replace("base_model.model.", "")
        parts = hf.split(".")
        try:
            li = parts.index("layers")
            layer = int(parts[li + 1])
            proj = ".".join(parts[li + 2:])
        except (ValueError, IndexError):
            print(f"skip (unmapped): {key}")
            continue
        mapped = _PROJ_MAP.get(proj)
        if mapped is None:
            print(f"skip (unmapped proj): {key}")
            continue
        base, qk = mapped
        if kind == "b" and qk is not None and permute and arch == "llama":
            heads = n_head if qk == "q" else (n_kv_head or n_head)
            if heads:
                val = permute_qk(val, heads)
        w.add_tensor(f"blk.{layer}.{base}.lora_{kind}", val)
    w.write()
    return out_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("adapter", help="PEFT adapter dir or safetensors/bin file")
    p.add_argument("out", help="output GGUF adapter path")
    p.add_argument("--arch", default="llama")
    p.add_argument("--nhead", type=int, default=None,
                   help="attention heads (needed to permute llama q lora_b)")
    p.add_argument("--nkvhead", type=int, default=None)
    p.add_argument("--no-permute", action="store_true")
    a = p.parse_args()
    convert_peft_lora(a.adapter, a.out, arch=a.arch, n_head=a.nhead,
                      n_kv_head=a.nkvhead, permute=not a.no_permute)


if __name__ == "__main__":
    main()
