"""Diffusers-PEFT SD LoRA -> GGUF adapter converter.

Counterpart of the reference's SD-LoRA path (stable-diffusion.cpp lora
application, used via --sdlora in /root/reference/koboldcpp.py and
otherarch/sdcpp): takes a LoRA state dict with diffusers-PEFT keys
(`unet.<path>.lora_A.weight` / `.lora_B.weight`,
`text_encoder.text_model.encoder.layers.N...`) and writes a GGUF adapter in
our tensor namespace (UNet keeps diffusers names; text encoder maps to the
compact text.* names of tools/convert_sd.py). Merged at SD load by
models/sd.py:apply_sd_lora as W + mult * (alpha/r) * B @ A.
"""
from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from koboldcpp_tpu.gguf import GGMLType, GGUFWriter  # noqa: E402

_TEXT_MAP = {"self_attn.q_proj": "q", "self_attn.k_proj": "k",
             "self_attn.v_proj": "v", "self_attn.out_proj": "out",
             "mlp.fc1": "fc1", "mlp.fc2": "fc2"}


def map_lora_base(key: str) -> str | None:
    """LoRA key prefix (without .lora_A/.lora_B) -> our tensor name."""
    if key.startswith("unet."):
        return key[len("unet."):] + ".weight"
    m = re.match(r"text_encoder\.text_model\.encoder\.layers\.(\d+)\.(.+)", key)
    if m and m.group(2) in _TEXT_MAP:
        return f"text.{m.group(1)}.{_TEXT_MAP[m.group(2)]}.weight"
    return None


def convert_sd_lora_state_dict(state: dict, out_path: str,
                               alpha: float = 0.0):
    """state: diffusers-PEFT LoRA dict (numpy arrays). Non-2D (conv) pairs
    and unmappable keys are skipped with a warning."""
    pairs: dict[str, dict[str, np.ndarray]] = {}
    skipped = []
    for k, v in state.items():
        v = np.asarray(v, np.float32)
        for suffix, slot in ((".lora_A.weight", "a"), (".lora_B.weight", "b"),
                             (".lora_down.weight", "a"), (".lora_up.weight", "b")):
            if k.endswith(suffix):
                base = map_lora_base(k[:-len(suffix)])
                if base is None or v.ndim != 2:
                    skipped.append(k)
                else:
                    pairs.setdefault(base, {})[slot] = v
                break
        else:
            if k.endswith(".alpha") and v.size == 1:
                alpha = float(v)
            else:
                skipped.append(k)
    if skipped:
        print(f"convert_sd_lora: skipped {len(skipped)} unmappable/conv keys")

    w = GGUFWriter(out_path, architecture="none")
    w.add("general.type", "adapter")
    w.add("adapter.type", "lora")
    w.add("adapter.sd", True)
    w.add("adapter.lora.alpha", np.float32(alpha))
    for base, p in pairs.items():
        if "a" not in p or "b" not in p:
            raise ValueError(f"LoRA pair for {base!r} missing a component")
        w.add_tensor(base + ".lora_a", p["a"], GGMLType.F32)
        w.add_tensor(base + ".lora_b", p["b"], GGMLType.F32)
    w.write()
    return out_path


def main():
    ap = argparse.ArgumentParser(description="Convert SD LoRA safetensors to GGUF adapter")
    ap.add_argument("lora_file")
    ap.add_argument("--outfile", required=True)
    args = ap.parse_args()
    from safetensors import safe_open

    state = {}
    with safe_open(args.lora_file, framework="numpy") as f:
        for k in f.keys():
            state[k] = f.get_tensor(k)
    convert_sd_lora_state_dict(state, args.outfile)
    print(f"wrote {args.outfile}")


if __name__ == "__main__":
    main()
