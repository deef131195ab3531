"""RWKV v4 checkpoint -> rwkv.cpp .bin converter.

Counterpart of rwkv.cpp's convert_pytorch_to_ggml.py (the format read by
/root/reference/otherarch/rwkv_v3.cpp:255-345 and our LegacyRwkvReader):
header {magic 'ggmf', version 101, n_vocab, n_embed, n_layer, data_type},
then tensors {dim_count, key_length, data_type, width, [height], key, data}.

Accepts either BlinkDL naming (emb.weight, blocks.N.att.time_mix_k, ...) or
HF transformers RwkvForCausalLM naming (rwkv.embeddings.weight,
rwkv.blocks.N.attention.time_mix_key, ...).  Transforms applied exactly like
the upstream converter: squeeze time_* vectors, time_decay -> -exp(w) (the
runtime graph adds it, rwkv_att_wkv's `ww = pp + time_decay`), 2-D tensors to
f16 under --dtype f16, 1-D stay f32.  --quant q4_0|q4_1|q5_0|q5_1|q8_0
quantizes 2-D tensors with width % 32 == 0 (modern/ggml_v3 layouts, the only
ones version 101 permits).

Usage: python convert_rwkv.py model.pth out.bin [--dtype f16|f32]
       [--quant q8_0]
"""
from __future__ import annotations

import argparse
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from koboldcpp_tpu.gguf import quants  # noqa: E402
from koboldcpp_tpu.gguf.constants import GGMLType  # noqa: E402

MAGIC = 0x67676D66  # 'ggmf'
VERSION = 101

# rwkv_type ordinals (/root/reference/otherarch/rwkv_v3.cpp:183-195)
_RWKV_TYPE_ID = {
    GGMLType.F32: 0, GGMLType.F16: 1, GGMLType.Q4_0: 2, GGMLType.Q4_1: 3,
    GGMLType.Q5_0: 7, GGMLType.Q5_1: 8, GGMLType.Q8_0: 9,
}
_QUANT_BY_NAME = {
    "q4_0": GGMLType.Q4_0, "q4_1": GGMLType.Q4_1, "q5_0": GGMLType.Q5_0,
    "q5_1": GGMLType.Q5_1, "q8_0": GGMLType.Q8_0,
}

# HF RwkvForCausalLM module names -> BlinkDL .pth names
_HF_MAP = {
    "attention.time_decay": "att.time_decay",
    "attention.time_first": "att.time_first",
    "attention.time_mix_key": "att.time_mix_k",
    "attention.time_mix_value": "att.time_mix_v",
    "attention.time_mix_receptance": "att.time_mix_r",
    "attention.key.weight": "att.key.weight",
    "attention.value.weight": "att.value.weight",
    "attention.receptance.weight": "att.receptance.weight",
    "attention.output.weight": "att.output.weight",
    "feed_forward.time_mix_key": "ffn.time_mix_k",
    "feed_forward.time_mix_receptance": "ffn.time_mix_r",
    "feed_forward.key.weight": "ffn.key.weight",
    "feed_forward.value.weight": "ffn.value.weight",
    "feed_forward.receptance.weight": "ffn.receptance.weight",
}


def _canon_name(name: str) -> str | None:
    """HF or BlinkDL name -> .bin key; None = skip (buffers etc.)."""
    if name == "head.weight":
        return name
    if name.startswith("rwkv."):  # HF prefix
        name = name[5:]
        if name == "embeddings.weight":
            return "emb.weight"
        if name.startswith("ln_out."):
            return name
        if name.startswith("blocks."):
            _, idx, rest = name.split(".", 2)
            if rest.startswith("pre_ln."):
                return f"blocks.{idx}.ln0.{rest.split('.', 1)[1]}"
            if rest.startswith(("ln1.", "ln2.")):
                return f"blocks.{idx}.{rest}"
            mapped = _HF_MAP.get(rest)
            if mapped:
                return f"blocks.{idx}.{mapped}"
        return None
    # BlinkDL names pass through
    if name == "emb.weight" or name.startswith(("ln_out.", "blocks.")):
        return name
    return None


def convert_state_dict(state: dict, out_path: str, dtype: str = "f16",
                       quant: str | None = None) -> None:
    items: list[tuple[str, np.ndarray]] = []
    n_layer = 0
    n_vocab = n_embd = 0
    for raw_name, tensor in state.items():
        name = _canon_name(raw_name)
        if name is None:
            continue
        arr = np.asarray(
            tensor.detach().float().cpu().numpy()
            if hasattr(tensor, "detach") else tensor, np.float32)
        if ".time_" in name:
            arr = arr.reshape(-1)  # squeeze, like the upstream converter
        if name.endswith(".time_decay"):
            arr = -np.exp(arr)
        if name == "emb.weight":
            n_vocab, n_embd = arr.shape
        if name.startswith("blocks."):
            n_layer = max(n_layer, int(name.split(".")[1]) + 1)
        items.append((name, arr))

    qt = _QUANT_BY_NAME[quant] if quant else None
    data_type_id = _RWKV_TYPE_ID[
        qt if qt else (GGMLType.F16 if dtype == "f16" else GGMLType.F32)]

    with open(out_path, "wb") as f:
        f.write(struct.pack("<6I", MAGIC, VERSION, n_vocab, n_embd, n_layer,
                            data_type_id))
        for name, arr in items:
            t = GGMLType.F32
            data: np.ndarray
            if arr.ndim == 2:
                if qt is not None and arr.shape[1] % 32 == 0:
                    t = qt
                    data = quants.quantize(arr, qt).reshape(-1)
                elif dtype == "f16":
                    t = GGMLType.F16
                    data = arr.astype(np.float16).view(np.uint8).reshape(-1)
                else:
                    data = arr.view(np.uint8).reshape(-1)
            else:
                data = arr.view(np.uint8).reshape(-1)
            key = name.encode("utf-8")
            shape = arr.shape
            f.write(struct.pack("<3I", arr.ndim, len(key),
                                _RWKV_TYPE_ID[t]))
            f.write(struct.pack("<I", shape[-1]))
            if arr.ndim == 2:
                f.write(struct.pack("<I", shape[0]))
            f.write(key)
            f.write(data.tobytes())


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("model", help=".pth checkpoint (BlinkDL or HF naming)")
    ap.add_argument("out", help="output .bin path")
    ap.add_argument("--dtype", choices=("f16", "f32"), default="f16")
    ap.add_argument("--quant", choices=sorted(_QUANT_BY_NAME), default=None)
    args = ap.parse_args()

    import torch

    state = torch.load(args.model, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    convert_state_dict(state, args.out, dtype=args.dtype, quant=args.quant)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
