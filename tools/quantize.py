"""GGUF re-quantization tool.

Counterpart of examples/quantize/quantize.cpp + llama_model_quantize_internal
(/root/reference/src/llama.cpp:18326): reads a GGUF, re-quantizes the 2-D
weight tensors to the target type (with llama.cpp's customary exceptions:
embeddings/output get a higher-precision type), writes a new GGUF.
"""
from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from koboldcpp_tpu.gguf import GGMLType, GGUFReader, GGUFWriter, quants  # noqa: E402

TYPE_MAP = {
    "f32": GGMLType.F32, "f16": GGMLType.F16, "bf16": GGMLType.BF16,
    "q4_0": GGMLType.Q4_0, "q4_1": GGMLType.Q4_1,
    "q5_0": GGMLType.Q5_0, "q5_1": GGMLType.Q5_1, "q8_0": GGMLType.Q8_0,
    "q2_k": GGMLType.Q2_K, "q3_k_m": GGMLType.Q3_K,
    "q4_k_m": GGMLType.Q4_K, "q4_k_s": GGMLType.Q4_K,
    "q5_k_m": GGMLType.Q5_K, "q5_k_s": GGMLType.Q5_K,
    "q6_k": GGMLType.Q6_K, "iq4_nl": GGMLType.IQ4_NL,
    "iq4_xs": GGMLType.IQ4_XS, "tq1_0": GGMLType.TQ1_0, "tq2_0": GGMLType.TQ2_0,
    "iq2_xxs": GGMLType.IQ2_XXS, "iq3_xxs": GGMLType.IQ3_XXS,
    "iq1_s": GGMLType.IQ1_S, "iq2_xs": GGMLType.IQ2_XS,
    # reference ftype semantics (llama_model_quantize_internal,
    # src/llama.cpp:18356-18357): the IQ2_S FTYPE quantizes tensors at
    # IQ2_XS with the IQ2_S-class bumps; IQ2_M uses IQ2_S tensors
    "iq2_s": GGMLType.IQ2_XS, "iq2_m": GGMLType.IQ2_S,
    "iq3_s": GGMLType.IQ3_S, "iq3_m": GGMLType.IQ3_S,
    "iq1_m": GGMLType.IQ1_M,
}
# CLI names whose FTYPE takes the reference's IQ2_S/IQ2_M bump class
_IQ2SM_FTYPES = ("iq2_s", "iq2_m")


# the low-bit IQ ftype class the reference treats specially
# (llama_tensor_get_type, /root/reference/src/llama.cpp:17979+)
_LOWBIT_IQ = (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
              GGMLType.IQ1_S, GGMLType.IQ1_M)
_BUMPABLE = (GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K,
             GGMLType.IQ4_XS, GGMLType.TQ1_0, GGMLType.TQ2_0,
             GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
             GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S,
             GGMLType.IQ1_M)


def _use_more_bits(i_layer: int, n_layers: int) -> bool:
    return (i_layer < n_layers // 8 or i_layer >= 7 * n_layers // 8
            or (i_layer - n_layers // 8) % 3 == 2)


def _layer_of(name: str) -> int:
    m = re.match(r"blk\.(\d+)\.", name)
    return int(m.group(1)) if m else 0


class TypePicker:
    """Per-tensor type selection — the reference's llama_tensor_get_type
    heuristics (/root/reference/src/llama.cpp:17979+) for the formats this
    tool produces. The low-bit IQ class bumps attn_v/attn_output/early
    ffn_down layers, which is what makes IQ1/IQ2 files usable at all: a
    13-point ppl gap at IQ1_M traced entirely to missing these bumps
    (QUALITY.md round 5)."""

    def __init__(self, target: GGMLType, metadata: dict | None = None,
                 has_imatrix: bool = False, ftype: str = ""):
        md = metadata or {}
        arch = str(md.get("general.architecture", "llama"))
        heads = int(md.get(f"{arch}.attention.head_count", 0) or 0)
        kv = int(md.get(f"{arch}.attention.head_count_kv", heads) or heads)
        self.n_gqa = heads // kv if kv else 1
        self.n_expert = int(md.get(f"{arch}.expert_count", 0) or 0)
        self.n_layers = int(md.get(f"{arch}.block_count", 0) or 0)
        self.target = target
        self.has_imatrix = has_imatrix
        self.ftype = ftype  # CLI ftype name; distinguishes iq2_s (IQ2_XS
        #                     base + IQ2_S-class bumps) from plain iq2_xs
        self.i_attn_v = 0

    def pick(self, name: str, shape) -> GGMLType:
        t = self.target
        if len(shape) < 2:
            return GGMLType.F32
        if shape[-1] % 256:
            # can't K-quant this row length; fall back
            return GGMLType.Q8_0 if shape[-1] % 32 == 0 else GGMLType.F16
        iq2sm = (self.ftype in _IQ2SM_FTYPES
                 or (not self.ftype and t == GGMLType.IQ2_S))
        lowbit = t in _LOWBIT_IQ or iq2sm
        if name == "output.weight":
            if lowbit or t == GGMLType.IQ3_XXS:
                return GGMLType.Q5_K
            if t in _BUMPABLE:
                return GGMLType.Q6_K
            return t
        if name == "token_embd.weight":
            if iq2sm or t in (GGMLType.IQ3_XXS, GGMLType.IQ3_S):
                return GGMLType.IQ3_S
            if t in (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ1_S,
                     GGMLType.IQ1_M):
                return GGMLType.Q2_K
            if t in _BUMPABLE:
                return GGMLType.Q6_K
            return t
        if lowbit:
            if "attn_v.weight" in name:
                if self.n_gqa >= 4 or self.n_expert >= 4:
                    return GGMLType.Q4_K
                return GGMLType.IQ3_S if iq2sm else GGMLType.Q2_K
            if self.n_expert == 8 and "attn_k.weight" in name:
                return GGMLType.Q4_K
            if "ffn_down" in name:
                if _layer_of(name) < self.n_layers // 8:
                    return GGMLType.IQ3_S if iq2sm else GGMLType.Q2_K
                return t
            if "attn_output.weight" in name:
                if self.n_expert == 8:
                    return GGMLType.Q5_K
                if t in (GGMLType.IQ1_S, GGMLType.IQ1_M):
                    return GGMLType.IQ2_XXS
                if iq2sm:
                    return GGMLType.IQ3_S
                return t
            return t
        if "attn_v.weight" in name:
            i_v = self.i_attn_v
            self.i_attn_v += 1
            if self.n_expert == 8:
                return GGMLType.Q8_0
            if t == GGMLType.Q2_K:
                return GGMLType.Q4_K if self.n_gqa >= 4 else GGMLType.Q3_K
            if t == GGMLType.IQ3_XXS:
                if self.n_gqa >= 4:
                    return GGMLType.Q4_K
                return (GGMLType.IQ3_XXS if self.has_imatrix
                        else GGMLType.IQ3_S)
            if t == GGMLType.IQ3_S and self.n_gqa >= 4:
                return GGMLType.Q4_K
            if t in (GGMLType.IQ4_NL, GGMLType.IQ4_XS) and self.n_gqa >= 4:
                return GGMLType.Q5_K
            if t in (GGMLType.Q4_K, GGMLType.Q5_K) and _use_more_bits(
                    i_v, self.n_layers or 1):
                return GGMLType.Q6_K
            return t
        if "attn_k.weight" in name:
            if self.n_expert == 8:
                return GGMLType.Q8_0
            if t == GGMLType.IQ3_XXS:
                return GGMLType.IQ2_S
            return t
        if "attn_q.weight" in name and t == GGMLType.IQ3_XXS:
            return GGMLType.IQ2_S
        if "attn_output.weight" in name:
            if self.n_expert == 8:
                if t in (GGMLType.Q2_K, GGMLType.IQ3_XXS, GGMLType.Q3_K,
                         GGMLType.Q4_K, GGMLType.IQ4_NL, GGMLType.IQ4_XS,
                         GGMLType.IQ3_S):
                    return GGMLType.Q5_K
                return t
            if t == GGMLType.Q2_K:
                return GGMLType.Q3_K
            if t == GGMLType.IQ3_XXS:
                return GGMLType.IQ3_S
            return t
        if "ffn_down" in name:
            i_layer, n_layer = _layer_of(name), self.n_layers or 1
            if t == GGMLType.Q2_K:
                return GGMLType.Q3_K
            if t == GGMLType.IQ3_XXS and not self.has_imatrix:
                return (GGMLType.Q4_K if i_layer < n_layer // 8
                        else GGMLType.Q3_K)
            if (t in (GGMLType.IQ4_NL, GGMLType.IQ4_XS)
                    and i_layer < n_layer // 8 and not self.has_imatrix):
                return GGMLType.Q5_K
            if t == GGMLType.Q4_K and _use_more_bits(i_layer, n_layer):
                return GGMLType.Q6_K
            if t == GGMLType.Q5_K and _use_more_bits(i_layer, n_layer):
                return GGMLType.Q6_K
            return t
        return t


def pick_type(name: str, shape, target: GGMLType,
              metadata: dict | None = None) -> GGMLType:
    """Back-compat single-shot wrapper over TypePicker."""
    return TypePicker(target, metadata).pick(name, shape)


def quantize_file(src: str, dst: str, target: GGMLType, verbose=True,
                  imatrix: str | None = None, ftype: str = ""):
    """imatrix: optional .npz of per-tensor column importance weights
    (tools/imatrix.py output) — enables the reference's weighted K-quant
    search (quantize_row_*_impl quant_weights, ggml-quants.c)."""
    imx = dict(np.load(imatrix)) if imatrix else {}
    with GGUFReader(src) as r:
        w = GGUFWriter(dst)
        for k, v in r.metadata.items():
            if k == "general.file_type":
                continue
            w.add(k, v)
        w.add("general.file_type", np.uint32(int(target)))
        total_in = total_out = 0
        picker = TypePicker(target, r.metadata, has_imatrix=bool(imx),
                            ftype=ftype)
        for name, info in r.tensors.items():
            data = r.tensor_data(name)
            t = picker.pick(name, info.shape)
            qw = imx.get(name)
            if qw is not None and qw.shape[-1] != info.shape[-1]:
                qw = None  # stale imatrix for a different model
            raw = quants.quantize(np.ascontiguousarray(data, np.float32), t,
                                  quant_weights=qw)
            w.add_tensor(name, raw, t)
            total_in += info.nbytes
            total_out += raw.nbytes
            if verbose:
                print(f"  {name}: {info.ggml_type.name} -> {t.name} "
                      f"({info.nbytes/1e6:.1f} -> {raw.nbytes/1e6:.1f} MB)")
        w.write()
        if verbose:
            print(f"quantized {src} -> {dst}: {total_in/1e9:.2f} GB -> "
                  f"{total_out/1e9:.2f} GB")


def main():
    ap = argparse.ArgumentParser(description="Requantize a GGUF model")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("type", choices=sorted(TYPE_MAP))
    ap.add_argument("--imatrix", default=None,
                    help=".npz importance matrix from tools/imatrix.py")
    args = ap.parse_args()
    quantize_file(args.input, args.output, TYPE_MAP[args.type],
                  ftype=args.type,
                  imatrix=args.imatrix)


if __name__ == "__main__":
    main()
