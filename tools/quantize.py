"""GGUF re-quantization tool.

Counterpart of examples/quantize/quantize.cpp + llama_model_quantize_internal
(/root/reference/src/llama.cpp:18326): reads a GGUF, re-quantizes the 2-D
weight tensors to the target type (with llama.cpp's customary exceptions:
embeddings/output get a higher-precision type), writes a new GGUF.
"""
from __future__ import annotations

import argparse
import os
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
    "iq2_s": GGMLType.IQ2_S, "iq2_m": GGMLType.IQ2_S,
    "iq3_s": GGMLType.IQ3_S, "iq3_m": GGMLType.IQ3_S,
    "iq1_m": GGMLType.IQ1_M,
}


def pick_type(name: str, shape, target: GGMLType) -> GGMLType:
    """Per-tensor type selection (llama_tensor_get_type heuristics, simplified:
    1-D stays f32; output/embeddings bump to Q6_K for K-quant targets)."""
    if len(shape) < 2:
        return GGMLType.F32
    if shape[-1] % 256:
        # can't K-quant this row length; fall back
        return GGMLType.Q8_0 if shape[-1] % 32 == 0 else GGMLType.F16
    if name in ("output.weight", "token_embd.weight") and target in (
            GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K,
            GGMLType.IQ4_XS, GGMLType.TQ1_0, GGMLType.TQ2_0,
            GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
            GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S,
            GGMLType.IQ1_M):
        # reference bumps output/embd for low-bit targets too
        # (llama_tensor_get_type, src/llama.cpp:17979)
        return GGMLType.Q6_K
    return target


def quantize_file(src: str, dst: str, target: GGMLType, verbose=True,
                  imatrix: str | None = None):
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
        for name, info in r.tensors.items():
            data = r.tensor_data(name)
            t = pick_type(name, info.shape, target)
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
                  imatrix=args.imatrix)


if __name__ == "__main__":
    main()
