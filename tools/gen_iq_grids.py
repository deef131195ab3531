"""Generate the IQ-quant codebook data asset (koboldcpp_tpu/gguf/iq_grids.npz).

The IQ formats (IQ1_S/M, IQ2_XXS/XS/S, IQ3_XXS/S) decode through fixed
E8-lattice-derived codebook tables that are part of the public GGUF format
definition. This tool decodes them from the reference gguf-py package's hex
blobs into plain float arrays and stores them as a binary asset (numerical
format constants — the implementation in quants.py is original).

Run once: python tools/gen_iq_grids.py
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "koboldcpp_tpu", "gguf", "iq_grids.npz")


def main():
    sys.path.insert(0, "/root/reference/gguf-py")
    if "sentencepiece" not in sys.modules:
        import importlib.machinery

        sp = types.ModuleType("sentencepiece")
        sp.SentencePieceProcessor = object
        sp.__spec__ = importlib.machinery.ModuleSpec("sentencepiece", loader=None)
        sys.modules["sentencepiece"] = sp
    from gguf import quants as rq

    data = {}
    for name in ("IQ2_XXS", "IQ2_XS", "IQ2_S", "IQ3_XXS", "IQ3_S", "IQ1_S", "IQ1_M"):
        cls = getattr(rq, name)
        cls.init_grid()
        grid = np.asarray(cls.grid, dtype=np.float32)
        # stored as (1, 1, N, elems) -> (N, elems)
        data[f"grid_{name.lower()}"] = grid.reshape(grid.shape[-2], grid.shape[-1])

    # sign table for the 7-bit sign indices (+ parity bit), shared by IQ2/IQ3
    ksigns = np.frombuffer(rq.IQ2_XXS.ksigns, dtype=np.uint8)
    data["ksigns"] = ksigns

    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT}:")
    for k, v in data.items():
        print(f"  {k}: {v.shape} {v.dtype}")


if __name__ == "__main__":
    main()
