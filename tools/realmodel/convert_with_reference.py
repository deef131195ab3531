"""Run the REFERENCE's own convert_hf_to_gguf.py on the locally-trained HF
checkpoint to produce the f16 GGUF used for the quality study.

One (documented) monkeypatch: `Model.get_vocab_base_pre` identifies BPE
pretokenizers by hashing the token ids of a probe string
(/root/reference/convert_hf_to_gguf.py:542-553) — a hash that depends on the
learned vocab, so a locally-trained tokenizer can never be in the table and the
reference raises NotImplementedError by design.  Our tokenizer is trained with
the llama-3 pretokenizer regex (see train_tokenizer.py), so we pin the result to
"llama-bpe", which is behaviorally exact.  Everything else is the reference
converter verbatim.

Usage: python tools/realmodel/convert_with_reference.py HF_DIR OUT_F16.gguf [--ref PATH]
"""
from __future__ import annotations

import argparse
import importlib.util
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("hf_dir")
    ap.add_argument("out")
    ap.add_argument("--ref", default="/tmp/refbuild",
                    help="scratch copy of the reference tree (read-only mount "
                         "at /root/reference cannot be imported from safely)")
    args = ap.parse_args()

    # gguf-py/gguf/vocab.py imports sentencepiece at module level; the package
    # is not installed in this environment and the SPM code path is never
    # reached (our vocab is BPE -> _set_vocab_gpt2).  Stub just the import.
    if "sentencepiece" not in sys.modules:
        import types
        stub = types.ModuleType("sentencepiece")

        class SentencePieceProcessor:  # pragma: no cover - never instantiated
            def __init__(self, *a, **k):
                raise RuntimeError("sentencepiece is not available in this env")

        stub.SentencePieceProcessor = SentencePieceProcessor
        stub.__spec__ = importlib.util.spec_from_loader("sentencepiece", loader=None)
        sys.modules["sentencepiece"] = stub

    sys.path.insert(0, f"{args.ref}/gguf-py")
    spec = importlib.util.spec_from_file_location(
        "convert_hf_to_gguf", f"{args.ref}/convert_hf_to_gguf.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["convert_hf_to_gguf"] = mod
    spec.loader.exec_module(mod)

    mod.Model.get_vocab_base_pre = lambda self, tokenizer: "llama-bpe"

    sys.argv = ["convert_hf_to_gguf.py", args.hf_dir,
                "--outfile", args.out, "--outtype", "f16"]
    mod.main()


if __name__ == "__main__":
    main()
