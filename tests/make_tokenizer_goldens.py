"""Generate reference-tokenizer golden fixtures (VERDICT r1 item 8).

Builds vocab-only GGUF files, tokenizes a battery of edge-case strings with
the REFERENCE llama.cpp tokenizer (llama_tokenize via a small C++ driver
linked against the reference build objects — the same pattern as the
reference's models/ggml-vocab-*.gguf.{inp,out} goldens), and writes
self-contained JSON fixtures (vocab + merges + cases) that
tests/test_tokenizer_goldens.py replays against our Python tokenizer.

Run manually when the fixtures need regenerating:
    1. copy /root/reference to a writable dir and `make main` there
    2. g++ the driver (see tests/tokdrv.cpp provenance note below) against
       llama.o ggml*.o unicode*.o sgemm.o
    3. python tests/make_tokenizer_goldens.py <tokdrv> <refbuild_dir>
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

BATTERY = [
    "",
    " ",
    "  ",
    "   ",
    "\t",
    "\n",
    "\n\n",
    "\t\n",
    "Hello world",
    " Hello world",
    "Hello World!",
    " Hello World!",
    " Hello world!  ",
    "Hello, y'all! How are you 😁 ?",
    "The quick brown fox jumps over the lazy dog.",
    "3 + 5 = 8, and 12345 * 678 = ?",
    "3.14159265358979",
    "w048 7tuijk dsdfhu",
    "нещо на Български",
    "こんにちは世界",
    "Hello\n\nWorld",
    "   leading spaces",
    "trailing spaces   ",
    "café naïve résumé",
    "https://example.com/path?query=1&x=2",
    "don't can't won't it's",
    "CamelCaseWords and ALLCAPS and snake_case",
    "line1\nline2\r\nline3",
    "ums 12345 678 90",
    "!!!???...,,;;",
]


def _escape(s: str) -> str:
    return (s.replace("\\", "\\\\").replace("\n", "\\n")
            .replace("\t", "\\t").replace("\r", "\\r"))


def build_bpe_vocab_gguf(tokenizer_json: str, out_path: str) -> dict:
    """Vocab-only llama-arch GGUF from a HF tokenizers BPE file."""
    from koboldcpp_tpu.gguf import GGUFWriter

    with open(tokenizer_json) as f:
        tj = json.load(f)
    vocab = tj["model"]["vocab"]
    merges = tj["model"]["merges"]
    merges = [m if isinstance(m, str) else " ".join(m) for m in merges]
    tokens = [None] * len(vocab)
    for tok, tid in vocab.items():
        tokens[tid] = tok
    specials = {"<s>", "</s>", "<unk>"}
    types = [3 if t in specials else 1 for t in tokens]  # CONTROL / NORMAL

    w = GGUFWriter(out_path, architecture="llama")
    # minimal hparams so the reference's vocab-only load parses cleanly
    w.add("llama.context_length", np.uint32(128))
    w.add("llama.embedding_length", np.uint32(64))
    w.add("llama.block_count", np.uint32(1))
    w.add("llama.feed_forward_length", np.uint32(128))
    w.add("llama.attention.head_count", np.uint32(2))
    w.add("llama.attention.layer_norm_rms_epsilon", np.float32(1e-5))
    w.add("tokenizer.ggml.model", "gpt2")
    w.add("tokenizer.ggml.pre", "gpt-2")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.token_type", np.array(types, np.int32))
    w.add("tokenizer.ggml.merges", merges)
    w.add("tokenizer.ggml.bos_token_id", np.uint32(0))
    w.add("tokenizer.ggml.eos_token_id", np.uint32(1))
    w.add("tokenizer.ggml.unknown_token_id", np.uint32(2))
    w.add("tokenizer.ggml.add_bos_token", False)
    w.write()
    return {"model": "gpt2", "pre": "gpt-2", "tokens": tokens,
            "token_type": types, "merges": merges,
            "bos_id": 0, "eos_id": 1, "unk_id": 2, "add_bos": False}


def build_spm_vocab_gguf(out_path: str) -> dict:
    """Vocab-only GGUF with the SPM byte-fallback test vocab, with real
    piece scores so the trigram merge heap has work to do."""
    from koboldcpp_tpu.gguf import GGUFWriter
    from test_model_forward import tiny_tokenizer_md

    md = tiny_tokenizer_md(512)
    toks = list(md["tokenizer.ggml.tokens"])
    types = [int(t) for t in md["tokenizer.ggml.token_type"]]
    # give the filler slots real text pieces (SPM merge candidates)
    pieces = ["\u2581", "\u2581the", "the", "he", "t", "h", "e", "r", "o",
              "\u2581of", "of", "\u2581and", "and", "an", "d", "ing", "in",
              "\u2581to", "to", "\u2581a", "a", "s", "\u2581is", "is",
              "\u2581Hello", "Hello", "Hell", "lo", "l", "wor", "world",
              "\u2581world", "or", "w", "ld", "\u2581quick", "qu", "ick",
              "\u2581brown", "own", "\u2581fox", "f", "ox", "x", "."]
    base = 3 + 256
    for i, p in enumerate(pieces):
        toks[base + i] = p
        types[base + i] = 1
    scores = np.zeros(len(toks), np.float32)
    for i in range(len(pieces)):
        scores[base + i] = -float(i)  # earlier pieces win ties

    w = GGUFWriter(out_path, architecture="llama")
    w.add("llama.context_length", np.uint32(128))
    w.add("llama.embedding_length", np.uint32(64))
    w.add("llama.block_count", np.uint32(1))
    w.add("llama.feed_forward_length", np.uint32(128))
    w.add("llama.attention.head_count", np.uint32(2))
    w.add("llama.attention.layer_norm_rms_epsilon", np.float32(1e-5))
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", toks)
    w.add("tokenizer.ggml.scores", scores)
    w.add("tokenizer.ggml.token_type", np.array(types, np.int32))
    w.add("tokenizer.ggml.bos_token_id", np.uint32(1))
    w.add("tokenizer.ggml.eos_token_id", np.uint32(2))
    w.add("tokenizer.ggml.unknown_token_id", np.uint32(0))
    w.add("tokenizer.ggml.add_bos_token", True)
    w.write()
    return {"model": "llama", "pre": "default", "tokens": toks,
            "token_type": types, "scores": scores.tolist(), "merges": [],
            "bos_id": 1, "eos_id": 2, "unk_id": 0, "add_bos": True}


def run_reference(tokdrv: str, gguf: str, add_bos: bool) -> list[list[int]]:
    inp = "\n".join(_escape(s) for s in BATTERY) + "\n"
    out = subprocess.run([tokdrv, gguf, "1" if add_bos else "0"],
                         input=inp.encode(), capture_output=True, check=True)
    lines = out.stdout.decode().splitlines()
    assert len(lines) == len(BATTERY), (len(lines), len(BATTERY))
    return [[int(t) for t in ln.split()] if ln.strip() else []
            for ln in lines]


def main():
    tokdrv = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tokdrv"
    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    os.makedirs(fixdir, exist_ok=True)

    meta = build_bpe_vocab_gguf("/tmp/quality/tokenizer.json",
                                "/tmp/vocab_bpe.gguf")
    ids = run_reference(tokdrv, "/tmp/vocab_bpe.gguf", meta["add_bos"])
    with open(os.path.join(fixdir, "tokgolden_bpe.json"), "w") as f:
        json.dump({"vocab": meta,
                   "cases": [{"text": t, "ids": i}
                             for t, i in zip(BATTERY, ids)]}, f)
    print(f"bpe goldens: {len(ids)} cases")

    meta = build_spm_vocab_gguf("/tmp/vocab_spm.gguf")
    ids = run_reference(tokdrv, "/tmp/vocab_spm.gguf", meta["add_bos"])
    with open(os.path.join(fixdir, "tokgolden_spm.json"), "w") as f:
        json.dump({"vocab": meta,
                   "cases": [{"text": t, "ids": i}
                             for t, i in zip(BATTERY, ids)]}, f)
    print(f"spm goldens: {len(ids)} cases")


if __name__ == "__main__":
    main()
