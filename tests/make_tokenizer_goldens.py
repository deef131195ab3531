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


def build_ugm_vocab_gguf(out_path: str) -> dict:
    """Vocab-only t5-arch GGUF with a synthetic unigram vocab (UGM path:
    llm_tokenizer_ugm, src/llama-vocab.cpp:1024)."""
    from koboldcpp_tpu.gguf import GGUFWriter

    pieces = ["<unk>", "<s>", "</s>", "▁", "▁the", "the", "he",
              "▁Hello", "Hello", "▁world", "world", "wor", "ld",
              "lo", "l", "o", "r", "d", "w", "e", "h", "t", "a", "s", "i",
              "n", "▁a", "▁to", "to", "▁of", "of", ".", ",",
              "!", "?", "'", "▁is", "is", "▁and", "and",
              "▁quick", "quick", "▁brown", "▁fox", "fox",
              "▁jumps", "jumps", "▁over", "over", "▁lazy",
              "lazy", "▁dog", "dog", "1", "2", "3", "4", "5", "0",
              "▁caf", "é", "u", "m", "p", "x", "y", "g", "b", "c",
              "f", "j", "k", "q", "v", "z"] \
        + ["▁" + ch for ch in "wbcdfghjklmnpqrstuvxyzeio"] \
        + ["▁A", "A", "B", "C", "D", "E"]
    types = [2, 3, 3] + [1] * (len(pieces) - 3)
    scores = np.array([0.0, 0.0, 0.0] + [-(i * 0.1 + 1.0)
                      for i in range(len(pieces) - 3)], np.float32)
    w = GGUFWriter(out_path, architecture="t5")
    w.add("t5.context_length", np.uint32(128))
    w.add("t5.embedding_length", np.uint32(64))
    w.add("t5.block_count", np.uint32(1))
    w.add("t5.feed_forward_length", np.uint32(128))
    w.add("t5.attention.head_count", np.uint32(2))
    w.add("t5.attention.layer_norm_rms_epsilon", np.float32(1e-5))
    w.add("t5.attention.relative_buckets_count", np.uint32(32))
    w.add("tokenizer.ggml.model", "t5")
    w.add("tokenizer.ggml.pre", "default")
    w.add("tokenizer.ggml.tokens", pieces)
    w.add("tokenizer.ggml.scores", scores)
    w.add("tokenizer.ggml.token_type", np.array(types, np.int32))
    w.add("tokenizer.ggml.unknown_token_id", np.uint32(0))
    w.add("tokenizer.ggml.bos_token_id", np.uint32(1))
    w.add("tokenizer.ggml.eos_token_id", np.uint32(2))
    w.add("tokenizer.ggml.add_bos_token", False)
    w.add("tokenizer.ggml.add_eos_token", False)
    w.add("tokenizer.ggml.add_space_prefix", True)
    w.add("tokenizer.ggml.remove_extra_whitespaces", False)
    w.write()
    return {"model": "t5", "pre": "default", "tokens": pieces,
            "token_type": types, "scores": scores.tolist(), "merges": [],
            "bos_id": 1, "eos_id": 2, "unk_id": 0, "add_bos": False,
            "add_space_prefix": True, "remove_extra_whitespaces": False}


def build_wpm_vocab_gguf(out_path: str) -> dict:
    """Vocab-only bert-arch GGUF (WPM path: llm_tokenizer_wpm; GGUF stores
    word-initial pieces \\u2581-prefixed, continuations raw).  The mask/cls
    ids MUST be explicit: llama.cpp defaults them to BERT's 103/101, which
    are out of range for a small vocab and crash the loader."""
    from koboldcpp_tpu.gguf import GGUFWriter

    P = "▁"
    words = ["hello", "world", "the", "quick", "brown", "fox", "jumps",
             "over", "lazy", "dog", "a", "i", "is", "and", "to", "of", "in",
             "it", "he", "wor", "don", "can", "won", "cafe", "naive", "line",
             "camel", "case", "words", "all", "snake", "w", "u", "ds", "1",
             "2", "3", ".", ",", "!", "?", "'"]
    conts = ["s", "ing", "ed", "ly", "er", "o", "r", "l", "d", "e", "h", "t",
             "ld", "n", "fe", "0", "48", "ij", "k", "df", "hu", "caps",
             "case", "_", "12", "34", "5"]
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] \
        + [P + wd for wd in words] + conts
    types = [3, 2, 3, 3, 3] + [1] * (len(toks) - 5)
    w = GGUFWriter(out_path, architecture="bert")
    w.add("bert.context_length", np.uint32(128))
    w.add("bert.embedding_length", np.uint32(64))
    w.add("bert.block_count", np.uint32(1))
    w.add("bert.feed_forward_length", np.uint32(128))
    w.add("bert.attention.head_count", np.uint32(2))
    w.add("bert.attention.layer_norm_epsilon", np.float32(1e-5))
    w.add("bert.attention.causal", False)
    w.add("tokenizer.ggml.token_type_count", np.uint32(2))
    w.add("tokenizer.ggml.model", "bert")
    w.add("tokenizer.ggml.pre", "default")
    w.add("tokenizer.ggml.tokens", toks)
    w.add("tokenizer.ggml.token_type", np.array(types, np.int32))
    w.add("tokenizer.ggml.unknown_token_id", np.uint32(1))
    w.add("tokenizer.ggml.cls_token_id", np.uint32(2))
    w.add("tokenizer.ggml.seperator_token_id", np.uint32(3))
    w.add("tokenizer.ggml.padding_token_id", np.uint32(0))
    w.add("tokenizer.ggml.mask_token_id", np.uint32(4))
    w.write()
    return {"model": "bert", "pre": "default", "tokens": toks,
            "token_type": types, "merges": [],
            "bos_id": -1, "eos_id": -1, "unk_id": 1, "add_bos": False,
            "cls_id": 2, "sep_id": 3, "pad_id": 0, "mask_id": 4}


def build_rwkv_vocab_gguf(out_path: str) -> dict:
    """Vocab-only rwkv6-arch GGUF (RWKV greedy-trie path:
    llm_tokenizer_rwkv): all 256 single bytes + multi-byte words."""
    from koboldcpp_tpu.gguf import GGUFWriter

    # tokens ride in the repr(bytes)[2:-1] escape format real rwkv6 GGUFs
    # use (convert_hf_to_gguf.py:2854; both runtimes unescape) — all 256
    # single bytes so every input byte has a match
    toks = [repr(bytes([b]))[2:-1] for b in range(256)]
    toks += [repr(w.encode())[2:-1] for w in
             ["he", "the", " the", "ll", "llo", "hello", "Hello", " world",
              "world", "wor", "ing", " a", " to", "qu", "ick", " quick",
              "brown", " brown", " fox", " jumps", " over", " lazy", " dog"]]
    types = [1] * len(toks)
    w = GGUFWriter(out_path, architecture="rwkv6")
    w.add("rwkv6.context_length", np.uint32(128))
    w.add("rwkv6.embedding_length", np.uint32(64))
    w.add("rwkv6.block_count", np.uint32(1))
    w.add("rwkv6.feed_forward_length", np.uint32(128))
    w.add("rwkv6.attention.head_count", np.uint32(0))
    w.add("rwkv6.attention.layer_norm_epsilon", np.float32(1e-5))
    w.add("rwkv6.wkv.head_size", np.uint32(64))
    w.add("rwkv6.time_mix_extra_dim", np.uint32(32))
    w.add("rwkv6.time_decay_extra_dim", np.uint32(64))
    w.add("tokenizer.ggml.model", "rwkv")
    w.add("tokenizer.ggml.pre", "default")
    w.add("tokenizer.ggml.tokens", toks)
    w.add("tokenizer.ggml.token_type", np.array(types, np.int32))
    w.write()
    return {"model": "rwkv", "pre": "default", "tokens": toks,
            "token_type": types, "merges": [],
            "bos_id": -1, "eos_id": -1, "unk_id": -1, "add_bos": False}


def run_reference_per_case(tokref: str, gguf: str) -> list[list[int]]:
    """Per-case invocation of the tools/realmodel tokenize_ref driver
    (one text file per battery string — no escaping needed)."""
    import tempfile

    out = []
    for s in BATTERY:
        with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                         delete=False) as f:
            f.write(s)
            path = f.name
        r = subprocess.run([tokref, gguf, path], capture_output=True,
                           check=True)
        out.append([int(t) for t in r.stdout.split()])
        os.unlink(path)
    return out


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


def main_other(tokref: str):
    """UGM/WPM/RWKV goldens via the tools/realmodel tokenize_ref driver
    (VERDICT r2 item 8: golden coverage beyond SPM+BPE).

        python tests/make_tokenizer_goldens.py --other /tmp/refbuild/tokenize_ref
    """
    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    os.makedirs(fixdir, exist_ok=True)
    for name, builder in [("ugm", build_ugm_vocab_gguf),
                          ("wpm", build_wpm_vocab_gguf),
                          ("rwkv", build_rwkv_vocab_gguf)]:
        gguf = f"/tmp/vocab_{name}.gguf"
        meta = builder(gguf)
        ids = run_reference_per_case(tokref, gguf)
        with open(os.path.join(fixdir, f"tokgolden_{name}.json"), "w") as f:
            json.dump({"vocab": meta,
                       "cases": [{"text": t, "ids": i}
                                 for t, i in zip(BATTERY, ids)]}, f)
        print(f"{name} goldens: {len(ids)} cases")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--other":
        main_other(sys.argv[2] if len(sys.argv) > 2
                   else "/tmp/refbuild/tokenize_ref")
    else:
        main()
