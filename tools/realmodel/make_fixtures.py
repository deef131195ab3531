"""Build committed test fixtures: tiny REFERENCE-produced GGUF files + the
reference runtime's logits on a fixed prompt.

Pipeline (all reference tooling, mirroring run_quality.py at fixture scale):
  1. train a 512-token BPE tokenizer (llama-3 pretokenizer) on the local corpus
  2. random-init a tiny HF LlamaForCausalLM (256 hidden, 2 layers — all
     contraction dims divisible by 256 so every quant format applies)
  3. reference convert_hf_to_gguf.py -> f16 GGUF
  4. reference quantize_gguf -> one file per committed format
  5. reference runtime logits (logits_ref.cpp) -> .npy goldens

Output -> tests/fixtures/refgguf/ (committed; ~2.5 MB total).

Usage: python tools/realmodel/make_fixtures.py [--ref /tmp/refbuild]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
OUT = os.path.join(REPO, "tests", "fixtures", "refgguf")

FORMATS = ["q4_0", "q5_1", "q8_0", "q4_k_m", "q6_k", "iq4_nl", "tq2_0"]
PROMPT_TOKENS = 12


def sh(cmd, **kw):
    print("+", " ".join(map(str, cmd)), flush=True)
    return subprocess.run([str(c) for c in cmd], check=True, **kw)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/tmp/refbuild")
    ap.add_argument("--corpus", default="/tmp/realmodel/corpus")
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)
    wd = tempfile.mkdtemp(prefix="refgguf_fixtures_")

    # 1. tiny tokenizer
    tokdir = os.path.join(wd, "tok")
    sh([sys.executable, os.path.join(HERE, "train_tokenizer.py"),
        args.corpus, tokdir, "--vocab", "512"])

    # 2. tiny random HF model
    hfdir = os.path.join(wd, "hf")
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False, mlp_bias=False,
        bos_token_id=510, eos_token_id=511, max_position_embeddings=2048)
    model = LlamaForCausalLM(cfg).eval().float()
    model.save_pretrained(hfdir, safe_serialization=True)
    for f in ("tokenizer.json", "tokenizer_config.json"):
        shutil.copy(os.path.join(tokdir, f), os.path.join(hfdir, f))

    # 3. reference converter
    f16 = os.path.join(OUT, "tiny-f16.gguf")
    sh([sys.executable, os.path.join(HERE, "convert_with_reference.py"),
        hfdir, f16, "--ref", args.ref])

    # 4. reference quantizer
    for fmt in FORMATS:
        sh([os.path.join(args.ref, "quantize_gguf"), f16,
            os.path.join(OUT, f"tiny-{fmt}.gguf"), fmt.upper(), "2"],
           stdout=subprocess.DEVNULL)

    # 5. reference-runtime logits goldens
    src = os.path.join(HERE, "logits_ref.cpp")
    binp = os.path.join(args.ref, "logits_ref")
    sh(["g++", "-I" + args.ref, "-I" + args.ref + "/ggml/include",
        "-I" + args.ref + "/include", "-O2", "-std=c++11", "-pthread", src] +
       [os.path.join(args.ref, o) for o in
        ("ggml.o", "llama.o", "ggml-backend_default.o", "ggml-alloc.o",
         "ggml-aarch64.o", "ggml-quants.o", "unicode.o", "unicode-data.o",
         "sgemm.o", "llavaclip_default.o", "llava.o")] + ["-o", binp])
    rng = np.random.default_rng(42)
    toks = rng.integers(2, 500, PROMPT_TOKENS).tolist()
    goldens = {"tokens": toks, "files": {}}
    for fmt in ["f16"] + FORMATS:
        path = os.path.join(OUT, f"tiny-{fmt}.gguf")
        r = sh([binp, path, ",".join(map(str, toks))],
               capture_output=True, text=True)
        logits = np.array([[float(x) for x in ln.split()]
                           for ln in r.stdout.strip().split("\n")],
                          dtype=np.float32)
        np.save(os.path.join(OUT, f"logits-{fmt}.npy"), logits)
        goldens["files"][fmt] = f"tiny-{fmt}.gguf"
        print(f"{fmt}: logits {logits.shape} max|.| {np.abs(logits).max():.3f}")
    with open(os.path.join(OUT, "manifest.json"), "w") as fh:
        json.dump(goldens, fh, indent=1)
    print(f"fixtures -> {OUT}")


if __name__ == "__main__":
    main()
