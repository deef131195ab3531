"""Train a llama-3-style ByteLevel BPE tokenizer on the local corpus.

Produces an HF-format tokenizer.json + tokenizer_config.json that the reference's
own `convert_hf_to_gguf.py` can consume via its `_set_vocab_gpt2()` path (BPE vocab,
`tokenizer.ggml.model = "gpt2"`).  The pretokenizer regex is the llama-3 one
(ref `src/llama-vocab.cpp` LLAMA_VOCAB_PRE_TYPE_LLAMA3 regex), so declaring
`tokenizer.ggml.pre = "llama-bpe"` at conversion time is behaviorally exact.

Usage: python tools/realmodel/train_tokenizer.py CORPUS_DIR OUTDIR [--vocab 8192]
"""
from __future__ import annotations

import argparse
import json
import os

from tokenizers import Tokenizer, Regex, decoders, models, pre_tokenizers, processors, trainers

# llama-3 pretokenizer regex (same pattern the reference dispatches for "llama-bpe":
# /root/reference/src/llama-vocab.cpp:389-396)
LLAMA3_RE = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}"
    r"| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)

BOS = "<|begin_of_text|>"
EOS = "<|end_of_text|>"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus_dir")
    ap.add_argument("outdir")
    ap.add_argument("--vocab", type=int, default=8192)
    args = ap.parse_args()

    tok = Tokenizer(models.BPE(byte_fallback=False))
    tok.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(Regex(LLAMA3_RE), behavior="isolated", invert=False),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    tok.decoder = decoders.ByteLevel()
    tok.post_processor = processors.ByteLevel(trim_offsets=False)

    trainer = trainers.BpeTrainer(
        vocab_size=args.vocab - 2,  # leave room for BOS/EOS specials
        special_tokens=[],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train([os.path.join(args.corpus_dir, "train.txt")], trainer)
    tok.add_special_tokens([BOS, EOS])

    os.makedirs(args.outdir, exist_ok=True)
    tok.save(os.path.join(args.outdir, "tokenizer.json"))

    bos_id = tok.token_to_id(BOS)
    eos_id = tok.token_to_id(EOS)
    with open(os.path.join(args.outdir, "tokenizer_config.json"), "w") as fh:
        json.dump({
            "tokenizer_class": "PreTrainedTokenizerFast",
            "bos_token": BOS,
            "eos_token": EOS,
            "model_max_length": 2048,
        }, fh, indent=1)
    print(f"vocab={tok.get_vocab_size()} bos={bos_id} eos={eos_id} -> {args.outdir}")


if __name__ == "__main__":
    main()
