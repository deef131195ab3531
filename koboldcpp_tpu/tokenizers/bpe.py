"""Byte-level BPE tokenizer (GPT-2 family) over a GGUF vocab.

Counterpart of the reference's llm_tokenizer_bpe
(/root/reference/src/llama-vocab.cpp:596) with per-model pretokenizer regexes.
Uses the `regex` module for \\p unicode classes.
"""
from __future__ import annotations

from functools import lru_cache

import regex

from .vocab import Vocab

# Pretokenizer patterns keyed by `tokenizer.ggml.pre` (subset; default=gpt2).
_GPT2_PRE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
_LLAMA3_PRE = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}"
    r"| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)
_GPT4O_PRE = (
    r"[^\r\n\p{L}\p{N}]?((?=[\p{L}])([^a-z]))*((?=[\p{L}])([^A-Z]))+(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])?"
    r"|[^\r\n\p{L}\p{N}]?((?=[\p{L}])([^a-z]))+((?=[\p{L}])([^A-Z]))*(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])?"
    r"|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n/]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)
_FALCON_PRE = r"[\p{P}\$\+<=>\^~\|`]+|'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"

PRE_PATTERNS: dict[str, list[str]] = {
    "default": [_GPT2_PRE],
    "gpt2": [_GPT2_PRE],
    "gpt-2": [_GPT2_PRE],
    "olmo": [_GPT2_PRE],
    "phi-2": [_GPT2_PRE],
    "jina-v2-es": [_GPT2_PRE],
    "jina-v2-de": [_GPT2_PRE],
    "llama3": [_LLAMA3_PRE],
    "llama-v3": [_LLAMA3_PRE],
    "llama-bpe": [_LLAMA3_PRE],
    "smaug-bpe": [_LLAMA3_PRE],
    "falcon": [_FALCON_PRE],
    "falcon3": [_LLAMA3_PRE],
    "chatglm-bpe": [_LLAMA3_PRE],
    "gpt-4o": [_GPT4O_PRE],
    "qwen2": [
        r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}"
        r"| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
    ],
    "deepseek-llm": [
        r"[\r\n]|\s?[A-Za-zµÀ-ÖØ-öø-ƺƼ-ƿǄ-ʓʕ-ʯͰ-ͳͶͷͻ-ͽͿΆΈ-ΊΌΎ-ΡΣ-ϵϷ-ҁҊ-ԯԱ-ՖႠ-ჅᎠ-Ᏽᏸ-ᏽᲐ-ᲺᲽ-Ჿᴀ-ᴫᵫ-ᵷᵹ-ᶚḀ-ἕἘ-Ἕἠ-ὅὈ-Ὅὐ-ὗὙὛὝὟ-ώᾀ-ᾴᾶ-ᾼιῂ-ῄῆ-ῌῐ-ΐῖ-Ίῠ-Ῥῲ-ῴῶ-ῼ︀-️︀-️\U000E0100-\U000E01EF]+"
        r"|\s?[!-/:-~！-／：-～‘-‟　-。]+|\s+$|[一-龥ࠀ-一가-퟿]+|\p{N}+"
    ],
}


@lru_cache(maxsize=1)
def byte_encoder() -> dict[int, str]:
    """GPT-2 byte -> printable-unicode mapping."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


@lru_cache(maxsize=1)
def byte_decoder() -> dict[str, int]:
    return {c: b for b, c in byte_encoder().items()}


class BPETokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.ranks: dict[tuple[str, str], int] = {}
        for i, m in enumerate(vocab.merges):
            a, _, b = m.partition(" ")
            self.ranks[(a, b)] = i
        pats = PRE_PATTERNS.get(vocab.pre, PRE_PATTERNS["default"])
        self._pre = [regex.compile(p) for p in pats]
        self._enc = byte_encoder()

    def _pretokenize(self, text: str) -> list[str]:
        words = [text]
        for pat in self._pre:
            words = [m for w in words for m in pat.findall(w)]
        return [w for w in words if w]

    def _bpe_word(self, word: str) -> list[str]:
        parts = [c for c in word]
        if len(parts) < 2:
            return parts
        while True:
            best_rank = None
            best_i = -1
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                return parts
            parts[best_i:best_i + 2] = [parts[best_i] + parts[best_i + 1]]

    def encode_fragment(self, text: str) -> list[int]:
        v = self.vocab
        out: list[int] = []
        for word in self._pretokenize(text):
            encoded = "".join(self._enc[b] for b in word.encode("utf-8"))
            for piece in self._bpe_word(encoded):
                tid = v.token_to_id.get(piece)
                if tid is not None:
                    out.append(tid)
                else:
                    # fall back to per-character lookup, then UNK
                    for ch in piece:
                        cid = v.token_to_id.get(ch)
                        if cid is not None:
                            out.append(cid)
                        elif v.unk_id >= 0:
                            out.append(v.unk_id)
        return out

    def decode_piece(self, tid: int) -> bytes:
        dec = byte_decoder()
        text = self.vocab.tokens[tid]
        try:
            return bytes(dec[c] for c in text)
        except KeyError:
            return text.encode("utf-8")
