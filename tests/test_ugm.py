"""UGM (unigram/T5) tokenizer: Viterbi parity vs HF tokenizers' Unigram model,
plus the XCDA precompiled-charsmap normalization path."""
import struct

import numpy as np
import pytest

from koboldcpp_tpu.tokenizers import Tokenizer
from koboldcpp_tpu.tokenizers.vocab import vocab_from_metadata

PIECES = [
    ("<unk>", 0.0), ("<s>", 0.0), ("</s>", 0.0),
    ("▁", -3.0), ("▁the", -4.2), ("▁quick", -7.1), ("▁brown", -7.3),
    ("▁fox", -7.0), ("the", -5.5), ("quick", -8.8), ("q", -9.0),
    ("u", -8.5), ("i", -7.9), ("c", -8.1), ("k", -8.6), ("t", -7.7),
    ("h", -8.0), ("e", -7.2), ("b", -8.2), ("r", -7.8), ("o", -7.6),
    ("w", -8.4), ("n", -7.5), ("f", -8.3), ("x", -9.2), ("▁f", -6.5),
    ("ox", -8.0), ("▁q", -6.9), ("uick", -8.2),
]


def ugm_md(charsmap: bytes | None = None):
    toktypes = [2, 3, 3] + [1] * (len(PIECES) - 3)  # unk, control, control
    md = {
        "tokenizer.ggml.model": "t5",
        "tokenizer.ggml.tokens": [p for p, _ in PIECES],
        "tokenizer.ggml.scores": np.array([s for _, s in PIECES], np.float32),
        "tokenizer.ggml.token_type": np.array(toktypes, np.int32),
        "tokenizer.ggml.bos_token_id": np.uint32(1),
        "tokenizer.ggml.eos_token_id": np.uint32(2),
        "tokenizer.ggml.unknown_token_id": np.uint32(0),
        "tokenizer.ggml.add_bos_token": False,
        "tokenizer.ggml.add_eos_token": False,
        "tokenizer.ggml.add_space_prefix": True,
        "tokenizer.ggml.remove_extra_whitespaces": False,
    }
    if charsmap is not None:
        md["tokenizer.ggml.precompiled_charsmap"] = np.frombuffer(
            charsmap, np.uint8)
    return md


def hf_unigram():
    from tokenizers import Tokenizer as HFTokenizer
    from tokenizers.models import Unigram
    from tokenizers.pre_tokenizers import Metaspace

    tk = HFTokenizer(Unigram(list(PIECES), unk_id=0, byte_fallback=False))
    tk.pre_tokenizer = Metaspace(replacement="▁", prepend_scheme="first")
    return tk


@pytest.mark.parametrize("text", [
    "the quick brown fox",
    "quick",
    "thethethe",
    "fox fox   fox",
    "qqqq",
])
def test_ugm_viterbi_matches_hf(text):
    ours = Tokenizer(vocab_from_metadata(ugm_md()))
    ids = ours.encode(text, add_bos=False, add_eos=False)
    hf_ids = hf_unigram().encode(text).ids
    assert ids == hf_ids, (ids, hf_ids, text)


def test_ugm_unknown_merging():
    """Characters absent from the vocab become a single merged <unk> run
    (llama-vocab.cpp:1181-1192)."""
    ours = Tokenizer(vocab_from_metadata(ugm_md()))
    ids = ours.encode("the ZZZ fox", add_bos=False, add_eos=False)
    assert ids.count(0) == 1  # consecutive unknowns merged
    # structure: ▁the, ▁(space), unk-run, ▁fox
    assert ids[0] == 4 and ids[-1] == 7


def make_xcda_charsmap(char: bytes, replacement: bytes) -> bytes:
    """Hand-build a minimal XCDA blob mapping one input byte to a replacement
    string (layout per xcda_array_view, llama-vocab.cpp:1250-1286)."""
    c = char[0]
    base0 = 4
    child = base0 ^ c
    vnode = child + 1
    n_nodes = vnode + 1
    nodes = [0] * n_nodes
    nodes[0] = base0 << 10
    nodes[child] = ((child ^ vnode) << 10) | (1 << 8) | c  # leaf, lcheck=c
    nodes[vnode] = (1 << 31) | 0  # replacement offset 0
    blob = struct.pack("<I", n_nodes * 4)
    blob += b"".join(struct.pack("<I", n) for n in nodes)
    blob += replacement + b"\x00"
    return blob


def test_ugm_precompiled_charsmap():
    """The charsmap rewrites matched prefixes before the Viterbi pass
    (normalize_prefix, llama-vocab.cpp:1296)."""
    cs = make_xcda_charsmap(b"Z", b"the")
    ours = Tokenizer(vocab_from_metadata(ugm_md(cs)))
    plain = Tokenizer(vocab_from_metadata(ugm_md()))
    assert (ours.encode("Z quick", add_bos=False, add_eos=False)
            == plain.encode("the quick", add_bos=False, add_eos=False))
    # unmatched bytes still pass through
    assert (ours.encode("the fox", add_bos=False, add_eos=False)
            == plain.encode("the fox", add_bos=False, add_eos=False))
