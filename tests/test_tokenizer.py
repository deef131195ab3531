"""Tokenizer tests: hand-built SPM vocab (merge-order semantics) and a
byte-level BPE cross-check against transformers' GPT2Tokenizer as oracle."""
import json

import numpy as np
import pytest

from koboldcpp_tpu.gguf.constants import TokenType
from koboldcpp_tpu.tokenizers import Tokenizer, Vocab
from koboldcpp_tpu.tokenizers.bpe import byte_encoder


def make_spm_vocab(extra=()):
    tokens = ["<unk>", "<s>", "</s>"]
    types = [TokenType.UNKNOWN, TokenType.CONTROL, TokenType.CONTROL]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(TokenType.BYTE)
        scores.append(0.0)
    pieces = [
        ("▁", -2.0), ("h", -10.0), ("e", -10.1), ("l", -10.2), ("o", -10.3),
        ("he", -5.0), ("ll", -5.5), ("llo", -5.2), ("hello", -4.0),
        ("▁h", -6.0), ("▁he", -5.8), ("▁hel", -5.6), ("▁hell", -5.4),
        ("▁hello", -3.0),
        ("w", -11.0), ("r", -11.1), ("d", -11.2),
        ("▁w", -6.1), ("▁wo", -5.9), ("▁wor", -5.7), ("▁worl", -5.5),
        ("▁world", -3.5),
    ] + list(extra)
    for p, s in pieces:
        tokens.append(p)
        types.append(TokenType.NORMAL)
        scores.append(s)
    return Vocab(
        model="llama", pre="default", tokens=tokens,
        scores=np.array(scores, np.float32),
        token_types=np.array([int(t) for t in types], np.int32),
        bos_id=1, eos_id=2, unk_id=0, add_bos=True, add_space_prefix=True,
    )


def test_spm_basic_merge():
    tok = Tokenizer(make_spm_vocab())
    v = tok.vocab
    ids = tok.encode("hello world", add_bos=False)
    # "▁hello" and "▁world" are whole pieces
    assert [v.tokens[i] for i in ids] == ["▁hello", "▁world"]
    assert tok.decode(ids) == "hello world"


def test_spm_bos_and_byte_fallback():
    tok = Tokenizer(make_spm_vocab())
    v = tok.vocab
    ids = tok.encode("hello Z")
    assert ids[0] == v.bos_id
    # Z has no piece → byte fallback <0x5A>
    assert v.tokens[ids[-1]] == "<0x5A>"
    assert tok.decode(ids) == "hello Z"


def test_spm_special_token_partition():
    tok = Tokenizer(make_spm_vocab())
    v = tok.vocab
    ids = tok.encode("hello</s>hello", add_bos=False)
    assert v.eos_id in ids
    i = ids.index(v.eos_id)
    assert tok.decode(ids[:i]) == "hello"


def test_spm_score_priority():
    # "hello" could merge as he+llo or hello; highest-score merged piece wins
    tok = Tokenizer(make_spm_vocab())
    v = tok.vocab
    ids = tok.encode("hello", add_bos=False, parse_special=False)
    assert [v.tokens[i] for i in ids] == ["▁hello"]


def test_spm_roundtrip_unicode():
    tok = Tokenizer(make_spm_vocab())
    s = "hello wörld 漢字 🎉"
    ids = tok.encode(s, add_bos=False)
    assert tok.decode(ids) == s


@pytest.fixture(scope="module")
def gpt2_pair(tmp_path_factory):
    """Tiny byte-level BPE: build vocab.json/merges.txt, load with transformers
    as the oracle, and the same vocab through our GGUF-style Vocab."""
    from transformers import GPT2Tokenizer

    enc = byte_encoder()
    base = [enc[b] for b in range(256)]
    merges = [
        ("h", "e"), ("l", "l"), ("he", "ll"), ("o", "Ġ"), ("hell", "o"),
        ("Ġ", "w"), ("Ġw", "o"), ("Ġwo", "r"), ("Ġwor", "l"), ("Ġworl", "d"),
        ("e", "s"), ("t", "es"), ("tes", "t"),
    ]
    tokens = list(base)
    for a, b in merges:
        tokens.append(a + b)
    vocab_json = {t: i for i, t in enumerate(tokens)}
    d = tmp_path_factory.mktemp("gpt2")
    (d / "vocab.json").write_text(json.dumps(vocab_json))
    # trailing newline matters: HF drops the final split element
    (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n")
    oracle = GPT2Tokenizer(str(d / "vocab.json"), str(d / "merges.txt"))

    v = Vocab(
        model="gpt2", pre="gpt2", tokens=tokens,
        scores=np.zeros(len(tokens), np.float32),
        token_types=np.full(len(tokens), int(TokenType.NORMAL), np.int32),
        merges=[f"{a} {b}" for a, b in merges],
        bos_id=-1, eos_id=-1, unk_id=-1, add_bos=False, add_space_prefix=False,
    )
    return oracle, Tokenizer(v)


@pytest.mark.parametrize("text", [
    "hello world",
    "test hello",
    "  spaces   and\ttabs\n",
    "punct! 123 mixed-case HELLO",
    "unicode: héllo wörld 漢字",
])
def test_bpe_matches_gpt2_oracle(gpt2_pair, text):
    oracle, ours = gpt2_pair
    assert ours.encode(text, add_bos=False) == oracle.encode(text)
    assert ours.decode(ours.encode(text, add_bos=False)) == text


def _mk_bpe_vocab(pre, tokens=None, merges=None):
    from koboldcpp_tpu.tokenizers.vocab import Vocab

    toks = tokens or ["a", "b", "c", "ab", "abc", "1", "2", "3", "Ġ", "Ġa"]
    return Vocab(model="gpt2", pre=pre, tokens=toks,
                 scores=[0.0] * len(toks), token_types=[1] * len(toks),
                 merges=(merges if merges is not None else ["a b", "ab c"]),
                 bos_id=-1, eos_id=-1,
                 unk_id=-1, add_bos=False, add_eos=False,
                 add_space_prefix=False)


def test_pre_split_keeps_gaps():
    """Multi-regex lists use split-and-keep semantics (unicode_regex_split):
    starcoder's leading \\p{N} pass isolates each digit, including from
    fragments a later regex wouldn't match."""
    from koboldcpp_tpu.tokenizers.bpe import BPETokenizer

    t = BPETokenizer(_mk_bpe_vocab("starcoder"))
    words = t._pretokenize("ab12c")
    assert words == ["ab", "1", "2", "c"]
    # gpt2 single-regex behavior unchanged
    t2 = BPETokenizer(_mk_bpe_vocab("gpt2"))
    assert t2._pretokenize("ab12c") == ["ab12c"[:2], "12", "c"]


def test_pre_unknown_raises():
    import pytest as _pytest
    from koboldcpp_tpu.tokenizers.bpe import BPETokenizer

    with _pytest.raises(ValueError, match="unknown tokenizer.ggml.pre"):
        BPETokenizer(_mk_bpe_vocab("totally-new-model"))


def test_pre_all_patterns_compile():
    import regex as _regex
    from koboldcpp_tpu.tokenizers.bpe import PRE_PATTERNS

    for name, pats in PRE_PATTERNS.items():
        for p in pats:
            _regex.compile(p)


def test_ignore_merges_whole_word():
    """llama3/tekken: a whole pretokenized word present in the vocab is
    emitted directly without the merge walk (llama-vocab.cpp:777)."""
    from koboldcpp_tpu.tokenizers.bpe import BPETokenizer

    # vocab contains "abc" but NO merges to reach it
    v = _mk_bpe_vocab("llama3", merges=[])
    t = BPETokenizer(v)
    assert t.encode_fragment("abc") == [4]  # direct hit
    v2 = _mk_bpe_vocab("gpt2", merges=[])
    t2 = BPETokenizer(v2)
    assert t2.encode_fragment("abc") == [0, 1, 2]  # per-char fallback
