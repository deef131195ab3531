"""Native C++ helper library: builds, loads, and agrees with Python fallbacks."""
import numpy as np
import pytest

from koboldcpp_tpu.utils import native


def test_library_builds_and_loads():
    lib = native.get_lib()
    assert lib is not None, "native library should build (g++ is in the image)"


def _py_lcr(a, b):
    if not len(a) or not len(b):
        return 0, 0, 0
    A = np.asarray(a)[:, None]
    B = np.asarray(b)[None, :]
    eq = (A == B).astype(np.int32)
    run = np.zeros_like(eq)
    run[0, :] = eq[0, :]
    run[:, 0] = eq[:, 0]
    for i in range(1, eq.shape[0]):
        run[i, 1:] = (run[i - 1, :-1] + 1) * eq[i, 1:]
    idx = np.unravel_index(np.argmax(run), run.shape)
    ln = int(run[idx])
    return ln, int(idx[0]) - ln + 1, int(idx[1]) - ln + 1


def test_longest_common_run_matches_reference_dp():
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = rng.integers(0, 5, rng.integers(1, 40)).tolist()
        b = rng.integers(0, 5, rng.integers(1, 40)).tolist()
        ln, ia, ib = native.longest_common_run(a, b)
        ref_ln, _, _ = _py_lcr(a, b)
        assert ln == ref_ln
        if ln:
            assert a[ia:ia + ln] == b[ib:ib + ln]


def test_dry_repeat_scan_example():
    # the documented example from the reference (gpttype_adapter.cpp:829-835):
    # tokens a b c c b c y a b c -> repeat counts 0 0 3 1 0 2 0 0 0 0
    t = {"a": 1, "b": 2, "c": 3, "y": 4}
    toks = [t[c] for c in "abccbcyabc"]
    out = native.dry_repeat_scan(toks, rep_limit=len(toks))
    assert out.tolist() == [0, 0, 3, 1, 0, 2, 0, 0, 0, 0]


def test_dry_repeat_scan_native_vs_python(monkeypatch):
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 4, 200).tolist()
    got_native = native.dry_repeat_scan(toks, 50)
    # force python fallback
    monkeypatch.setattr(native, "_lib", False)
    got_py = native.dry_repeat_scan(toks, 50)
    np.testing.assert_array_equal(got_native, got_py)


def test_find_first_stop():
    assert native.find_first_stop("hello world", ["world", "lo"]) == 3
    assert native.find_first_stop("hello", ["xyz"]) is None
    assert native.find_first_stop("héllo wörld", ["wörld"]) == 6
    assert native.find_first_stop("", ["x"]) is None


def test_common_prefix():
    assert native.common_prefix([1, 2, 3, 4], [1, 2, 9]) == 2
    assert native.common_prefix([], [1]) == 0
    assert native.common_prefix([5, 6], [5, 6]) == 2


def test_native_spm_matches_python():
    """C++ SPM core must produce identical tokenization to the Python path."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_tokenizer import make_spm_vocab
    from koboldcpp_tpu.tokenizers.spm import SPMTokenizer, SPM_SPACE

    vocab = make_spm_vocab()
    tok = SPMTokenizer(vocab)
    assert tok._native is not None, "native SPM should load"

    texts = ["hello", "▁hello▁world", "hello wörld 漢字 🎉".replace(" ", SPM_SPACE),
             "", "Z", "▁hello" * 50]
    for t in texts:
        native_ids = tok.encode_fragment(t)
        tok._native = None
        py_ids = tok.encode_fragment(t)
        # restore for next round
        tok2 = SPMTokenizer(vocab)
        tok._native = tok2._native
        assert native_ids == py_ids, f"mismatch on {t!r}"


def test_native_trie_rwkv_matches_python():
    from koboldcpp_tpu.tokenizers.rwkv import RWKVTokenizer
    from koboldcpp_tpu.tokenizers.vocab import vocab_from_metadata
    import numpy as np

    tokens = ["<s>", "h", "e", "l", "o", " ", "he", "hell", "hello", "ll",
              r"\xe4\xb8\xad", "wo", "r", "d", "world"]
    md = {"tokenizer.ggml.model": "rwkv", "tokenizer.ggml.tokens": tokens,
          "tokenizer.ggml.token_type": np.array([3] + [1] * 14, np.int32),
          "tokenizer.ggml.bos_token_id": np.uint32(0),
          "tokenizer.ggml.eos_token_id": np.uint32(0),
          "tokenizer.ggml.add_bos_token": False}
    tk = RWKVTokenizer(vocab_from_metadata(md))
    assert tk._native is not None, "native trie should build here"
    for text in ("hello world", "中 hello", "zzz", ""):
        native = tk.encode_fragment(text)
        tk2 = RWKVTokenizer(vocab_from_metadata(md))
        tk2._native = None
        assert native == tk2.encode_fragment(text), text


def test_native_trie_ugm_matches_python():
    from koboldcpp_tpu.tokenizers.ugm import UGMTokenizer
    from koboldcpp_tpu.tokenizers.vocab import vocab_from_metadata
    import numpy as np
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_ugm import ugm_md

    tk = UGMTokenizer(vocab_from_metadata(ugm_md()))
    assert tk._native is not None
    for text in ("the quick brown fox", "qqqq", "the ZZZ fox", "fox fox   fox"):
        native = tk.encode_fragment(text)
        tk2 = UGMTokenizer(vocab_from_metadata(ugm_md()))
        tk2._native = None
        python = tk2.encode_fragment(text)
        assert native == python, (text, native, python)
