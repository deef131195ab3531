"""WPM (BERT WordPiece) tokenizer vs transformers BertTokenizer oracle.

The GGUF BERT vocab stores word-starts with a U+2581 prefix and bare
continuations; the HF vocab.txt uses bare word-starts and ##-continuations.
The test builds both encodings of the SAME piece list with aligned ids.
"""
import numpy as np
import pytest

from koboldcpp_tpu.tokenizers import Tokenizer

SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
WORD_STARTS = ["the", "quick", "brown", "fox", "jump", "run", "over",
               "lazy", "dog", ".", ",", "!", "a", "un", "know"]
CONTINUATIONS = ["es", "ed", "s", "ning", "ny", "er"]


def gguf_md():
    toks = (SPECIALS + ["▁" + w for w in WORD_STARTS] + CONTINUATIONS)
    types = [3] * len(SPECIALS) + [1] * (len(toks) - len(SPECIALS))
    return {
        "tokenizer.ggml.model": "bert",
        "tokenizer.ggml.tokens": toks,
        "tokenizer.ggml.scores": np.zeros(len(toks), np.float32),
        "tokenizer.ggml.token_type": np.array(types, np.int32),
        "tokenizer.ggml.unknown_token_id": np.uint32(1),
        "tokenizer.ggml.cls_token_id": np.uint32(2),
        "tokenizer.ggml.seperator_token_id": np.uint32(3),
        "tokenizer.ggml.padding_token_id": np.uint32(0),
        "tokenizer.ggml.add_bos_token": True,
        "tokenizer.ggml.add_eos_token": True,
    }


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    from transformers import BertTokenizer

    vocab = SPECIALS + WORD_STARTS + ["##" + c for c in CONTINUATIONS]
    path = tmp_path_factory.mktemp("wpm") / "vocab.txt"
    path.write_text("\n".join(vocab) + "\n")
    return BertTokenizer(str(path), do_lower_case=True)


@pytest.mark.parametrize("text", [
    "The quick brown foxes jumped!",
    "running runs.",
    "unknownword over the lazy dog",
    "The DOG, a fox.",
    "runner unknowns",
    "  spaced   out  ",
])
def test_wpm_matches_bert(oracle, text):
    tok = Tokenizer.from_metadata(gguf_md())
    ours = tok.encode(text)
    ref = oracle(text)["input_ids"]
    assert ours == ref, (ours, ref, oracle.convert_ids_to_tokens(ref))


def test_wpm_decode():
    tok = Tokenizer.from_metadata(gguf_md())
    ids = tok.encode("the quick fox", add_bos=False, add_eos=False)
    assert tok.decode(ids).strip() == "the quick fox"
