"""Legacy RWKV v4 .bin containers: HF parity, quantized load, state carry,
vocab sidecars, and the legacy greedy tokenizer.

Reference behavior: /root/reference/otherarch/rwkv_v3.cpp (runtime + file
format), otherarch/rwkv_vocab.cpp (vocab sidecars), otherarch/utils.cpp
gpt_tokenize (greedy tokenizer).
"""
import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.gguf.legacy import (LegacyRwkvReader, load_rwkv_vocab)
from koboldcpp_tpu.gguf.sniff import FileFormat, check_file_format
from koboldcpp_tpu.models import rwkv4 as jrwkv4
from koboldcpp_tpu.models.loader import load_model

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_rwkv import convert_state_dict  # noqa: E402

TOKENS = np.array([[1, 5, 9, 42, 7, 300, 12, 4]], dtype=np.int32)


def _write_pile_vocab(path, n):
    """GPT-2-unicode-encoded lines (read_rwkv_vocab format)."""
    from koboldcpp_tpu.gguf.legacy import _gpt2_byte_encoder

    enc = _gpt2_byte_encoder()
    words = ["<|endoftext|>", "the", " the", " of", "ing", " a", "he", "t"]
    lines = []
    for i in range(n):
        w = words[i] if i < len(words) else f"tok{i}"
        lines.append("".join(enc[b] for b in w.encode("utf-8")))
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))


@pytest.fixture(scope="module")
def rwkv_pair(tmp_path_factory):
    import torch
    from transformers import RwkvConfig, RwkvForCausalLM

    torch.manual_seed(23)
    cfg = RwkvConfig(vocab_size=512, hidden_size=64, num_hidden_layers=2,
                     attention_hidden_size=64, intermediate_size=128,
                     context_length=256, use_cache=False)
    model = RwkvForCausalLM(cfg).eval().float()
    d = tmp_path_factory.mktemp("rwkv4")
    path = str(d / "rwkv4.bin")
    convert_state_dict(model.state_dict(), path, dtype="f32")
    _write_pile_vocab(str(d / "rwkv_vocab.embd"), 512)
    return model, path


def test_sniff_rwkv(rwkv_pair):
    _, path = rwkv_pair
    assert check_file_format(path) is FileFormat.RWKV_2


def test_rwkv4_hf_parity(rwkv_pair):
    import torch

    model, path = rwkv_pair
    m = load_model(path, packed=False, dtype=jnp.float32)
    assert m.cfg.arch == "rwkv4" and m.cfg.is_recurrent
    state = jrwkv4.init_state(m.cfg, 1)
    pos = jnp.broadcast_to(jnp.arange(TOKENS.shape[1]),
                           TOKENS.shape).astype(jnp.int32)
    logits, _ = jrwkv4.forward(m.params, m.cfg, jnp.asarray(TOKENS), pos,
                               state)
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=4e-3, atol=4e-3)


def test_rwkv4_state_carry(rwkv_pair):
    """Chunked eval with carried state == one-shot eval (prefill + decode)."""
    _, path = rwkv_pair
    m = load_model(path, packed=False, dtype=jnp.float32)
    toks = jnp.asarray(TOKENS)
    pos = jnp.broadcast_to(jnp.arange(TOKENS.shape[1]),
                           TOKENS.shape).astype(jnp.int32)
    full, _ = jrwkv4.forward(m.params, m.cfg, toks, pos,
                             jrwkv4.init_state(m.cfg, 1))

    state = jrwkv4.init_state(m.cfg, 1)
    outs = []
    split = 5
    logits, state = jrwkv4.forward(m.params, m.cfg, toks[:, :split],
                                   pos[:, :split], state)
    outs.append(np.asarray(logits))
    for t in range(split, TOKENS.shape[1]):
        logits, state = jrwkv4.forward(m.params, m.cfg, toks[:, t:t + 1],
                                       pos[:, t:t + 1], state)
        outs.append(np.asarray(logits))
    chunked = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(chunked, np.asarray(full), rtol=2e-4,
                               atol=2e-4)


def test_rwkv4_padded_rows_freeze_state(rwkv_pair):
    """Right-padding (position < 0) must not advance the recurrence."""
    _, path = rwkv_pair
    m = load_model(path, packed=False, dtype=jnp.float32)
    toks = jnp.asarray(TOKENS)
    pos = jnp.broadcast_to(jnp.arange(TOKENS.shape[1]),
                           TOKENS.shape).astype(jnp.int32)
    _, ref_state = jrwkv4.forward(m.params, m.cfg, toks, pos,
                                  jrwkv4.init_state(m.cfg, 1))

    pad = 4
    toks_p = jnp.concatenate(
        [toks, jnp.zeros((1, pad), jnp.int32)], axis=1)
    pos_p = jnp.concatenate(
        [pos, jnp.full((1, pad), -1, jnp.int32)], axis=1)
    logits_p, state_p = jrwkv4.forward(
        m.params, m.cfg, toks_p, pos_p, jrwkv4.init_state(m.cfg, 1),
        last_index=jnp.array([TOKENS.shape[1] - 1], jnp.int32))
    for f in ("att_shift", "ffn_shift", "aa", "bb", "pp"):
        np.testing.assert_allclose(np.asarray(getattr(state_p, f)),
                                   np.asarray(getattr(ref_state, f)),
                                   rtol=1e-5, atol=1e-5)


def test_rwkv4_quantized_q8_0(rwkv_pair):
    """q8_0 .bin (version-101/modern layouts) loads and tracks f32 logits."""
    import torch
    model, fpath = rwkv_pair
    d = os.path.dirname(fpath)
    path = os.path.join(d, "rwkv4_q8.bin")
    convert_state_dict(model.state_dict(), path, dtype="f16", quant="q8_0")
    m = load_model(path, packed=False, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(TOKENS.shape[1]),
                           TOKENS.shape).astype(jnp.int32)
    logits, _ = jrwkv4.forward(m.params, m.cfg, jnp.asarray(TOKENS), pos,
                               jrwkv4.init_state(m.cfg, 1))
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    # quantized weights: rank correlation on the last-token logits
    a = np.asarray(logits)[0, -1]
    b = ref[0, -1]
    assert np.corrcoef(a, b)[0, 1] > 0.99


def test_rwkv4_engine_generates(rwkv_pair):
    from koboldcpp_tpu.engine.engine import Engine, GenParams
    from koboldcpp_tpu.sampling.samplers import SamplerParams

    _, path = rwkv_pair
    m = load_model(path, packed=False, dtype=jnp.float32)
    eng = Engine(m, max_context=256)
    gp = GenParams(max_length=8, sampler=SamplerParams(temperature=0.0,
                                                       rep_pen=1.0, top_k=1))
    out = eng.generate("the of the", gp)
    assert isinstance(out.text, str)
    # full-prefix reuse: second call continuing the same text fast-forwards
    out2 = eng.generate("the of the" + out.text,
                        GenParams(max_length=4,
                                  sampler=SamplerParams(temperature=0.0,
                                                        rep_pen=1.0, top_k=1)))
    assert isinstance(out2.text, str)


def test_rwkv4_vocab_sidecar_and_greedy_tokenizer(rwkv_pair):
    _, path = rwkv_pair
    with LegacyRwkvReader(path) as r:
        md = r.metadata
        assert md["tokenizer.ggml.model"] == "kcpp_legacy_greedy"
        toks = md["tokenizer.ggml.tokens"]
        assert toks[0] == "<|endoftext|>" and toks[1] == "the"
    from koboldcpp_tpu.tokenizers.tokenizer import Tokenizer

    tk = Tokenizer.from_metadata(md)
    # "the the" -> "the"(1), " the"(2); greedy longest-match picks " the"
    ids = tk.encode("the the", add_bos=False)
    assert ids == [1, 2]
    assert tk.decode(ids) == "the the"
    # special token matched before the regex split
    ids2 = tk.encode("the<|endoftext|>", add_bos=False, parse_special=True)
    assert ids2 == [1, 0]


def test_rwkv4_world_vocab_parse(tmp_path):
    p = tmp_path / "rwkv_world_vocab.embd"
    words = [b"\x00", b"the", b" the", b"\n"]
    with open(p, "w") as f:
        f.write("\n".join(w.hex() for w in words))
    toks = load_rwkv_vocab(str(p), world=True)
    assert toks[0] == "<<UNUSED_TOKEN>>"
    assert toks[2] == "the"
    from koboldcpp_tpu.tokenizers.rwkv import unescape_rwkv_token

    assert unescape_rwkv_token(toks[1]) == b"\x00"
    assert unescape_rwkv_token(toks[4]) == b"\n"
