"""Legacy pre-GGUF container loading (GGML/GGMF/GGJT v1-v3): file parsing,
name translation, per-era quant layouts, end-to-end logits vs the HF model.

File/block layouts mirror the reference structs:
- container: llama_v3_file_loader (otherarch/llama_v3.cpp:502-650)
- v1 Q4_0/Q4_1: f32 scale + interleaved nibbles (otherarch/ggml_v1.c:532)
- v2 Q4_0/Q4_1/Q8_0: f32 scales + half-split nibbles (otherarch/ggml_v2.c)
- v3: modern GGUF layouts
"""
import struct

import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.gguf.legacy import LegacyLlamaReader, translate_name
from koboldcpp_tpu.gguf.sniff import FileFormat, check_file_format
from koboldcpp_tpu.models.loader import load_model

_REV_NAME = {
    "token_embd.weight": "tok_embeddings.weight",
    "output_norm.weight": "norm.weight",
    "output.weight": "output.weight",
}
_REV_LAYER = {
    "attn_q.weight": "attention.wq.weight",
    "attn_k.weight": "attention.wk.weight",
    "attn_v.weight": "attention.wv.weight",
    "attn_output.weight": "attention.wo.weight",
    "attn_norm.weight": "attention_norm.weight",
    "ffn_gate.weight": "feed_forward.w1.weight",
    "ffn_down.weight": "feed_forward.w2.weight",
    "ffn_up.weight": "feed_forward.w3.weight",
    "ffn_norm.weight": "ffn_norm.weight",
}


def legacy_name(gguf_name: str) -> str:
    if gguf_name in _REV_NAME:
        return _REV_NAME[gguf_name]
    _, idx, rest = gguf_name.split(".", 2)
    return f"layers.{idx}.{_REV_LAYER[rest]}"


def q4_0_v1(x):  # f32 d + interleaved nibbles
    blocks = x.reshape(-1, 32)
    amax_i = np.argmax(np.abs(blocks), axis=1)
    d = blocks[np.arange(len(blocks)), amax_i] / -8.0
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.clip(np.round(blocks * inv[:, None]) + 8, 0, 15).astype(np.uint8)
    lo, hi = q[:, 0::2], q[:, 1::2]
    packed = (lo | (hi << 4)).astype(np.uint8)
    out = np.empty((len(blocks), 20), np.uint8)
    out[:, :4] = d.astype(np.float32)[:, None].view(np.uint8)
    out[:, 4:] = packed
    return out.tobytes(), d[:, None] * (q.astype(np.float32) - 8)


def q4_0_v2(x):  # f32 d + half-split nibbles
    blocks = x.reshape(-1, 32)
    amax_i = np.argmax(np.abs(blocks), axis=1)
    d = blocks[np.arange(len(blocks)), amax_i] / -8.0
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.clip(np.round(blocks * inv[:, None]) + 8, 0, 15).astype(np.uint8)
    lo, hi = q[:, :16], q[:, 16:]
    packed = (lo | (hi << 4)).astype(np.uint8)
    out = np.empty((len(blocks), 20), np.uint8)
    out[:, :4] = d.astype(np.float32)[:, None].view(np.uint8)
    out[:, 4:] = packed
    return out.tobytes(), d[:, None] * (q.astype(np.float32) - 8)


def write_legacy(path, state_gguf: dict, n_vocab, n_embd, n_mult, n_head,
                 n_layer, n_rot, version=3, quant=None):
    """state_gguf: {gguf_name: np.float32 array (2-D weights or 1-D norms)}.
    quant: None (f32/f16) or one of the q4_0 packers above for 2-D weights."""
    magic = {0: 0x67676D6C, 1: 0x67676D66}.get(0 if version == 0 else None,
                                               0x67676A74)
    buf = bytearray()
    if version == 0:
        buf += struct.pack("<I", 0x67676D6C)
    elif version == -1:  # GGMF
        buf += struct.pack("<II", 0x67676D66, 1)
    else:
        buf += struct.pack("<II", 0x67676A74, version)
    buf += struct.pack("<7I", n_vocab, n_embd, n_mult, n_head, n_layer,
                       n_rot, 0)
    for i in range(n_vocab):
        tok = f"tok{i}".encode()
        buf += struct.pack("<I", len(tok)) + tok
        if version != 0:  # GGML v1 has no scores
            buf += struct.pack("<f", -float(i))
    aligned = version >= 1
    for name, arr in state_gguf.items():
        lname = legacy_name(name).encode()
        arr = np.asarray(arr, np.float32)
        if quant is not None and arr.ndim == 2 and arr.shape[1] % 32 == 0:
            data, _ = quant(arr)
            ttype = 2  # Q4_0
        elif arr.ndim >= 2:
            data = arr.astype(np.float16).tobytes()
            ttype = 1
        else:
            data = arr.tobytes()
            ttype = 0
        ne = tuple(reversed(arr.shape))
        buf += struct.pack("<3I", arr.ndim, len(lname), ttype)
        buf += struct.pack(f"<{arr.ndim}I", *ne)
        buf += lname
        if aligned:
            buf += b"\x00" * ((-len(buf)) % 32)
        buf += data
    with open(path, "wb") as f:
        f.write(bytes(buf))


@pytest.fixture(scope="module")
def tiny_llama():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_hf import permute_qk

    torch.manual_seed(6)
    cfg = LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4, max_position_embeddings=128,
                      rms_norm_eps=1e-6, tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    # build the GGUF-name view with the q/k rope permute the converter applies
    g = {"token_embd.weight": state["model.embed_tokens.weight"],
         "output_norm.weight": state["model.norm.weight"],
         "output.weight": state["lm_head.weight"]}
    for i in range(cfg.num_hidden_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        g[gp + "attn_q.weight"] = permute_qk(
            state[hp + "self_attn.q_proj.weight"], cfg.num_attention_heads)
        g[gp + "attn_k.weight"] = permute_qk(
            state[hp + "self_attn.k_proj.weight"], cfg.num_key_value_heads)
        g[gp + "attn_v.weight"] = state[hp + "self_attn.v_proj.weight"]
        g[gp + "attn_output.weight"] = state[hp + "self_attn.o_proj.weight"]
        g[gp + "attn_norm.weight"] = state[hp + "input_layernorm.weight"]
        g[gp + "ffn_norm.weight"] = state[hp + "post_attention_layernorm.weight"]
        g[gp + "ffn_gate.weight"] = state[hp + "mlp.gate_proj.weight"]
        g[gp + "ffn_up.weight"] = state[hp + "mlp.up_proj.weight"]
        g[gp + "ffn_down.weight"] = state[hp + "mlp.down_proj.weight"]
    return model, cfg, g


TOKENS = np.array([[1, 5, 9, 42, 7, 300]], dtype=np.int32)
# n_mult chosen so the legacy n_ff formula reproduces intermediate_size=96:
# ((2*(4*64)//3 + 31)//32)*32 = ((170+31)//32)*32 = 192... pick n_mult to hit 96
N_MULT = 96  # ((170+95)//96)*96 = 192? -> computed in test


def _hf_logits(model):
    import torch

    with torch.no_grad():
        return model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()


def _run(path):
    m = load_model(path, packed=False, dtype=jnp.float32)
    from koboldcpp_tpu.kv.cache import init_cache
    from koboldcpp_tpu.models import llama as jllama

    cache = init_cache(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads, m.cfg.head_dim,
                       dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(TOKENS.shape[1]), TOKENS.shape).astype(jnp.int32)
    logits, _ = jllama.forward(m.params, m.cfg, jnp.asarray(TOKENS), pos, cache)
    return m, np.asarray(logits)


def test_ggjt3_f16(tmp_path, tiny_llama):
    model, cfg, g = tiny_llama
    path = str(tmp_path / "legacy_v3.bin")
    write_legacy(path, g, 512, 64, 32, 4, 2, 16, version=3)
    assert check_file_format(path) is FileFormat.GGJT_3
    m, ours = _run(path)
    assert m.cfg.arch == "llama" and m.cfg.n_layers == 2
    # n_ff from n_mult formula may exceed actual; tensor shapes rule
    np.testing.assert_allclose(ours, _hf_logits(model), rtol=2e-2, atol=2e-2)


def test_ggjt2_q4_0(tmp_path, tiny_llama):
    model, cfg, g = tiny_llama
    path = str(tmp_path / "legacy_v2.bin")
    write_legacy(path, g, 512, 64, 32, 4, 2, 16, version=2, quant=q4_0_v2)
    assert check_file_format(path) is FileFormat.GGJT_2
    m, ours = _run(path)
    ref = _hf_logits(model)
    # Q4 noise: check strong correlation + same top-1 on most positions
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.98, corr


def test_ggjt1_q4_0_interleaved(tmp_path, tiny_llama):
    model, cfg, g = tiny_llama
    path = str(tmp_path / "legacy_v1.bin")
    write_legacy(path, g, 512, 64, 32, 4, 2, 16, version=1, quant=q4_0_v1)
    assert check_file_format(path) is FileFormat.GGJT
    m, ours = _run(path)
    ref = _hf_logits(model)
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.98, corr


def test_legacy_vocab_and_names(tmp_path, tiny_llama):
    _, cfg, g = tiny_llama
    path = str(tmp_path / "legacy_names.bin")
    write_legacy(path, g, 512, 64, 32, 4, 2, 16, version=3)
    with LegacyLlamaReader(path) as r:
        assert r.metadata["tokenizer.ggml.model"] == "llama"
        assert len(r.metadata["tokenizer.ggml.tokens"]) == 512
        assert float(r.metadata["tokenizer.ggml.scores"][3]) == -3.0
        assert "blk.0.attn_q.weight" in r.tensors
        assert "token_embd.weight" in r.tensors
    assert translate_name("layers.1.feed_forward.w3.weight") == "blk.1.ffn_up.weight"
