"""Model forward parity: our GGUF->JAX llama vs transformers' LlamaForCausalLM
on identical random weights (loader + permute + rope + GQA + SwiGLU end-to-end),
plus packed-quantized forward consistency."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.gguf import GGMLType
from koboldcpp_tpu.gguf.constants import TokenType
from koboldcpp_tpu.kv.cache import init_cache
from koboldcpp_tpu.models import llama as jllama
from koboldcpp_tpu.models.loader import load_model

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_hf import convert_llama_state_dict  # noqa: E402


def tiny_tokenizer_md(vocab_size):
    """SPM-style test vocab: specials + full byte-fallback range + filler
    pieces. Needs vocab_size >= 300 for the byte tokens to fit."""
    toks = ["<unk>", "<s>", "</s>"]
    types = [int(TokenType.UNKNOWN), int(TokenType.CONTROL), int(TokenType.CONTROL)]
    if vocab_size >= 3 + 256:
        toks += [f"<0x{b:02X}>" for b in range(256)]
        types += [int(TokenType.BYTE)] * 256
    toks += [f"tok{i}" for i in range(vocab_size - len(toks))]
    types += [int(TokenType.NORMAL)] * (vocab_size - len(types))
    return {
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": toks,
        "tokenizer.ggml.scores": np.zeros(vocab_size, np.float32),
        "tokenizer.ggml.token_type": np.array(types, np.int32),
        "tokenizer.ggml.bos_token_id": np.uint32(1),
        "tokenizer.ggml.eos_token_id": np.uint32(2),
    }


@pytest.fixture(scope="module")
def hf_and_gguf(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    convert_llama_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    return model, path


def _run_ours(path, tokens, dtype=jnp.float32, packed=False):
    m = load_model(path, packed=packed, dtype=dtype)
    B, T = tokens.shape
    cache = init_cache(m.cfg.n_layers, B, 64, m.cfg.n_kv_heads, m.cfg.head_dim,
                       dtype=dtype)
    positions = jnp.broadcast_to(jnp.arange(T), (B, T))
    logits, _ = jllama.forward(m.params, m.cfg, jnp.asarray(tokens), positions, cache)
    return np.asarray(logits)


def test_logits_match_hf(hf_and_gguf):
    import torch

    model, path = hf_and_gguf
    tokens = np.array([[1, 5, 9, 42, 7, 100, 3, 250]], dtype=np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    ours = _run_ours(path, tokens, dtype=jnp.float32)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_logits_match_hf_batch(hf_and_gguf):
    import torch

    model, path = hf_and_gguf
    tokens = np.array([[1, 5, 9, 42], [7, 100, 3, 250]], dtype=np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    ours = _run_ours(path, tokens, dtype=jnp.float32)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_incremental_decode_matches_full(hf_and_gguf):
    """Prefill then 1-token steps must give the same logits as one full pass."""
    _, path = hf_and_gguf
    m = load_model(path, packed=False, dtype=jnp.float32)
    tokens = np.array([[1, 5, 9, 42, 7, 100]], dtype=np.int32)
    full = _run_ours(path, tokens)

    cache = init_cache(m.cfg.n_layers, 1, 64, m.cfg.n_kv_heads, m.cfg.head_dim,
                       dtype=jnp.float32)
    # prefill first 3
    pos = jnp.arange(3)[None, :]
    logits, cache = jllama.forward(m.params, m.cfg, jnp.asarray(tokens[:, :3]), pos, cache)
    np.testing.assert_allclose(np.asarray(logits), full[:, :3], rtol=1e-4, atol=1e-4)
    # decode one token at a time
    for t in range(3, 6):
        pos = jnp.array([[t]])
        logits, cache = jllama.forward(
            m.params, m.cfg, jnp.asarray(tokens[:, t:t + 1]), pos, cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t],
                                   rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def quantized_gguf(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(1)
    # dims divisible by 256 so K-quants pack
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    paths = {}
    for t in (GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_0):
        p = str(tmp_path_factory.mktemp("q") / f"tiny_{t.name}.gguf")
        convert_llama_state_dict(state, cfg, p, tokenizer_md=tiny_tokenizer_md(512),
                                 quant_type=t)
        paths[t] = p
    return paths


@pytest.mark.parametrize("t", [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_0],
                         ids=lambda t: t.name)
def test_packed_forward_matches_dequant_forward(quantized_gguf, t):
    """Packed-in-HBM QTensor path vs dequantize-on-load path: same model."""
    path = quantized_gguf[t]
    tokens = np.array([[1, 5, 9, 42, 7, 100, 3, 200]], dtype=np.int32)
    a = _run_ours(path, tokens, dtype=jnp.float32, packed=False)
    b = _run_ours(path, tokens, dtype=jnp.float32, packed=True)
    # packed path: bf16 scale storage + bf16 activations in the fused kernels
    np.testing.assert_allclose(a, b, rtol=4e-2, atol=4e-2)


def test_dequant_xla_bit_consistency(quantized_gguf):
    """dequant_xla on packed layouts must match numpy dequantize (f32)."""
    from koboldcpp_tpu.gguf import GGUFReader, quants
    from koboldcpp_tpu.ops import linear

    path = quantized_gguf[GGMLType.Q4_K]
    with GGUFReader(path) as r:
        for name in ["blk.0.attn_q.weight", "blk.0.ffn_down.weight"]:
            info = r.tensors[name]
            raw = r.tensor_raw(name)
            want = quants.dequantize(raw, info.ggml_type).reshape(info.shape)
            qt = linear.from_gguf(raw, info.ggml_type, info.shape, packed=True)
            assert qt.kind != "dense"
            got = np.asarray(linear.dequant_xla(qt, dtype=jnp.float32))
            # bf16 scale storage is the only precision loss
            np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)
