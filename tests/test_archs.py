"""Arch-variant parity vs transformers: Qwen2 (QKV bias), Gemma2 (sandwich
norms + softcaps + sliding window), Phi-3 (pre-fused projections)."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.kv.cache import init_cache
from koboldcpp_tpu.models import llama as jllama
from koboldcpp_tpu.models.loader import load_model

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_hf import convert_arch_state_dict  # noqa: E402
from .test_model_forward import tiny_tokenizer_md  # noqa: E402

TOKENS = np.array([[1, 5, 9, 42, 7, 300]], dtype=np.int32)


def run_ours(path, tokens):
    m = load_model(path, packed=False, dtype=jnp.float32)
    cache = init_cache(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads, m.cfg.head_dim,
                       dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(tokens.shape[1]), tokens.shape).astype(jnp.int32)
    logits, _ = jllama.forward(m.params, m.cfg, jnp.asarray(tokens), pos, cache)
    return m, np.asarray(logits)


def hf_logits(model, tokens):
    import torch

    with torch.no_grad():
        return model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()


def test_qwen2(tmp_path):
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(3)
    cfg = Qwen2Config(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=128,
                      tie_word_embeddings=False)
    model = Qwen2ForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "qwen2.gguf")
    convert_arch_state_dict("qwen2", state, cfg, path,
                            tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path, TOKENS)
    assert m.cfg.rope_type == "neox"
    assert "bq" in m.params["layers"][0]  # bias survived fusion path
    np.testing.assert_allclose(ours, hf_logits(model, TOKENS), rtol=4e-3, atol=4e-3)


def test_gemma2(tmp_path):
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(4)
    cfg = Gemma2Config(vocab_size=512, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, head_dim=16,
                       max_position_embeddings=128,
                       query_pre_attn_scalar=16, sliding_window=8,
                       attn_logit_softcapping=50.0, final_logit_softcapping=30.0)
    model = Gemma2ForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "gemma2.gguf")
    convert_arch_state_dict("gemma2", state, cfg, path,
                            tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path, TOKENS)
    assert m.cfg.post_norms and m.cfg.act == "gelu"
    assert m.cfg.final_logit_softcap == 30.0
    np.testing.assert_allclose(ours, hf_logits(model, TOKENS), rtol=5e-3, atol=5e-3)


def test_phi3(tmp_path):
    import torch
    from transformers import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(5)
    cfg = Phi3Config(vocab_size=512, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=128,
                     tie_word_embeddings=False, pad_token_id=0)
    model = Phi3ForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "phi3.gguf")
    convert_arch_state_dict("phi3", state, cfg, path,
                            tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path, TOKENS)
    assert "wqkv" in m.params["layers"][0]
    assert "w_gateup" in m.params["layers"][0]
    np.testing.assert_allclose(ours, hf_logits(model, TOKENS), rtol=4e-3, atol=4e-3)


def test_gemma1(tmp_path):
    import torch
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(18)
    cfg = GemmaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=16,
                      max_position_embeddings=128)
    model = GemmaForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "gemma1.gguf")
    convert_arch_state_dict("gemma", state, cfg, path,
                            tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path, TOKENS)
    assert m.cfg.embedding_scale == 8.0 and not m.cfg.post_norms
    np.testing.assert_allclose(ours, hf_logits(model, TOKENS), rtol=5e-3, atol=5e-3)


def test_granite(tmp_path):
    import torch
    from transformers import GraniteConfig, GraniteForCausalLM
    from convert_hf import convert_granite_state_dict

    torch.manual_seed(20)
    cfg = GraniteConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, max_position_embeddings=64,
                        embedding_multiplier=6.0, attention_multiplier=0.08,
                        residual_multiplier=0.5, logits_scaling=4.0,
                        tie_word_embeddings=False)
    model = GraniteForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "granite.gguf")
    convert_granite_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path, TOKENS)
    assert m.cfg.embedding_scale == 6.0
    assert abs(m.cfg.attn_scale - 0.08) < 1e-6
    assert m.cfg.residual_scale == 0.5 and m.cfg.logit_scale == 0.25
    np.testing.assert_allclose(ours, hf_logits(model, TOKENS), rtol=5e-3, atol=5e-3)
