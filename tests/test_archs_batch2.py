"""Arch parity batch 2 vs transformers: Bloom (ALiBi + embedding LN +
interleaved fused QKV), StarCoder/gpt_bigcode (MQA + learned pos), Nemotron
(layernorm1p + partial rotary + squared-ReLU FFN)."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.kv.cache import init_cache
from koboldcpp_tpu.models import llama as jllama
from koboldcpp_tpu.models.loader import load_model

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_hf import (convert_bloom_state_dict,  # noqa: E402
                        convert_nemotron_state_dict,
                        convert_starcoder_state_dict)
from .test_model_forward import tiny_tokenizer_md  # noqa: E402

TOKENS = np.array([[1, 5, 9, 42, 7, 300]], dtype=np.int32)


def run_ours(path):
    m = load_model(path, packed=False, dtype=jnp.float32)
    cache = init_cache(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads, m.cfg.head_dim,
                       dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(TOKENS.shape[1]), TOKENS.shape).astype(jnp.int32)
    logits, _ = jllama.forward(m.params, m.cfg, jnp.asarray(TOKENS), pos, cache)
    return m, np.asarray(logits)


def hf_logits(model):
    import torch

    with torch.no_grad():
        return model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()


def test_bloom(tmp_path):
    import torch
    from transformers import BloomConfig, BloomForCausalLM

    torch.manual_seed(31)
    cfg = BloomConfig(vocab_size=512, hidden_size=64, n_layer=2, n_head=4,
                      layer_norm_epsilon=1e-5, tie_word_embeddings=False)
    model = BloomForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "bloom.gguf")
    convert_bloom_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path)
    assert m.cfg.use_alibi and not m.cfg.use_rope
    assert "tok_norm" in m.params
    np.testing.assert_allclose(ours, hf_logits(model), rtol=4e-3, atol=4e-3)


def test_starcoder_mqa(tmp_path):
    import torch
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    torch.manual_seed(32)
    cfg = GPTBigCodeConfig(vocab_size=512, n_embd=64, n_layer=2, n_head=4,
                           n_positions=128, multi_query=True,
                           layer_norm_epsilon=1e-5, tie_word_embeddings=False,
                           activation_function="gelu")
    model = GPTBigCodeForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "starcoder.gguf")
    convert_starcoder_state_dict(state, cfg, path,
                                 tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path)
    assert m.cfg.n_kv_heads == 1 and m.cfg.learned_pos
    np.testing.assert_allclose(ours, hf_logits(model), rtol=4e-3, atol=4e-3)


def test_nemotron(tmp_path):
    import torch
    from transformers import NemotronConfig, NemotronForCausalLM

    torch.manual_seed(33)
    cfg = NemotronConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=128,
                         norm_eps=1e-5, partial_rotary_factor=0.5,
                         tie_word_embeddings=False)
    model = NemotronForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "nemotron.gguf")
    convert_nemotron_state_dict(state, cfg, path,
                                tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path)
    assert m.cfg.rope_dim == 8 and m.cfg.act == "relu2"
    assert m.cfg.rope_type == "neox"
    np.testing.assert_allclose(ours, hf_logits(model), rtol=4e-3, atol=4e-3)


@pytest.mark.parametrize("swin", [False, True])
def test_chameleon(tmp_path, swin):
    import torch
    from transformers import ChameleonConfig, ChameleonForConditionalGeneration
    from convert_hf import convert_chameleon_state_dict

    torch.manual_seed(34)
    vq = dict(embed_dim=32, num_embeddings=16, latent_channels=32, base_channels=32,
              channel_multiplier=[1], num_res_blocks=1, resolution=16,
              attn_resolutions=[])
    cfg = ChameleonConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=2, max_position_embeddings=128,
                          swin_norm=swin, vq_config=vq,
                          vocabulary_map={"<image>": 1},
                          tie_word_embeddings=False)
    model = ChameleonForConditionalGeneration(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()
             if not k.startswith("model.vqmodel")}
    path = str(tmp_path / f"chameleon{swin}.gguf")
    convert_chameleon_state_dict(state, cfg, path,
                                 tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path)
    assert m.cfg.extras["qk_norm_per_head"]
    assert m.cfg.extras["swin_norm"] == swin
    np.testing.assert_allclose(ours, hf_logits(model), rtol=4e-3, atol=4e-3)


def test_granitemoe(tmp_path):
    import torch
    from transformers import GraniteMoeConfig, GraniteMoeForCausalLM
    from convert_hf import convert_granitemoe_state_dict

    torch.manual_seed(35)
    cfg = GraniteMoeConfig(vocab_size=512, hidden_size=64, intermediate_size=48,
                           num_hidden_layers=2, num_attention_heads=4,
                           num_key_value_heads=2, num_local_experts=4,
                           num_experts_per_tok=2, max_position_embeddings=128,
                           embedding_multiplier=6.0, attention_multiplier=0.2,
                           residual_multiplier=0.5, logits_scaling=4.0,
                           tie_word_embeddings=False)
    model = GraniteMoeForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "granitemoe.gguf")
    convert_granitemoe_state_dict(state, cfg, path,
                                  tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path)
    assert m.cfg.n_experts == 4 and m.cfg.residual_scale == 0.5
    assert m.cfg.moe_norm_topk  # JetMoe topk-softmax == renormalized topk
    np.testing.assert_allclose(ours, hf_logits(model), rtol=4e-3, atol=4e-3)
