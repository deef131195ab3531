"""GPT-2 and GPT-NeoX (layernorm family) parity vs transformers."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.kv.cache import init_cache
from koboldcpp_tpu.models import llama as jllama
from koboldcpp_tpu.models.loader import load_model

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_hf import convert_gpt2_state_dict, convert_gptneox_state_dict  # noqa: E402
from .test_model_forward import tiny_tokenizer_md  # noqa: E402

TOKENS = np.array([[1, 5, 9, 42, 7, 300]], dtype=np.int32)


def run_ours(path, tokens):
    m = load_model(path, packed=False, dtype=jnp.float32)
    cache = init_cache(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads, m.cfg.head_dim,
                       dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(tokens.shape[1]), tokens.shape).astype(jnp.int32)
    logits, _ = jllama.forward(m.params, m.cfg, jnp.asarray(tokens), pos, cache)
    return m, np.asarray(logits)


def test_gpt2(tmp_path):
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(6)
    cfg = GPT2Config(vocab_size=512, n_positions=64, n_embd=64, n_layer=2,
                     n_head=4)
    model = GPT2LMHeadModel(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "gpt2.gguf")
    convert_gpt2_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path, TOKENS)
    assert m.cfg.norm_type == "layer"
    assert m.cfg.learned_pos and not m.cfg.use_rope and not m.cfg.ffn_gated
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)


@pytest.mark.parametrize("parallel", [True, False])
def test_gptneox(tmp_path, parallel):
    import torch
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    torch.manual_seed(7)
    cfg = GPTNeoXConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        max_position_embeddings=64, rotary_pct=0.25,
                        use_parallel_residual=parallel)
    model = GPTNeoXForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "neox.gguf")
    convert_gptneox_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path, TOKENS)
    assert m.cfg.norm_type == "layer"
    assert m.cfg.parallel_residual == parallel
    assert m.cfg.rope_dim == 4  # rotary_pct 0.25 of head_dim 16
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)


def test_falcon(tmp_path):
    import torch
    from transformers import FalconConfig, FalconForCausalLM
    from convert_hf import convert_falcon_state_dict

    torch.manual_seed(8)
    cfg = FalconConfig(vocab_size=512, hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, multi_query=True,
                       parallel_attn=True, new_decoder_architecture=False,
                       bias=False, max_position_embeddings=64, alibi=False)
    model = FalconForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "falcon.gguf")
    convert_falcon_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path, TOKENS)
    assert m.cfg.parallel_residual and m.cfg.n_kv_heads == 1
    import torch as _t
    with _t.no_grad():
        ref = model(_t.tensor(TOKENS, dtype=_t.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)


def test_stablelm(tmp_path):
    import torch
    from transformers import StableLmConfig, StableLmForCausalLM
    from convert_hf import convert_stablelm_state_dict

    torch.manual_seed(9)
    cfg = StableLmConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=64,
                         partial_rotary_factor=0.25)
    model = StableLmForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "stablelm.gguf")
    convert_stablelm_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path, TOKENS)
    assert m.cfg.norm_type == "layer" and m.cfg.ffn_gated
    assert m.cfg.rope_dim == 4
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)


def test_phi2(tmp_path):
    import torch
    from transformers import PhiConfig, PhiForCausalLM
    from convert_hf import convert_phi2_state_dict

    torch.manual_seed(10)
    cfg = PhiConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=4, max_position_embeddings=64,
                    partial_rotary_factor=0.5)
    model = PhiForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "phi2.gguf")
    convert_phi2_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path, TOKENS)
    assert m.cfg.norm_type == "layer" and m.cfg.parallel_residual
    assert m.cfg.rope_dim == 8 and not m.cfg.ffn_gated
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)


def test_olmo(tmp_path):
    import torch
    from transformers import OlmoConfig, OlmoForCausalLM
    from convert_hf import convert_olmo_state_dict

    torch.manual_seed(11)
    cfg = OlmoConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=64,
                     tie_word_embeddings=False)
    model = OlmoForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "olmo.gguf")
    convert_olmo_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path, TOKENS)
    assert m.cfg.norm_type == "layer" and m.cfg.ffn_gated
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)


def test_mpt_alibi(tmp_path):
    import torch
    from transformers import MptConfig, MptForCausalLM
    from convert_hf import convert_mpt_state_dict

    torch.manual_seed(13)
    cfg = MptConfig(vocab_size=512, d_model=64, n_heads=4, n_layers=2,
                    max_seq_len=64, expansion_ratio=2)
    model = MptForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "mpt.gguf")
    convert_mpt_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path, TOKENS)
    assert m.cfg.use_alibi and not m.cfg.use_rope
    assert m.cfg.norm_type == "layer" and not m.cfg.ffn_gated
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)


def test_commandr(tmp_path):
    import torch
    from transformers import CohereConfig, CohereForCausalLM
    from convert_hf import convert_commandr_state_dict

    torch.manual_seed(14)
    cfg = CohereConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, max_position_embeddings=64,
                       logit_scale=0.25, use_qk_norm=False,
                       tie_word_embeddings=True)
    model = CohereForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "commandr.gguf")
    convert_commandr_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path, TOKENS)
    assert m.cfg.parallel_residual and m.cfg.logit_scale == 0.25
    assert m.cfg.rope_type == "norm"
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)


def test_starcoder2(tmp_path):
    import torch
    from transformers import Starcoder2Config, Starcoder2ForCausalLM
    from convert_hf import convert_starcoder2_state_dict

    torch.manual_seed(15)
    cfg = Starcoder2Config(vocab_size=512, hidden_size=64, intermediate_size=128,
                           num_hidden_layers=2, num_attention_heads=4,
                           num_key_value_heads=2, max_position_embeddings=64,
                           use_bias=True, tie_word_embeddings=False)
    model = Starcoder2ForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "sc2.gguf")
    convert_starcoder2_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path, TOKENS)
    assert m.cfg.norm_type == "layer" and not m.cfg.ffn_gated
    assert m.cfg.rope_type == "neox"
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)


def test_gptj(tmp_path):
    import torch
    from transformers import GPTJConfig, GPTJForCausalLM
    from convert_hf import convert_gptj_state_dict

    torch.manual_seed(17)
    cfg = GPTJConfig(vocab_size=512, n_positions=64, n_embd=64, n_layer=2,
                     n_head=4, rotary_dim=8)
    model = GPTJForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "gptj.gguf")
    convert_gptj_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path, TOKENS)
    assert m.cfg.parallel_residual and m.cfg.rope_type == "norm"
    assert m.cfg.rope_dim == 8
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)
