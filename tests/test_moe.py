"""Mixtral-style MoE forward parity vs transformers."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.kv.cache import init_cache
from koboldcpp_tpu.models import llama as jllama
from koboldcpp_tpu.models.loader import load_model

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_hf import convert_mixtral_state_dict  # noqa: E402
from .test_model_forward import tiny_tokenizer_md  # noqa: E402


@pytest.fixture(scope="module")
def mixtral_pair(tmp_path_factory):
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(5)
    cfg = MixtralConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    model = MixtralForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("moe") / "mixtral.gguf")
    convert_mixtral_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    return model, path


def test_moe_config_loaded(mixtral_pair):
    _, path = mixtral_pair
    m = load_model(path, packed=False, dtype=jnp.float32)
    assert m.cfg.n_experts == 4
    assert m.cfg.n_experts_used == 2
    assert "ffn_gate_inp" in m.params["layers"][0]
    assert m.params["layers"][0]["ffn_gate_exps"].data["w"].shape == (4, 96, 64)


def test_moe_logits_match_hf(mixtral_pair):
    import torch

    model, path = mixtral_pair
    m = load_model(path, packed=False, dtype=jnp.float32)
    tokens = np.array([[1, 5, 9, 42, 7, 300]], dtype=np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    cache = init_cache(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads, m.cfg.head_dim,
                       dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(6), (1, 6)).astype(jnp.int32)
    logits, _ = jllama.forward(m.params, m.cfg, jnp.asarray(tokens), pos, cache)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=5e-3, atol=5e-3)
