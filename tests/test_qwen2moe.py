"""Qwen2MoE HF logits parity: shared expert + un-normalized top-k routing."""
import numpy as np
import jax.numpy as jnp

from koboldcpp_tpu.kv.cache import init_cache
from koboldcpp_tpu.models import llama as jllama
from koboldcpp_tpu.models.loader import load_model

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_hf import convert_qwen2moe_state_dict  # noqa: E402
from .test_model_forward import tiny_tokenizer_md  # noqa: E402

TOKENS = np.array([[1, 5, 9, 42, 7, 300]], dtype=np.int32)


def test_qwen2moe_parity(tmp_path):
    import torch
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    torch.manual_seed(16)
    cfg = Qwen2MoeConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32, shared_expert_intermediate_size=64,
        decoder_sparse_step=1, norm_topk_prob=False,
        tie_word_embeddings=False)
    model = Qwen2MoeForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "qwen2moe.gguf")
    convert_qwen2moe_state_dict(state, cfg, path,
                                tokenizer_md=tiny_tokenizer_md(512))
    m = load_model(path, packed=False, dtype=jnp.float32)
    assert m.cfg.n_experts == 4 and not m.cfg.moe_norm_topk
    cache = init_cache(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads, m.cfg.head_dim,
                       dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(TOKENS.shape[1]),
                           TOKENS.shape).astype(jnp.int32)
    ours, _ = jllama.forward(m.params, m.cfg, jnp.asarray(TOKENS), pos, cache)
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=4e-3, atol=4e-3)


def test_dbrx_parity(tmp_path):
    import torch
    from transformers import DbrxConfig, DbrxForCausalLM
    from transformers.models.dbrx.configuration_dbrx import (
        DbrxAttentionConfig, DbrxFFNConfig)
    from convert_hf import convert_dbrx_state_dict

    torch.manual_seed(19)
    cfg = DbrxConfig(
        d_model=64, n_heads=4, n_layers=2, max_seq_len=64, vocab_size=512,
        attn_config=DbrxAttentionConfig(kv_n_heads=2, clip_qkv=8.0,
                                        rope_theta=10000.0),
        ffn_config=DbrxFFNConfig(ffn_hidden_size=32, moe_num_experts=4,
                                 moe_top_k=2,
                                 moe_normalize_expert_weights=1.0))
    model = DbrxForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "dbrx.gguf")
    convert_dbrx_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m = load_model(path, packed=False, dtype=jnp.float32)
    assert m.cfg.norm_type == "layer" and m.cfg.clamp_kqv == 8.0
    assert m.cfg.n_experts == 4 and m.cfg.moe_norm_topk
    cache = init_cache(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads, m.cfg.head_dim,
                       dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(TOKENS.shape[1]),
                           TOKENS.shape).astype(jnp.int32)
    ours, _ = jllama.forward(m.params, m.cfg, jnp.asarray(TOKENS), pos, cache)
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=4e-3, atol=4e-3)


def test_olmoe_parity(tmp_path):
    import torch
    from transformers import OlmoeConfig, OlmoeForCausalLM
    from convert_hf import convert_olmoe_state_dict

    torch.manual_seed(21)
    cfg = OlmoeConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64,
                      num_experts=4, num_experts_per_tok=2,
                      norm_topk_prob=False, tie_word_embeddings=False)
    model = OlmoeForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "olmoe.gguf")
    convert_olmoe_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m = load_model(path, packed=False, dtype=jnp.float32)
    assert not m.cfg.moe_norm_topk and "attn_q_norm" in m.params["layers"][0]
    cache = init_cache(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads, m.cfg.head_dim,
                       dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(TOKENS.shape[1]),
                           TOKENS.shape).astype(jnp.int32)
    ours, _ = jllama.forward(m.params, m.cfg, jnp.asarray(TOKENS), pos, cache)
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=4e-3, atol=4e-3)
