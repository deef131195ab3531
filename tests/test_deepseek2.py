"""DeepSeek-V2 (MLA) parity vs transformers: q-LoRA bottleneck, compressed KV,
split nope/rope heads, leading dense + MoE-with-shared-expert layers."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.models import deepseek2 as jds
from koboldcpp_tpu.models.loader import load_model

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_hf import convert_deepseek2_state_dict  # noqa: E402
from .test_model_forward import tiny_tokenizer_md  # noqa: E402

TOKENS = np.array([[1, 5, 9, 42, 7, 300]], dtype=np.int32)


def make_model(q_lora_rank):
    import torch
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    torch.manual_seed(21)
    cfg = DeepseekV2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=12,
        q_lora_rank=q_lora_rank, kv_lora_rank=24,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        routed_scaling_factor=1.5, first_k_dense_replace=1,
        topk_method="greedy", n_group=1, topk_group=1,
        norm_topk_prob=False, max_position_embeddings=128,
        tie_word_embeddings=False, head_dim=8)
    return DeepseekV2ForCausalLM(cfg).eval().float(), cfg


def run_pair(tmp_path, q_lora_rank):
    import torch

    model, cfg = make_model(q_lora_rank)
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / f"ds2-{q_lora_rank}.gguf")
    convert_deepseek2_state_dict(state, cfg, path,
                                 tokenizer_md=tiny_tokenizer_md(512))
    m = load_model(path, packed=False, dtype=jnp.float32)
    cache = jds.init_cache(m.cfg, 1, 32, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(TOKENS.shape[1]), TOKENS.shape).astype(jnp.int32)
    logits, cache = jds.forward(m.params, m.cfg, jnp.asarray(TOKENS), pos, cache)
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    return m, np.asarray(logits), ref, cache


def test_deepseek2_qlora(tmp_path):
    m, ours, ref, _ = run_pair(tmp_path, 32)
    assert "wq_a" in m.params["layers"][0]
    assert m.cfg.extras["v_head_dim"] == 12 and m.cfg.rope_dim == 8
    assert "ffn_gate_inp" not in m.params["layers"][0]  # dense lead
    assert "ffn_gate_inp" in m.params["layers"][1]      # MoE after
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)


def test_deepseek2_lite(tmp_path):
    """q_lora_rank=None -> plain wq (the 'lite' variant)."""
    m, ours, ref, _ = run_pair(tmp_path, None)
    assert "wq" in m.params["layers"][0]
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)


def test_deepseek2_incremental(tmp_path):
    """Cached decode matches one-shot (MLA K/V materialized into the cache)."""
    m, full, _, _ = run_pair(tmp_path, 32)
    cache = jds.init_cache(m.cfg, 1, 32, dtype=jnp.float32)
    outs = []
    for t in range(TOKENS.shape[1]):
        logits, cache = jds.forward(
            m.params, m.cfg, jnp.asarray(TOKENS[:, t:t + 1]),
            jnp.full((1, 1), t, jnp.int32), cache)
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), full,
                               rtol=3e-4, atol=3e-4)


def test_deepseek2_engine_generate(tmp_path):
    from koboldcpp_tpu.engine.engine import Engine, GenParams
    from koboldcpp_tpu.sampling.samplers import SamplerParams

    model, cfg = make_model(32)
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "ds2-eng.gguf")
    convert_deepseek2_state_dict(state, cfg, path,
                                 tokenizer_md=tiny_tokenizer_md(512))
    m = load_model(path, packed=False, dtype=jnp.float32)
    eng = Engine(m, max_context=64, cache_dtype=jnp.float32)
    params = GenParams(max_length=6, sampler=SamplerParams(temperature=0.0),
                       use_default_badwordsids=True)
    r1 = eng.generate([1, 5, 9, 42], params)
    assert len(r1.tokens) == 6
    # prefix fast-forward works on the MLA cache
    r2 = eng.generate(list(eng.context_tokens) + [7], params)
    assert eng.last_timings.prompt_tokens == 1
