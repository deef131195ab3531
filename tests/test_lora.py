"""Runtime LoRA adapter merge: GGUF adapter (.lora_a/.lora_b pairs,
adapter.lora.alpha) applied at load, verified against an HF model with the
deltas merged into its weights directly."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.gguf.writer import GGUFWriter
from koboldcpp_tpu.kv.cache import init_cache
from koboldcpp_tpu.models import llama as jllama
from koboldcpp_tpu.models.loader import load_model, LoraAdapter

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_hf import convert_llama_state_dict  # noqa: E402
from .test_model_forward import tiny_tokenizer_md  # noqa: E402

TOKENS = np.array([[1, 5, 9, 42, 7, 300]], dtype=np.int32)
ALPHA, RANK, MULT = 8.0, 4, 0.7


def _write_adapter(path, pairs, alpha=ALPHA):
    w = GGUFWriter(path, architecture="llama")
    w.add("general.type", "adapter")
    w.add("adapter.type", "lora")
    w.add("adapter.lora.alpha", np.float32(alpha))
    for base, (a, b) in pairs.items():
        w.add_tensor(base + ".lora_a", a)
        w.add_tensor(base + ".lora_b", b)
    w.write()
    return path


def _logits(m, tokens):
    cache = init_cache(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads, m.cfg.head_dim,
                       dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(tokens.shape[1]), tokens.shape).astype(jnp.int32)
    logits, _ = jllama.forward(m.params, m.cfg, jnp.asarray(tokens), pos, cache)
    return np.asarray(logits)


def test_lora_merge_matches_manual(tmp_path):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(11)
    cfg = LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64,
                      tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    base = str(tmp_path / "base.gguf")
    convert_llama_state_dict(state, cfg, base, tokenizer_md=tiny_tokenizer_md(512))

    rng = np.random.default_rng(3)
    scale = MULT * ALPHA / RANK
    # ffn_gate exercises the fused gate/up concat path; ffn_down and output
    # the plain path (none of these are permuted by the converter)
    pairs = {}
    for gname, hname, out_dim, in_dim in (
            ("blk.0.ffn_gate.weight", "model.layers.0.mlp.gate_proj.weight", 128, 64),
            ("blk.1.ffn_down.weight", "model.layers.1.mlp.down_proj.weight", 64, 128),
            ("output.weight", "lm_head.weight", 512, 64)):
        a = rng.standard_normal((RANK, in_dim)).astype(np.float32) * 0.05
        b = rng.standard_normal((out_dim, RANK)).astype(np.float32) * 0.05
        pairs[gname] = (a, b)
        with torch.no_grad():
            p = dict(model.named_parameters())[hname]
            p += torch.tensor(scale * (b @ a))
    adapter = _write_adapter(str(tmp_path / "adapter.gguf"), pairs)

    m = load_model(base, packed=False, dtype=jnp.float32,
                   loras=[(adapter, MULT)])
    ours = _logits(m, TOKENS)
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)

    # without the adapter the logits must differ (the merge actually applied)
    m0 = load_model(base, packed=False, dtype=jnp.float32)
    assert np.abs(_logits(m0, TOKENS) - ours).max() > 1e-3


def test_lora_adapter_validation(tmp_path):
    w = GGUFWriter(str(tmp_path / "bad.gguf"), architecture="llama")
    w.add("general.type", "model")
    w.write()
    with pytest.raises(ValueError, match="adapter"):
        LoraAdapter(str(tmp_path / "bad.gguf"))


def test_peft_converter_with_qk_permute(tmp_path):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from convert_lora import convert_peft_lora

    torch.manual_seed(12)
    cfg = LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64,
                      tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    base = str(tmp_path / "base.gguf")
    convert_llama_state_dict(state, cfg, base, tokenizer_md=tiny_tokenizer_md(512))

    rng = np.random.default_rng(5)
    scale = MULT * ALPHA / RANK
    peft_state = {}
    # q_proj exercises the rope-order row permute on lora_b; k_proj the kv-head
    # permute; down_proj the plain path
    for hname, short, out_dim, in_dim in (
            ("model.layers.0.self_attn.q_proj", "q_proj", 64, 64),
            ("model.layers.1.self_attn.k_proj", "k_proj", 32, 64),
            ("model.layers.1.mlp.down_proj", "down_proj", 64, 128)):
        a = rng.standard_normal((RANK, in_dim)).astype(np.float32) * 0.05
        b = rng.standard_normal((out_dim, RANK)).astype(np.float32) * 0.05
        peft_state[f"base_model.model.{hname}.lora_A.weight"] = a
        peft_state[f"base_model.model.{hname}.lora_B.weight"] = b
        with torch.no_grad():
            p = dict(model.named_parameters())[hname + ".weight"]
            p += torch.tensor(scale * (b @ a))
    from safetensors.numpy import save_file
    peft_dir = tmp_path / "peft"
    peft_dir.mkdir()
    save_file(peft_state, str(peft_dir / "adapter_model.safetensors"))
    (peft_dir / "adapter_config.json").write_text(
        '{"lora_alpha": %s, "r": %s}' % (ALPHA, RANK))

    adapter = convert_peft_lora(str(peft_dir), str(tmp_path / "ad.gguf"),
                                n_head=4, n_kv_head=2)
    m = load_model(base, packed=False, dtype=jnp.float32,
                   loras=[(adapter, MULT)])
    ours = _logits(m, TOKENS)
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)
