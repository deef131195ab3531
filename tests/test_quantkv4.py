"""--quantkv 2: Q4_0-equivalent packed-nibble KV cache (reference
F16/Q8_0/Q4_0 ladder, gpttype_adapter.cpp:1958-1959)."""
import numpy as np
import jax.numpy as jnp

from koboldcpp_tpu.kv import cache as kvc


def test_q4_roundtrip():
    rng = np.random.default_rng(0)
    c = kvc.init_cache(2, 1, 16, 2, 8, quantized=4)
    assert c.bits == 4
    assert c.k[0].dtype == jnp.uint8
    assert c.k[0].shape == (1, 16, 2 * 8 // 2)  # half the bytes of q8
    k = rng.standard_normal((1, 3, 2, 8)).astype(np.float32)
    v = rng.standard_normal((1, 3, 2, 8)).astype(np.float32)
    pos = jnp.asarray([[0, 1, 2]], jnp.int32)
    c = kvc.write(c, 0, pos, jnp.asarray(k), jnp.asarray(v))
    kr, vr = kvc.read(c, 0)
    kr = np.asarray(kr, np.float32)[:, :3]
    vr = np.asarray(vr, np.float32)[:, :3]
    # Q4_0 noise bound: half a step of amax/7 per (row, head)
    for got, want in ((kr, k), (vr, v)):
        amax = np.abs(want).max(axis=-1, keepdims=True)
        assert (np.abs(got - want) <= amax / 7.0 * 0.75 + 1e-6).all()


def test_engine_quantkv2_generates(tmp_path):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_hf import convert_llama_state_dict
    from .test_model_forward import tiny_tokenizer_md
    from koboldcpp_tpu.engine import Engine
    from koboldcpp_tpu.engine.engine import GenParams
    from koboldcpp_tpu.models.loader import load_model
    from koboldcpp_tpu.sampling.samplers import SamplerParams

    torch.manual_seed(3)
    cfg = LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=256,
                      tie_word_embeddings=False)
    m = LlamaForCausalLM(cfg).eval().float()
    state = {k: vv.numpy() for k, vv in m.state_dict().items()}
    path = str(tmp_path / "tiny.gguf")
    convert_llama_state_dict(state, cfg, path,
                             tokenizer_md=tiny_tokenizer_md(512))
    model = load_model(path, packed=False, dtype=jnp.float32)
    eng = Engine(model, max_context=128, quantkv=2)
    gp = GenParams(max_length=8, sampler=SamplerParams(temperature=0.0,
                                                       rep_pen=1.0))
    r1 = eng.generate([1, 5, 9], gp)
    eng.reset_context()
    r2 = eng.generate([1, 5, 9], gp)
    assert r1.tokens == r2.tokens  # deterministic with the q4 cache
    assert len(r1.tokens) == 8
