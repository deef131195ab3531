"""KoboldAI United backend plugin (united.py, reference class.py counterpart):
parameter plumbing + in-process generate without a United checkout."""
import numpy as np
import jax.numpy as jnp
import pytest


def test_united_backend_flow(tmp_path):
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from convert_hf import convert_llama_state_dict
    from .test_model_forward import tiny_tokenizer_md

    torch.manual_seed(2)
    cfg = LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=128)
    model = LlamaForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "united.gguf")
    convert_llama_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))

    from koboldcpp_tpu import united

    be = united.model_backend()
    assert be.is_valid("m", str(tmp_path), "")
    assert not be.is_valid("m", str(tmp_path / "nope"), "")

    reqs = be.get_requested_parameters("m", str(tmp_path), "")
    ids = {r["id"] for r in reqs}
    assert {"kcpp_filename", "kcpp_ctxsize", "kcpp_smartcontext",
            "kcpp_quantkv"} <= ids
    assert reqs[0]["children"][0]["value"] == path

    be.set_input_parameters({"kcpp_filename": path, "kcpp_ctxsize": 128,
                             "kcpp_smartcontext": 0, "kcpp_quantkv": 0})
    be._load()
    assert be.engine is not None

    class Settings:
        temp = 0.0
        top_k = 0
        top_a = 0.0
        top_p = 1.0
        typical = 1.0
        tfs = 1.0
        rep_pen = 1.0
        rep_pen_range = 0
        sampler_order = (6, 0, 1, 3, 4, 2, 5)

    r = be._raw_generate([1, 5, 9], max_new=6, gen_settings=Settings())
    assert len(r.tokens) == 6
    r2 = be._raw_generate(np.array([1, 5, 9]), max_new=6, gen_settings=Settings())
    assert r2.tokens == r.tokens  # greedy determinism, ndarray prompt accepted
    be.unload()
    assert be.engine is None
    with pytest.raises(united.KoboldCppException):
        be._raw_generate([1], max_new=1, gen_settings=Settings())
