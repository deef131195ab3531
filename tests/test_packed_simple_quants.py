"""Packed serving for the simple 32-block quants + IQ expansion (VERDICT r1
item 4): Q4_0/Q4_1/Q5_0/Q5_1 relayout into the q4_k/q5_k v2 plane fields,
IQ/TQ formats into q8-expanded int8 — no more dequant-to-bf16-at-load."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.gguf import quants as nq
from koboldcpp_tpu.gguf.constants import GGMLType
from koboldcpp_tpu.ops import linear
from koboldcpp_tpu.ops.linear import dequant_xla, from_gguf, matmul


def _mk(t, rows=8, cols=512, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((rows, cols)) * 0.05).astype(np.float32)
    raw = nq.quantize(w, t)
    return w, raw


@pytest.mark.parametrize("t,kind", [
    (GGMLType.Q4_0, "q4_k"), (GGMLType.Q4_1, "q4_k"),
    (GGMLType.Q5_0, "q5_k"), (GGMLType.Q5_1, "q5_k"),
])
def test_simple_quants_pack_and_dequant(t, kind):
    """Packed fields must decode to the reference dequantization (bf16 scale
    storage bounds the error, same as the K-quant packers)."""
    w, raw = _mk(t)
    qt = from_gguf(raw, t, w.shape, packed=True)
    assert qt.kind == kind, f"{t} stayed {qt.kind}"
    ref = nq.dequantize(raw, t)
    got = np.asarray(dequant_xla(qt, dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("t", [GGMLType.Q4_0, GGMLType.Q5_0])
def test_simple_quants_matmul_matches_dense(t):
    """matmul through the packed path tracks x @ dequant(W)^T."""
    w, raw = _mk(t, rows=16, cols=256, seed=1)
    qt = from_gguf(raw, t, w.shape, packed=True)
    ref_w = nq.dequantize(raw, t)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 256)).astype(np.float32))
    y = np.asarray(matmul(x, qt))
    ref = np.asarray(x) @ ref_w.T
    np.testing.assert_allclose(y, ref, rtol=4e-2, atol=4e-2)


def test_iq4_nl_expands_to_q8():
    w, raw = _mk(GGMLType.IQ4_NL, rows=4, cols=256, seed=3)
    qt = from_gguf(raw, GGMLType.IQ4_NL, w.shape, packed=True)
    assert qt.kind == "q8_0"
    ref = nq.dequantize(raw, GGMLType.IQ4_NL)
    got = np.asarray(dequant_xla(qt, dtype=jnp.float32))
    # int8 re-expansion adds <= ~0.8% relative error on top of bf16 scales
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 1.2e-2, err
    # packed HBM footprint ~8.5 bpw, far below the r1 bf16 fallback (16)
    nbytes = sum(v.nbytes for v in qt.data.values())
    assert nbytes < w.size * 1.3


def test_odd_width_block32_falls_back_to_q8_expand():
    """cols % 256 != 0 but % 32 == 0: serve packed via int8 expansion."""
    w, raw = _mk(GGMLType.Q4_0, rows=4, cols=160, seed=4)
    qt = from_gguf(raw, GGMLType.Q4_0, w.shape, packed=True)
    assert qt.kind == "q8_0"
    ref = nq.dequantize(raw, GGMLType.Q4_0)
    got = np.asarray(dequant_xla(qt, dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-3)


def test_loader_keeps_simple_quants_packed(tmp_path):
    """A GGUF with Q4_0 tensors loads with packed QTensors (the r1 behavior
    was dense bf16 fallback, ops/linear.py:296-313 in the r1 tree)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_hf import convert_llama_state_dict
    from .test_model_forward import tiny_tokenizer_md
    from koboldcpp_tpu.models.loader import load_model

    torch.manual_seed(33)
    cfg = LlamaConfig(vocab_size=512, hidden_size=256, intermediate_size=512,
                      num_hidden_layers=1, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=128,
                      tie_word_embeddings=False)
    hf = LlamaForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "q40.gguf")
    convert_llama_state_dict(state, cfg, path,
                             tokenizer_md=tiny_tokenizer_md(512),
                             quant_type=GGMLType.Q4_0)
    m = load_model(path, packed=True)
    qt = m.params["layers"][0]["wqkv"]
    assert qt.kind in ("q4_k",), qt.kind  # packed, not dense

    # and it generates deterministically
    from koboldcpp_tpu.engine.engine import Engine, GenParams
    from koboldcpp_tpu.sampling import SamplerParams

    eng = Engine(m, max_context=64)
    gp = GenParams(max_length=4, sampler=SamplerParams(temperature=0.0))
    r1 = eng.generate([1, 5, 9], gp)
    eng.reset_context()
    r2 = eng.generate([1, 5, 9], gp)
    assert r1.tokens == r2.tokens and len(r1.tokens) == 4
