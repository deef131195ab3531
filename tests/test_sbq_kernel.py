"""SBQ (superblock scale layout) batched decode kernels: parity vs the
reference dequant for q4_k/q5_k at 2<=T<=16.

The SBQ kernels fold q4_k's INTEGER 6-bit sub-scales into the int8 weights
in-kernel and contract per superblock (T*nsb M rows instead of T*in/64) —
the mmq-style scale-layout rework (ggml-cuda/mmq.cuh:9-60 analogue) that
removes the batched P-dot MAC waste (VERDICT r3 item 1).  Value math is
exact except int8 activation quantization (per 128-col plane segment, the
same noise class as llama.cpp's q8_K serving activations).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.gguf import GGMLType, quants
from koboldcpp_tpu.ops import linear, quant_matmul


def make_qt(t: GGMLType, out_f=256, in_f=2048, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((out_f, in_f)) * 0.1).astype(np.float32)
    raw = quants.quantize(w, t)
    qt = linear.from_gguf(raw, t, (out_f, in_f), packed=True)
    wref = quants.dequantize(raw, t).reshape(out_f, in_f)
    return qt, wref


@pytest.mark.parametrize("t", [GGMLType.Q4_K, GGMLType.Q5_K],
                         ids=lambda t: t.name)
@pytest.mark.parametrize("T", [2, 3, 8, 16])
def test_sbq_kernel_matches_reference(t, T, monkeypatch):
    monkeypatch.setenv("KCPP_SBQ", "1")
    qt, wref = make_qt(t)
    assert "scp_lo" in qt.data and "d_sbt" in qt.data
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((T, qt.in_features)) * 0.5).astype(np.float32)
    y = quant_matmul.matmul_packed(jnp.asarray(x, dtype=jnp.bfloat16), qt)
    assert y is not None
    want = x @ wref.T
    got = np.asarray(y, dtype=np.float32)
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 0.02


def test_sbq_matches_i8t_path(monkeypatch):
    """SBQ and the old i8_t path agree within activation-quant noise."""
    qt, wref = make_qt(GGMLType.Q4_K)
    rng = np.random.default_rng(2)
    x = jnp.asarray((rng.standard_normal((8, qt.in_features)) * 0.5),
                    jnp.bfloat16)
    monkeypatch.setenv("KCPP_SBQ", "1")
    y_sbq = np.asarray(quant_matmul.matmul_packed(x, qt), np.float32)
    monkeypatch.setenv("KCPP_SBQ", "0")
    y_old = np.asarray(quant_matmul.matmul_packed(x, qt), np.float32)
    scale = np.abs(y_old).max() + 1e-6
    assert np.abs(y_sbq - y_old).max() / scale < 0.02


def test_sbq_default_off(monkeypatch):
    """SBQ is opt-in (the r4 on-TPU A/B left i8_t as the default batched
    path); without KCPP_SBQ=1 the dispatch must not select it."""
    monkeypatch.delenv("KCPP_SBQ", raising=False)
    qt, _ = make_qt(GGMLType.Q4_K)
    called = []
    orig = quant_matmul._packed_matvec_q4k_sbq
    monkeypatch.setattr(quant_matmul, "_packed_matvec_q4k_sbq",
                        lambda *a, **k: called.append(1) or orig(*a, **k))
    x = jnp.zeros((8, qt.in_features), jnp.bfloat16)
    assert quant_matmul.matmul_packed(x, qt) is not None
    assert not called


def test_sbq_gate_small_in_f(monkeypatch):
    """in_f < 2048 (nsb < 8) must not take the SBQ path (sublane floor)."""
    monkeypatch.setenv("KCPP_SBQ", "1")
    qt, wref = make_qt(GGMLType.Q4_K, in_f=512)
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((8, 512)) * 0.5).astype(np.float32)
    y = quant_matmul.matmul_packed(jnp.asarray(x, jnp.bfloat16), qt)
    assert y is not None  # falls through to i8_t / 2-D
    want = x @ wref.T
    scale = np.abs(want).max() + 1e-6
    assert np.abs(np.asarray(y, np.float32) - want).max() / scale < 0.02
