"""q4_k_i8 layout: exact value preservation vs packed Q4_K, kernel parity."""
import numpy as np
import jax.numpy as jnp

from koboldcpp_tpu.gguf import GGMLType, quants
from koboldcpp_tpu.ops import linear, quant_matmul


def make(out_f=256, in_f=512, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((out_f, in_f)) * 0.1).astype(np.float32)
    raw = quants.quantize(w, GGMLType.Q4_K)
    wref = quants.dequantize(raw, GGMLType.Q4_K).reshape(out_f, in_f)
    return raw, wref


def test_i8_layout_is_exact():
    raw, wref = make()
    qt = linear.pack_q4_k_i8(raw, wref.shape)
    got = np.asarray(linear.dequant_xla(qt, dtype=jnp.float32))
    # same bf16 scale storage as the packed layout; q values exact
    np.testing.assert_allclose(got, wref, rtol=1e-2, atol=1e-2)
    # q integers must match the nibble stream bit-for-bit
    qt_packed = linear.pack_q4_k(raw, wref.shape)
    d_packed = np.asarray(linear.dequant_xla(qt_packed, dtype=jnp.float32))
    np.testing.assert_array_equal(got, d_packed)


def test_i8_kernel_matches_reference():
    raw, wref = make()
    qt = linear.pack_q4_k_i8(raw, wref.shape)
    rng = np.random.default_rng(1)
    for T in (1, 8, 300):
        x = (rng.standard_normal((T, 512)) * 0.5).astype(np.float32)
        y = quant_matmul.matmul_packed(jnp.asarray(x, jnp.bfloat16), qt)
        assert y is not None
        want = x @ wref.T
        scale = np.abs(want).max() + 1e-6
        assert np.abs(np.asarray(y, np.float32) - want).max() / scale < 0.02


def test_layout_env_switch(monkeypatch):
    raw, wref = make()
    monkeypatch.setenv("KCPP_Q4K_LAYOUT", "i8")
    qt = linear.from_gguf(raw, GGMLType.Q4_K, wref.shape, packed=True)
    assert qt.kind == "q4_k_i8"
    monkeypatch.setenv("KCPP_Q4K_LAYOUT", "packed")
    qt2 = linear.from_gguf(raw, GGMLType.Q4_K, wref.shape, packed=True)
    assert qt2.kind == "q4_k"
