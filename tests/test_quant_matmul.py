"""Pallas fused dequant-matmul kernels (interpret mode on CPU) vs the XLA
dequant path and the numpy reference."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.gguf import GGMLType, quants
from koboldcpp_tpu.ops import linear, quant_matmul


def make_qt(t: GGMLType, out_f=256, in_f=512, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((out_f, in_f)) * 0.1).astype(np.float32)
    raw = quants.quantize(w, t)
    qt = linear.from_gguf(raw, t, (out_f, in_f), packed=True)
    assert qt.kind != "dense"
    wref = quants.dequantize(raw, t).reshape(out_f, in_f)
    return qt, wref


@pytest.mark.parametrize("t", [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K,
                               GGMLType.Q2_K, GGMLType.Q3_K,
                               GGMLType.Q8_0],
                         ids=lambda t: t.name)
@pytest.mark.parametrize("T", [1, 8, 300])
def test_kernel_matches_reference(t, T):
    qt, wref = make_qt(t)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((T, qt.in_features)) * 0.5).astype(np.float32)
    y = quant_matmul.matmul_packed(jnp.asarray(x, dtype=jnp.bfloat16), qt)
    assert y is not None, "kernel should cover this shape"
    want = x @ wref.T
    got = np.asarray(y, dtype=np.float32)
    # bf16 x/scales => ~1% relative error budget
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 0.02


def test_q5k_dequant_xla_matches_reference():
    """Q5_K v2 pack (qs2 + hb sidecar) must reconstruct exactly through the
    XLA dequant path (non-kernel callers: TP gather, LoRA merge, prefill
    fallback shapes)."""
    qt, wref = make_qt(GGMLType.Q5_K)
    w = np.asarray(linear.dequant_xla(qt, dtype=jnp.float32))
    np.testing.assert_allclose(w, wref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("t", [GGMLType.Q2_K, GGMLType.Q3_K],
                         ids=lambda t: t.name)
def test_q23k_dequant_xla_matches_reference(t):
    """Q2_K/Q3_K packed layouts (plane-structured qs2 + plane-major scales)
    must reconstruct exactly through the XLA dequant path."""
    qt, wref = make_qt(t)
    w = np.asarray(linear.dequant_xla(qt, dtype=jnp.float32))
    np.testing.assert_allclose(w, wref, rtol=2e-2, atol=2e-2)


def test_unsupported_shape_falls_back():
    qt, _ = make_qt(GGMLType.Q4_K, out_f=256, in_f=512)
    qt2 = linear.QTensor(kind="q4_k", shape=(100, 512), data=qt.data)
    assert quant_matmul.matmul_packed(jnp.zeros((1, 512), jnp.bfloat16), qt2) is None


def test_linear_matmul_uses_kernel_and_matches():
    qt, wref = make_qt(GGMLType.Q4_K, out_f=512, in_f=768)
    x = np.random.default_rng(2).standard_normal((4, 768)).astype(np.float32) * 0.3
    y = linear.matmul(jnp.asarray(x, dtype=jnp.bfloat16), qt)
    want = x @ wref.T
    scale = np.abs(want).max() + 1e-6
    assert np.abs(np.asarray(y, np.float32) - want).max() / scale < 0.02


def test_batched_3d_input():
    qt, wref = make_qt(GGMLType.Q8_0)
    x = np.random.default_rng(3).standard_normal((2, 3, qt.in_features)).astype(np.float32) * 0.2
    y = quant_matmul.matmul_packed(jnp.asarray(x, dtype=jnp.bfloat16), qt)
    assert y.shape == (2, 3, qt.out_features)
    want = x @ wref.T
    scale = np.abs(want).max() + 1e-6
    assert np.abs(np.asarray(y, np.float32) - want).max() / scale < 0.02


@pytest.mark.parametrize("T", [2, 4, 8])
def test_q4k_row_kernel_small_batch(T, monkeypatch):
    """The T<=8 generalization of the q4_k row matvec kernel (masked T*GS
    expansion stacks) must match the reference for every batch it covers."""
    monkeypatch.setattr(quant_matmul, "MATVEC_MAX_T", 8)
    monkeypatch.setenv("KCPP_Q4K_I8", "0")  # bf16 batched kernel under test
    qt, wref = make_qt(GGMLType.Q4_K)
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((T, qt.in_features)) * 0.5).astype(np.float32)
    y = quant_matmul.matmul_packed(jnp.asarray(x, dtype=jnp.bfloat16), qt)
    assert y is not None
    want = x @ wref.T
    got = np.asarray(y, dtype=np.float32)
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 0.02


@pytest.mark.parametrize("T", [1, 2, 4])
def test_q5k_row_kernel_small_batch(T):
    """The q5_k row matvec kernel (magic 128+4q values, hb 5th-bit OR) must
    match the reference for every decode batch it covers."""
    qt, wref = make_qt(GGMLType.Q5_K)
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((T, qt.in_features)) * 0.5).astype(np.float32)
    y = quant_matmul._packed_matvec_q4k(
        jnp.asarray(x, dtype=jnp.bfloat16),
        tuple(qt.data[n] for n in quant_matmul._MATVEC_FIELDS_Q5K),
        kind="q5_k", out_f=qt.out_features, in_f=qt.in_features,
        interpret=quant_matmul._use_interpret())
    want = x @ wref.T
    got = np.asarray(y, dtype=np.float32)
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 0.02


# ---------------------------------------------------------------------------
# int8 MXU decode path (VERDICT r1 item 1 / PERF_NOTES "Paths to roofline"):
# per-32-group int8 activations x int8 nibble weights, i32 accumulation.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind", ["q4_k", "q5_k"])
def test_i8_decode_matvec_close_to_exact(kind, monkeypatch):
    from koboldcpp_tpu.gguf import quants as nq
    from koboldcpp_tpu.gguf.constants import GGMLType
    from koboldcpp_tpu.ops import quant_matmul
    from koboldcpp_tpu.ops.linear import from_gguf

    t = GGMLType.Q4_K if kind == "q4_k" else GGMLType.Q5_K
    rng = np.random.default_rng(5)
    w = (rng.standard_normal((256, 512)) * 0.05).astype(np.float32)
    raw = nq.quantize(w, t)
    qt = from_gguf(raw, t, w.shape, packed=True)
    ref_w = nq.dequantize(raw, t)
    x = jnp.asarray((rng.standard_normal((1, 512)) * 0.7).astype(np.float32))
    ref = np.asarray(x, np.float32) @ ref_w.T

    monkeypatch.setenv("KCPP_Q4K_I8", "1")
    y_i8 = quant_matmul.matmul_packed(x.astype(jnp.bfloat16), qt)
    assert y_i8 is not None
    monkeypatch.setenv("KCPP_Q4K_I8", "0")
    y_bf = quant_matmul.matmul_packed(x.astype(jnp.bfloat16), qt)

    # int8 activation quantization (q8_1-equivalent, the same noise
    # llama.cpp serves with) bounds the deviation from the exact product
    scale = np.abs(ref).max() + 1e-6
    err_i8 = np.abs(np.asarray(y_i8, np.float32) - ref).max() / scale
    err_bf = np.abs(np.asarray(y_bf, np.float32) - ref).max() / scale
    assert err_i8 < 0.03, err_i8
    # and it should be in the same error ballpark as the bf16 kernel
    assert err_i8 < max(4 * err_bf, 0.02), (err_i8, err_bf)


@pytest.mark.parametrize("kind", ["q4_k", "q5_k"])
@pytest.mark.parametrize("T", [2, 4, 8])
def test_i8_decode_matvec_batched(kind, T, monkeypatch):
    """The T<=8 batched int8-MXU matvec (per-token expansion stacks, the
    batched-8 serving decode path) must stay within activation-quant noise
    of the exact product for every token row."""
    t = GGMLType.Q4_K if kind == "q4_k" else GGMLType.Q5_K
    qt, wref = make_qt(t, seed=7)
    monkeypatch.setattr(quant_matmul, "MATVEC_MAX_T", 8)
    monkeypatch.setenv("KCPP_Q4K_I8", "1")
    rng = np.random.default_rng(21)
    x = (rng.standard_normal((T, qt.in_features)) * 0.6).astype(np.float32)
    y = quant_matmul.matmul_packed(jnp.asarray(x, jnp.bfloat16), qt)
    assert y is not None
    want = x @ wref.T
    got = np.asarray(y, np.float32)
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 0.03


@pytest.mark.parametrize("kind", ["q8_0", "q6_k"])
def test_i8_decode_matvec_q8_q6(kind, monkeypatch):
    """The q8_0/q6_k int8-MXU row matvecs (mmvq ports, VERDICT r2 item 3)
    must stay within activation-quant noise of the exact product AND of the
    bf16 kernels they replace."""
    t = GGMLType.Q8_0 if kind == "q8_0" else GGMLType.Q6_K
    qt, wref = make_qt(t, seed=11)
    rng = np.random.default_rng(12)
    x = jnp.asarray((rng.standard_normal((1, qt.in_features)) * 0.7)
                    .astype(np.float32), jnp.bfloat16)
    ref = np.asarray(x, np.float32) @ wref.T

    monkeypatch.setenv("KCPP_MM_I8", "1")
    y_i8 = quant_matmul.matmul_packed(x, qt)
    assert y_i8 is not None
    monkeypatch.setenv("KCPP_MM_I8", "0")
    y_bf = quant_matmul.matmul_packed(x, qt)

    scale = np.abs(ref).max() + 1e-6
    err_i8 = np.abs(np.asarray(y_i8, np.float32) - ref).max() / scale
    err_bf = np.abs(np.asarray(y_bf, np.float32) - ref).max() / scale
    assert err_i8 < 0.03, err_i8
    assert err_i8 < max(4 * err_bf, 0.02), (err_i8, err_bf)
