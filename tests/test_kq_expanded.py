"""Expanded serving layouts for the per-16-group trio (VERDICT r4 item 7):
q6_k_i8f (full signed i8), q3_k_n4 / q2_k_n4 (plane-split nibbles).

The packers must preserve EXACT decoded values vs the dense layouts (same
raw GGUF bytes in, identical dequant out), and the T=1 matvec kernels must
stay within activation-quant (i8) noise of the exact product."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.gguf import quants
from koboldcpp_tpu.gguf.constants import GGMLType
from koboldcpp_tpu.ops import linear, quant_matmul


def _raw(t: GGMLType, out_f=256, in_f=512, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((out_f, in_f)) * 0.1).astype(np.float32)
    raw = quants.quantize(w, t)
    wref = quants.dequantize(raw, t).reshape(out_f, in_f)
    return raw, wref


@pytest.mark.parametrize("t,dense_pack,exp_pack,kind", [
    (GGMLType.Q6_K, linear.pack_q6_k, linear.pack_q6_k_i8f, "q6_k_i8f"),
    (GGMLType.Q3_K, linear.pack_q3_k, linear.pack_q3_k_n4, "q3_k_n4"),
    (GGMLType.Q2_K, linear.pack_q2_k, linear.pack_q2_k_n4, "q2_k_n4"),
], ids=lambda v: getattr(v, "name", getattr(v, "__name__", str(v))))
def test_expanded_pack_exact_values(t, dense_pack, exp_pack, kind):
    raw, wref = _raw(t)
    qt = exp_pack(raw, wref.shape)
    assert qt.kind == kind
    w = np.asarray(linear.dequant_xla(qt, dtype=jnp.float32))
    np.testing.assert_allclose(w, wref, rtol=2e-2, atol=2e-2)
    # bit-level agreement with the ORACLE dequant at bf16 scale precision:
    # the layouts must encode the same (value, scale[, min]) triples
    wd = np.asarray(linear.dequant_xla(dense_pack(raw, wref.shape),
                                       dtype=jnp.float32))
    np.testing.assert_allclose(w, wd, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("t,exp_pack", [
    (GGMLType.Q6_K, linear.pack_q6_k_i8f),
    (GGMLType.Q3_K, linear.pack_q3_k_n4),
    (GGMLType.Q2_K, linear.pack_q2_k_n4),
], ids=lambda v: getattr(v, "name", getattr(v, "__name__", str(v))))
def test_expanded_matvec_kernel(t, exp_pack):
    raw, wref = _raw(t, seed=5)
    qt = exp_pack(raw, wref.shape)
    rng = np.random.default_rng(7)
    x = jnp.asarray((rng.standard_normal((1, wref.shape[1])) * 0.7)
                    .astype(np.float32), jnp.bfloat16)
    ref = np.asarray(x, np.float32) @ wref.T
    y = quant_matmul.matmul_packed(x, qt)
    assert y is not None
    scale = np.abs(ref).max() + 1e-6
    err = np.abs(np.asarray(y, np.float32) - ref).max() / scale
    assert err < 0.03, err
    # T>1 re-dispatches through the DENSE layout's fields (the pack carries
    # both) — same numerics class as the dense kernels
    x8 = jnp.asarray((rng.standard_normal((8, wref.shape[1])) * 0.7)
                     .astype(np.float32), jnp.bfloat16)
    y8 = linear.matmul(x8, qt)
    ref8 = np.asarray(x8, np.float32) @ wref.T
    err8 = np.abs(np.asarray(y8, np.float32) - ref8).max() / (np.abs(ref8).max() + 1e-6)
    assert err8 < 0.03, err8
    # a stripped tensor (expanded fields only) still serves T>1 via dequant
    slim = linear.QTensor(kind=qt.kind, shape=qt.shape, data={
        k: v for k, v in qt.data.items()
        if k in ("q", "scale", "scale_t", "min", "min_t")})
    assert quant_matmul.matmul_packed(x8, slim) is None
    y8b = linear.matmul(x8, slim)
    err8b = np.abs(np.asarray(y8b, np.float32) - ref8).max() / (np.abs(ref8).max() + 1e-6)
    assert err8b < 0.03, err8b


def test_env_selects_expanded_layout(monkeypatch):
    raw, wref = _raw(GGMLType.Q6_K)
    monkeypatch.setenv("KCPP_KQ_LAYOUT", "expanded")
    qt = linear.from_gguf(raw, GGMLType.Q6_K, wref.shape, packed=True)
    assert qt.kind == "q6_k_i8f"
    monkeypatch.delenv("KCPP_KQ_LAYOUT")
    qt = linear.from_gguf(raw, GGMLType.Q6_K, wref.shape, packed=True)
    assert qt.kind == "q6_k"
