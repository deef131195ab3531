"""Golden tests: our vectorized (de)quantization vs the reference gguf-py numpy
implementation (mirrors /root/reference/gguf-py/tests/test_quants.py strategy).

- dequantize must be BIT-EXACT vs the oracle for every supported format
- quantize must be bit-exact where the oracle implements it (simple formats)
- K-quant quantizers (oracle has none) are validated by round-trip error bounds
  and by dequant agreement between our impl and the oracle on our own bytes.
"""
import numpy as np
import pytest

from koboldcpp_tpu.gguf import quants
from koboldcpp_tpu.gguf.constants import GGMLType, GGML_BLOCK_SIZES
from .oracle import load_reference_gguf

gguf_ref = load_reference_gguf()
RT = gguf_ref.GGMLQuantizationType

rng = np.random.default_rng(1234)
# a mix of scales/outliers/zero-blocks to exercise edge cases
_parts = [
    rng.standard_normal((4, 1024)).astype(np.float32),
    (rng.standard_normal((4, 1024)) * 50).astype(np.float32),
    (rng.standard_normal((4, 1024)) * 1e-3).astype(np.float32),
    np.zeros((1, 1024), dtype=np.float32),
    np.full((1, 1024), -3.25, dtype=np.float32),
    np.tile(np.linspace(-8, 8, 256, dtype=np.float32), (1, 4)),
]
X = np.concatenate(_parts, axis=0)

SIMPLE = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q8_0,
          GGMLType.TQ1_0, GGMLType.TQ2_0]
KQUANT = [GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K]

# max round-trip abs error per format, in units of per-row max|x|
RT_TOL = {
    GGMLType.Q4_0: 0.15, GGMLType.Q4_1: 0.15, GGMLType.Q5_0: 0.08,
    GGMLType.Q5_1: 0.08, GGMLType.Q8_0: 0.01,
    GGMLType.Q2_K: 0.40, GGMLType.Q3_K: 0.18, GGMLType.Q4_K: 0.12,
    GGMLType.Q5_K: 0.06, GGMLType.Q6_K: 0.05, GGMLType.Q8_K: 0.01,
    GGMLType.IQ4_NL: 0.15, GGMLType.IQ4_XS: 0.16,
    GGMLType.TQ1_0: 0.51, GGMLType.TQ2_0: 0.51,
}


@pytest.mark.parametrize("t", SIMPLE, ids=lambda t: t.name)
def test_simple_quantize_bit_exact(t):
    ours = quants.quantize(X, t)
    theirs = gguf_ref.quants.quantize(X.copy(), RT[t.name])
    assert ours.shape == theirs.shape
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("t", SIMPLE + KQUANT + [GGMLType.IQ4_NL, GGMLType.IQ4_XS],
                         ids=lambda t: t.name)
def test_dequantize_bit_exact_vs_oracle(t):
    # quantize with whichever impl supports it, then compare dequants bit-wise
    raw = quants.quantize(X, t)
    ours = quants.dequantize(raw, t)
    theirs = gguf_ref.quants.dequantize(raw.copy(), RT[t.name])
    assert ours.shape == theirs.shape
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("t", list(RT_TOL), ids=lambda t: t.name)
def test_roundtrip_error_bounds(t):
    raw = quants.quantize(X, t)
    back = quants.dequantize(raw, t)
    scale = np.abs(X).max(axis=-1, keepdims=True) + 1e-30
    rel = np.abs(back - X) / scale
    assert rel.max() <= RT_TOL[t], f"{t.name} rel err {rel.max():.4f}"


@pytest.mark.parametrize("t", [GGMLType.F32, GGMLType.F16, GGMLType.BF16],
                         ids=lambda t: t.name)
def test_float_formats(t):
    raw = quants.quantize(X, t)
    # oracle returns typed arrays for float formats; ours is uniformly bytes
    theirs = np.ascontiguousarray(gguf_ref.quants.quantize(X.copy(), RT[t.name]))
    np.testing.assert_array_equal(raw, theirs.view(np.uint8).reshape(raw.shape))
    back = quants.dequantize(raw, t)
    theirs_d = gguf_ref.quants.dequantize(raw.copy(), RT[t.name])
    np.testing.assert_array_equal(back, theirs_d)


def test_row_nbytes():
    from koboldcpp_tpu.gguf.constants import row_nbytes
    assert row_nbytes(GGMLType.Q4_K, 4096) == 4096 // 256 * 144
    assert row_nbytes(GGMLType.F16, 10) == 20


def test_q8_k_roundtrip():
    raw = quants.quantize(X, GGMLType.Q8_K)
    back = quants.dequantize(raw, GGMLType.Q8_K)
    scale = np.abs(X).max(axis=-1, keepdims=True) + 1e-30
    assert (np.abs(back - X) / scale).max() < 0.01
    # bsums bookkeeping: sum of 16-groups must match stored int16s
    blocks = raw.reshape(-1, 292)
    q = blocks[:, 4:260].view(np.int8).reshape(-1, 16, 16)
    bsums = blocks[:, 260:292].copy().view(np.int16)
    np.testing.assert_array_equal(q.sum(axis=-1, dtype=np.int16), bsums)
