"""IQ codebook formats + ternary: bit-exact dequantization vs the oracle on
random (valid) raw blocks."""
import numpy as np
import pytest

from koboldcpp_tpu.gguf import quants
from koboldcpp_tpu.gguf.constants import GGMLType, GGML_BLOCK_SIZES
from .oracle import load_reference_gguf

gguf_ref = load_reference_gguf()
RT = gguf_ref.GGMLQuantizationType

rng = np.random.default_rng(99)

IQ_TYPES = [GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
            GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ1_M,
            GGMLType.TQ1_0, GGMLType.TQ2_0]


def random_raw(t: GGMLType, n_blocks=64) -> np.ndarray:
    blk, sz = GGML_BLOCK_SIZES[t]
    raw = rng.integers(0, 256, size=(4, n_blocks // 4 * sz), dtype=np.uint8)
    return raw


@pytest.mark.parametrize("t", IQ_TYPES, ids=lambda t: t.name)
def test_dequantize_bit_exact(t):
    raw = random_raw(t)
    ours = quants.dequantize(raw, t)
    theirs = gguf_ref.quants.dequantize(raw.copy(), RT[t.name])
    assert ours.shape == theirs.shape
    mask = np.isfinite(theirs)  # random fp16 scales can be inf/nan
    np.testing.assert_array_equal(ours[mask], theirs[mask])
    np.testing.assert_array_equal(np.isnan(ours), np.isnan(theirs))


def test_q8_1_roundtrip():
    # oracle has no Q8_1 quantizer; validate round-trip + the d*sum invariant
    x = rng.standard_normal((4, 256)).astype(np.float32)
    raw = quants.quantize(x, GGMLType.Q8_1)
    back = quants.dequantize(raw, GGMLType.Q8_1)
    assert np.abs(back - x).max() < 0.02 * np.abs(x).max()
    blocks = raw.reshape(-1, 36)
    d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)[:, 0]
    s = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)[:, 0]
    q = blocks[:, 4:].view(np.int8)
    np.testing.assert_allclose(
        s, (d * q.sum(axis=-1)).astype(np.float16).astype(np.float32), rtol=1e-3)


def test_supported_list_is_complete():
    sup = quants.supported_quant_types()
    for t in IQ_TYPES + [GGMLType.Q4_K, GGMLType.IQ4_NL, GGMLType.IQ4_XS]:
        assert t in sup
