"""Native low-bit IQ serving layouts (pack_iq_native, VERDICT r2 item 5):
plane-coded grids + sign sidecars served by dedicated Pallas kernels at
2.5-5 bpw HBM instead of the r2 int8 re-expansion's 8.5 bpw."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.gguf import quants as nq
from koboldcpp_tpu.gguf.constants import GGMLType, GGML_BLOCK_SIZES
from koboldcpp_tpu.ops import linear, quant_matmul
from koboldcpp_tpu.ops.linear import pack_iq_native

rng = np.random.default_rng(7)

IQ_NATIVE_TYPES = [GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
                   GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S,
                   GGMLType.IQ1_M]


def make_raw(t: GGMLType, rows=256, cols=512):
    """Random raw blocks with the leading f16 scale pinned finite (random
    f16 bit patterns can be inf/nan; IQ1_M derives its scale from packed
    nibbles, so it keeps a finite-mask comparison instead)."""
    blk, sz = GGML_BLOCK_SIZES[t]
    raw = rng.integers(0, 256, size=(rows, cols // blk * sz), dtype=np.uint8)
    if t != GGMLType.IQ1_M:
        b = raw.reshape(rows, cols // blk, sz)
        b[:, :, 0] = rng.integers(0, 256, b[:, :, 0].shape)
        b[:, :, 1] = 0x2C | rng.integers(0, 4, b[:, :, 1].shape)  # small f16
    return raw


@pytest.mark.parametrize("t", IQ_NATIVE_TYPES, ids=lambda t: t.name)
def test_pack_dequant_roundtrip(t):
    raw = make_raw(t, rows=16)
    want = nq.dequantize(raw, t)
    qt = pack_iq_native(raw, want.shape, t)
    assert qt.kind in ("iq2p", "iq3px", "iq3ps", "iq1p")
    got = np.asarray(linear.dequant_xla(qt, dtype=jnp.float32))
    mask = np.isfinite(want)
    scale = np.abs(want[mask]).max() + 1e-6
    # scales round to bf16 in the packed sidecars
    assert np.abs(got[mask] - want[mask]).max() / scale < 0.01


@pytest.mark.parametrize("t", IQ_NATIVE_TYPES, ids=lambda t: t.name)
def test_native_iq_matvec(t):
    raw = make_raw(t, rows=256)
    wref = nq.dequantize(raw, t).reshape(256, 512)
    if not np.isfinite(wref).all():
        pytest.skip("degenerate random scales")
    qt = pack_iq_native(raw, wref.shape, t)
    x = jnp.asarray((rng.standard_normal((1, 512)) * 0.5).astype(np.float32),
                    jnp.bfloat16)
    y = quant_matmul.matmul_packed(x, qt)
    assert y is not None, "matvec kernel must cover native IQ"
    want = np.asarray(x, np.float32) @ wref.T
    scale = np.abs(want).max() + 1e-6
    # i8 activation quantization noise class (same as q4_k i8 serving)
    assert np.abs(np.asarray(y, np.float32) - want).max() / scale < 0.03


@pytest.mark.parametrize("t", [GGMLType.IQ2_XXS, GGMLType.IQ3_S,
                               GGMLType.IQ1_S, GGMLType.IQ1_M],
                         ids=lambda t: t.name)
@pytest.mark.parametrize("T", [8, 300])
def test_native_iq_2d_kernel(t, T):
    raw = make_raw(t, rows=256)
    wref = nq.dequantize(raw, t).reshape(256, 512)
    if not np.isfinite(wref).all():
        pytest.skip("degenerate random scales")
    qt = pack_iq_native(raw, wref.shape, t)
    x = (rng.standard_normal((T, 512)) * 0.5).astype(np.float32)
    y = quant_matmul.matmul_packed(jnp.asarray(x, jnp.bfloat16), qt)
    assert y is not None
    want = x @ wref.T
    scale = np.abs(want).max() + 1e-6
    assert np.abs(np.asarray(y, np.float32) - want).max() / scale < 0.02


def test_native_iq_stacked_matvec():
    # in_f >= 32*G: below that the scratch sublane guard falls back to 2-D
    t = GGMLType.IQ2_XXS
    qts, refs = [], []
    for _ in range(3):
        raw = make_raw(t, rows=256, cols=1024)
        w = nq.dequantize(raw, t).reshape(256, 1024)
        qts.append(pack_iq_native(raw, w.shape, t))
        refs.append(w)
    data = {n: jnp.stack([q.data[n] for q in qts]) for n in qts[0].data}
    stacked = linear.QTensor(kind=qts[0].kind, shape=qts[0].shape, data=data)
    x = jnp.asarray((rng.standard_normal((1, 1024)) * 0.5).astype(np.float32),
                    jnp.bfloat16)
    for li in range(3):
        if not np.isfinite(refs[li]).all():
            continue
        y = quant_matmul.matmul_packed_stacked(x, stacked, li)
        assert y is not None
        want = np.asarray(x, np.float32) @ refs[li].T
        scale = np.abs(want).max() + 1e-6
        assert np.abs(np.asarray(y, np.float32) - want).max() / scale < 0.03


def test_hbm_footprint_and_routing(monkeypatch):
    """The whole point of the native layout: IQ2_XXS resident bpw must be
    ~4 (2 code + 1 sign + 2x0.5 scale copies), not the 8.5+ of the int8
    re-expansion; and from_gguf routes there by default."""
    t = GGMLType.IQ2_XXS
    raw = make_raw(t, rows=256)
    qt = linear.from_gguf(raw, t, (256, 512), packed=True)
    assert qt.kind == "iq2p"
    n_weights = 256 * 512
    resident = sum(v.nbytes for v in qt.data.values())
    bpw = resident * 8 / n_weights
    assert bpw < 4.3, f"IQ2_XXS resident {bpw:.2f} bpw"
    streamed = sum(qt.data[n].nbytes
                   for n in quant_matmul._MATVEC_FIELDS["iq2p"])
    assert streamed * 8 / n_weights < 3.8

    monkeypatch.setenv("KCPP_IQ_NATIVE", "0")
    qt2 = linear.from_gguf(raw, t, (256, 512), packed=True)
    assert qt2.kind == "q8_0"  # r2 fallback still available

    # IQ1_S lands near 3 bpw
    raw1 = make_raw(GGMLType.IQ1_S, rows=256)
    monkeypatch.setenv("KCPP_IQ_NATIVE", "1")
    qt3 = linear.from_gguf(raw1, GGMLType.IQ1_S, (256, 512), packed=True)
    assert qt3.kind == "iq1p"
    bpw1 = sum(v.nbytes for v in qt3.data.values()) * 8 / n_weights
    assert bpw1 < 4.1, f"IQ1_S resident {bpw1:.2f} bpw"


@pytest.mark.parametrize("t", [GGMLType.IQ2_XXS, GGMLType.IQ2_XS,
                               GGMLType.IQ2_S, GGMLType.IQ3_XXS,
                               GGMLType.IQ3_S, GGMLType.IQ1_S,
                               GGMLType.IQ1_M],
                         ids=lambda t: t.name)
def test_iq_quantizer_produces_valid_blocks(t):
    """The native IQ2_XXS/IQ3_XXS quantizers (VERDICT r2 item 5b) must emit
    blocks the reference gguf-py oracle decodes identically, with bounded
    reconstruction error, with and without imatrix weighting."""
    import sys
    sys.path.insert(0, "tests")
    from .oracle import load_reference_gguf
    ref = load_reference_gguf()

    x = (rng.standard_normal((32, 1024)) * 0.1).astype(np.float32)
    qw = np.abs(rng.standard_normal(1024)).astype(np.float32) + 0.1
    for use_qw in (None, qw):
        raw = nq.quantize(x, t, quant_weights=use_qw)
        ours = nq.dequantize(raw, t)
        theirs = ref.quants.dequantize(raw.copy(),
                                       ref.GGMLQuantizationType[t.name])
        np.testing.assert_array_equal(ours, theirs)
        rel = np.sqrt(((ours - x) ** 2).mean()) / np.sqrt((x ** 2).mean())
        # 1-3 bpw codebook quantization of gaussian data
        bound = {GGMLType.IQ2_XXS: 0.45, GGMLType.IQ2_XS: 0.4,
                 GGMLType.IQ2_S: 0.35, GGMLType.IQ3_XXS: 0.32,
                 GGMLType.IQ3_S: 0.25, GGMLType.IQ1_S: 0.62,
                 GGMLType.IQ1_M: 0.62}[t]
        assert rel < bound, (t.name, rel)


def test_iq_quantize_pack_serve_roundtrip():
    """quantize -> pack_iq_native -> matvec serves what the quantizer wrote."""
    t = GGMLType.IQ3_XXS
    w = (rng.standard_normal((256, 512)) * 0.1).astype(np.float32)
    raw = nq.quantize(w, t)
    wref = nq.dequantize(raw, t).reshape(256, 512)
    qt = pack_iq_native(raw, wref.shape, t)
    x = jnp.asarray((rng.standard_normal((1, 512)) * 0.5).astype(np.float32),
                    jnp.bfloat16)
    y = quant_matmul.matmul_packed(x, qt)
    want = np.asarray(x, np.float32) @ wref.T
    scale = np.abs(want).max() + 1e-6
    assert np.abs(np.asarray(y, np.float32) - want).max() / scale < 0.03
