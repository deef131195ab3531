"""Layer-stacked decode matvec kernels (scalar-prefetch layer indexing) vs
the per-layer kernels they mirror, plus the pooled scan decode path with
packed weights end to end.

These kernels are what makes lax.scan decode serving-grade (VERDICT r2
item 1): weights stay out of scan xs so XLA never materializes per-layer
slice copies."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from koboldcpp_tpu.gguf import quants as nq
from koboldcpp_tpu.gguf.constants import GGMLType
from koboldcpp_tpu.ops import quant_matmul
from koboldcpp_tpu.ops.linear import QTensor, from_gguf


def make_stacked(kind: GGMLType, L=3, out_f=256, in_f=512, seed=0):
    """L independent per-layer QTensors + their field-stacked union."""
    rng = np.random.default_rng(seed)
    qts, refs = [], []
    for _ in range(L):
        w = (rng.standard_normal((out_f, in_f)) * 0.05).astype(np.float32)
        raw = nq.quantize(w, kind)
        qts.append(from_gguf(raw, kind, w.shape, packed=True))
        refs.append(nq.dequantize(raw, kind).reshape(out_f, in_f))
    data = {n: jnp.stack([q.data[n] for q in qts])
            for n in qts[0].data}
    stacked = QTensor(kind=qts[0].kind, shape=qts[0].shape, data=data)
    return qts, stacked, refs


@pytest.mark.parametrize("kind", [GGMLType.Q4_K, GGMLType.Q5_K,
                                  GGMLType.Q6_K, GGMLType.Q8_0,
                                  GGMLType.Q2_K, GGMLType.Q3_K])
def test_stacked_matvec_matches_per_layer(kind, monkeypatch):
    qts, stacked, refs = make_stacked(kind, seed=int(kind))
    rng = np.random.default_rng(99)
    x = jnp.asarray((rng.standard_normal((1, 512)) * 0.5).astype(np.float32),
                    jnp.bfloat16)
    for li in range(len(qts)):
        y = quant_matmul.matmul_packed_stacked(x, stacked, li)
        assert y is not None, f"stacked kernel must cover {kind.name}"
        want = np.asarray(x, np.float32) @ refs[li].T
        got = np.asarray(y, np.float32)
        scale = np.abs(want).max() + 1e-6
        assert np.abs(got - want).max() / scale < 0.03, (kind.name, li)


def test_stacked_matvec_q4k_bf16_path(monkeypatch):
    """KCPP_Q4K_I8=0 takes the raw bf16 kernel for q4_k (q5_k falls back)."""
    monkeypatch.setenv("KCPP_Q4K_I8", "0")
    qts, stacked, refs = make_stacked(GGMLType.Q4_K, seed=5)
    x = jnp.asarray(
        (np.random.default_rng(1).standard_normal((1, 512)) * 0.5)
        .astype(np.float32), jnp.bfloat16)
    y = quant_matmul.matmul_packed_stacked(x, stacked, 1)
    assert y is not None
    want = np.asarray(x, np.float32) @ refs[1].T
    scale = np.abs(want).max() + 1e-6
    assert np.abs(np.asarray(y, np.float32) - want).max() / scale < 0.02

    _, stacked5, _ = make_stacked(GGMLType.Q5_K, seed=6)
    assert quant_matmul.matmul_packed_stacked(x, stacked5, 0) is None


def test_stacked_matvec_t2_falls_back():
    _, stacked, _ = make_stacked(GGMLType.Q4_K, seed=7)
    x = jnp.zeros((2, 512), jnp.bfloat16)
    assert quant_matmul.matmul_packed_stacked(x, stacked, 0) is None


def test_pooled_scan_decode_q4k_matches_unrolled():
    """End-to-end: pooled-cache scan decode with PACKED q4_k weights (the
    serving scan path — LayerRefs hit the stacked kernels) must produce the
    same tokens as the unrolled forward."""
    from koboldcpp_tpu.kv.cache import init_cache, init_pool_cache, is_pooled
    from koboldcpp_tpu.models import llama
    from koboldcpp_tpu.models.config import ModelConfig
    from koboldcpp_tpu.models.synthetic import synthetic_params

    cfg = ModelConfig(arch="llama", vocab_size=256, hidden_size=256,
                      n_layers=3, n_heads=4, n_kv_heads=2, head_dim=64,
                      intermediate_size=256, rope_dim=64)
    params = synthetic_params(cfg, kind="q4_k", seed=13)
    sparams = llama.stack_layers(params)
    assert "layers_stacked" in sparams
    S, B = 32, 1
    cache_u = init_cache(cfg.n_layers, B, S, cfg.n_kv_heads, cfg.head_dim)
    pool = init_pool_cache(cfg.n_layers, B, S, cfg.n_kv_heads, cfg.head_dim)

    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(0, 256, (B, 6)), dtype=jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(6), (B, 6)).astype(jnp.int32)

    fwd_u = jax.jit(lambda p, t, q, c: llama.forward(p, cfg, t, q, c,
                                                     last_only=True))
    fwd_s = jax.jit(lambda p, t, q, c: llama.forward_stacked(p, cfg, t, q, c,
                                                             last_only=True))
    lu, cache_u = fwd_u(params, prompt, pos, cache_u)
    ls, pool = fwd_s(sparams, prompt, pos, pool)
    assert is_pooled(pool)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lu),
                               rtol=3e-2, atol=3e-2)

    tu = int(np.asarray(lu[0, -1]).argmax())
    ts = int(np.asarray(ls[0, -1]).argmax())
    assert tu == ts
    for i in range(5):
        p = jnp.full((B, 1), 6 + i, jnp.int32)
        lu, cache_u = fwd_u(params, jnp.full((B, 1), tu, jnp.int32), p, cache_u)
        ls, pool = fwd_s(sparams, jnp.full((B, 1), ts, jnp.int32), p, pool)
        np.testing.assert_allclose(np.asarray(ls), np.asarray(lu),
                                   rtol=4e-2, atol=4e-2)
        tu = int(np.asarray(lu[0, -1]).argmax())
        ts = int(np.asarray(ls[0, -1]).argmax())
        assert tu == ts, f"step {i}"
