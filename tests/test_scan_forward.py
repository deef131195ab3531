"""Scan-based forward must match the unrolled forward exactly."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from koboldcpp_tpu.kv.cache import init_cache
from koboldcpp_tpu.models import llama
from koboldcpp_tpu.models.config import ModelConfig
from koboldcpp_tpu.models.synthetic import synthetic_params


@pytest.mark.parametrize("kind", ["dense", "q4_k"])
def test_scan_matches_unrolled(kind):
    cfg = ModelConfig(arch="llama", vocab_size=512,
                      hidden_size=256 if kind == "q4_k" else 128,
                      n_layers=3, n_heads=4, n_kv_heads=2, head_dim=32,
                      intermediate_size=512 if kind == "q4_k" else 256,
                      rope_dim=32)
    params = synthetic_params(cfg, kind=kind, seed=7)
    sparams = llama.stack_layers(params)
    assert "layers_stacked" in sparams

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 512, (2, 6)), dtype=jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(6), (2, 6)).astype(jnp.int32)
    cache1 = init_cache(cfg.n_layers, 2, 16, cfg.n_kv_heads, cfg.head_dim,
                        dtype=jnp.float32)
    cache2 = init_cache(cfg.n_layers, 2, 16, cfg.n_kv_heads, cfg.head_dim,
                        dtype=jnp.float32)

    ref, c1 = jax.jit(lambda p, t, q, c: llama.forward(p, cfg, t, q, c))(
        params, tokens, pos, cache1)
    got, c2 = jax.jit(lambda p, t, q, c: llama.forward_stacked(p, cfg, t, q, c))(
        sparams, tokens, pos, cache2)
    # weights/activations are bf16; fusion-order rounding differs between
    # the scan body and the unrolled graph
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(c2.k), np.asarray(c1.k),
                               rtol=2e-2, atol=2e-2)


def test_scan_incremental_decode():
    cfg = ModelConfig(arch="llama", vocab_size=256, hidden_size=128,
                      n_layers=2, n_heads=4, n_kv_heads=2, head_dim=32,
                      intermediate_size=256, rope_dim=32)
    params = llama.stack_layers(synthetic_params(cfg, kind="dense", seed=8))
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 256, 6)
    cache = init_cache(cfg.n_layers, 1, 16, cfg.n_kv_heads, cfg.head_dim,
                       dtype=jnp.float32)
    full, _ = llama.forward_stacked(
        params, cfg, jnp.asarray(toks[None], dtype=jnp.int32),
        jnp.arange(6)[None].astype(jnp.int32), cache)
    cache = init_cache(cfg.n_layers, 1, 16, cfg.n_kv_heads, cfg.head_dim,
                       dtype=jnp.float32)
    logits, cache = llama.forward_stacked(
        params, cfg, jnp.asarray(toks[None, :3], dtype=jnp.int32),
        jnp.arange(3)[None].astype(jnp.int32), cache)
    for t in range(3, 6):
        logits, cache = llama.forward_stacked(
            params, cfg, jnp.asarray([[toks[t]]], dtype=jnp.int32),
            jnp.array([[t]], dtype=jnp.int32), cache)
        np.testing.assert_allclose(np.asarray(logits[0, 0]),
                                   np.asarray(full[0, t]), rtol=2e-2, atol=2e-2)


def test_pooled_scan_decode_matches_unrolled():
    """Pooled-cache scan decode (decode_attention_rows in the scan body,
    cache pool in the carry — VERDICT r1 item 6) must match the unrolled
    per-layer-cache forward step for step."""
    from koboldcpp_tpu.kv.cache import init_pool_cache, is_pooled

    cfg = ModelConfig(arch="llama", vocab_size=256, hidden_size=128,
                      n_layers=3, n_heads=4, n_kv_heads=2, head_dim=64,
                      intermediate_size=256, rope_dim=64)
    params = synthetic_params(cfg, kind="dense", seed=11)
    sparams = llama.stack_layers(params)
    S, B = 32, 2
    cache_u = init_cache(cfg.n_layers, B, S, cfg.n_kv_heads, cfg.head_dim)
    pool = init_pool_cache(cfg.n_layers, B, S, cfg.n_kv_heads, cfg.head_dim)
    assert is_pooled(pool)

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
                               rtol=2e-2, atol=2e-2)

    # greedy decode 5 steps through BOTH paths; tokens must agree
    tu = int(np.asarray(lu[0, -1]).argmax())
    ts = int(np.asarray(ls[0, -1]).argmax())
    assert tu == ts
    for i in range(5):
        p = jnp.full((B, 1), 6 + i, jnp.int32)
        lu, cache_u = fwd_u(params, jnp.full((B, 1), tu, jnp.int32), p, cache_u)
        ls, pool = fwd_s(sparams, jnp.full((B, 1), ts, jnp.int32), p, pool)
        np.testing.assert_allclose(np.asarray(ls), np.asarray(lu),
                                   rtol=3e-2, atol=3e-2)
        tu = int(np.asarray(lu[0, -1]).argmax())
        ts = int(np.asarray(ls[0, -1]).argmax())
        assert tu == ts, f"step {i}"
