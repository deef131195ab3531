"""Sharding tests on the 8-device CPU mesh: TP/DP-sharded forward must equal
the unsharded forward bit-for-bit (same math, collectives inserted by XLA)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from koboldcpp_tpu.kv.cache import init_cache
from koboldcpp_tpu.models import llama
from koboldcpp_tpu.models.config import ModelConfig
from koboldcpp_tpu.models.synthetic import synthetic_params
from koboldcpp_tpu.parallel import (
    make_mesh, shard_cache, shard_params, token_sharding)


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        arch="llama", vocab_size=512, hidden_size=128, n_layers=2,
        n_heads=8, n_kv_heads=4, head_dim=32, intermediate_size=256,
        rope_dim=32)
    params = synthetic_params(cfg, kind="dense", seed=3)
    return cfg, params


def _forward(cfg, params, cache, tokens, positions):
    return llama.forward(params, cfg, tokens, positions, cache, last_only=False)


def test_tp_sharded_matches_unsharded(setup):
    cfg, params = setup
    assert len(jax.devices()) == 8
    B, T = 2, 8
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), dtype=jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T), (B, T)).astype(jnp.int32)

    cache0 = init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads, cfg.head_dim,
                        dtype=jnp.float32)
    ref, _ = jax.jit(lambda p, t, q, c: _forward(cfg, p, c, t, q))(
        params, tokens, positions, cache0)

    mesh = make_mesh(8, dp=2, tp=4)
    sp = shard_params(params, mesh)
    sc = shard_cache(init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads,
                                cfg.head_dim, dtype=jnp.float32), mesh)
    st = jax.device_put(tokens, token_sharding(mesh))
    spos = jax.device_put(positions, token_sharding(mesh))
    with mesh:
        out, new_cache = jax.jit(lambda p, t, q, c: _forward(cfg, p, c, t, q))(
            sp, st, spos, sc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # cache writes must land identically
    _, ref_cache = jax.jit(lambda p, t, q, c: _forward(cfg, p, c, t, q))(
        params, tokens, positions,
        init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads, cfg.head_dim,
                   dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(new_cache.k), np.asarray(ref_cache.k),
                               rtol=2e-2, atol=2e-2)


def test_mesh_shapes():
    m = make_mesh(8)
    assert m.devices.size == 8
    m2 = make_mesh(8, dp=4, tp=2)
    assert m2.devices.shape == (4, 2)


def test_quantized_params_shard(setup):
    """Packed QTensors shard their row/col axes without error."""
    cfg, _ = setup
    cfg_q = ModelConfig(
        arch="llama", vocab_size=512, hidden_size=256, n_layers=1,
        n_heads=8, n_kv_heads=4, head_dim=32, intermediate_size=512,
        rope_dim=32)
    params = synthetic_params(cfg_q, kind="q4_k", seed=4)
    mesh = make_mesh(8, dp=1, tp=8)
    sp = shard_params(params, mesh)
    wqkv = sp["layers"][0]["wqkv"]
    assert wqkv.kind == "q4_k"
    # row-sharded: first axis split over tp
    shard_shape = wqkv.data["qs2"].sharding.shard_shape(wqkv.data["qs2"].shape)
    assert shard_shape[0] == wqkv.shape[0] // 8
    # lane-transposed scale sidecars shard their LAST axis (out rows)
    st = wqkv.data["slo_t"]
    assert st.sharding.shard_shape(st.shape)[1] == st.shape[1] // 8


@pytest.mark.parametrize("kind,tfield", [
    ("q2_k", "scale_pt"), ("q3_k", "scale_pt"), ("q6_k", "scale_pt")])
def test_pt_sidecars_shard_transposed(kind, tfield):
    """`*_pt` plane-major transposed sidecars (ADVICE r1) must shard their
    LAST axis under row-sharding, like the `*_t` fields."""
    cfg_q = ModelConfig(
        arch="llama", vocab_size=512, hidden_size=256, n_layers=1,
        n_heads=8, n_kv_heads=4, head_dim=32, intermediate_size=512,
        rope_dim=32)
    params = synthetic_params(cfg_q, kind=kind, seed=4)
    mesh = make_mesh(8, dp=1, tp=8)
    sp = shard_params(params, mesh)
    wqkv = sp["layers"][0]["wqkv"]
    assert wqkv.kind == kind
    st = wqkv.data[tfield]
    assert st.sharding.shard_shape(st.shape)[1] == st.shape[1] // 8
    # and the packed stream row-shards axis 0
    qs = wqkv.data["qs2" if kind != "q6_k" else "ql2"]
    assert qs.sharding.shard_shape(qs.shape)[0] == qs.shape[0] // 8


def test_moe_dense_ep_sharded_matches_gather():
    """Dense-EP MoE with experts sharded over tp must equal the single-device
    gather formulation."""
    import dataclasses
    from koboldcpp_tpu.ops.linear import dense as make_dense
    from koboldcpp_tpu.models import llama

    rng = np.random.default_rng(5)
    cfg = ModelConfig(arch="llama", vocab_size=256, hidden_size=64, n_layers=1,
                      n_heads=4, n_kv_heads=2, head_dim=16,
                      intermediate_size=96, rope_dim=16,
                      n_experts=4, n_experts_used=2)
    params = synthetic_params(cfg, kind="dense", seed=9)
    layer = params["layers"][0]
    for k in ("w_gate", "w_up", "w_down", "w_gateup"):
        layer.pop(k, None)
    layer["ffn_gate_inp"] = make_dense(
        rng.standard_normal((4, 64)).astype(np.float32) * 0.1, dtype=jnp.float32)
    layer["ffn_gate_exps"] = make_dense(
        rng.standard_normal((4, 96, 64)).astype(np.float32) * 0.1, dtype=jnp.float32)
    layer["ffn_up_exps"] = make_dense(
        rng.standard_normal((4, 96, 64)).astype(np.float32) * 0.1, dtype=jnp.float32)
    layer["ffn_down_exps"] = make_dense(
        rng.standard_normal((4, 64, 96)).astype(np.float32) * 0.1, dtype=jnp.float32)

    tokens = jnp.asarray(rng.integers(0, 256, (1, 4)), dtype=jnp.int32)
    pos = jnp.arange(4)[None].astype(jnp.int32)

    def run(p, c, dense_ep):
        cfg2 = dataclasses.replace(cfg, moe_dense_ep=dense_ep)
        cache = init_cache(1, 1, 8, cfg.n_kv_heads, cfg.head_dim, dtype=jnp.float32)
        out, _ = jax.jit(lambda p, t, q, cc: llama.forward(p, cfg2, t, q, cc))(
            p, tokens, pos, cache)
        return np.asarray(out)

    ref = run(params, cfg, dense_ep=False)
    dense_same = run(params, cfg, dense_ep=True)
    np.testing.assert_allclose(dense_same, ref, rtol=2e-3, atol=2e-3)

    mesh = make_mesh(8, dp=2, tp=4)
    sp = shard_params(params, mesh)
    with mesh:
        sharded = run(sp, cfg, dense_ep=True)
    np.testing.assert_allclose(sharded, ref, rtol=2e-3, atol=2e-3)
