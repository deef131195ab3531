"""Device-side stochastic sampler: distribution parity with the host chain
(sampling/samplers.py, itself mirroring SampleLogits gpttype_adapter.cpp:1338)
plus engine-level fast-path behavior."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.engine.device_sampler import (candidate_distribution,
                                                 make_dyn, supported_order)
from koboldcpp_tpu.sampling.samplers import (Candidates, SamplerParams,
                                             sample_min_p, sample_rep_pen,
                                             sample_temperature, sample_top_k,
                                             sample_top_p,
                                             KCPP_SAMPLER_REP_PEN,
                                             KCPP_SAMPLER_TEMP,
                                             KCPP_SAMPLER_TOP_K,
                                             KCPP_SAMPLER_TOP_P)

V = 300
MAX_CTX = 64


def host_probs(logits, ctx, sp):
    """The host chain up to (but not including) the multinomial draw,
    scattered back to a full-vocab probability vector."""
    c = Candidates(np.asarray(logits, np.float32))
    for tid, b in sp.logit_biases.items():
        c.logits[tid] += b
    for tid in sp.banned_tokens:
        c.logits[tid] = -np.inf
    sample_top_k(c, 5000)
    for s in sp.sampler_order:
        if s == KCPP_SAMPLER_TOP_K:
            sample_top_k(c, sp.top_k)
        elif s == KCPP_SAMPLER_TOP_P:
            sample_top_p(c, sp.top_p, 1)
            sample_min_p(c, sp.min_p, 1)
        elif s == KCPP_SAMPLER_TEMP:
            sample_temperature(c, sp.temperature, 0.0)
        elif s == KCPP_SAMPLER_REP_PEN:
            sample_rep_pen(c, ctx, MAX_CTX, sp.rep_pen_range, sp.rep_pen,
                           sp.rep_pen_slope, sp.presence_penalty)
    c.softmax()
    out = np.zeros(V, np.float64)
    out[c.ids] = c.probs
    return out


def device_probs(logits, ctx, sp):
    rec = np.zeros(MAX_CTX, np.int32)
    tail = ctx[-MAX_CTX:]
    if tail:
        rec[-len(tail):] = tail
    bias = np.zeros(V, np.float32)
    for tid, b in sp.logit_biases.items():
        bias[tid] += np.float32(b)
    for t in sp.banned_tokens:
        bias[t] = np.float32(-1e30)
    p = candidate_distribution(
        jnp.asarray(np.asarray(logits, np.float32)), jnp.asarray(bias),
        jnp.asarray(rec), jnp.int32(min(len(ctx), MAX_CTX)),
        make_dyn(sp, MAX_CTX), sp.sampler_order)
    return np.asarray(p, np.float64)


def check(sp, seed=0, ctx_len=40):
    rng = np.random.default_rng(seed)
    logits = rng.normal(0.0, 3.0, V).astype(np.float32)
    ctx = rng.integers(0, V, ctx_len).tolist()
    h = host_probs(logits, ctx, sp)
    d = device_probs(logits, ctx, sp)
    np.testing.assert_allclose(d, h, atol=2e-4)


def test_default_preset():
    check(SamplerParams())  # temp .7, top_k 100, top_p .92, rep_pen 1.1


def test_min_p_only():
    check(SamplerParams(temperature=1.3, top_k=0, top_p=1.0, min_p=0.08,
                        rep_pen=1.0))


def test_temp_before_top_p():
    check(SamplerParams(temperature=0.45, top_k=0, top_p=0.8, rep_pen=1.15,
                        sampler_order=(6, 5, 0, 2)))


def test_presence_penalty_only():
    check(SamplerParams(temperature=1.0, top_k=50, top_p=1.0, rep_pen=1.0,
                        presence_penalty=0.7, rep_pen_range=24))


def test_rep_pen_slope_and_short_range():
    check(SamplerParams(temperature=0.9, rep_pen=1.4, rep_pen_slope=0.5,
                        rep_pen_range=16), ctx_len=60)


def test_rep_pen_boost_below_one():
    check(SamplerParams(temperature=1.0, rep_pen=0.8, top_k=0, top_p=1.0))


def test_biases_and_bans():
    check(SamplerParams(temperature=0.8, logit_biases={3: 5.0, 7: -4.0},
                        banned_tokens=(1, 2, 11)))


def test_empty_context():
    check(SamplerParams(), ctx_len=0)


def test_supported_order():
    default = (6, 0, 1, 3, 4, 2, 5)
    assert supported_order(default, True)
    assert supported_order((0, 6, 2, 5), False)   # rep inactive: any order
    assert not supported_order((0, 6, 2, 5), True)  # top-k before rep-pen


# ---------------------------------------------------------------------------
# engine-level fast path
# ---------------------------------------------------------------------------

from .test_engine import engine  # noqa: E402,F401  (module-scoped fixture)
from koboldcpp_tpu.engine import GenParams  # noqa: E402


def test_gate(engine):  # noqa: F811
    ok = GenParams(sampler=SamplerParams(seed=1))
    assert engine._fast_stoch_ok(ok, None)
    assert not engine._fast_stoch_ok(
        GenParams(sampler=SamplerParams(mirostat=2)), None)
    assert not engine._fast_stoch_ok(
        GenParams(sampler=SamplerParams(xtc_probability=0.5)), None)
    assert not engine._fast_stoch_ok(
        GenParams(sampler=SamplerParams(temperature=0.0)), None)
    assert not engine._fast_stoch_ok(
        GenParams(sampler=SamplerParams(dry_multiplier=0.8)), None)
    assert not engine._fast_stoch_ok(
        GenParams(sampler=SamplerParams(
            sampler_order=(0, 6, 2, 5))), None)  # rep-pen not leading


def test_seed_deterministic(engine):  # noqa: F811
    p = GenParams(max_length=10, sampler=SamplerParams(seed=42))
    r1 = engine.generate([1, 5, 9], p)
    r2 = engine.generate([1, 5, 9], p)
    assert r1.tokens == r2.tokens
    r3 = engine.generate([1, 5, 9],
                         GenParams(max_length=10,
                                   sampler=SamplerParams(seed=43)))
    assert r3.tokens  # different seed still generates


def test_bans_respected(engine):  # noqa: F811
    banned = tuple(range(0, 500))  # leave only tokens 500..511 available
    p = GenParams(max_length=12, sampler=SamplerParams(
        seed=7, banned_tokens=banned, top_k=0, top_p=1.0, rep_pen=1.0),
        bypass_eos=True)
    r = engine.generate([1, 5, 9], p)
    assert r.tokens and all(t >= 500 for t in r.tokens)


def test_near_greedy_matches_host_loop(engine):  # noqa: F811
    """At temperature ~0+ the stochastic fast path must reproduce the host
    loop token-for-token (exercises rep-pen bookkeeping across chunks)."""
    import os

    from koboldcpp_tpu.engine.engine import Engine

    sp = SamplerParams(temperature=1e-5, rep_pen=1.3, rep_pen_range=32,
                       top_k=50, top_p=0.9, seed=3)
    params = GenParams(max_length=14, sampler=sp, use_default_badwordsids=True)

    eng1 = Engine(engine.model, max_context=128, cache_dtype=jnp.float32)
    assert eng1._fast_stoch_ok(params, None)
    r_fast = eng1.generate([1, 5, 9, 42], params)

    os.environ["KCPP_FAST_DECODE"] = "0"
    try:
        eng2 = Engine(engine.model, max_context=128, cache_dtype=jnp.float32)
        r_host = eng2.generate([1, 5, 9, 42], params)
    finally:
        os.environ.pop("KCPP_FAST_DECODE", None)

    assert r_fast.tokens == r_host.tokens
    assert r_fast.text == r_host.text
