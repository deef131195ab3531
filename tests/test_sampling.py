"""Sampler stack tests: per-sampler candidate-set semantics on hand-crafted
distributions + full-chain behaviors (greedy, bans, biases, DRY, XTC)."""
import math

import numpy as np

from koboldcpp_tpu.sampling import (
    Candidates, SamplerParams, make_state, sample_logits, build_dry_sequences,
)
from koboldcpp_tpu.sampling import samplers as S


def logits_from_probs(probs):
    p = np.asarray(probs, dtype=np.float64)
    return np.log(p / p.sum()).astype(np.float32)


def test_top_k():
    c = Candidates(np.array([1.0, 5.0, 3.0, 4.0, 2.0], np.float32))
    S.sample_top_k(c, 3)
    assert list(c.ids) == [1, 3, 2]


def test_top_p():
    c = Candidates(logits_from_probs([0.5, 0.3, 0.1, 0.05, 0.05]))
    S.sample_top_p(c, 0.75, 1)
    assert list(c.ids) == [0, 1]  # cumsum 0.5, 0.8 >= 0.75


def test_min_p():
    c = Candidates(logits_from_probs([0.6, 0.3, 0.05, 0.05]))
    S.sample_min_p(c, 0.2, 1)  # threshold = 0.6*0.2 = 0.12
    assert set(map(int, c.ids)) == {0, 1}


def test_top_a():
    c = Candidates(logits_from_probs([0.5, 0.3, 0.1, 0.1]))
    S.sample_top_a(c, 0.9, 1)  # threshold = 0.9*0.25 = 0.225
    assert list(c.ids) == [0, 1]


def test_typical_keeps_mass():
    c = Candidates(logits_from_probs([0.25, 0.25, 0.25, 0.25]))
    S.sample_typical(c, 0.5, 1)
    # uniform: all equally typical; keeps until cum > 0.5 => 3 tokens
    assert len(c) == 3


def test_temperature_greedy():
    c = Candidates(np.array([1.0, 3.0, 2.0], np.float32))
    S.sample_temperature(c, 0.0, 0.0)
    assert len(c) == 1 and int(c.ids[0]) == 1


def test_rep_pen_near_far():
    logits = np.array([2.0, 2.0, -2.0, 2.0], np.float32)
    c = Candidates(logits)
    # window of 4: first half far, second half near
    S.sample_rep_pen(c, [0, 1, 2, 3], 2048, 4, 2.0, 0.5, 0.0)
    # token0 far: reduced pen = 1 + (2-1)*0.5 = 1.5 → 2/1.5
    assert math.isclose(c.logits[0], 2.0 / 1.5, rel_tol=1e-6)
    # token2 near (index 2*2>=4), negative logit multiplies
    assert math.isclose(c.logits[2], -4.0, rel_tol=1e-6)
    # token3 near: 2/2
    assert math.isclose(c.logits[3], 1.0, rel_tol=1e-6)


def test_tfs_reduces():
    c = Candidates(logits_from_probs([0.5, 0.25, 0.12, 0.07, 0.04, 0.02]))
    n0 = len(c)
    S.sample_tail_free(c, 0.5, 1)
    assert 1 <= len(c) < n0


def test_xtc_removes_top():
    c = Candidates(logits_from_probs([0.5, 0.3, 0.15, 0.05]))
    rng = np.random.default_rng(0)
    S.sample_xtc(c, 0.1, 1.0, rng)  # always fires
    c.softmax()
    # tokens 0,1,2 were >= 0.1; top two get -999, best remaining is old #2
    assert int(c.ids[0]) == 2


def test_sample_logits_greedy_end_to_end():
    params = SamplerParams(temperature=0.0, top_k=0, top_p=1.0, rep_pen=1.0)
    state = make_state(seed=42)
    logits = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    tok = sample_logits(logits, [], 2048, params, state)
    assert tok == int(np.argmax(logits))


def test_sample_logits_banned_and_bias():
    logits = np.zeros(16, np.float32)
    logits[3] = 10.0
    params = SamplerParams(temperature=0.0, rep_pen=1.0,
                           banned_tokens=(3,), logit_biases={7: 50.0})
    tok = sample_logits(logits, [], 2048, params, make_state(1))
    assert tok == 7


def test_mirostat_v2_runs():
    params = SamplerParams(temperature=0.8, mirostat=2, mirostat_tau=5.0,
                           mirostat_eta=0.1, rep_pen=1.0)
    state = make_state(seed=3)
    logits = np.random.default_rng(1).standard_normal(500).astype(np.float32)
    toks = [sample_logits(logits, [], 2048, params, state) for _ in range(10)]
    assert all(0 <= t < 500 for t in toks)
    assert state.mirostat_mu is not None


def test_dry_penalizes_repeat_continuation():
    # context ends with "a b c ... a b" → continuing with c extends a repeat
    a, b, cc, x = 10, 11, 12, 13
    ctx = [a, b, cc, x, x, x, a, b]
    logits = np.zeros(32, np.float32)
    c = Candidates(logits.copy())
    S.sample_dry(c, ctx, 2048, 0, 1.0, 1.75, 1, {})
    assert c.logits[cc] < 0  # 'c' would extend the "a b" repeat
    assert c.logits[5] == 0  # unrelated token untouched


def test_dry_respects_restart_sequence():
    a, b, cc, nl = 10, 11, 12, 20
    ctx = [a, b, cc, nl, a, b]
    # without restart: the "a b" repeat (len 2 >= allowed 2) penalizes 'c'
    c1 = Candidates(np.zeros(32, np.float32))
    S.sample_dry(c1, ctx, 2048, 0, 1.0, 1.75, 2, {})
    assert c1.logits[cc] < 0
    # the newline restart caps rep_limit at 2 <= allowed 2 → no penalty
    c2 = Candidates(np.zeros(32, np.float32))
    S.sample_dry(c2, ctx, 2048, 0, 1.0, 1.75, 2, {nl: [[]]})
    assert c2.logits[cc] == 0


def test_seeded_determinism():
    logits = np.random.default_rng(5).standard_normal(200).astype(np.float32)
    params = SamplerParams(temperature=1.0, top_k=50, top_p=0.95, rep_pen=1.0)
    t1 = [sample_logits(logits, [], 2048, params, make_state(99)) for _ in range(5)]
    t2 = [sample_logits(logits, [], 2048, params, make_state(99)) for _ in range(5)]
    assert t1 == t2
