"""Mamba (recurrent SSM) parity vs transformers + state-carry semantics."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.models import mamba as jmamba
from koboldcpp_tpu.models.loader import load_model

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_hf import convert_mamba_state_dict  # noqa: E402
from .test_model_forward import tiny_tokenizer_md  # noqa: E402

TOKENS = np.array([[1, 5, 9, 42, 7, 300, 12, 4]], dtype=np.int32)


@pytest.fixture(scope="module")
def mamba_pair(tmp_path_factory):
    import torch
    from transformers import MambaConfig, MambaForCausalLM

    torch.manual_seed(11)
    cfg = MambaConfig(vocab_size=512, hidden_size=64, state_size=8,
                      num_hidden_layers=2, conv_kernel=4,
                      intermediate_size=128, time_step_rank=4,
                      use_cache=False)
    model = MambaForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("mamba") / "mamba.gguf")
    convert_mamba_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    return model, path


def test_mamba_hf_parity(mamba_pair):
    import torch

    model, path = mamba_pair
    m = load_model(path, packed=False, dtype=jnp.float32)
    assert m.cfg.is_recurrent and m.cfg.ssm_d_inner == 128
    assert m.cfg.ssm_dt_rank == 4 and m.cfg.ssm_d_state == 8
    state = jmamba.init_state(m.cfg, 1)
    pos = jnp.broadcast_to(jnp.arange(TOKENS.shape[1]), TOKENS.shape).astype(jnp.int32)
    logits, _ = jmamba.forward(m.params, m.cfg, jnp.asarray(TOKENS), pos, state)
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=4e-3, atol=4e-3)


def test_mamba_state_carry(mamba_pair):
    """Chunked eval with carried state == one-shot eval (the engine decode
    pattern: prefill then one token at a time)."""
    _, path = mamba_pair
    m = load_model(path, packed=False, dtype=jnp.float32)
    toks = jnp.asarray(TOKENS)
    pos = jnp.broadcast_to(jnp.arange(TOKENS.shape[1]), TOKENS.shape).astype(jnp.int32)
    full, _ = jmamba.forward(m.params, m.cfg, toks, pos, jmamba.init_state(m.cfg, 1))

    state = jmamba.init_state(m.cfg, 1)
    outs = []
    split = 5
    logits, state = jmamba.forward(m.params, m.cfg, toks[:, :split],
                                   pos[:, :split], state)
    outs.append(np.asarray(logits))
    for t in range(split, TOKENS.shape[1]):
        logits, state = jmamba.forward(m.params, m.cfg, toks[:, t:t + 1],
                                       pos[:, t:t + 1], state)
        outs.append(np.asarray(logits))
    chunked = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(chunked, np.asarray(full), rtol=2e-4, atol=2e-4)


def test_mamba_padding_invariance(mamba_pair):
    """Right-padded rows (position < 0) neither change outputs of valid rows
    nor advance the state."""
    _, path = mamba_pair
    m = load_model(path, packed=False, dtype=jnp.float32)
    toks = jnp.asarray(TOKENS)
    T = TOKENS.shape[1]
    pos = jnp.broadcast_to(jnp.arange(T), TOKENS.shape).astype(jnp.int32)
    clean, clean_state = jmamba.forward(m.params, m.cfg, toks, pos,
                                        jmamba.init_state(m.cfg, 1))

    pad = 3
    toks_p = jnp.concatenate([toks, jnp.zeros((1, pad), jnp.int32)], axis=1)
    pos_p = jnp.concatenate([pos, -jnp.ones((1, pad), jnp.int32)], axis=1)
    padded, pad_state = jmamba.forward(m.params, m.cfg, toks_p, pos_p,
                                       jmamba.init_state(m.cfg, 1))
    np.testing.assert_allclose(np.asarray(padded[:, :T]), np.asarray(clean),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pad_state.ssm),
                               np.asarray(clean_state.ssm), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pad_state.conv),
                               np.asarray(clean_state.conv), rtol=1e-5, atol=1e-5)


def test_mamba_engine_generate(mamba_pair):
    """End-to-end engine decode over a recurrent model: greedy generation,
    full-prefix fast-forward reuse, and state save/restore."""
    from koboldcpp_tpu.engine.engine import Engine, GenParams
    from koboldcpp_tpu.sampling.samplers import SamplerParams

    _, path = mamba_pair
    m = load_model(path, packed=False, dtype=jnp.float32)
    eng = Engine(m, max_context=128)
    assert eng.recurrent and not eng.use_contextshift
    params = GenParams(max_length=8,
                       sampler=SamplerParams(temperature=0.0),
                       use_default_badwordsids=True)
    r1 = eng.generate([1, 5, 9, 42], params)
    assert len(r1.tokens) == 8
    ctx_after = list(eng.context_tokens)

    # extending the context fast-forwards (state reuse, no full re-eval)
    r2 = eng.generate(ctx_after + [7], params)
    assert eng.last_timings.prompt_tokens == 1

    # diverging prompt resets the state and still matches a fresh engine
    r3 = eng.generate([2, 8, 3, 99], params)
    eng2 = Engine(m, max_context=128)
    r4 = eng2.generate([2, 8, 3, 99], params)
    assert r3.tokens == r4.tokens
