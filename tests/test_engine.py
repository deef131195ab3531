"""Engine tests on a tiny real model: greedy decode determinism, fast-forward
reuse, stop sequences, grammar-constrained output, abort, streaming."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.engine import Engine, GenParams
from koboldcpp_tpu.models.loader import load_model
from koboldcpp_tpu.sampling import SamplerParams


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_hf import convert_llama_state_dict
    from .test_model_forward import tiny_tokenizer_md

    torch.manual_seed(7)
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("e") / "tiny.gguf")
    convert_llama_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m = load_model(path, packed=False, dtype=jnp.float32)
    return Engine(m, max_context=256, cache_dtype=jnp.float32)


def greedy(max_length=8, **kw):
    return GenParams(max_length=max_length,
                     sampler=SamplerParams(temperature=0.0, rep_pen=1.0, top_k=1),
                     **kw)


def test_greedy_deterministic(engine):
    r1 = engine.generate([1, 5, 9], greedy())
    engine.reset_context()
    r2 = engine.generate([1, 5, 9], greedy())
    assert r1.tokens == r2.tokens
    assert len(r1.tokens) == 8
    assert r1.timings.gen_tokens == 8


def test_fast_forward_same_result(engine):
    engine.reset_context()
    r1 = engine.generate([1, 5, 9, 20, 30], greedy())
    # same prompt again: fast-forward reuses cache, result must be identical
    r2 = engine.generate([1, 5, 9, 20, 30], greedy())
    assert r1.tokens == r2.tokens


def test_continuation_fast_forward(engine):
    engine.reset_context()
    r1 = engine.generate([1, 5, 9], greedy(max_length=4))
    # continuation prompt includes previous output; only the new tail evals
    prompt2 = [1, 5, 9] + r1.tokens + [7]
    r2 = engine.generate(prompt2, greedy(max_length=4))
    assert r2.timings.prompt_tokens <= 2  # just the new tail
    engine.reset_context()
    r3 = engine.generate(prompt2, greedy(max_length=4))
    assert r2.tokens == r3.tokens  # reuse didn't change results


def test_streaming_callback(engine):
    engine.reset_context()
    seen = []
    engine.generate([1, 5], greedy(max_length=5),
                    on_token=lambda t, s: seen.append((t, s)))
    assert len(seen) == 5


def test_max_length_respected(engine):
    engine.reset_context()
    r = engine.generate([1, 5], greedy(max_length=3))
    assert len(r.tokens) == 3
    assert r.stop_reason == "length"


def test_stop_sequence(engine):
    engine.reset_context()
    r1 = engine.generate([1, 5], greedy(max_length=6))
    piece = engine.tokenizer.token_str(r1.tokens[2])
    engine.reset_context()
    r2 = engine.generate([1, 5], greedy(max_length=6, stop_sequences=[piece]))
    assert r2.stop_reason == "stop_sequence"
    assert piece not in r2.text


def test_grammar_constrained(engine):
    engine.reset_context()
    # token strings are tok<N>; force output to be a run of "tok5" pieces
    r = engine.generate([1], GenParams(
        max_length=6,
        sampler=SamplerParams(temperature=0.0, rep_pen=1.0, top_k=1),
        grammar='root ::= "tok5"+'))
    # output (whole pieces or byte-fallback) must stay inside the language
    produced = "".join(engine.tokenizer.token_str(t) for t in r.tokens
                       if not engine.tokenizer.vocab.is_eog(t))
    assert ("tok5" * 6).startswith(produced)
    assert len(produced) > 0


def test_bypass_eos_and_ban_eos(engine):
    engine.reset_context()
    r = engine.generate([1, 2], greedy(max_length=5, use_default_badwordsids=True))
    assert engine.tokenizer.vocab.eos_id not in r.tokens


def test_abort(engine):
    engine.reset_context()
    engine.abort()
    # abort flag is cleared at start; mid-run abort via callback
    def cb(t, s):
        engine.abort()
    r = engine.generate([1, 5], greedy(max_length=50), on_token=cb)
    assert r.stop_reason == "abort"
    assert len(r.tokens) <= 2


def test_kv_shift_mechanics():
    """_kv_shift_jit must move V exactly and re-rotate K so that a key written
    at position p lands as if written at position p-delta.

    (Context shift is inherently lossy end-to-end — the reference also keeps
    KV values computed with the removed tokens present — so the mechanical
    contract is what's testable.)"""
    from koboldcpp_tpu.engine.engine import _kv_shift_jit
    from koboldcpp_tpu.kv.cache import KVCache
    from koboldcpp_tpu.models.config import ModelConfig
    from koboldcpp_tpu.ops.rope import apply_rope, rope_frequencies

    cfg = ModelConfig(head_dim=8, rope_dim=8)
    freqs = rope_frequencies(cfg)
    rng = np.random.default_rng(0)
    S, H, D = 32, 2, 8
    base = jnp.asarray(rng.standard_normal((1, S, H, D)).astype(np.float32))
    pos = jnp.arange(S)[None, :]
    k_roped = apply_rope(base, pos, freqs, "norm", D)
    v = jnp.asarray(rng.standard_normal((1, 1, S, H, D)).astype(np.float32))
    k_np, v_np = np.asarray(k_roped), np.asarray(v)  # donation-safe copies
    cache = KVCache(k=k_roped[None], v=v)

    start, end = 10, 20
    delta = end - start
    out = _kv_shift_jit(cache, start, end, 22, freqs, "norm", D)

    # V: slots [start:S-delta] now hold old [end:S]
    np.testing.assert_array_equal(np.asarray(out.v[0, 0, start:S - delta]),
                                  v_np[0, 0, end:])
    np.testing.assert_array_equal(np.asarray(out.v[0, 0, :start]),
                                  v_np[0, 0, :start])
    # K: moved slots equal base roped at shifted positions
    want = apply_rope(base, pos - delta, freqs, "norm", D)
    np.testing.assert_allclose(np.asarray(out.k[0, 0, start:S - delta]),
                               np.asarray(want[0, end:]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.k[0, 0, :start]),
                               k_np[0, :start], rtol=1e-6, atol=1e-6)


def test_state_save_restore(engine, tmp_path):
    engine.reset_context()
    r1 = engine.generate([1, 5, 9, 20], greedy(max_length=4))
    path = str(tmp_path / "state.npz")
    engine.save_state(path)
    saved_ctx = list(engine.context_tokens)

    # clobber the live state
    engine.reset_context()
    engine.generate([1, 7, 7, 7], greedy(max_length=2))

    engine.load_state(path)
    assert engine.context_tokens == saved_ctx
    # continuation after restore must match continuation without interruption
    prompt2 = [1, 5, 9, 20] + r1.tokens
    r2 = engine.generate(prompt2, greedy(max_length=3))
    assert r2.timings.prompt_tokens <= 1  # restored cache fast-forwards


def test_gradientai_rope_formula():
    from koboldcpp_tpu.ops.rope import gradientai_rope_base

    # extending 4k-trained to 16k raises the base; within train ctx: unchanged
    b = gradientai_rope_base(10000.0, 128, 16384, 4096)
    assert b > 10000.0
    assert gradientai_rope_base(10000.0, 128, 2048, 4096) == 10000.0
    # monotone in target context
    assert gradientai_rope_base(10000.0, 128, 32768, 4096) > b


def test_quantized_kv_cache(tmp_path_factory):
    """--quantkv 1: generation runs and stays close to the bf16-cache path."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_hf import convert_llama_state_dict
    from .test_model_forward import tiny_tokenizer_md

    torch.manual_seed(30)
    cfg = LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=256,
                      tie_word_embeddings=False)
    hf = LlamaForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path_factory.mktemp("qkv") / "m.gguf")
    convert_llama_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m = load_model(path, packed=False, dtype=jnp.float32)

    e_bf = Engine(m, max_context=64, cache_dtype=jnp.float32)
    e_q8 = Engine(m, max_context=64, quantkv=True)
    from koboldcpp_tpu.kv.cache import QuantKVCache
    assert isinstance(e_q8.cache, QuantKVCache)

    r_bf = e_bf.generate([1, 5, 9, 20], greedy(max_length=8))
    r_q8 = e_q8.generate([1, 5, 9, 20], greedy(max_length=8))
    # int8 KV noise can flip late tokens on a random tiny model, but the
    # first steps must agree
    assert r_q8.tokens[:3] == r_bf.tokens[:3]
    assert len(r_q8.tokens) == 8


def test_smart_context(engine):
    """Legacy smart-context: halve-and-buffer on divergent full context, then
    reuse of the buffered tail (model_adapter.cpp:424-558 semantics)."""
    e = Engine(engine.model, max_context=128, cache_dtype=jnp.float32,
               use_smartcontext=True)
    base = [1, 5] + [(7 * i) % 500 + 2 for i in range(110)]
    e.generate(base, greedy(max_length=4))
    assert not e.smartcontext
    # long prompt diverging early (history scrolled): triggers the halving
    b = [1, 5] + [(11 * i) % 500 + 2 for i in range(110)]
    r2 = e.generate(b, greedy(max_length=4))
    assert e.smartcontext
    assert e.last_timings.prompt_tokens < len(b) * 0.6  # only ~half evaluated
    # continuation containing the buffered tail: trims to it, evals only new
    c = b + r2.tokens + [(13 * i) % 500 + 2 for i in range(6)]
    e.generate(c, greedy(max_length=4))
    assert e.smartcontext
    assert e.last_timings.prompt_tokens <= 8


def test_antislop_phrase_ban(engine):
    """Anti-slop: rewind-and-ban is per-position, cache bookkeeping stays
    consistent, and streaming is held back past rewind reach."""
    engine.reset_context()
    r1 = engine.generate([1, 5, 9], greedy(max_length=8))
    assert len(r1.tokens) == 8
    tk = engine.tokenizer
    phrase = "".join(tk.token_str(t) for t in r1.tokens[2:4])
    engine.reset_context()
    pieces = []
    r2 = engine.generate([1, 5, 9],
                         greedy(max_length=8, banned_phrases=[phrase]),
                         on_token=lambda t, s: pieces.append(s))
    assert phrase.lower() not in r2.text.lower()
    assert r2.tokens != r1.tokens
    if r2.stop_reason == "length":
        # context/cache and output agree after the rewind
        assert engine.context_tokens == [1, 5, 9] + r2.tokens
        # held-back streaming flushes to exactly the final text
        assert "".join(pieces) == r2.text
    # deterministic under rewind
    engine.reset_context()
    r3 = engine.generate([1, 5, 9], greedy(max_length=8, banned_phrases=[phrase]))
    assert r3.tokens == r2.tokens


def test_fast_greedy_matches_host_loop(engine):
    """Device-side K-token greedy chunks produce bit-identical output to the
    per-token host loop (incl. eos handling and context bookkeeping)."""
    import os

    from koboldcpp_tpu.engine.engine import Engine, GenParams
    from koboldcpp_tpu.sampling.samplers import SamplerParams

    sp = SamplerParams(temperature=0.0, rep_pen=1.0, dry_multiplier=0.0)
    params = GenParams(max_length=13, sampler=sp, use_default_badwordsids=True)
    engine_model = engine.model

    eng1 = Engine(engine_model, max_context=128, cache_dtype=jnp.float32)
    r_fast = eng1.generate([1, 5, 9, 42], params)
    ctx_fast = list(eng1.context_tokens)

    os.environ["KCPP_FAST_DECODE"] = "0"
    try:
        eng2 = Engine(engine_model, max_context=128, cache_dtype=jnp.float32)
        r_host = eng2.generate([1, 5, 9, 42], params)
        ctx_host = list(eng2.context_tokens)
    finally:
        os.environ.pop("KCPP_FAST_DECODE", None)

    assert r_fast.tokens == r_host.tokens
    assert r_fast.text == r_host.text
    assert ctx_fast == ctx_host
    # follow-up request fast-forwards identically after a chunked generation
    r2 = eng1.generate(ctx_fast + [7], params)
    r3 = eng2.generate(ctx_host + [7], params)
    assert r2.tokens == r3.tokens
