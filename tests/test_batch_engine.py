"""Continuous-batching engine: concurrent requests, parity with the simple
engine, per-slot fast-forward, abort."""
import threading

import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.engine import Engine, GenParams
from koboldcpp_tpu.engine.batch_engine import BatchedEngine
from koboldcpp_tpu.models.loader import load_model
from koboldcpp_tpu.sampling import SamplerParams


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_hf import convert_llama_state_dict
    from .test_model_forward import tiny_tokenizer_md

    torch.manual_seed(13)
    cfg = LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512,
                      tie_word_embeddings=False)
    hf = LlamaForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path_factory.mktemp("be") / "tiny.gguf")
    convert_llama_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    return load_model(path, packed=False, dtype=jnp.float32)


@pytest.fixture(scope="module")
def batched(model):
    eng = BatchedEngine(model, max_context=128, n_slots=3,
                        cache_dtype=jnp.float32)
    yield eng
    eng.shutdown()


def greedy(n=6, **kw):
    return GenParams(max_length=n,
                     sampler=SamplerParams(temperature=0.0, rep_pen=1.0, top_k=1),
                     **kw)


def test_single_request(batched):
    r = batched.generate([1, 5, 9], greedy())
    assert len(r.tokens) == 6
    assert r.stop_reason == "length"


def test_matches_simple_engine(batched, model):
    simple = Engine(model, max_context=128, cache_dtype=jnp.float32)
    prompts = [[1, 5, 9], [1, 42, 7, 100], [1, 300]]
    want = []
    for p in prompts:
        simple.reset_context()
        want.append(simple.generate(p, greedy()).tokens)
    batched.reset_context()
    got = [batched.generate(p, greedy()).tokens for p in prompts]
    assert got == want


def test_concurrent_requests_batch_together(batched):
    prompts = [[1, 5, 9], [1, 42, 7], [1, 300, 11]]
    results = [None] * 3

    def run(i):
        results[i] = batched.generate(prompts[i], greedy(8))

    threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(r is not None and len(r.tokens) == 8 for r in results)
    # concurrent result must equal serial result (batching must not mix rows)
    serial = [batched.generate(p, greedy(8)).tokens for p in prompts]
    assert [r.tokens for r in results] == serial


def test_queue_overflow_handled(batched):
    """More requests than slots: all eventually complete."""
    results = []
    lock = threading.Lock()

    def run(p):
        r = batched.generate(p, greedy(4))
        with lock:
            results.append(r)

    threads = [threading.Thread(target=run, args=([1, i + 2],)) for i in range(7)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert len(results) == 7
    assert all(r.stop_reason in ("length", "eos") and 1 <= len(r.tokens) <= 4
               for r in results)


def test_slot_fast_forward(batched):
    p = [1, 5, 9, 42]
    r1 = batched.generate(p, greedy(4))
    r2 = batched.generate(p + r1.tokens[:-1] + [7], greedy(4))
    # only the tail should have been prefillled on the reused slot
    assert r2.timings.prompt_tokens <= 3


def test_abort_by_genkey(batched):
    hold = threading.Event()

    def cb(t, s):
        hold.set()
        batched.abort("KEY1")

    req = batched.submit([1, 5], greedy(50), on_token=cb, genkey="KEY1")
    assert req.done.wait(timeout=120)
    assert req.result.stop_reason == "abort"


@pytest.fixture(scope="module")
def paged_engine(model):
    eng = BatchedEngine(model, max_context=128, n_slots=3,
                        cache_dtype=jnp.float32, paged=True, page_size=16)
    yield eng
    eng.shutdown()


def test_paged_matches_contiguous(batched, paged_engine):
    prompts = [[1, 5, 9], [1, 42, 7, 100], [1, 300]]
    batched.reset_context()
    want = [batched.generate(p, greedy()).tokens for p in prompts]
    got = [paged_engine.generate(p, greedy()).tokens for p in prompts]
    assert got == want


def test_paged_page_accounting(paged_engine):
    a = paged_engine.allocator
    free_before = a.n_free
    r = paged_engine.generate([1, 5, 9] + [7] * 30, greedy(4))
    assert len(r.tokens) == 4
    # pages stay allocated for fast-forward reuse; under the pool limit
    assert a.n_free < free_before or free_before == a.n_free


def test_paged_concurrent(paged_engine):
    import threading

    prompts = [[1, 5, 9], [1, 42, 7], [1, 300, 11]]
    results = [None] * 3

    def run(i):
        results[i] = paged_engine.generate(prompts[i], greedy(6))

    ts = [threading.Thread(target=run, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=180)
    assert all(r is not None and len(r.tokens) == 6 for r in results)
    serial = [paged_engine.generate(p, greedy(6)).tokens for p in prompts]
    assert [r.tokens for r in results] == serial
