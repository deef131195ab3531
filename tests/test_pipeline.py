"""Pipeline parallelism: stage-sharded stacked layers + microbatch schedule
must match the single-device forward_stacked bit-for-bit (same math, fp32)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from koboldcpp_tpu.kv.cache import init_cache
from koboldcpp_tpu.models import llama as jllama
from koboldcpp_tpu.models.loader import load_model
from koboldcpp_tpu.parallel.pipeline import (pipeline_forward,
                                             shard_stacked_for_pp)


@pytest.fixture(scope="module")
def stacked_model(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_hf import convert_llama_state_dict
    from .test_model_forward import tiny_tokenizer_md

    torch.manual_seed(21)
    cfg = LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=8, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64,
                      tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("pp") / "tiny8.gguf")
    convert_llama_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m = load_model(path, packed=False, dtype=jnp.float32)
    m.params = jllama.stack_layers(m.params)
    assert "layers_stacked" in m.params
    return m


@pytest.mark.parametrize("pp,mb", [(4, 4), (4, 8), (2, 2)])
def test_pipeline_matches_stacked(stacked_model, pp, mb):
    m = stacked_model
    devs = jax.devices()[:pp]
    mesh = Mesh(np.array(devs), ("pp",))
    B, T, S = mb, 6, 32
    rng = np.random.default_rng(4)
    tokens = jnp.asarray(rng.integers(3, 500, (B, T)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T), (B, T)).astype(jnp.int32)

    cache_ref = init_cache(m.cfg.n_layers, B, S, m.cfg.n_kv_heads,
                           m.cfg.head_dim, dtype=jnp.float32)
    ref_logits, ref_cache = jllama.forward_stacked(
        m.params, m.cfg, tokens, positions, cache_ref)

    # microbatch b-axis split: mb index m owns batch rows [m*Bm, (m+1)*Bm);
    # the cache covers the FULL batch and every microbatch's slice must come
    # back populated (PP decode threads it across calls)
    cache_pp = init_cache(m.cfg.n_layers, B, S, m.cfg.n_kv_heads,
                          m.cfg.head_dim, dtype=jnp.float32)
    params_pp, cache_shard = shard_stacked_for_pp(m.params, cache_pp, mesh)
    logits, cache_out = pipeline_forward(params_pp, m.cfg, tokens, positions,
                                         cache_shard, mesh, microbatches=mb)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    from koboldcpp_tpu.kv.cache import stack_cache
    ref_stacked = stack_cache(ref_cache)
    np.testing.assert_allclose(np.asarray(cache_out.k),
                               np.asarray(ref_stacked.k), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cache_out.v),
                               np.asarray(ref_stacked.v), rtol=2e-4, atol=2e-4)


def test_pipeline_decode_steps(stacked_model):
    """PP decode: prefill then two T=1 steps through the pipeline, cache
    threaded across calls, logits exact vs the single-device stacked path."""
    m = stacked_model
    pp, mb = 4, 4
    mesh = Mesh(np.array(jax.devices()[:pp]), ("pp",))
    B, T, S = mb, 5, 32
    rng = np.random.default_rng(11)
    tokens = jnp.asarray(rng.integers(3, 500, (B, T)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T), (B, T)).astype(jnp.int32)

    cache_ref = init_cache(m.cfg.n_layers, B, S, m.cfg.n_kv_heads,
                           m.cfg.head_dim, dtype=jnp.float32)
    ref_logits, cache_ref = jllama.forward_stacked(
        m.params, m.cfg, tokens, positions, cache_ref)

    cache_pp = init_cache(m.cfg.n_layers, B, S, m.cfg.n_kv_heads,
                          m.cfg.head_dim, dtype=jnp.float32)
    params_pp, cache_pp = shard_stacked_for_pp(m.params, cache_pp, mesh)
    pp_logits, cache_pp = pipeline_forward(params_pp, m.cfg, tokens,
                                           positions, cache_pp, mesh,
                                           microbatches=mb)
    for step in range(2):
        nxt = jnp.argmax(ref_logits[:, -1:, :], axis=-1).astype(jnp.int32)
        pos = jnp.full((B, 1), T + step, jnp.int32)
        ref_logits, cache_ref = jllama.forward_stacked(
            m.params, m.cfg, nxt, pos, cache_ref)
        pp_nxt = jnp.argmax(pp_logits[:, -1:, :], axis=-1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(pp_nxt), np.asarray(nxt))
        pp_logits, cache_pp = pipeline_forward(params_pp, m.cfg, pp_nxt, pos,
                                               cache_pp, mesh, microbatches=mb)
        np.testing.assert_allclose(np.asarray(pp_logits),
                                   np.asarray(ref_logits),
                                   rtol=2e-4, atol=2e-4)
