"""T5 encoder-decoder parity vs transformers + incremental decode semantics."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.models import t5 as jt5
from koboldcpp_tpu.models.loader import load_model

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_hf import convert_t5_state_dict  # noqa: E402
from .test_model_forward import tiny_tokenizer_md  # noqa: E402

ENC = np.array([[4, 9, 100, 7, 3, 51]], dtype=np.int32)
DEC = np.array([[0, 12, 40, 8, 77]], dtype=np.int32)


@pytest.fixture(scope="module", params=["relu", "gated-gelu"])
def t5_pair(request, tmp_path_factory):
    import torch
    from transformers import T5Config, T5ForConditionalGeneration

    torch.manual_seed(13)
    cfg = T5Config(vocab_size=256, d_model=48, d_kv=12, d_ff=96,
                   num_layers=2, num_heads=4,
                   relative_attention_num_buckets=8,
                   relative_attention_max_distance=128,
                   feed_forward_proj=request.param,
                   tie_word_embeddings=False,
                   decoder_start_token_id=0, pad_token_id=0,
                   eos_token_id=1)
    model = T5ForConditionalGeneration(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("t5") / f"t5-{request.param}.gguf")
    convert_t5_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(256))
    return model, path


def run_ours(path, enc_tokens, dec_tokens):
    m = load_model(path, packed=False, dtype=jnp.float32)
    S = enc_tokens.shape[1]
    enc_pos = jnp.broadcast_to(jnp.arange(S), enc_tokens.shape).astype(jnp.int32)
    enc_out = jt5.encode(m.params, m.cfg, jnp.asarray(enc_tokens), enc_pos)
    cache = jt5.init_cache(m.cfg, 1, 16, S)
    cache = jt5.prepare_cross(m.params, m.cfg, enc_out,
                              enc_pos >= 0, cache)
    dec_pos = jnp.broadcast_to(jnp.arange(dec_tokens.shape[1]),
                               dec_tokens.shape).astype(jnp.int32)
    logits, cache = jt5.forward(m.params, m.cfg, jnp.asarray(dec_tokens),
                                dec_pos, cache)
    return m, np.asarray(logits), cache, enc_out


def test_t5_hf_parity(t5_pair):
    import torch

    model, path = t5_pair
    m, ours, _, _ = run_ours(path, ENC, DEC)
    assert m.cfg.is_encoder_decoder
    assert m.cfg.extras["rel_buckets"] == 8
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ENC, dtype=torch.long),
                    decoder_input_ids=torch.tensor(DEC, dtype=torch.long)
                    ).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)


def test_t5_incremental_decode(t5_pair):
    """Token-by-token decode with the self-attn cache == one-shot decode."""
    _, path = t5_pair
    m, full, _, enc_out = run_ours(path, ENC, DEC)

    S = ENC.shape[1]
    enc_pos = jnp.broadcast_to(jnp.arange(S), ENC.shape).astype(jnp.int32)
    cache = jt5.init_cache(m.cfg, 1, 16, S)
    cache = jt5.prepare_cross(m.params, m.cfg, enc_out, enc_pos >= 0, cache)
    outs = []
    for t in range(DEC.shape[1]):
        logits, cache = jt5.forward(
            m.params, m.cfg, jnp.asarray(DEC[:, t:t + 1]),
            jnp.full((1, 1), t, jnp.int32), cache)
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), full,
                               rtol=2e-4, atol=2e-4)


def test_t5_engine_generate(t5_pair):
    """Engine drives encoder once then decodes from decoder_start."""
    from koboldcpp_tpu.engine.engine import Engine, GenParams
    from koboldcpp_tpu.sampling.samplers import SamplerParams

    _, path = t5_pair
    m = load_model(path, packed=False, dtype=jnp.float32)
    eng = Engine(m, max_context=64)
    assert eng.encdec
    params = GenParams(max_length=6, sampler=SamplerParams(temperature=0.0),
                       use_default_badwordsids=True)
    r1 = eng.generate([4, 9, 100, 7], params)
    assert len(r1.tokens) == 6
    r2 = eng.generate([4, 9, 100, 7], params)
    assert r1.tokens == r2.tokens  # deterministic, fresh state per request
