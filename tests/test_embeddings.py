"""Embedding models: BERT parity vs HF BertModel, t5encoder vs T5EncoderModel,
Engine.embed pooling, and the /v1/embeddings server endpoint."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.models.loader import load_model

pytest_plugins = ("aiohttp.pytest_plugin",)

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_hf import (convert_bert_state_dict,  # noqa: E402
                        convert_t5encoder_state_dict)
from .test_model_forward import tiny_tokenizer_md  # noqa: E402

TOKENS = np.array([[2, 5, 9, 42, 7, 301]], dtype=np.int32)


@pytest.fixture(scope="module")
def bert_pair(tmp_path_factory):
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(41)
    cfg = BertConfig(vocab_size=512, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=128,
                     max_position_embeddings=128, layer_norm_eps=1e-12)
    model = BertModel(cfg, add_pooling_layer=False).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("bert") / "bert.gguf")
    convert_bert_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    return model, path


def test_bert_hidden_parity(bert_pair):
    import torch
    from koboldcpp_tpu.models import bert as jbert

    model, path = bert_pair
    m = load_model(path, packed=False, dtype=jnp.float32)
    assert m.cfg.is_embedding
    pos = jnp.broadcast_to(jnp.arange(TOKENS.shape[1]), TOKENS.shape).astype(jnp.int32)
    hidden = jbert.forward_embed(m.params, m.cfg, jnp.asarray(TOKENS), pos)
    with torch.no_grad():
        ref = model(torch.tensor(TOKENS, dtype=torch.long)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(hidden), ref, rtol=4e-3, atol=4e-3)


def test_bert_engine_embed(bert_pair):
    from koboldcpp_tpu.engine.engine import Engine, GenParams

    _, path = bert_pair
    m = load_model(path, packed=False, dtype=jnp.float32)
    eng = Engine(m, max_context=64)
    assert eng.embedding
    vecs = eng.embed(["hello world", "different text entirely"])
    assert vecs.shape == (2, 64)
    # deterministic + input-sensitive
    vecs2 = eng.embed(["hello world"])
    np.testing.assert_allclose(vecs[0], vecs2[0], rtol=1e-5, atol=1e-5)
    assert not np.allclose(vecs[0], vecs[1])
    with pytest.raises(ValueError):
        eng.generate([1, 2, 3], GenParams())


def test_t5encoder_parity(tmp_path):
    import torch
    from transformers import T5Config, T5EncoderModel
    from koboldcpp_tpu.models import t5 as jt5

    torch.manual_seed(42)
    cfg = T5Config(vocab_size=256, d_model=48, d_kv=12, d_ff=96,
                   num_layers=2, num_heads=4,
                   relative_attention_num_buckets=8,
                   feed_forward_proj="relu", tie_word_embeddings=False,
                   decoder_start_token_id=0, pad_token_id=0)
    model = T5EncoderModel(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "t5enc.gguf")
    convert_t5encoder_state_dict(state, cfg, path,
                                 tokenizer_md=tiny_tokenizer_md(256))
    m = load_model(path, packed=False, dtype=jnp.float32)
    assert m.cfg.is_embedding and not m.params["dec_layers"]
    toks = np.array([[4, 9, 100, 7]], np.int32)
    pos = jnp.broadcast_to(jnp.arange(4), (1, 4)).astype(jnp.int32)
    out = jt5.encode(m.params, m.cfg, jnp.asarray(toks), pos)
    with torch.no_grad():
        ref = model(torch.tensor(toks, dtype=torch.long)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=4e-3, atol=4e-3)


async def test_embeddings_endpoint(bert_pair, aiohttp_client):
    from koboldcpp_tpu.engine.engine import Engine
    from koboldcpp_tpu.server.app import ServerSettings, make_app

    _, path = bert_pair
    m = load_model(path, packed=False, dtype=jnp.float32)
    eng = Engine(m, max_context=64)
    app = make_app(eng, ServerSettings())
    client = await aiohttp_client(app)

    r = await client.post("/v1/embeddings", json={"input": ["abc", "xyz"]})
    assert r.status == 200
    d = await r.json()
    assert d["object"] == "list" and len(d["data"]) == 2
    assert len(d["data"][0]["embedding"]) == 64
    assert d["data"][1]["index"] == 1

    r2 = await client.post("/api/extra/embeddings", json={"input": "abc"})
    d2 = await r2.json()
    np.testing.assert_allclose(d2["data"][0]["embedding"],
                               d["data"][0]["embedding"], rtol=1e-5)

    # generation endpoints reject embedding models cleanly
    r3 = await client.post("/api/v1/generate", json={"prompt": "x"})
    assert r3.status in (400, 500, 503)
