"""BASELINE config 4 end-to-end: expert-parallel MoE + continuous batching,
SERVED over HTTP (VERDICT r3 item 4 — "EP and continuous batching have
never met").

A mixtral-shaped model with routed sorted-EP dispatch runs through the
BatchedEngine with its expert stacks sharded over a dedicated `ep` mesh
axis on the 8-device CPU mesh; concurrent HTTP requests through the aiohttp
app must return exactly the unsharded single-engine greedy outputs.
"""
import dataclasses
import json
import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

pytest_plugins = ("aiohttp.pytest_plugin",)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_hf import convert_mixtral_state_dict  # noqa: E402
from .test_model_forward import tiny_tokenizer_md  # noqa: E402

from koboldcpp_tpu.engine import Engine  # noqa: E402
from koboldcpp_tpu.engine.batch_engine import BatchedEngine  # noqa: E402
from koboldcpp_tpu.models.loader import Model, load_model  # noqa: E402
from koboldcpp_tpu.parallel import make_mesh, shard_params  # noqa: E402
from koboldcpp_tpu.server.app import ServerSettings, make_app  # noqa: E402

PROMPTS = ["tok5 tok9", "tok42 tok7 tok300", "tok1 tok12"]


@pytest.fixture(scope="module")
def mixtral_path(tmp_path_factory):
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(5)
    cfg = MixtralConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    model = MixtralForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("moe") / "mixtral.gguf")
    convert_mixtral_state_dict(state, cfg, path,
                               tokenizer_md=tiny_tokenizer_md(512))
    return path


def _gen_body(prompt):
    return {"prompt": prompt, "max_length": 6, "temperature": 0,
            "rep_pen": 1.0}


@pytest.fixture(scope="module")
def reference_texts(mixtral_path):
    from koboldcpp_tpu.engine.engine import GenParams
    from koboldcpp_tpu.sampling.samplers import SamplerParams

    m = load_model(mixtral_path, packed=False, dtype=jnp.float32)
    eng = Engine(m, max_context=128, cache_dtype=jnp.float32)
    out = []
    for p in PROMPTS:
        eng.reset_context()
        r = eng.generate(p, GenParams(
            max_length=6, sampler=SamplerParams(temperature=0.0,
                                                rep_pen=1.0)))
        out.append(r.text)
    return out


async def test_ep_batched_served(mixtral_path, reference_texts,
                                 aiohttp_client):
    m = load_model(mixtral_path, packed=False, dtype=jnp.float32)
    cfg2 = dataclasses.replace(m.cfg, moe_sorted_ep=True)  # dropless default
    mesh = make_mesh(dp=1, tp=2, ep=4)  # 4 experts over 4 ep shards
    sp = shard_params(m.params, mesh)
    w = sp["layers"][0]["ffn_gate_exps"].data["w"]
    assert w.sharding.shard_shape(w.shape)[0] == 1  # 1 expert per ep shard
    model = Model(cfg2, sp, m.tokenizer)
    eng = BatchedEngine(model, max_context=128, n_slots=4,
                        cache_dtype=jnp.float32, mesh=mesh)
    try:
        app = make_app(eng, ServerSettings(model_name="test/mixtral-ep"))
        client = await aiohttp_client(app)
        import asyncio

        async def one(p):
            r = await client.post("/api/v1/generate", json=_gen_body(p))
            assert r.status == 200
            return (await r.json())["results"][0]["text"]

        texts = await asyncio.gather(*[one(p) for p in PROMPTS])
        assert list(texts) == reference_texts
    finally:
        eng.shutdown()
