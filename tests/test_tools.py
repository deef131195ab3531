"""Tool tests: quantize round-trip, perplexity sanity, CLI flag system."""
import json
import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def f32_gguf(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from convert_hf import convert_llama_state_dict
    from .test_model_forward import tiny_tokenizer_md

    torch.manual_seed(21)
    cfg = LlamaConfig(vocab_size=512, hidden_size=256, intermediate_size=512,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512,
                      tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("tools") / "f32.gguf")
    convert_llama_state_dict(state, cfg, path, tokenizer_md=tiny_tokenizer_md(512))
    return path


def test_quantize_tool(f32_gguf, tmp_path):
    from quantize import quantize_file
    from koboldcpp_tpu.gguf import GGMLType, GGUFReader

    out = str(tmp_path / "q4.gguf")
    quantize_file(f32_gguf, out, GGMLType.Q4_K, verbose=False)
    with GGUFReader(out) as r:
        assert r.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.Q4_K
        # output/embeddings bumped to Q6_K per heuristic
        assert r.tensors["output.weight"].ggml_type == GGMLType.Q6_K
        assert r.tensors["blk.0.attn_norm.weight"].ggml_type == GGMLType.F32
        assert r.metadata["general.file_type"] == int(GGMLType.Q4_K)
    assert os.path.getsize(out) < os.path.getsize(f32_gguf) / 3


def test_quantized_model_still_loads_and_runs(f32_gguf, tmp_path):
    from quantize import quantize_file
    from koboldcpp_tpu.gguf import GGMLType
    from koboldcpp_tpu.models.loader import load_model
    from koboldcpp_tpu.engine import Engine, GenParams
    from koboldcpp_tpu.sampling import SamplerParams

    out = str(tmp_path / "q4.gguf")
    quantize_file(f32_gguf, out, GGMLType.Q4_K, verbose=False)
    m = load_model(out, packed=True)
    eng = Engine(m, max_context=128)
    r = eng.generate([1, 5, 9], GenParams(
        max_length=4, sampler=SamplerParams(temperature=0.0, top_k=1, rep_pen=1.0)))
    assert len(r.tokens) == 4


def test_perplexity_quantization_degrades_gracefully(f32_gguf, tmp_path):
    """Δppl(q) vs f32 must be small — the quality bar from SURVEY.md §4."""
    from perplexity import perplexity
    from quantize import quantize_file
    from koboldcpp_tpu.gguf import GGMLType
    from koboldcpp_tpu.models.loader import load_model

    text = " ".join(f"tok{i % 37} tok{(i * 7) % 53}" for i in range(600))
    m32 = load_model(f32_gguf, packed=False, dtype=jnp.float32)
    p32 = perplexity(m32, text, n_ctx=128, verbose=False)

    q8 = str(tmp_path / "q8.gguf")
    quantize_file(f32_gguf, q8, GGMLType.Q8_0, verbose=False)
    m8 = load_model(q8, packed=False, dtype=jnp.float32)
    p8 = perplexity(m8, text, n_ctx=128, verbose=False)

    assert p32 > 1.0
    # random-weight ppl is near vocab-size; q8 shouldn't move it measurably
    assert abs(p8 - p32) / p32 < 0.02


def test_cli_parser_and_kcpps(tmp_path):
    from koboldcpp_tpu.cli import build_parser, load_kcpps, save_kcpps

    p = build_parser()
    args = p.parse_args(["model.gguf", "5002", "--contextsize", "4096",
                         "--multiuser", "3", "--password", "pw"])
    assert args.model_param == "model.gguf"
    assert args.contextsize == 4096
    # legacy gpu flags accepted silently
    args2 = p.parse_args(["m.gguf", "--usecublas", "--gpulayers", "99"])
    assert args2.model_param == "m.gguf"

    cfg_path = str(tmp_path / "test.kcpps")
    save_kcpps(cfg_path, args)
    fresh = p.parse_args(["x.gguf"])
    load_kcpps(cfg_path, fresh)
    assert fresh.contextsize == 4096 and fresh.password == "pw"


def test_gui_build_argv():
    from koboldcpp_tpu.gui import build_argv

    argv = build_argv({"model": "m.gguf", "port": 5002, "contextsize": 4096,
                       "multiuser": 4, "password": "", "benchmark": True})
    assert argv[0] == "m.gguf"
    assert "--port" in argv and argv[argv.index("--port") + 1] == "5002"
    assert "--contextsize" in argv
    assert "--benchmark" in argv
    assert "--password" not in argv  # defaults omitted

    from koboldcpp_tpu.cli import build_parser
    ns = build_parser().parse_args(argv)
    assert ns.contextsize == 4096 and ns.multiuser == 4


# ---------------------------------------------------------------------------
# imatrix-weighted quantization (VERDICT r1 missing item 6)
# ---------------------------------------------------------------------------

def test_imatrix_weighted_quantization_reduces_weighted_error():
    """Columns marked important by the imatrix must reconstruct better than
    under the unweighted search (the whole point of quantize_row_*_impl's
    quant_weights)."""
    import numpy as np
    from koboldcpp_tpu.gguf import quants
    from koboldcpp_tpu.gguf.constants import GGMLType

    rng = np.random.default_rng(7)
    x = (rng.standard_normal((16, 512)) * 0.05).astype(np.float32)
    # importance concentrated on the first half of every 32-group
    qw = np.ones(512, np.float32)
    qw[:256] = 100.0
    for t in (GGMLType.Q2_K, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K):
        raw_u = quants.quantize(x, t)
        raw_w = quants.quantize(x, t, quant_weights=qw)
        deq_u = quants.dequantize(raw_u, t)
        deq_w = quants.dequantize(raw_w, t)
        imp = qw[None, :] * (x - deq_u) ** 2, qw[None, :] * (x - deq_w) ** 2
        err_u, err_w = (e.sum() for e in imp)
        assert err_w <= err_u * 1.02, (t.name, err_u, err_w)
        # weighted output must differ (the search actually used the weights)
        assert not np.array_equal(raw_u, raw_w), t.name


def test_imatrix_collect_and_quantize(tmp_path):
    """End-to-end: collect an imatrix on the tiny model, quantize with it,
    model still loads and the imatrix keys match GGUF tensor names."""
    import sys, os
    import numpy as np
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from convert_hf import convert_llama_state_dict
    from .test_model_forward import tiny_tokenizer_md
    from imatrix import collect
    from quantize import quantize_file
    from koboldcpp_tpu.gguf import GGMLType, GGUFReader
    from koboldcpp_tpu.models.loader import load_model

    torch.manual_seed(44)
    cfg = LlamaConfig(vocab_size=512, hidden_size=256, intermediate_size=512,
                      num_hidden_layers=1, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=128,
                      tie_word_embeddings=False)
    hf = LlamaForCausalLM(cfg).eval().float()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    f32 = str(tmp_path / "m.gguf")
    convert_llama_state_dict(state, cfg, f32,
                             tokenizer_md=tiny_tokenizer_md(512))

    w = collect(f32, "hello world " * 40, chunk=32, max_chunks=2, cpu=True)
    assert any(k.endswith("attn_q.weight") for k in w)
    assert any(k.endswith("ffn_down.weight") for k in w)
    assert all(v.ndim == 1 and (v >= 0).all() for v in w.values())
    imx = str(tmp_path / "m.imatrix.npz")
    np.savez_compressed(imx, **w)

    q = str(tmp_path / "m.q4k.gguf")
    quantize_file(f32, q, GGMLType.Q4_K, verbose=False, imatrix=imx)
    with GGUFReader(q) as r:
        assert any(i.ggml_type == GGMLType.Q4_K for i in r.tensors.values())
    m = load_model(q, packed=False)
    assert m.cfg.n_layers == 1


def test_gui_schema_covers_every_cli_flag():
    """The launcher form is generated from the argparse parser — every
    non-suppressed CLI flag must appear in exactly one tab (the reference's
    every-flag GUI, koboldcpp.py:2202, without 1200 lines of widgets)."""
    import argparse
    from koboldcpp_tpu.cli import build_parser
    from koboldcpp_tpu.gui import _HIDDEN, build_argv, gui_schema

    schema = gui_schema()
    names = [f["name"] for _, fs in schema for f in fs]
    assert len(names) == len(set(names)), "flag in two tabs"
    want = set()
    for a in build_parser()._actions:
        if (a.option_strings and a.dest not in _HIDDEN
                and not isinstance(a, argparse._HelpAction)
                and a.help != argparse.SUPPRESS):
            want.add(a.dest)
    assert set(names) == want, set(names) ^ want

    # argv building round-trips through the parser
    argv = build_argv({"model": "/tmp/m.gguf", "port": 5099,
                       "multiuser": 4, "paged": True,
                       "contextsize": 4096})
    args = build_parser().parse_args(argv)
    assert args.model_param == "/tmp/m.gguf"
    assert args.port == 5099 and args.multiuser == 4
    assert args.paged is True and args.contextsize == 4096

    # nargs flags split correctly
    argv = build_argv({"ropeconfig": "0.5 20000", "lora": "/a.gguf"})
    args = build_parser().parse_args(argv)
    assert args.ropeconfig == [0.5, 20000.0]
    assert args.lora == ["/a.gguf"]
