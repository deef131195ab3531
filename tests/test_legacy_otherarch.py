"""Legacy otherarch binary containers: GPT-J and GPT-NeoX "ggml"-magic .bin
files (otherarch/gptj_v3.cpp, neox_v3.cpp) load end-to-end and match HF."""
import struct

import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.gguf.sniff import FileFormat, check_file_format
from koboldcpp_tpu.kv.cache import init_cache
from koboldcpp_tpu.models import llama as jllama
from koboldcpp_tpu.models.loader import load_model

TOKENS = np.array([[1, 5, 9, 42, 7, 300]], dtype=np.int32)


def write_otherarch(path, arch, hparams, tensors, n_vocab,
                    vocab_count=True):
    """hparams: tuple of i32s (f32 where float) after magic; tensors:
    {legacy_name: np.ndarray} written as F16 (2-D) / F32 (1-D), qntvr=2."""
    buf = bytearray(struct.pack("<I", 0x67676D6C))
    for h in hparams:
        buf += struct.pack("<f" if isinstance(h, float) else "<i", h)
    if vocab_count:
        buf += struct.pack("<I", n_vocab)
    for i in range(n_vocab):
        tok = f"t{i}".encode()
        buf += struct.pack("<I", len(tok)) + tok
    for name, arr in tensors.items():
        arr = np.asarray(arr, np.float32)
        if arr.ndim >= 2:
            data = arr.astype(np.float16).tobytes()
            ttype = 1
        else:
            data = arr.tobytes()
            ttype = 0
        ne = tuple(reversed(arr.shape))
        nm = name.encode()
        buf += struct.pack("<3i", arr.ndim, len(nm), ttype)
        buf += struct.pack(f"<{arr.ndim}i", *ne)
        buf += nm
        buf += data
    with open(path, "wb") as f:
        f.write(bytes(buf))


def run_ours(path):
    m = load_model(path, packed=False, dtype=jnp.float32)
    cache = init_cache(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads, m.cfg.head_dim,
                       dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(TOKENS.shape[1]), TOKENS.shape).astype(jnp.int32)
    logits, _ = jllama.forward(m.params, m.cfg, jnp.asarray(TOKENS), pos, cache)
    return m, np.asarray(logits)


def test_legacy_gptj(tmp_path):
    import torch
    from transformers import GPTJConfig, GPTJForCausalLM

    torch.manual_seed(61)
    cfg = GPTJConfig(vocab_size=50400, n_embd=64, n_layer=2, n_head=4,
                     rotary_dim=16, n_positions=128, n_inner=None,
                     tie_word_embeddings=False)
    model = GPTJForCausalLM(cfg).eval().float()
    st = {k: v.numpy() for k, v in model.state_dict().items()}
    tensors = {"transformer.wte.weight": st["transformer.wte.weight"],
               "transformer.ln_f.weight": st["transformer.ln_f.weight"],
               "transformer.ln_f.bias": st["transformer.ln_f.bias"],
               "lm_head.weight": st["lm_head.weight"],
               "lm_head.bias": st["lm_head.bias"]}
    for i in range(2):
        hp = f"transformer.h.{i}."
        tensors |= {
            hp + "ln_1.weight": st[hp + "ln_1.weight"],
            hp + "ln_1.bias": st[hp + "ln_1.bias"],
            hp + "attn.q_proj.weight": st[hp + "attn.q_proj.weight"],
            hp + "attn.k_proj.weight": st[hp + "attn.k_proj.weight"],
            hp + "attn.v_proj.weight": st[hp + "attn.v_proj.weight"],
            hp + "attn.out_proj.weight": st[hp + "attn.out_proj.weight"],
            hp + "mlp.fc_in.weight": st[hp + "mlp.fc_in.weight"],
            hp + "mlp.fc_in.bias": st[hp + "mlp.fc_in.bias"],
            hp + "mlp.fc_out.weight": st[hp + "mlp.fc_out.weight"],
            hp + "mlp.fc_out.bias": st[hp + "mlp.fc_out.bias"],
        }
    path = str(tmp_path / "gptj_legacy.bin")
    # hparams: n_vocab n_ctx n_embd n_head n_layer n_rot ftype (qntvr=2)
    write_otherarch(path, "gptj", (50400, 128, 64, 4, 2, 16, 2001),
                    tensors, 50400)
    assert check_file_format(path) is FileFormat.GPTJ_5
    m, ours = run_ours(path)
    assert m.cfg.arch == "gptj" and m.cfg.parallel_residual
    assert m.cfg.rope_dim == 16
    import torch as _t

    with _t.no_grad():
        ref = model(_t.tensor(TOKENS, dtype=_t.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_legacy_neox(tmp_path):
    import torch
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    torch.manual_seed(62)
    cfg = GPTNeoXConfig(vocab_size=512, hidden_size=64, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=256,
                        rotary_pct=1.0, max_position_embeddings=128,
                        use_parallel_residual=True,
                        tie_word_embeddings=False)
    model = GPTNeoXForCausalLM(cfg).eval().float()
    st = {k: v.numpy() for k, v in model.state_dict().items()}
    tensors = {"gpt_neox.embed_in.weight": st["gpt_neox.embed_in.weight"],
               "gpt_neox.final_layer_norm.weight": st["gpt_neox.final_layer_norm.weight"],
               "gpt_neox.final_layer_norm.bias": st["gpt_neox.final_layer_norm.bias"],
               "embed_out.weight": st["embed_out.weight"]}
    for i in range(2):
        hp = f"gpt_neox.layers.{i}."
        tensors |= {hp + k: st[hp + k] for k in (
            "input_layernorm.weight", "input_layernorm.bias",
            "post_attention_layernorm.weight", "post_attention_layernorm.bias",
            "attention.query_key_value.weight",
            "attention.query_key_value.bias",
            "attention.dense.weight", "attention.dense.bias",
            "mlp.dense_h_to_4h.weight", "mlp.dense_h_to_4h.bias",
            "mlp.dense_4h_to_h.weight", "mlp.dense_4h_to_h.bias")}
    path = str(tmp_path / "neox_legacy.bin")
    # hparams: n_vocab n_ctx n_embd n_head n_layer n_rot par_res ftype
    write_otherarch(path, "gptneox", (512, 128, 64, 4, 2, 16, 1, 2001),
                    tensors, 512)
    assert check_file_format(path) is FileFormat.NEOX
    m, ours = run_ours(path)
    assert m.cfg.arch == "gptneox" and m.cfg.parallel_residual
    import torch as _t

    with _t.no_grad():
        ref = model(_t.tensor(TOKENS, dtype=_t.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_legacy_mpt(tmp_path, monkeypatch):
    """MPT .bin (mpt_v3.cpp header: 5 i32 + 2 f32 + i32, no vocab-count
    prefix, tied wte head). Sniffing keys off d_model∈{4096,7168}
    (model_adapter.cpp:102), so tiny files patch the sniffer."""
    import torch
    from transformers import MptConfig, MptForCausalLM

    torch.manual_seed(64)
    cfg = MptConfig(d_model=64, n_heads=4, n_layers=2, vocab_size=512,
                    max_seq_len=128)
    cfg.attn_config.clip_qkv = 6.0
    model = MptForCausalLM(cfg).eval().float()
    st = {k: v.numpy() for k, v in model.state_dict().items()}
    tensors = {k: v for k, v in st.items() if k != "lm_head.weight"}
    path = str(tmp_path / "mpt_legacy.bin")
    # hparams: d_model max_seq_len n_heads n_layers n_vocab (i32),
    #          alibi_bias_max clip_qkv (f32), ftype
    write_otherarch(path, "mpt", (64, 128, 4, 2, 512, 8.0, 6.0, 2001),
                    tensors, 512, vocab_count=False)
    from koboldcpp_tpu.gguf import legacy, sniff
    monkeypatch.setattr(sniff, "check_file_format",
                        lambda p: FileFormat.MPT_1)
    monkeypatch.setattr(legacy, "check_file_format",
                        lambda p: FileFormat.MPT_1)
    m, ours = run_ours(path)
    assert m.cfg.arch == "mpt" and m.cfg.use_alibi and not m.cfg.use_rope
    assert m.cfg.clamp_kqv == 6.0 and m.cfg.alibi_bias_max == 8.0
    import torch as _t

    with _t.no_grad():
        ref = model(_t.tensor(TOKENS, dtype=_t.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_sniff_mpt_header():
    import io, os, tempfile
    buf = struct.pack("<I", 0x67676D6C) + struct.pack(
        "<5i", 4096, 2048, 32, 32, 50432) + struct.pack("<2f", 8.0, 0.0) \
        + struct.pack("<i", 2001)
    fd, p = tempfile.mkstemp()
    os.write(fd, buf)
    os.close(fd)
    try:
        assert check_file_format(p) is FileFormat.MPT_1
    finally:
        os.unlink(p)


def test_legacy_gpt2(tmp_path):
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(63)
    cfg = GPT2Config(vocab_size=50257, n_embd=64, n_layer=2, n_head=4,
                     n_positions=128, tie_word_embeddings=False)
    model = GPT2LMHeadModel(cfg).eval().float()
    st = {k: v.numpy() for k, v in model.state_dict().items()}
    tensors = {"model/wte": st["transformer.wte.weight"],
               "model/wpe": st["transformer.wpe.weight"],
               "model/ln_f/g": st["transformer.ln_f.weight"],
               "model/ln_f/b": st["transformer.ln_f.bias"],
               "model/lm_head": st["lm_head.weight"]}
    for i in range(2):
        hp = f"transformer.h.{i}."
        gp = f"model/h{i}/"
        tensors |= {
            gp + "ln_1/g": st[hp + "ln_1.weight"],
            gp + "ln_1/b": st[hp + "ln_1.bias"],
            gp + "ln_2/g": st[hp + "ln_2.weight"],
            gp + "ln_2/b": st[hp + "ln_2.bias"],
            # HF Conv1D stores (in, out); the legacy files carry (out, in)
            gp + "attn/c_attn/w": st[hp + "attn.c_attn.weight"].T,
            gp + "attn/c_attn/b": st[hp + "attn.c_attn.bias"],
            gp + "attn/c_proj/w": st[hp + "attn.c_proj.weight"].T,
            gp + "attn/c_proj/b": st[hp + "attn.c_proj.bias"],
            gp + "mlp/c_fc/w": st[hp + "mlp.c_fc.weight"].T,
            gp + "mlp/c_fc/b": st[hp + "mlp.c_fc.bias"],
            gp + "mlp/c_proj/w": st[hp + "mlp.c_proj.weight"].T,
            gp + "mlp/c_proj/b": st[hp + "mlp.c_proj.bias"],
        }
    path = str(tmp_path / "gpt2_legacy.bin")
    # hparams: n_vocab n_ctx n_embd n_head n_layer ftype (qntvr=2 -> GPT2_4)
    write_otherarch(path, "gpt2", (50257, 128, 64, 4, 2, 2001), tensors, 50257)
    assert check_file_format(path) is FileFormat.GPT2_4
    m, ours = run_ours(path)
    assert m.cfg.arch == "gpt2" and m.cfg.learned_pos
    import torch as _t

    with _t.no_grad():
        ref = model(_t.tensor(TOKENS, dtype=_t.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)
