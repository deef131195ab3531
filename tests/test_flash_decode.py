"""Fused decode-attention kernel (ops/flash_decode.py) vs the XLA attention
reference, in interpret mode on CPU."""
import os

os.environ["KCPP_FLASH_DECODE"] = "1"  # opt-in (off by default; PERF_NOTES)

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from koboldcpp_tpu.models import llama as jllama
from koboldcpp_tpu.ops import flash_decode


@pytest.mark.parametrize("H,Hkv,D,S,pos", [
    (8, 2, 64, 128, 37),    # GQA
    (4, 4, 32, 64, 0),      # MHA, first position
    (32, 4, 64, 256, 255),  # tinyllama shape, full cache
])
def test_decode_attention_matches_reference(H, Hkv, D, S, pos):
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((S, Hkv, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((S, Hkv, D)) * 0.3, jnp.bfloat16)
    scale = D ** -0.5

    out = flash_decode.decode_attention(
        q, k, v, jnp.int32(pos), H, scale, interpret=True)

    mask = (jnp.arange(S) <= pos)[None, None, :]  # (B,T,S)
    ref = jllama.attention(q[None, None].astype(jnp.bfloat16),
                           k[None], v[None], mask, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0, 0]),
                               rtol=2e-2, atol=2e-2)


def test_decode_attention_softcap():
    rng = np.random.default_rng(2)
    H, Hkv, D, S, pos = 8, 2, 64, 64, 20
    q = jnp.asarray(rng.standard_normal((H, D)) * 3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((S, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((S, Hkv, D)), jnp.bfloat16)
    scale = D ** -0.5
    out = flash_decode.decode_attention(
        q, k, v, jnp.int32(pos), H, scale, softcap=5.0, interpret=True)
    mask = (jnp.arange(S) <= pos)[None, None, :]
    ref = jllama.attention(q[None, None].astype(jnp.bfloat16),
                           k[None], v[None], mask, scale, softcap=5.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0, 0]),
                               rtol=3e-2, atol=3e-2)


def test_forward_uses_flash_decode_consistently(tmp_path):
    """llama.forward T=1 path (kernel) == T>1 path (XLA) on the same cache."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from convert_hf import convert_llama_state_dict
    from .test_model_forward import tiny_tokenizer_md
    from koboldcpp_tpu.models.loader import load_model
    from koboldcpp_tpu.kv.cache import init_cache

    torch.manual_seed(6)
    hcfg = LlamaConfig(vocab_size=512, hidden_size=256, intermediate_size=96,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2)  # KD = 2*64 = 128
    model = LlamaForCausalLM(hcfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "fd.gguf")
    convert_llama_state_dict(state, hcfg, path, tokenizer_md=tiny_tokenizer_md(512))
    m = load_model(path, packed=False, dtype=jnp.float32)
    assert (m.cfg.n_kv_heads * m.cfg.head_dim) % 128 == 0

    toks = np.array([[1, 5, 9, 42, 7]], np.int32)
    # one-shot T=5 (XLA attention path)
    cache = init_cache(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads, m.cfg.head_dim,
                       dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(5), (1, 5)).astype(jnp.int32)
    full, _ = jllama.forward(m.params, m.cfg, jnp.asarray(toks), pos, cache)
    # incremental T=1 (flash-decode kernel path, interpret on cpu)
    cache = init_cache(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads, m.cfg.head_dim,
                       dtype=jnp.float32)
    outs = []
    for t in range(5):
        logits, cache = jllama.forward(
            m.params, m.cfg, jnp.asarray(toks[:, t:t + 1]),
            jnp.full((1, 1), t, jnp.int32), cache)
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), np.asarray(full),
                               rtol=2e-3, atol=2e-3)


def test_paged_decode_attention_parity():
    """Paged flash-decode kernel vs gather + XLA attention, including the
    in-kernel page write, non-contiguous tables, block boundaries, pos=0
    self-only, and a dead slot (position -1)."""
    import jax.numpy as jnp
    import numpy as np

    from koboldcpp_tpu.kv import paged
    from koboldcpp_tpu.ops import flash_decode

    rng = np.random.default_rng(3)
    B, H, Hkv, D, P, NP, MP = 4, 8, 2, 64, 8, 40, 8
    KD = Hkv * D
    pcache = paged.init_paged_cache(1, NP, P, Hkv, D)
    table = jnp.asarray(
        rng.permutation(NP)[:B * MP].reshape(B, MP).astype(np.int32))
    positions = np.array([0, 5, 8, 33], np.int32)

    # pre-fill history < pos through paged.write
    for b in range(B):
        p = int(positions[b])
        if p == 0:
            continue
        ks = jnp.asarray(rng.standard_normal((1, p, Hkv, D)), jnp.bfloat16)
        vs = jnp.asarray(rng.standard_normal((1, p, Hkv, D)), jnp.bfloat16)
        pos_r = jnp.arange(p)[None, :]
        one = paged.PagedKVCache(
            k=pcache.k, v=pcache.v, k_scale=pcache.k_scale,
            v_scale=pcache.v_scale, page_size=P, quantized=False, heads=Hkv)
        pcache = paged.write(one, 0, table[b:b + 1], pos_r, ks, vs)

    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.bfloat16)
    scale = D ** -0.5

    out, k_upd, v_upd = flash_decode.decode_attention_paged(
        q, kn, vn, pcache.k[0], pcache.v[0], table, jnp.asarray(positions),
        H, Hkv, P, scale, interpret=True)

    # reference: write through paged.write, gather, dense masked attention
    ref_cache = paged.write(pcache, 0, table, jnp.asarray(positions)[:, None],
                            kn[:, None], vn[:, None])
    gk, gv = paged.gather(ref_cache, 0, table)  # (B, MP*P, Hkv, D)
    G = H // Hkv
    for b in range(B):
        p = int(positions[b])
        for h in range(H):
            kv = h // G
            ka = np.asarray(gk[b, :, kv], np.float32)
            va = np.asarray(gv[b, :, kv], np.float32)
            sc = (np.asarray(q[b, h], np.float32) @ ka.T) * scale
            sc[p + 1:] = -np.inf
            pr = np.exp(sc - sc.max()); pr /= pr.sum()
            want = pr @ va
            got = np.asarray(out)[b, h]
            err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
            assert err < 0.04, (b, h, err)
    # in-kernel writes match paged.write exactly
    np.testing.assert_array_equal(np.asarray(k_upd), np.asarray(ref_cache.k[0]))
    np.testing.assert_array_equal(np.asarray(v_upd), np.asarray(ref_cache.v[0]))


def test_q8_flash_decode_forward_parity():
    """Q8-KV flash path vs the XLA write-then-dequant path: layer-0 cache
    writes must be BIT-exact (same quantization), logits within bf16 noise."""
    import dataclasses
    import os

    import jax.numpy as jnp
    import numpy as np

    from koboldcpp_tpu.kv.cache import init_cache
    from koboldcpp_tpu.models import llama
    from koboldcpp_tpu.models.synthetic import TINYLLAMA_1_1B, synthetic_params

    cfg = dataclasses.replace(TINYLLAMA_1_1B, n_layers=1)
    params = synthetic_params(cfg, kind="dense", seed=0)
    B, S = 2, 512

    def run(flash):
        os.environ["KCPP_FLASH_DECODE"] = "1" if flash else "0"
        rng = np.random.default_rng(0)
        cache = init_cache(cfg.n_layers, B, S, cfg.n_kv_heads, cfg.head_dim,
                           quantized=True)
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 20)), jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(20, dtype=jnp.int32)[None], (B, 20))
        logits, cache = llama.forward(params, cfg, toks, pos, cache,
                                      last_only=True)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        for i in range(3):
            l2, cache = llama.forward(params, cfg, tok,
                                      jnp.full((B, 1), 20 + i, jnp.int32),
                                      cache, last_only=True)
            tok = jnp.argmax(l2[:, -1], -1).astype(jnp.int32)[:, None]
        return np.asarray(l2), cache

    try:
        la, ca = run(False)
        lb, cb = run(True)
    finally:
        os.environ.pop("KCPP_FLASH_DECODE", None)
    np.testing.assert_array_equal(np.asarray(ca.k[0]), np.asarray(cb.k[0]))
    np.testing.assert_array_equal(np.asarray(ca.k_scale[0]),
                                  np.asarray(cb.k_scale[0]))
    err = np.abs(la - lb).max() / (np.abs(la).max() + 1e-6)
    assert err < 0.02, err


def test_paged_q8_decode_attention_parity():
    """Paged Q8 flash-decode kernel vs write-then-gather + XLA attention:
    in-kernel quantized page writes must be BIT-exact with paged.write's
    _quantize_q8, attention output within q8 noise. Covers non-contiguous
    tables, pos=0 self-only, block boundaries, and a dead slot (pos -1)."""
    import jax.numpy as jnp
    import numpy as np

    from koboldcpp_tpu.kv import paged
    from koboldcpp_tpu.ops import flash_decode

    rng = np.random.default_rng(7)
    B, H, Hkv, D, P, NP, MP = 4, 8, 2, 64, 8, 40, 8
    pcache = paged.init_paged_cache(1, NP, P, Hkv, D, quantized=True)
    table = jnp.asarray(
        rng.permutation(NP)[:B * MP].reshape(B, MP).astype(np.int32))
    positions = np.array([0, 5, 8, 33], np.int32)

    for b in range(B):
        p = int(positions[b])
        if p == 0:
            continue
        ks = jnp.asarray(rng.standard_normal((1, p, Hkv, D)), jnp.bfloat16)
        vs = jnp.asarray(rng.standard_normal((1, p, Hkv, D)), jnp.bfloat16)
        pcache = paged.write(pcache, 0, table[b:b + 1],
                             jnp.arange(p)[None, :], ks, vs)

    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.bfloat16)
    scale = D ** -0.5

    out, k_upd, v_upd, ks_upd, vs_upd = flash_decode.decode_attention_paged_q8(
        q, kn, vn, pcache.k[0], pcache.v[0],
        pcache.k_scale[0], pcache.v_scale[0],
        table, jnp.asarray(positions), H, Hkv, P, scale, interpret=True)

    ref_cache = paged.write(pcache, 0, table, jnp.asarray(positions)[:, None],
                            kn[:, None], vn[:, None])
    gk, gv = paged.gather(ref_cache, 0, table)  # dequantized (B, MP*P, Hkv, D)
    G = H // Hkv
    for b in range(B):
        p = int(positions[b])
        for h in range(H):
            kv = h // G
            ka = np.asarray(gk[b, :, kv], np.float32)
            va = np.asarray(gv[b, :, kv], np.float32)
            sc = (np.asarray(q[b, h], np.float32) @ ka.T) * scale
            sc[p + 1:] = -np.inf
            pr = np.exp(sc - sc.max()); pr /= pr.sum()
            want = pr @ va
            got = np.asarray(out)[b, h]
            err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
            assert err < 0.05, (b, h, err)
    np.testing.assert_array_equal(np.asarray(k_upd), np.asarray(ref_cache.k[0]))
    np.testing.assert_array_equal(np.asarray(v_upd), np.asarray(ref_cache.v[0]))
    np.testing.assert_array_equal(np.asarray(ks_upd),
                                  np.asarray(ref_cache.k_scale[0]))
    np.testing.assert_array_equal(np.asarray(vs_upd),
                                  np.asarray(ref_cache.v_scale[0]))

    # dead slot: positions -1 must leave the pools untouched (copy-through)
    out2, k2, v2, ks2, vs2 = flash_decode.decode_attention_paged_q8(
        q, kn, vn, ref_cache.k[0], ref_cache.v[0],
        ref_cache.k_scale[0], ref_cache.v_scale[0],
        table, jnp.asarray(np.full(B, -1, np.int32)), H, Hkv, P, scale,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(ref_cache.k[0]))
    np.testing.assert_array_equal(np.asarray(ks2),
                                  np.asarray(ref_cache.k_scale[0]))


def test_paged_q4_decode_attention_parity():
    """Paged Q4 flash-decode kernel vs write-then-gather + XLA attention:
    in-kernel plane-split nibble page writes must be BIT-exact with
    paged.write's _quantize_q4, attention output within q4 noise. Covers
    non-contiguous tables, pos=0 self-only, page boundaries, GQA, and a
    dead slot (pos -1)."""
    import jax.numpy as jnp
    import numpy as np

    from koboldcpp_tpu.kv import paged
    from koboldcpp_tpu.ops import flash_decode

    rng = np.random.default_rng(11)
    B, H, Hkv, D, P, NP, MP = 4, 8, 2, 64, 8, 40, 8
    pcache = paged.init_paged_cache(1, NP, P, Hkv, D, quantized="q4")
    table = jnp.asarray(
        rng.permutation(NP)[:B * MP].reshape(B, MP).astype(np.int32))
    positions = np.array([0, 5, 8, 33], np.int32)

    for b in range(B):
        p = int(positions[b])
        if p == 0:
            continue
        ks = jnp.asarray(rng.standard_normal((1, p, Hkv, D)), jnp.bfloat16)
        vs = jnp.asarray(rng.standard_normal((1, p, Hkv, D)), jnp.bfloat16)
        pcache = paged.write(pcache, 0, table[b:b + 1],
                             jnp.arange(p)[None, :], ks, vs)

    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.bfloat16)
    # integer-valued new rows with amax 7 -> q4 scale exactly 1.0: the
    # write-back bit-exactness check is then free of float-tie ambiguity
    # between the two separately-compiled quantizers (XLA may or may not
    # FMA-fuse round(x * (1/s)), which flips exact .5 ties)
    kni = rng.integers(-7, 8, (B, Hkv, D)).astype(np.float32)
    vni = rng.integers(-7, 8, (B, Hkv, D)).astype(np.float32)
    kni[:, :, 0] = 7
    vni[:, :, 0] = 7
    kn = jnp.asarray(kni, jnp.bfloat16)
    vn = jnp.asarray(vni, jnp.bfloat16)
    scale = D ** -0.5

    out, k_upd, v_upd, ks_upd, vs_upd = flash_decode.decode_attention_paged_q4(
        q, kn, vn, pcache.k[0], pcache.v[0],
        pcache.k_scale[0], pcache.v_scale[0],
        table, jnp.asarray(positions), H, Hkv, P, scale, interpret=True)

    ref_cache = paged.write(pcache, 0, table, jnp.asarray(positions)[:, None],
                            kn[:, None], vn[:, None])
    gk, gv = paged.gather(ref_cache, 0, table)  # dequantized (B, MP*P, Hkv, D)
    G = H // Hkv
    for b in range(B):
        p = int(positions[b])
        for h in range(H):
            kv = h // G
            ka = np.asarray(gk[b, :, kv], np.float32)
            va = np.asarray(gv[b, :, kv], np.float32)
            sc = (np.asarray(q[b, h], np.float32) @ ka.T) * scale
            sc[p + 1:] = -np.inf
            pr = np.exp(sc - sc.max()); pr /= pr.sum()
            want = pr @ va
            got = np.asarray(out)[b, h]
            err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
            assert err < 0.08, (b, h, err)
    np.testing.assert_array_equal(np.asarray(k_upd), np.asarray(ref_cache.k[0]))
    np.testing.assert_array_equal(np.asarray(v_upd), np.asarray(ref_cache.v[0]))
    np.testing.assert_array_equal(np.asarray(ks_upd),
                                  np.asarray(ref_cache.k_scale[0]))
    np.testing.assert_array_equal(np.asarray(vs_upd),
                                  np.asarray(ref_cache.v_scale[0]))

    # dead slot: positions -1 must leave the pools untouched (copy-through)
    out2, k2, v2, ks2, vs2 = flash_decode.decode_attention_paged_q4(
        q, kn, vn, ref_cache.k[0], ref_cache.v[0],
        ref_cache.k_scale[0], ref_cache.v_scale[0],
        table, jnp.asarray(np.full(B, -1, np.int32)), H, Hkv, P, scale,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(ref_cache.k[0]))
    np.testing.assert_array_equal(np.asarray(ks2),
                                  np.asarray(ref_cache.k_scale[0]))


def test_forward_paged_q4_matches_q8_path_shapewise():
    """forward_paged over a q4 pool decodes greedily without divergence from
    the q8 pool beyond quantization noise (same model, same tokens)."""
    import os

    import jax.numpy as jnp
    import numpy as np

    from koboldcpp_tpu.kv import paged
    from koboldcpp_tpu.models import llama
    from koboldcpp_tpu.models.config import ModelConfig
    from koboldcpp_tpu.models.synthetic import synthetic_params

    cfg = ModelConfig(arch="llama", name="t", vocab_size=256, hidden_size=64,
                      n_layers=2, n_heads=4, n_kv_heads=2, head_dim=16,
                      intermediate_size=128, max_position_embeddings=64,
                      rope_dim=16)
    params = synthetic_params(cfg, kind="dense", seed=0)
    table = jnp.asarray(np.arange(8, dtype=np.int32)[None])

    def run(quant):
        cache = paged.init_paged_cache(cfg.n_layers, 9, 8, cfg.n_kv_heads,
                                       cfg.head_dim, quantized=quant)
        toks = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
        pos = jnp.arange(4, dtype=jnp.int32)[None]
        logits, cache = llama.forward_paged(params, cfg, toks, pos, cache,
                                            table, last_only=True)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        for i in range(3):
            l2, cache = llama.forward_paged(
                params, cfg, tok, jnp.full((1, 1), 4 + i, jnp.int32),
                cache, table, last_only=True)
            tok = jnp.argmax(l2[:, -1], -1).astype(jnp.int32)[:, None]
        return np.asarray(l2)

    l8 = run("q8")
    l4 = run("q4")
    err = np.abs(l8 - l4).max() / (np.abs(l8).max() + 1e-6)
    assert err < 0.25, err  # q4 noise bound on a tiny random model


@pytest.mark.parametrize("quant", ["q8", "q4"])
def test_paged_col_layout_parity(quant):
    """Column-layout quantized paged kernels (q8c/q4c) vs write-then-gather:
    page tiles are (KD', P) with tokens as columns; results must match the
    XLA path exactly on the pools and within quant noise on attention."""
    import jax.numpy as jnp
    import numpy as np

    from koboldcpp_tpu.kv import paged
    from koboldcpp_tpu.ops import flash_decode

    rng = np.random.default_rng(13)
    B, H, Hkv, D, P, NP, MP = 4, 8, 2, 64, 128, 12, 3
    pcache = paged.init_paged_cache(1, NP, P, Hkv, D, quantized=quant)
    assert pcache.col, "shape should select the column layout"
    table = jnp.asarray(
        rng.permutation(NP)[:B * MP].reshape(B, MP).astype(np.int32))
    positions = np.array([0, 5, 128, 283], np.int32)

    for b in range(B):
        p = int(positions[b])
        if p == 0:
            continue
        ks = jnp.asarray(rng.standard_normal((1, p, Hkv, D)), jnp.bfloat16)
        vs = jnp.asarray(rng.standard_normal((1, p, Hkv, D)), jnp.bfloat16)
        pcache = paged.write(pcache, 0, table[b:b + 1],
                             jnp.arange(p)[None, :], ks, vs)

    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.bfloat16)
    kni = rng.integers(-7, 8, (B, Hkv, D)).astype(np.float32)
    vni = rng.integers(-7, 8, (B, Hkv, D)).astype(np.float32)
    kni[:, :, 0] = 7
    vni[:, :, 0] = 7
    kn = jnp.asarray(kni, jnp.bfloat16)
    vn = jnp.asarray(vni, jnp.bfloat16)
    scale = D ** -0.5

    kern = (flash_decode.decode_attention_paged_q8c if quant == "q8"
            else flash_decode.decode_attention_paged_q4c)
    out, k_upd, v_upd, ks_upd, vs_upd = kern(
        q, kn, vn, pcache.k[0], pcache.v[0],
        pcache.k_scale[0], pcache.v_scale[0],
        table, jnp.asarray(positions), H, Hkv, P, scale, interpret=True)

    ref_cache = paged.write(pcache, 0, table, jnp.asarray(positions)[:, None],
                            kn[:, None], vn[:, None])
    gk, gv = paged.gather(ref_cache, 0, table)
    G = H // Hkv
    for b in range(B):
        p = int(positions[b])
        for h in range(H):
            kv = h // G
            ka = np.asarray(gk[b, :, kv], np.float32)
            va = np.asarray(gv[b, :, kv], np.float32)
            sc = (np.asarray(q[b, h], np.float32) @ ka.T) * scale
            sc[p + 1:] = -np.inf
            pr = np.exp(sc - sc.max()); pr /= pr.sum()
            want = pr @ va
            got = np.asarray(out)[b, h]
            err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
            assert err < 0.08, (b, h, err)
    np.testing.assert_array_equal(np.asarray(k_upd), np.asarray(ref_cache.k[0]))
    np.testing.assert_array_equal(np.asarray(v_upd), np.asarray(ref_cache.v[0]))
    np.testing.assert_array_equal(np.asarray(ks_upd),
                                  np.asarray(ref_cache.k_scale[0]))
    np.testing.assert_array_equal(np.asarray(vs_upd),
                                  np.asarray(ref_cache.v_scale[0]))

    # dead slot copy-through
    out2, k2, v2, ks2, vs2 = kern(
        q, kn, vn, ref_cache.k[0], ref_cache.v[0],
        ref_cache.k_scale[0], ref_cache.v_scale[0],
        table, jnp.asarray(np.full(B, -1, np.int32)), H, Hkv, P, scale,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(ref_cache.k[0]))
