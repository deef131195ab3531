"""Round-2 arch batch: the 12 remaining llama.cpp architectures (grok, refact,
plamo, codeshell, openelm, arctic, chatglm, bitnet, jais, exaone, nomic-bert,
jina-bert-v2). No native transformers oracles exist for these in an offline
environment (all need trust_remote_code), so each is verified against an
INDEPENDENT NumPy re-implementation written directly from the reference graph
builders (/root/reference/src/llama.cpp build_<arch>), on random weights
written to GGUF with the reference tensor-name contract.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.gguf import GGMLType, GGUFWriter
from koboldcpp_tpu.kv.cache import init_cache
from koboldcpp_tpu.models import llama as jllama
from koboldcpp_tpu.models.loader import load_model

from .test_model_forward import tiny_tokenizer_md

V, C, H, KV, D, F, L = 512, 64, 4, 2, 16, 96, 2
T = 6
TOKENS = np.array([[1, 5, 9, 42, 7, 300]], dtype=np.int32)
POS = np.arange(T)


# ---------------------------------------------------------------------------
# numpy reference ops (independent of the JAX implementation)
# ---------------------------------------------------------------------------

def np_rms(x, w, eps=1e-5):
    return x / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + eps) * w


def np_ln(x, w, b=None, eps=1e-5):
    mu = np.mean(x, axis=-1, keepdims=True)
    var = np.mean((x - mu) ** 2, axis=-1, keepdims=True)
    y = (x - mu) / np.sqrt(var + eps) * w
    return y + b if b is not None else y


def np_silu(x):
    return x / (1.0 + np.exp(-x))


def np_gelu_tanh(x):  # ggml_gelu (tanh approximation)
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi)
                                    * (x + 0.044715 * x ** 3)))


def np_rope(x, pos, theta, mode, rot=None):
    """x (T, H, D). mode 'neox' rotates (i, i+rot/2); 'norm' adjacent pairs."""
    Tn, Hn, Dn = x.shape
    rot = rot or Dn
    inv = theta ** (-np.arange(0, rot // 2) * 2.0 / rot)
    ang = pos[:, None].astype(np.float64) * inv  # (T, rot/2)
    cos = np.cos(ang)[:, None, :]
    sin = np.sin(ang)[:, None, :]
    y = x.astype(np.float64).copy()
    if mode == "neox":
        a = y[..., : rot // 2].copy()
        b = y[..., rot // 2: rot].copy()
        y[..., : rot // 2] = a * cos - b * sin
        y[..., rot // 2: rot] = a * sin + b * cos
    else:
        a = y[..., 0:rot:2].copy()
        b = y[..., 1:rot:2].copy()
        y[..., 0:rot:2] = a * cos - b * sin
        y[..., 1:rot:2] = a * sin + b * cos
    return y.astype(np.float32)


def np_alibi_slopes(n_head, bias_max=8.0):
    n2 = 2 ** int(np.ceil(np.log2(n_head)))
    slopes = 2.0 ** -(np.arange(1, n2 + 1) * (bias_max / n2))
    if n2 != n_head:
        slopes = np.concatenate([slopes[1::2], slopes[::2]])[:n_head]
    return slopes


def np_softmax(x):
    e = np.exp(x - np.max(x, axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def np_attn(q, k, v, scale, causal=True, alibi_max=0.0, sym_alibi=False):
    """q (T,H,D), k/v (T,KV,D). ALiBi bias = slope*(-|j-i|) (symmetric) or
    slope*(j-i) (causal, equal to -|.| under the causal mask)."""
    Tn, Hn, Dn = q.shape
    G = Hn // k.shape[1]
    slopes = np_alibi_slopes(Hn, alibi_max) if alibi_max else None
    out = np.zeros_like(q, dtype=np.float32)
    i = np.arange(Tn)
    for h in range(Hn):
        s = (q[:, h].astype(np.float32) @ k[:, h // G].astype(np.float32).T
             ) * scale
        if slopes is not None:
            d = i[None, :] - i[:, None]
            s = s + slopes[h] * (-np.abs(d) if sym_alibi else d)
        if causal:
            s = np.where(i[None, :] <= i[:, None], s, -np.inf)
        out[:, h] = np_softmax(s) @ v[:, h // G].astype(np.float32)
    return out


def mm(x, w):  # w stored (out, in) like GGUF
    return x @ w.T


# ---------------------------------------------------------------------------
# GGUF construction helpers
# ---------------------------------------------------------------------------

def base_md(arch, n_layers=L, n_head=H, n_kv=KV, head_dim=D, ff=F, rms=True,
            rope_dim=None, theta=10000.0):
    eps_key = (f"{arch}.attention.layer_norm_rms_epsilon" if rms
               else f"{arch}.attention.layer_norm_epsilon")
    return {
        f"{arch}.context_length": np.uint32(128),
        f"{arch}.embedding_length": np.uint32(C),
        f"{arch}.block_count": np.uint32(n_layers),
        f"{arch}.feed_forward_length": np.uint32(ff),
        f"{arch}.attention.head_count": np.uint32(n_head),
        f"{arch}.attention.head_count_kv": np.uint32(n_kv),
        f"{arch}.attention.key_length": np.uint32(head_dim),
        f"{arch}.attention.value_length": np.uint32(head_dim),
        eps_key: np.float32(1e-5),
        f"{arch}.rope.freq_base": np.float32(theta),
        f"{arch}.rope.dimension_count": np.uint32(rope_dim or head_dim),
        f"{arch}.vocab_size": np.uint32(V),
    }


def write_gguf(path, arch, md, tensors):
    w = GGUFWriter(str(path), architecture=arch)
    for k, v in md.items():
        w.add(k, v)
    for k, v in tiny_tokenizer_md(V).items():
        w.add(k, v)
    for name, arr in tensors.items():
        w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)
    w.write()
    return str(path)


def rng_weights(seed):
    return np.random.default_rng(seed)


def w2(rng, out, inp, s=0.05):
    return (rng.standard_normal((out, inp)) * s).astype(np.float32)


def w1(rng, n, around_one=False):
    v = (rng.standard_normal(n) * 0.1).astype(np.float32)
    return v + 1.0 if around_one else v


def run_ours(path, tokens=TOKENS):
    m = load_model(path, packed=False, dtype=jnp.float32)
    cache = init_cache(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads, m.cfg.head_dim,
                       dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(tokens.shape[1]),
                           tokens.shape).astype(jnp.int32)
    logits, _ = jllama.forward(m.params, m.cfg, jnp.asarray(tokens), pos, cache)
    return m, np.asarray(logits[0])


def check(ours, ref):
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# decoder archs
# ---------------------------------------------------------------------------

def _std_attn_tensors(rng, t, i, n_head=H, n_kv=KV, head_dim=D):
    p = f"blk.{i}."
    t[p + "attn_q.weight"] = w2(rng, n_head * head_dim, C)
    t[p + "attn_k.weight"] = w2(rng, n_kv * head_dim, C)
    t[p + "attn_v.weight"] = w2(rng, n_kv * head_dim, C)
    t[p + "attn_output.weight"] = w2(rng, C, n_head * head_dim)


def _gated_ffn_tensors(rng, t, i, ff=F):
    p = f"blk.{i}."
    t[p + "ffn_gate.weight"] = w2(rng, ff, C)
    t[p + "ffn_up.weight"] = w2(rng, ff, C)
    t[p + "ffn_down.weight"] = w2(rng, C, ff)


def test_exaone(tmp_path):
    """build_exaone == llama graph with NEOX rope (src/llama.cpp:15834)."""
    rng = rng_weights(101)
    t = {"token_embd.weight": w2(rng, V, C, 0.02),
         "output_norm.weight": w1(rng, C, True),
         "output.weight": w2(rng, V, C, 0.02)}
    for i in range(L):
        p = f"blk.{i}."
        t[p + "attn_norm.weight"] = w1(rng, C, True)
        t[p + "ffn_norm.weight"] = w1(rng, C, True)
        _std_attn_tensors(rng, t, i)
        _gated_ffn_tensors(rng, t, i)
    path = write_gguf(tmp_path / "exaone.gguf", "exaone", base_md("exaone"), t)
    m, ours = run_ours(path)
    assert m.cfg.rope_type == "neox"

    x = t["token_embd.weight"][TOKENS[0]]
    for i in range(L):
        p = f"blk.{i}."
        h = np_rms(x, t[p + "attn_norm.weight"])
        q = mm(h, t[p + "attn_q.weight"]).reshape(T, H, D)
        k = mm(h, t[p + "attn_k.weight"]).reshape(T, KV, D)
        v = mm(h, t[p + "attn_v.weight"]).reshape(T, KV, D)
        q = np_rope(q, POS, 10000.0, "neox")
        k = np_rope(k, POS, 10000.0, "neox")
        a = np_attn(q, k, v, D ** -0.5).reshape(T, H * D)
        x = x + mm(a, t[p + "attn_output.weight"])
        h = np_rms(x, t[p + "ffn_norm.weight"])
        x = x + mm(np_silu(mm(h, t[p + "ffn_gate.weight"]))
                   * mm(h, t[p + "ffn_up.weight"]), t[p + "ffn_down.weight"])
    ref = mm(np_rms(x, t["output_norm.weight"]), t["output.weight"])
    check(ours, ref)


def test_refact(tmp_path):
    """build_refact (src/llama.cpp:11345): rms + gated silu, no rope, ALiBi 8."""
    rng = rng_weights(102)
    t = {"token_embd.weight": w2(rng, V, C, 0.02),
         "output_norm.weight": w1(rng, C, True),
         "output.weight": w2(rng, V, C, 0.02)}
    for i in range(L):
        p = f"blk.{i}."
        t[p + "attn_norm.weight"] = w1(rng, C, True)
        t[p + "ffn_norm.weight"] = w1(rng, C, True)
        _std_attn_tensors(rng, t, i)
        _gated_ffn_tensors(rng, t, i)
    path = write_gguf(tmp_path / "refact.gguf", "refact", base_md("refact"), t)
    m, ours = run_ours(path)
    assert not m.cfg.use_rope and m.cfg.use_alibi

    x = t["token_embd.weight"][TOKENS[0]]
    for i in range(L):
        p = f"blk.{i}."
        h = np_rms(x, t[p + "attn_norm.weight"])
        q = mm(h, t[p + "attn_q.weight"]).reshape(T, H, D)
        k = mm(h, t[p + "attn_k.weight"]).reshape(T, KV, D)
        v = mm(h, t[p + "attn_v.weight"]).reshape(T, KV, D)
        a = np_attn(q, k, v, D ** -0.5, alibi_max=8.0).reshape(T, H * D)
        x = x + mm(a, t[p + "attn_output.weight"])
        h = np_rms(x, t[p + "ffn_norm.weight"])
        x = x + mm(np_silu(mm(h, t[p + "ffn_gate.weight"]))
                   * mm(h, t[p + "ffn_up.weight"]), t[p + "ffn_down.weight"])
    ref = mm(np_rms(x, t["output_norm.weight"]), t["output.weight"])
    check(ours, ref)


def test_plamo(tmp_path):
    """build_plamo (src/llama.cpp:12657): ONE norm feeds attention AND FFN,
    layer out = x + attn + ffn."""
    rng = rng_weights(103)
    t = {"token_embd.weight": w2(rng, V, C, 0.02),
         "output_norm.weight": w1(rng, C, True),
         "output.weight": w2(rng, V, C, 0.02)}
    for i in range(L):
        p = f"blk.{i}."
        t[p + "attn_norm.weight"] = w1(rng, C, True)
        _std_attn_tensors(rng, t, i)
        _gated_ffn_tensors(rng, t, i)
    path = write_gguf(tmp_path / "plamo.gguf", "plamo", base_md("plamo"), t)
    m, ours = run_ours(path)
    assert m.cfg.rope_type == "norm"

    x = t["token_embd.weight"][TOKENS[0]]
    for i in range(L):
        p = f"blk.{i}."
        h = np_rms(x, t[p + "attn_norm.weight"])
        q = mm(h, t[p + "attn_q.weight"]).reshape(T, H, D)
        k = mm(h, t[p + "attn_k.weight"]).reshape(T, KV, D)
        v = mm(h, t[p + "attn_v.weight"]).reshape(T, KV, D)
        q = np_rope(q, POS, 10000.0, "norm")
        k = np_rope(k, POS, 10000.0, "norm")
        a = np_attn(q, k, v, D ** -0.5).reshape(T, H * D)
        attn_out = mm(a, t[p + "attn_output.weight"])
        ffn_out = mm(np_silu(mm(h, t[p + "ffn_gate.weight"]))
                     * mm(h, t[p + "ffn_up.weight"]), t[p + "ffn_down.weight"])
        x = x + attn_out + ffn_out
    ref = mm(np_rms(x, t["output_norm.weight"]), t["output.weight"])
    check(ours, ref)


def test_codeshell(tmp_path):
    """build_codeshell (src/llama.cpp:12866): LN+bias, fused wqkv+bias, NEOX
    rope, non-gated gelu FFN with biases."""
    rng = rng_weights(104)
    t = {"token_embd.weight": w2(rng, V, C, 0.02),
         "output_norm.weight": w1(rng, C, True),
         "output_norm.bias": w1(rng, C),
         "output.weight": w2(rng, V, C, 0.02)}
    for i in range(L):
        p = f"blk.{i}."
        t[p + "attn_norm.weight"] = w1(rng, C, True)
        t[p + "attn_norm.bias"] = w1(rng, C)
        t[p + "attn_qkv.weight"] = w2(rng, (H + 2 * KV) * D, C)
        t[p + "attn_qkv.bias"] = w1(rng, (H + 2 * KV) * D)
        t[p + "attn_output.weight"] = w2(rng, C, H * D)
        t[p + "attn_output.bias"] = w1(rng, C)
        t[p + "ffn_norm.weight"] = w1(rng, C, True)
        t[p + "ffn_norm.bias"] = w1(rng, C)
        t[p + "ffn_up.weight"] = w2(rng, F, C)
        t[p + "ffn_up.bias"] = w1(rng, F)
        t[p + "ffn_down.weight"] = w2(rng, C, F)
        t[p + "ffn_down.bias"] = w1(rng, C)
    path = write_gguf(tmp_path / "codeshell.gguf", "codeshell",
                      base_md("codeshell", rms=False), t)
    m, ours = run_ours(path)
    assert m.cfg.norm_type == "layer" and m.cfg.rope_type == "neox"

    x = t["token_embd.weight"][TOKENS[0]]
    for i in range(L):
        p = f"blk.{i}."
        h = np_ln(x, t[p + "attn_norm.weight"], t[p + "attn_norm.bias"])
        qkv = mm(h, t[p + "attn_qkv.weight"]) + t[p + "attn_qkv.bias"]
        q = qkv[:, :H * D].reshape(T, H, D)
        k = qkv[:, H * D:(H + KV) * D].reshape(T, KV, D)
        v = qkv[:, (H + KV) * D:].reshape(T, KV, D)
        q = np_rope(q, POS, 10000.0, "neox")
        k = np_rope(k, POS, 10000.0, "neox")
        a = np_attn(q, k, v, D ** -0.5).reshape(T, H * D)
        x = x + mm(a, t[p + "attn_output.weight"]) + t[p + "attn_output.bias"]
        h = np_ln(x, t[p + "ffn_norm.weight"], t[p + "ffn_norm.bias"])
        up = mm(h, t[p + "ffn_up.weight"]) + t[p + "ffn_up.bias"]
        x = x + mm(np_gelu_tanh(up), t[p + "ffn_down.weight"]) + t[p + "ffn_down.bias"]
    ref = mm(np_ln(x, t["output_norm.weight"], t["output_norm.bias"]),
             t["output.weight"])
    check(ours, ref)


def test_chatglm(tmp_path):
    """build_chatglm (src/llama.cpp:15599): rms, fused wqkv+bias, half-dim
    NORM rope, fused [gate;up] SWIGLU FFN."""
    rng = rng_weights(105)
    t = {"token_embd.weight": w2(rng, V, C, 0.02),
         "output_norm.weight": w1(rng, C, True),
         "output.weight": w2(rng, V, C, 0.02)}
    for i in range(L):
        p = f"blk.{i}."
        t[p + "attn_norm.weight"] = w1(rng, C, True)
        t[p + "attn_qkv.weight"] = w2(rng, (H + 2 * KV) * D, C)
        t[p + "attn_qkv.bias"] = w1(rng, (H + 2 * KV) * D)
        t[p + "attn_output.weight"] = w2(rng, C, H * D)
        t[p + "ffn_norm.weight"] = w1(rng, C, True)
        t[p + "ffn_up.weight"] = w2(rng, 2 * F, C)  # fused [gate; up]
        t[p + "ffn_down.weight"] = w2(rng, C, F)
    path = write_gguf(tmp_path / "chatglm.gguf", "chatglm",
                      base_md("chatglm", rope_dim=D // 2), t)
    m, ours = run_ours(path)
    assert m.cfg.rope_type == "norm" and m.cfg.rope_dim == D // 2
    assert "w_gateup" in m.params["layers"][0]

    x = t["token_embd.weight"][TOKENS[0]]
    for i in range(L):
        p = f"blk.{i}."
        h = np_rms(x, t[p + "attn_norm.weight"])
        qkv = mm(h, t[p + "attn_qkv.weight"]) + t[p + "attn_qkv.bias"]
        q = qkv[:, :H * D].reshape(T, H, D)
        k = qkv[:, H * D:(H + KV) * D].reshape(T, KV, D)
        v = qkv[:, (H + KV) * D:].reshape(T, KV, D)
        q = np_rope(q, POS, 10000.0, "norm", rot=D // 2)
        k = np_rope(k, POS, 10000.0, "norm", rot=D // 2)
        a = np_attn(q, k, v, D ** -0.5).reshape(T, H * D)
        x = x + mm(a, t[p + "attn_output.weight"])
        h = np_rms(x, t[p + "ffn_norm.weight"])
        gu = mm(h, t[p + "ffn_up.weight"])
        x = x + mm(np_silu(gu[:, :F]) * gu[:, F:], t[p + "ffn_down.weight"])
    ref = mm(np_rms(x, t["output_norm.weight"]), t["output.weight"])
    check(ours, ref)


def test_jais(tmp_path):
    """build_jais (src/llama.cpp:15507): LN+bias, fused wqkv, ALiBi, gated
    silu FFN with biases on gate/up/down, kq_scale = 1/head_dim."""
    rng = rng_weights(106)
    t = {"token_embd.weight": w2(rng, V, C, 0.02),
         "output_norm.weight": w1(rng, C, True),
         "output_norm.bias": w1(rng, C),
         "output.weight": w2(rng, V, C, 0.02)}
    for i in range(L):
        p = f"blk.{i}."
        t[p + "attn_norm.weight"] = w1(rng, C, True)
        t[p + "attn_norm.bias"] = w1(rng, C)
        t[p + "attn_qkv.weight"] = w2(rng, (H + 2 * KV) * D, C)
        t[p + "attn_qkv.bias"] = w1(rng, (H + 2 * KV) * D)
        t[p + "attn_output.weight"] = w2(rng, C, H * D)
        t[p + "attn_output.bias"] = w1(rng, C)
        t[p + "ffn_norm.weight"] = w1(rng, C, True)
        t[p + "ffn_norm.bias"] = w1(rng, C)
        t[p + "ffn_gate.weight"] = w2(rng, F, C)
        t[p + "ffn_gate.bias"] = w1(rng, F)
        t[p + "ffn_up.weight"] = w2(rng, F, C)
        t[p + "ffn_up.bias"] = w1(rng, F)
        t[p + "ffn_down.weight"] = w2(rng, C, F)
        t[p + "ffn_down.bias"] = w1(rng, C)
    md = base_md("jais", rms=False)
    md["jais.attention.max_alibi_bias"] = np.float32(8.0)
    path = write_gguf(tmp_path / "jais.gguf", "jais", md, t)
    m, ours = run_ours(path)
    assert m.cfg.attn_scale == pytest.approx(1.0 / D)
    assert "b_gate" in m.params["layers"][0]

    x = t["token_embd.weight"][TOKENS[0]]
    for i in range(L):
        p = f"blk.{i}."
        h = np_ln(x, t[p + "attn_norm.weight"], t[p + "attn_norm.bias"])
        qkv = mm(h, t[p + "attn_qkv.weight"]) + t[p + "attn_qkv.bias"]
        q = qkv[:, :H * D].reshape(T, H, D)
        k = qkv[:, H * D:(H + KV) * D].reshape(T, KV, D)
        v = qkv[:, (H + KV) * D:].reshape(T, KV, D)
        a = np_attn(q, k, v, 1.0 / D, alibi_max=8.0).reshape(T, H * D)
        x = x + mm(a, t[p + "attn_output.weight"]) + t[p + "attn_output.bias"]
        h = np_ln(x, t[p + "ffn_norm.weight"], t[p + "ffn_norm.bias"])
        gate = mm(h, t[p + "ffn_gate.weight"]) + t[p + "ffn_gate.bias"]
        up = mm(h, t[p + "ffn_up.weight"]) + t[p + "ffn_up.bias"]
        x = x + mm(np_silu(gate) * up, t[p + "ffn_down.weight"]) + t[p + "ffn_down.bias"]
    ref = mm(np_ln(x, t["output_norm.weight"], t["output_norm.bias"]),
             t["output.weight"])
    check(ours, ref)


def test_bitnet(tmp_path):
    """build_bitnet (src/llama.cpp:15020): scalar weight scales, rms sub-norms
    before wo / ffn_down, tied lm head, NEOX rope."""
    rng = rng_weights(107)
    t = {"token_embd.weight": w2(rng, V, C, 0.02),
         "output_norm.weight": w1(rng, C, True)}
    for i in range(L):
        p = f"blk.{i}."
        t[p + "attn_norm.weight"] = w1(rng, C, True)
        t[p + "attn_sub_norm.weight"] = w1(rng, H * D, True)
        _std_attn_tensors(rng, t, i)
        for nm in ("attn_q", "attn_k", "attn_v", "attn_output"):
            t[p + nm + ".scale"] = np.array([1.0 + 0.2 * rng.standard_normal()],
                                            np.float32)
        t[p + "ffn_norm.weight"] = w1(rng, C, True)
        t[p + "ffn_sub_norm.weight"] = w1(rng, F, True)
        _gated_ffn_tensors(rng, t, i)
        for nm in ("ffn_gate", "ffn_up", "ffn_down"):
            t[p + nm + ".scale"] = np.array([1.0 + 0.2 * rng.standard_normal()],
                                            np.float32)
    path = write_gguf(tmp_path / "bitnet.gguf", "bitnet", base_md("bitnet"), t)
    m, ours = run_ours(path)
    assert m.cfg.rope_type == "neox"
    assert "wq_scale" in m.params["layers"][0]

    x = t["token_embd.weight"][TOKENS[0]]
    for i in range(L):
        p = f"blk.{i}."
        h = np_rms(x, t[p + "attn_norm.weight"])
        q = (mm(h, t[p + "attn_q.weight"]) * t[p + "attn_q.scale"]).reshape(T, H, D)
        k = (mm(h, t[p + "attn_k.weight"]) * t[p + "attn_k.scale"]).reshape(T, KV, D)
        v = (mm(h, t[p + "attn_v.weight"]) * t[p + "attn_v.scale"]).reshape(T, KV, D)
        q = np_rope(q, POS, 10000.0, "neox")
        k = np_rope(k, POS, 10000.0, "neox")
        a = np_attn(q, k, v, D ** -0.5).reshape(T, H * D)
        a = np_rms(a, t[p + "attn_sub_norm.weight"])
        x = x + mm(a, t[p + "attn_output.weight"]) * t[p + "attn_output.scale"]
        h = np_rms(x, t[p + "ffn_norm.weight"])
        gate = mm(h, t[p + "ffn_gate.weight"]) * t[p + "ffn_gate.scale"]
        up = mm(h, t[p + "ffn_up.weight"]) * t[p + "ffn_up.scale"]
        act = np_rms(np_silu(gate) * up, t[p + "ffn_sub_norm.weight"])
        x = x + mm(act, t[p + "ffn_down.weight"]) * t[p + "ffn_down.scale"]
    ref = mm(np_rms(x, t["output_norm.weight"]), t["token_embd.weight"])
    check(ours, ref)


def test_grok(tmp_path):
    """build_grok (src/llama.cpp:10958): embd scale, kq_scale 1.0, GELU MoE,
    rms post-norms on both branch outputs, logits * 1/sqrt(3)."""
    rng = rng_weights(108)
    E, K, FE = 4, 2, 32
    t = {"token_embd.weight": w2(rng, V, C, 0.02),
         "output_norm.weight": w1(rng, C, True),
         "output.weight": w2(rng, V, C, 0.02)}
    for i in range(L):
        p = f"blk.{i}."
        t[p + "attn_norm.weight"] = w1(rng, C, True)
        t[p + "attn_output_norm.weight"] = w1(rng, C, True)
        t[p + "ffn_norm.weight"] = w1(rng, C, True)
        t[p + "layer_output_norm.weight"] = w1(rng, C, True)
        _std_attn_tensors(rng, t, i)
        t[p + "ffn_gate_inp.weight"] = w2(rng, E, C)
        t[p + "ffn_gate_exps.weight"] = (rng.standard_normal((E, FE, C)) * 0.05
                                         ).astype(np.float32)
        t[p + "ffn_up_exps.weight"] = (rng.standard_normal((E, FE, C)) * 0.05
                                       ).astype(np.float32)
        t[p + "ffn_down_exps.weight"] = (rng.standard_normal((E, C, FE)) * 0.05
                                         ).astype(np.float32)
    md = base_md("grok", ff=FE)
    md["grok.expert_count"] = np.uint32(E)
    md["grok.expert_used_count"] = np.uint32(K)
    path = write_gguf(tmp_path / "grok.gguf", "grok", md, t)
    m, ours = run_ours(path)
    assert m.cfg.attn_scale == 1.0 and m.cfg.rope_type == "neox"
    assert "attn_post_norm" in m.params["layers"][0]

    x = t["token_embd.weight"][TOKENS[0]] * 78.38367176906169
    for i in range(L):
        p = f"blk.{i}."
        h = np_rms(x, t[p + "attn_norm.weight"])
        q = mm(h, t[p + "attn_q.weight"]).reshape(T, H, D)
        k = mm(h, t[p + "attn_k.weight"]).reshape(T, KV, D)
        v = mm(h, t[p + "attn_v.weight"]).reshape(T, KV, D)
        q = np_rope(q, POS, 10000.0, "neox")
        k = np_rope(k, POS, 10000.0, "neox")
        a = np_attn(q, k, v, 1.0).reshape(T, H * D)
        attn_out = mm(a, t[p + "attn_output.weight"])
        attn_out = np_rms(attn_out, t[p + "attn_output_norm.weight"])
        x = x + attn_out
        h = np_rms(x, t[p + "ffn_norm.weight"])
        # MoE: softmax router, top-2 renormalized, GELU gating
        router = np_softmax(mm(h, t[p + "ffn_gate_inp.weight"]))
        moe = np.zeros((T, C), np.float32)
        for ti in range(T):
            top = np.argsort(-router[ti])[:K]
            wts = router[ti, top] / router[ti, top].sum()
            for e, wt in zip(top, wts):
                g = np_gelu_tanh(t[p + "ffn_gate_exps.weight"][e] @ h[ti])
                u = t[p + "ffn_up_exps.weight"][e] @ h[ti]
                moe[ti] += wt * (t[p + "ffn_down_exps.weight"][e] @ (g * u))
        moe = np_rms(moe, t[p + "layer_output_norm.weight"])
        x = x + moe
    ref = mm(np_rms(x, t["output_norm.weight"]), t["output.weight"])
    ref = ref * 0.5773502691896257
    check(ours, ref)


def test_arctic(tmp_path):
    """build_arctic (src/llama.cpp:14660): llama layer + residual MoE branch
    on the LAYER INPUT (norm ffn_norm_exps), silu top-k renormalized."""
    rng = rng_weights(109)
    E, K, FE = 4, 2, 32
    t = {"token_embd.weight": w2(rng, V, C, 0.02),
         "output_norm.weight": w1(rng, C, True),
         "output.weight": w2(rng, V, C, 0.02)}
    for i in range(L):
        p = f"blk.{i}."
        t[p + "attn_norm.weight"] = w1(rng, C, True)
        t[p + "ffn_norm.weight"] = w1(rng, C, True)
        t[p + "ffn_norm_exps.weight"] = w1(rng, C, True)
        _std_attn_tensors(rng, t, i)
        # arctic dense FFN is n_embd wide (llama.cpp :8447-8449)
        t[p + "ffn_gate.weight"] = w2(rng, C, C)
        t[p + "ffn_up.weight"] = w2(rng, C, C)
        t[p + "ffn_down.weight"] = w2(rng, C, C)
        t[p + "ffn_gate_inp.weight"] = w2(rng, E, C)
        t[p + "ffn_gate_exps.weight"] = (rng.standard_normal((E, FE, C)) * 0.05
                                         ).astype(np.float32)
        t[p + "ffn_up_exps.weight"] = (rng.standard_normal((E, FE, C)) * 0.05
                                       ).astype(np.float32)
        t[p + "ffn_down_exps.weight"] = (rng.standard_normal((E, C, FE)) * 0.05
                                         ).astype(np.float32)
    md = base_md("arctic", ff=FE)
    md["arctic.expert_count"] = np.uint32(E)
    md["arctic.expert_used_count"] = np.uint32(K)
    path = write_gguf(tmp_path / "arctic.gguf", "arctic", md, t)
    m, ours = run_ours(path)
    assert m.cfg.rope_type == "norm"
    assert "ffn_norm_exps" in m.params["layers"][0]
    assert "w_gate" in m.params["layers"][0] or "w_gateup" in m.params["layers"][0]

    x = t["token_embd.weight"][TOKENS[0]]
    for i in range(L):
        p = f"blk.{i}."
        x0 = x.copy()
        h = np_rms(x, t[p + "attn_norm.weight"])
        q = mm(h, t[p + "attn_q.weight"]).reshape(T, H, D)
        k = mm(h, t[p + "attn_k.weight"]).reshape(T, KV, D)
        v = mm(h, t[p + "attn_v.weight"]).reshape(T, KV, D)
        q = np_rope(q, POS, 10000.0, "norm")
        k = np_rope(k, POS, 10000.0, "norm")
        a = np_attn(q, k, v, D ** -0.5).reshape(T, H * D)
        ffn_inp = x + mm(a, t[p + "attn_output.weight"])
        h = np_rms(ffn_inp, t[p + "ffn_norm.weight"])
        dense = mm(np_silu(mm(h, t[p + "ffn_gate.weight"]))
                   * mm(h, t[p + "ffn_up.weight"]), t[p + "ffn_down.weight"])
        ffn_out = ffn_inp + dense
        hm = np_rms(x0, t[p + "ffn_norm_exps.weight"])
        router = np_softmax(mm(hm, t[p + "ffn_gate_inp.weight"]))
        moe = np.zeros((T, C), np.float32)
        for ti in range(T):
            top = np.argsort(-router[ti])[:K]
            wts = router[ti, top] / router[ti, top].sum()
            for e, wt in zip(top, wts):
                g = np_silu(t[p + "ffn_gate_exps.weight"][e] @ hm[ti])
                u = t[p + "ffn_up_exps.weight"][e] @ hm[ti]
                moe[ti] += wt * (t[p + "ffn_down_exps.weight"][e] @ (g * u))
        x = ffn_out + moe
    ref = mm(np_rms(x, t["output_norm.weight"]), t["output.weight"])
    check(ours, ref)


def test_openelm(tmp_path):
    """build_openelm (src/llama.cpp:14393): per-layer head counts, head-major
    fused wqkv, per-head-dim QK RMSNorm, NEOX rope, tied lm head."""
    rng = rng_weights(110)
    heads = [4, 2]
    kv_heads = [2, 1]
    ffs = [96, 64]
    t = {"token_embd.weight": w2(rng, V, C, 0.02),
         "output_norm.weight": w1(rng, C, True)}
    for i in range(L):
        p = f"blk.{i}."
        nh, nkv, ff = heads[i], kv_heads[i], ffs[i]
        t[p + "attn_norm.weight"] = w1(rng, C, True)
        t[p + "attn_qkv.weight"] = w2(rng, (nh + 2 * nkv) * D, C)
        t[p + "attn_q_norm.weight"] = w1(rng, D, True)
        t[p + "attn_k_norm.weight"] = w1(rng, D, True)
        t[p + "attn_output.weight"] = w2(rng, C, nh * D)
        t[p + "ffn_norm.weight"] = w1(rng, C, True)
        t[p + "ffn_gate.weight"] = w2(rng, ff, C)
        t[p + "ffn_up.weight"] = w2(rng, ff, C)
        t[p + "ffn_down.weight"] = w2(rng, C, ff)
    md = base_md("openelm")
    md["openelm.attention.head_count"] = np.array(heads, np.uint32)
    md["openelm.attention.head_count_kv"] = np.array(kv_heads, np.uint32)
    md["openelm.feed_forward_length"] = np.array(ffs, np.uint32)
    path = write_gguf(tmp_path / "openelm.gguf", "openelm", md, t)
    m, ours = run_ours(path)
    assert m.cfg.n_heads == 4 and m.cfg.n_kv_heads == 2
    assert m.cfg.extras["head_counts"] == heads

    x = t["token_embd.weight"][TOKENS[0]]
    for i in range(L):
        p = f"blk.{i}."
        nh, nkv = heads[i], kv_heads[i]
        h = np_rms(x, t[p + "attn_norm.weight"])
        qkv = mm(h, t[p + "attn_qkv.weight"]).reshape(T, nh + 2 * nkv, D)
        q, k, v = qkv[:, :nh], qkv[:, nh:nh + nkv], qkv[:, nh + nkv:]
        q = np_rms(q, t[p + "attn_q_norm.weight"])
        k = np_rms(k, t[p + "attn_k_norm.weight"])
        q = np_rope(q, POS, 10000.0, "neox")
        k = np_rope(k, POS, 10000.0, "neox")
        a = np_attn(q, k, v, D ** -0.5).reshape(T, nh * D)
        x = x + mm(a, t[p + "attn_output.weight"])
        h = np_rms(x, t[p + "ffn_norm.weight"])
        x = x + mm(np_silu(mm(h, t[p + "ffn_gate.weight"]))
                   * mm(h, t[p + "ffn_up.weight"]), t[p + "ffn_down.weight"])
    ref = mm(np_rms(x, t["output_norm.weight"]), t["token_embd.weight"])
    check(ours, ref)


# ---------------------------------------------------------------------------
# encoder archs (nomic-bert / jina-bert-v2)
# ---------------------------------------------------------------------------

def run_embed(path, tokens=TOKENS):
    from koboldcpp_tpu.models import bert

    m = load_model(path, packed=False, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(tokens.shape[1]),
                           tokens.shape).astype(jnp.int32)
    hidden = bert.forward_embed(m.params, m.cfg, jnp.asarray(tokens), pos)
    return m, np.asarray(hidden[0])


def test_nomic_bert(tmp_path):
    """build_bert NOMIC_BERT branch: NEOX rope, fused unbias wqkv, gated silu
    FFN, post-norm encoder."""
    rng = rng_weights(111)
    t = {"token_embd.weight": w2(rng, V, C, 0.02),
         "token_types.weight": w2(rng, 2, C, 0.02),
         "token_embd_norm.weight": w1(rng, C, True),
         "token_embd_norm.bias": w1(rng, C)}
    for i in range(L):
        p = f"blk.{i}."
        t[p + "attn_qkv.weight"] = w2(rng, 3 * H * D, C)
        t[p + "attn_output.weight"] = w2(rng, C, H * D)
        t[p + "attn_output_norm.weight"] = w1(rng, C, True)
        t[p + "attn_output_norm.bias"] = w1(rng, C)
        t[p + "ffn_gate.weight"] = w2(rng, F, C)
        t[p + "ffn_up.weight"] = w2(rng, F, C)
        t[p + "ffn_down.weight"] = w2(rng, C, F)
        t[p + "layer_output_norm.weight"] = w1(rng, C, True)
        t[p + "layer_output_norm.bias"] = w1(rng, C)
    md = base_md("nomic-bert", n_kv=H, rms=False, theta=1000.0)
    md["nomic-bert.pooling_type"] = np.uint32(1)
    path = write_gguf(tmp_path / "nomic.gguf", "nomic-bert", md, t)
    m, ours = run_embed(path)
    assert m.cfg.is_embedding and m.cfg.rope_type == "neox"

    x = (t["token_embd.weight"][TOKENS[0]] + t["token_types.weight"][0])
    x = np_ln(x, t["token_embd_norm.weight"], t["token_embd_norm.bias"])
    for i in range(L):
        p = f"blk.{i}."
        qkv = mm(x, t[p + "attn_qkv.weight"])
        q = qkv[:, :H * D].reshape(T, H, D)
        k = qkv[:, H * D:2 * H * D].reshape(T, H, D)
        v = qkv[:, 2 * H * D:].reshape(T, H, D)
        q = np_rope(q, POS, 1000.0, "neox")
        k = np_rope(k, POS, 1000.0, "neox")
        a = np_attn(q, k, v, D ** -0.5, causal=False).reshape(T, H * D)
        x = np_ln(x + mm(a, t[p + "attn_output.weight"]),
                  t[p + "attn_output_norm.weight"],
                  t[p + "attn_output_norm.bias"])
        ffn = mm(np_silu(mm(x, t[p + "ffn_gate.weight"]))
                 * mm(x, t[p + "ffn_up.weight"]), t[p + "ffn_down.weight"])
        x = np_ln(x + ffn, t[p + "layer_output_norm.weight"],
                  t[p + "layer_output_norm.bias"])
    check(ours, x)


def test_jina_bert_v2(tmp_path):
    """build_bert JINA_BERT_V2 branch: symmetric ALiBi, optional QK LayerNorm,
    gated-gelu FFN with down bias, optional attn_norm_2 re-add."""
    rng = rng_weights(112)
    t = {"token_embd.weight": w2(rng, V, C, 0.02),
         "token_types.weight": w2(rng, 2, C, 0.02),
         "token_embd_norm.weight": w1(rng, C, True),
         "token_embd_norm.bias": w1(rng, C)}
    for i in range(L):
        p = f"blk.{i}."
        for nm in ("attn_q", "attn_k", "attn_v"):
            t[p + nm + ".weight"] = w2(rng, H * D, C)
            t[p + nm + ".bias"] = w1(rng, H * D)
        t[p + "attn_output.weight"] = w2(rng, C, H * D)
        t[p + "attn_output.bias"] = w1(rng, C)
        t[p + "attn_output_norm.weight"] = w1(rng, C, True)
        t[p + "attn_output_norm.bias"] = w1(rng, C)
        t[p + "ffn_gate.weight"] = w2(rng, F, C)
        t[p + "ffn_up.weight"] = w2(rng, F, C)
        t[p + "ffn_down.weight"] = w2(rng, C, F)
        t[p + "ffn_down.bias"] = w1(rng, C)
        t[p + "layer_output_norm.weight"] = w1(rng, C, True)
        t[p + "layer_output_norm.bias"] = w1(rng, C)
    # layer 0: QK LayerNorm present; layer 1: attn_norm_2 present
    t["blk.0.attn_q_norm.weight"] = w1(rng, H * D, True)
    t["blk.0.attn_q_norm.bias"] = w1(rng, H * D)
    t["blk.0.attn_k_norm.weight"] = w1(rng, H * D, True)
    t["blk.0.attn_k_norm.bias"] = w1(rng, H * D)
    t["blk.1.attn_norm_2.weight"] = w1(rng, C, True)
    t["blk.1.attn_norm_2.bias"] = w1(rng, C)
    md = base_md("jina-bert-v2", n_kv=H, rms=False)
    md["jina-bert-v2.pooling_type"] = np.uint32(1)
    path = write_gguf(tmp_path / "jina.gguf", "jina-bert-v2", md, t)
    m, ours = run_embed(path)
    assert m.cfg.use_alibi and not m.cfg.use_rope

    x = (t["token_embd.weight"][TOKENS[0]] + t["token_types.weight"][0])
    x = np_ln(x, t["token_embd_norm.weight"], t["token_embd_norm.bias"])
    for i in range(L):
        p = f"blk.{i}."
        q = mm(x, t[p + "attn_q.weight"]) + t[p + "attn_q.bias"]
        k = mm(x, t[p + "attn_k.weight"]) + t[p + "attn_k.bias"]
        v = mm(x, t[p + "attn_v.weight"]) + t[p + "attn_v.bias"]
        if p + "attn_q_norm.weight" in t:
            q = np_ln(q, t[p + "attn_q_norm.weight"], t[p + "attn_q_norm.bias"])
            k = np_ln(k, t[p + "attn_k_norm.weight"], t[p + "attn_k_norm.bias"])
        a = np_attn(q.reshape(T, H, D), k.reshape(T, H, D), v.reshape(T, H, D),
                    D ** -0.5, causal=False, alibi_max=8.0,
                    sym_alibi=True).reshape(T, H * D)
        h = np_ln(x + mm(a, t[p + "attn_output.weight"])
                  + t[p + "attn_output.bias"],
                  t[p + "attn_output_norm.weight"],
                  t[p + "attn_output_norm.bias"])
        if p + "attn_norm_2.weight" in t:  # re-add the layer input (:11582)
            h = np_ln(h + x, t[p + "attn_norm_2.weight"],
                      t[p + "attn_norm_2.bias"])
        x = h
        ffn = mm(np_gelu_tanh(mm(x, t[p + "ffn_gate.weight"]))
                 * mm(x, t[p + "ffn_up.weight"]), t[p + "ffn_down.weight"]
                 ) + t[p + "ffn_down.bias"]
        x = np_ln(x + ffn, t[p + "layer_output_norm.weight"],
                  t[p + "layer_output_norm.bias"])
    check(ours, x)
