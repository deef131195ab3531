"""RWKV6 parity vs an independent numpy oracle + state-carry semantics +
the RWKV byte-trie tokenizer.

The oracle follows the official RWKV-LM v6 per-token inference formulation
(sequential, numpy) — independent of the JAX implementation's batched/scanned
formulation, so shared mistakes are unlikely.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.models import rwkv6 as jrwkv
from koboldcpp_tpu.models.loader import load_model

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_hf import convert_rwkv6_state_dict  # noqa: E402

C, H, D, E, E2, F, V, L = 32, 2, 16, 8, 8, 64, 96, 3
RESCALE = 2
CFG = dict(num_hidden_layers=L, hidden_size=C, head_size=D,
           intermediate_size=F, vocab_size=V, rescale_every=RESCALE,
           layer_norm_epsilon=1e-5)
TOKENS = np.array([[3, 17, 40, 8, 77, 2, 55]], dtype=np.int32)


def make_state(seed=0):
    rng = np.random.default_rng(seed)

    def r(*shape, scale=0.4):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    st = {"emb.weight": r(V, C), "blocks.0.ln0.weight": 1 + r(C, scale=0.1),
          "blocks.0.ln0.bias": r(C, scale=0.1),
          "ln_out.weight": 1 + r(C, scale=0.1), "ln_out.bias": r(C, scale=0.1),
          "head.weight": r(V, C)}
    for i in range(L):
        p = f"blocks.{i}."
        st |= {p + "ln1.weight": 1 + r(C, scale=0.1), p + "ln1.bias": r(C, scale=0.1),
               p + "ln2.weight": 1 + r(C, scale=0.1), p + "ln2.bias": r(C, scale=0.1)}
        for g in "xwkvrg":
            st[p + f"att.time_maa_{g}"] = r(C, scale=0.2)
        st |= {p + "att.time_maa_w1": r(C, 5 * E), p + "att.time_maa_w2": r(5, E, C),
               p + "att.time_decay": r(C, scale=0.5),
               p + "att.time_decay_w1": r(C, E2), p + "att.time_decay_w2": r(E2, C),
               p + "att.time_faaaa": r(H, D, scale=0.3),
               p + "att.key.weight": r(C, C), p + "att.value.weight": r(C, C),
               p + "att.receptance.weight": r(C, C), p + "att.gate.weight": r(C, C),
               p + "att.output.weight": r(C, C),
               p + "att.ln_x.weight": 1 + r(C, scale=0.1),
               p + "att.ln_x.bias": r(C, scale=0.1),
               p + "ffn.time_maa_k": r(C, scale=0.2), p + "ffn.time_maa_r": r(C, scale=0.2),
               p + "ffn.key.weight": r(F, C), p + "ffn.receptance.weight": r(C, C),
               p + "ffn.value.weight": r(C, F)}
    return st


def _ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def oracle_forward(st, tokens):
    """Official RWKV-LM v6 sequential inference, one token at a time."""
    T = len(tokens)
    x_seq = st["emb.weight"][tokens]
    x_seq = _ln(x_seq, st["blocks.0.ln0.weight"], st["blocks.0.ln0.bias"])
    att_prev = [np.zeros(C, np.float32) for _ in range(L)]
    ffn_prev = [np.zeros(C, np.float32) for _ in range(L)]
    wkv = [np.zeros((H, D, D), np.float32) for _ in range(L)]
    logits = []
    for t in range(T):
        x = x_seq[t].copy()
        for i in range(L):
            p = f"blocks.{i}."
            # fp16-style rescaling (reference pairs weight pre-division with
            # activation halving; Rwkv6Model converter + build_rwkv6)
            div = float(2 ** (i // RESCALE)) if RESCALE else 1.0
            xn = _ln(x, st[p + "ln1.weight"], st[p + "ln1.bias"])
            sx = att_prev[i] - xn
            att_prev[i] = xn.copy()
            xxx = xn + sx * st[p + "att.time_maa_x"]
            z = np.tanh(xxx @ st[p + "att.time_maa_w1"]).reshape(5, 1, E)
            z = np.einsum("gie,gec->gic", z, st[p + "att.time_maa_w2"]).reshape(5, C)
            mw, mk, mv, mr, mg = z
            xw = xn + sx * (st[p + "att.time_maa_w"] + mw)
            xk = xn + sx * (st[p + "att.time_maa_k"] + mk)
            xv = xn + sx * (st[p + "att.time_maa_v"] + mv)
            xr = xn + sx * (st[p + "att.time_maa_r"] + mr)
            xg = xn + sx * (st[p + "att.time_maa_g"] + mg)
            r = (st[p + "att.receptance.weight"] @ xr).reshape(H, 1, D)
            k = (st[p + "att.key.weight"] @ xk).reshape(H, D, 1)
            v = (st[p + "att.value.weight"] @ xv).reshape(H, 1, D)
            gate = st[p + "att.gate.weight"] @ xg
            gate = gate / (1 + np.exp(-gate))  # silu
            w = (st[p + "att.time_decay"]
                 + np.tanh(xw @ st[p + "att.time_decay_w1"])
                 @ st[p + "att.time_decay_w2"])
            w = np.exp(-np.exp(w)).reshape(H, D, 1)
            first = st[p + "att.time_faaaa"].reshape(H, D, 1)
            a = k @ v  # (H, D, D)
            out = (r @ (first * a + wkv[i])).reshape(H * D)  # (C,)
            wkv[i] = a + w * wkv[i]
            out = out.reshape(H, D)
            mu = out.mean(-1, keepdims=True)
            var = out.var(-1, keepdims=True)
            out = ((out - mu) / np.sqrt(var + 64e-5)).reshape(C)
            out = out * st[p + "att.ln_x.weight"] + st[p + "att.ln_x.bias"]
            out = (st[p + "att.output.weight"] / div) @ (out * gate)
            x = x + out

            xn2 = _ln(x, st[p + "ln2.weight"], st[p + "ln2.bias"])
            sx2 = ffn_prev[i] - xn2
            ffn_prev[i] = xn2.copy()
            xk2 = xn2 + sx2 * st[p + "ffn.time_maa_k"]
            xr2 = xn2 + sx2 * st[p + "ffn.time_maa_r"]
            rr = 1 / (1 + np.exp(-(st[p + "ffn.receptance.weight"] @ xr2)))
            kk = np.square(np.maximum(st[p + "ffn.key.weight"] @ xk2, 0))
            x = x + rr * ((st[p + "ffn.value.weight"] / div) @ kk)
            if RESCALE and (i + 1) % RESCALE == 0:
                x = x / 2
        xo = _ln(x, st["ln_out.weight"], st["ln_out.bias"])
        logits.append(st["head.weight"] @ xo)
    return np.stack(logits)


@pytest.fixture(scope="module")
def rwkv_pair(tmp_path_factory):
    from .test_model_forward import tiny_tokenizer_md

    st = make_state(7)
    path = str(tmp_path_factory.mktemp("rwkv6") / "rwkv6.gguf")
    convert_rwkv6_state_dict(st, CFG, path, tokenizer_md=tiny_tokenizer_md(V))
    return st, path


def test_rwkv6_oracle_parity(rwkv_pair):
    st, path = rwkv_pair
    ref = oracle_forward(st, TOKENS[0])
    m = load_model(path, packed=False, dtype=jnp.float32)
    assert m.cfg.is_recurrent and m.cfg.n_heads == H and m.cfg.head_dim == D
    assert m.cfg.extras["rescale_every"] == RESCALE
    state = jrwkv.init_state(m.cfg, 1)
    pos = jnp.broadcast_to(jnp.arange(TOKENS.shape[1]), TOKENS.shape).astype(jnp.int32)
    logits, _ = jrwkv.forward(m.params, m.cfg, jnp.asarray(TOKENS), pos, state)
    np.testing.assert_allclose(np.asarray(logits)[0], ref, rtol=2e-3, atol=2e-3)


def test_rwkv6_state_carry_and_padding(rwkv_pair):
    _, path = rwkv_pair
    m = load_model(path, packed=False, dtype=jnp.float32)
    toks = jnp.asarray(TOKENS)
    T = TOKENS.shape[1]
    pos = jnp.broadcast_to(jnp.arange(T), TOKENS.shape).astype(jnp.int32)
    full, full_state = jrwkv.forward(m.params, m.cfg, toks, pos,
                                     jrwkv.init_state(m.cfg, 1))

    # chunked with carried state == one-shot
    state = jrwkv.init_state(m.cfg, 1)
    outs = []
    for lo, hi in ((0, 4), (4, 6), (6, T)):
        logits, state = jrwkv.forward(m.params, m.cfg, toks[:, lo:hi],
                                      pos[:, lo:hi], state)
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), np.asarray(full),
                               rtol=2e-4, atol=2e-4)

    # right-padding must not perturb outputs or state
    pad = 3
    toks_p = jnp.concatenate([toks, jnp.zeros((1, pad), jnp.int32)], axis=1)
    pos_p = jnp.concatenate([pos, -jnp.ones((1, pad), jnp.int32)], axis=1)
    padded, pad_state = jrwkv.forward(m.params, m.cfg, toks_p, pos_p,
                                      jrwkv.init_state(m.cfg, 1))
    np.testing.assert_allclose(np.asarray(padded[:, :T]), np.asarray(full),
                               rtol=1e-5, atol=1e-5)
    for leaf, ref_leaf in ((pad_state.wkv, full_state.wkv),
                           (pad_state.att_shift, full_state.att_shift),
                           (pad_state.ffn_shift, full_state.ffn_shift)):
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref_leaf),
                                   rtol=1e-5, atol=1e-5)


def test_rwkv_tokenizer():
    """Greedy longest-match byte trie (llm_tokenizer_rwkv,
    llama-vocab.cpp:1429) incl. escaped-byte vocab entries."""
    from koboldcpp_tpu.tokenizers.rwkv import unescape_rwkv_token
    from koboldcpp_tpu.tokenizers import Tokenizer
    from koboldcpp_tpu.tokenizers.vocab import vocab_from_metadata

    assert unescape_rwkv_token(r"\xffab\n") == b"\xffab\n"
    assert unescape_rwkv_token(r"hello \\ world") == b"hello \\ world"

    tokens = ["<s>", "h", "e", "l", "o", " ", "he", "hell", "hello", "ll",
              r"\xe4\xb8\xad", "wo", "r", "d", "world"]
    md = {
        "tokenizer.ggml.model": "rwkv",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.token_type": np.array([3] + [1] * (len(tokens) - 1),
                                              np.int32),
        "tokenizer.ggml.bos_token_id": np.uint32(0),
        "tokenizer.ggml.eos_token_id": np.uint32(0),
        "tokenizer.ggml.add_bos_token": False,
    }
    tk = Tokenizer(vocab_from_metadata(md))
    ids = tk.encode("hello world", add_bos=False, add_eos=False)
    # greedy longest match: "hello", " ", "world"
    assert ids == [tokens.index("hello"), tokens.index(" "),
                   tokens.index("world")]
    assert tk.decode(ids) == "hello world"
    # multi-byte escaped token (Chinese 中) round-trips
    ids2 = tk.encode("中", add_bos=False, add_eos=False)
    assert ids2 == [10]
    assert tk.decode(ids2) == "中"


def test_rwkv6_engine_generate(rwkv_pair):
    from koboldcpp_tpu.engine.engine import Engine, GenParams
    from koboldcpp_tpu.sampling.samplers import SamplerParams

    _, path = rwkv_pair
    m = load_model(path, packed=False, dtype=jnp.float32)
    eng = Engine(m, max_context=64)
    assert eng.recurrent
    params = GenParams(max_length=6, sampler=SamplerParams(temperature=0.0),
                       use_default_badwordsids=True)
    r1 = eng.generate([3, 17, 40], params)
    assert len(r1.tokens) == 6
    # full-prefix extension reuses the state
    r2 = eng.generate(list(eng.context_tokens) + [8], params)
    assert eng.last_timings.prompt_tokens == 1
