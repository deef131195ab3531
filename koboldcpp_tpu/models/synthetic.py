"""Synthetic model builders for benches / compile checks (no weights on disk).

Packed QTensors are constructed directly from random bytes + small scales —
byte-layout-identical to GGUF-loaded weights, so kernels and benchmarks see
the real memory traffic without paying numpy quantization of billions of
parameters.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..gguf.constants import QK_K
from ..ops.linear import QTensor, dense
from .config import ModelConfig

TINYLLAMA_1_1B = ModelConfig(
    arch="llama", name="tinyllama-1.1b-synthetic",
    vocab_size=32000, hidden_size=2048, n_layers=22, n_heads=32, n_kv_heads=4,
    head_dim=64, intermediate_size=5632, max_position_embeddings=2048,
    rope_theta=10000.0, rope_dim=64,
)

LLAMA2_7B = ModelConfig(
    arch="llama", name="llama2-7b-synthetic",
    vocab_size=32000, hidden_size=4096, n_layers=32, n_heads=32, n_kv_heads=32,
    head_dim=128, intermediate_size=11008, max_position_embeddings=4096,
    rope_dim=128,
)

# BASELINE config-3 shape (Llama-2-13B: MHA, 40 layers)
LLAMA2_13B = ModelConfig(
    arch="llama", name="llama2-13b-synthetic",
    vocab_size=32000, hidden_size=5120, n_layers=40, n_heads=40, n_kv_heads=40,
    head_dim=128, intermediate_size=13824, max_position_embeddings=4096,
    rope_dim=128,
)

# BASELINE config-5 kernels-at-width evidence: the REAL Llama-2-70B layer
# shape (hidden 8192, 64-head GQA-8, ffn 28672) truncated to 8 layers so a
# TP=1 slice fits one chip's HBM — proves the packed-q4_k Pallas kernels at
# 70B width on real hardware (the 80-layer model is multi-chip by size).
LLAMA2_70B_SLICE8 = ModelConfig(
    arch="llama", name="llama2-70b-slice8-synthetic",
    vocab_size=32000, hidden_size=8192, n_layers=8, n_heads=64, n_kv_heads=8,
    head_dim=128, intermediate_size=28672, max_position_embeddings=4096,
    rope_dim=128,
)


def _rand_dense(rng, shape, scale=0.02, dtype=jnp.bfloat16) -> QTensor:
    return dense((rng.standard_normal(shape) * scale).astype(np.float32), dtype=dtype)


def _rand_q4k(rng, out_f: int, in_f: int) -> QTensor:
    """Synthetic Q4_K with the REAL scale structure (d per superblock x
    6-bit integer sub-scales), so every serving layout — including the SBQ
    sidecars the batched kernel needs — is exercised by the bench."""
    nsb = in_f // QK_K
    qs2 = rng.integers(0, 256, size=(out_f, in_f // 2), dtype=np.uint8)
    d = (rng.random((out_f, nsb), dtype=np.float32) * 6.3e-5)
    dmin = (rng.random((out_f, nsb), dtype=np.float32) * 6.3e-5)
    sc = rng.integers(0, 64, size=(out_f, nsb, 8)).astype(np.int32)
    mn6 = rng.integers(0, 64, size=(out_f, nsb, 8)).astype(np.int32)
    scale = (d[:, :, None] * sc).reshape(out_f, nsb * 8).astype(np.float32)
    mn = (dmin[:, :, None] * mn6).reshape(out_f, nsb * 8).astype(np.float32)
    s4 = scale.reshape(out_f, nsb, 2, 4)
    m4 = mn.reshape(out_f, nsb, 2, 4)
    s_lo = s4[:, :, 0].reshape(out_f, nsb * 4)
    s_hi = s4[:, :, 1].reshape(out_f, nsb * 4)
    m_lo = m4[:, :, 0].reshape(out_f, nsb * 4)
    m_hi = m4[:, :, 1].reshape(out_f, nsb * 4)
    sci = sc.reshape(out_f, nsb, 2, 4)
    scp = (16 * (sci >> 3) + (sci & 7)).astype(np.int8)
    return QTensor(kind="q4_k", shape=(out_f, in_f), data={
        "qs2": jnp.asarray(qs2),
        "min": jnp.asarray(mn, dtype=jnp.bfloat16),
        "scale_lo": jnp.asarray(s_lo, dtype=jnp.bfloat16),
        "scale_hi": jnp.asarray(s_hi, dtype=jnp.bfloat16),
        "slo_t": jnp.asarray(s_lo.T, dtype=jnp.bfloat16),
        "shi_t": jnp.asarray(s_hi.T, dtype=jnp.bfloat16),
        "mlo_t": jnp.asarray(m_lo.T, dtype=jnp.bfloat16),
        "mhi_t": jnp.asarray(m_hi.T, dtype=jnp.bfloat16),
        "scp_lo": jnp.asarray(scp[:, :, 0].reshape(out_f, nsb * 4)),
        "scp_hi": jnp.asarray(scp[:, :, 1].reshape(out_f, nsb * 4)),
        "d_sbt": jnp.asarray(d.T.copy(), dtype=jnp.float32),
    })


def _rand_q6k(rng, out_f: int, in_f: int) -> QTensor:
    nsb = in_f // QK_K
    ql = rng.integers(0, 256, size=(out_f, nsb * 128), dtype=np.uint8)
    qh = rng.integers(0, 256, size=(out_f, nsb * 64), dtype=np.uint8)
    scale = (rng.random((out_f, nsb * 16), dtype=np.float32) * 0.002).astype(np.float32)
    ql5 = ql.reshape(out_f, nsb, 2, 2, 32)
    ql2 = np.concatenate([ql5[:, :, :, 0, :].reshape(out_f, -1),
                          ql5[:, :, :, 1, :].reshape(out_f, -1)], axis=1)
    s5 = scale.reshape(out_f, nsb, 2, 4, 2)
    scale_p = np.concatenate([s5[:, :, :, j, :].reshape(out_f, -1)
                              for j in range(4)], axis=1)
    return QTensor(kind="q6_k", shape=(out_f, in_f), data={
        "ql": jnp.asarray(ql),
        "qh": jnp.asarray(qh),
        "scale": jnp.asarray(scale, dtype=jnp.bfloat16),
        "ql2": jnp.asarray(ql2),
        "qh2": jnp.asarray(qh),
        "scale_p": jnp.asarray(scale_p, dtype=jnp.bfloat16),
        "scale_pt": jnp.asarray(scale_p.T, dtype=jnp.bfloat16),
    })


def _rand_q8_0(rng, out_f: int, in_f: int) -> QTensor:
    scale = (rng.random((out_f, in_f // 32), dtype=np.float32) * 0.002
             ).astype(np.float32)
    return QTensor(kind="q8_0", shape=(out_f, in_f), data={
        "q": jnp.asarray(rng.integers(-127, 128, size=(out_f, in_f), dtype=np.int8)),
        "scale": jnp.asarray(scale, dtype=jnp.bfloat16),
        "scale_t": jnp.asarray(scale.T, dtype=jnp.bfloat16),
    })


def _rand_q4k_i8(rng, out_f: int, in_f: int) -> QTensor:
    nsb = in_f // QK_K
    return QTensor(kind="q4_k_i8", shape=(out_f, in_f), data={
        "q": jnp.asarray(rng.integers(0, 16, size=(out_f, in_f), dtype=np.int8)),
        "scale": jnp.asarray(
            (rng.random((out_f, nsb * 8), dtype=np.float32) * 0.004), dtype=jnp.bfloat16),
        "min": jnp.asarray(
            (rng.random((out_f, nsb * 8), dtype=np.float32) * 0.004), dtype=jnp.bfloat16),
    })


def _rand_q2k(rng, out_f: int, in_f: int) -> QTensor:
    """Direct random q2_k fields (byte-layout-identical to pack_q2_k output,
    values random) — avoids running the exact numpy quantizer per tensor
    (ADVICE r1: the vocab x hidden head made synthetic builds slow)."""
    nsb = in_f // QK_K
    scale_p = (rng.random((out_f, nsb * 16), dtype=np.float32) * 0.02
               ).astype(np.float32)
    min_p = (rng.random((out_f, nsb * 16), dtype=np.float32) * 0.02
             ).astype(np.float32)
    return QTensor(kind="q2_k", shape=(out_f, in_f), data={
        "qs2": jnp.asarray(rng.integers(0, 256, size=(out_f, in_f // 4),
                                        dtype=np.uint8)),
        "scale_p": jnp.asarray(scale_p, dtype=jnp.bfloat16),
        "min_p": jnp.asarray(min_p, dtype=jnp.bfloat16),
        "scale_pt": jnp.asarray(scale_p.T, dtype=jnp.bfloat16),
        "min_pt": jnp.asarray(min_p.T, dtype=jnp.bfloat16),
    })


def _rand_q3k(rng, out_f: int, in_f: int) -> QTensor:
    nsb = in_f // QK_K
    scale_p = ((rng.random((out_f, nsb * 16), dtype=np.float32) - 0.5) * 0.04
               ).astype(np.float32)
    return QTensor(kind="q3_k", shape=(out_f, in_f), data={
        "qs2": jnp.asarray(rng.integers(0, 256, size=(out_f, in_f // 4),
                                        dtype=np.uint8)),
        "hm2": jnp.asarray(rng.integers(0, 16, size=(out_f, in_f // 4),
                                        dtype=np.uint8)),
        "scale_p": jnp.asarray(scale_p, dtype=jnp.bfloat16),
        "scale_pt": jnp.asarray(scale_p.T, dtype=jnp.bfloat16),
    })


def _rand_q6k_i8f(rng, out_f: int, in_f: int) -> QTensor:
    scale = (rng.random((out_f, in_f // 16), dtype=np.float32) * 0.002)
    return QTensor(kind="q6_k_i8f", shape=(out_f, in_f), data={
        "q": jnp.asarray(rng.integers(-32, 32, (out_f, in_f), dtype=np.int8)),
        "scale": jnp.asarray(scale, dtype=jnp.bfloat16),
        "scale_t": jnp.asarray(scale.T, dtype=jnp.bfloat16),
    })


def _rand_q3k_n4(rng, out_f: int, in_f: int) -> QTensor:
    scale = ((rng.random((out_f, in_f // 16), dtype=np.float32) - 0.5) * 0.04)
    return QTensor(kind="q3_k_n4", shape=(out_f, in_f), data={
        "q": jnp.asarray((rng.integers(0, 8, (out_f, in_f // 2))
                          | (rng.integers(0, 8, (out_f, in_f // 2)) << 4)
                          ).astype(np.uint8)),  # nibble values 0..7
        "scale": jnp.asarray(scale, dtype=jnp.bfloat16),
        "scale_t": jnp.asarray(scale.T, dtype=jnp.bfloat16),
    })


def _rand_q2k_n4(rng, out_f: int, in_f: int) -> QTensor:
    scale = (rng.random((out_f, in_f // 16), dtype=np.float32) * 0.02)
    mn = (rng.random((out_f, in_f // 16), dtype=np.float32) * 0.02)
    q = (rng.integers(0, 4, (out_f, in_f // 2))
         | (rng.integers(0, 4, (out_f, in_f // 2)) << 4)).astype(np.uint8)
    return QTensor(kind="q2_k_n4", shape=(out_f, in_f), data={
        "q": jnp.asarray(q),
        "scale": jnp.asarray(scale, dtype=jnp.bfloat16),
        "scale_t": jnp.asarray(scale.T, dtype=jnp.bfloat16),
        "min": jnp.asarray(mn, dtype=jnp.bfloat16),
        "min_t": jnp.asarray(mn.T, dtype=jnp.bfloat16),
    })


_MAKERS = {"q4_k": _rand_q4k, "q4_k_i8": _rand_q4k_i8, "q6_k": _rand_q6k,
           "q8_0": _rand_q8_0, "q2_k": _rand_q2k, "q3_k": _rand_q3k,
           "q6_k_i8f": _rand_q6k_i8f, "q3_k_n4": _rand_q3k_n4,
           "q2_k_n4": _rand_q2k_n4}


_PARAM_CACHE: dict = {}  # single entry; KCPP_SYNTH_CACHE=1 (bench 13B path)


def synthetic_params(cfg: ModelConfig, kind: str = "q4_k", seed: int = 0) -> dict:
    """Build a full llama params pytree with synthetic weights.

    kind: "dense" | "q4_k" | "q6_k" | "q8_0" for the big matmul weights
    (embeddings and norms stay dense, mirroring the GGUF loader).

    KCPP_SYNTH_CACHE=1 memoizes the LAST build (13B-class generation is
    ~80 s of host rng + upload; the bench's 13B subprocess reuses one param
    set across its decode/16K/8K sections)."""
    import os

    key = (cfg.name, kind, seed)
    if os.environ.get("KCPP_SYNTH_CACHE") == "1" and key in _PARAM_CACHE:
        return _PARAM_CACHE[key]
    rng = np.random.default_rng(seed)
    C, F = cfg.hidden_size, cfg.intermediate_size
    qdim = cfg.n_heads * cfg.head_dim
    kvdim = cfg.n_kv_heads * cfg.head_dim

    def big(out_f, in_f):
        if kind == "dense" or in_f % QK_K or out_f % 8:
            return _rand_dense(rng, (out_f, in_f))
        return _MAKERS[kind](rng, out_f, in_f)

    def norm():
        return jnp.asarray(np.ones(C, np.float32) + rng.standard_normal(C).astype(np.float32) * 0.01)

    params: dict = {
        "tok_embd": _rand_dense(rng, (cfg.vocab_size, C)),
        "output_norm": norm(),
        "output": big(cfg.vocab_size, C),
        "layers": [],
    }
    fused = kind != "dense"  # match the loader's fused-projection layout
    for _ in range(cfg.n_layers):
        layer = {
            "attn_norm": norm(),
            "wo": big(C, qdim),
            "ffn_norm": norm(),
            "w_down": big(C, F),
        }
        if fused:
            layer["wqkv"] = big(qdim + 2 * kvdim, C)
            layer["w_gateup"] = big(2 * F, C)
        else:
            layer.update(wq=big(qdim, C), wk=big(kvdim, C), wv=big(kvdim, C),
                         w_gate=big(F, C), w_up=big(F, C))
        params["layers"].append(layer)
    if os.environ.get("KCPP_SYNTH_CACHE") == "1":
        _PARAM_CACHE.clear()  # single entry: evict so two model sizes
        #                       never sit in HBM together
        _PARAM_CACHE[key] = params
    return params
