"""Recurrent state cache for SSM/RWKV-style models.

Counterpart of llama.cpp's recurrent-mode KV cache (the `recurrent` flag at
/root/reference/src/llama.cpp:2775: Mamba/RWKV "(ab)use the KV cache to store
the states", llm_build_mamba /root/reference/src/llama.cpp:9749). Instead of a
ring of cells we keep fixed-shape per-layer state arrays; the engine enforces
the reference's full-prefix-match rule for reuse (ContextFastForward's
model_adapter.cpp:424 recurrent branch) since a recurrent state cannot be
rewound or spliced.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass, data_fields=["conv", "ssm"],
         meta_fields=[])
@dataclass
class MambaState:
    """conv: (L, B, d_inner, d_conv-1) rolling conv inputs;
    ssm: (L, B, d_inner, d_state) selective-scan hidden state.
    Both f32 — the reference forces F32 states (llama.cpp:19351-19352)."""

    conv: jnp.ndarray
    ssm: jnp.ndarray

    @property
    def batch(self) -> int:
        return self.conv.shape[1]


def init_mamba_state(n_layers: int, batch: int, d_inner: int, d_conv: int,
                     d_state: int) -> MambaState:
    return MambaState(
        conv=jnp.zeros((n_layers, batch, d_inner, d_conv - 1), jnp.float32),
        ssm=jnp.zeros((n_layers, batch, d_inner, d_state), jnp.float32))


@partial(jax.tree_util.register_dataclass,
         data_fields=["att_shift", "ffn_shift", "wkv"], meta_fields=[])
@dataclass
class RWKVState:
    """RWKV6 per-layer state: token-shift carries for time-mix and
    channel-mix (last hidden row each), and the per-head WKV matrix state
    (llm_build_rwkv6_time_mix wkv_state, /root/reference/src/llama.cpp:9857)."""

    att_shift: jnp.ndarray  # (L, B, n_embd)
    ffn_shift: jnp.ndarray  # (L, B, n_embd)
    wkv: jnp.ndarray        # (L, B, H, D, D) f32

    @property
    def batch(self) -> int:
        return self.att_shift.shape[1]


def init_rwkv_state(n_layers: int, batch: int, n_embd: int, n_heads: int,
                    head_dim: int) -> RWKVState:
    return RWKVState(
        att_shift=jnp.zeros((n_layers, batch, n_embd), jnp.float32),
        ffn_shift=jnp.zeros((n_layers, batch, n_embd), jnp.float32),
        wkv=jnp.zeros((n_layers, batch, n_heads, head_dim, head_dim),
                      jnp.float32))


@partial(jax.tree_util.register_dataclass,
         data_fields=["att_shift", "ffn_shift", "aa", "bb", "pp"],
         meta_fields=[])
@dataclass
class RWKV4State:
    """RWKV v4 per-layer state, mirroring the reference's 5 x n_embed layout
    (rwkv_init_state, /root/reference/otherarch/rwkv_v3.cpp:1767: ffn_xx,
    att_xx, aa, bb, pp): token-shift carries for time-mix and channel-mix,
    and the numerically-stabilized wkv accumulators (aa = numerator,
    bb = denominator, pp = running max exponent, init -1e30F)."""

    att_shift: jnp.ndarray  # (L, B, n_embd)
    ffn_shift: jnp.ndarray  # (L, B, n_embd)
    aa: jnp.ndarray         # (L, B, n_embd) f32
    bb: jnp.ndarray         # (L, B, n_embd) f32
    pp: jnp.ndarray         # (L, B, n_embd) f32

    @property
    def batch(self) -> int:
        return self.att_shift.shape[1]


def init_rwkv4_state(n_layers: int, batch: int, n_embd: int) -> RWKV4State:
    # four distinct buffers: the engine jits with donate_argnames=("cache",)
    # and XLA rejects donating one buffer twice
    def z():
        return jnp.zeros((n_layers, batch, n_embd), jnp.float32)

    return RWKV4State(att_shift=z(), ffn_shift=z(), aa=z(), bb=z(),
                      pp=jnp.full((n_layers, batch, n_embd), -1e30,
                                  jnp.float32))
