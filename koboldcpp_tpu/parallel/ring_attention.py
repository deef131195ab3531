"""Ring attention: sequence-parallel causal attention over a mesh axis.

TPU-native long-context scaling (SURVEY.md §5.7): the sequence axis is
sharded across devices; K/V blocks rotate around the ring via `ppermute`
(one ICI hop per step) while each device keeps its Q block and accumulates
the softmax online (flash-attention style running max/denominator). After
axis_size steps every Q block has attended to the full sequence without any
device ever holding more than T/n keys.

This replaces the reference's single-device long-context path (the reference
has no sequence parallelism; its RPC backend splits by layer, not sequence).
Communication: each step moves 2*B*(T/n)*Hkv*D bytes over ICI, fully
overlapped by XLA with the local attention compute.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

_NEG = -1e30  # finite "-inf": fully-masked blocks decay to exp(_NEG - m) == 0


def _block_attn(q, k, v, mask, scale):
    """One Q-block x K-block attention with explicit mask.
    q: (B,T,H,D) k/v: (B,S,H,D) mask: (T,S) -> (scores-max, exp-sums, pv)."""
    s = jnp.einsum("bthd,bshd->bhts", q, k) * scale
    s = jnp.where(mask[None, None], s, _NEG)
    return s


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, axis: str = "sp",
                   scale: float | None = None) -> jnp.ndarray:
    """Causal self-attention with the sequence sharded over `axis`.

    q: (B, T, H, D), k/v: (B, T, Hkv, D); T must divide by the axis size.
    Returns (B, T, H, D) with the same sequence sharding.
    """
    B, T, H, D = q.shape
    Hkv = k.shape[2]
    if scale is None:
        scale = D ** -0.5

    def body(q, k, v):
        idx = lax.axis_index(axis)
        n = lax.psum(1, axis_name=axis)  # static: mesh axis size
        n_static = mesh.shape[axis]
        Tl = q.shape[1]
        if Hkv != H:  # GQA: expand kv heads to query heads
            rep = H // Hkv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        q_pos = idx * Tl + jnp.arange(Tl)

        o = jnp.zeros((B, H, Tl, D), jnp.float32)
        m = jnp.full((B, H, Tl), _NEG, jnp.float32)
        l = jnp.zeros((B, H, Tl), jnp.float32)
        perm = [(i, (i + 1) % n_static) for i in range(n_static)]
        for s_i in range(n_static):
            kv_idx = (idx - s_i) % n
            k_pos = kv_idx * Tl + jnp.arange(Tl)
            mask = q_pos[:, None] >= k_pos[None, :]
            s = _block_attn(q.astype(jnp.float32), k.astype(jnp.float32),
                            v, mask, scale)  # (B,H,Tl,Tl)
            m_new = jnp.maximum(m, s.max(axis=-1))
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l = l * corr + p.sum(axis=-1)
            o = o * corr[..., None] + jnp.einsum(
                "bhts,bshd->bhtd", p, v.astype(jnp.float32))
            m = m_new
            if s_i != n_static - 1:  # rotate K/V one hop around the ring
                k = lax.ppermute(k, axis_name=axis, perm=perm)
                v = lax.ppermute(v, axis_name=axis, perm=perm)
        o = o / jnp.maximum(l[..., None], 1e-30)
        return o.transpose(0, 2, 1, 3).astype(q.dtype)  # (B,Tl,H,D)

    spec = P(None, axis, None, None)
    return shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_rep=False)(q, k, v)


def sp_attention_sharded(q, k, v, mesh, axis="sp", scale=None):
    """Convenience wrapper: device_put with sequence sharding then ring."""
    sharding = jax.sharding.NamedSharding(mesh, P(None, axis, None, None))
    q, k, v = (jax.device_put(x, sharding) for x in (q, k, v))
    return ring_attention(q, k, v, mesh, axis=axis, scale=scale)
