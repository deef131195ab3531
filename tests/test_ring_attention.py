"""Ring attention (sequence parallel) vs dense causal attention oracle."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from koboldcpp_tpu.parallel.ring_attention import ring_attention


def dense_causal(q, k, v, scale):
    H, Hkv = q.shape[2], k.shape[2]
    if Hkv != H:
        k = jnp.repeat(k, H // Hkv, axis=2)
        v = jnp.repeat(v, H // Hkv, axis=2)
    T = q.shape[1]
    s = jnp.einsum("bthd,bshd->bhts", q, k) * scale
    mask = jnp.tril(jnp.ones((T, T), bool))
    s = jnp.where(mask[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", p, v)


@pytest.mark.parametrize("hkv", [4, 2, 1])
def test_ring_matches_dense(hkv):
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide the 8-device CPU mesh"
    mesh = Mesh(np.array(devs[:8]), ("sp",))
    rng = np.random.default_rng(0)
    B, T, H, D = 2, 64, 4, 16
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, hkv, D)), jnp.float32)
    scale = D ** -0.5
    out = ring_attention(q, k, v, mesh, scale=scale)
    ref = dense_causal(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_jit_compiles_sharded():
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:8]), ("sp",))
    B, T, H, D = 1, 128, 2, 8
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k, v = q, q

    f = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh))
    out = f(q, k, v)
    ref = dense_causal(q, k, v, D ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
