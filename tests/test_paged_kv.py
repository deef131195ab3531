"""Paged KV cache: write/gather round-trip, allocator, Q8 quantized mode,
and equivalence with the contiguous cache in a real forward pass."""
import numpy as np
import pytest
import jax.numpy as jnp

from koboldcpp_tpu.kv.paged import (
    PageAllocator, gather, init_paged_cache, write)


def test_write_gather_roundtrip():
    rng = np.random.default_rng(0)
    cache = init_paged_cache(n_layers=2, n_pages=8, page_size=4,
                             n_kv_heads=2, head_dim=8)
    # slot 0 uses pages [3, 5]; write 6 tokens
    table = jnp.asarray(np.array([[3, 5, 0]], dtype=np.int32))
    k = jnp.asarray(rng.standard_normal((1, 6, 2, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 6, 2, 8)).astype(np.float32))
    pos = jnp.arange(6)[None, :]
    cache = write(cache, 0, table, pos, k, v)
    gk, gv = gather(cache, 0, table)
    assert gk.shape == (1, 12, 2, 8)
    np.testing.assert_allclose(np.asarray(gk[0, :6], dtype=np.float32),
                               np.asarray(k[0], dtype=np.float32), atol=1e-2)
    np.testing.assert_allclose(np.asarray(gv[0, :6], dtype=np.float32),
                               np.asarray(v[0], dtype=np.float32), atol=1e-2)


def test_padding_positions_dropped():
    cache = init_paged_cache(1, 4, 4, 1, 4)
    table = jnp.asarray(np.array([[1, 2]], dtype=np.int32))
    k = jnp.ones((1, 3, 1, 4))
    pos = jnp.asarray(np.array([[-1, 0, 1]], dtype=np.int32))
    cache = write(cache, 0, table, pos, k, k)
    gk, _ = gather(cache, 0, table)
    assert float(gk[0, 0].sum()) == 4.0  # position 0 written once
    assert float(np.asarray(gk).sum()) == 8.0  # only two tokens written


def test_q8_mode_accuracy():
    rng = np.random.default_rng(1)
    cache = init_paged_cache(1, 4, 8, 2, 16, quantized=True)
    table = jnp.asarray(np.array([[0, 1]], dtype=np.int32))
    k = jnp.asarray(rng.standard_normal((1, 10, 2, 16)).astype(np.float32) * 3)
    pos = jnp.arange(10)[None, :]
    cache = write(cache, 0, table, pos, k, k)
    gk, gv = gather(cache, 0, table)
    got = np.asarray(gk[0, :10], dtype=np.float32)
    want = np.asarray(k[0], dtype=np.float32)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.02  # int8 + per-head scale
    assert cache.k[0].dtype == jnp.int8


def test_allocator():
    a = PageAllocator(n_pages=6, page_size=4, max_pages_per_slot=3)
    p0 = a.ensure(0, 5)   # 2 pages
    p1 = a.ensure(1, 4)   # 1 page
    assert len(p0) == 2 and len(p1) == 1
    assert a.n_free == 3
    assert set(p0) != set(p1)
    a.ensure(0, 12)       # grow to 3
    assert len(a.slot_pages[0]) == 3
    with pytest.raises(MemoryError):
        a.ensure(0, 16)   # > max_pages
    a.trim(0, 4)
    assert len(a.slot_pages[0]) == 1 and a.n_free == 4
    a.release(1)
    assert a.n_free == 5
    t = a.table(0)
    assert t.shape == (3,) and t[0] == p0[0]


def test_pool_exhaustion():
    a = PageAllocator(n_pages=2, page_size=4, max_pages_per_slot=4)
    a.ensure(0, 8)
    with pytest.raises(MemoryError):
        a.ensure(1, 4)


def test_paged_attention_matches_contiguous():
    """Full-model check: attention over gathered pages == contiguous cache."""
    from koboldcpp_tpu.kv.cache import init_cache, write as cwrite
    from koboldcpp_tpu.models import llama
    from koboldcpp_tpu.models.config import ModelConfig

    rng = np.random.default_rng(2)
    B, T, H, D, S = 1, 6, 2, 8, 16
    k = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, T, 4, D)).astype(np.float32))
    pos = jnp.arange(T)[None, :]
    mask = jnp.arange(S)[None, None, :] <= pos[:, :, None]

    from koboldcpp_tpu.kv.cache import read as cread

    ccache = init_cache(1, B, S, H, D, dtype=jnp.float32)
    ccache = cwrite(ccache, 0, pos, k, v)
    ck, cv = cread(ccache, 0)
    ref = llama.attention(q, ck, cv, mask, 0.35)

    pcache = init_paged_cache(1, 8, 4, H, D)
    table = jnp.asarray(np.array([[2, 5, 1, 7]], dtype=np.int32))
    pcache = write(pcache, 0, table, pos, k, v)
    gk, gv = gather(pcache, 0, table)
    got = llama.attention(q, gk.astype(jnp.float32), gv.astype(jnp.float32),
                          mask, 0.35)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-2, atol=1e-2)


def test_q4_mode_accuracy():
    """Q4 plane-split packed mode (--quantkv 2 + --paged): round-trip within
    4-bit noise, pools half the q8 width."""
    rng = np.random.default_rng(3)
    cache = init_paged_cache(1, 4, 8, 2, 16, quantized="q4")
    table = jnp.asarray(np.array([[0, 1]], dtype=np.int32))
    k = jnp.asarray(rng.standard_normal((1, 10, 2, 16)).astype(np.float32) * 3)
    pos = jnp.arange(10)[None, :]
    cache = write(cache, 0, table, pos, k, k)
    gk, gv = gather(cache, 0, table)
    got = np.asarray(gk[0, :10], dtype=np.float32)
    want = np.asarray(k[0], dtype=np.float32)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.12  # 4-bit + per-head scale
    assert cache.k[0].dtype == jnp.uint8
    assert cache.k[0].shape[-1] == 16  # (H*D)//2
    assert cache.bits == 4


def test_q4_quantize_plane_split_layout():
    """Byte i packs (elem i) | (elem i+D//2 << 4), per head."""
    from koboldcpp_tpu.kv.paged import _quantize_q4

    # amax = 7 -> scale exactly 1.0: no rounding ambiguity, pure layout test
    x = jnp.asarray(np.array([[1.0, 2.0, 3.0, -4.0, 7.0, -7.0, 5.0, 6.0]],
                             np.float32))  # (1, D=8)
    packed, scale = _quantize_q4(x)
    assert float(scale[0]) == 1.0
    q = np.asarray(x)[0].astype(np.int64) + 8
    want = q[:4] | (q[4:] << 4)
    np.testing.assert_array_equal(np.asarray(packed)[0],
                                  want.astype(np.uint8))
