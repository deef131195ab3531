"""On-device kernel parity: compiled Pallas kernels vs the XLA reference path.

The reference's upstream had `test-backend-ops` (every GPU backend cross-checked
against the CPU backend); the fork dropped it (SURVEY.md §4). This is our
equivalent for the real chip: every Pallas kernel family runs compiled
against its XLA/dequant reference and asserts tolerances. The pytest suite
runs the same kernels in interpret mode on CPU; this tool catches
Mosaic-compilation semantics drift that interpret mode cannot.

Usage: python tools/tpu_parity.py   (exit 0 = all parity checks pass)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FAILED = []


def check(name: str, got, want, tol: float):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = float(np.abs(got - want).max() / (np.abs(want).max() + 1e-6))
    ok = err < tol
    print(f"{'PASS' if ok else 'FAIL'}  {name}: rel err {err:.4g} "
          f"(tol {tol})", flush=True)
    if not ok:
        FAILED.append(name)


def quant_kernels():
    from koboldcpp_tpu.gguf import GGMLType, quants
    from koboldcpp_tpu.ops import linear, quant_matmul

    rng = np.random.default_rng(0)
    out_f, in_f = 512, 512
    for t in (GGMLType.Q4_K, GGMLType.Q6_K, GGMLType.Q8_0):
        w = (rng.standard_normal((out_f, in_f)) * 0.1).astype(np.float32)
        raw = quants.quantize(w, t)
        qt = linear.from_gguf(raw, t, (out_f, in_f), packed=True)
        wref = quants.dequantize(raw, t).reshape(out_f, in_f)
        for T in (1, 2, 4, 8, 300):
            x = (rng.standard_normal((T, in_f)) * 0.5).astype(np.float32)
            y = quant_matmul.matmul_packed(jnp.asarray(x, jnp.bfloat16), qt)
            if y is None:
                continue
            check(f"{t.name} T={T}", y, x @ wref.T, 0.02)


def flash_decode_batched():
    from koboldcpp_tpu.ops import flash_decode

    rng = np.random.default_rng(1)
    B, S, H, Hkv, D = 4, 512, 8, 2, 64
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv * D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv * D)), jnp.bfloat16)
    pos = np.array([0, 100, 255, 256], np.int32)
    out, k2, v2 = flash_decode.decode_attention_batched(
        q, kn, vn, k, v, jnp.asarray(pos), H, Hkv, D ** -0.5)
    kr = np.asarray(k).copy().reshape(B, S, Hkv, D)
    vr = np.asarray(v).copy().reshape(B, S, Hkv, D)
    for b in range(B):
        kr[b, pos[b]] = np.asarray(kn[b])
        vr[b, pos[b]] = np.asarray(vn[b])
    G = H // Hkv
    want = np.zeros((B, H, D), np.float32)
    for b in range(B):
        for h in range(H):
            kv = h // G
            sc = (np.asarray(q[b, h], np.float32)
                  @ kr[b, :, kv].astype(np.float32).T) * (D ** -0.5)
            sc[pos[b] + 1:] = -np.inf
            p = np.exp(sc - sc.max()); p /= p.sum()
            want[b, h] = p @ vr[b, :, kv].astype(np.float32)
    check("flash_decode_batched out", out, want, 0.04)
    check("flash_decode_batched k write",
          np.asarray(k2).reshape(B, S, Hkv, D), kr, 1e-6)
    check("flash_decode_batched v write",
          np.asarray(v2).reshape(B, S, Hkv, D), vr, 1e-6)


def flash_decode_paged():
    from koboldcpp_tpu.kv import paged
    from koboldcpp_tpu.ops import flash_decode

    rng = np.random.default_rng(2)
    B, H, Hkv, D, P, NP, MP = 4, 8, 2, 64, 64, 40, 8
    pcache = paged.init_paged_cache(1, NP, P, Hkv, D)
    table = jnp.asarray(
        rng.permutation(NP)[:B * MP].reshape(B, MP).astype(np.int32))
    positions = np.array([0, 5, 64, 333], np.int32)
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
    out, k2, v2 = flash_decode.decode_attention_paged(
        q, kn, vn, pcache.k[0], pcache.v[0], table, jnp.asarray(positions),
        H, Hkv, P, D ** -0.5)
    ref = paged.write(pcache, 0, table, jnp.asarray(positions)[:, None],
                      kn[:, None], vn[:, None])
    gk, gv = paged.gather(ref, 0, table)
    G = H // Hkv
    for b in range(B):
        p = int(positions[b])
        h = b % H
        kv = h // G
        ka = np.asarray(gk[b, :, kv], np.float32)
        va = np.asarray(gv[b, :, kv], np.float32)
        sc = (np.asarray(q[b, h], np.float32) @ ka.T) * (D ** -0.5)
        sc[p + 1:] = -np.inf
        pr = np.exp(sc - sc.max()); pr /= pr.sum()
        check(f"flash_decode_paged out b={b}", np.asarray(out)[b, h],
              pr @ va, 0.04)
    check("flash_decode_paged k write", k2, ref.k[0], 1e-6)
    check("flash_decode_paged v write", v2, ref.v[0], 1e-6)


def flash_prefill():
    from koboldcpp_tpu.models import llama

    rng = np.random.default_rng(3)
    B, T, H, Hkv, D = 2, 256, 8, 2, 64
    q = jnp.asarray(rng.standard_normal((B, T, H, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)) * 0.3, jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    out = llama.flash_prefill_attention(q, k, v, pos, D ** -0.5)
    mask = jnp.arange(T)[None, None, :] <= pos[:, :, None]
    want = llama.attention(q, k, v, mask, D ** -0.5)
    check("flash_prefill", out, want, 0.03)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    quant_kernels()
    flash_decode_batched()
    flash_decode_paged()
    flash_prefill()
    if FAILED:
        print(f"\n{len(FAILED)} FAILED: {FAILED}")
        sys.exit(1)
    print("\nALL PARITY CHECKS PASS")


if __name__ == "__main__":
    main()
