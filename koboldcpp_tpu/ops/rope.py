"""Rotary position embeddings, ggml conventions.

Two layouts exist in GGUF-land (reference: ggml rope modes, used per-arch by
the graph builders in /root/reference/src/llama.cpp):
  - "norm": rotate adjacent element pairs (x[2i], x[2i+1])  — llama family
  - "neox": rotate split halves (x[i], x[i + d/2])          — neox/qwen/gemma...
Linear and YaRN frequency scaling supported.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig


def gradientai_rope_base(base: float, head_dim: int, n_ctx_new: int,
                         n_ctx_train: int, solar: bool = False) -> float:
    """NTK-aware automatic rope base ("GradientAI formula"), counterpart of
    CalcGradientAIRopeFreqBase (/root/reference/gpttype_adapter.cpp:1598):
    base' = base ^ (log(chi_new) / log(chi_train)), chi = ctx / (2*pi)."""
    if n_ctx_new <= n_ctx_train or n_ctx_train <= 0:
        return base
    chi_train = n_ctx_train / (2 * math.pi)
    chi_new = (n_ctx_new * (8.0 if solar else 1.0)) / (2 * math.pi)
    if chi_train <= 1.0:
        return base
    return float(base ** (math.log(chi_new) / math.log(chi_train)))


def rope_frequencies(cfg: ModelConfig) -> jnp.ndarray:
    """Per-pair inverse frequencies, with linear / yarn scaling. Shape (rot/2,)."""
    d = cfg.rope_dim
    freqs = cfg.rope_theta ** (-jnp.arange(0, d // 2, dtype=jnp.float32) * 2.0 / d)
    if cfg.rope_scaling_type == "linear" and cfg.rope_scaling_factor != 1.0:
        freqs = freqs / cfg.rope_scaling_factor
    elif cfg.rope_scaling_type == "yarn" and cfg.rope_scaling_factor != 1.0 and cfg.rope_orig_ctx:
        # YaRN: NTK-by-parts interpolation between scaled and unscaled freqs
        lo_rot, hi_rot = 32.0, 1.0  # beta_fast/beta_slow defaults
        def corr_dim(n_rot):
            return (d * math.log(cfg.rope_orig_ctx / (n_rot * 2 * math.pi))) / (
                2 * math.log(cfg.rope_theta))
        low = max(0.0, math.floor(corr_dim(lo_rot)))
        high = min(d / 2.0 - 1, math.ceil(corr_dim(hi_rot)))
        dims = jnp.arange(d // 2, dtype=jnp.float32)
        ramp = jnp.clip((dims - low) / max(high - low, 1e-3), 0.0, 1.0)
        interp = freqs / cfg.rope_scaling_factor
        freqs = interp * (1 - ramp) + freqs * ramp
    return freqs


def yarn_attn_scale(cfg: ModelConfig) -> float:
    if cfg.rope_scaling_type == "yarn" and cfg.rope_scaling_factor != 1.0:
        return float(cfg.rope_attn_factor * (1.0 + 0.1 * math.log(cfg.rope_scaling_factor)))
    return 1.0


@partial(jax.jit, static_argnames=("rope_type", "rot_dim"))
def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, freqs: jnp.ndarray,
               rope_type: str = "norm", rot_dim: int | None = None,
               mscale: float = 1.0) -> jnp.ndarray:
    """x: (..., T, H, D); positions: (..., T) int32. Rotates first rot_dim dims."""
    d = x.shape[-1]
    rot = rot_dim or d
    angles = positions[..., None].astype(jnp.float32) * freqs  # (..., T, rot/2)
    cos = jnp.cos(angles)[..., None, :] * mscale  # (..., T, 1, rot/2)
    sin = jnp.sin(angles)[..., None, :] * mscale
    xf = x.astype(jnp.float32)
    if rope_type == "neox":
        x1 = xf[..., : rot // 2]
        x2 = xf[..., rot // 2: rot]
        r1 = x1 * cos - x2 * sin
        r2 = x1 * sin + x2 * cos
        rotated = jnp.concatenate([r1, r2], axis=-1)
    else:  # "norm": adjacent pairs
        xr = xf[..., :rot].reshape(xf.shape[:-1] + (rot // 2, 2))
        x1 = xr[..., 0]
        x2 = xr[..., 1]
        r1 = x1 * cos - x2 * sin
        r2 = x1 * sin + x2 * cos
        rotated = jnp.stack([r1, r2], axis=-1).reshape(xf.shape[:-1] + (rot,))
    if rot < d:
        rotated = jnp.concatenate([rotated, xf[..., rot:]], axis=-1)
    return rotated.astype(x.dtype)
