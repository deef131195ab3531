"""Stable Diffusion 1.x in JAX: CLIP text encoder + UNet + VAE + samplers.

TPU-native counterpart of the reference's stable-diffusion.cpp fork
(/root/reference/otherarch/sdcpp/, adapter sdtype_adapter.cpp: samplers list
:41-58, generation :276): txt2img / img2img behind the A1111 API. Weights load
from our GGUF container (tools/convert_sd.py maps diffusers-format
checkpoints); params follow diffusers tensor naming.

All blocks run in NHWC (TPU conv-friendly); attention over flattened spatial.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFReader

Params = dict[str, Any]


@dataclass
class SDConfig:
    # UNet
    in_channels: int = 4
    model_channels: int = 320
    channel_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_levels: tuple[int, ...] = (0, 1, 2)  # levels with cross-attn
    n_heads: int = 8
    context_dim: int = 768
    # CLIP text
    text_vocab: int = 49408
    text_ctx: int = 77
    text_dim: int = 768
    text_layers: int = 12
    text_heads: int = 12
    # SDXL extensions (otherarch/sdcpp supports SD1.x/2.x/SDXL; these knobs
    # cover the XL UNet + dual text encoders)
    transformer_depth: tuple[int, ...] = ()  # per level; () = depth 1
    attn_head_dim: int = 0    # XL: heads = channels // 64
    linear_proj: bool = False  # XL use_linear_projection
    add_embed_dim: int = 0    # XL add_embedding in-dim (pooled + 6*256 = 2816)
    pooled_dim: int = 0       # XL pooled text dim (1280)
    text2_dim: int = 0        # OpenCLIP-bigG tower
    text2_layers: int = 0
    text2_heads: int = 0
    # VAE
    vae_ch: int = 128
    vae_ch_mult: tuple[int, ...] = (1, 2, 4, 4)
    latent_channels: int = 4
    scale_factor: float = 0.18215


# ---------------------------------------------------------------------------
# primitive blocks (diffusers tensor naming)
# ---------------------------------------------------------------------------

def group_norm(x, weight, bias, groups=32, eps=1e-5):
    """x: (B, H, W, C)."""
    B, H, W, C = x.shape
    g = min(groups, C)
    xf = x.astype(jnp.float32).reshape(B, H * W, g, C // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(B, H, W, C)
    return (xf * weight + bias).astype(x.dtype)


def conv2d(x, p, name, stride=1, padding=1):
    w = p[name + ".weight"]  # (O, I, kh, kw) torch layout
    y = jax.lax.conv_general_dilated(
        x, w.transpose(2, 3, 1, 0), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p[name + ".bias"]


def linear(x, p, name):
    y = jnp.einsum("...c,oc->...o", x, p[name + ".weight"],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if name + ".bias" in p:
        y = y + p[name + ".bias"]
    return y


def timestep_embedding(t, dim):
    half = dim // 2
    freqs = jnp.exp(-math.log(10000) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def resnet_block(x, temb, p, pre):
    h = group_norm(x, p[pre + "norm1.weight"], p[pre + "norm1.bias"])
    h = conv2d(jax.nn.silu(h), p, pre + "conv1")
    if pre + "time_emb_proj.weight" in p:
        h = h + linear(jax.nn.silu(temb), p, pre + "time_emb_proj")[:, None, None, :]
    h = group_norm(h, p[pre + "norm2.weight"], p[pre + "norm2.bias"])
    h = conv2d(jax.nn.silu(h), p, pre + "conv2")
    if pre + "conv_shortcut.weight" in p:
        x = conv2d(x, p, pre + "conv_shortcut", padding=0)
    return x + h


def _attn(q, k, v, n_heads):
    B, Tq, D = q.shape
    hd = D // n_heads
    qh = q.reshape(B, Tq, n_heads, hd)
    kh = k.reshape(B, -1, n_heads, hd)
    vh = v.reshape(B, -1, n_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) * (hd ** -0.5)
    a = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, vh,
                   preferred_element_type=jnp.float32)
    return o.reshape(B, Tq, D).astype(q.dtype)


def transformer_block(x, ctx, p, pre, n_heads):
    """diffusers BasicTransformerBlock: self-attn, cross-attn, GEGLU ff."""
    h = _ln(x, p, pre + "norm1")
    h = _attn(linear(h, p, pre + "attn1.to_q"), linear(h, p, pre + "attn1.to_k"),
              linear(h, p, pre + "attn1.to_v"), n_heads)
    x = x + linear(h, p, pre + "attn1.to_out.0")
    h = _ln(x, p, pre + "norm2")
    h = _attn(linear(h, p, pre + "attn2.to_q"), linear(ctx, p, pre + "attn2.to_k"),
              linear(ctx, p, pre + "attn2.to_v"), n_heads)
    x = x + linear(h, p, pre + "attn2.to_out.0")
    h = _ln(x, p, pre + "norm3")
    gu = linear(h, p, pre + "ff.net.0.proj")
    g, u = jnp.split(gu, 2, axis=-1)
    h = g * jax.nn.gelu(u.astype(jnp.float32), approximate=False).astype(u.dtype)
    return x + linear(h, p, pre + "ff.net.2")


def _ln(x, p, name, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * p[name + ".weight"]
            + p[name + ".bias"]).astype(x.dtype)


def spatial_transformer(x, ctx, p, pre, n_heads, depth=1, linear_proj=False):
    B, H, W, C = x.shape
    h = group_norm(x, p[pre + "norm.weight"], p[pre + "norm.bias"])
    if linear_proj:  # SDXL use_linear_projection
        h = linear(h.reshape(B, H * W, C), p, pre + "proj_in")
    else:
        h = conv2d(h, p, pre + "proj_in", padding=0).reshape(B, H * W, C)
    for di in range(depth):
        h = transformer_block(h, ctx, p, pre + f"transformer_blocks.{di}.",
                              n_heads)
    if linear_proj:
        h = linear(h, p, pre + "proj_out").reshape(B, H, W, C)
    else:
        h = conv2d(h.reshape(B, H, W, C), p, pre + "proj_out", padding=0)
    return x + h


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

def _st_args(cfg: SDConfig, lvl: int, ch: int):
    depth = cfg.transformer_depth[lvl] if cfg.transformer_depth else 1
    heads = ch // cfg.attn_head_dim if cfg.attn_head_dim else cfg.n_heads
    return dict(n_heads=heads, depth=depth, linear_proj=cfg.linear_proj)


def unet_apply(params: Params, cfg: SDConfig, latents: jnp.ndarray,
               t: jnp.ndarray, context: jnp.ndarray,
               pooled: jnp.ndarray | None = None,
               time_ids: jnp.ndarray | None = None) -> jnp.ndarray:
    """latents: (B, h, w, 4) NHWC; t: (B,); context: (B, 77, ctx_dim).
    SDXL adds pooled (B, pooled_dim) + time_ids (B, 6) micro-conditioning
    through add_embedding into the time embedding."""
    p = params
    temb = timestep_embedding(t, cfg.model_channels)
    temb = linear(jax.nn.silu(linear(temb, p, "time_embedding.linear_1")),
                  p, "time_embedding.linear_2")
    if cfg.add_embed_dim and pooled is not None:
        B = pooled.shape[0]
        ids_emb = timestep_embedding(time_ids.reshape(-1), 256).reshape(B, -1)
        add = jnp.concatenate([pooled, ids_emb], axis=-1)
        aemb = linear(jax.nn.silu(linear(add, p, "add_embedding.linear_1")),
                      p, "add_embedding.linear_2")
        temb = temb + aemb

    hs = []
    h = conv2d(latents, p, "conv_in")
    hs.append(h)
    n_levels = len(cfg.channel_mult)
    for lvl in range(n_levels):
        for ri in range(cfg.num_res_blocks):
            pre = f"down_blocks.{lvl}.resnets.{ri}."
            h = resnet_block(h, temb, p, pre)
            if lvl in cfg.attn_levels:
                h = spatial_transformer(
                    h, context, p, f"down_blocks.{lvl}.attentions.{ri}.",
                    **_st_args(cfg, lvl, h.shape[-1]))
            hs.append(h)
        if lvl < n_levels - 1:
            h = conv2d(h, p, f"down_blocks.{lvl}.downsamplers.0.conv", stride=2)
            hs.append(h)

    h = resnet_block(h, temb, p, "mid_block.resnets.0.")
    h = spatial_transformer(h, context, p, "mid_block.attentions.0.",
                            **_st_args(cfg, n_levels - 1, h.shape[-1]))
    h = resnet_block(h, temb, p, "mid_block.resnets.1.")

    for ui, lvl in enumerate(reversed(range(n_levels))):
        for ri in range(cfg.num_res_blocks + 1):
            skip = hs.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            pre = f"up_blocks.{ui}.resnets.{ri}."
            h = resnet_block(h, temb, p, pre)
            if lvl in cfg.attn_levels:
                h = spatial_transformer(
                    h, context, p, f"up_blocks.{ui}.attentions.{ri}.",
                    **_st_args(cfg, lvl, h.shape[-1]))
        if lvl > 0:
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
            h = conv2d(h, p, f"up_blocks.{ui}.upsamplers.0.conv")

    h = group_norm(h, p["conv_norm_out.weight"], p["conv_norm_out.bias"])
    return conv2d(jax.nn.silu(h), p, "conv_out")


# ---------------------------------------------------------------------------
# CLIP text encoder (SD1.x: ViT-L/14 text tower, causal)
# ---------------------------------------------------------------------------

def clip_text_apply(params: Params, cfg: SDConfig, tokens: jnp.ndarray,
                    prefix: str = "text.", n_layers: int | None = None,
                    n_heads: int | None = None, skip_last: int = 0,
                    final_ln: bool = True) -> jnp.ndarray:
    """CLIP text tower. prefix selects the tower ("text." / "text2.");
    skip_last=1 returns the penultimate hidden states (SDXL conditioning,
    "clip skip"); final_ln applies the tower's final LayerNorm."""
    p = params
    n_layers = (cfg.text_layers if n_layers is None else n_layers) - skip_last
    n_heads_ = cfg.text_heads if n_heads is None else n_heads
    T = tokens.shape[1]
    x = p[prefix + "tok_embd"][tokens] + p[prefix + "pos_embd"][None, :T]
    causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
    for i in range(n_layers):
        pre = f"{prefix}{i}."
        h = _ln(x, p, pre + "ln1")
        q = linear(h, p, pre + "q")
        k = linear(h, p, pre + "k")
        v = linear(h, p, pre + "v")
        B, _, D = q.shape
        hd = D // n_heads_
        s = jnp.einsum("bqhd,bkhd->bhqk", q.reshape(B, T, n_heads_, hd),
                       k.reshape(B, T, n_heads_, hd),
                       preferred_element_type=jnp.float32) * (hd ** -0.5)
        s = jnp.where(causal, s, jnp.finfo(jnp.float32).min)
        a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v.reshape(B, T, n_heads_, hd),
                       preferred_element_type=jnp.float32).reshape(B, T, D)
        x = x + linear(o.astype(x.dtype), p, pre + "out")
        h = _ln(x, p, pre + "ln2")
        h = linear(h, p, pre + "fc1")
        h = (h.astype(jnp.float32) * jax.nn.sigmoid(1.702 * h.astype(jnp.float32))
             ).astype(x.dtype)  # quick_gelu
        x = x + linear(h, p, pre + "fc2")
    return _ln(x, p, prefix + "ln_final") if final_ln else x


# ---------------------------------------------------------------------------
# VAE decoder
# ---------------------------------------------------------------------------

def vae_attn(x, p, pre):
    B, H, W, C = x.shape
    h = group_norm(x, p[pre + "group_norm.weight"], p[pre + "group_norm.bias"])
    h = h.reshape(B, H * W, C)
    o = _attn(linear(h, p, pre + "to_q"), linear(h, p, pre + "to_k"),
              linear(h, p, pre + "to_v"), 1)
    o = linear(o, p, pre + "to_out.0")
    return x + o.reshape(B, H, W, C)


def vae_encode(params: Params, cfg: SDConfig, img: jnp.ndarray,
               noise: jnp.ndarray | None = None) -> jnp.ndarray:
    """img (B, H, W, 3) in [-1,1] -> latents (B, H/f, W/f, 4) (img2img path).
    Uses the distribution mean (+ optional noise * std)."""
    p = params
    h = conv2d(img, p, "vae.encoder.conv_in")
    n_levels = len(cfg.vae_ch_mult)
    for di in range(n_levels):
        for ri in range(2):
            h = resnet_block(h, None, p, f"vae.encoder.down_blocks.{di}.resnets.{ri}.")
        if di < n_levels - 1:
            h = conv2d(h, p, f"vae.encoder.down_blocks.{di}.downsamplers.0.conv",
                       stride=2)
    h = resnet_block(h, None, p, "vae.encoder.mid_block.resnets.0.")
    h = vae_attn(h, p, "vae.encoder.mid_block.attentions.0.")
    h = resnet_block(h, None, p, "vae.encoder.mid_block.resnets.1.")
    h = group_norm(h, p["vae.encoder.conv_norm_out.weight"],
                   p["vae.encoder.conv_norm_out.bias"])
    moments = conv2d(jax.nn.silu(h), p, "vae.encoder.conv_out")
    moments = conv2d(moments, p, "vae.quant_conv", padding=0)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if noise is not None:
        mean = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * noise
    return mean * cfg.scale_factor


def vae_decode(params: Params, cfg: SDConfig, z: jnp.ndarray) -> jnp.ndarray:
    """z: (B, h, w, 4) -> images (B, 8h, 8w, 3) in [-1, 1]."""
    p = params
    h = conv2d(z / cfg.scale_factor, p, "vae.post_quant_conv", padding=0)
    h = conv2d(h, p, "vae.decoder.conv_in")
    h = resnet_block(h, None, p, "vae.decoder.mid_block.resnets.0.")
    h = vae_attn(h, p, "vae.decoder.mid_block.attentions.0.")
    h = resnet_block(h, None, p, "vae.decoder.mid_block.resnets.1.")
    n_levels = len(cfg.vae_ch_mult)
    for ui in range(n_levels):
        for ri in range(3):
            h = resnet_block(h, None, p, f"vae.decoder.up_blocks.{ui}.resnets.{ri}.")
        if ui < n_levels - 1:
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
            h = conv2d(h, p, f"vae.decoder.up_blocks.{ui}.upsamplers.0.conv")
    h = group_norm(h, p["vae.decoder.conv_norm_out.weight"],
                   p["vae.decoder.conv_norm_out.bias"])
    return conv2d(jax.nn.silu(h), p, "vae.decoder.conv_out")


# ---------------------------------------------------------------------------
# schedules + samplers (sdtype_adapter.cpp:41-58 name set)
# ---------------------------------------------------------------------------

def linear_beta_schedule(n=1000, beta_start=0.00085, beta_end=0.012):
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, n,
                        dtype=np.float64) ** 2
    alphas_cum = np.cumprod(1.0 - betas)
    return alphas_cum.astype(np.float32)


def karras_sigmas(n_steps, sigma_min=0.0292, sigma_max=14.6146, rho=7.0):
    ramp = np.linspace(0, 1, n_steps)
    return ((sigma_max ** (1 / rho) + ramp *
             (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho).astype(np.float32)


class KDiffusion:
    """k-diffusion wrapper: eps-model over sigma-space with CFG."""

    def __init__(self, denoise_fn, alphas_cum):
        self.fn = denoise_fn
        ac = np.asarray(alphas_cum, np.float64)
        self.sigmas_all = np.sqrt((1 - ac) / ac).astype(np.float32)

    def sigma_to_t(self, sigma):
        return float(np.abs(self.sigmas_all - sigma).argmin())

    def denoise(self, x, sigma, cond, uncond, cfg_scale):
        c_in = 1.0 / math.sqrt(sigma ** 2 + 1)
        t = jnp.full((x.shape[0],), self.sigma_to_t(sigma), jnp.int32)
        eps_c = self.fn(x * c_in, t, cond)
        if uncond is not None and cfg_scale != 1.0:
            eps_u = self.fn(x * c_in, t, uncond)
            eps = eps_u + cfg_scale * (eps_c - eps_u)
        else:
            eps = eps_c
        return x - sigma * eps  # predicted x0... in k-space: x - sigma*eps


def sample_euler(kd, x, sigmas, cond, uncond, cfg_scale, rng, ancestral=False):
    for i in range(len(sigmas) - 1):
        s, sn = float(sigmas[i]), float(sigmas[i + 1])
        denoised = kd.denoise(x, s, cond, uncond, cfg_scale)
        d = (x - denoised) / s
        if ancestral and sn > 0:
            su = min(sn, math.sqrt(sn ** 2 * (s ** 2 - sn ** 2) / s ** 2))
            sd = math.sqrt(max(sn ** 2 - su ** 2, 0.0))
            x = x + d * (sd - s)
            x = x + jnp.asarray(rng.standard_normal(x.shape), x.dtype) * su
        else:
            x = x + d * (sn - s)
    return x


def sample_heun(kd, x, sigmas, cond, uncond, cfg_scale, rng):
    for i in range(len(sigmas) - 1):
        s, sn = float(sigmas[i]), float(sigmas[i + 1])
        denoised = kd.denoise(x, s, cond, uncond, cfg_scale)
        d = (x - denoised) / s
        if sn == 0:
            x = x + d * (sn - s)
        else:
            x2 = x + d * (sn - s)
            denoised2 = kd.denoise(x2, sn, cond, uncond, cfg_scale)
            d2 = (x2 - denoised2) / sn
            x = x + (d + d2) / 2 * (sn - s)
    return x


def sample_dpmpp_2m(kd, x, sigmas, cond, uncond, cfg_scale, rng):
    old_denoised = None
    for i in range(len(sigmas) - 1):
        s, sn = float(sigmas[i]), float(sigmas[i + 1])
        denoised = kd.denoise(x, s, cond, uncond, cfg_scale)
        t, tn = -math.log(s), -math.log(max(sn, 1e-10))
        h = tn - t
        if old_denoised is None or sn == 0:
            x = (sn / s) * x - (math.exp(-h) - 1) * denoised if sn > 0 else denoised
        else:
            h_last = t - (-math.log(s_last))
            r = h_last / h
            dd = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
            x = (sn / s) * x - (math.exp(-h) - 1) * dd
        old_denoised = denoised
        s_last = s
    return x


def sample_dpmpp_2m_v2(kd, x, sigmas, cond, uncond, cfg_scale, rng):
    """Modified DPM++ (2M) "v2" (A1111 discussion #8457; reference
    sdcpp stable-diffusion.cpp:1129-1169 DPMPP2Mv2): the second-order
    correction uses r = h_max/h_min and a midpoint exp term
    b = exp(-(h_max+h_min)/2) - 1 instead of plain h."""
    old_denoised = None
    s_last = None
    for i in range(len(sigmas) - 1):
        s, sn = float(sigmas[i]), float(sigmas[i + 1])
        denoised = kd.denoise(x, s, cond, uncond, cfg_scale)
        t, tn = -math.log(s), -math.log(max(sn, 1e-10))
        h = tn - t
        a = sn / s
        if old_denoised is None or sn == 0:
            b = math.exp(-h) - 1.0
            x = a * x - b * denoised
        else:
            h_last = t - (-math.log(s_last))
            h_min, h_max = min(h_last, h), max(h_last, h)
            r = h_max / h_min
            b = math.exp(-(h_max + h_min) / 2.0) - 1.0
            dd = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
            x = a * x - b * dd
        old_denoised = denoised
        s_last = s
    return x


def sample_dpm2(kd, x, sigmas, cond, uncond, cfg_scale, rng):
    """DPM2 (k-diffusion sample_dpm_2): midpoint second-order step."""
    for i in range(len(sigmas) - 1):
        s, sn = float(sigmas[i]), float(sigmas[i + 1])
        denoised = kd.denoise(x, s, cond, uncond, cfg_scale)
        d = (x - denoised) / s
        if sn == 0:
            x = x + d * (sn - s)
        else:
            # geometric midpoint in log-sigma
            s_mid = math.exp(0.5 * (math.log(s) + math.log(sn)))
            x2 = x + d * (s_mid - s)
            denoised2 = kd.denoise(x2, s_mid, cond, uncond, cfg_scale)
            d2 = (x2 - denoised2) / s_mid
            x = x + d2 * (sn - s)
    return x


def sample_dpmpp_2s_a(kd, x, sigmas, cond, uncond, cfg_scale, rng):
    """DPM++ (2s) ancestral (k-diffusion sample_dpmpp_2s_ancestral)."""
    for i in range(len(sigmas) - 1):
        s, sn = float(sigmas[i]), float(sigmas[i + 1])
        denoised = kd.denoise(x, s, cond, uncond, cfg_scale)
        if sn == 0:
            d = (x - denoised) / s
            x = x + d * (sn - s)
            continue
        su = min(sn, math.sqrt(sn ** 2 * (s ** 2 - sn ** 2) / s ** 2))
        sd = math.sqrt(max(sn ** 2 - su ** 2, 0.0))
        t, tn = -math.log(s), -math.log(max(sd, 1e-10))
        r = 1 / 2
        h = tn - t
        s_mid = math.exp(-(t + r * h))
        x2 = (s_mid / s) * x - math.expm1(-h * r) * denoised
        denoised2 = kd.denoise(x2, s_mid, cond, uncond, cfg_scale)
        x = (sd / s) * x - math.expm1(-h) * denoised2
        if su > 0:
            x = x + jnp.asarray(rng.standard_normal(x.shape), x.dtype) * su
    return x


def _ipndm_step(kd, x, s, sn, cond, uncond, cfg_scale, hist, order_cap=4):
    """Shared iPNDM machinery: Adams-Bashforth multistep over d = (x-D)/s
    (stable-diffusion.cpp sample_ipndm; coefficients per Zhang & Chen)."""
    denoised = kd.denoise(x, s, cond, uncond, cfg_scale)
    d = (x - denoised) / s
    hist.append(d)
    if len(hist) > 4:
        hist.pop(0)
    order = min(len(hist), order_cap)
    if order == 1:
        dd = hist[-1]
    elif order == 2:
        dd = (3 * hist[-1] - hist[-2]) / 2
    elif order == 3:
        dd = (23 * hist[-1] - 16 * hist[-2] + 5 * hist[-3]) / 12
    else:
        dd = (55 * hist[-1] - 59 * hist[-2] + 37 * hist[-3]
              - 9 * hist[-4]) / 24
    return x + dd * (sn - s)


def sample_ipndm(kd, x, sigmas, cond, uncond, cfg_scale, rng):
    hist: list = []
    for i in range(len(sigmas) - 1):
        x = _ipndm_step(kd, x, float(sigmas[i]), float(sigmas[i + 1]),
                        cond, uncond, cfg_scale, hist)
    return x


def sample_ipndm_v(kd, x, sigmas, cond, uncond, cfg_scale, rng):
    """Variable-step iPNDM (stable-diffusion.cpp sample_ipndm_v): the
    multistep coefficients account for non-uniform sigma spacing."""
    d_hist: list = []
    h_hist: list = []
    for i in range(len(sigmas) - 1):
        s, sn = float(sigmas[i]), float(sigmas[i + 1])
        denoised = kd.denoise(x, s, cond, uncond, cfg_scale)
        d = (x - denoised) / s
        h = sn - s
        d_hist.append(d)
        h_hist.append(h)
        if len(d_hist) > 4:
            d_hist.pop(0)
            h_hist.pop(0)
        order = len(d_hist)
        if order == 1:
            dd = d_hist[-1]
        elif order == 2:
            h0, h1 = h_hist[-1], h_hist[-2]
            r = h1 / h0 if h0 else 1.0
            dd = (1 + 1 / (2 * r)) * d_hist[-1] - (1 / (2 * r)) * d_hist[-2]
        else:  # 3rd+ order falls back to the uniform-step AB3 weights
            dd = (23 * d_hist[-1] - 16 * d_hist[-2] + 5 * d_hist[-3]) / 12
        x = x + dd * h
    return x


def sample_lcm(kd, x, sigmas, cond, uncond, cfg_scale, rng):
    """Latent Consistency Model sampler: each step REPLACES x with the
    consistency prediction (the denoised x0), then re-injects fresh noise at
    the next sigma level — not an euler ODE step (independently implemented
    from the algorithm; behavior matches stable-diffusion.cpp's LCM case,
    /root/reference/otherarch/sdcpp/stable-diffusion.cpp:1172-1206)."""
    for i in range(len(sigmas) - 1):
        s, sn = float(sigmas[i]), float(sigmas[i + 1])
        x = kd.denoise(x, s, cond, uncond, cfg_scale)
        if sn > 0:
            x = x + jnp.asarray(rng.standard_normal(x.shape), x.dtype) * sn
    return x


SAMPLERS = {
    "euler": partial(sample_euler, ancestral=False),
    "euler a": partial(sample_euler, ancestral=True),
    "euler_a": partial(sample_euler, ancestral=True),
    "heun": sample_heun,
    "dpm2": sample_dpm2,
    "dpm++ 2s a": sample_dpmpp_2s_a,
    "dpm++2s_a": sample_dpmpp_2s_a,
    "dpm++ 2m": sample_dpmpp_2m,
    "dpm++2m": sample_dpmpp_2m,
    "dpm++ 2m v2": sample_dpmpp_2m_v2,
    "dpm++2mv2": sample_dpmpp_2m_v2,
    "ipndm": sample_ipndm,
    "ipndm_v": sample_ipndm_v,
    "lcm": sample_lcm,
}


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------

class SDModel:
    def __init__(self, cfg: SDConfig, params: Params, tokenizer=None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self._unet = jax.jit(partial(unet_apply, cfg=cfg))
        self._text = jax.jit(partial(clip_text_apply, cfg=cfg),
                             static_argnames=("prefix", "n_layers", "n_heads",
                                              "skip_last", "final_ln"))
        self.is_xl = cfg.text2_layers > 0
        self._vae = jax.jit(partial(vae_decode, cfg=cfg))
        self._vae_enc = jax.jit(partial(vae_encode, cfg=cfg))
        self.alphas_cum = linear_beta_schedule()
        self.taesd = None  # fast VAE replacement (--sdvaeauto, tae.hpp)

    def set_taesd(self, path_or_state):
        """Replace VAE decode with TAESD (reference sdvaeauto flag)."""
        from .taesd import decoder_apply, load_taesd

        self.taesd = load_taesd(path_or_state)
        self._taesd_dec = jax.jit(decoder_apply)

    def _tokenize(self, prompt: str) -> tuple[list[int], int]:
        if self.tokenizer is not None:
            ids = self.tokenizer.encode(prompt, add_bos=False)[: self.cfg.text_ctx - 2]
            bos, eos = 49406, 49407
            toks = [bos] + ids + [eos] * (self.cfg.text_ctx - 1 - len(ids))
            eot = 1 + len(ids)
        else:
            toks = [0] * self.cfg.text_ctx
            eot = self.cfg.text_ctx - 1
        return toks, eot

    def encode_prompt(self, prompt: str):
        toks, eot = self._tokenize(prompt)
        tok = jnp.asarray([toks], jnp.int32)
        if not self.is_xl:
            return self._text(params=self.params, tokens=tok)
        # SDXL: concat penultimate hidden of both towers; pooled from the
        # bigG tower's EOT token through text_projection
        cfg = self.cfg
        h1 = self._text(params=self.params, tokens=tok, skip_last=1,
                        final_ln=False)
        h2 = self._text(params=self.params, tokens=tok, prefix="text2.",
                        n_layers=cfg.text2_layers, n_heads=cfg.text2_heads,
                        skip_last=1, final_ln=False)
        ctx = jnp.concatenate([h1, h2], axis=-1)
        full2 = self._text(params=self.params, tokens=tok, prefix="text2.",
                           n_layers=cfg.text2_layers, n_heads=cfg.text2_heads)
        pooled = full2[:, eot] @ self.params["text2.projection"].T
        return ctx, pooled

    def txt2img(self, prompt: str, negative_prompt: str = "", width: int = 512,
                height: int = 512, steps: int = 20, cfg_scale: float = 7.0,
                sampler: str = "euler a", seed: int = -1,
                init_latents: jnp.ndarray | None = None,
                denoise: float = 1.0) -> np.ndarray:
        cfgm = self.cfg
        rng = np.random.default_rng(None if seed < 0 else seed)
        cond = self.encode_prompt(prompt)
        uncond = self.encode_prompt(negative_prompt) if cfg_scale != 1.0 else None
        if init_latents is not None:
            h, w = init_latents.shape[1], init_latents.shape[2]
        else:
            h, w = height // 8, width // 8

        if self.is_xl:
            # micro-conditioning: (orig_h, orig_w, crop_t, crop_l, tgt_h, tgt_w)
            tids = jnp.asarray([[h * 8, w * 8, 0, 0, h * 8, w * 8]], jnp.float32)
            cond_ctx, cond_pool = cond
            un = uncond if uncond is not None else (None, None)

            def denoise_fn(x, t, c):
                ctx, pool = c
                return self._unet(params=self.params, latents=x, t=t,
                                  context=ctx, pooled=pool, time_ids=tids)

            kd = KDiffusion(denoise_fn, self.alphas_cum)
            cond = (cond_ctx, cond_pool)
            uncond = un if un[0] is not None else None
        else:
            kd = KDiffusion(
                lambda x, t, c: self._unet(params=self.params, latents=x, t=t,
                                           context=c),
                self.alphas_cum)
        n_sig = max(2, int(steps * denoise)) if init_latents is not None else steps
        sigmas = np.append(karras_sigmas(steps), 0.0).astype(np.float32)
        if init_latents is not None:  # img2img: start part-way down the ladder
            start = max(0, int(len(sigmas) * (1 - denoise)) - 1)
            sigmas = sigmas[start:]
            noise = rng.standard_normal((1, h, w, cfgm.latent_channels)).astype(np.float32)
            x = init_latents + jnp.asarray(noise) * float(sigmas[0])
        else:
            x = jnp.asarray(
                rng.standard_normal((1, h, w, cfgm.latent_channels)).astype(np.float32)
                * float(sigmas[0]))

        sampler_fn = SAMPLERS.get(sampler.lower(), SAMPLERS["euler a"])
        x = sampler_fn(kd, x, sigmas, cond, uncond, cfg_scale, rng)
        if self.taesd is not None and "decoder.1.weight" in self.taesd:
            img = np.asarray(self._taesd_dec(self.taesd, x)[0])  # [0,1]
            return np.clip(img * 255.0, 0, 255).astype(np.uint8)
        img = self._vae(params=self.params, z=x)
        img = np.asarray(img[0])
        return np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)

    def img2img(self, init_image: np.ndarray, prompt: str,
                denoise: float = 0.75, **kw) -> np.ndarray:
        """init_image: uint8 (H, W, 3). A1111 img2img path."""
        img = (init_image.astype(np.float32) / 127.5 - 1.0)[None]
        latents = self._vae_enc(params=self.params, img=jnp.asarray(img))
        return self.txt2img(prompt, init_latents=latents,
                            denoise=max(0.05, min(1.0, denoise)), **kw)


def init_random_sd_params(cfg: SDConfig, seed: int = 0,
                          scale: float = 0.05) -> Params:
    """Random params with the exact tensor layout unet_apply/clip_text_apply/
    vae_decode consume (the converter's target spec; also the test fixture)."""
    rng = np.random.default_rng(seed)
    p: Params = {}

    def W(shape):
        return jnp.asarray((rng.standard_normal(shape) * scale).astype(np.float32))

    def conv(name, o, i, k=3):
        p[name + ".weight"] = W((o, i, k, k))
        p[name + ".bias"] = jnp.zeros(o, jnp.float32)

    def lin(name, o, i):
        p[name + ".weight"] = W((o, i))
        p[name + ".bias"] = jnp.zeros(o, jnp.float32)

    def gn(name, c):
        p[name + ".weight"] = jnp.ones(c, jnp.float32)
        p[name + ".bias"] = jnp.zeros(c, jnp.float32)

    def resnet(pre, i, o, tdim=None):
        gn(pre + "norm1", i)
        conv(pre + "conv1", o, i)
        if tdim:
            lin(pre + "time_emb_proj", o, tdim)
        gn(pre + "norm2", o)
        conv(pre + "conv2", o, o)
        if i != o:
            conv(pre + "conv_shortcut", o, i, k=1)

    def st(pre, ch, lvl=0):
        gn(pre + "norm", ch)
        if cfg.linear_proj:
            lin(pre + "proj_in", ch, ch)
            lin(pre + "proj_out", ch, ch)
        else:
            conv(pre + "proj_in", ch, ch, k=1)
            conv(pre + "proj_out", ch, ch, k=1)
        depth = cfg.transformer_depth[lvl] if cfg.transformer_depth else 1
        for di in range(depth):
            tb = pre + f"transformer_blocks.{di}."
            for n in ("norm1", "norm2", "norm3"):
                gn(tb + n, ch)
            for n in ("attn1.to_q", "attn1.to_k", "attn1.to_v", "attn1.to_out.0"):
                lin(tb + n, ch, ch)
            lin(tb + "attn2.to_q", ch, ch)
            lin(tb + "attn2.to_k", ch, cfg.context_dim)
            lin(tb + "attn2.to_v", ch, cfg.context_dim)
            lin(tb + "attn2.to_out.0", ch, ch)
            lin(tb + "ff.net.0.proj", 8 * ch, ch)
            lin(tb + "ff.net.2", ch, 4 * ch)

    # ---- UNet ----
    mc = cfg.model_channels
    tdim = mc * 4
    lin("time_embedding.linear_1", tdim, mc)
    lin("time_embedding.linear_2", tdim, tdim)
    if cfg.add_embed_dim:  # SDXL micro-conditioning MLP
        lin("add_embedding.linear_1", tdim, cfg.add_embed_dim)
        lin("add_embedding.linear_2", tdim, tdim)
    conv("conv_in", mc, cfg.in_channels)
    chs = [mc]
    ch = mc
    n_levels = len(cfg.channel_mult)
    for lvl, mult in enumerate(cfg.channel_mult):
        out = mc * mult
        for ri in range(cfg.num_res_blocks):
            resnet(f"down_blocks.{lvl}.resnets.{ri}.", ch, out, tdim)
            ch = out
            if lvl in cfg.attn_levels:
                st(f"down_blocks.{lvl}.attentions.{ri}.", ch, lvl)
            chs.append(ch)
        if lvl < n_levels - 1:
            conv(f"down_blocks.{lvl}.downsamplers.0.conv", ch, ch)
            chs.append(ch)
    resnet("mid_block.resnets.0.", ch, ch, tdim)
    st("mid_block.attentions.0.", ch, n_levels - 1)
    resnet("mid_block.resnets.1.", ch, ch, tdim)
    for ui, lvl in enumerate(reversed(range(n_levels))):
        out = mc * cfg.channel_mult[lvl]
        for ri in range(cfg.num_res_blocks + 1):
            skip = chs.pop()
            resnet(f"up_blocks.{ui}.resnets.{ri}.", ch + skip, out, tdim)
            ch = out
            if lvl in cfg.attn_levels:
                st(f"up_blocks.{ui}.attentions.{ri}.", ch, lvl)
        if lvl > 0:
            conv(f"up_blocks.{ui}.upsamplers.0.conv", ch, ch)
    gn("conv_norm_out", ch)
    conv("conv_out", cfg.in_channels, ch)

    # ---- text encoder ----
    d = cfg.text_dim
    p["text.tok_embd"] = W((cfg.text_vocab, d))
    p["text.pos_embd"] = W((cfg.text_ctx, d))
    for i in range(cfg.text_layers):
        pre = f"text.{i}."
        gn(pre + "ln1", d)
        gn(pre + "ln2", d)
        for n in ("q", "k", "v", "out"):
            lin(pre + n, d, d)
        lin(pre + "fc1", 4 * d, d)
        lin(pre + "fc2", d, 4 * d)
    gn("text.ln_final", d)
    if cfg.text2_layers:  # SDXL bigG tower + projection
        d2 = cfg.text2_dim
        p["text2.tok_embd"] = W((cfg.text_vocab, d2))
        p["text2.pos_embd"] = W((cfg.text_ctx, d2))
        for i in range(cfg.text2_layers):
            pre = f"text2.{i}."
            gn(pre + "ln1", d2)
            gn(pre + "ln2", d2)
            for n in ("q", "k", "v", "out"):
                lin(pre + n, d2, d2)
            lin(pre + "fc1", 4 * d2, d2)
            lin(pre + "fc2", d2, 4 * d2)
        gn("text2.ln_final", d2)
        p["text2.projection"] = W((cfg.pooled_dim or d2, d2))

    # ---- VAE encoder ----
    vch = cfg.vae_ch
    ch = vch * cfg.vae_ch_mult[0]
    conv("vae.encoder.conv_in", ch, 3)
    for di, mult in enumerate(cfg.vae_ch_mult):
        out = vch * mult
        for ri in range(2):
            resnet(f"vae.encoder.down_blocks.{di}.resnets.{ri}.", ch, out)
            ch = out
        if di < len(cfg.vae_ch_mult) - 1:
            conv(f"vae.encoder.down_blocks.{di}.downsamplers.0.conv", ch, ch)
    resnet("vae.encoder.mid_block.resnets.0.", ch, ch)
    gn("vae.encoder.mid_block.attentions.0.group_norm", ch)
    for n in ("to_q", "to_k", "to_v", "to_out.0"):
        lin(f"vae.encoder.mid_block.attentions.0.{n}", ch, ch)
    resnet("vae.encoder.mid_block.resnets.1.", ch, ch)
    gn("vae.encoder.conv_norm_out", ch)
    conv("vae.encoder.conv_out", 2 * cfg.latent_channels, ch)
    conv("vae.quant_conv", 2 * cfg.latent_channels, 2 * cfg.latent_channels, k=1)

    # ---- VAE decoder ----
    rev = list(reversed(cfg.vae_ch_mult))
    top = vch * rev[0]
    conv("vae.post_quant_conv", cfg.latent_channels, cfg.latent_channels, k=1)
    conv("vae.decoder.conv_in", top, cfg.latent_channels)
    resnet("vae.decoder.mid_block.resnets.0.", top, top)
    gn("vae.decoder.mid_block.attentions.0.group_norm", top)
    for n in ("to_q", "to_k", "to_v", "to_out.0"):
        lin(f"vae.decoder.mid_block.attentions.0.{n}", top, top)
    resnet("vae.decoder.mid_block.resnets.1.", top, top)
    ch = top
    for ui in range(len(rev)):
        out = vch * rev[ui]
        for ri in range(3):
            resnet(f"vae.decoder.up_blocks.{ui}.resnets.{ri}.", ch, out)
            ch = out
        if ui < len(rev) - 1:
            conv(f"vae.decoder.up_blocks.{ui}.upsamplers.0.conv", ch, ch)
    gn("vae.decoder.conv_norm_out", ch)
    conv("vae.decoder.conv_out", 3, ch)
    return p


def apply_sd_lora(params: Params, path: str, multiplier: float = 1.0) -> int:
    """Merge a GGUF SD-LoRA adapter (tools/convert_sd_lora.py) into the flat
    SD params in place: W += mult * (alpha/r) * B @ A. Counterpart of the
    reference's --sdlora merge (stable-diffusion.cpp lora application).
    Returns the number of tensors patched."""
    with GGUFReader(path) as r:
        md = r.metadata
        if str(md.get("general.type", "")) != "adapter" or str(
                md.get("adapter.type", "")) != "lora":
            raise ValueError(f"{path} is not a LoRA adapter GGUF")
        a = md.get("adapter.lora.alpha", 0.0)
        alpha = float(a.item() if hasattr(a, "item") else a or 0.0)
        pairs: dict[str, dict[str, np.ndarray]] = {}
        for name in r.tensors:
            if name.endswith(".lora_a"):
                pairs.setdefault(name[:-7], {})["a"] = np.asarray(
                    r.tensor_data(name), np.float32)
            elif name.endswith(".lora_b"):
                pairs.setdefault(name[:-7], {})["b"] = np.asarray(
                    r.tensor_data(name), np.float32)
    n = 0
    for base, p in pairs.items():
        if base not in params:
            continue
        A, B = p["a"], p["b"]
        rank = A.shape[0]
        scale = multiplier * (alpha / rank if alpha else 1.0)
        delta = scale * (B @ A)
        w = np.asarray(params[base], np.float32)
        if delta.shape != w.shape:
            raise ValueError(
                f"LoRA delta shape {delta.shape} != {w.shape} for {base}")
        params[base] = jnp.asarray(w + delta, dtype=params[base].dtype)
        n += 1
    return n


def load_sd_vae(params: Params, vae_path: str) -> int:
    """Replace the model's VAE weights with a standalone VAE file (--sdvae,
    reference: vae_filename in sd_load_model_inputs, expose.h:131 /
    sdtype_adapter.cpp).  Accepts a GGUF written by tools/convert_sd.py (tensors
    already under "vae.") or a diffusers-layout .safetensors."""
    new: dict[str, np.ndarray] = {}
    if vae_path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        for name, arr in load_file(vae_path).items():
            new[name if name.startswith("vae.") else "vae." + name] = arr
    else:
        with GGUFReader(vae_path) as r:
            for name in r.tensors:
                key = name if name.startswith("vae.") else "vae." + name
                new[key] = r.tensor_data(name)
    n = 0
    unmatched = []
    for key, arr in new.items():
        if key in params:
            if tuple(params[key].shape) != tuple(arr.shape):
                raise ValueError(f"--sdvae tensor {key} shape {arr.shape} != "
                                 f"model {tuple(params[key].shape)}")
            params[key] = jnp.asarray(np.asarray(arr, dtype=np.float32))
            n += 1
        else:
            unmatched.append(key)
    if n == 0:
        raise ValueError(f"--sdvae {vae_path}: no vae.* tensors matched the model")
    if unmatched:
        # a wrong-architecture VAE with partial key overlap would otherwise be
        # half-applied silently
        if len(unmatched) > n:
            raise ValueError(
                f"--sdvae {vae_path}: {len(unmatched)} of {len(new)} tensors "
                f"have no counterpart in the model (e.g. {unmatched[0]}) — "
                "wrong VAE architecture?")
        print(f"[sdvae] warning: {len(unmatched)} of {len(new)} VAE tensors "
              f"not present in the model were skipped (e.g. {unmatched[0]})")
    return n


def load_sd(path: str, loras: list[tuple[str, float]] | None = None,
            vae_path: str | None = None) -> SDModel:
    from ..tokenizers import Tokenizer

    with GGUFReader(path) as r:
        md = r.metadata
        cfg = SDConfig(
            model_channels=int(md.get("sd.unet.model_channels", 320)),
            num_res_blocks=int(md.get("sd.unet.res_blocks", 2)),
            n_heads=int(md.get("sd.unet.heads", 8)),
            context_dim=int(md.get("sd.context_dim", 768)),
            text_layers=int(md.get("sd.text.layers", 12)),
            text_heads=int(md.get("sd.text.heads", 12)),
            text_dim=int(md.get("sd.text.dim", 768)),
            vae_ch=int(md.get("sd.vae.ch", 128)),
            text_vocab=int(md.get("sd.text.vocab", 49408)),
            text_ctx=int(md.get("sd.text.ctx", 77)),
            latent_channels=int(md.get("sd.latent_channels", 4)),
            vae_ch_mult=tuple(int(x) for x in
                              np.asarray(md.get("sd.vae.ch_mult", [1, 2, 4, 4]))),
            transformer_depth=tuple(int(x) for x in
                                    np.asarray(md.get("sd.unet.transformer_depth",
                                                      []))),
            attn_head_dim=int(md.get("sd.unet.attn_head_dim", 0)),
            linear_proj=bool(md.get("sd.unet.linear_proj", False)),
            add_embed_dim=int(md.get("sd.unet.add_embed_dim", 0)),
            pooled_dim=int(md.get("sd.text2.pooled_dim", 0)),
            text2_dim=int(md.get("sd.text2.dim", 0)),
            text2_layers=int(md.get("sd.text2.layers", 0)),
            text2_heads=int(md.get("sd.text2.heads", 0)),
            channel_mult=tuple(int(x) for x in
                               np.asarray(md.get("sd.unet.channel_mult", [1, 2, 4, 4]))),
            attn_levels=tuple(int(x) for x in
                              np.asarray(md.get("sd.unet.attn_levels", [0, 1, 2]))),
        )
        params = {name: jnp.asarray(r.tensor_data(name)) for name in r.tensors}
        tok = None
        if md.get("tokenizer.ggml.tokens") is not None:
            tok = Tokenizer.from_metadata(md)
    if vae_path:
        n = load_sd_vae(params, vae_path)
        print(f"SD VAE {vae_path}: replaced {n} tensors")
    for lp, mult in (loras or []):
        n = apply_sd_lora(params, lp, mult)
        print(f"SD LoRA {lp}: merged {n} tensors (x{mult})")
    return SDModel(cfg, params, tok)
