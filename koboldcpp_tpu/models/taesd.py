"""TAESD: tiny autoencoder for fast SD latent decode/encode (--sdvaeauto).

Counterpart of the reference's TinyAutoEncoder
(/root/reference/otherarch/sdcpp/tae.hpp:16-159, koboldcpp.py:1077 `taesd`
flag): 3-conv residual blocks, stride-2 down / nearest-up 2x, tanh latent
clamp. State-dict naming follows the public taesd.py checkpoints
("encoder.N...", "decoder.N...", blocks as "N.conv.{0,2,4}"), so
taesd_encoder/decoder safetensors load directly. NHWC + bf16-friendly;
channels (64) stay in the VPU lane dimension.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

LATENT_MAGNITUDE = 3.0
LATENT_SHIFT = 0.5


def _conv(x, p, key, stride=1, padding=1):
    w = p[key + ".weight"]  # torch (O, I, kh, kw)
    y = jax.lax.conv_general_dilated(
        x, w.transpose(2, 3, 1, 0), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if key + ".bias" in p:
        y = y + p[key + ".bias"]
    return y


def _block(x, p, key):
    """TAEBlock (tae.hpp:16-55): relu(conv3(relu(conv3(relu(conv3 x)))) + skip)."""
    h = jax.nn.relu(_conv(x, p, key + ".conv.0"))
    h = jax.nn.relu(_conv(h, p, key + ".conv.2"))
    h = _conv(h, p, key + ".conv.4")
    if key + ".skip.weight" in p:
        x = _conv(x, p, key + ".skip", padding=0)
    return jax.nn.relu(h + x)


def _upsample2(x):
    """Nearest-neighbour 2x (torch nn.Upsample default)."""
    B, H, W, C = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def decoder_apply(p: dict, z: jnp.ndarray) -> jnp.ndarray:
    """z: (B, h, w, 4) scaled SD latents -> (B, 8h, 8w, 3) image in [0, 1]ish.
    Sequential indices per taesd.py: 0=Clamp 1=conv 2=ReLU 3-5=Block 6=Up
    7=conv 8-10=Block 11=Up 12=conv 13-15=Block 16=Up 17=conv 18=Block 19=conv."""
    x = jnp.tanh(z / LATENT_MAGNITUDE) * LATENT_MAGNITUDE
    x = jax.nn.relu(_conv(x, p, "decoder.1"))
    for i in (3, 4, 5):
        x = _block(x, p, f"decoder.{i}")
    x = _conv(_upsample2(x), p, "decoder.7")
    for i in (8, 9, 10):
        x = _block(x, p, f"decoder.{i}")
    x = _conv(_upsample2(x), p, "decoder.12")
    for i in (13, 14, 15):
        x = _block(x, p, f"decoder.{i}")
    x = _conv(_upsample2(x), p, "decoder.17")
    x = _block(x, p, "decoder.18")
    return _conv(x, p, "decoder.19")


def encoder_apply(p: dict, img: jnp.ndarray) -> jnp.ndarray:
    """img: (B, H, W, 3) in [0,1] -> (B, H/8, W/8, 4) scaled latents.
    Indices: 0=conv 1=Block 2=conv/s2 3-5=Block 6=conv/s2 7-9=Block
    10=conv/s2 11-13=Block 14=conv."""
    x = _conv(img, p, "encoder.0")
    x = _block(x, p, "encoder.1")
    x = _conv(x, p, "encoder.2", stride=2)
    for i in (3, 4, 5):
        x = _block(x, p, f"encoder.{i}")
    x = _conv(x, p, "encoder.6", stride=2)
    for i in (7, 8, 9):
        x = _block(x, p, f"encoder.{i}")
    x = _conv(x, p, "encoder.10", stride=2)
    for i in (11, 12, 13):
        x = _block(x, p, f"encoder.{i}")
    return _conv(x, p, "encoder.14")


def scale_latents(x):
    """Raw latents -> [0,1] (taesd.py scale_latents)."""
    return jnp.clip(x / (2 * LATENT_MAGNITUDE) + LATENT_SHIFT, 0, 1)


def unscale_latents(x):
    return (x - LATENT_SHIFT) * (2 * LATENT_MAGNITUDE)


def load_taesd(path_or_state) -> dict:
    """Load taesd weights from a safetensors/pt file or a torch-style state
    dict. Accepts combined ("decoder.1.weight") or split single-net files
    ("1.weight" from taesd_decoder.safetensors — auto-prefixed by shape)."""
    if isinstance(path_or_state, dict):
        state = path_or_state
    elif str(path_or_state).endswith(".safetensors"):
        from safetensors.numpy import load_file

        state = load_file(path_or_state)
    else:
        import torch

        sd = torch.load(path_or_state, map_location="cpu", weights_only=True)
        state = {k: v.numpy() for k, v in sd.items()}
    out = {}
    for k, v in state.items():
        v = np.asarray(v, dtype=np.float32)
        if not (k.startswith("encoder.") or k.startswith("decoder.")):
            # single-net file: first conv input channels disambiguate
            prefix = "decoder." if any(
                kk.split(".")[0] == "1" for kk in state) else "encoder."
            k = prefix + k
        out[k] = jnp.asarray(v)
    return out
