"""CLIP ViT vision encoder + LLaVA projector in JAX.

TPU-native counterpart of the reference's clip.cpp/llava.cpp
(/root/reference/examples/llava/clip.cpp:2713, llava.cpp; used by the
orchestrator at gpttype_adapter.cpp:1988,2772): encodes an image into
`n_patches` embedding vectors in the LLM's hidden space, which the engine
splices into the token stream.

Loads mmproj GGUF files using clip.cpp's tensor naming (v.blk.*, mm.*), so
existing LLaVA mmproj files work; tools/convert_clip.py converts HF
llava checkpoints into the same naming.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFReader
from ..ops.norms import layer_norm

Params = dict[str, Any]

# CLIP's standard preprocessing constants
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass
class ClipVisionConfig:
    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 4096  # LLM hidden size
    eps: float = 1e-5
    select_layer: int = -2  # llava uses the penultimate layer's patches

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def quick_gelu(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)


def _lin(x, p, name):
    y = jnp.einsum("...c,oc->...o", x, p[name + ".weight"],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if name + ".bias" in p:
        y = y + p[name + ".bias"].astype(y.dtype)
    return y


def _attn(x, p, prefix, n_heads):
    B, T, D = x.shape
    hd = D // n_heads
    q = _lin(x, p, prefix + "attn_q").reshape(B, T, n_heads, hd)
    k = _lin(x, p, prefix + "attn_k").reshape(B, T, n_heads, hd)
    v = _lin(x, p, prefix + "attn_v").reshape(B, T, n_heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    a = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", a, v,
                     preferred_element_type=jnp.float32).reshape(B, T, D)
    return _lin(out.astype(x.dtype), p, prefix + "attn_out")


def encode_image_features(params: Params, cfg: ClipVisionConfig,
                          pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels: (B, 3, H, W) normalized. Returns (B, n_patches, hidden) from
    the selected layer (class token dropped, llava convention)."""
    B = pixels.shape[0]
    pw = params["v.patch_embd.weight"]  # (hidden, 3, P, P)
    patches = jax.lax.conv_general_dilated(
        pixels, pw.transpose(2, 3, 1, 0), (cfg.patch_size, cfg.patch_size),
        "VALID", dimension_numbers=("NCHW", "HWIO", "NCHW"))
    # (B, hidden, gh, gw) -> (B, gh*gw, hidden)
    h = patches.reshape(B, cfg.hidden_size, -1).transpose(0, 2, 1)
    cls = jnp.broadcast_to(params["v.class_embd"][None, None, :],
                           (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, h], axis=1)
    x = x + params["v.position_embd.weight"][None, :x.shape[1]]
    x = layer_norm(x, params["v.pre_ln.weight"], params["v.pre_ln.bias"], cfg.eps)

    n_run = cfg.n_layers + cfg.select_layer + 1 if cfg.select_layer < 0 else cfg.n_layers
    for i in range(n_run):
        pre = f"v.blk.{i}."
        r = x
        x = layer_norm(x, params[pre + "ln1.weight"], params[pre + "ln1.bias"], cfg.eps)
        x = r + _attn(x, params, pre, cfg.n_heads)
        r = x
        x = layer_norm(x, params[pre + "ln2.weight"], params[pre + "ln2.bias"], cfg.eps)
        x = quick_gelu(_lin(x, params, pre + "ffn_up"))
        x = r + _lin(x, params, pre + "ffn_down")
    return x[:, 1:]  # drop class token


def project(params: Params, feats: jnp.ndarray) -> jnp.ndarray:
    """LLaVA MLP projector: (B, n_patches, vision_hidden) -> (..., llm_hidden)."""
    x = _lin(feats, params, "mm.0")
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(feats.dtype)
    return _lin(x, params, "mm.2")


def preprocess_image(img) -> np.ndarray:
    """PIL image -> normalized (3, S, S) float32 (CLIP bicubic resize)."""
    from PIL import Image

    size = 336
    img = img.convert("RGB").resize((size, size), Image.BICUBIC)
    x = np.asarray(img, np.float32) / 255.0
    x = (x - IMAGE_MEAN) / IMAGE_STD
    return x.transpose(2, 0, 1)


def decode_image_base64(b64: str) -> np.ndarray:
    import base64
    import io

    from PIL import Image

    raw = base64.b64decode(b64.split(",")[-1])
    return preprocess_image(Image.open(io.BytesIO(raw)))


class ClipModel:
    def __init__(self, cfg: ClipVisionConfig, params: Params):
        self.cfg = cfg
        self.params = params
        self._embed = jax.jit(self._embed_impl)

    def _embed_impl(self, pixels):
        feats = encode_image_features(self.params, self.cfg, pixels)
        return project(self.params, feats)

    def image_embed(self, pixels: np.ndarray) -> jnp.ndarray:
        """(3, S, S) or (B, 3, S, S) -> (B, n_patches, llm_hidden)."""
        if pixels.ndim == 3:
            pixels = pixels[None]
        return self._embed(jnp.asarray(pixels))


def load_clip(path: str) -> ClipModel:
    """Load an mmproj GGUF (clip.cpp naming)."""
    with GGUFReader(path) as r:
        md = r.metadata
        cfg = ClipVisionConfig(
            image_size=int(md.get("clip.vision.image_size", 336)),
            patch_size=int(md.get("clip.vision.patch_size", 14)),
            hidden_size=int(md.get("clip.vision.embedding_length", 1024)),
            n_layers=int(md.get("clip.vision.block_count", 24)),
            n_heads=int(md.get("clip.vision.attention.head_count", 16)),
            intermediate_size=int(md.get("clip.vision.feed_forward_length", 4096)),
            eps=float(md.get("clip.vision.attention.layer_norm_epsilon", 1e-5)),
        )
        params = {name: jnp.asarray(r.tensor_data(name)) for name in r.tensors}
        if "v.class_embd" in params:
            params["v.class_embd"] = params["v.class_embd"].reshape(-1)
    return ClipModel(cfg, params)
