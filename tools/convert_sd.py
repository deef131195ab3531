"""Diffusers-format Stable Diffusion 1.x checkpoint -> GGUF converter.

Reads the safetensors files of a diffusers model directory (unet/,
text_encoder/, vae/) and writes one GGUF in the layout models/sd.py consumes
(UNet + VAE keep diffusers names; text encoder maps to the compact text.*
names; VAE gets a "vae." prefix).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from koboldcpp_tpu.gguf import GGMLType, GGUFWriter  # noqa: E402


def _load_safetensors_dir(d: str) -> dict:
    from safetensors import safe_open

    state = {}
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".safetensors"):
            with safe_open(os.path.join(d, fn), framework="numpy") as f:
                for k in f.keys():
                    state[k] = f.get_tensor(k)
    return state


def map_text_encoder(state: dict) -> dict:
    """CLIPTextModel names -> text.* (same mapping the SD tests verify)."""
    out = {}
    T = "text_model."
    out["text.tok_embd"] = state[T + "embeddings.token_embedding.weight"]
    out["text.pos_embd"] = state[T + "embeddings.position_embedding.weight"]
    out["text.ln_final.weight"] = state[T + "final_layer_norm.weight"]
    out["text.ln_final.bias"] = state[T + "final_layer_norm.bias"]
    i = 0
    while f"{T}encoder.layers.{i}.layer_norm1.weight" in state:
        hp = f"{T}encoder.layers.{i}."
        gp = f"text.{i}."
        pairs = [("ln1", "layer_norm1"), ("ln2", "layer_norm2"),
                 ("q", "self_attn.q_proj"), ("k", "self_attn.k_proj"),
                 ("v", "self_attn.v_proj"), ("out", "self_attn.out_proj"),
                 ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")]
        for a, b in pairs:
            out[gp + a + ".weight"] = state[hp + b + ".weight"]
            out[gp + a + ".bias"] = state[hp + b + ".bias"]
        i += 1
    return out


def convert_sd_dir(model_dir: str, out_path: str,
                   quant_type: GGMLType = GGMLType.F16):
    unet = _load_safetensors_dir(os.path.join(model_dir, "unet"))
    text = _load_safetensors_dir(os.path.join(model_dir, "text_encoder"))
    vae = _load_safetensors_dir(os.path.join(model_dir, "vae"))
    with open(os.path.join(model_dir, "unet", "config.json")) as f:
        ucfg = json.load(f)
    with open(os.path.join(model_dir, "text_encoder", "config.json")) as f:
        tcfg = json.load(f)

    w = GGUFWriter(out_path, architecture="sd")
    w.add("sd.unet.model_channels", np.uint32(ucfg["block_out_channels"][0]))
    w.add("sd.unet.res_blocks", np.uint32(ucfg.get("layers_per_block", 2)))
    w.add("sd.unet.heads", np.uint32(8))
    w.add("sd.context_dim", np.uint32(ucfg.get("cross_attention_dim", 768)))
    mult = [c // ucfg["block_out_channels"][0] for c in ucfg["block_out_channels"]]
    w.add("sd.unet.channel_mult", np.asarray(mult, np.uint32))
    attn_levels = [i for i, b in enumerate(ucfg["down_block_types"])
                   if "CrossAttn" in b]
    w.add("sd.unet.attn_levels", np.asarray(attn_levels, np.uint32))
    w.add("sd.text.layers", np.uint32(tcfg["num_hidden_layers"]))
    w.add("sd.text.heads", np.uint32(tcfg["num_attention_heads"]))
    w.add("sd.text.dim", np.uint32(tcfg["hidden_size"]))
    w.add("sd.vae.ch", np.uint32(128))
    w.add("sd.text.vocab", np.uint32(tcfg["vocab_size"]))
    w.add("sd.text.ctx", np.uint32(tcfg.get("max_position_embeddings", 77)))
    w.add("sd.latent_channels", np.uint32(ucfg.get("in_channels", 4)))
    w.add("sd.vae.ch_mult", np.asarray([1, 2, 4, 4], np.uint32))

    def qt(arr):
        return (quant_type if arr.ndim == 2 and arr.shape[-1] % 32 == 0
                and quant_type != GGMLType.F32 else GGMLType.F32)

    for name, arr in unet.items():
        a = np.asarray(arr, np.float32)
        w.add_tensor(name, a, qt(a))
    for name, arr in map_text_encoder(text).items():
        a = np.asarray(arr, np.float32)
        w.add_tensor(name, a, qt(a))
    for name, arr in vae.items():
        a = np.asarray(arr, np.float32)
        w.add_tensor("vae." + name, a, qt(a))
    w.write()
    return out_path


def map_text_encoder2(state: dict) -> dict:
    """CLIPTextModelWithProjection (SDXL bigG tower) -> text2.* names."""
    out = {}
    T = "text_model."
    out["text2.tok_embd"] = state[T + "embeddings.token_embedding.weight"]
    out["text2.pos_embd"] = state[T + "embeddings.position_embedding.weight"]
    out["text2.ln_final.weight"] = state[T + "final_layer_norm.weight"]
    out["text2.ln_final.bias"] = state[T + "final_layer_norm.bias"]
    out["text2.projection"] = state["text_projection.weight"]
    i = 0
    while f"{T}encoder.layers.{i}.layer_norm1.weight" in state:
        hp = f"{T}encoder.layers.{i}."
        gp = f"text2.{i}."
        pairs = [("ln1", "layer_norm1"), ("ln2", "layer_norm2"),
                 ("q", "self_attn.q_proj"), ("k", "self_attn.k_proj"),
                 ("v", "self_attn.v_proj"), ("out", "self_attn.out_proj"),
                 ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")]
        for a, b in pairs:
            out[gp + a + ".weight"] = state[hp + b + ".weight"]
            out[gp + a + ".bias"] = state[hp + b + ".bias"]
        i += 1
    return out


def convert_sdxl_dir(model_dir: str, out_path: str,
                     quant_type: GGMLType = GGMLType.F16):
    """Diffusers SDXL directory -> GGUF (UNet with per-level transformer
    depth + linear projections + add_embedding; dual text encoders)."""
    unet = _load_safetensors_dir(os.path.join(model_dir, "unet"))
    text = _load_safetensors_dir(os.path.join(model_dir, "text_encoder"))
    text2 = _load_safetensors_dir(os.path.join(model_dir, "text_encoder_2"))
    vae = _load_safetensors_dir(os.path.join(model_dir, "vae"))
    with open(os.path.join(model_dir, "unet", "config.json")) as f:
        ucfg = json.load(f)
    with open(os.path.join(model_dir, "text_encoder", "config.json")) as f:
        tcfg = json.load(f)
    with open(os.path.join(model_dir, "text_encoder_2", "config.json")) as f:
        t2cfg = json.load(f)

    w = GGUFWriter(out_path, architecture="sd")
    base = ucfg["block_out_channels"][0]
    w.add("sd.unet.model_channels", np.uint32(base))
    w.add("sd.unet.res_blocks", np.uint32(ucfg.get("layers_per_block", 2)))
    w.add("sd.unet.heads", np.uint32(8))
    w.add("sd.unet.attn_head_dim", np.uint32(64))
    w.add("sd.unet.linear_proj", bool(ucfg.get("use_linear_projection", True)))
    depth = ucfg.get("transformer_layers_per_block", [1, 2, 10])
    if isinstance(depth, int):
        depth = [depth] * len(ucfg["block_out_channels"])
    w.add("sd.unet.transformer_depth", np.asarray(depth, np.uint32))
    w.add("sd.unet.add_embed_dim",
          np.uint32(ucfg.get("projection_class_embeddings_input_dim", 2816)))
    w.add("sd.context_dim", np.uint32(ucfg.get("cross_attention_dim", 2048)))
    mult = [c // base for c in ucfg["block_out_channels"]]
    w.add("sd.unet.channel_mult", np.asarray(mult, np.uint32))
    attn_levels = [i for i, b in enumerate(ucfg["down_block_types"])
                   if "CrossAttn" in b]
    w.add("sd.unet.attn_levels", np.asarray(attn_levels, np.uint32))
    w.add("sd.text.layers", np.uint32(tcfg["num_hidden_layers"]))
    w.add("sd.text.heads", np.uint32(tcfg["num_attention_heads"]))
    w.add("sd.text.dim", np.uint32(tcfg["hidden_size"]))
    w.add("sd.text.vocab", np.uint32(tcfg["vocab_size"]))
    w.add("sd.text.ctx", np.uint32(tcfg.get("max_position_embeddings", 77)))
    w.add("sd.text2.layers", np.uint32(t2cfg["num_hidden_layers"]))
    w.add("sd.text2.heads", np.uint32(t2cfg["num_attention_heads"]))
    w.add("sd.text2.dim", np.uint32(t2cfg["hidden_size"]))
    w.add("sd.text2.pooled_dim", np.uint32(t2cfg["projection_dim"]))
    w.add("sd.vae.ch", np.uint32(128))
    w.add("sd.vae.ch_mult", np.asarray([1, 2, 4, 4], np.uint32))
    w.add("sd.latent_channels", np.uint32(ucfg.get("in_channels", 4)))

    def qt(arr):
        return (quant_type if arr.ndim == 2 and arr.shape[-1] % 32 == 0
                and quant_type != GGMLType.F32 else GGMLType.F32)

    for name, arr in unet.items():
        a = np.asarray(arr, np.float32)
        w.add_tensor(name, a, qt(a))
    for name, arr in map_text_encoder(text).items():
        a = np.asarray(arr, np.float32)
        w.add_tensor(name, a, qt(a))
    for name, arr in map_text_encoder2(text2).items():
        a = np.asarray(arr, np.float32)
        w.add_tensor(name, a, qt(a))
    for name, arr in vae.items():
        a = np.asarray(arr, np.float32)
        w.add_tensor("vae." + name, a, qt(a))
    w.write()
    return out_path


def main():
    ap = argparse.ArgumentParser(description="Convert diffusers SD1.x/SDXL dir to GGUF")
    ap.add_argument("model_dir")
    ap.add_argument("--outfile", required=True)
    ap.add_argument("--xl", action="store_true", help="SDXL layout")
    args = ap.parse_args()
    if args.xl:
        convert_sdxl_dir(args.model_dir, args.outfile)
    else:
        convert_sd_dir(args.model_dir, args.outfile)
    print(f"wrote {args.outfile}")


if __name__ == "__main__":
    main()
