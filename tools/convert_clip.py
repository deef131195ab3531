"""HF CLIP-vision (+LLaVA projector) -> mmproj GGUF (clip.cpp tensor naming)."""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from koboldcpp_tpu.gguf import GGMLType, GGUFWriter  # noqa: E402


def convert_clip_state_dict(vision_state: dict, vision_config,
                            out_path: str,
                            projector_state: dict | None = None,
                            quant_type: GGMLType = GGMLType.F16):
    """vision_state: CLIPVisionModel state_dict. projector_state: optional
    {'mm.0.weight': ..., 'mm.0.bias': ..., 'mm.2.weight': ..., 'mm.2.bias': ...}."""
    w = GGUFWriter(out_path, architecture="clip")
    w.add("clip.has_vision_encoder", True)
    w.add("clip.has_llava_projector", projector_state is not None)
    w.add("clip.vision.image_size", np.uint32(vision_config.image_size))
    w.add("clip.vision.patch_size", np.uint32(vision_config.patch_size))
    w.add("clip.vision.embedding_length", np.uint32(vision_config.hidden_size))
    w.add("clip.vision.block_count", np.uint32(vision_config.num_hidden_layers))
    w.add("clip.vision.attention.head_count",
          np.uint32(vision_config.num_attention_heads))
    w.add("clip.vision.feed_forward_length",
          np.uint32(vision_config.intermediate_size))
    w.add("clip.vision.attention.layer_norm_epsilon",
          np.float32(getattr(vision_config, "layer_norm_eps", 1e-5)))

    def get(name):
        return np.asarray(vision_state[name], dtype=np.float32)

    def qt(arr):
        return quant_type if (arr.ndim == 2 and arr.shape[-1] % 32 == 0
                              and quant_type != GGMLType.F32) else GGMLType.F32

    def add(name, arr):
        w.add_tensor(name, arr, qt(arr))

    V = "vision_model."
    add("v.patch_embd.weight", get(V + "embeddings.patch_embedding.weight"))
    add("v.class_embd", get(V + "embeddings.class_embedding").reshape(-1))
    add("v.position_embd.weight", get(V + "embeddings.position_embedding.weight"))
    add("v.pre_ln.weight", get(V + "pre_layrnorm.weight"))
    add("v.pre_ln.bias", get(V + "pre_layrnorm.bias"))
    for i in range(vision_config.num_hidden_layers):
        hp = f"{V}encoder.layers.{i}."
        gp = f"v.blk.{i}."
        add(gp + "ln1.weight", get(hp + "layer_norm1.weight"))
        add(gp + "ln1.bias", get(hp + "layer_norm1.bias"))
        add(gp + "attn_q.weight", get(hp + "self_attn.q_proj.weight"))
        add(gp + "attn_q.bias", get(hp + "self_attn.q_proj.bias"))
        add(gp + "attn_k.weight", get(hp + "self_attn.k_proj.weight"))
        add(gp + "attn_k.bias", get(hp + "self_attn.k_proj.bias"))
        add(gp + "attn_v.weight", get(hp + "self_attn.v_proj.weight"))
        add(gp + "attn_v.bias", get(hp + "self_attn.v_proj.bias"))
        add(gp + "attn_out.weight", get(hp + "self_attn.out_proj.weight"))
        add(gp + "attn_out.bias", get(hp + "self_attn.out_proj.bias"))
        add(gp + "ln2.weight", get(hp + "layer_norm2.weight"))
        add(gp + "ln2.bias", get(hp + "layer_norm2.bias"))
        add(gp + "ffn_up.weight", get(hp + "mlp.fc1.weight"))
        add(gp + "ffn_up.bias", get(hp + "mlp.fc1.bias"))
        add(gp + "ffn_down.weight", get(hp + "mlp.fc2.weight"))
        add(gp + "ffn_down.bias", get(hp + "mlp.fc2.bias"))
    if projector_state:
        for name, arr in projector_state.items():
            add(name, np.asarray(arr, np.float32))
    w.write()
    return out_path


def main():
    ap = argparse.ArgumentParser(
        description="Convert HF llava / CLIP-vision to mmproj GGUF")
    ap.add_argument("model_dir")
    ap.add_argument("--outfile", required=True)
    args = ap.parse_args()
    from transformers import LlavaForConditionalGeneration

    model = LlavaForConditionalGeneration.from_pretrained(args.model_dir)
    vs = {k.replace("vision_tower.", ""): v.numpy()
          for k, v in model.state_dict().items() if k.startswith("vision_tower.")}
    ps = {
        "mm.0.weight": model.multi_modal_projector.linear_1.weight.detach().numpy(),
        "mm.0.bias": model.multi_modal_projector.linear_1.bias.detach().numpy(),
        "mm.2.weight": model.multi_modal_projector.linear_2.weight.detach().numpy(),
        "mm.2.bias": model.multi_modal_projector.linear_2.bias.detach().numpy(),
    }
    convert_clip_state_dict(vs, model.config.vision_config, args.outfile, ps)
    print(f"wrote {args.outfile}")


if __name__ == "__main__":
    main()
