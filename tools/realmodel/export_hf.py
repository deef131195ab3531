"""Export the JAX-trained checkpoint (train.py .npz) to an HF LlamaForCausalLM
checkpoint directory, and verify logits parity against `transformers` (torch CPU).

The resulting directory is consumable by the REFERENCE's own converter
(`/root/reference/convert_hf_to_gguf.py`), which is the whole point: the GGUF
files used for the quality study are produced by reference tooling, not ours.

Usage: python tools/realmodel/export_hf.py CKPT.npz TOKENIZER_DIR OUTDIR
"""
from __future__ import annotations

import argparse
import json
import os
import shutil

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("tokenizer_dir")
    ap.add_argument("outdir")
    ap.add_argument("--skip-verify", action="store_true")
    args = ap.parse_args()

    z = np.load(args.ckpt)
    with open(args.ckpt + ".cfg.json") as fh:
        cfg = json.load(fh)

    tensors = {
        "model.embed_tokens.weight": z["embed"],
        "lm_head.weight": z["lm_head"],
        "model.norm.weight": z["final_norm"],
    }
    name_map = {"q": "self_attn.q_proj", "k": "self_attn.k_proj", "v": "self_attn.v_proj",
                "o": "self_attn.o_proj", "gate": "mlp.gate_proj", "up": "mlp.up_proj",
                "down": "mlp.down_proj", "ln1": "input_layernorm",
                "ln2": "post_attention_layernorm"}
    for i in range(cfg["layers"]):
        for short, full in name_map.items():
            tensors[f"model.layers.{i}.{full}.weight"] = z[f"layer{i}.{short}"]

    os.makedirs(args.outdir, exist_ok=True)
    from safetensors.numpy import save_file
    save_file({k: v.astype(np.float32) for k, v in tensors.items()},
              os.path.join(args.outdir, "model.safetensors"),
              metadata={"format": "pt"})

    hf_cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": cfg["vocab_size"],
        "hidden_size": cfg["hidden"],
        "intermediate_size": cfg["ffn"],
        "num_hidden_layers": cfg["layers"],
        "num_attention_heads": cfg["heads"],
        "num_key_value_heads": cfg["kv_heads"],
        "head_dim": cfg["head_dim"],
        "hidden_act": "silu",
        "max_position_embeddings": 2048,
        "rms_norm_eps": cfg["rms_eps"],
        "rope_theta": cfg["rope_theta"],
        "tie_word_embeddings": False,
        "attention_bias": False,
        "mlp_bias": False,
        "bos_token_id": 8190,
        "eos_token_id": 8191,
        "torch_dtype": "float32",
        "transformers_version": "4.44.0",
    }
    # correct the bos/eos ids from the tokenizer itself
    from tokenizers import Tokenizer
    tok = Tokenizer.from_file(os.path.join(args.tokenizer_dir, "tokenizer.json"))
    hf_cfg["bos_token_id"] = tok.token_to_id("<|begin_of_text|>")
    hf_cfg["eos_token_id"] = tok.token_to_id("<|end_of_text|>")
    with open(os.path.join(args.outdir, "config.json"), "w") as fh:
        json.dump(hf_cfg, fh, indent=1)
    for f in ("tokenizer.json", "tokenizer_config.json"):
        shutil.copy(os.path.join(args.tokenizer_dir, f), os.path.join(args.outdir, f))

    if not args.skip_verify:
        verify(args.outdir, cfg, z)
    print(f"exported -> {args.outdir}")


def verify(outdir, cfg, z):
    """Logits parity: torch transformers vs the JAX training forward."""
    import torch
    from transformers import LlamaForCausalLM
    model = LlamaForCausalLM.from_pretrained(outdir, torch_dtype=torch.float32)
    model.eval()
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg["vocab_size"], (2, 48))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()

    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    # the axon TPU plugin ignores JAX_PLATFORMS=cpu; force via config so this
    # tiny check doesn't dispatch op-by-op over the TPU tunnel
    jax.config.update("jax_platforms", "cpu")
    from train import forward, rope_tables
    params = {"embed": z["embed"], "lm_head": z["lm_head"], "final_norm": z["final_norm"],
              "layers": [{k: z[f"layer{i}.{k}"] for k in
                          ("q", "k", "v", "o", "gate", "up", "down", "ln1", "ln2")}
                         for i in range(cfg["layers"])]}
    cos, sin = rope_tables(toks.shape[1], cfg["head_dim"], cfg["rope_theta"])
    jx_logits = np.asarray(forward(params, np.asarray(toks), cfg, cos, sin))
    err = np.max(np.abs(hf_logits - jx_logits)) / (np.max(np.abs(hf_logits)) + 1e-9)
    print(f"HF-vs-JAX logits rel err: {err:.2e}")
    assert err < 2e-3, "export does not match transformers forward"


if __name__ == "__main__":
    main()
