"""Minimal HF -> GGUF converter for llama-family checkpoints.

Counterpart of the reference's convert_hf_to_gguf.py (LlamaModel path,
including its q/k head permutation) — reimplemented against the GGUF writer in
koboldcpp_tpu. Works on an in-memory transformers model (tests) or a local
checkpoint directory (CLI).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from koboldcpp_tpu.gguf import GGMLType, GGUFWriter  # noqa: E402


def permute_qk(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF rotate-half rope -> ggml 'norm' (adjacent-pair) rope weight permute.
    Same transform as the reference converter's LlamaModel.permute."""
    out_dim = w.shape[0]
    return (w.reshape(n_head, 2, out_dim // n_head // 2, *w.shape[1:])
             .swapaxes(1, 2)
             .reshape(w.shape))


def convert_llama_state_dict(
    state: dict, config, out_path: str,
    tokenizer_md: dict | None = None,
    quant_type: GGMLType = GGMLType.F32,
    quant_overrides: dict[str, GGMLType] | None = None,
):
    """state: HF-style state_dict of numpy arrays. config: HF LlamaConfig-like."""
    n_head = config.num_attention_heads
    n_kv = getattr(config, "num_key_value_heads", n_head) or n_head
    n_layers = config.num_hidden_layers
    head_dim = getattr(config, "head_dim", None) or config.hidden_size // n_head

    w = GGUFWriter(out_path, architecture="llama")
    w.add("general.name", getattr(config, "name_or_path", "") or "converted")
    w.add("llama.context_length", np.uint32(config.max_position_embeddings))
    w.add("llama.embedding_length", np.uint32(config.hidden_size))
    w.add("llama.block_count", np.uint32(n_layers))
    w.add("llama.feed_forward_length", np.uint32(config.intermediate_size))
    w.add("llama.attention.head_count", np.uint32(n_head))
    w.add("llama.attention.head_count_kv", np.uint32(n_kv))
    w.add("llama.attention.key_length", np.uint32(head_dim))
    w.add("llama.attention.value_length", np.uint32(head_dim))
    w.add("llama.attention.layer_norm_rms_epsilon", np.float32(config.rms_norm_eps))
    w.add("llama.rope.freq_base", np.float32(getattr(config, "rope_theta", 10000.0)))
    w.add("llama.rope.dimension_count", np.uint32(head_dim))
    w.add("llama.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    overrides = quant_overrides or {}

    def qt_for(gguf_name, arr):
        t = overrides.get(gguf_name, quant_type)
        # 1-D tensors and tiny rows stay f32
        if arr.ndim == 1 or arr.shape[-1] % 256:
            t = GGMLType.F32 if arr.shape[-1] % 32 else (
                t if t in (GGMLType.F16, GGMLType.F32, GGMLType.Q8_0,
                           GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0,
                           GGMLType.Q5_1) else GGMLType.F32)
        if arr.ndim == 1:
            t = GGMLType.F32
        return t

    def add(gguf_name, arr):
        w.add_tensor(gguf_name, arr, qt_for(gguf_name, arr))

    add("token_embd.weight", get("model.embed_tokens.weight"))
    add("output_norm.weight", get("model.norm.weight"))
    if "lm_head.weight" in state:
        add("output.weight", get("lm_head.weight"))
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        add(gp + "attn_norm.weight", get(hp + "input_layernorm.weight"))
        add(gp + "attn_q.weight", permute_qk(get(hp + "self_attn.q_proj.weight"), n_head))
        add(gp + "attn_k.weight", permute_qk(get(hp + "self_attn.k_proj.weight"), n_kv))
        add(gp + "attn_v.weight", get(hp + "self_attn.v_proj.weight"))
        add(gp + "attn_output.weight", get(hp + "self_attn.o_proj.weight"))
        add(gp + "ffn_norm.weight", get(hp + "post_attention_layernorm.weight"))
        add(gp + "ffn_gate.weight", get(hp + "mlp.gate_proj.weight"))
        add(gp + "ffn_up.weight", get(hp + "mlp.up_proj.weight"))
        add(gp + "ffn_down.weight", get(hp + "mlp.down_proj.weight"))
    w.write()
    return out_path


def convert_arch_state_dict(arch: str, state: dict, config, out_path: str,
                            tokenizer_md: dict | None = None,
                            quant_type: GGMLType = GGMLType.F32):
    """qwen2 / gemma2 / phi3 -> GGUF (all NEOX-rope archs: no q/k permute,
    matching the reference converter's per-model classes)."""
    n_head = config.num_attention_heads
    n_kv = getattr(config, "num_key_value_heads", n_head) or n_head
    n_layers = config.num_hidden_layers
    head_dim = getattr(config, "head_dim", None) or config.hidden_size // n_head

    w = GGUFWriter(out_path, architecture=arch)
    w.add("general.name", f"{arch}-converted")
    w.add(f"{arch}.context_length", np.uint32(config.max_position_embeddings))
    w.add(f"{arch}.embedding_length", np.uint32(config.hidden_size))
    w.add(f"{arch}.block_count", np.uint32(n_layers))
    w.add(f"{arch}.feed_forward_length", np.uint32(config.intermediate_size))
    w.add(f"{arch}.attention.head_count", np.uint32(n_head))
    w.add(f"{arch}.attention.head_count_kv", np.uint32(n_kv))
    w.add(f"{arch}.attention.key_length", np.uint32(head_dim))
    w.add(f"{arch}.attention.value_length", np.uint32(head_dim))
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", np.float32(config.rms_norm_eps))
    w.add(f"{arch}.rope.freq_base", np.float32(getattr(config, "rope_theta", 10000.0)))
    w.add(f"{arch}.rope.dimension_count", np.uint32(head_dim))
    w.add(f"{arch}.vocab_size", np.uint32(config.vocab_size))
    if arch == "gemma2":
        w.add(f"{arch}.attn_logit_softcapping",
              np.float32(config.attn_logit_softcapping))
        w.add(f"{arch}.final_logit_softcapping",
              np.float32(config.final_logit_softcapping))
        w.add(f"{arch}.attention.sliding_window", np.uint32(config.sliding_window))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    def norm(name):
        v = get(name)
        # gemma RMSNorm is (1 + w); reference converter folds the +1 in
        return v + 1.0 if arch in ("gemma", "gemma2") else v

    def add(gguf_name, arr, t=None):
        if t is None:
            t = quant_type if (arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(gguf_name, arr, t)

    add("token_embd.weight", get("model.embed_tokens.weight"))
    add("output_norm.weight", norm("model.norm.weight"), GGMLType.F32)
    if "lm_head.weight" in state:
        add("output.weight", get("lm_head.weight"))
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        add(gp + "attn_norm.weight", norm(hp + "input_layernorm.weight"), GGMLType.F32)
        if arch == "phi3":
            add(gp + "attn_qkv.weight", get(hp + "self_attn.qkv_proj.weight"))
            add(gp + "ffn_up.weight", get(hp + "mlp.gate_up_proj.weight"))
            add(gp + "ffn_norm.weight", norm(hp + "post_attention_layernorm.weight"), GGMLType.F32)
        else:
            add(gp + "attn_q.weight", get(hp + "self_attn.q_proj.weight"))
            add(gp + "attn_k.weight", get(hp + "self_attn.k_proj.weight"))
            add(gp + "attn_v.weight", get(hp + "self_attn.v_proj.weight"))
            if arch == "qwen2":
                for b, nm in (("attn_q.bias", "q_proj.bias"),
                              ("attn_k.bias", "k_proj.bias"),
                              ("attn_v.bias", "v_proj.bias")):
                    add(gp + b, get(hp + "self_attn." + nm), GGMLType.F32)
            if arch == "gemma2":
                add(gp + "attn_post_norm.weight",
                    norm(hp + "post_attention_layernorm.weight"), GGMLType.F32)
                add(gp + "ffn_norm.weight",
                    norm(hp + "pre_feedforward_layernorm.weight"), GGMLType.F32)
                add(gp + "ffn_post_norm.weight",
                    norm(hp + "post_feedforward_layernorm.weight"), GGMLType.F32)
            else:
                add(gp + "ffn_norm.weight",
                    norm(hp + "post_attention_layernorm.weight"), GGMLType.F32)
            add(gp + "ffn_gate.weight", get(hp + "mlp.gate_proj.weight"))
            add(gp + "ffn_up.weight", get(hp + "mlp.up_proj.weight"))
        add(gp + "attn_output.weight", get(hp + "self_attn.o_proj.weight"))
        add(gp + "ffn_down.weight", get(hp + "mlp.down_proj.weight"))
    w.write()
    return out_path


def convert_gpt2_state_dict(state: dict, config, out_path: str,
                            tokenizer_md: dict | None = None,
                            quant_type: GGMLType = GGMLType.F32):
    """HF GPT-2 -> GGUF (arch gpt2: layernorm, learned positions, fused QKV).
    HF Conv1D stores weights transposed (in, out) — transposed here."""
    n_layers = config.n_layer
    w = GGUFWriter(out_path, architecture="gpt2")
    w.add("gpt2.context_length", np.uint32(config.n_positions))
    w.add("gpt2.embedding_length", np.uint32(config.n_embd))
    w.add("gpt2.block_count", np.uint32(n_layers))
    w.add("gpt2.feed_forward_length", np.uint32(4 * config.n_embd))
    w.add("gpt2.attention.head_count", np.uint32(config.n_head))
    w.add("gpt2.attention.layer_norm_epsilon", np.float32(config.layer_norm_epsilon))
    w.add("gpt2.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name, transpose=False):
        a = np.asarray(state[name], dtype=np.float32)
        return a.T.copy() if transpose else a

    w.add_tensor("token_embd.weight", get("transformer.wte.weight"), quant_type)
    w.add_tensor("position_embd.weight", get("transformer.wpe.weight"), GGMLType.F32)
    w.add_tensor("output_norm.weight", get("transformer.ln_f.weight"), GGMLType.F32)
    w.add_tensor("output_norm.bias", get("transformer.ln_f.bias"), GGMLType.F32)
    for i in range(n_layers):
        hp = f"transformer.h.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "ln_1.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_norm.bias", get(hp + "ln_1.bias"), GGMLType.F32)
        w.add_tensor(gp + "attn_qkv.weight", get(hp + "attn.c_attn.weight", True), quant_type)
        w.add_tensor(gp + "attn_qkv.bias", get(hp + "attn.c_attn.bias"), GGMLType.F32)
        w.add_tensor(gp + "attn_output.weight", get(hp + "attn.c_proj.weight", True), quant_type)
        w.add_tensor(gp + "attn_output.bias", get(hp + "attn.c_proj.bias"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "ln_2.weight"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.bias", get(hp + "ln_2.bias"), GGMLType.F32)
        w.add_tensor(gp + "ffn_up.weight", get(hp + "mlp.c_fc.weight", True), quant_type)
        w.add_tensor(gp + "ffn_up.bias", get(hp + "mlp.c_fc.bias"), GGMLType.F32)
        w.add_tensor(gp + "ffn_down.weight", get(hp + "mlp.c_proj.weight", True), quant_type)
        w.add_tensor(gp + "ffn_down.bias", get(hp + "mlp.c_proj.bias"), GGMLType.F32)
    w.write()
    return out_path


def convert_gptneox_state_dict(state: dict, config, out_path: str,
                               tokenizer_md: dict | None = None,
                               quant_type: GGMLType = GGMLType.F32):
    """HF GPT-NeoX -> GGUF: de-interleaves the (head, [q,k,v], hd) fused QKV
    into [Q;K;V] row blocks (same transform as the reference converter)."""
    n_layers = config.num_hidden_layers
    H = config.num_attention_heads
    hidden = config.hidden_size
    hd = hidden // H
    w = GGUFWriter(out_path, architecture="gptneox")
    w.add("gptneox.context_length", np.uint32(config.max_position_embeddings))
    w.add("gptneox.embedding_length", np.uint32(hidden))
    w.add("gptneox.block_count", np.uint32(n_layers))
    w.add("gptneox.feed_forward_length", np.uint32(config.intermediate_size))
    w.add("gptneox.attention.head_count", np.uint32(H))
    w.add("gptneox.attention.layer_norm_epsilon", np.float32(config.layer_norm_eps))
    w.add("gptneox.rope.dimension_count",
          np.uint32(int(hd * config.rotary_pct)))
    w.add("gptneox.rope.freq_base", np.float32(getattr(config, "rotary_emb_base", 10000)))
    w.add("gptneox.use_parallel_residual", bool(config.use_parallel_residual))
    w.add("gptneox.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    def deinterleave_w(qkv):  # (3*hidden, hidden) head-interleaved -> [Q;K;V]
        v = qkv.reshape(H, 3, hd, hidden)
        return np.concatenate([v[:, 0].reshape(hidden, hidden),
                               v[:, 1].reshape(hidden, hidden),
                               v[:, 2].reshape(hidden, hidden)], axis=0)

    def deinterleave_b(b):
        v = b.reshape(H, 3, hd)
        return np.concatenate([v[:, 0].reshape(-1), v[:, 1].reshape(-1),
                               v[:, 2].reshape(-1)])

    w.add_tensor("token_embd.weight", get("gpt_neox.embed_in.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("gpt_neox.final_layer_norm.weight"), GGMLType.F32)
    w.add_tensor("output_norm.bias", get("gpt_neox.final_layer_norm.bias"), GGMLType.F32)
    if "embed_out.weight" in state:
        w.add_tensor("output.weight", get("embed_out.weight"), quant_type)
    for i in range(n_layers):
        hp = f"gpt_neox.layers.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "input_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_norm.bias", get(hp + "input_layernorm.bias"), GGMLType.F32)
        w.add_tensor(gp + "attn_qkv.weight",
                     deinterleave_w(get(hp + "attention.query_key_value.weight")), quant_type)
        w.add_tensor(gp + "attn_qkv.bias",
                     deinterleave_b(get(hp + "attention.query_key_value.bias")), GGMLType.F32)
        w.add_tensor(gp + "attn_output.weight", get(hp + "attention.dense.weight"), quant_type)
        w.add_tensor(gp + "attn_output.bias", get(hp + "attention.dense.bias"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "post_attention_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.bias", get(hp + "post_attention_layernorm.bias"), GGMLType.F32)
        w.add_tensor(gp + "ffn_up.weight", get(hp + "mlp.dense_h_to_4h.weight"), quant_type)
        w.add_tensor(gp + "ffn_up.bias", get(hp + "mlp.dense_h_to_4h.bias"), GGMLType.F32)
        w.add_tensor(gp + "ffn_down.weight", get(hp + "mlp.dense_4h_to_h.weight"), quant_type)
        w.add_tensor(gp + "ffn_down.bias", get(hp + "mlp.dense_4h_to_h.bias"), GGMLType.F32)
    w.write()
    return out_path


def convert_mixtral_state_dict(
    state: dict, config, out_path: str,
    tokenizer_md: dict | None = None,
    quant_type: GGMLType = GGMLType.F32,
):
    """Mixtral (sparse-MoE llama) -> GGUF, expert stacks as 3-D tensors
    (reference converter's MixtralModel path: w1=gate, w3=up, w2=down)."""
    n_head = config.num_attention_heads
    n_kv = getattr(config, "num_key_value_heads", n_head) or n_head
    n_layers = config.num_hidden_layers
    head_dim = config.hidden_size // n_head

    w = GGUFWriter(out_path, architecture="llama")
    w.add("general.name", "mixtral-converted")
    w.add("llama.context_length", np.uint32(config.max_position_embeddings))
    w.add("llama.embedding_length", np.uint32(config.hidden_size))
    w.add("llama.block_count", np.uint32(n_layers))
    w.add("llama.feed_forward_length", np.uint32(config.intermediate_size))
    w.add("llama.attention.head_count", np.uint32(n_head))
    w.add("llama.attention.head_count_kv", np.uint32(n_kv))
    w.add("llama.attention.layer_norm_rms_epsilon", np.float32(config.rms_norm_eps))
    w.add("llama.rope.freq_base", np.float32(getattr(config, "rope_theta", 10000.0)))
    w.add("llama.rope.dimension_count", np.uint32(head_dim))
    w.add("llama.expert_count", np.uint32(config.num_local_experts))
    w.add("llama.expert_used_count", np.uint32(config.num_experts_per_tok))
    w.add("llama.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("model.embed_tokens.weight"), GGMLType.F32)
    w.add_tensor("output_norm.weight", get("model.norm.weight"), GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", get("lm_head.weight"), GGMLType.F32)
    E = config.num_local_experts
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "input_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_q.weight",
                     permute_qk(get(hp + "self_attn.q_proj.weight"), n_head), quant_type)
        w.add_tensor(gp + "attn_k.weight",
                     permute_qk(get(hp + "self_attn.k_proj.weight"), n_kv), quant_type)
        w.add_tensor(gp + "attn_v.weight", get(hp + "self_attn.v_proj.weight"), quant_type)
        w.add_tensor(gp + "attn_output.weight", get(hp + "self_attn.o_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "post_attention_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "ffn_gate_inp.weight",
                     get(hp + "block_sparse_moe.gate.weight"), GGMLType.F32)
        gate = np.stack([get(hp + f"block_sparse_moe.experts.{e}.w1.weight") for e in range(E)])
        down = np.stack([get(hp + f"block_sparse_moe.experts.{e}.w2.weight") for e in range(E)])
        up = np.stack([get(hp + f"block_sparse_moe.experts.{e}.w3.weight") for e in range(E)])
        w.add_tensor(gp + "ffn_gate_exps.weight", gate, GGMLType.F32)
        w.add_tensor(gp + "ffn_up_exps.weight", up, GGMLType.F32)
        w.add_tensor(gp + "ffn_down_exps.weight", down, GGMLType.F32)
    w.write()
    return out_path


def main():
    ap = argparse.ArgumentParser(description="Convert HF llama checkpoint to GGUF")
    ap.add_argument("model_dir")
    ap.add_argument("--outfile", required=True)
    ap.add_argument("--outtype", default="f16",
                    choices=["f32", "f16", "q8_0", "q4_k", "q5_k", "q6_k"])
    args = ap.parse_args()
    import torch  # noqa: F401
    from transformers import AutoConfig, AutoModelForCausalLM

    cfg = AutoConfig.from_pretrained(args.model_dir)
    model = AutoModelForCausalLM.from_pretrained(args.model_dir, torch_dtype="float32")
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    t = {"f32": GGMLType.F32, "f16": GGMLType.F16, "q8_0": GGMLType.Q8_0,
         "q4_k": GGMLType.Q4_K, "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[args.outtype]
    convert_llama_state_dict(state, cfg, args.outfile, quant_type=t)
    print(f"wrote {args.outfile}")


if __name__ == "__main__":
    main()


def convert_falcon_state_dict(state: dict, config, out_path: str,
                              tokenizer_md: dict | None = None,
                              quant_type: GGMLType = GGMLType.F32):
    """HF Falcon (7b-style: multi_query, parallel_attn, shared input LN) ->
    GGUF. The fused query_key_value is already [Q-heads | K | V] in
    multi-query layout; the shared layernorm is written as both attn_norm and
    ffn_norm (parallel residual reads the same tensor, like build_falcon)."""
    n_layers = config.num_hidden_layers
    H = config.num_attention_heads
    hidden = config.hidden_size
    hd = hidden // H
    n_kv = config.num_kv_heads if getattr(config, "new_decoder_architecture", False) else 1
    w = GGUFWriter(out_path, architecture="falcon")
    w.add("falcon.context_length", np.uint32(getattr(config, "max_position_embeddings", 2048)))
    w.add("falcon.embedding_length", np.uint32(hidden))
    w.add("falcon.block_count", np.uint32(n_layers))
    w.add("falcon.feed_forward_length", np.uint32(getattr(config, "ffn_hidden_size", 4 * hidden)))
    w.add("falcon.attention.head_count", np.uint32(H))
    w.add("falcon.attention.head_count_kv", np.uint32(n_kv))
    w.add("falcon.attention.layer_norm_epsilon",
          np.float32(getattr(config, "layer_norm_epsilon", 1e-5)))
    w.add("falcon.rope.dimension_count", np.uint32(hd))
    w.add("falcon.rope.freq_base", np.float32(getattr(config, "rope_theta", 10000.0)))
    w.add("falcon.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("transformer.word_embeddings.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("transformer.ln_f.weight"), GGMLType.F32)
    w.add_tensor("output_norm.bias", get("transformer.ln_f.bias"), GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"transformer.h.{i}."
        gp = f"blk.{i}."
        ln_w = get(hp + "input_layernorm.weight")
        ln_b = get(hp + "input_layernorm.bias")
        w.add_tensor(gp + "attn_norm.weight", ln_w, GGMLType.F32)
        w.add_tensor(gp + "attn_norm.bias", ln_b, GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", ln_w, GGMLType.F32)  # shared LN
        w.add_tensor(gp + "ffn_norm.bias", ln_b, GGMLType.F32)
        w.add_tensor(gp + "attn_qkv.weight",
                     get(hp + "self_attention.query_key_value.weight"), quant_type)
        w.add_tensor(gp + "attn_output.weight",
                     get(hp + "self_attention.dense.weight"), quant_type)
        w.add_tensor(gp + "ffn_up.weight",
                     get(hp + "mlp.dense_h_to_4h.weight"), quant_type)
        w.add_tensor(gp + "ffn_down.weight",
                     get(hp + "mlp.dense_4h_to_h.weight"), quant_type)
    w.write()
    return out_path


def convert_stablelm_state_dict(state: dict, config, out_path: str,
                                tokenizer_md: dict | None = None,
                                quant_type: GGMLType = GGMLType.F32):
    """HF StableLM -> GGUF: LayerNorm (with bias) + partial NEOX rotary +
    silu-gated FFN."""
    n_head = config.num_attention_heads
    n_kv = getattr(config, "num_key_value_heads", n_head) or n_head
    n_layers = config.num_hidden_layers
    hd = config.hidden_size // n_head
    w = GGUFWriter(out_path, architecture="stablelm")
    w.add("stablelm.context_length", np.uint32(config.max_position_embeddings))
    w.add("stablelm.embedding_length", np.uint32(config.hidden_size))
    w.add("stablelm.block_count", np.uint32(n_layers))
    w.add("stablelm.feed_forward_length", np.uint32(config.intermediate_size))
    w.add("stablelm.attention.head_count", np.uint32(n_head))
    w.add("stablelm.attention.head_count_kv", np.uint32(n_kv))
    w.add("stablelm.attention.layer_norm_epsilon",
          np.float32(config.layer_norm_eps))
    w.add("stablelm.rope.dimension_count",
          np.uint32(int(hd * config.partial_rotary_factor)))
    w.add("stablelm.rope.freq_base", np.float32(config.rope_theta))
    w.add("stablelm.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("model.embed_tokens.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("model.norm.weight"), GGMLType.F32)
    w.add_tensor("output_norm.bias", get("model.norm.bias"), GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "input_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_norm.bias", get(hp + "input_layernorm.bias"), GGMLType.F32)
        w.add_tensor(gp + "attn_q.weight", get(hp + "self_attn.q_proj.weight"), quant_type)
        w.add_tensor(gp + "attn_k.weight", get(hp + "self_attn.k_proj.weight"), quant_type)
        w.add_tensor(gp + "attn_v.weight", get(hp + "self_attn.v_proj.weight"), quant_type)
        w.add_tensor(gp + "attn_output.weight", get(hp + "self_attn.o_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "post_attention_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.bias", get(hp + "post_attention_layernorm.bias"), GGMLType.F32)
        w.add_tensor(gp + "ffn_gate.weight", get(hp + "mlp.gate_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_up.weight", get(hp + "mlp.up_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_down.weight", get(hp + "mlp.down_proj.weight"), quant_type)
    w.write()
    return out_path


def convert_phi2_state_dict(state: dict, config, out_path: str,
                            tokenizer_md: dict | None = None,
                            quant_type: GGMLType = GGMLType.F32):
    """HF Phi (phi-2) -> GGUF: shared LayerNorm feeding parallel attn+MLP,
    partial NEOX rotary, biases everywhere incl. lm_head."""
    n_head = config.num_attention_heads
    n_kv = getattr(config, "num_key_value_heads", n_head) or n_head
    n_layers = config.num_hidden_layers
    hd = config.hidden_size // n_head
    w = GGUFWriter(out_path, architecture="phi2")
    w.add("phi2.context_length", np.uint32(config.max_position_embeddings))
    w.add("phi2.embedding_length", np.uint32(config.hidden_size))
    w.add("phi2.block_count", np.uint32(n_layers))
    w.add("phi2.feed_forward_length", np.uint32(config.intermediate_size))
    w.add("phi2.attention.head_count", np.uint32(n_head))
    w.add("phi2.attention.head_count_kv", np.uint32(n_kv))
    w.add("phi2.attention.layer_norm_epsilon", np.float32(config.layer_norm_eps))
    w.add("phi2.rope.dimension_count",
          np.uint32(int(hd * config.partial_rotary_factor)))
    w.add("phi2.rope.freq_base", np.float32(config.rope_theta))
    w.add("phi2.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("model.embed_tokens.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("model.final_layernorm.weight"), GGMLType.F32)
    w.add_tensor("output_norm.bias", get("model.final_layernorm.bias"), GGMLType.F32)
    w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    w.add_tensor("output.bias", get("lm_head.bias"), GGMLType.F32)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        # one shared LayerNorm feeds both branches; written under both names
        for tgt in ("attn_norm", "ffn_norm"):
            w.add_tensor(gp + tgt + ".weight", get(hp + "input_layernorm.weight"), GGMLType.F32)
            w.add_tensor(gp + tgt + ".bias", get(hp + "input_layernorm.bias"), GGMLType.F32)
        for gn, hn in (("attn_q", "self_attn.q_proj"), ("attn_k", "self_attn.k_proj"),
                       ("attn_v", "self_attn.v_proj"), ("attn_output", "self_attn.dense"),
                       ("ffn_up", "mlp.fc1"), ("ffn_down", "mlp.fc2")):
            w.add_tensor(gp + gn + ".weight", get(hp + hn + ".weight"), quant_type)
            w.add_tensor(gp + gn + ".bias", get(hp + hn + ".bias"), GGMLType.F32)
    w.write()
    return out_path


def convert_olmo_state_dict(state: dict, config, out_path: str,
                            tokenizer_md: dict | None = None,
                            quant_type: GGMLType = GGMLType.F32):
    """HF OLMo -> GGUF: non-parametric LayerNorm (written as identity affine:
    weight=1, bias=0), full NEOX rotary, silu-gated FFN, no biases."""
    n_head = config.num_attention_heads
    n_kv = getattr(config, "num_key_value_heads", n_head) or n_head
    n_layers = config.num_hidden_layers
    H = config.hidden_size
    w = GGUFWriter(out_path, architecture="olmo")
    w.add("olmo.context_length", np.uint32(config.max_position_embeddings))
    w.add("olmo.embedding_length", np.uint32(H))
    w.add("olmo.block_count", np.uint32(n_layers))
    w.add("olmo.feed_forward_length", np.uint32(config.intermediate_size))
    w.add("olmo.attention.head_count", np.uint32(n_head))
    w.add("olmo.attention.head_count_kv", np.uint32(n_kv))
    w.add("olmo.attention.layer_norm_epsilon", np.float32(1e-5))
    w.add("olmo.rope.freq_base", np.float32(config.rope_theta))
    w.add("olmo.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    ones = np.ones(H, np.float32)
    w.add_tensor("token_embd.weight", get("model.embed_tokens.weight"), quant_type)
    w.add_tensor("output_norm.weight", ones, GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", ones, GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", ones, GGMLType.F32)
        for gn, hn in (("attn_q", "self_attn.q_proj"), ("attn_k", "self_attn.k_proj"),
                       ("attn_v", "self_attn.v_proj"), ("attn_output", "self_attn.o_proj"),
                       ("ffn_gate", "mlp.gate_proj"), ("ffn_up", "mlp.up_proj"),
                       ("ffn_down", "mlp.down_proj")):
            w.add_tensor(gp + gn + ".weight", get(hp + hn + ".weight"), quant_type)
    w.write()
    return out_path


def convert_mpt_state_dict(state: dict, config, out_path: str,
                           tokenizer_md: dict | None = None,
                           quant_type: GGMLType = GGMLType.F32):
    """HF MPT -> GGUF: ALiBi (no positions), fused Wqkv, bias-free LayerNorm
    and projections, exact (non-tanh) GELU."""
    n_head = config.n_heads
    n_layers = config.n_layers
    H = config.d_model
    attn_cfg = getattr(config, "attn_config", None)
    alibi_max = 8.0
    clip_qkv = 0.0
    if attn_cfg is not None:
        alibi_max = float(getattr(attn_cfg, "alibi_bias_max", 8.0) or 8.0)
        clip_qkv = float(getattr(attn_cfg, "clip_qkv", 0.0) or 0.0)
    w = GGUFWriter(out_path, architecture="mpt")
    w.add("mpt.context_length", np.uint32(config.max_seq_len))
    w.add("mpt.embedding_length", np.uint32(H))
    w.add("mpt.block_count", np.uint32(n_layers))
    d_ff = int(state["transformer.blocks.0.ffn.up_proj.weight"].shape[0])
    w.add("mpt.feed_forward_length", np.uint32(d_ff))
    w.add("mpt.attention.head_count", np.uint32(n_head))
    w.add("mpt.attention.layer_norm_epsilon", np.float32(
        getattr(config, "layer_norm_epsilon", 1e-5)))
    w.add("mpt.attention.max_alibi_bias", np.float32(alibi_max))
    if clip_qkv:
        w.add("mpt.attention.clamp_kqv", np.float32(clip_qkv))
    w.add("mpt.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    ones = np.ones(H, np.float32)
    w.add_tensor("token_embd.weight", get("transformer.wte.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("transformer.norm_f.weight"), GGMLType.F32)
    for i in range(n_layers):
        hp = f"transformer.blocks.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "norm_1.weight"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "norm_2.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_qkv.weight", get(hp + "attn.Wqkv.weight"), quant_type)
        w.add_tensor(gp + "attn_output.weight", get(hp + "attn.out_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_up.weight", get(hp + "ffn.up_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_down.weight", get(hp + "ffn.down_proj.weight"), quant_type)
    w.write()
    return out_path


def convert_commandr_state_dict(state: dict, config, out_path: str,
                                tokenizer_md: dict | None = None,
                                quant_type: GGMLType = GGMLType.F32):
    """HF Cohere (Command-R) -> GGUF: shared bias-free LayerNorm feeding
    parallel attn+FFN, adjacent-pair rope (no permute needed: HF Cohere uses
    repeat_interleave rotary), tied embeddings with logit_scale."""
    n_head = config.num_attention_heads
    n_kv = getattr(config, "num_key_value_heads", n_head) or n_head
    n_layers = config.num_hidden_layers
    w = GGUFWriter(out_path, architecture="command-r")
    w.add("command-r.context_length", np.uint32(config.max_position_embeddings))
    w.add("command-r.embedding_length", np.uint32(config.hidden_size))
    w.add("command-r.block_count", np.uint32(n_layers))
    w.add("command-r.feed_forward_length", np.uint32(config.intermediate_size))
    w.add("command-r.attention.head_count", np.uint32(n_head))
    w.add("command-r.attention.head_count_kv", np.uint32(n_kv))
    w.add("command-r.attention.layer_norm_epsilon",
          np.float32(config.layer_norm_eps))
    w.add("command-r.rope.freq_base", np.float32(config.rope_theta))
    w.add("command-r.logit_scale", np.float32(config.logit_scale))
    w.add("command-r.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("model.embed_tokens.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("model.norm.weight"), GGMLType.F32)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        for tgt in ("attn_norm", "ffn_norm"):  # one shared LN, both branches
            w.add_tensor(gp + tgt + ".weight", get(hp + "input_layernorm.weight"), GGMLType.F32)
        for gn, hn in (("attn_q", "self_attn.q_proj"), ("attn_k", "self_attn.k_proj"),
                       ("attn_v", "self_attn.v_proj"), ("attn_output", "self_attn.o_proj"),
                       ("ffn_gate", "mlp.gate_proj"), ("ffn_up", "mlp.up_proj"),
                       ("ffn_down", "mlp.down_proj")):
            w.add_tensor(gp + gn + ".weight", get(hp + hn + ".weight"), quant_type)
    w.write()
    return out_path


def convert_starcoder2_state_dict(state: dict, config, out_path: str,
                                  tokenizer_md: dict | None = None,
                                  quant_type: GGMLType = GGMLType.F32):
    """HF StarCoder2 -> GGUF: LayerNorm+bias, full NEOX rotary, biased
    projections, non-gated tanh-GELU FFN (c_fc/c_proj)."""
    n_head = config.num_attention_heads
    n_kv = getattr(config, "num_key_value_heads", n_head) or n_head
    n_layers = config.num_hidden_layers
    w = GGUFWriter(out_path, architecture="starcoder2")
    w.add("starcoder2.context_length", np.uint32(config.max_position_embeddings))
    w.add("starcoder2.embedding_length", np.uint32(config.hidden_size))
    w.add("starcoder2.block_count", np.uint32(n_layers))
    w.add("starcoder2.feed_forward_length", np.uint32(config.intermediate_size))
    w.add("starcoder2.attention.head_count", np.uint32(n_head))
    w.add("starcoder2.attention.head_count_kv", np.uint32(n_kv))
    w.add("starcoder2.attention.layer_norm_epsilon",
          np.float32(config.norm_epsilon))
    w.add("starcoder2.rope.freq_base", np.float32(config.rope_theta))
    w.add("starcoder2.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("model.embed_tokens.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("model.norm.weight"), GGMLType.F32)
    w.add_tensor("output_norm.bias", get("model.norm.bias"), GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        for gn, hn in (("attn_norm", "input_layernorm"),
                       ("ffn_norm", "post_attention_layernorm")):
            w.add_tensor(gp + gn + ".weight", get(hp + hn + ".weight"), GGMLType.F32)
            w.add_tensor(gp + gn + ".bias", get(hp + hn + ".bias"), GGMLType.F32)
        for gn, hn in (("attn_q", "self_attn.q_proj"), ("attn_k", "self_attn.k_proj"),
                       ("attn_v", "self_attn.v_proj"), ("attn_output", "self_attn.o_proj"),
                       ("ffn_up", "mlp.c_fc"), ("ffn_down", "mlp.c_proj")):
            w.add_tensor(gp + gn + ".weight", get(hp + hn + ".weight"), quant_type)
            w.add_tensor(gp + gn + ".bias", get(hp + hn + ".bias"), GGMLType.F32)
    w.write()
    return out_path


def convert_qwen2moe_state_dict(state: dict, config, out_path: str,
                                tokenizer_md: dict | None = None,
                                quant_type: GGMLType = GGMLType.F32):
    """HF Qwen2MoE -> GGUF: qwen2 attention (QKV bias) + sparse MoE with
    always-on sigmoid-gated shared expert; top-k router weights NOT
    renormalized (norm_topk_prob=False)."""
    n_head = config.num_attention_heads
    n_kv = getattr(config, "num_key_value_heads", n_head) or n_head
    n_layers = config.num_hidden_layers
    E = config.num_experts
    w = GGUFWriter(out_path, architecture="qwen2moe")
    w.add("qwen2moe.context_length", np.uint32(config.max_position_embeddings))
    w.add("qwen2moe.embedding_length", np.uint32(config.hidden_size))
    w.add("qwen2moe.block_count", np.uint32(n_layers))
    w.add("qwen2moe.feed_forward_length", np.uint32(config.intermediate_size))
    w.add("qwen2moe.attention.head_count", np.uint32(n_head))
    w.add("qwen2moe.attention.head_count_kv", np.uint32(n_kv))
    w.add("qwen2moe.attention.layer_norm_rms_epsilon",
          np.float32(config.rms_norm_eps))
    w.add("qwen2moe.rope.freq_base", np.float32(config.rope_theta))
    w.add("qwen2moe.expert_count", np.uint32(E))
    w.add("qwen2moe.expert_used_count", np.uint32(config.num_experts_per_tok))
    w.add("qwen2moe.expert_feed_forward_length",
          np.uint32(config.moe_intermediate_size))
    w.add("qwen2moe.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("model.embed_tokens.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("model.norm.weight"), GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "input_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "post_attention_layernorm.weight"), GGMLType.F32)
        for gn, hn in (("attn_q", "self_attn.q_proj"), ("attn_k", "self_attn.k_proj"),
                       ("attn_v", "self_attn.v_proj")):
            w.add_tensor(gp + gn + ".weight", get(hp + hn + ".weight"), quant_type)
            w.add_tensor(gp + gn + ".bias", get(hp + hn + ".bias"), GGMLType.F32)
        w.add_tensor(gp + "attn_output.weight", get(hp + "self_attn.o_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_gate_inp.weight", get(hp + "mlp.gate.weight"), GGMLType.F32)
        for gn, hn in (("ffn_gate_exps", "gate_proj"), ("ffn_up_exps", "up_proj"),
                       ("ffn_down_exps", "down_proj")):
            stack = np.stack([get(f"{hp}mlp.experts.{e}.{hn}.weight")
                              for e in range(E)])
            w.add_tensor(gp + gn + ".weight", stack, GGMLType.F32)
        for gn, hn in (("ffn_gate_shexp", "shared_expert.gate_proj"),
                       ("ffn_up_shexp", "shared_expert.up_proj"),
                       ("ffn_down_shexp", "shared_expert.down_proj"),
                       ("ffn_gate_inp_shexp", "shared_expert_gate")):
            w.add_tensor(gp + gn + ".weight", get(hp + "mlp." + hn + ".weight"), quant_type)
    w.write()
    return out_path


def convert_gptj_state_dict(state: dict, config, out_path: str,
                            tokenizer_md: dict | None = None,
                            quant_type: GGMLType = GGMLType.F32):
    """HF GPT-J -> GGUF: shared ln_1 feeding parallel attn+MLP, partial
    adjacent-pair rotary (rotate_every_two == GGUF 'norm', no permute),
    biased MLP and lm_head."""
    n_head = config.n_head
    n_layers = config.n_layer
    w = GGUFWriter(out_path, architecture="gptj")
    w.add("gptj.context_length", np.uint32(config.n_positions))
    w.add("gptj.embedding_length", np.uint32(config.n_embd))
    w.add("gptj.block_count", np.uint32(n_layers))
    w.add("gptj.feed_forward_length", np.uint32(
        getattr(config, "n_inner", None) or 4 * config.n_embd))
    w.add("gptj.attention.head_count", np.uint32(n_head))
    w.add("gptj.attention.head_count_kv", np.uint32(n_head))
    w.add("gptj.attention.layer_norm_epsilon",
          np.float32(config.layer_norm_epsilon))
    w.add("gptj.rope.dimension_count", np.uint32(config.rotary_dim))
    w.add("gptj.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("transformer.wte.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("transformer.ln_f.weight"), GGMLType.F32)
    w.add_tensor("output_norm.bias", get("transformer.ln_f.bias"), GGMLType.F32)
    w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    if "lm_head.bias" in state:
        w.add_tensor("output.bias", get("lm_head.bias"), GGMLType.F32)
    for i in range(n_layers):
        hp = f"transformer.h.{i}."
        gp = f"blk.{i}."
        for tgt in ("attn_norm", "ffn_norm"):  # shared ln_1, both branches
            w.add_tensor(gp + tgt + ".weight", get(hp + "ln_1.weight"), GGMLType.F32)
            w.add_tensor(gp + tgt + ".bias", get(hp + "ln_1.bias"), GGMLType.F32)
        for gn, hn in (("attn_q", "attn.q_proj"), ("attn_k", "attn.k_proj"),
                       ("attn_v", "attn.v_proj"), ("attn_output", "attn.out_proj")):
            w.add_tensor(gp + gn + ".weight", get(hp + hn + ".weight"), quant_type)
        w.add_tensor(gp + "ffn_up.weight", get(hp + "mlp.fc_in.weight"), quant_type)
        w.add_tensor(gp + "ffn_up.bias", get(hp + "mlp.fc_in.bias"), GGMLType.F32)
        w.add_tensor(gp + "ffn_down.weight", get(hp + "mlp.fc_out.weight"), quant_type)
        w.add_tensor(gp + "ffn_down.bias", get(hp + "mlp.fc_out.bias"), GGMLType.F32)
    w.write()
    return out_path


def convert_dbrx_state_dict(state: dict, config, out_path: str,
                            tokenizer_md: dict | None = None,
                            quant_type: GGMLType = GGMLType.F32):
    """HF DBRX -> GGUF: bias-free LayerNorm pair, fused clipped Wqkv, MoE with
    L1-renormalized top-k; experts stored flattened (E*F, H) in w1/v1/w2."""
    n_head = config.n_heads
    n_kv = config.attn_config.kv_n_heads
    n_layers = config.n_layers
    H = config.d_model
    E = config.ffn_config.moe_num_experts
    F = config.ffn_config.ffn_hidden_size
    w = GGUFWriter(out_path, architecture="dbrx")
    w.add("dbrx.context_length", np.uint32(config.max_seq_len))
    w.add("dbrx.embedding_length", np.uint32(H))
    w.add("dbrx.block_count", np.uint32(n_layers))
    w.add("dbrx.feed_forward_length", np.uint32(F))
    w.add("dbrx.attention.head_count", np.uint32(n_head))
    w.add("dbrx.attention.head_count_kv", np.uint32(n_kv))
    w.add("dbrx.attention.layer_norm_epsilon", np.float32(1e-5))
    w.add("dbrx.rope.freq_base", np.float32(config.attn_config.rope_theta))
    w.add("dbrx.attention.clamp_kqv",
          np.float32(config.attn_config.clip_qkv or 0.0))
    w.add("dbrx.expert_count", np.uint32(E))
    w.add("dbrx.expert_used_count", np.uint32(config.ffn_config.moe_top_k))
    w.add("dbrx.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("transformer.wte.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("transformer.norm_f.weight"), GGMLType.F32)
    w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"transformer.blocks.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight",
                     get(hp + "norm_attn_norm.norm_1.weight"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight",
                     get(hp + "norm_attn_norm.norm_2.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_qkv.weight",
                     get(hp + "norm_attn_norm.attn.Wqkv.weight"), quant_type)
        w.add_tensor(gp + "attn_output.weight",
                     get(hp + "norm_attn_norm.attn.out_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_gate_inp.weight",
                     get(hp + "ffn.router.layer.weight"), GGMLType.F32)
        w1 = get(hp + "ffn.experts.mlp.w1").reshape(E, F, H)   # gate
        v1 = get(hp + "ffn.experts.mlp.v1").reshape(E, F, H)   # up
        w2 = get(hp + "ffn.experts.mlp.w2").reshape(E, F, H)   # down (F,H): y = a @ w2_e
        w.add_tensor(gp + "ffn_gate_exps.weight", w1, GGMLType.F32)
        w.add_tensor(gp + "ffn_up_exps.weight", v1, GGMLType.F32)
        w.add_tensor(gp + "ffn_down_exps.weight",
                     np.ascontiguousarray(w2.transpose(0, 2, 1)), GGMLType.F32)
    w.write()
    return out_path


def convert_granite_state_dict(state: dict, config, out_path: str,
                               tokenizer_md: dict | None = None,
                               quant_type: GGMLType = GGMLType.F32):
    """HF Granite -> GGUF: llama layout (incl. the q/k rope permute) plus the
    four scale knobs (embedding/attention/residual/logits)."""
    n_head = config.num_attention_heads
    n_kv = getattr(config, "num_key_value_heads", n_head) or n_head
    n_layers = config.num_hidden_layers
    head_dim = config.hidden_size // n_head
    w = GGUFWriter(out_path, architecture="granite")
    w.add("granite.context_length", np.uint32(config.max_position_embeddings))
    w.add("granite.embedding_length", np.uint32(config.hidden_size))
    w.add("granite.block_count", np.uint32(n_layers))
    w.add("granite.feed_forward_length", np.uint32(config.intermediate_size))
    w.add("granite.attention.head_count", np.uint32(n_head))
    w.add("granite.attention.head_count_kv", np.uint32(n_kv))
    w.add("granite.attention.layer_norm_rms_epsilon",
          np.float32(config.rms_norm_eps))
    w.add("granite.rope.freq_base", np.float32(config.rope_theta))
    w.add("granite.rope.dimension_count", np.uint32(head_dim))
    w.add("granite.embedding_scale", np.float32(config.embedding_multiplier))
    w.add("granite.attention.scale", np.float32(config.attention_multiplier))
    w.add("granite.residual_scale", np.float32(config.residual_multiplier))
    w.add("granite.logit_scale", np.float32(config.logits_scaling))
    w.add("granite.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("model.embed_tokens.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("model.norm.weight"), GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "input_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "post_attention_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_q.weight",
                     permute_qk(get(hp + "self_attn.q_proj.weight"), n_head), quant_type)
        w.add_tensor(gp + "attn_k.weight",
                     permute_qk(get(hp + "self_attn.k_proj.weight"), n_kv), quant_type)
        w.add_tensor(gp + "attn_v.weight", get(hp + "self_attn.v_proj.weight"), quant_type)
        w.add_tensor(gp + "attn_output.weight", get(hp + "self_attn.o_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_gate.weight", get(hp + "mlp.gate_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_up.weight", get(hp + "mlp.up_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_down.weight", get(hp + "mlp.down_proj.weight"), quant_type)
    w.write()
    return out_path


def convert_olmoe_state_dict(state: dict, config, out_path: str,
                             tokenizer_md: dict | None = None,
                             quant_type: GGMLType = GGMLType.F32):
    """HF OLMoE -> GGUF: flat-projection QK RMSNorm, full NEOX rotary, MoE
    with un-normalized top-k routing."""
    n_head = config.num_attention_heads
    n_kv = getattr(config, "num_key_value_heads", n_head) or n_head
    n_layers = config.num_hidden_layers
    E = config.num_experts
    w = GGUFWriter(out_path, architecture="olmoe")
    w.add("olmoe.context_length", np.uint32(config.max_position_embeddings))
    w.add("olmoe.embedding_length", np.uint32(config.hidden_size))
    w.add("olmoe.block_count", np.uint32(n_layers))
    w.add("olmoe.feed_forward_length", np.uint32(config.intermediate_size))
    w.add("olmoe.attention.head_count", np.uint32(n_head))
    w.add("olmoe.attention.head_count_kv", np.uint32(n_kv))
    w.add("olmoe.attention.layer_norm_rms_epsilon", np.float32(config.rms_norm_eps))
    w.add("olmoe.rope.freq_base", np.float32(config.rope_theta))
    w.add("olmoe.expert_count", np.uint32(E))
    w.add("olmoe.expert_used_count", np.uint32(config.num_experts_per_tok))
    w.add("olmoe.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("model.embed_tokens.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("model.norm.weight"), GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "input_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "post_attention_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_q_norm.weight", get(hp + "self_attn.q_norm.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_k_norm.weight", get(hp + "self_attn.k_norm.weight"), GGMLType.F32)
        for gn, hn in (("attn_q", "self_attn.q_proj"), ("attn_k", "self_attn.k_proj"),
                       ("attn_v", "self_attn.v_proj"), ("attn_output", "self_attn.o_proj")):
            w.add_tensor(gp + gn + ".weight", get(hp + hn + ".weight"), quant_type)
        w.add_tensor(gp + "ffn_gate_inp.weight", get(hp + "mlp.gate.weight"), GGMLType.F32)
        for gn, hn in (("ffn_gate_exps", "gate_proj"), ("ffn_up_exps", "up_proj"),
                       ("ffn_down_exps", "down_proj")):
            stack = np.stack([get(f"{hp}mlp.experts.{e}.{hn}.weight")
                              for e in range(E)])
            w.add_tensor(gp + gn + ".weight", stack, GGMLType.F32)
    w.write()
    return out_path


def convert_mamba_state_dict(state: dict, config, out_path: str,
                             tokenizer_md: dict | None = None,
                             quant_type: GGMLType = GGMLType.F32):
    """HF MambaForCausalLM -> GGUF (reference MambaModel converter,
    /root/reference/convert_hf_to_gguf.py:2935-2988: A = -exp(A_log),
    conv1d squeezed to {d_conv, d_inner})."""
    n_layers = config.num_hidden_layers
    d_model = config.hidden_size
    d_inner = getattr(config, "intermediate_size", 2 * d_model)
    d_conv = getattr(config, "conv_kernel", 4)
    d_state = getattr(config, "state_size", 16)
    dt_rank = getattr(config, "time_step_rank", -(d_model // -16))

    w = GGUFWriter(out_path, architecture="mamba")
    w.add("general.name", "mamba-converted")
    w.add("mamba.context_length", np.uint32(2 ** 20))
    w.add("mamba.embedding_length", np.uint32(d_model))
    w.add("mamba.block_count", np.uint32(n_layers))
    w.add("mamba.feed_forward_length", np.uint32(0))
    w.add("mamba.attention.head_count", np.uint32(0))
    w.add("mamba.attention.layer_norm_rms_epsilon",
          np.float32(config.layer_norm_epsilon))
    w.add("mamba.ssm.conv_kernel", np.uint32(d_conv))
    w.add("mamba.ssm.inner_size", np.uint32(d_inner))
    w.add("mamba.ssm.state_size", np.uint32(d_state))
    w.add("mamba.ssm.time_step_rank", np.uint32(int(dt_rank)))
    w.add("mamba.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("backbone.embeddings.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("backbone.norm_f.weight"), GGMLType.F32)
    if "lm_head.weight" in state and not np.array_equal(
            state["lm_head.weight"], state["backbone.embeddings.weight"]):
        w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"backbone.layers.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "norm.weight"), GGMLType.F32)
        w.add_tensor(gp + "ssm_in.weight", get(hp + "mixer.in_proj.weight"), quant_type)
        w.add_tensor(gp + "ssm_conv1d.weight",
                     get(hp + "mixer.conv1d.weight").squeeze(1), GGMLType.F32)
        w.add_tensor(gp + "ssm_conv1d.bias", get(hp + "mixer.conv1d.bias"), GGMLType.F32)
        w.add_tensor(gp + "ssm_x.weight", get(hp + "mixer.x_proj.weight"), quant_type)
        w.add_tensor(gp + "ssm_dt.weight", get(hp + "mixer.dt_proj.weight"), quant_type)
        w.add_tensor(gp + "ssm_dt.bias", get(hp + "mixer.dt_proj.bias"), GGMLType.F32)
        w.add_tensor(gp + "ssm_a", -np.exp(get(hp + "mixer.A_log")), GGMLType.F32)
        w.add_tensor(gp + "ssm_d", get(hp + "mixer.D"), GGMLType.F32)
        w.add_tensor(gp + "ssm_out.weight", get(hp + "mixer.out_proj.weight"), quant_type)
    w.write()
    return out_path


def convert_rwkv6_state_dict(state: dict, config, out_path: str,
                             tokenizer_md: dict | None = None,
                             quant_type: GGMLType = GGMLType.F32):
    """RWKV-LM v6 state dict -> GGUF (reference Rwkv6Model converter,
    /root/reference/convert_hf_to_gguf.py:2835-2911: w1/decay_w1/decay_w2
    transposed, w2 permuted (0,2,1), output/value weights pre-divided by
    2^(layer//rescale_every))."""
    n_layers = config["num_hidden_layers"]
    hidden = config["hidden_size"]
    head_size = config["head_size"]
    rescale = config.get("rescale_every", 0)
    inter = config["intermediate_size"]

    w = GGUFWriter(out_path, architecture="rwkv6")
    w.add("general.name", "rwkv6-converted")
    w.add("rwkv6.context_length", np.uint32(1048576))
    w.add("rwkv6.embedding_length", np.uint32(hidden))
    w.add("rwkv6.block_count", np.uint32(n_layers))
    w.add("rwkv6.feed_forward_length", np.uint32(inter))
    w.add("rwkv6.attention.head_count", np.uint32(0))
    w.add("rwkv6.attention.layer_norm_epsilon",
          np.float32(config.get("layer_norm_epsilon", 1e-5)))
    w.add("rwkv6.rescale_every_n_layers", np.uint32(rescale))
    w.add("rwkv6.wkv.head_size", np.uint32(head_size))
    w.add("rwkv6.vocab_size", np.uint32(config["vocab_size"]))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("emb.weight"), quant_type)
    w.add_tensor("token_embd_norm.weight", get("blocks.0.ln0.weight"), GGMLType.F32)
    w.add_tensor("token_embd_norm.bias", get("blocks.0.ln0.bias"), GGMLType.F32)
    w.add_tensor("output_norm.weight", get("ln_out.weight"), GGMLType.F32)
    w.add_tensor("output_norm.bias", get("ln_out.bias"), GGMLType.F32)
    w.add_tensor("output.weight", get("head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"blocks.{i}."
        gp = f"blk.{i}."
        div = float(2 ** (i // rescale)) if rescale else 1.0
        w.add_tensor(gp + "attn_norm.weight", get(hp + "ln1.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_norm.bias", get(hp + "ln1.bias"), GGMLType.F32)
        w.add_tensor(gp + "attn_norm_2.weight", get(hp + "ln2.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_norm_2.bias", get(hp + "ln2.bias"), GGMLType.F32)
        for g in "xwkvrg":
            w.add_tensor(gp + f"time_mix_lerp_{g}.weight",
                         get(hp + f"att.time_maa_{g}").reshape(1, 1, hidden),
                         GGMLType.F32)
        w.add_tensor(gp + "time_mix_w1.weight",
                     get(hp + "att.time_maa_w1").T.copy(), quant_type)
        w.add_tensor(gp + "time_mix_w2.weight",
                     get(hp + "att.time_maa_w2").transpose(0, 2, 1).copy(),
                     GGMLType.F32)
        w.add_tensor(gp + "time_mix_first.weight", get(hp + "att.time_faaaa"),
                     GGMLType.F32)
        w.add_tensor(gp + "time_mix_decay.weight",
                     get(hp + "att.time_decay").reshape(1, 1, hidden), GGMLType.F32)
        w.add_tensor(gp + "time_mix_decay_w1.weight",
                     get(hp + "att.time_decay_w1").T.copy(), quant_type)
        w.add_tensor(gp + "time_mix_decay_w2.weight",
                     get(hp + "att.time_decay_w2").T.copy(), quant_type)
        w.add_tensor(gp + "time_mix_key.weight", get(hp + "att.key.weight"), quant_type)
        w.add_tensor(gp + "time_mix_value.weight", get(hp + "att.value.weight"), quant_type)
        w.add_tensor(gp + "time_mix_receptance.weight",
                     get(hp + "att.receptance.weight"), quant_type)
        w.add_tensor(gp + "time_mix_gate.weight", get(hp + "att.gate.weight"), quant_type)
        w.add_tensor(gp + "time_mix_ln.weight", get(hp + "att.ln_x.weight"), GGMLType.F32)
        w.add_tensor(gp + "time_mix_ln.bias", get(hp + "att.ln_x.bias"), GGMLType.F32)
        w.add_tensor(gp + "time_mix_output.weight",
                     get(hp + "att.output.weight") / div, quant_type)
        w.add_tensor(gp + "channel_mix_lerp_k.weight",
                     get(hp + "ffn.time_maa_k").reshape(1, 1, hidden), GGMLType.F32)
        w.add_tensor(gp + "channel_mix_lerp_r.weight",
                     get(hp + "ffn.time_maa_r").reshape(1, 1, hidden), GGMLType.F32)
        w.add_tensor(gp + "channel_mix_key.weight", get(hp + "ffn.key.weight"), quant_type)
        w.add_tensor(gp + "channel_mix_receptance.weight",
                     get(hp + "ffn.receptance.weight"), quant_type)
        w.add_tensor(gp + "channel_mix_value.weight",
                     get(hp + "ffn.value.weight") / div, quant_type)
    w.write()
    return out_path


def convert_t5_state_dict(state: dict, config, out_path: str,
                          tokenizer_md: dict | None = None,
                          quant_type: GGMLType = GGMLType.F32):
    """HF T5ForConditionalGeneration -> GGUF (reference T5Model converter,
    /root/reference/convert_hf_to_gguf.py:3452+; enc./dec. tensor prefixes per
    gguf-py MODEL_TENSORS[T5])."""
    n_layers = config.num_layers
    w = GGUFWriter(out_path, architecture="t5")
    w.add("general.name", "t5-converted")
    w.add("t5.context_length", np.uint32(512))
    w.add("t5.embedding_length", np.uint32(config.d_model))
    w.add("t5.feed_forward_length", np.uint32(config.d_ff))
    w.add("t5.block_count", np.uint32(n_layers))
    w.add("t5.attention.head_count", np.uint32(config.num_heads))
    w.add("t5.attention.key_length", np.uint32(config.d_kv))
    w.add("t5.attention.value_length", np.uint32(config.d_kv))
    w.add("t5.attention.layer_norm_rms_epsilon",
          np.float32(config.layer_norm_epsilon))
    w.add("t5.attention.relative_buckets_count",
          np.uint32(config.relative_attention_num_buckets))
    w.add("t5.decoder_start_token_id", np.uint32(config.decoder_start_token_id))
    w.add("t5.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("shared.weight"), quant_type)
    w.add_tensor("enc.output_norm.weight",
                 get("encoder.final_layer_norm.weight"), GGMLType.F32)
    w.add_tensor("dec.output_norm.weight",
                 get("decoder.final_layer_norm.weight"), GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", get("lm_head.weight"), quant_type)

    gated = "encoder.block.0.layer.1.DenseReluDense.wi_0.weight" in state
    for i in range(n_layers):
        hp = f"encoder.block.{i}.layer."
        gp = f"enc.blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "0.layer_norm.weight"), GGMLType.F32)
        for gn, hn in (("attn_q", "q"), ("attn_k", "k"), ("attn_v", "v"), ("attn_o", "o")):
            w.add_tensor(gp + gn + ".weight",
                         get(hp + f"0.SelfAttention.{hn}.weight"), quant_type)
        if i == 0:
            w.add_tensor(gp + "attn_rel_b.weight",
                         get(hp + "0.SelfAttention.relative_attention_bias.weight"),
                         GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "1.layer_norm.weight"), GGMLType.F32)
        if gated:
            w.add_tensor(gp + "ffn_gate.weight", get(hp + "1.DenseReluDense.wi_0.weight"), quant_type)
            w.add_tensor(gp + "ffn_up.weight", get(hp + "1.DenseReluDense.wi_1.weight"), quant_type)
        else:
            w.add_tensor(gp + "ffn_up.weight", get(hp + "1.DenseReluDense.wi.weight"), quant_type)
        w.add_tensor(gp + "ffn_down.weight", get(hp + "1.DenseReluDense.wo.weight"), quant_type)
    for i in range(n_layers):
        hp = f"decoder.block.{i}.layer."
        gp = f"dec.blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "0.layer_norm.weight"), GGMLType.F32)
        for gn, hn in (("attn_q", "q"), ("attn_k", "k"), ("attn_v", "v"), ("attn_o", "o")):
            w.add_tensor(gp + gn + ".weight",
                         get(hp + f"0.SelfAttention.{hn}.weight"), quant_type)
        if i == 0:
            w.add_tensor(gp + "attn_rel_b.weight",
                         get(hp + "0.SelfAttention.relative_attention_bias.weight"),
                         GGMLType.F32)
        w.add_tensor(gp + "cross_attn_norm.weight", get(hp + "1.layer_norm.weight"), GGMLType.F32)
        for gn, hn in (("cross_attn_q", "q"), ("cross_attn_k", "k"),
                       ("cross_attn_v", "v"), ("cross_attn_o", "o")):
            w.add_tensor(gp + gn + ".weight",
                         get(hp + f"1.EncDecAttention.{hn}.weight"), quant_type)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "2.layer_norm.weight"), GGMLType.F32)
        if gated:
            w.add_tensor(gp + "ffn_gate.weight", get(hp + "2.DenseReluDense.wi_0.weight"), quant_type)
            w.add_tensor(gp + "ffn_up.weight", get(hp + "2.DenseReluDense.wi_1.weight"), quant_type)
        else:
            w.add_tensor(gp + "ffn_up.weight", get(hp + "2.DenseReluDense.wi.weight"), quant_type)
        w.add_tensor(gp + "ffn_down.weight", get(hp + "2.DenseReluDense.wo.weight"), quant_type)
    w.write()
    return out_path


def convert_deepseek2_state_dict(state: dict, config, out_path: str,
                                 tokenizer_md: dict | None = None,
                                 quant_type: GGMLType = GGMLType.F32):
    """HF DeepseekV2ForCausalLM -> GGUF (reference DeepseekV2Model converter,
    /root/reference/convert_hf_to_gguf.py:3370-3430)."""
    n_layers = config.num_hidden_layers
    qk_dim = config.qk_nope_head_dim + config.qk_rope_head_dim
    w = GGUFWriter(out_path, architecture="deepseek2")
    w.add("general.name", "deepseek2-converted")
    w.add("deepseek2.context_length", np.uint32(config.max_position_embeddings))
    w.add("deepseek2.embedding_length", np.uint32(config.hidden_size))
    w.add("deepseek2.block_count", np.uint32(n_layers))
    w.add("deepseek2.feed_forward_length", np.uint32(config.intermediate_size))
    w.add("deepseek2.attention.head_count", np.uint32(config.num_attention_heads))
    w.add("deepseek2.attention.head_count_kv", np.uint32(config.num_key_value_heads))
    w.add("deepseek2.attention.key_length", np.uint32(qk_dim))
    w.add("deepseek2.attention.value_length", np.uint32(config.v_head_dim))
    w.add("deepseek2.attention.layer_norm_rms_epsilon", np.float32(config.rms_norm_eps))
    w.add("deepseek2.rope.freq_base", np.float32(config.rope_theta))
    w.add("deepseek2.rope.dimension_count", np.uint32(config.qk_rope_head_dim))
    w.add("deepseek2.attention.kv_lora_rank", np.uint32(config.kv_lora_rank))
    if getattr(config, "q_lora_rank", None):
        w.add("deepseek2.attention.q_lora_rank", np.uint32(config.q_lora_rank))
    w.add("deepseek2.leading_dense_block_count", np.uint32(config.first_k_dense_replace))
    w.add("deepseek2.expert_count", np.uint32(config.n_routed_experts))
    w.add("deepseek2.expert_used_count", np.uint32(config.num_experts_per_tok))
    w.add("deepseek2.expert_feed_forward_length", np.uint32(config.moe_intermediate_size))
    w.add("deepseek2.expert_shared_count", np.uint32(config.n_shared_experts))
    w.add("deepseek2.expert_weights_scale", np.float32(config.routed_scaling_factor))
    w.add("deepseek2.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("model.embed_tokens.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("model.norm.weight"), GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "input_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "post_attention_layernorm.weight"), GGMLType.F32)
        if hp + "self_attn.q_proj.weight" in state:
            w.add_tensor(gp + "attn_q.weight", get(hp + "self_attn.q_proj.weight"), quant_type)
        else:
            w.add_tensor(gp + "attn_q_a.weight", get(hp + "self_attn.q_a_proj.weight"), quant_type)
            w.add_tensor(gp + "attn_q_a_norm.weight", get(hp + "self_attn.q_a_layernorm.weight"), GGMLType.F32)
            w.add_tensor(gp + "attn_q_b.weight", get(hp + "self_attn.q_b_proj.weight"), quant_type)
        w.add_tensor(gp + "attn_kv_a_mqa.weight", get(hp + "self_attn.kv_a_proj_with_mqa.weight"), quant_type)
        w.add_tensor(gp + "attn_kv_a_norm.weight", get(hp + "self_attn.kv_a_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_kv_b.weight", get(hp + "self_attn.kv_b_proj.weight"), quant_type)
        w.add_tensor(gp + "attn_output.weight", get(hp + "self_attn.o_proj.weight"), quant_type)
        if hp + "mlp.gate_proj.weight" in state:  # leading dense layer
            w.add_tensor(gp + "ffn_gate.weight", get(hp + "mlp.gate_proj.weight"), quant_type)
            w.add_tensor(gp + "ffn_up.weight", get(hp + "mlp.up_proj.weight"), quant_type)
            w.add_tensor(gp + "ffn_down.weight", get(hp + "mlp.down_proj.weight"), quant_type)
        else:
            w.add_tensor(gp + "ffn_gate_inp.weight", get(hp + "mlp.gate.weight"), GGMLType.F32)
            E = config.n_routed_experts
            for gn, hn in (("ffn_gate_exps", "gate_proj"), ("ffn_up_exps", "up_proj"),
                           ("ffn_down_exps", "down_proj")):
                stack = np.stack([get(f"{hp}mlp.experts.{e}.{hn}.weight")
                                  for e in range(E)])
                w.add_tensor(gp + gn + ".weight", stack, GGMLType.F32)
            for gn, hn in (("ffn_gate_shexp", "gate_proj"), ("ffn_up_shexp", "up_proj"),
                           ("ffn_down_shexp", "down_proj")):
                w.add_tensor(gp + gn + ".weight",
                             get(hp + f"mlp.shared_experts.{hn}.weight"), quant_type)
    w.write()
    return out_path


def convert_bloom_state_dict(state: dict, config, out_path: str,
                             tokenizer_md: dict | None = None,
                             quant_type: GGMLType = GGMLType.F32):
    """HF BloomForCausalLM -> GGUF (reference BloomModel converter,
    /root/reference/convert_hf_to_gguf.py:986: fused qkv de-interleaved from
    (H, 3, D, E) to [Q;K;V]; token-embedding layernorm kept)."""
    n_layers = config.n_layer
    n_head = config.n_head
    E = config.hidden_size
    D = E // n_head
    w = GGUFWriter(out_path, architecture="bloom")
    w.add("general.name", "bloom-converted")
    w.add("bloom.context_length", np.uint32(2048))
    w.add("bloom.embedding_length", np.uint32(E))
    w.add("bloom.block_count", np.uint32(n_layers))
    w.add("bloom.feed_forward_length", np.uint32(4 * E))
    w.add("bloom.attention.head_count", np.uint32(n_head))
    w.add("bloom.attention.head_count_kv", np.uint32(n_head))
    w.add("bloom.attention.layer_norm_epsilon",
          np.float32(config.layer_norm_epsilon))
    w.add("bloom.attention.max_alibi_bias", np.float32(8.0))
    w.add("bloom.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight",
                 get("transformer.word_embeddings.weight"), quant_type)
    w.add_tensor("token_embd_norm.weight",
                 get("transformer.word_embeddings_layernorm.weight"), GGMLType.F32)
    w.add_tensor("token_embd_norm.bias",
                 get("transformer.word_embeddings_layernorm.bias"), GGMLType.F32)
    w.add_tensor("output_norm.weight", get("transformer.ln_f.weight"), GGMLType.F32)
    w.add_tensor("output_norm.bias", get("transformer.ln_f.bias"), GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"transformer.h.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "input_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_norm.bias", get(hp + "input_layernorm.bias"), GGMLType.F32)
        qkv_w = get(hp + "self_attention.query_key_value.weight")
        qkv_w = qkv_w.reshape(n_head, 3, D, E)
        w.add_tensor(gp + "attn_qkv.weight",
                     np.concatenate([qkv_w[:, 0].reshape(-1, E),
                                     qkv_w[:, 1].reshape(-1, E),
                                     qkv_w[:, 2].reshape(-1, E)], axis=0),
                     quant_type)
        qkv_b = get(hp + "self_attention.query_key_value.bias").reshape(n_head, 3, D)
        w.add_tensor(gp + "attn_qkv.bias",
                     np.concatenate([qkv_b[:, 0].reshape(-1),
                                     qkv_b[:, 1].reshape(-1),
                                     qkv_b[:, 2].reshape(-1)]), GGMLType.F32)
        w.add_tensor(gp + "attn_output.weight", get(hp + "self_attention.dense.weight"), quant_type)
        w.add_tensor(gp + "attn_output.bias", get(hp + "self_attention.dense.bias"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "post_attention_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.bias", get(hp + "post_attention_layernorm.bias"), GGMLType.F32)
        w.add_tensor(gp + "ffn_up.weight", get(hp + "mlp.dense_h_to_4h.weight"), quant_type)
        w.add_tensor(gp + "ffn_up.bias", get(hp + "mlp.dense_h_to_4h.bias"), GGMLType.F32)
        w.add_tensor(gp + "ffn_down.weight", get(hp + "mlp.dense_4h_to_h.weight"), quant_type)
        w.add_tensor(gp + "ffn_down.bias", get(hp + "mlp.dense_4h_to_h.bias"), GGMLType.F32)
    w.write()
    return out_path


def convert_starcoder_state_dict(state: dict, config, out_path: str,
                                 tokenizer_md: dict | None = None,
                                 quant_type: GGMLType = GGMLType.F32):
    """HF GPTBigCodeForCausalLM -> GGUF arch 'starcoder' (MQA: c_attn is
    already [Q; K; V] with a single KV head)."""
    n_layers = config.n_layer
    E = config.n_embd
    w = GGUFWriter(out_path, architecture="starcoder")
    w.add("general.name", "starcoder-converted")
    w.add("starcoder.context_length", np.uint32(config.n_positions))
    w.add("starcoder.embedding_length", np.uint32(E))
    w.add("starcoder.block_count", np.uint32(n_layers))
    w.add("starcoder.feed_forward_length", np.uint32(4 * E))
    w.add("starcoder.attention.head_count", np.uint32(config.n_head))
    w.add("starcoder.attention.head_count_kv",
          np.uint32(1 if config.multi_query else config.n_head))
    w.add("starcoder.attention.layer_norm_epsilon",
          np.float32(config.layer_norm_epsilon))
    w.add("starcoder.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("transformer.wte.weight"), quant_type)
    w.add_tensor("position_embd.weight", get("transformer.wpe.weight"), GGMLType.F32)
    w.add_tensor("output_norm.weight", get("transformer.ln_f.weight"), GGMLType.F32)
    w.add_tensor("output_norm.bias", get("transformer.ln_f.bias"), GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"transformer.h.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "ln_1.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_norm.bias", get(hp + "ln_1.bias"), GGMLType.F32)
        w.add_tensor(gp + "attn_qkv.weight", get(hp + "attn.c_attn.weight"), quant_type)
        w.add_tensor(gp + "attn_qkv.bias", get(hp + "attn.c_attn.bias"), GGMLType.F32)
        w.add_tensor(gp + "attn_output.weight", get(hp + "attn.c_proj.weight"), quant_type)
        w.add_tensor(gp + "attn_output.bias", get(hp + "attn.c_proj.bias"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "ln_2.weight"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.bias", get(hp + "ln_2.bias"), GGMLType.F32)
        w.add_tensor(gp + "ffn_up.weight", get(hp + "mlp.c_fc.weight"), quant_type)
        w.add_tensor(gp + "ffn_up.bias", get(hp + "mlp.c_fc.bias"), GGMLType.F32)
        w.add_tensor(gp + "ffn_down.weight", get(hp + "mlp.c_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_down.bias", get(hp + "mlp.c_proj.bias"), GGMLType.F32)
    w.write()
    return out_path


def convert_nemotron_state_dict(state: dict, config, out_path: str,
                                tokenizer_md: dict | None = None,
                                quant_type: GGMLType = GGMLType.F32):
    """HF NemotronForCausalLM -> GGUF (reference NemotronModel converter,
    /root/reference/convert_hf_to_gguf.py:4003: layernorm1p folded by adding
    +1 to norm weights; partial rotary via rope.dimension_count)."""
    n_layers = config.num_hidden_layers
    n_head = config.num_attention_heads
    n_kv = config.num_key_value_heads
    E = config.hidden_size
    D = E // n_head
    rot = int(getattr(config, "partial_rotary_factor", 0.5) * D)
    w = GGUFWriter(out_path, architecture="nemotron")
    w.add("general.name", "nemotron-converted")
    w.add("nemotron.context_length", np.uint32(config.max_position_embeddings))
    w.add("nemotron.embedding_length", np.uint32(E))
    w.add("nemotron.block_count", np.uint32(n_layers))
    w.add("nemotron.feed_forward_length", np.uint32(config.intermediate_size))
    w.add("nemotron.attention.head_count", np.uint32(n_head))
    w.add("nemotron.attention.head_count_kv", np.uint32(n_kv))
    w.add("nemotron.attention.layer_norm_epsilon", np.float32(config.norm_eps))
    w.add("nemotron.rope.freq_base", np.float32(config.rope_theta))
    w.add("nemotron.rope.dimension_count", np.uint32(rot))
    w.add("nemotron.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("model.embed_tokens.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("model.norm.weight") + 1.0, GGMLType.F32)
    w.add_tensor("output_norm.bias", get("model.norm.bias"), GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight",
                     get(hp + "input_layernorm.weight") + 1.0, GGMLType.F32)
        w.add_tensor(gp + "attn_norm.bias",
                     get(hp + "input_layernorm.bias"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight",
                     get(hp + "post_attention_layernorm.weight") + 1.0, GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.bias",
                     get(hp + "post_attention_layernorm.bias"), GGMLType.F32)
        for gn, hn in (("attn_q", "self_attn.q_proj"), ("attn_k", "self_attn.k_proj"),
                       ("attn_v", "self_attn.v_proj"), ("attn_output", "self_attn.o_proj")):
            w.add_tensor(gp + gn + ".weight", get(hp + hn + ".weight"), quant_type)
        w.add_tensor(gp + "ffn_up.weight", get(hp + "mlp.up_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_down.weight", get(hp + "mlp.down_proj.weight"), quant_type)
    w.write()
    return out_path


def convert_chameleon_state_dict(state: dict, config, out_path: str,
                                 tokenizer_md: dict | None = None,
                                 quant_type: GGMLType = GGMLType.F32):
    """HF Chameleon -> GGUF (reference ChameleonModel converter,
    /root/reference/convert_hf_to_gguf.py:4170-4209: llama q/k permute plus
    the same per-head interleave applied to the (H, D) q/k norm affines)."""
    n_layers = config.num_hidden_layers
    n_head = config.num_attention_heads
    n_kv = config.num_key_value_heads
    E = config.hidden_size
    D = E // n_head

    def perm_vec(v):  # (H, D) -> same interleave as permute_qk row order
        H = v.shape[0]
        return v.reshape(H, 2, D // 2).swapaxes(1, 2).reshape(H, D)

    w = GGUFWriter(out_path, architecture="chameleon")
    w.add("general.name", "chameleon-converted")
    w.add("chameleon.context_length", np.uint32(config.max_position_embeddings))
    w.add("chameleon.embedding_length", np.uint32(E))
    w.add("chameleon.block_count", np.uint32(n_layers))
    w.add("chameleon.feed_forward_length", np.uint32(config.intermediate_size))
    w.add("chameleon.attention.head_count", np.uint32(n_head))
    w.add("chameleon.attention.head_count_kv", np.uint32(n_kv))
    w.add("chameleon.attention.layer_norm_rms_epsilon", np.float32(config.rms_norm_eps))
    w.add("chameleon.rope.freq_base", np.float32(config.rope_theta))
    w.add("chameleon.rope.dimension_count", np.uint32(D))
    w.add("chameleon.swin_norm", bool(config.swin_norm))
    w.add("chameleon.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("model.embed_tokens.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("model.norm.weight"), GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "input_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "post_attention_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_q.weight",
                     permute_qk(get(hp + "self_attn.q_proj.weight"), n_head), quant_type)
        w.add_tensor(gp + "attn_k.weight",
                     permute_qk(get(hp + "self_attn.k_proj.weight"), n_kv), quant_type)
        w.add_tensor(gp + "attn_v.weight", get(hp + "self_attn.v_proj.weight"), quant_type)
        w.add_tensor(gp + "attn_output.weight", get(hp + "self_attn.o_proj.weight"), quant_type)
        w.add_tensor(gp + "attn_q_norm.weight",
                     perm_vec(get(hp + "self_attn.q_norm.weight")), GGMLType.F32)
        w.add_tensor(gp + "attn_q_norm.bias",
                     perm_vec(get(hp + "self_attn.q_norm.bias")), GGMLType.F32)
        w.add_tensor(gp + "attn_k_norm.weight",
                     perm_vec(get(hp + "self_attn.k_norm.weight")), GGMLType.F32)
        w.add_tensor(gp + "attn_k_norm.bias",
                     perm_vec(get(hp + "self_attn.k_norm.bias")), GGMLType.F32)
        w.add_tensor(gp + "ffn_gate.weight", get(hp + "mlp.gate_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_up.weight", get(hp + "mlp.up_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_down.weight", get(hp + "mlp.down_proj.weight"), quant_type)
    w.write()
    return out_path


def convert_bert_state_dict(state: dict, config, out_path: str,
                            tokenizer_md: dict | None = None,
                            quant_type: GGMLType = GGMLType.F32,
                            pooling: int = 1):
    """HF BertModel -> GGUF arch 'bert' (post-norm encoder; pooling_type
    1=mean 2=CLS, llama.cpp llama_pooling_type)."""
    n_layers = config.num_hidden_layers
    E = config.hidden_size
    w = GGUFWriter(out_path, architecture="bert")
    w.add("general.name", "bert-converted")
    w.add("bert.context_length", np.uint32(config.max_position_embeddings))
    w.add("bert.embedding_length", np.uint32(E))
    w.add("bert.block_count", np.uint32(n_layers))
    w.add("bert.feed_forward_length", np.uint32(config.intermediate_size))
    w.add("bert.attention.head_count", np.uint32(config.num_attention_heads))
    w.add("bert.attention.layer_norm_epsilon", np.float32(config.layer_norm_eps))
    w.add("bert.pooling_type", np.uint32(pooling))
    w.add("bert.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("embeddings.word_embeddings.weight"), quant_type)
    w.add_tensor("position_embd.weight", get("embeddings.position_embeddings.weight"), GGMLType.F32)
    w.add_tensor("token_types.weight", get("embeddings.token_type_embeddings.weight"), GGMLType.F32)
    w.add_tensor("token_embd_norm.weight", get("embeddings.LayerNorm.weight"), GGMLType.F32)
    w.add_tensor("token_embd_norm.bias", get("embeddings.LayerNorm.bias"), GGMLType.F32)
    for i in range(n_layers):
        hp = f"encoder.layer.{i}."
        gp = f"blk.{i}."
        for gn, hn in (("attn_q", "attention.self.query"),
                       ("attn_k", "attention.self.key"),
                       ("attn_v", "attention.self.value"),
                       ("attn_output", "attention.output.dense"),
                       ("ffn_up", "intermediate.dense"),
                       ("ffn_down", "output.dense")):
            w.add_tensor(gp + gn + ".weight", get(hp + hn + ".weight"), quant_type)
            w.add_tensor(gp + gn + ".bias", get(hp + hn + ".bias"), GGMLType.F32)
        w.add_tensor(gp + "attn_output_norm.weight",
                     get(hp + "attention.output.LayerNorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_output_norm.bias",
                     get(hp + "attention.output.LayerNorm.bias"), GGMLType.F32)
        w.add_tensor(gp + "layer_output_norm.weight",
                     get(hp + "output.LayerNorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "layer_output_norm.bias",
                     get(hp + "output.LayerNorm.bias"), GGMLType.F32)
    w.write()
    return out_path


def convert_t5encoder_state_dict(state: dict, config, out_path: str,
                                 tokenizer_md: dict | None = None,
                                 quant_type: GGMLType = GGMLType.F32):
    """HF T5EncoderModel -> GGUF arch 't5encoder' (encoder half of T5,
    llama.cpp LLM_ARCH_T5ENCODER)."""
    n_layers = config.num_layers
    w = GGUFWriter(out_path, architecture="t5encoder")
    w.add("general.name", "t5encoder-converted")
    w.add("t5encoder.context_length", np.uint32(512))
    w.add("t5encoder.embedding_length", np.uint32(config.d_model))
    w.add("t5encoder.feed_forward_length", np.uint32(config.d_ff))
    w.add("t5encoder.block_count", np.uint32(n_layers))
    w.add("t5encoder.attention.head_count", np.uint32(config.num_heads))
    w.add("t5encoder.attention.key_length", np.uint32(config.d_kv))
    w.add("t5encoder.attention.value_length", np.uint32(config.d_kv))
    w.add("t5encoder.attention.layer_norm_rms_epsilon",
          np.float32(config.layer_norm_epsilon))
    w.add("t5encoder.attention.relative_buckets_count",
          np.uint32(config.relative_attention_num_buckets))
    w.add("t5encoder.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("shared.weight"), quant_type)
    w.add_tensor("enc.output_norm.weight",
                 get("encoder.final_layer_norm.weight"), GGMLType.F32)
    gated = "encoder.block.0.layer.1.DenseReluDense.wi_0.weight" in state
    for i in range(n_layers):
        hp = f"encoder.block.{i}.layer."
        gp = f"enc.blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "0.layer_norm.weight"), GGMLType.F32)
        for gn, hn in (("attn_q", "q"), ("attn_k", "k"), ("attn_v", "v"), ("attn_o", "o")):
            w.add_tensor(gp + gn + ".weight",
                         get(hp + f"0.SelfAttention.{hn}.weight"), quant_type)
        if i == 0:
            w.add_tensor(gp + "attn_rel_b.weight",
                         get(hp + "0.SelfAttention.relative_attention_bias.weight"),
                         GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "1.layer_norm.weight"), GGMLType.F32)
        if gated:
            w.add_tensor(gp + "ffn_gate.weight", get(hp + "1.DenseReluDense.wi_0.weight"), quant_type)
            w.add_tensor(gp + "ffn_up.weight", get(hp + "1.DenseReluDense.wi_1.weight"), quant_type)
        else:
            w.add_tensor(gp + "ffn_up.weight", get(hp + "1.DenseReluDense.wi.weight"), quant_type)
        w.add_tensor(gp + "ffn_down.weight", get(hp + "1.DenseReluDense.wo.weight"), quant_type)
    w.write()
    return out_path


def convert_granitemoe_state_dict(state: dict, config, out_path: str,
                                  tokenizer_md: dict | None = None,
                                  quant_type: GGMLType = GGMLType.F32):
    """HF GraniteMoeForCausalLM -> GGUF (reference GraniteMoeModel converter,
    /root/reference/convert_hf_to_gguf.py:4147: JetMoe-style fused
    input_linear split into gate/up expert stacks; granite scale knobs)."""
    n_head = config.num_attention_heads
    n_kv = getattr(config, "num_key_value_heads", n_head) or n_head
    n_layers = config.num_hidden_layers
    head_dim = config.hidden_size // n_head
    F = config.intermediate_size
    w = GGUFWriter(out_path, architecture="granitemoe")
    w.add("granitemoe.context_length", np.uint32(config.max_position_embeddings))
    w.add("granitemoe.embedding_length", np.uint32(config.hidden_size))
    w.add("granitemoe.block_count", np.uint32(n_layers))
    w.add("granitemoe.feed_forward_length", np.uint32(F))
    w.add("granitemoe.attention.head_count", np.uint32(n_head))
    w.add("granitemoe.attention.head_count_kv", np.uint32(n_kv))
    w.add("granitemoe.attention.layer_norm_rms_epsilon",
          np.float32(config.rms_norm_eps))
    w.add("granitemoe.rope.freq_base", np.float32(config.rope_theta))
    w.add("granitemoe.rope.dimension_count", np.uint32(head_dim))
    w.add("granitemoe.embedding_scale", np.float32(config.embedding_multiplier))
    w.add("granitemoe.attention.scale", np.float32(config.attention_multiplier))
    w.add("granitemoe.residual_scale", np.float32(config.residual_multiplier))
    w.add("granitemoe.logit_scale", np.float32(config.logits_scaling))
    w.add("granitemoe.expert_count", np.uint32(config.num_local_experts))
    w.add("granitemoe.expert_used_count", np.uint32(config.num_experts_per_tok))
    w.add("granitemoe.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("model.embed_tokens.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("model.norm.weight"), GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "input_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "post_attention_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_q.weight",
                     permute_qk(get(hp + "self_attn.q_proj.weight"), n_head), quant_type)
        w.add_tensor(gp + "attn_k.weight",
                     permute_qk(get(hp + "self_attn.k_proj.weight"), n_kv), quant_type)
        w.add_tensor(gp + "attn_v.weight", get(hp + "self_attn.v_proj.weight"), quant_type)
        w.add_tensor(gp + "attn_output.weight", get(hp + "self_attn.o_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_gate_inp.weight",
                     get(hp + "block_sparse_moe.router.layer.weight"), GGMLType.F32)
        merged = get(hp + "block_sparse_moe.input_linear.weight")  # (E, 2F, C)
        w.add_tensor(gp + "ffn_gate_exps.weight", merged[:, :F, :].copy(), GGMLType.F32)
        w.add_tensor(gp + "ffn_up_exps.weight", merged[:, F:, :].copy(), GGMLType.F32)
        w.add_tensor(gp + "ffn_down_exps.weight",
                     get(hp + "block_sparse_moe.output_linear.weight"), GGMLType.F32)
    w.write()
    return out_path


def convert_llama_like_state_dict(arch: str, state: dict, config, out_path: str,
                                  tokenizer_md: dict | None = None,
                                  quant_type: GGMLType = GGMLType.F32,
                                  norm_bias: bool = False):
    """Llama-layout archs that differ only in the arch string / norm flavor:
    baichuan, xverse, minicpm, orion (all LLAMA_ROPE_TYPE_NORM with the q/k
    permute, llama.cpp:19704-19712)."""
    n_head = config.num_attention_heads
    n_kv = getattr(config, "num_key_value_heads", n_head) or n_head
    n_layers = config.num_hidden_layers
    head_dim = config.hidden_size // n_head
    eps = getattr(config, "rms_norm_eps", getattr(config, "layer_norm_eps", 1e-5))
    w = GGUFWriter(out_path, architecture=arch)
    w.add(f"{arch}.context_length", np.uint32(config.max_position_embeddings))
    w.add(f"{arch}.embedding_length", np.uint32(config.hidden_size))
    w.add(f"{arch}.block_count", np.uint32(n_layers))
    w.add(f"{arch}.feed_forward_length", np.uint32(config.intermediate_size))
    w.add(f"{arch}.attention.head_count", np.uint32(n_head))
    w.add(f"{arch}.attention.head_count_kv", np.uint32(n_kv))
    if norm_bias:
        w.add(f"{arch}.attention.layer_norm_epsilon", np.float32(eps))
    else:
        w.add(f"{arch}.attention.layer_norm_rms_epsilon", np.float32(eps))
    w.add(f"{arch}.rope.freq_base",
          np.float32(getattr(config, "rope_theta", 10000.0)))
    w.add(f"{arch}.rope.dimension_count", np.uint32(head_dim))
    w.add(f"{arch}.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("model.embed_tokens.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("model.norm.weight"), GGMLType.F32)
    if norm_bias:
        w.add_tensor("output_norm.bias", get("model.norm.bias"), GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "input_layernorm.weight"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "post_attention_layernorm.weight"), GGMLType.F32)
        if norm_bias:
            w.add_tensor(gp + "attn_norm.bias", get(hp + "input_layernorm.bias"), GGMLType.F32)
            w.add_tensor(gp + "ffn_norm.bias", get(hp + "post_attention_layernorm.bias"), GGMLType.F32)
        w.add_tensor(gp + "attn_q.weight",
                     permute_qk(get(hp + "self_attn.q_proj.weight"), n_head), quant_type)
        w.add_tensor(gp + "attn_k.weight",
                     permute_qk(get(hp + "self_attn.k_proj.weight"), n_kv), quant_type)
        w.add_tensor(gp + "attn_v.weight", get(hp + "self_attn.v_proj.weight"), quant_type)
        w.add_tensor(gp + "attn_output.weight", get(hp + "self_attn.o_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_gate.weight", get(hp + "mlp.gate_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_up.weight", get(hp + "mlp.up_proj.weight"), quant_type)
        w.add_tensor(gp + "ffn_down.weight", get(hp + "mlp.down_proj.weight"), quant_type)
    w.write()
    return out_path


def convert_qwen_state_dict(state: dict, config, out_path: str,
                            tokenizer_md: dict | None = None,
                            quant_type: GGMLType = GGMLType.F32):
    """Qwen v1 layout -> GGUF arch 'qwen' (fused c_attn [Q;K;V] with bias,
    NEOX rope — no permute; llama.cpp build_qwen). `state` uses qwen-v1 HF
    names (transformer.h.N.attn.c_attn etc.)."""
    n_head = config.num_attention_heads
    n_layers = config.num_hidden_layers
    E = config.hidden_size
    w = GGUFWriter(out_path, architecture="qwen")
    w.add("qwen.context_length", np.uint32(config.max_position_embeddings))
    w.add("qwen.embedding_length", np.uint32(E))
    w.add("qwen.block_count", np.uint32(n_layers))
    w.add("qwen.feed_forward_length", np.uint32(config.intermediate_size))
    w.add("qwen.attention.head_count", np.uint32(n_head))
    w.add("qwen.attention.head_count_kv", np.uint32(n_head))
    w.add("qwen.attention.layer_norm_rms_epsilon", np.float32(config.rms_norm_eps))
    w.add("qwen.rope.freq_base", np.float32(getattr(config, "rope_theta", 10000.0)))
    w.add("qwen.rope.dimension_count", np.uint32(E // n_head))
    w.add("qwen.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("transformer.wte.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("transformer.ln_f.weight"), GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", get("lm_head.weight"), quant_type)
    for i in range(n_layers):
        hp = f"transformer.h.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "ln_1.weight"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "ln_2.weight"), GGMLType.F32)
        w.add_tensor(gp + "attn_qkv.weight", get(hp + "attn.c_attn.weight"), quant_type)
        w.add_tensor(gp + "attn_qkv.bias", get(hp + "attn.c_attn.bias"), GGMLType.F32)
        w.add_tensor(gp + "attn_output.weight", get(hp + "attn.c_proj.weight"), quant_type)
        # qwen v1 mlp: w2 = gate, w1 = up (llama.cpp QWEN tensor map)
        w.add_tensor(gp + "ffn_gate.weight", get(hp + "mlp.w2.weight"), quant_type)
        w.add_tensor(gp + "ffn_up.weight", get(hp + "mlp.w1.weight"), quant_type)
        w.add_tensor(gp + "ffn_down.weight", get(hp + "mlp.c_proj.weight"), quant_type)
    w.write()
    return out_path


def convert_internlm2_state_dict(state: dict, config, out_path: str,
                                 tokenizer_md: dict | None = None,
                                 quant_type: GGMLType = GGMLType.F32):
    """InternLM2 layout -> GGUF arch 'internlm2' (reference InternLM2Model
    converter, /root/reference/convert_hf_to_gguf.py:2490-2513: grouped fused
    attention.wqkv de-interleaved to q/k/v with the llama permute; the GGUF
    file is then standard llama layout under the internlm2 arch name).
    `state` uses internlm2 naming (model.layers.N.attention.wqkv etc.)."""
    n_head = config.num_attention_heads
    n_kv = config.num_key_value_heads
    n_layers = config.num_hidden_layers
    E = config.hidden_size
    D = E // n_head
    q_per_kv = n_head // n_kv
    w = GGUFWriter(out_path, architecture="internlm2")
    w.add("internlm2.context_length", np.uint32(config.max_position_embeddings))
    w.add("internlm2.embedding_length", np.uint32(E))
    w.add("internlm2.block_count", np.uint32(n_layers))
    w.add("internlm2.feed_forward_length", np.uint32(config.intermediate_size))
    w.add("internlm2.attention.head_count", np.uint32(n_head))
    w.add("internlm2.attention.head_count_kv", np.uint32(n_kv))
    w.add("internlm2.attention.layer_norm_rms_epsilon", np.float32(config.rms_norm_eps))
    w.add("internlm2.rope.freq_base", np.float32(getattr(config, "rope_theta", 10000.0)))
    w.add("internlm2.rope.dimension_count", np.uint32(D))
    w.add("internlm2.vocab_size", np.uint32(config.vocab_size))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    w.add_tensor("token_embd.weight", get("model.tok_embeddings.weight"), quant_type)
    w.add_tensor("output_norm.weight", get("model.norm.weight"), GGMLType.F32)
    if "output.weight" in state:
        w.add_tensor("output.weight", get("output.weight"), quant_type)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        w.add_tensor(gp + "attn_norm.weight", get(hp + "attention_norm.weight"), GGMLType.F32)
        w.add_tensor(gp + "ffn_norm.weight", get(hp + "ffn_norm.weight"), GGMLType.F32)
        qkv = get(hp + "attention.wqkv.weight").reshape(n_kv, q_per_kv + 2, D, E)
        q = qkv[:, :q_per_kv].reshape(-1, E)
        k = qkv[:, -2].reshape(-1, E)
        v = qkv[:, -1].reshape(-1, E)
        w.add_tensor(gp + "attn_q.weight", permute_qk(q, n_head), quant_type)
        w.add_tensor(gp + "attn_k.weight", permute_qk(k, n_kv), quant_type)
        w.add_tensor(gp + "attn_v.weight", v, quant_type)
        w.add_tensor(gp + "attn_output.weight", get(hp + "attention.wo.weight"), quant_type)
        w.add_tensor(gp + "ffn_gate.weight", get(hp + "feed_forward.w1.weight"), quant_type)
        w.add_tensor(gp + "ffn_up.weight", get(hp + "feed_forward.w3.weight"), quant_type)
        w.add_tensor(gp + "ffn_down.weight", get(hp + "feed_forward.w2.weight"), quant_type)
    w.write()
    return out_path
