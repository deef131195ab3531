"""HF Whisper -> GGUF converter for koboldcpp_tpu's whisper runtime."""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from koboldcpp_tpu.gguf import GGMLType, GGUFWriter  # noqa: E402


def convert_whisper_state_dict(state: dict, config, out_path: str,
                               tokenizer_md: dict | None = None,
                               quant_type: GGMLType = GGMLType.F16):
    w = GGUFWriter(out_path, architecture="whisper")
    w.add("whisper.n_mels", np.uint32(config.num_mel_bins))
    w.add("whisper.d_model", np.uint32(config.d_model))
    w.add("whisper.encoder_layers", np.uint32(config.encoder_layers))
    w.add("whisper.encoder_heads", np.uint32(config.encoder_attention_heads))
    w.add("whisper.decoder_layers", np.uint32(config.decoder_layers))
    w.add("whisper.decoder_heads", np.uint32(config.decoder_attention_heads))
    w.add("whisper.n_audio_ctx", np.uint32(config.max_source_positions))
    w.add("whisper.n_text_ctx", np.uint32(config.max_target_positions))
    w.add("whisper.vocab_size", np.uint32(config.vocab_size))
    eot = getattr(config, "eos_token_id", None) or 50257
    sot = getattr(config, "decoder_start_token_id", None) or 50258
    w.add("whisper.eot_id", np.uint32(eot))
    w.add("whisper.sot_id", np.uint32(sot))
    # real whisper vocab layouts place <|notimestamps|> 1502 below the end
    # (multilingual 51865->50363, en-only 51864->50362); task tokens sit just
    # below it and the first language token right after <|startoftranscript|>
    if config.vocab_size >= 51000:
        nots = config.vocab_size - 1502
        w.add("whisper.no_timestamps_id", np.uint32(nots))
        w.add("whisper.transcribe_id", np.uint32(nots - 4))
        w.add("whisper.translate_id", np.uint32(nots - 5))
        w.add("whisper.lang_en_id", np.uint32(sot + 1))
    for k, v in (tokenizer_md or {}).items():
        w.add(k, v)

    def get(name):
        return np.asarray(state[name], dtype=np.float32)

    def qt(arr):
        return quant_type if (arr.ndim == 2 and arr.shape[-1] % 32 == 0
                              and quant_type != GGMLType.F32) else GGMLType.F32

    def add(name, arr):
        w.add_tensor(name, arr, qt(arr))

    E = "model.encoder."
    D = "model.decoder."
    add("enc.conv1.weight", get(E + "conv1.weight"))
    add("enc.conv1.bias", get(E + "conv1.bias"))
    add("enc.conv2.weight", get(E + "conv2.weight"))
    add("enc.conv2.bias", get(E + "conv2.bias"))
    add("enc.pos", get(E + "embed_positions.weight"))
    add("enc.ln.weight", get(E + "layer_norm.weight"))
    add("enc.ln.bias", get(E + "layer_norm.bias"))
    for i in range(config.encoder_layers):
        hp = f"{E}layers.{i}."
        gp = f"enc.{i}."
        add(gp + "attn_ln.weight", get(hp + "self_attn_layer_norm.weight"))
        add(gp + "attn_ln.bias", get(hp + "self_attn_layer_norm.bias"))
        add(gp + "attn.q.weight", get(hp + "self_attn.q_proj.weight"))
        add(gp + "attn.q.bias", get(hp + "self_attn.q_proj.bias"))
        add(gp + "attn.k.weight", get(hp + "self_attn.k_proj.weight"))
        add(gp + "attn.v.weight", get(hp + "self_attn.v_proj.weight"))
        add(gp + "attn.v.bias", get(hp + "self_attn.v_proj.bias"))
        add(gp + "attn.out.weight", get(hp + "self_attn.out_proj.weight"))
        add(gp + "attn.out.bias", get(hp + "self_attn.out_proj.bias"))
        add(gp + "ffn_ln.weight", get(hp + "final_layer_norm.weight"))
        add(gp + "ffn_ln.bias", get(hp + "final_layer_norm.bias"))
        add(gp + "ffn.fc1.weight", get(hp + "fc1.weight"))
        add(gp + "ffn.fc1.bias", get(hp + "fc1.bias"))
        add(gp + "ffn.fc2.weight", get(hp + "fc2.weight"))
        add(gp + "ffn.fc2.bias", get(hp + "fc2.bias"))

    add("dec.tok_embd", get(D + "embed_tokens.weight"))
    add("dec.pos", get(D + "embed_positions.weight"))
    add("dec.ln.weight", get(D + "layer_norm.weight"))
    add("dec.ln.bias", get(D + "layer_norm.bias"))
    for i in range(config.decoder_layers):
        hp = f"{D}layers.{i}."
        gp = f"dec.{i}."
        add(gp + "attn_ln.weight", get(hp + "self_attn_layer_norm.weight"))
        add(gp + "attn_ln.bias", get(hp + "self_attn_layer_norm.bias"))
        add(gp + "attn.q.weight", get(hp + "self_attn.q_proj.weight"))
        add(gp + "attn.q.bias", get(hp + "self_attn.q_proj.bias"))
        add(gp + "attn.k.weight", get(hp + "self_attn.k_proj.weight"))
        add(gp + "attn.v.weight", get(hp + "self_attn.v_proj.weight"))
        add(gp + "attn.v.bias", get(hp + "self_attn.v_proj.bias"))
        add(gp + "attn.out.weight", get(hp + "self_attn.out_proj.weight"))
        add(gp + "attn.out.bias", get(hp + "self_attn.out_proj.bias"))
        add(gp + "cross_ln.weight", get(hp + "encoder_attn_layer_norm.weight"))
        add(gp + "cross_ln.bias", get(hp + "encoder_attn_layer_norm.bias"))
        add(gp + "cross.q.weight", get(hp + "encoder_attn.q_proj.weight"))
        add(gp + "cross.q.bias", get(hp + "encoder_attn.q_proj.bias"))
        add(gp + "cross.k.weight", get(hp + "encoder_attn.k_proj.weight"))
        add(gp + "cross.v.weight", get(hp + "encoder_attn.v_proj.weight"))
        add(gp + "cross.v.bias", get(hp + "encoder_attn.v_proj.bias"))
        add(gp + "cross.out.weight", get(hp + "encoder_attn.out_proj.weight"))
        add(gp + "cross.out.bias", get(hp + "encoder_attn.out_proj.bias"))
        add(gp + "ffn_ln.weight", get(hp + "final_layer_norm.weight"))
        add(gp + "ffn_ln.bias", get(hp + "final_layer_norm.bias"))
        add(gp + "ffn.fc1.weight", get(hp + "fc1.weight"))
        add(gp + "ffn.fc1.bias", get(hp + "fc1.bias"))
        add(gp + "ffn.fc2.weight", get(hp + "fc2.weight"))
        add(gp + "ffn.fc2.bias", get(hp + "fc2.bias"))
    w.write()
    return out_path


def main():
    ap = argparse.ArgumentParser(description="Convert HF whisper to GGUF")
    ap.add_argument("model_dir")
    ap.add_argument("--outfile", required=True)
    args = ap.parse_args()
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    model = WhisperForConditionalGeneration.from_pretrained(args.model_dir)
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    convert_whisper_state_dict(state, model.config, args.outfile)
    print(f"wrote {args.outfile}")


if __name__ == "__main__":
    main()
