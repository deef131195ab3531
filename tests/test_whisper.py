"""Whisper JAX model: encoder/decoder logits parity vs transformers, log-mel
frontend parity, WAV decode, greedy transcription loop."""
import numpy as np
import pytest
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from koboldcpp_tpu.models import whisper as jw


@pytest.fixture(scope="module")
def whisper_pair(tmp_path_factory):
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration
    from convert_whisper import convert_whisper_state_dict
    from koboldcpp_tpu.gguf import GGMLType

    torch.manual_seed(9)
    cfg = WhisperConfig(
        vocab_size=200, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=1500, max_target_positions=448,
        eos_token_id=3, decoder_start_token_id=2, pad_token_id=0,
    )
    model = WhisperForConditionalGeneration(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("w") / "whisper.gguf")
    convert_whisper_state_dict(state, cfg, path, quant_type=GGMLType.F32)
    return model, path


def test_encoder_matches_hf(whisper_pair):
    import torch

    model, path = whisper_pair
    m = jw.load_whisper(path)
    mel = np.random.default_rng(0).standard_normal((1, 80, 3000)).astype(np.float32)
    with torch.no_grad():
        ref = model.model.encoder(torch.tensor(mel)).last_hidden_state.numpy()
    ours = np.asarray(m._encode(params=m.params, mel=jnp.asarray(mel)))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_decoder_logits_match_hf(whisper_pair):
    import torch

    model, path = whisper_pair
    m = jw.load_whisper(path)
    mel = np.random.default_rng(1).standard_normal((1, 80, 3000)).astype(np.float32)
    toks = np.array([[2, 5, 9, 42]], dtype=np.int64)
    with torch.no_grad():
        out = model(input_features=torch.tensor(mel),
                    decoder_input_ids=torch.tensor(toks))
        ref = out.logits.numpy()
    enc = m._encode(params=m.params, mel=jnp.asarray(mel))
    ours = np.asarray(m._decode(params=m.params,
                                tokens=jnp.asarray(toks, dtype=jnp.int32),
                                enc_out=enc))
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)


def test_log_mel_matches_hf_processor():
    pytest.importorskip("transformers")
    from transformers.audio_utils import mel_filter_bank

    # filterbank parity with HF's whisper implementation
    ours = jw.mel_filterbank()
    theirs = mel_filter_bank(
        num_frequency_bins=1 + jw.N_FFT // 2, num_mel_filters=jw.N_MELS,
        min_frequency=0.0, max_frequency=8000.0, sampling_rate=jw.SAMPLE_RATE,
        norm="slaney", mel_scale="slaney").T
    np.testing.assert_allclose(ours, theirs.astype(np.float32), atol=1e-6)


def test_wav_roundtrip(tmp_path):
    import base64
    import io
    import wave

    sr = 16000
    t = np.arange(sr) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((sig * 32767).astype(np.int16).tobytes())
    b64 = base64.b64encode(buf.getvalue()).decode()
    out = jw.decode_wav_base64(b64)
    assert out.shape == (sr,)
    np.testing.assert_allclose(out, sig, atol=1e-3)


def test_transcribe_loop_runs(whisper_pair):
    _, path = whisper_pair
    m = jw.load_whisper(path)
    # ids must stay in the tiny vocab; patch specials to fit
    m.cfg.sot_id, m.cfg.lang_en_id = 2, 4
    m.cfg.transcribe_id, m.cfg.no_timestamps_id = 5, 6
    m.cfg.eot_id = 3
    audio = np.random.default_rng(2).standard_normal(16000).astype(np.float32) * 0.1
    ids = m.transcribe_tokens(audio, max_tokens=5)
    assert isinstance(ids, list) and len(ids) <= 5
    assert all(0 <= i < 200 for i in ids)
