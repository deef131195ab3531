"""Transcribe endpoint with a loaded whisper model."""
import base64
import io
import wave

import numpy as np
import pytest

pytest_plugins = ("aiohttp.pytest_plugin",)

from koboldcpp_tpu.server.app import ServerSettings, make_app


def make_wav_b64(seconds=0.5, sr=16000):
    t = np.arange(int(sr * seconds)) / sr
    sig = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((sig * 32767).astype(np.int16).tobytes())
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def whisper_model(tmp_path_factory):
    import sys, os, torch
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from transformers import WhisperConfig, WhisperForConditionalGeneration
    from convert_whisper import convert_whisper_state_dict
    from koboldcpp_tpu.gguf import GGMLType
    from koboldcpp_tpu.models.whisper import load_whisper

    torch.manual_seed(10)
    cfg = WhisperConfig(
        vocab_size=200, num_mel_bins=80, d_model=64,
        encoder_layers=1, encoder_attention_heads=2,
        decoder_layers=1, decoder_attention_heads=2,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=1500, max_target_positions=448,
        eos_token_id=3, decoder_start_token_id=2, pad_token_id=0)
    model = WhisperForConditionalGeneration(cfg).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("sw") / "w.gguf")
    convert_whisper_state_dict(state, cfg, path, quant_type=GGMLType.F32)
    m = load_whisper(path)
    m.cfg.sot_id, m.cfg.lang_en_id = 2, 4
    m.cfg.transcribe_id, m.cfg.no_timestamps_id, m.cfg.eot_id = 5, 6, 3
    return m


async def test_transcribe_endpoint(whisper_model, aiohttp_client):
    from .test_server import engine  # reuse nothing; make a stub engine

    class StubEngine:
        max_context = 128
        last_timings = type("T", (), {"prompt_time": 0, "gen_time": 0,
                                      "gen_tokens": 0})()
        generation_finished = True

        class tokenizer:
            pass

        def token_count(self, text):
            return []

        def abort(self):
            pass

    app = make_app(StubEngine(), ServerSettings(whisper_model=whisper_model))
    c = await aiohttp_client(app)
    r = await c.post("/api/extra/transcribe", json={"audio_data": make_wav_b64()})
    assert r.status == 200
    j = await r.json()
    assert "text" in j

    r = await c.get("/api/extra/version")
    assert (await r.json())["transcribe"] is True


async def test_transcribe_no_model(aiohttp_client):
    class StubEngine:
        max_context = 128
        generation_finished = True

        def token_count(self, text):
            return []

        def abort(self):
            pass

    app = make_app(StubEngine(), ServerSettings())
    c = await aiohttp_client(app)
    r = await c.post("/api/extra/transcribe", json={"audio_data": make_wav_b64()})
    assert r.status == 503
