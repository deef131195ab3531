"""Whisper speech-to-text in JAX.

TPU-native counterpart of the reference's whisper.cpp integration
(/root/reference/otherarch/whispercpp/, adapter whisper_adapter.cpp): encoder
(2x conv + transformer) + decoder (causal self-attn + cross-attn) + log-mel
frontend, greedy transcription. Weights load from our GGUF container
(tools/convert_whisper.py converts HF checkpoints).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFReader
from ..ops.norms import layer_norm

Params = dict[str, Any]

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
N_MELS = 80
CHUNK_SECONDS = 30


@dataclass
class WhisperConfig:
    n_mels: int = 80
    d_model: int = 384
    enc_layers: int = 4
    enc_heads: int = 6
    dec_layers: int = 4
    dec_heads: int = 6
    n_audio_ctx: int = 1500
    n_text_ctx: int = 448
    vocab_size: int = 51865
    eot_id: int = 50257
    sot_id: int = 50258
    transcribe_id: int = 50359
    translate_id: int = 50358
    no_timestamps_id: int = 50363
    lang_en_id: int = 50259


# ---------------------------------------------------------------------------
# audio frontend
# ---------------------------------------------------------------------------

def mel_filterbank(n_mels: int = N_MELS, n_fft: int = N_FFT,
                   sr: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-style mel filterbank (matches whisper's filters)."""
    fmin, fmax = 0.0, sr / 2

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = f / (200.0 / 3)
        logstep = np.log(6.4) / 27.0
        return np.where(f >= 1000.0, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / logstep, mel)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        logstep = np.log(6.4) / 27.0
        return np.where(m >= 15.0, 1000.0 * np.exp(logstep * (m - 15.0)), m * (200.0 / 3))

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz = mel_to_hz(mels)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sr)
    fb = np.zeros((n_mels, len(bins)))
    for i in range(n_mels):
        lower = (bins - hz[i]) / max(hz[i + 1] - hz[i], 1e-10)
        upper = (hz[i + 2] - bins) / max(hz[i + 2] - hz[i + 1], 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz[2:n_mels + 2] - hz[:n_mels])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


def log_mel_spectrogram(audio: np.ndarray, n_mels: int = N_MELS) -> np.ndarray:
    """float32 mono 16 kHz -> (n_mels, T) log-mel, whisper normalization."""
    audio = np.asarray(audio, dtype=np.float32)
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    pad = N_FFT // 2
    x = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - N_FFT) // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = x[idx] * window
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2  # (T, n_fft/2+1)
    mel = mel_filterbank(n_mels) @ spec.T  # (n_mels, T)
    # drop the last frame like whisper (it uses stft[..., :-1])
    mel = mel[:, :-1] if mel.shape[1] > 1 else mel
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def pad_or_trim_mel(mel: np.ndarray, n_frames: int = 3000) -> np.ndarray:
    if mel.shape[1] >= n_frames:
        return mel[:, :n_frames]
    return np.pad(mel, ((0, 0), (0, n_frames - mel.shape[1])))


def decode_wav_base64(b64: str) -> np.ndarray:
    """base64 WAV -> float32 mono 16 kHz (the transcribe endpoints' input,
    reference koboldcpp.py accepts base64 wav)."""
    import base64
    import io
    import wave

    raw = base64.b64decode(b64.split(",")[-1])
    with wave.open(io.BytesIO(raw)) as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        data = w.readframes(n)
    if width == 2:
        x = np.frombuffer(data, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(data, np.int32).astype(np.float32) / 2147483648.0
    else:
        x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    if sr != SAMPLE_RATE:  # linear resample
        t = np.linspace(0, len(x) - 1, int(len(x) * SAMPLE_RATE / sr))
        x = np.interp(t, np.arange(len(x)), x).astype(np.float32)
    return x


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

def _mha(q, k, v, n_heads, mask=None):
    B, Tq, D = q.shape
    Tk = k.shape[1]
    H = n_heads
    hd = D // H
    qh = q.reshape(B, Tq, H, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Tk, H, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Tk, H, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, vh, preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(B, Tq, D).astype(q.dtype)


def _lin(x, p, name):
    y = jnp.einsum("btc,oc->bto", x, p[name + ".weight"],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if name + ".bias" in p:
        y = y + p[name + ".bias"].astype(y.dtype)
    return y


def _attn_block(x, p, prefix, n_heads, kv=None, mask=None):
    """Pre-LN attention block. kv=None => self-attention."""
    h = layer_norm(x, p[prefix + "_ln.weight"], p[prefix + "_ln.bias"])
    src = h if kv is None else kv
    q = _lin(h, p, prefix + ".q")
    k = _lin(src, p, prefix + ".k")
    v = _lin(src, p, prefix + ".v")
    out = _mha(q, k, v, n_heads, mask)
    return x + _lin(out, p, prefix + ".out")


def _ffn_block(x, p, prefix):
    h = layer_norm(x, p[prefix + "_ln.weight"], p[prefix + "_ln.bias"])
    h = _lin(h, p, prefix + ".fc1")
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    return x + _lin(h, p, prefix + ".fc2")


def encode(params: Params, cfg: WhisperConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel: (B, n_mels, 3000) -> (B, 1500, d)."""
    x = mel.transpose(0, 2, 1)  # (B, T, n_mels), conv over T
    w1 = params["enc.conv1.weight"]  # (d, n_mels, 3)
    x = jax.lax.conv_general_dilated(
        x, w1.transpose(2, 1, 0), (1,), [(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    x = jax.nn.gelu(x + params["enc.conv1.bias"], approximate=False)
    w2 = params["enc.conv2.weight"]
    x = jax.lax.conv_general_dilated(
        x, w2.transpose(2, 1, 0), (2,), [(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    x = jax.nn.gelu(x + params["enc.conv2.bias"], approximate=False)
    x = x + params["enc.pos"][None, :x.shape[1]]
    for i in range(cfg.enc_layers):
        pre = f"enc.{i}."
        x = _attn_block(x, params, pre + "attn", cfg.enc_heads)
        x = _ffn_block(x, params, pre + "ffn")
    return layer_norm(x, params["enc.ln.weight"], params["enc.ln.bias"])


def decode(params: Params, cfg: WhisperConfig, tokens: jnp.ndarray,
           enc_out: jnp.ndarray) -> jnp.ndarray:
    """Full (non-cached) decoder pass: tokens (B, T) -> logits (B, T, V)."""
    B, T = tokens.shape
    x = params["dec.tok_embd"][tokens] + params["dec.pos"][None, :T]
    causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
    for i in range(cfg.dec_layers):
        pre = f"dec.{i}."
        x = _attn_block(x, params, pre + "attn", cfg.dec_heads, mask=causal)
        x = _attn_block(x, params, pre + "cross", cfg.dec_heads, kv=enc_out)
        x = _ffn_block(x, params, pre + "ffn")
    x = layer_norm(x, params["dec.ln.weight"], params["dec.ln.bias"])
    return jnp.einsum("btc,vc->btv", x, params["dec.tok_embd"],
                      preferred_element_type=jnp.float32)


class WhisperModel:
    def __init__(self, cfg: WhisperConfig, params: Params, tokenizer=None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self._encode = jax.jit(partial(encode, cfg=cfg))
        self._decode = jax.jit(partial(decode, cfg=cfg))

    _BUCKETS = (8, 16, 32, 64, 128, 256, 448)

    def transcribe_tokens(self, audio: np.ndarray, max_tokens: int = 224,
                          language_id: int | None = None,
                          translate: bool = False) -> list[int]:
        """Greedy decode; returns generated token ids (without specials).
        The token stream pads to shape buckets so the jitted decoder compiles
        once per bucket, not once per length."""
        cfg = self.cfg
        mel = pad_or_trim_mel(log_mel_spectrogram(audio, cfg.n_mels))
        enc = self._encode(params=self.params, mel=jnp.asarray(mel[None]))
        prompt = [cfg.sot_id, language_id or cfg.lang_en_id,
                  cfg.translate_id if translate else cfg.transcribe_id,
                  cfg.no_timestamps_id]
        toks = list(prompt)
        out: list[int] = []
        for _ in range(max_tokens):
            n = len(toks)
            b = next((x for x in self._BUCKETS if x >= n), self._BUCKETS[-1])
            padded = toks + [0] * (b - n)
            logits = self._decode(params=self.params,
                                  tokens=jnp.asarray([padded], dtype=jnp.int32),
                                  enc_out=enc)
            nxt = int(np.asarray(logits[0, n - 1]).argmax())
            if nxt == cfg.eot_id or len(toks) >= cfg.n_text_ctx - 1:
                break
            toks.append(nxt)
            out.append(nxt)
        return out

    def transcribe(self, audio: np.ndarray, **kw) -> str:
        ids = self.transcribe_tokens(audio, **kw)
        if self.tokenizer is None:
            return " ".join(map(str, ids))
        return self.tokenizer.decode(ids)


def load_whisper(path: str) -> WhisperModel:
    """Load from our GGUF container (tools/convert_whisper.py)."""
    from ..tokenizers import Tokenizer

    with GGUFReader(path) as r:
        md = r.metadata
        cfg = WhisperConfig(
            n_mels=int(md.get("whisper.n_mels", 80)),
            d_model=int(md.get("whisper.d_model", 384)),
            enc_layers=int(md.get("whisper.encoder_layers", 4)),
            enc_heads=int(md.get("whisper.encoder_heads", 6)),
            dec_layers=int(md.get("whisper.decoder_layers", 4)),
            dec_heads=int(md.get("whisper.decoder_heads", 6)),
            n_audio_ctx=int(md.get("whisper.n_audio_ctx", 1500)),
            n_text_ctx=int(md.get("whisper.n_text_ctx", 448)),
            vocab_size=int(md.get("whisper.vocab_size", 51865)),
            eot_id=int(md.get("whisper.eot_id", 50257)),
            sot_id=int(md.get("whisper.sot_id", 50258)),
            transcribe_id=int(md.get("whisper.transcribe_id", 50359)),
            translate_id=int(md.get("whisper.translate_id", 50358)),
            no_timestamps_id=int(md.get("whisper.no_timestamps_id", 50363)),
            lang_en_id=int(md.get("whisper.lang_en_id", 50259)),
        )
        params = {name: jnp.asarray(r.tensor_data(name)) for name in r.tensors}
        tok = None
        if md.get("tokenizer.ggml.tokens") is not None:
            tok = Tokenizer.from_metadata(md)
    return WhisperModel(cfg, params, tok)
