"""LSTM voice encoder for Chatterbox speaker embeddings.

TPU-native re-implementation of the reference
mlx_audio/tts/models/chatterbox/voice_encoder/ (voice_encoder.py,
melspec.py, config.py). Partials are batched and encoded in one jitted
call; the 3-layer LSTM uses the framework's scan-based LSTM.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....dsp import mel_filters, stft
from ....nn import layers as nn
from ....nn.module import Module
from ....nn.recurrent import LSTM

__all__ = ["VoiceEncoder", "VoiceEncConfig", "melspectrogram"]


@dataclass
class VoiceEncConfig:
    num_mels: int = 40
    sample_rate: int = 16000
    speaker_embed_size: int = 256
    ve_hidden_size: int = 256
    n_fft: int = 400
    hop_size: int = 160
    win_size: int = 400
    fmax: int = 8000
    fmin: int = 0
    mel_power: float = 2.0
    mel_type: str = "amp"
    normalized_mels: bool = False
    ve_partial_frames: int = 160
    ve_final_relu: bool = True
    stft_magnitude_min: float = 1e-4


def melspectrogram(wav, hp: Optional[VoiceEncConfig] = None) -> jnp.ndarray:
    """Waveform → (B, T', num_mels) mel (reference melspec.py:13-77;
    channels-last here)."""
    hp = hp or VoiceEncConfig()
    wav = jnp.asarray(wav, jnp.float32)
    if wav.ndim == 1:
        wav = wav[None]
    spec = stft(wav, n_fft=hp.n_fft, hop_length=hp.hop_size,
                win_length=hp.win_size, window="hann")  # (B, T', F)
    mag = jnp.abs(spec) ** hp.mel_power
    filters = mel_filters(hp.sample_rate, hp.n_fft, hp.num_mels,
                          f_min=hp.fmin, f_max=hp.fmax, norm="slaney",
                          mel_scale="slaney")
    mel = mag @ filters.T  # (B, T', M)
    if hp.mel_type == "db":
        mel = 20 * jnp.log10(jnp.maximum(mel, hp.stft_magnitude_min))
    if hp.normalized_mels:
        min_db = 20 * math.log10(hp.stft_magnitude_min)
        mel = (mel - min_db) / (-min_db + 15)
    return mel


def get_frame_step(overlap: float, rate: Optional[float],
                   hp: VoiceEncConfig) -> int:
    """reference voice_encoder.py:30-43."""
    if rate is None:
        frame_step = int(round(hp.ve_partial_frames * (1 - overlap)))
    else:
        frame_step = int(round(hp.sample_rate / rate / hp.hop_size))
    return max(1, min(frame_step, hp.ve_partial_frames))


def get_num_wins(n_frames: int, step: int, min_coverage: float,
                 hp: VoiceEncConfig):
    """reference voice_encoder.py:14-28."""
    win_size = hp.ve_partial_frames
    n_wins, remainder = divmod(max(n_frames - win_size + step, 0), step)
    if n_wins == 0 or (remainder + (win_size - step)) / win_size >= min_coverage:
        n_wins += 1
    target_n = win_size + step * (n_wins - 1)
    return n_wins, target_n


class VoiceEncoder(Module):
    """3-layer LSTM + projection (reference voice_encoder.py:139-479)."""

    def __init__(self, hp: Optional[VoiceEncConfig] = None):
        hp = hp or VoiceEncConfig()
        self.hp = hp
        self.lstm = [
            LSTM(hp.num_mels if i == 0 else hp.ve_hidden_size,
                 hp.ve_hidden_size)
            for i in range(3)
        ]
        self.proj = nn.Linear(hp.ve_hidden_size, hp.speaker_embed_size)

    def __call__(self, mels: jnp.ndarray) -> jnp.ndarray:
        """(B, ve_partial_frames, M) → L2-normed (B, E)."""
        h = mels
        for layer in self.lstm:
            h, _ = layer(h)
        final = h[:, -1]
        emb = self.proj(final)
        if self.hp.ve_final_relu:
            emb = jax.nn.relu(emb)
        return emb / jnp.linalg.norm(emb, axis=1, keepdims=True)

    def inference(self, mels: jnp.ndarray, mel_lens: List[int],
                  overlap: float = 0.5, rate: Optional[float] = None,
                  min_coverage: float = 0.8) -> jnp.ndarray:
        """Full utterances → (B, E) via averaged partials
        (reference voice_encoder.py:242-373)."""
        step = get_frame_step(overlap, rate, self.hp)
        wins = [get_num_wins(l, step, min_coverage, self.hp)
                for l in mel_lens]
        target = max(t for _, t in wins)
        if target > mels.shape[1]:
            mels = jnp.pad(mels, ((0, 0), (0, target - mels.shape[1]),
                                  (0, 0)))
        partials = []
        owners = []
        for b, (n_win, _) in enumerate(wins):
            for w in range(n_win):
                partials.append(mels[b, w * step: w * step
                                     + self.hp.ve_partial_frames])
                owners.append(b)
        embeds = self(jnp.stack(partials))
        out = []
        owners = np.asarray(owners)
        for b in range(len(mel_lens)):
            raw = jnp.mean(embeds[jnp.asarray(np.where(owners == b)[0])],
                           axis=0)
            out.append(raw / jnp.linalg.norm(raw))
        return jnp.stack(out)

    def embeds_from_wavs(self, wavs: List[np.ndarray],
                         sample_rate: int = 16000,
                         as_spk: bool = False, **kwargs) -> jnp.ndarray:
        """Waveforms → partial-averaged embeddings
        (reference voice_encoder.py:375-479)."""
        from ....utils import resample_audio

        hp = self.hp
        proc = []
        for w in wavs:
            w = np.asarray(w, np.float32).reshape(-1)
            if sample_rate != hp.sample_rate:
                w = resample_audio(w, sample_rate, hp.sample_rate)
            proc.append(w)
        mels = [np.asarray(melspectrogram(w, hp))[0] for w in proc]
        T = max(m.shape[0] for m in mels)
        lens = [m.shape[0] for m in mels]
        batch = jnp.stack([jnp.pad(jnp.asarray(m),
                                   ((0, T - m.shape[0]), (0, 0)))
                           for m in mels])
        return self.inference(batch, lens, **kwargs)

    def sanitize(self, weights: dict) -> dict:
        """torch LSTM key remap (reference voice_encoder.py:154-200)."""
        import re

        remap = {"weight_ih": "Wx", "weight_hh": "Wh",
                 "bias_ih": "bias_ih", "bias_hh": "bias_hh"}
        out = {}
        for key, value in weights.items():
            m = re.search(r"lstm\.(weight_ih|weight_hh|bias_ih|bias_hh)_l(\d+)",
                          key)
            if m:
                out[f"lstm.{int(m.group(2))}.{remap[m.group(1)]}"] = value
            elif key.startswith("similarity_"):
                continue  # training-only scalars
            else:
                out[key] = value
        return out
