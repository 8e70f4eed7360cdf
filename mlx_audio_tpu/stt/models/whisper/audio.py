"""Whisper audio front-end constants + mel extraction
(spec: reference stt/models/whisper/audio.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ....dsp import log_mel_spectrogram as _log_mel

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000
N_SAMPLES_PER_TOKEN = HOP_LENGTH * 2
FRAMES_PER_SECOND = SAMPLE_RATE // HOP_LENGTH
TOKENS_PER_SECOND = SAMPLE_RATE // N_SAMPLES_PER_TOKEN


def pad_or_trim(array, length: int = N_SAMPLES, axis: int = -1):
    xp = jnp if isinstance(array, jax.Array) else np
    if array.shape[axis] > length:
        sl = [slice(None)] * array.ndim
        sl[axis] = slice(0, length)
        return array[tuple(sl)]
    if array.shape[axis] < length:
        pad = [(0, 0)] * array.ndim
        pad[axis] = (0, length - array.shape[axis])
        return xp.pad(array, pad)
    return array


def log_mel_spectrogram(audio, n_mels: int = 80, padding: int = 0):
    """Whisper-normalized log-mel, shape (T, n_mels)."""
    x = jnp.asarray(audio, jnp.float32)
    return _log_mel(
        x, n_mels=n_mels, n_fft=N_FFT, hop_length=HOP_LENGTH,
        sample_rate=SAMPLE_RATE, padding=padding,
    )
