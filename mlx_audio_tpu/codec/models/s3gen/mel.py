"""Prompt-mel extraction for S3Gen / CosyVoice2 (24 kHz, 80 bins, hop 480).

reference: mlx_audio/codec/models/s3gen/mel.py. Batched via dsp.stft.
"""

from __future__ import annotations

import jax.numpy as jnp

from ....dsp import mel_filters, stft

__all__ = ["mel_spectrogram"]


def mel_spectrogram(
    y,
    n_fft: int = 1920,
    num_mels: int = 80,
    sampling_rate: int = 24000,
    hop_size: int = 480,
    win_size: int = 1920,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> jnp.ndarray:
    """Waveform (B, T) or (T,) → log-mel (B, T', num_mels) channels-last."""
    y = jnp.asarray(y, jnp.float32)
    if y.ndim == 1:
        y = y[None]
    pad = (n_fft - hop_size) // 2
    prefix = y[:, 1: pad + 1][:, ::-1]
    suffix = y[:, -(pad + 1): -1][:, ::-1]
    y = jnp.concatenate([prefix, y, suffix], axis=1)
    spec = stft(y, n_fft=n_fft, hop_length=hop_size, win_length=win_size,
                window="hann", center=False)  # (B, T', F)
    mag = jnp.abs(spec)
    filters = mel_filters(sampling_rate, n_fft, num_mels, f_min=fmin,
                          f_max=fmax, norm="slaney", mel_scale="slaney")
    mel = mag @ filters.T  # (B, T', M)
    return jnp.log(jnp.maximum(mel, 1e-5))
