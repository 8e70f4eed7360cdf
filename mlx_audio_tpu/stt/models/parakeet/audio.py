"""NeMo-compatible mel front-end for Parakeet
(spec: reference stt/models/parakeet/audio.py)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ....dsp import STR_TO_WINDOW_FN, hanning, mel_filters, stft


@dataclass
class PreprocessArgs:
    sample_rate: int = 16000
    normalize: str = "per_feature"
    window_size: float = 0.025
    window_stride: float = 0.01
    window: str = "hann"
    features: int = 80
    n_fft: int = 512
    dither: float = 0.0
    pad_to: int = 0
    pad_value: float = 0.0
    preemph: float = 0.97

    @property
    def win_length(self) -> int:
        return int(self.window_size * self.sample_rate)

    @property
    def hop_length(self) -> int:
        return int(self.window_stride * self.sample_rate)


def log_mel_spectrogram(x: jax.Array, args: PreprocessArgs) -> jax.Array:
    """(T,) waveform → (1, frames, features), per-feature normalized."""
    x = jnp.asarray(x, jnp.float32).reshape(-1)
    if args.pad_to > 0 and x.shape[-1] < args.pad_to:
        x = jnp.pad(x, (0, args.pad_to - x.shape[-1]),
                    constant_values=args.pad_value)
    window_fn = STR_TO_WINDOW_FN.get(args.window, hanning)
    window = window_fn(args.win_length)
    if args.preemph > 0:
        x = jnp.concatenate([x[:1], x[1:] - args.preemph * x[:-1]])
    spec = stft(x, args.n_fft, args.hop_length, args.win_length, window)
    power = jnp.abs(spec) ** 2  # (frames, freq)
    # NeMo uses slaney-scale filters without area norm (reference audio.py:59
    # passes mel_scale=None which falls through to the slaney branch)
    fb = mel_filters(args.sample_rate, args.n_fft, args.features,
                     norm=None, mel_scale="slaney")
    mel = jnp.matmul(power, fb.T, preferred_element_type=jnp.float32)
    logmel = jnp.log(mel + 1e-5)  # (frames, features)
    if args.normalize == "per_feature":
        mean = logmel.mean(axis=0, keepdims=True)
        std = logmel.std(axis=0, keepdims=True)
    else:
        mean = logmel.mean()
        std = logmel.std()
    return ((logmel - mean) / (std + 1e-5))[None]
