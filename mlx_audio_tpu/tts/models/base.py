"""Shared TTS result types (contract of reference tts/models/base.py:72-88)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

from ...base import BaseModelArgs  # re-export for model configs

__all__ = ["GenerationResult", "BaseModelArgs", "check_array_shape", "adjust_speed", "format_duration"]


@dataclass
class GenerationResult:
    audio: Any  # np.ndarray (samples,) float32
    samples: int
    sample_rate: int
    segment_idx: int = 0
    token_count: int = 0
    audio_duration: str = ""
    real_time_factor: float = 0.0
    prompt: dict = field(default_factory=dict)
    audio_samples: dict = field(default_factory=dict)
    processing_time_seconds: float = 0.0
    peak_memory_usage: float = 0.0
    # streaming flags (reference tts/models/base.py:72-88)
    is_streaming_chunk: bool = False
    is_final_chunk: bool = False

    def __post_init__(self):
        # 0.0 is the "unknown" sentinel models pass — fill with the real HBM
        # high-water mark (reference reports mx.get_peak_memory per segment).
        if not self.peak_memory_usage:
            from ...profiling import peak_memory_gb

            self.peak_memory_usage = peak_memory_gb()


def format_duration(seconds: float) -> str:
    hours = int(seconds // 3600)
    mins = int((seconds % 3600) // 60)
    secs = int(seconds % 60)
    ms = int((seconds % 1) * 1000)
    return f"{hours:02d}:{mins:02d}:{secs:02d}.{ms:03d}"


def check_array_shape(arr) -> bool:
    """Heuristic: is a conv weight already in (out, k, in) layout?
    (Same check the reference uses for idempotent sanitize.)"""
    shape = arr.shape
    if len(shape) != 3:
        return False
    out_channels, kH, kW = shape
    return (out_channels >= kH) and (out_channels >= kW) and (kH == kW)


from ...nn.sanitize import orient_to  # noqa: E402  (re-export)


def adjust_speed(audio: np.ndarray, speed: float) -> np.ndarray:
    """Linear-interpolation resample to change playback speed
    (reference tts/models/base.py:37)."""
    if speed == 1.0:
        return audio
    n_out = int(len(audio) / speed)
    idx = np.linspace(0, len(audio) - 1, n_out)
    return np.interp(idx, np.arange(len(audio)), audio).astype(audio.dtype)
