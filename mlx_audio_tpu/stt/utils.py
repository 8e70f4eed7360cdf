"""STT model registry + 16 kHz audio loading (reference: mlx_audio/stt/utils.py)."""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Optional, Union

import numpy as np

from ..utils import base_load_model, load_audio as _load_audio_generic, resample_audio

SAMPLE_RATE = 16000

MODEL_REMAPPING = {
    "glm": "glmasr",
    "voxtral": "voxtral",
    "voxtral_realtime": "voxtral_realtime",
    "vibevoice": "vibevoice_asr",
    "qwen3_asr": "qwen3_asr",
    "medasr": "funasr",
}


def load_audio(
    file: Optional[str] = None,
    sr: int = SAMPLE_RATE,
    from_stdin: bool = False,
    dtype=np.float32,
) -> np.ndarray:
    """Open an audio file (or stdin bytes) as mono waveform at `sr`."""
    if from_stdin:
        from .. import audio_io

        data = sys.stdin.buffer.read()
        x, orig_sr = audio_io.read(data)
        if x.ndim == 2:
            x = x.mean(axis=1)
        if orig_sr != sr:
            x = resample_audio(x, orig_sr, sr)
        return x.astype(dtype)
    return _load_audio_generic(file, sample_rate=sr, dtype=dtype)


def load_model(model_path: Union[str, Path], lazy: bool = False,
               strict: bool = False, **kwargs):
    return base_load_model(
        model_path=model_path,
        category="stt",
        model_remapping=MODEL_REMAPPING,
        lazy=lazy,
        strict=strict,
        **kwargs,
    )


def load(model_path: Union[str, Path], lazy: bool = False,
         strict: bool = False, **kwargs):
    """Alias of load_model (reference stt/utils.py:85-108)."""
    return load_model(model_path, lazy=lazy, **kwargs)
