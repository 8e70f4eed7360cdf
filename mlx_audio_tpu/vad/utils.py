"""VAD/diarization model registry (reference: mlx_audio/vad/utils.py)."""

from __future__ import annotations

from pathlib import Path
from typing import Union

from ..utils import base_load_model

MODEL_REMAPPING: dict = {}


def load_model(model_path: Union[str, Path], lazy: bool = False,
               strict: bool = False, **kwargs):
    return base_load_model(
        model_path=model_path,
        category="vad",
        model_remapping=MODEL_REMAPPING,
        lazy=lazy,
        strict=strict,
        **kwargs,
    )


def load(model_path: Union[str, Path], lazy: bool = False,
         strict: bool = False, **kwargs):
    """Alias of load_model (reference vad/utils.py:36-58)."""
    return load_model(model_path, lazy=lazy, **kwargs)
