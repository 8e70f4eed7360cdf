"""TTS model registry (reference: mlx_audio/tts/utils.py:19-120)."""

from __future__ import annotations

from pathlib import Path
from typing import List, Union

from ..utils import base_load_model

MODEL_REMAPPING = {
    "qwen3_tts": "qwen3_tts",
    "outetts": "outetts",
    "spark": "spark",
    "marvis": "sesame",
    "csm": "sesame",
    "voxcpm": "voxcpm",
    "voxcpm1.5": "voxcpm",
    "vibevoice_streaming": "vibevoice",
    "chatterbox_turbo": "chatterbox_turbo",
    "soprano": "soprano",
    "echo_tts": "echo_tts",
    "orpheus": "llama",
    "vyvo": "qwen3",
}


def get_available_models() -> List[str]:
    models_dir = Path(__file__).parent / "models"
    return sorted(
        d.name
        for d in models_dir.iterdir()
        if d.is_dir() and not d.name.startswith("__")
    )


def load_model(model_path: Union[str, Path], lazy: bool = False,
               strict: bool = False, **kwargs):
    return base_load_model(
        model_path=model_path,
        category="tts",
        model_remapping=MODEL_REMAPPING,
        lazy=lazy,
        strict=strict,
        **kwargs,
    )
