"""Shared config base: dataclass-from-dict with unknown-key filtering.

Same contract as the reference's `BaseModelArgs.from_dict`
(/root/reference/mlx_audio/base.py:5-15): model `config.json` dicts carry
extra keys that must be ignored when instantiating a ModelConfig dataclass.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass

__all__ = ["BaseModelArgs", "GenerationMetrics"]


@dataclass
class BaseModelArgs:
    @classmethod
    def from_dict(cls, params: dict):
        return cls(
            **{
                k: v
                for k, v in params.items()
                if k in inspect.signature(cls).parameters
            }
        )


@dataclass
class GenerationMetrics:
    """Per-run instrumentation shared by TTS/STT results (RTF, tps, memory)."""

    real_time_factor: float = 0.0
    processing_time_seconds: float = 0.0
    audio_duration_seconds: float = 0.0
    tokens_per_second: float = 0.0
    peak_memory_gb: float = 0.0
