"""Registry shim: model_type "qwen3_forced_aligner" → the aligner living in
qwen3_asr (mirrors reference stt/models/qwen3_forced_aligner/__init__.py)."""

from ..qwen3_asr.qwen3_forced_aligner import (
    ForceAlignProcessor,
    ForcedAlignItem,
    ForcedAlignResult,
)
from ..qwen3_asr.qwen3_forced_aligner import ForcedAlignerConfig as ModelConfig
from ..qwen3_asr.qwen3_forced_aligner import ForcedAlignerModel as Model

__all__ = ["ModelConfig", "Model", "ForcedAlignItem", "ForcedAlignResult",
           "ForceAlignProcessor"]
