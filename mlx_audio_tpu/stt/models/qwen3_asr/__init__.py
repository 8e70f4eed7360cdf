from .qwen3_asr import (
    AudioEncoder,
    AudioEncoderConfig,
    Model,
    ModelConfig,
    TextConfig,
)
from .qwen3_forced_aligner import (
    ForcedAlignerConfig,
    ForcedAlignerModel,
    ForcedAlignItem,
    ForcedAlignResult,
    ForceAlignProcessor,
)
