from .qwen3_asr import (
    AudioEncoder,
    AudioEncoderConfig,
    Model,
    ModelConfig,
    StreamingResult,
    TextConfig,
    split_audio_into_chunks,
)
from .qwen3_forced_aligner import (
    ForcedAlignerConfig,
    ForcedAlignerModel,
    ForcedAlignItem,
    ForcedAlignResult,
    ForceAlignProcessor,
)
