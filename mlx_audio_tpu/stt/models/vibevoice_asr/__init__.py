from .audio_encoder import (
    AcousticTokenizerEncoder,
    SemanticTokenizerEncoder,
    TokenizerEncoder,
)
from .config import ModelConfig, Qwen2Config, TokenizerEncoderConfig
from .vibevoice_asr import Model
