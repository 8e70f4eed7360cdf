from .config import (
    SAMAudioConfig,
    T5Config,
    T5EncoderConfig,
    TransformerConfig,
    sam_audio_base,
    sam_audio_large,
    sam_audio_small,
)
from .model import (
    SAMAudio,
    SAMAudioProcessor,
    SeparationResult,
    StreamingChunk,
)
from .text_encoder import T5Encoder, T5TextEncoder
from .transformer import DiT

Model = SAMAudio
