from .chatterbox_turbo import (
    GPT2_MEDIUM_CONFIG,
    Model,
    ModelConfig,
    T3Turbo,
    T3TurboConfig,
)
