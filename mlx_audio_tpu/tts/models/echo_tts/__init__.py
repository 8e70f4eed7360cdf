from .echo_tts import (
    EchoDiT,
    EchoDiTConfig,
    Model,
    ModelConfig,
    PCAState,
    SamplerConfig,
    normalize_text_prompt,
    tokenizer_encode,
)
