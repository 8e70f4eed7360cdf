from .pocket_tts import (
    FlowLMConfig,
    FlowLMModel,
    Model,
    ModelConfig,
    SimpleMLPAdaLN,
    lsd_decode,
)
