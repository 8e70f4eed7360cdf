from .config import (
    CosyVoice3Config,
    DiTConfig,
    FlowConfig,
    HiFiGANConfig,
    LLMConfig,
    ModelConfig,
)
from .cosyvoice3 import CosyVoice3, Model, build_cosyvoice3
from .dit import DiT
from .flow import CausalMaskedDiffWithDiT, CosyVoice3ConditionalCFM
from .hifigan import CausalHiFTGenerator
from .llm import CosyVoice3LM
