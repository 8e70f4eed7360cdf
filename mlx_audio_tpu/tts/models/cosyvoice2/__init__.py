from .config import CosyVoice2Config, FlowConfig, HiFiGANConfig, LLMConfig, ModelConfig
from .cosyvoice2 import CosyVoice2, Model, build_cosyvoice2
from .llm import Qwen2LM
