from .glmasr import LlamaConfig, Model, ModelConfig, WhisperConfig
