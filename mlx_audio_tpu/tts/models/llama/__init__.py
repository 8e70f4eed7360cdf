from .llama import Model, ModelConfig
