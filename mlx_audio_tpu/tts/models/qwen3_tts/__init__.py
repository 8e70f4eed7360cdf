from .qwen3_tts import Model, ModelConfig
