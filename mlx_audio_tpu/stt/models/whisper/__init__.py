from .whisper import Model, ModelConfig, ModelDimensions
