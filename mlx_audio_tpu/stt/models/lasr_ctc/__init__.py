from .lasr import Model, ModelConfig, LasrForCTC, LasrEncoder
