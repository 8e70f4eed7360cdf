from .wav2vec import Model, ModelConfig
