from ..wav2vec.wav2vec import Model, ModelConfig
