from .voxtral_realtime import DecoderConfig, EncoderConfig, Model, ModelConfig
