from .soprano import Model, ModelConfig, SopranoDecoder
