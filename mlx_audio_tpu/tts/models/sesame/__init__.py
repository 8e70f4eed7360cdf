from .sesame import Model, ModelConfig, Segment, SesameModel
