from .smart_turn import Model, ModelConfig, EndpointOutput
