from .kokoro import Model, ModelConfig
from .pipeline import KokoroPipeline
