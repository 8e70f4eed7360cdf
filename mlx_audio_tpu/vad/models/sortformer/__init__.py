from .sortformer import Model, DiarizationOutput, DiarizationSegment, StreamingState
from .config import ModelConfig
