from .parakeet import (
    Model,
    ModelConfig,
    ParakeetCTC,
    ParakeetRNNT,
    ParakeetTDT,
    ParakeetTDTCTC,
    StreamingResult,
)
