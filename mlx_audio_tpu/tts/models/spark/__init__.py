from .spark import (
    BiCodec,
    FSQ,
    FactorizedVectorQuantize,
    Model,
    ModelConfig,
    ResidualFSQ,
    SpeakerEncoder,
    WaveGenerator,
)
