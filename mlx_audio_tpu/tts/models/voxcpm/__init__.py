from .voxcpm import (
    AudioVAE,
    LMConfig,
    MiniCPMModel,
    Model,
    ModelArgs,
    UnifiedCFM,
    VoxCPMLocDiT,
    VoxCPMLocEnc,
)
