from .fish_s1_dac import (
    DownsampleResidualVectorQuantize,
    FishS1DAC,
    WindowLimitedTransformer,
    build_ae,
)
