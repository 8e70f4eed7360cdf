from .decoder import ConditionalDecoder
from .encoder import UpsampleConformerEncoder
from .flow import CausalMaskedDiffWithXvec
from .flow_matching import CFMParams, ConditionalCFM
from .hifigan import (
    ConvRNNF0Predictor,
    HiFTGenerator,
    ResBlock,
    SineGen,
    Snake,
    SourceModuleHnNSF,
)
from .mel import mel_spectrogram
from .xvector import CAMPPlus, kaldi_fbank
