from .config import (
    ConformerEncoderConfig,
    DepthformerConfig,
    DetokenizerConfig,
    LFM2AudioConfig,
    LFM2Config,
    PreprocessorConfig,
)
from .conformer import ConformerEncoder
from .detokenizer import LFM2AudioDetokenizer
from .lfm2 import Lfm2Model
from .model import LFM2AudioModel, Model
from .processor import (
    AudioPreprocessor,
    ChatState,
    LFM2AudioProcessor,
    LFMModality,
)
from .transformer import Depthformer
