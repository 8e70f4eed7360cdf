from .acoustic_tokenizer import AcousticTokenizer
from .config import (
    AcousticTokenizerConfig,
    DiffusionHeadConfig,
    ModelConfig,
    Qwen2DecoderConfig,
)
from .diffusion_head import DiffusionHead
from .language_model import BinaryClassifier, Qwen2Stack, SpeechConnector
from .scheduler import DPMCoeffs, dpm_solver_coeffs, dpm_step
from .vibevoice import Model
