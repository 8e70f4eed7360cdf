from .chatterbox import Conditionals, Model, drop_invalid_tokens, punc_norm
from .config import LLAMA_CONFIGS, ModelConfig, T3Config
from .t3 import T3, T3Cond
from .tokenizer import EnTokenizer, MTLTokenizer
from .voice_encoder import VoiceEncConfig, VoiceEncoder
