"""In-repo LM core — replaces the reference's `mlx-lm` dependency.

Provides transformer backbones (Llama/Qwen2/Qwen3 family, GPT-2), a
static-shape functional KV cache, samplers, and a jitted stream-generate
loop (SURVEY §7: "In-repo LM core replacing mlx-lm").
"""

from .cache import KVCache, make_caches
from .transformer import LMConfig, CausalLM, TransformerBlock, CausalSelfAttention
from .sample import make_sampler, apply_repetition_penalty
from .generate import stream_generate, generate_tokens, GenerationResponse
from .continuous import ContinuousBatcher, SlotKVCache
from .gpt2 import GPT2Config, GPT2Model
