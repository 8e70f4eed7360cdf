"""Split Qwen2 backbone for VibeVoice.

TPU-native re-implementation of the reference
mlx_audio/tts/models/vibevoice/language_model.py:12-423. The 24-layer Qwen2
is split into a lower `language_model` (text, no final norm) and an upper
`tts_language_model` (TTS, with norm); both reuse the framework's
TransformerBlock + static-shape KVCache so window steps append contiguously
with no recompilation across steps of the same width.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from ....lm.cache import KVCache
from ....lm.transformer import LMConfig, TransformerBlock, rope_cos_sin
from ....nn import layers as nn
from ....nn.module import Module
from .config import Qwen2DecoderConfig

__all__ = ["Qwen2Stack", "SpeechConnector", "BinaryClassifier"]


def _lm_cfg(cfg: Qwen2DecoderConfig, num_layers: int) -> LMConfig:
    return LMConfig(
        model_type="qwen2", hidden_size=cfg.hidden_size,
        num_hidden_layers=num_layers,
        intermediate_size=cfg.intermediate_size,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim, rms_norm_eps=cfg.rms_norm_eps,
        vocab_size=cfg.vocab_size, rope_theta=cfg.rope_theta,
        attention_bias=True,
        max_position_embeddings=cfg.max_position_embeddings)


class Qwen2Stack(Module):
    """A contiguous run of Qwen2 layers (reference
    language_model.py:259-357). `use_norm=False` for the lower stack that
    feeds into the upper one; only the lower stack owns `embed_tokens`."""

    def __init__(self, config: Qwen2DecoderConfig, num_layers: int,
                 use_norm: bool = True, with_embed: bool = True):
        cfg = _lm_cfg(config, num_layers)
        self.config = cfg
        if with_embed:
            self.embed_tokens = nn.Embedding(cfg.vocab_size, cfg.hidden_size)
        self.layers = [TransformerBlock(cfg) for _ in range(num_layers)]
        if use_norm:
            self.norm = nn.RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)

    def make_caches(self, batch: int = 1, max_len: int = 4096,
                    dtype=jnp.float32) -> List[KVCache]:
        cfg = self.config
        return [KVCache(batch, cfg.num_key_value_heads, max_len,
                        cfg.head_dim, dtype)
                for _ in range(cfg.num_hidden_layers)]

    def __call__(self, h: jnp.ndarray,
                 caches: Optional[List[KVCache]] = None,
                 positions: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None):
        T = h.shape[1]
        if positions is None:
            start = caches[0].pos if caches is not None else 0
            positions = start + jnp.arange(T)
        cos, sin = rope_cos_sin(positions, self.config.head_dim,
                                base=self.config.rope_theta,
                                dtype=jnp.float32)
        if cos.ndim == 3:  # per-row positions (B, T) → broadcast over heads
            cos, sin = cos[:, None], sin[:, None]
        if mask is None:
            if caches is not None:
                mask = caches[0].attention_mask(T)
            elif T > 1:
                from ....ops.attention import make_causal_mask
                mask = make_causal_mask(T, T)
        new_caches = [] if caches is not None else None
        for i, layer in enumerate(self.layers):
            h, nc = layer(h, cos, sin, mask,
                          caches[i] if caches is not None else None)
            if new_caches is not None:
                new_caches.append(nc)
        if hasattr(self, "norm"):
            h = self.norm(h)
        return h, new_caches


class SpeechConnector(Module):
    """Latent → hidden projection (reference language_model.py:229-242)."""

    def __init__(self, input_dim: int, output_dim: int, eps: float = 1e-6):
        self.fc1 = nn.Linear(input_dim, output_dim)
        self.norm = nn.RMSNorm(output_dim, eps=eps)
        self.fc2 = nn.Linear(output_dim, output_dim)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.fc2(self.norm(self.fc1(x)))


class BinaryClassifier(Module):
    """End-of-speech head (reference language_model.py:245-256)."""

    def __init__(self, hidden_size: int):
        self.fc1 = nn.Linear(hidden_size, hidden_size)
        self.fc2 = nn.Linear(hidden_size, 1)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.fc2(jax.nn.relu(self.fc1(x)))
