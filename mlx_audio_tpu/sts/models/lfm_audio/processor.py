"""LFM2.5-Audio processor: NeMo mel frontend, chat state, tokenization.

TPU-native re-implementation of the reference
mlx_audio/sts/models/lfm_audio/processor.py:23-568. The mel extraction is
batched and in-graph (dither is key-driven and off by default for
deterministic inference); the text tokenizer and Mimi codec are injectable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum
from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....dsp import mel_filters, stft
from .config import PreprocessorConfig

__all__ = ["AudioPreprocessor", "LFM2AudioProcessor", "ChatState",
           "LFMModality"]


class LFMModality(IntEnum):
    """reference model.py:26-35."""

    TEXT = 1
    AUDIO_IN = 2
    AUDIO_OUT = 3


class AudioPreprocessor:
    """Pre-emphasized log-mel with NeMo per-feature normalization
    (reference processor.py:34-143)."""

    def __init__(self, config: Optional[PreprocessorConfig] = None):
        self.config = config or PreprocessorConfig()
        cfg = self.config
        self._filters = mel_filters(
            cfg.sample_rate, cfg.n_fft, cfg.features, norm="slaney",
            mel_scale="slaney")

    def __call__(self, audio, key: Optional[jax.Array] = None
                 ) -> jnp.ndarray:
        """(T,) or (B, T) → (T', features) or (B, T', features)."""
        cfg = self.config
        x = jnp.asarray(audio, jnp.float32)
        single = x.ndim == 1
        if single:
            x = x[None]
        if cfg.dither > 0 and key is not None:
            x = x + cfg.dither * jax.random.normal(key, x.shape)
        if cfg.preemph > 0:
            x = jnp.concatenate(
                [x[:, :1], x[:, 1:] - cfg.preemph * x[:, :-1]], axis=1)
        spec = stft(x, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                    win_length=cfg.win_length, window="hann", center=True,
                    pad_mode="constant")
        power = jnp.abs(spec) ** 2
        mel = power @ self._filters.T
        if cfg.log:
            mel = jnp.log(mel + 5.96e-8)
        if cfg.normalize == "per_feature":
            n = min(x.shape[1] // cfg.hop_length, mel.shape[1])
            valid = mel[:, :n]
            mean = jnp.mean(valid, axis=1, keepdims=True)
            var = jnp.sum((valid - mean) ** 2, axis=1,
                          keepdims=True) / max(n - 1, 1)
            mel = (mel - mean) / (jnp.sqrt(var) + 1e-5)
        return mel[0] if single else mel


class LFM2AudioProcessor:
    """Tokenizer/codec front door (reference processor.py:145-437)."""

    def __init__(self, tokenizer=None, mimi=None, detokenizer=None,
                 preprocessor: Optional[AudioPreprocessor] = None):
        self.tokenizer = tokenizer
        self.mimi = mimi
        self.detokenizer = detokenizer
        self.preprocessor = preprocessor or AudioPreprocessor()

    def preprocess_audio(self, audio, sample_rate: int = 16000
                         ) -> jnp.ndarray:
        if sample_rate != self.preprocessor.config.sample_rate:
            from ....utils import resample_audio
            audio = resample_audio(np.asarray(audio, np.float32),
                                   sample_rate,
                                   self.preprocessor.config.sample_rate)
        return self.preprocessor(audio)

    def tokenize_text(self, text: str) -> np.ndarray:
        return np.asarray(
            self.tokenizer.encode(text, add_special_tokens=False),
            np.int32)

    def format_chat(self, messages, add_generation_prompt: bool = True
                    ) -> str:
        """Render role/content messages with the tokenizer's chat template
        (reference processor.py:329-349); falls back to ChatMLish markers
        when the tokenizer has no template."""
        apply = getattr(self.tokenizer, "apply_chat_template", None)
        if apply is not None:
            try:
                return apply(messages, tokenize=False,
                             add_generation_prompt=add_generation_prompt)
            except (ValueError, TypeError):
                pass
        parts = [f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>"
                 for m in messages]
        if add_generation_prompt:
            parts.append("<|im_start|>assistant\n")
        return "\n".join(parts)

    def tokenize_chat(self, messages, add_generation_prompt: bool = True
                      ) -> np.ndarray:
        """format_chat + tokenize (reference processor.py:351-368)."""
        return self.tokenize_text(
            self.format_chat(messages, add_generation_prompt))

    def decode_text(self, tokens) -> str:
        return self.tokenizer.decode(
            [int(t) for t in np.asarray(tokens).reshape(-1)])

    def decode_audio(self, codes) -> np.ndarray:
        """codes (K, T) or (B, K, T) → waveform via the detokenizer."""
        if self.detokenizer is None:
            raise RuntimeError("detokenizer not set")
        codes = np.asarray(codes)
        if codes.ndim == 2:
            codes = codes[None]
        return np.asarray(self.detokenizer(jnp.asarray(codes)))


@dataclass
class ChatState:
    """Incrementally built multimodal prompt
    (reference processor.py:439-568)."""

    processor: LFM2AudioProcessor
    add_bos: bool = True
    text_tokens: List[int] = field(default_factory=list)
    audio_features: Optional[jnp.ndarray] = None
    modalities: List[int] = field(default_factory=list)

    def __post_init__(self):
        if self.add_bos:
            bos = getattr(self.processor.tokenizer, "bos_token_id", 1) or 1
            self.text_tokens.append(int(bos))
            self.modalities.append(LFMModality.TEXT)

    def _add_tokens(self, text: str):
        toks = self.processor.tokenize_text(text)
        self.text_tokens.extend(int(t) for t in toks)
        self.modalities.extend([LFMModality.TEXT] * len(toks))

    def new_turn(self, role: str):
        self._add_tokens(f"<|im_start|>{role}\n")

    def end_turn(self):
        self._add_tokens("<|im_end|>\n")

    def add_text(self, text: str):
        self._add_tokens(text)

    def add_audio(self, audio, sample_rate: int = 16000):
        feats = self.processor.preprocess_audio(audio, sample_rate)
        if self.audio_features is None:
            self.audio_features = feats
        else:
            self.audio_features = jnp.concatenate(
                [self.audio_features, feats], axis=0)

        def conv_out(n, k=3, s=2, p=1):
            return (n + 2 * p - k) // s + 1

        t = conv_out(conv_out(conv_out(feats.shape[0])))
        self.modalities.extend([LFMModality.AUDIO_IN] * t)

    def get_text_tokens(self) -> np.ndarray:
        return np.asarray(self.text_tokens, np.int32)[None]

    def get_audio_features(self) -> Optional[jnp.ndarray]:
        if self.audio_features is None:
            return None
        return self.audio_features[None] if self.audio_features.ndim == 2 \
            else self.audio_features

    def get_modalities(self) -> np.ndarray:
        return np.asarray([int(m) for m in self.modalities], np.int32)[None]
