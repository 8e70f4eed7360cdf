"""VibeVoice-ASR audio encoders (acoustic + semantic VAE encoders).

TPU-native re-implementation of the reference
mlx_audio/stt/models/vibevoice_asr/audio_encoder.py:36-711. The reference
chunks convs/FFNs along time to dodge Metal kernel limits
(audio_encoder.py:91-250) — on TPU XLA tiles these natively, so each
encoder is a single fused program. Channels-last (B, T, C) throughout.
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp

from ....nn import layers as nn
from ....nn.module import Module
from .config import TokenizerEncoderConfig

__all__ = ["SConv1d", "Block1D", "TokenizerEncoder",
           "AcousticTokenizerEncoder", "SemanticTokenizerEncoder"]


class SConv1d(Module):
    """Streaming-friendly causal conv: pad (k−1)·d − (s−1) on the left plus
    right alignment padding so every input frame lands in some output frame
    (reference audio_encoder.py:36-250)."""

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: int, stride: int = 1, dilation: int = 1,
                 groups: int = 1, bias: bool = True, causal: bool = True):
        self.kernel_size = kernel_size
        self.stride = stride
        self.dilation = dilation
        self.causal = causal
        self.padding_total = (kernel_size - 1) * dilation - (stride - 1)
        self.conv = nn.Conv1d(in_channels, out_channels, kernel_size,
                              stride=stride, dilation=dilation,
                              groups=groups, bias=bias)

    def _extra_padding(self, length: int) -> int:
        n_frames = (length - self.kernel_size
                    + self.padding_total) / self.stride + 1
        ideal = ((math.ceil(n_frames) - 1) * self.stride
                 + self.kernel_size - self.padding_total)
        return int(ideal - length)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        T = x.shape[1]
        extra = self._extra_padding(T)
        if self.causal:
            pad_l, pad_r = self.padding_total, extra
        else:
            pad_r = self.padding_total // 2
            pad_l = self.padding_total - pad_r
            pad_r += extra
        if pad_l or pad_r:
            x = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
        return self.conv(x)


class _DepthwiseConv(Module):
    """mixer.conv.conv nesting (reference audio_encoder.py:286-311)."""

    def __init__(self, dim: int, kernel_size: int = 7, causal: bool = True,
                 bias: bool = True):
        self.conv = SConv1d(dim, dim, kernel_size, groups=dim, bias=bias,
                            causal=causal)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.conv(x)


class _FFN(Module):
    """linear1 → gelu → linear2 (reference audio_encoder.py:252-284)."""

    def __init__(self, dim: int, ffn_dim: int, bias: bool = True):
        self.linear1 = nn.Linear(dim, ffn_dim, bias=bias)
        self.linear2 = nn.Linear(ffn_dim, dim, bias=bias)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.linear2(jax.nn.gelu(self.linear1(x)))


class Block1D(Module):
    """Depthwise mixer + FFN, layer-scaled
    (reference audio_encoder.py:313-440)."""

    def __init__(self, dim: int, kernel_size: int = 7, eps: float = 1e-6,
                 causal: bool = True, bias: bool = True,
                 layer_scale_init_value: float = 1e-6):
        self.norm = nn.RMSNorm(dim, eps=eps)
        self.ffn_norm = nn.RMSNorm(dim, eps=eps)
        self.mixer = _DepthwiseConv(dim, kernel_size, causal, bias)
        self.ffn = _FFN(dim, dim * 4, bias=bias)
        if layer_scale_init_value > 0:
            self.gamma = jnp.ones((dim,)) * layer_scale_init_value
            self.ffn_gamma = jnp.ones((dim,)) * layer_scale_init_value

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.mixer(self.norm(x))
        if hasattr(self, "gamma"):
            h = h * self.gamma
        x = x + h
        h = self.ffn(self.ffn_norm(x))
        if hasattr(self, "ffn_gamma"):
            h = h * self.ffn_gamma
        return x + h


class TokenizerEncoder(Module):
    """Waveform (B, T, 1) → latents (B, T/hop, vae_dim)
    (reference audio_encoder.py:442-599)."""

    def __init__(self, channels: int = 1, vae_dim: int = 64,
                 n_filters: int = 32,
                 ratios: Optional[List[int]] = None,
                 depths: Optional[List[int]] = None, causal: bool = True,
                 conv_bias: bool = True, layernorm_eps: float = 1e-5,
                 layer_scale_init_value: float = 1e-6,
                 disable_last_norm: bool = True):
        ratios = list(ratios or [8, 5, 5, 4, 2, 2])
        depths = list(depths or [3, 3, 3, 3, 3, 3, 8])
        self.ratios = list(reversed(ratios))  # encode: smallest stride first
        self.n_stages = len(depths)
        self.hop_length = int(math.prod(ratios))

        self.downsample_layers = [SConv1d(channels, n_filters, 7, bias=conv_bias,
                                          causal=causal)]
        for i, r in enumerate(self.ratios):
            self.downsample_layers.append(
                SConv1d(n_filters * (2**i), n_filters * (2 ** (i + 1)),
                        r * 2, stride=r, bias=conv_bias, causal=causal))

        self.stages = []
        for i in range(self.n_stages):
            ch = n_filters if i == 0 else n_filters * (2**i)
            self.stages.append([
                Block1D(ch, eps=layernorm_eps, causal=causal,
                        bias=conv_bias,
                        layer_scale_init_value=layer_scale_init_value)
                for _ in range(depths[i])])

        final_ch = n_filters * (2 ** len(self.ratios))
        if not disable_last_norm:
            self.norm = nn.RMSNorm(final_ch, eps=layernorm_eps)
        self.head = SConv1d(final_ch, vae_dim, 7, bias=conv_bias,
                            causal=causal)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 2:
            x = x[:, :, None]
        for i in range(self.n_stages):
            x = self.downsample_layers[i](x)
            for block in self.stages[i]:
                x = block(x)
        if hasattr(self, "norm"):
            x = self.norm(x)
        return self.head(x)


class AcousticTokenizerEncoder(Module):
    """Gaussian-VAE encoder (reference audio_encoder.py:600-668)."""

    def __init__(self, config: TokenizerEncoderConfig):
        self.config = config
        self.fix_std = config.fix_std
        self.std_dist_type = config.std_dist_type
        self.encoder = TokenizerEncoder(
            channels=config.channels, vae_dim=config.vae_dim,
            n_filters=config.encoder_n_filters,
            ratios=list(config.encoder_ratios),
            depths=config.parsed_encoder_depths, causal=config.causal,
            conv_bias=config.conv_bias,
            layernorm_eps=config.layernorm_eps,
            layer_scale_init_value=config.layer_scale_init_value,
            disable_last_norm=config.disable_last_norm)

    def encode(self, audio: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(audio)

    def sample(self, mean: jnp.ndarray,
               key: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self.std_dist_type == "none" or key is None:
            return mean
        k1, k2 = jax.random.split(key)
        if self.std_dist_type == "gaussian":
            std = jax.random.normal(k1, (mean.shape[0], 1, 1)) \
                * (self.fix_std / 0.8)
            return mean + std * jax.random.normal(k2, mean.shape)
        return mean + self.fix_std * jax.random.normal(k2, mean.shape)

    def __call__(self, audio: jnp.ndarray,
                 key: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        return self.sample(self.encode(audio), key)


class SemanticTokenizerEncoder(Module):
    """Deterministic encoder (reference audio_encoder.py:671-711)."""

    def __init__(self, config: TokenizerEncoderConfig):
        self.config = config
        self.encoder = TokenizerEncoder(
            channels=config.channels, vae_dim=config.vae_dim,
            n_filters=config.encoder_n_filters,
            ratios=list(config.encoder_ratios),
            depths=config.parsed_encoder_depths, causal=config.causal,
            conv_bias=config.conv_bias,
            layernorm_eps=config.layernorm_eps,
            layer_scale_init_value=config.layer_scale_init_value,
            disable_last_norm=config.disable_last_norm)

    def encode(self, audio: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(audio)

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        return self.encode(audio)
