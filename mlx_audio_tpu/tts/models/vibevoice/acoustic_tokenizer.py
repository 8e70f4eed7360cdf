"""VibeVoice acoustic tokenizer (VAE decoder, latents → 24 kHz audio).

TPU-native re-implementation of the reference
mlx_audio/tts/models/vibevoice/acoustic_tokenizer.py:11-504. Channels-last
(B, T, C) throughout — the reference's per-module (B,C,T)↔(B,T,C)
transposes are dropped so XLA fuses the whole ConvNeXt-style stack; causal
convs are left-padded valid convs, causal transposed convs trim the right
edge.
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp

from ....nn import layers as nn
from ....nn.module import Module
from .config import AcousticTokenizerConfig

__all__ = ["AcousticTokenizer", "TokenizerDecoder", "Block1D"]


class CausalConv1d(Module):
    """Left-padded valid conv, nested `conv` key to match reference layout
    (reference acoustic_tokenizer.py:37-94). x: (B, T, C)."""

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: int, stride: int = 1, dilation: int = 1,
                 groups: int = 1, bias: bool = True):
        self.padding = (kernel_size - 1) * dilation
        self.conv = nn.Conv1d(in_channels, out_channels, kernel_size,
                              stride=stride, dilation=dilation,
                              groups=groups, bias=bias)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.padding > 0:
            x = jnp.pad(x, ((0, 0), (self.padding, 0), (0, 0)))
        return self.conv(x)


class CausalConvTranspose1d(Module):
    """Transposed conv trimming (k - stride) from the right
    (reference acoustic_tokenizer.py:96-153)."""

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: int, stride: int = 1, bias: bool = True,
                 trim_right_ratio: float = 1.0):
        self.padding_total = kernel_size - stride
        self.trim_right_ratio = trim_right_ratio
        self.convtr = nn.ConvTranspose1d(in_channels, out_channels,
                                         kernel_size, stride=stride,
                                         bias=bias)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.convtr(x)
        pad_r = math.ceil(self.padding_total * self.trim_right_ratio)
        pad_l = self.padding_total - pad_r
        if pad_l > 0:
            x = x[:, pad_l:]
        if pad_r > 0:
            x = x[:, :-pad_r]
        return x


class _DepthwiseConv(Module):
    """mixer.conv.conv.conv nesting (reference
    acoustic_tokenizer.py:155-193)."""

    def __init__(self, dim: int, kernel_size: int = 7, bias: bool = True):
        self.conv = CausalConv1d(dim, dim, kernel_size, groups=dim,
                                 bias=bias)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.conv(x)


class _Mixer(Module):
    def __init__(self, dim: int, kernel_size: int = 7, bias: bool = True):
        self.conv = _DepthwiseConv(dim, kernel_size, bias)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.conv(x)


class _FeedForward(Module):
    """linear1 → gelu → linear2 (reference acoustic_tokenizer.py:196-213)."""

    def __init__(self, dim: int, mult: float = 4.0, bias: bool = True):
        self.linear1 = nn.Linear(dim, int(dim * mult), bias=bias)
        self.linear2 = nn.Linear(int(dim * mult), dim, bias=bias)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.linear2(jax.nn.gelu(self.linear1(x)))


class Block1D(Module):
    """Depthwise-conv mixer + FFN with layer scale
    (reference acoustic_tokenizer.py:215-273). x: (B, T, C)."""

    def __init__(self, dim: int, eps: float = 1e-6, bias: bool = True,
                 layer_scale_init_value: float = 1e-6):
        self.norm = nn.RMSNorm(dim, eps=eps)
        self.ffn_norm = nn.RMSNorm(dim, eps=eps)
        self.mixer = _Mixer(dim, kernel_size=7, bias=bias)
        self.ffn = _FeedForward(dim, mult=4.0, bias=bias)
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


class _Wrap(Module):
    """Single-conv wrapper matching HF's `upsample_layers.X.0.*` nesting
    (reference acoustic_tokenizer.py:275-341)."""

    def __init__(self, conv):
        self.conv = conv

    def __call__(self, x):
        return self.conv(x)


class _WrapTr(Module):
    def __init__(self, convtr):
        self.convtr = convtr

    def __call__(self, x):
        return self.convtr(x)


class TokenizerDecoder(Module):
    """Latents (B, T, vae_dim) → audio (B, T', 1)
    (reference acoustic_tokenizer.py:343-477)."""

    def __init__(self, config: AcousticTokenizerConfig):
        self.dimension = config.vae_dim
        n_filters = config.decoder_n_filters or config.encoder_n_filters
        ratios = list(config.decoder_ratios or config.encoder_ratios)
        if config.decoder_depths:
            depths = [int(d) for d in str(config.decoder_depths).split("-")]
        else:
            depths = list(reversed(
                [int(d) for d in str(config.encoder_depths).split("-")]))
        self.n_stages = len(depths)
        self.ratios = ratios

        stem_out = n_filters * (2 ** (self.n_stages - 1))
        self.upsample_layers = [[_Wrap(CausalConv1d(
            self.dimension, stem_out, 7, bias=config.conv_bias))]]
        for i, r in enumerate(ratios):
            in_ch = n_filters * (2 ** (self.n_stages - 1 - i))
            out_ch = (n_filters * (2 ** (self.n_stages - 2 - i))
                      if i < len(ratios) - 1 else n_filters)
            self.upsample_layers.append([_WrapTr(CausalConvTranspose1d(
                in_ch, out_ch, r * 2, stride=r, bias=config.conv_bias))])

        self.stages = []
        for i in range(self.n_stages):
            ch = n_filters * (2 ** (self.n_stages - 1 - i))
            self.stages.append([
                Block1D(ch, eps=config.layernorm_eps, bias=config.conv_bias,
                        layer_scale_init_value=config.layer_scale_init_value)
                for _ in range(depths[i])])

        self.head = _Wrap(CausalConv1d(n_filters, config.channels, 7,
                                       bias=config.conv_bias))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.upsample_layers[0][0](x)
        for i in range(self.n_stages):
            for block in self.stages[i]:
                x = block(x)
            if i + 1 < len(self.upsample_layers):
                x = self.upsample_layers[i + 1][0](x)
        return self.head(x)


class AcousticTokenizer(Module):
    """Decoder-only VAE (reference acoustic_tokenizer.py:480-504)."""

    def __init__(self, config: AcousticTokenizerConfig):
        self.config = config
        self.decoder = TokenizerDecoder(config)

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """latents (B, T, vae_dim) → audio (B, T', channels)."""
        return self.decoder(latents)

    def __call__(self, latents: jnp.ndarray) -> jnp.ndarray:
        return self.decode(latents)
