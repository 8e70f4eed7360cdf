"""BigVGAN: anti-aliased Snake vocoder (NVIDIA), mel → waveform.

TPU-native re-implementation of the reference
mlx_audio/codec/models/bigvgan/ (bigvgan.py, amp.py, activation.py,
resample.py, conv.py). Channels-last (B, T, C) end to end; the kaiser-sinc
anti-aliasing filters are host-precomputed constants and the whole
generator jits into one program. Weight-norm (weight_g/weight_v) is folded
into plain conv weights at load time.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....nn import layers as nn
from ....nn.module import Module

__all__ = ["BigVGAN", "BigVGANConfig", "Snake", "SnakeBeta", "Activation1d",
           "AMPBlock1", "AMPBlock2"]


@dataclass
class BigVGANConfig:
    num_mels: int = 80
    upsample_rates: List[int] = field(default_factory=lambda: [4, 4, 2, 2, 2, 2])
    upsample_kernel_sizes: List[int] = field(
        default_factory=lambda: [8, 8, 4, 4, 4, 4])
    upsample_initial_channel: int = 1536
    resblock: Literal["1", "2"] = "1"
    resblock_kernel_sizes: List[int] = field(default_factory=lambda: [3, 7, 11])
    resblock_dilation_sizes: List[List[int]] = field(
        default_factory=lambda: [[1, 3, 5]] * 3)
    activation: Literal["snakebeta", "snake"] = "snakebeta"
    snake_logscale: bool = True
    use_bias_at_final: bool = True
    use_tanh_at_final: bool = True
    sample_rate: int = 22050

    @classmethod
    def from_dict(cls, d: dict) -> "BigVGANConfig":
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


def _kaiser_sinc_filter1d(cutoff: float, half_width: float,
                          kernel_size: int) -> np.ndarray:
    """(1, kernel_size, 1) lowpass (reference resample.py:17-47)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        filt = np.zeros_like(time)
    else:
        sinc = np.sinc(2 * cutoff * time)
        filt = 2 * cutoff * window * sinc
        filt /= filt.sum()
    return filt.reshape(1, kernel_size, 1).astype(np.float32)


class Snake(Module):
    """x + (1/α) sin²(αx) (reference activation.py:5-24). (B, T, C)."""

    def __init__(self, in_features: int, alpha: float = 1.0,
                 alpha_logscale: bool = False):
        self.alpha_logscale = alpha_logscale
        self.alpha = (jnp.zeros(in_features) if alpha_logscale
                      else jnp.ones(in_features) * alpha)

    def __call__(self, x):
        alpha = self.alpha[None, None, :]
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
        return x + (1.0 / (alpha + 1e-9)) * jnp.sin(x * alpha) ** 2


class SnakeBeta(Module):
    """Separate magnitude β (reference activation.py:27-51)."""

    def __init__(self, in_features: int, alpha: float = 1.0,
                 alpha_logscale: bool = False):
        self.alpha_logscale = alpha_logscale
        init = jnp.zeros(in_features) if alpha_logscale else jnp.ones(in_features)
        self.alpha = init * alpha
        self.beta = init * alpha

    def __call__(self, x):
        alpha = self.alpha[None, None, :]
        beta = self.beta[None, None, :]
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
            beta = jnp.exp(beta)
        return x + (1.0 / (beta + 1e-9)) * jnp.sin(x * alpha) ** 2


class UpSample1d(Module):
    """2x kaiser-sinc upsample (reference resample.py:101-137)."""

    def __init__(self, ratio: int = 2, kernel_size: Optional[int] = None):
        self.ratio = ratio
        self.kernel_size = (int(6 * ratio // 2) * 2 if kernel_size is None
                            else kernel_size)
        self.pad = self.kernel_size // ratio - 1
        self.pad_left = self.pad * ratio + (self.kernel_size - ratio) // 2
        self.pad_right = self.pad * ratio + (self.kernel_size - ratio + 1) // 2
        self._filter = jnp.asarray(_kaiser_sinc_filter1d(
            0.5 / ratio, 0.6 / ratio, self.kernel_size))

    def __call__(self, x):
        B, T, C = x.shape
        x = jnp.pad(x, ((0, 0), (self.pad, self.pad), (0, 0)), mode="edge")
        filt = jnp.broadcast_to(self._filter, (C,) + self._filter.shape[1:])
        # depthwise transpose conv via lhs dilation; the kaiser filter is
        # symmetric so no kernel flip is needed
        y = jax.lax.conv_general_dilated(
            x, jnp.swapaxes(filt, 0, 2),  # (1, K, C) = "ILO"
            window_strides=(1,), padding=[(self.kernel_size - 1,) * 2],
            lhs_dilation=(self.ratio,),
            dimension_numbers=("NLC", "ILO", "NLC"),
            feature_group_count=C)
        y = self.ratio * y
        return y[:, self.pad_left: y.shape[1] - self.pad_right]


class LowPassFilter1d(Module):
    def __init__(self, cutoff: float, half_width: float, stride: int = 1,
                 kernel_size: int = 12):
        self.even = kernel_size % 2 == 0
        self.stride = stride
        self.pad_left = kernel_size // 2 - int(self.even)
        self.pad_right = kernel_size // 2
        self._filter = jnp.asarray(_kaiser_sinc_filter1d(cutoff, half_width,
                                                         kernel_size))

    def __call__(self, x):
        B, T, C = x.shape
        x = jnp.pad(x, ((0, 0), (self.pad_left, self.pad_right), (0, 0)),
                    mode="edge")
        filt = jnp.broadcast_to(self._filter, (C,) + self._filter.shape[1:])
        return jax.lax.conv_general_dilated(
            x, filt, window_strides=(self.stride,), padding=[(0, 0)],
            dimension_numbers=("NLC", "OLI", "NLC"), feature_group_count=C)


class DownSample1d(Module):
    def __init__(self, ratio: int = 2, kernel_size: Optional[int] = None):
        ks = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
        self.lowpass = LowPassFilter1d(0.5 / ratio, 0.6 / ratio,
                                       stride=ratio, kernel_size=ks)

    def __call__(self, x):
        return self.lowpass(x)


class Activation1d(Module):
    """Anti-aliased activation: up → act → down (reference
    resample.py:157-177)."""

    def __init__(self, activation: Module, up_ratio: int = 2,
                 down_ratio: int = 2, up_kernel_size: int = 12,
                 down_kernel_size: int = 12):
        self.act = activation
        self.upsample = UpSample1d(up_ratio, up_kernel_size)
        self.downsample = DownSample1d(down_ratio, down_kernel_size)

    def __call__(self, x):
        return self.downsample(self.act(self.upsample(x)))


def _make_act(channels: int, kind: str, logscale: bool) -> Activation1d:
    act = (Snake(channels, alpha_logscale=logscale) if kind == "snake"
           else SnakeBeta(channels, alpha_logscale=logscale))
    return Activation1d(act)


class AMPBlock1(Module):
    """reference amp.py:10-58."""

    def __init__(self, channels: int, snake_logscale: bool, activation: str,
                 kernel_size: int = 3, dilation: Optional[List[int]] = None):
        dilation = dilation or [1, 3, 5]
        self.convs1 = [
            nn.Conv1d(channels, channels, kernel_size, dilation=d,
                      padding=((kernel_size - 1) * d) // 2)
            for d in dilation
        ]
        self.convs2 = [
            nn.Conv1d(channels, channels, kernel_size,
                      padding=(kernel_size - 1) // 2)
            for _ in dilation
        ]
        self.activations = [_make_act(channels, activation, snake_logscale)
                            for _ in range(len(dilation) * 2)]

    def __call__(self, x):
        for c1, c2, a1, a2 in zip(self.convs1, self.convs2,
                                  self.activations[::2],
                                  self.activations[1::2]):
            x = x + c2(a2(c1(a1(x))))
        return x


class AMPBlock2(Module):
    """reference amp.py:61-96."""

    def __init__(self, channels: int, snake_logscale: bool, activation: str,
                 kernel_size: int = 3, dilation: Optional[List[int]] = None):
        dilation = dilation or [1, 3, 5]
        self.convs = [
            nn.Conv1d(channels, channels, kernel_size, dilation=d,
                      padding=((kernel_size - 1) * d) // 2)
            for d in dilation
        ]
        self.activations = [_make_act(channels, activation, snake_logscale)
                            for _ in dilation]

    def __call__(self, x):
        for conv, act in zip(self.convs, self.activations):
            x = x + conv(act(x))
        return x


class BigVGAN(Module):
    """reference bigvgan.py:29-149. Input mel (B, T, num_mels) → (B, T', 1)."""

    def __init__(self, config: BigVGANConfig):
        if isinstance(config, dict):
            config = BigVGANConfig.from_dict(config)
        self.config = config
        self.num_kernels = len(config.resblock_kernel_sizes)
        self.num_upsamples = len(config.upsample_rates)
        self.use_tanh_at_final = config.use_tanh_at_final

        C0 = config.upsample_initial_channel
        self.conv_pre = nn.Conv1d(config.num_mels, C0, 7, padding=3)
        self.ups = [
            [nn.ConvTranspose1d(C0 // (2**i), C0 // (2 ** (i + 1)), k,
                                stride=u, padding=(k - u) // 2)]
            for i, (u, k) in enumerate(zip(config.upsample_rates,
                                           config.upsample_kernel_sizes))
        ]
        Block = AMPBlock1 if config.resblock == "1" else AMPBlock2
        self.resblocks = [
            Block(C0 // (2 ** (i + 1)), config.snake_logscale,
                  config.activation, k, list(d))
            for i in range(self.num_upsamples)
            for k, d in zip(config.resblock_kernel_sizes,
                            config.resblock_dilation_sizes)
        ]
        last = C0 // (2 ** self.num_upsamples)
        self.activation_post = _make_act(last, config.activation,
                                         config.snake_logscale)
        self.conv_post = nn.Conv1d(last, 1, 7, padding=3,
                                   bias=config.use_bias_at_final)

    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        x = self.conv_pre(mel)
        for step in range(self.num_upsamples):
            for up in self.ups[step]:
                x = up(x)
            xs = self.resblocks[step * self.num_kernels](x)
            for idx in range(1, self.num_kernels):
                xs = xs + self.resblocks[step * self.num_kernels + idx](x)
            x = xs / self.num_kernels
        x = self.activation_post(x)
        x = self.conv_post(x)
        if self.use_tanh_at_final:
            return jnp.tanh(x)
        return jnp.clip(x, -1.0, 1.0)

    def decode(self, mel: jnp.ndarray) -> jnp.ndarray:
        return self(mel)

    def sanitize(self, weights: dict) -> dict:
        """Fold weight-norm pairs, fix layouts, drop AA filters
        (reference bigvgan.py:124-149)."""
        from ..base import fold_weight_norm_pairs
        from ....nn.sanitize import orient_weights_to_model

        out = {}
        for key, value in weights.items():
            if ("num_batches_tracked" in key or "filter" in key
                    or ".upsample." in key or ".downsample." in key
                    or ".lowpass." in key):
                continue
            k = key.replace(".act.", ".act.")
            out[k] = value
        out = fold_weight_norm_pairs(out)
        return orient_weights_to_model(self, out)
