"""ECAPA-TDNN speaker encoder (spec: reference tts/models/qwen3_tts/
speaker_encoder.py:220 — TDNN + SE-Res2Net blocks + attentive statistics
pooling). Channels-last (B, T, C)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ....nn import Conv1d, Module
from .config import Qwen3TTSSpeakerEncoderConfig

__all__ = ["Qwen3TTSSpeakerEncoder"]


def _reflect_pad(x, pad):
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0), (pad, pad), (0, 0)], mode="reflect")


class TimeDelayNetBlock(Module):
    def __init__(self, in_channels, out_channels, kernel_size, dilation):
        self.conv = Conv1d(in_channels, out_channels, kernel_size,
                           dilation=dilation)
        self.pad = (kernel_size - 1) * dilation // 2

    def __call__(self, x):  # (B, T, C)
        return jax.nn.relu(self.conv(_reflect_pad(x, self.pad)))


class Res2NetBlock(Module):
    def __init__(self, in_channels, out_channels, scale=8, kernel_size=3,
                 dilation=1):
        in_c = in_channels // scale
        hid = out_channels // scale
        self.blocks = [
            TimeDelayNetBlock(in_c, hid, kernel_size, dilation)
            for _ in range(scale - 1)
        ]
        self.scale = scale

    def __call__(self, x):
        chunks = jnp.split(x, self.scale, axis=-1)
        outs = []
        part = None
        for i, chunk in enumerate(chunks):
            if i == 0:
                part = chunk
            elif i == 1:
                part = self.blocks[i - 1](chunk)
            else:
                part = self.blocks[i - 1](chunk + part)
            outs.append(part)
        return jnp.concatenate(outs, axis=-1)


class SqueezeExcitationBlock(Module):
    def __init__(self, in_channels, se_channels, out_channels):
        self.conv1 = Conv1d(in_channels, se_channels, 1)
        self.conv2 = Conv1d(se_channels, out_channels, 1)

    def __call__(self, x):  # (B, T, C)
        s = jnp.mean(x, axis=1, keepdims=True)
        s = jax.nn.relu(self.conv1(s))
        s = jax.nn.sigmoid(self.conv2(s))
        return x * s


class SqueezeExcitationRes2NetBlock(Module):
    def __init__(self, in_channels, out_channels, res2net_scale=8,
                 se_channels=128, kernel_size=3, dilation=1):
        self.tdnn1 = TimeDelayNetBlock(in_channels, out_channels, 1, 1)
        self.res2net_block = Res2NetBlock(out_channels, out_channels,
                                          res2net_scale, kernel_size, dilation)
        self.tdnn2 = TimeDelayNetBlock(out_channels, out_channels, 1, 1)
        self.se_block = SqueezeExcitationBlock(out_channels, se_channels,
                                               out_channels)

    def __call__(self, x):
        r = x
        x = self.tdnn1(x)
        x = self.res2net_block(x)
        x = self.tdnn2(x)
        return self.se_block(x) + r


class AttentiveStatisticsPooling(Module):
    def __init__(self, channels, attention_channels=128):
        self.tdnn = TimeDelayNetBlock(channels * 3, attention_channels, 1, 1)
        self.conv = Conv1d(attention_channels, channels, 1)
        self.eps = 1e-12

    def __call__(self, x):  # (B, T, C) → (B, 1, 2C)
        B, T, C = x.shape
        mean = jnp.mean(x, axis=1, keepdims=True)
        std = jnp.sqrt(jnp.var(x, axis=1, keepdims=True) + self.eps)
        attn_in = jnp.concatenate(
            [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)],
            axis=-1,
        )
        attn = self.conv(jnp.tanh(self.tdnn(attn_in)))
        attn = jax.nn.softmax(attn, axis=1)
        mean = jnp.sum(attn * x, axis=1, keepdims=True)
        var = jnp.sum(attn * (x - mean) ** 2, axis=1, keepdims=True)
        std = jnp.sqrt(jnp.clip(var, self.eps, None))
        return jnp.concatenate([mean, std], axis=-1)


class Qwen3TTSSpeakerEncoder(Module):
    def __init__(self, cfg: Qwen3TTSSpeakerEncoderConfig):
        self.blocks = [
            TimeDelayNetBlock(cfg.mel_dim, cfg.enc_channels[0],
                              cfg.enc_kernel_sizes[0], cfg.enc_dilations[0])
        ]
        for i in range(1, len(cfg.enc_channels) - 1):
            self.blocks.append(
                SqueezeExcitationRes2NetBlock(
                    cfg.enc_channels[i - 1], cfg.enc_channels[i],
                    cfg.enc_res2net_scale, cfg.enc_se_channels,
                    cfg.enc_kernel_sizes[i], cfg.enc_dilations[i],
                )
            )
        self.mfa = TimeDelayNetBlock(cfg.enc_channels[-1], cfg.enc_channels[-1],
                                     cfg.enc_kernel_sizes[-1], cfg.enc_dilations[-1])
        self.asp = AttentiveStatisticsPooling(cfg.enc_channels[-1],
                                              cfg.enc_attention_channels)
        self.fc = Conv1d(cfg.enc_channels[-1] * 2, cfg.enc_dim, 1)

    def __call__(self, mel):  # (B, T, mel_dim) → (B, enc_dim)
        hs = []
        x = mel
        for block in self.blocks:
            x = block(x)
            hs.append(x)
        x = self.mfa(jnp.concatenate(hs[1:], axis=-1))
        x = self.asp(x)
        return self.fc(x)[:, 0]
