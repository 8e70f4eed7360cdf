"""CAM++ speaker-embedding network (x-vector) for S3Gen / CosyVoice2.

TPU-native re-implementation of the reference
mlx_audio/codec/models/s3gen/xvector.py:152-799. Everything is
channels-last (B, T, C); the reference's (B, C, T) torch layout and the
per-layer transposes are dropped. BatchNorm runs in eval mode (running
stats), matching inference use.
"""

from __future__ import annotations

import re
from typing import List, Optional

import jax
import jax.numpy as jnp

from ....dsp import compute_fbank_kaldi
from ....nn import layers as nn
from ....nn.module import Module
from ....nn.sanitize import orient_weights_to_model

__all__ = ["CAMPPlus", "kaldi_fbank"]


def kaldi_fbank(audio: jnp.ndarray, sample_rate: int = 16000,
                num_mel_bins: int = 80) -> jnp.ndarray:
    """torchaudio-kaldi fbank (povey window, dither off) → (T, n_mels).

    reference xvector.py:37-149.
    """
    win = int(sample_rate * 25 / 1000)
    hop = int(sample_rate * 10 / 1000)
    return compute_fbank_kaldi(audio, sample_rate=sample_rate, win_len=win,
                               win_inc=hop, num_mels=num_mel_bins,
                               win_type="povey", dither=0.0, snip_edges=True,
                               low_freq=20.0, high_freq=0.0)


class _NonLinear(Module):
    """'batchnorm-relu' style stack (reference xvector.py:252-268).
    Stored as indexed attrs so torch keys `.nonlinear.0.` line up."""

    def __init__(self, config_str: str, channels: int):
        self._ops = []
        idx = 0
        for name in config_str.split("-"):
            if name == "relu":
                self._ops.append(("relu", None))
            elif name in ("batchnorm", "batchnorm_"):
                bn = nn.BatchNorm(channels, affine=(name == "batchnorm"))
                setattr(self, str(idx), bn)
                self._ops.append(("module", idx))
                idx += 1
            else:
                raise ValueError(f"Unsupported nonlinear: {name}")

    def __call__(self, x):
        for kind, idx in self._ops:
            if kind == "relu":
                x = jax.nn.relu(x)
            else:
                x = getattr(self, str(idx))(x)
        return x


class BasicResBlock(Module):
    """2-D residual block, stride in the frequency axis only
    (reference xvector.py:152-194). x: (B, F, T, C)."""

    def __init__(self, in_planes: int, planes: int, stride: int = 1):
        self.conv1 = nn.Conv2d(in_planes, planes, 3, stride=(stride, 1),
                               padding=1, bias=False)
        self.bn1 = nn.BatchNorm(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm(planes)
        self.shortcut = []
        if stride != 1 or in_planes != planes:
            self.shortcut = [
                nn.Conv2d(in_planes, planes, 1, stride=(stride, 1),
                          bias=False),
                nn.BatchNorm(planes),
            ]

    def __call__(self, x):
        out = jax.nn.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        sc = x
        for layer in self.shortcut:
            sc = layer(sc)
        return jax.nn.relu(out + sc)


class FCM(Module):
    """Front 2-D conv module (reference xvector.py:196-250).
    Input (B, T, F) → output (B, T, C·F/8)."""

    def __init__(self, m_channels: int = 32, feat_dim: int = 80):
        self.conv1 = nn.Conv2d(1, m_channels, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm(m_channels)
        in_planes = m_channels
        layer1 = []
        for s in [2, 1]:
            layer1.append(BasicResBlock(in_planes, m_channels, s))
            in_planes = m_channels
        layer2 = []
        for s in [2, 1]:
            layer2.append(BasicResBlock(in_planes, m_channels, s))
        self.layer1 = layer1
        self.layer2 = layer2
        self.conv2 = nn.Conv2d(m_channels, m_channels, 3, stride=(2, 1),
                               padding=1, bias=False)
        self.bn2 = nn.BatchNorm(m_channels)
        self.out_channels = m_channels * (feat_dim // 8)

    def __call__(self, x):
        # (B, T, F) → NHWC with H=F, W=T
        x = x.swapaxes(1, 2)[..., None]  # (B, F, T, 1)
        out = jax.nn.relu(self.bn1(self.conv1(x)))
        for layer in self.layer1:
            out = layer(out)
        for layer in self.layer2:
            out = layer(out)
        out = jax.nn.relu(self.bn2(self.conv2(out)))
        B, H, W, C = out.shape
        # → (B, W, C·H): torch reshapes (B, C, H, W) → (B, C·H, W)
        return out.transpose(0, 2, 3, 1).reshape(B, W, C * H)


class TDNNLayer(Module):
    """(B, T, C) conv + nonlinear (reference xvector.py:293-334)."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size: int,
                 stride: int = 1, dilation: int = 1, padding: int = -1,
                 config_str: str = "batchnorm-relu"):
        if padding < 0:
            padding = (kernel_size - 1) // 2 * dilation
        self.linear = nn.Conv1d(in_channels, out_channels, kernel_size,
                                stride=stride, padding=padding,
                                dilation=dilation, bias=False)
        self.nonlinear = _NonLinear(config_str, out_channels)

    def __call__(self, x):
        return self.nonlinear(self.linear(x))


class CAMLayer(Module):
    """Context-attentive masking (reference xvector.py:336-406)."""

    def __init__(self, bn_channels: int, out_channels: int, kernel_size: int,
                 dilation: int, reduction: int = 2):
        padding = (kernel_size - 1) // 2 * dilation
        self.linear_local = nn.Conv1d(bn_channels, out_channels, kernel_size,
                                      padding=padding, dilation=dilation,
                                      bias=False)
        self.linear1 = nn.Conv1d(bn_channels, bn_channels // reduction, 1)
        self.linear2 = nn.Conv1d(bn_channels // reduction, out_channels, 1)

    def _seg_pooling(self, x: jnp.ndarray, seg_len: int = 100) -> jnp.ndarray:
        B, T, C = x.shape
        n_segs = -(-T // seg_len)
        pad = n_segs * seg_len - T
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        seg = xp.reshape(B, n_segs, seg_len, C).mean(axis=2)
        seg = jnp.repeat(seg, seg_len, axis=1)[:, :T]
        return seg

    def __call__(self, x):
        y = self.linear_local(x)
        context = x.mean(axis=1, keepdims=True) + self._seg_pooling(x)
        context = jax.nn.relu(self.linear1(context))
        m = jax.nn.sigmoid(self.linear2(context))
        return y * m


class CAMDenseTDNNLayer(Module):
    """reference xvector.py:408-462."""

    def __init__(self, in_channels: int, out_channels: int, bn_channels: int,
                 kernel_size: int, dilation: int = 1,
                 config_str: str = "batchnorm-relu"):
        self.nonlinear1 = _NonLinear(config_str, in_channels)
        self.linear1 = nn.Conv1d(in_channels, bn_channels, 1, bias=False)
        self.nonlinear2 = _NonLinear(config_str, bn_channels)
        self.cam_layer = CAMLayer(bn_channels, out_channels, kernel_size,
                                  dilation)

    def __call__(self, x):
        x = self.linear1(self.nonlinear1(x))
        return self.cam_layer(self.nonlinear2(x))


class CAMDenseTDNNBlock(Module):
    def __init__(self, num_layers: int, in_channels: int, out_channels: int,
                 bn_channels: int, kernel_size: int, dilation: int = 1,
                 config_str: str = "batchnorm-relu"):
        self.layers = [
            CAMDenseTDNNLayer(in_channels + i * out_channels, out_channels,
                              bn_channels, kernel_size, dilation, config_str)
            for i in range(num_layers)
        ]

    def __call__(self, x):
        for layer in self.layers:
            x = jnp.concatenate([x, layer(x)], axis=-1)
        return x


class TransitLayer(Module):
    def __init__(self, in_channels: int, out_channels: int,
                 config_str: str = "batchnorm-relu"):
        self.nonlinear = _NonLinear(config_str, in_channels)
        self.linear = nn.Conv1d(in_channels, out_channels, 1, bias=False)

    def __call__(self, x):
        return self.linear(self.nonlinear(x))


class DenseLayer(Module):
    def __init__(self, in_channels: int, out_channels: int,
                 config_str: str = "batchnorm_"):
        self.linear = nn.Conv1d(in_channels, out_channels, 1, bias=False)
        self.nonlinear = _NonLinear(config_str, out_channels)

    def __call__(self, x):
        if x.ndim == 2:
            return self.nonlinear(self.linear(x[:, None, :]))[:, 0]
        return self.nonlinear(self.linear(x))


def statistics_pooling(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, C) → (B, 2C) mean‖std (reference xvector.py:269-275)."""
    mean = x.mean(axis=1)
    std = jnp.sqrt(x.var(axis=1) + 1e-5)
    return jnp.concatenate([mean, std], axis=-1)


class CAMPPlus(Module):
    """CAM++ (reference xvector.py:571-799). Input fbank (B, T, 80) →
    embedding (B, 192)."""

    def __init__(self, feat_dim: int = 80, embedding_size: int = 192,
                 growth_rate: int = 32, bn_size: int = 4,
                 init_channels: int = 128,
                 config_str: str = "batchnorm-relu", **_unused):
        self.feat_dim = feat_dim
        self.head = FCM(feat_dim=feat_dim)
        channels = self.head.out_channels
        self.tdnn = TDNNLayer(channels, init_channels, 5, stride=2,
                              dilation=1, padding=-1, config_str=config_str)
        channels = init_channels
        self.blocks = []
        self.transits = []
        for num_layers, kernel_size, dilation in zip((12, 24, 16), (3, 3, 3),
                                                     (1, 2, 2)):
            self.blocks.append(CAMDenseTDNNBlock(
                num_layers, channels, growth_rate, bn_size * growth_rate,
                kernel_size, dilation, config_str))
            channels += num_layers * growth_rate
            self.transits.append(TransitLayer(channels, channels // 2,
                                              config_str))
            channels //= 2
        self.out_nonlinear = _NonLinear(config_str, channels)
        self.dense = DenseLayer(channels * 2, embedding_size,
                                config_str="batchnorm_")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.head(x)
        x = self.tdnn(x)
        for block, transit in zip(self.blocks, self.transits):
            x = transit(block(x))
        x = self.out_nonlinear(x)
        x = statistics_pooling(x)
        return self.dense(x)

    def inference(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Raw 16 kHz audio (T,) or (B, T) → (B, 192)."""
        if audio.ndim == 1:
            audio = audio[None]
        feats = []
        for i in range(audio.shape[0]):
            f = kaldi_fbank(audio[i], num_mel_bins=self.feat_dim)
            feats.append(f - f.mean(axis=0, keepdims=True))
        T = max(f.shape[0] for f in feats)
        feats = [jnp.pad(f, ((0, T - f.shape[0]), (0, 0))) for f in feats]
        return self(jnp.stack(feats))

    def sanitize(self, weights: dict) -> dict:
        """torch key remap (reference xvector.py:642-732)."""
        out = {}
        for key, value in weights.items():
            if "num_batches_tracked" in key:
                continue
            k = key
            k = re.sub(r"xvector\.block(\d+)\.",
                       lambda m: f"blocks.{int(m.group(1)) - 1}.", k)
            k = re.sub(r"xvector\.transit(\d+)\.",
                       lambda m: f"transits.{int(m.group(1)) - 1}.", k)
            k = k.replace("xvector.tdnn.", "tdnn.")
            k = k.replace("xvector.dense.", "dense.")
            k = k.replace("xvector.out_nonlinear.", "out_nonlinear.")
            k = re.sub(r"\.tdnnd(\d+)\.",
                       lambda m: f".layers.{int(m.group(1)) - 1}.", k)
            k = re.sub(r"\.nonlinear(\d*)\.batchnorm\.", r".nonlinear\1.0.", k)
            if k.startswith("out_nonlinear.batchnorm."):
                k = k.replace("out_nonlinear.batchnorm.", "out_nonlinear.0.", 1)
            out[k] = value
        return orient_weights_to_model(self, out)
