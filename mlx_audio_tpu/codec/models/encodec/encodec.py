"""EnCodec — SEANet conv+LSTM codec with residual VQ.

Behavioral spec: reference codec/models/encodec/encodec.py (config :22,
conv padding :172-290, SEANet :340-440, RVQ :445-546, Encodec :548).
TPU-native: the streaming LSTM is a fused-gate `lax.scan` (the reference
hand-writes a Metal kernel for the per-step cell, encodec.py:89-135);
everything is channels-last and jitted end-to-end.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....nn import Conv1d, ConvTranspose1d, GroupNorm, Identity, Module
from ....nn.recurrent import LSTM as _LSTM
from ..base import fold_weight_norm_pairs

__all__ = ["Encodec", "EncodecConfig"]


@dataclass
class EncodecConfig(BaseModelArgs):
    model_type: str = "encodec"
    audio_channels: int = 1
    num_filters: int = 32
    kernel_size: int = 7
    num_residual_layers: int = 1
    dilation_growth_rate: int = 2
    codebook_size: int = 1024
    codebook_dim: int = 128
    hidden_size: int = 128
    num_lstm_layers: int = 2
    residual_kernel_size: int = 3
    use_causal_conv: bool = True
    normalize: bool = False
    pad_mode: str = "reflect"
    norm_type: str = "weight_norm"
    last_kernel_size: int = 7
    trim_right_ratio: float = 1.0
    compress: int = 2
    upsampling_ratios: List[int] = None
    target_bandwidths: List[float] = None
    sampling_rate: int = 24000
    chunk_length_s: Optional[float] = None
    overlap: Optional[float] = None

    def __post_init__(self):
        if self.upsampling_ratios is None:
            self.upsampling_ratios = [8, 5, 4, 2]
        if self.target_bandwidths is None:
            self.target_bandwidths = [1.5, 3.0, 6.0, 12.0, 24.0]

    @property
    def chunk_length(self) -> Optional[int]:
        if self.chunk_length_s is None:
            return None
        return int(self.chunk_length_s * self.sampling_rate)

    @property
    def chunk_stride(self) -> Optional[int]:
        if self.chunk_length_s is None or self.overlap is None:
            return None
        return max(1, int((1.0 - self.overlap) * self.chunk_length))


class EncodecConv1d(Module):
    """Conv1d with causal/asymmetric padding (channels-last)."""

    def __init__(self, config, in_channels, out_channels, kernel_size, stride=1,
                 dilation=1):
        self.conv = Conv1d(in_channels, out_channels, kernel_size, stride=stride,
                           dilation=dilation)
        if config.norm_type == "time_group_norm":
            self.norm = GroupNorm(1, out_channels)
        self.causal = config.use_causal_conv
        self.pad_mode = config.pad_mode
        self.stride = stride
        self.kernel_size_eff = (kernel_size - 1) * dilation + 1
        self.padding_total = self.kernel_size_eff - stride

    def _extra_padding(self, length: int) -> int:
        n_frames = (length - self.kernel_size_eff + self.padding_total) / self.stride + 1
        n_frames = int(math.ceil(n_frames)) - 1
        ideal = n_frames * self.stride + self.kernel_size_eff - self.padding_total
        return ideal - length

    def _pad(self, x, left: int, right: int):
        if self.pad_mode == "reflect":
            # emulate reflect with possible over-length pads via constant tail
            L = x.shape[1]
            r = min(right, L - 1)
            pads = [(0, 0), (left, r), (0, 0)]
            x = jnp.pad(x, pads, mode="reflect")
            if right > r:
                x = jnp.pad(x, [(0, 0), (0, right - r), (0, 0)])
            return x
        return jnp.pad(x, [(0, 0), (left, right), (0, 0)])

    def __call__(self, x):
        extra = self._extra_padding(x.shape[1])
        if self.causal:
            x = self._pad(x, self.padding_total, extra)
        else:
            pr = self.padding_total // 2
            x = self._pad(x, self.padding_total - pr, pr + extra)
        x = self.conv(x)
        if hasattr(self, "norm"):
            x = self.norm(x)
        return x


class EncodecConvTranspose1d(Module):
    def __init__(self, config, in_channels, out_channels, kernel_size, stride=1):
        self.conv = ConvTranspose1d(in_channels, out_channels, kernel_size,
                                    stride=stride)
        if config.norm_type == "time_group_norm":
            self.norm = GroupNorm(1, out_channels)
        self.causal = config.use_causal_conv
        self.trim_right_ratio = config.trim_right_ratio
        self.padding_total = kernel_size - stride

    def __call__(self, x):
        x = self.conv(x)
        if hasattr(self, "norm"):
            x = self.norm(x)
        pr = (
            math.ceil(self.padding_total * self.trim_right_ratio)
            if self.causal
            else self.padding_total // 2
        )
        pl = self.padding_total - pr
        return x[:, pl : x.shape[1] - pr, :]


class EncodecLSTM(Module):
    def __init__(self, config, dimension):
        self.lstm = [_LSTM(dimension, dimension) for _ in range(config.num_lstm_layers)]

    def __call__(self, x):
        h = x
        for lstm in self.lstm:
            h, _ = lstm(h)
        return h + x


class ELU(Module):
    def __call__(self, x):
        return jax.nn.elu(x)


class EncodecResnetBlock(Module):
    def __init__(self, config, dim: int, dilations):
        kernel_sizes = (config.residual_kernel_size, 1)
        hidden = dim // config.compress
        block = []
        for i, (k, d) in enumerate(zip(kernel_sizes, dilations)):
            in_chs = dim if i == 0 else hidden
            out_chs = dim if i == len(kernel_sizes) - 1 else hidden
            block.append(ELU())
            block.append(EncodecConv1d(config, in_chs, out_chs, k, dilation=d))
        self.block = block
        self.shortcut = EncodecConv1d(config, dim, dim, 1)

    def __call__(self, x):
        residual = x
        for layer in self.block:
            x = layer(x)
        return self.shortcut(residual) + x


class EncodecEncoder(Module):
    def __init__(self, config):
        model = [EncodecConv1d(config, config.audio_channels, config.num_filters,
                               config.kernel_size)]
        scaling = 1
        for ratio in reversed(config.upsampling_ratios):
            current = scaling * config.num_filters
            for j in range(config.num_residual_layers):
                model.append(
                    EncodecResnetBlock(config, current, [config.dilation_growth_rate**j, 1])
                )
            model.append(ELU())
            model.append(
                EncodecConv1d(config, current, current * 2, ratio * 2, stride=ratio)
            )
            scaling *= 2
        model.append(EncodecLSTM(config, scaling * config.num_filters))
        model.append(ELU())
        model.append(
            EncodecConv1d(config, scaling * config.num_filters, config.hidden_size,
                          config.last_kernel_size)
        )
        self.layers = model

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class EncodecDecoder(Module):
    def __init__(self, config):
        scaling = int(2 ** len(config.upsampling_ratios))
        model = [EncodecConv1d(config, config.hidden_size,
                               scaling * config.num_filters, config.kernel_size)]
        model.append(EncodecLSTM(config, scaling * config.num_filters))
        for ratio in config.upsampling_ratios:
            current = scaling * config.num_filters
            model.append(ELU())
            model.append(
                EncodecConvTranspose1d(config, current, current // 2, ratio * 2,
                                       stride=ratio)
            )
            for j in range(config.num_residual_layers):
                model.append(
                    EncodecResnetBlock(config, current // 2,
                                       (config.dilation_growth_rate**j, 1))
                )
            scaling //= 2
        model.append(ELU())
        model.append(
            EncodecConv1d(config, config.num_filters, config.audio_channels,
                          config.last_kernel_size)
        )
        self.layers = model

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class EncodecEuclideanCodebook(Module):
    def __init__(self, config):
        self.embed = jnp.zeros((config.codebook_size, config.codebook_dim))

    def encode(self, x):
        # x: (..., D) → nearest codebook index by euclidean distance
        flat = x.reshape(-1, x.shape[-1])
        dist = (
            (flat**2).sum(-1, keepdims=True)
            - 2 * flat @ self.embed.T
            + (self.embed**2).sum(-1)[None, :]
        )
        return jnp.argmin(dist, axis=-1).reshape(x.shape[:-1])

    def decode(self, ind):
        return self.embed[ind]


class EncodecVectorQuantization(Module):
    def __init__(self, config):
        self.codebook = EncodecEuclideanCodebook(config)

    def encode(self, x):
        return self.codebook.encode(x)

    def decode(self, ind):
        return self.codebook.decode(ind)


class EncodecResidualVectorQuantizer(Module):
    def __init__(self, config):
        self.codebook_size = config.codebook_size
        hop_length = int(np.prod(config.upsampling_ratios))
        self.frame_rate = math.ceil(config.sampling_rate / hop_length)
        nbits = math.ceil(math.log2(config.codebook_size))
        self.num_quantizers = max(
            1, int(1000 * config.target_bandwidths[-1] // (self.frame_rate * nbits))
        )
        self.layers = [
            EncodecVectorQuantization(config) for _ in range(self.num_quantizers)
        ]

    def get_num_quantizers_for_bandwidth(self, bandwidth=None) -> int:
        bw_per_q = math.log2(self.codebook_size) * self.frame_rate
        if bandwidth is not None and bandwidth > 0.0:
            return int(max(1, math.floor(bandwidth * 1000 / bw_per_q)))
        return self.num_quantizers

    def encode(self, embeddings, bandwidth=None, nq: Optional[int] = None):
        if nq is None:
            nq = self.get_num_quantizers_for_bandwidth(bandwidth)
        residual = embeddings
        out = []
        for layer in self.layers[:nq]:
            idx = layer.encode(residual)
            residual = residual - layer.decode(idx)
            out.append(idx)
        return jnp.stack(out, axis=1)  # (B, nq, T)

    def decode(self, codes):
        q = None
        for i in range(codes.shape[1]):
            dec = self.layers[i].decode(codes[:, i])
            q = dec if q is None else q + dec
        return q


class Encodec(Module):
    def __init__(self, config: Union[EncodecConfig, dict]):
        if isinstance(config, dict):
            config = EncodecConfig.from_dict(config)
        self.config = config
        self.encoder = EncodecEncoder(config)
        self.decoder = EncodecDecoder(config)
        self.quantizer = EncodecResidualVectorQuantizer(config)

    @property
    def chunk_length(self):
        return self.config.chunk_length

    @property
    def chunk_stride(self):
        return self.config.chunk_stride

    @staticmethod
    @partial(jax.jit, static_argnames=("nq",))
    def _encode_frame(model: "Encodec", audio, nq: int):
        scale = None
        if model.config.normalize:
            mono = audio.mean(axis=-1, keepdims=True)
            scale = jnp.sqrt((mono**2).mean(axis=1, keepdims=True)) + 1e-8
            audio = audio / scale
        emb = model.encoder(audio)
        codes = model.quantizer.encode(emb, nq=nq)
        return codes, scale

    @staticmethod
    @jax.jit
    def _decode_frame(model: "Encodec", codes, scale=None):
        emb = model.quantizer.decode(codes)
        audio = model.decoder(emb)
        if scale is not None:
            audio = audio * scale
        return audio

    def encode(self, input_values, padding_mask=None, bandwidth=None):
        """input_values: (B, C, T) → (codes (n_frames, B, nq, T'), scales)."""
        x = jnp.swapaxes(jnp.asarray(input_values), 1, 2)  # (B, T, C)
        nq = self.quantizer.get_num_quantizers_for_bandwidth(bandwidth)
        chunk = self.chunk_length
        if chunk is None:
            codes, scale = self._encode_frame(self, x, nq)
            return codes[None], [scale]
        stride = self.chunk_stride
        frames, scales = [], []
        for start in range(0, x.shape[1] - chunk + 1, stride):
            c, s = self._encode_frame(self, x[:, start : start + chunk], nq)
            frames.append(c)
            scales.append(s)
        return jnp.stack(frames), scales

    def decode(self, audio_codes, audio_scales=None, padding_mask=None):
        """audio_codes: (n_frames, B, nq, T') → (B, C, T)."""
        audio_codes = jnp.asarray(audio_codes)
        if audio_scales is None:
            audio_scales = [None] * audio_codes.shape[0]
        segments = []
        for i in range(audio_codes.shape[0]):
            segments.append(self._decode_frame(self, audio_codes[i], audio_scales[i]))
        if len(segments) == 1:
            out = segments[0]
        else:
            # overlap-add linear crossfade between chunks
            stride = self.chunk_stride
            total = stride * (len(segments) - 1) + segments[0].shape[1]
            out = jnp.zeros((segments[0].shape[0], total, segments[0].shape[2]))
            wsum = jnp.zeros((total, 1))
            for i, seg in enumerate(segments):
                L = seg.shape[1]
                w = jnp.linspace(0, 1, L // 2 + 1)[1:]
                weight = jnp.concatenate([w, w[::-1]])[:L, None]
                out = out.at[:, i * stride : i * stride + L].add(seg * weight)
                wsum = wsum.at[i * stride : i * stride + L].add(weight)
            out = out / jnp.maximum(wsum, 1e-8)
        return jnp.swapaxes(out, 1, 2)

    def __call__(self, input_values, padding_mask=None, bandwidth=None):
        codes, scales = self.encode(input_values, padding_mask, bandwidth)
        return self.decode(codes, scales, padding_mask)

    def sanitize(self, weights: dict) -> dict:
        from ....nn.sanitize import orient_weights_to_model

        weights = fold_weight_norm_pairs(weights)
        out = {}
        # HF packs both LSTM layers into one torch nn.LSTM:
        # <prefix>.lstm.weight_ih_l{i} → our <prefix>.lstm.{i}.Wx, etc.
        lstm_map = {
            "weight_ih": "Wx", "weight_hh": "Wh",
            "bias_ih": "bias_ih", "bias_hh": "bias_hh",
        }
        lstm_re = re.compile(r"\.lstm\.(weight_ih|weight_hh|bias_ih|bias_hh)_l(\d+)$")
        for k, v in weights.items():
            if k.endswith((".inited", ".cluster_size", ".embed_avg")):
                continue  # VQ EMA training buffers — inference uses `embed` only
            m = lstm_re.search(k)
            nk = (
                f"{k[: m.start()]}.lstm.{m.group(2)}.{lstm_map[m.group(1)]}"
                if m
                else k
            )
            out[nk] = v
        return orient_weights_to_model(self, out)

    @classmethod
    def from_pretrained(cls, repo_id: str):
        from ....utils import get_model_path, load_config, load_weight_files
        from ....nn.module import load_weights as assign

        path = get_model_path(repo_id)
        model = cls(load_config(path))
        weights = model.sanitize(load_weight_files(path))
        return assign(model, weights, strict=False).eval()
