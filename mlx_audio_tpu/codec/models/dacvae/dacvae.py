"""DACVAE: VAE-style 48 kHz audio codec with AudioSeal-style watermarking
(the latent codec behind SAM-Audio).

TPU-native re-implementation of the reference
mlx_audio/codec/models/dacvae/codec.py:16-1644. Channels-last (B, T, C);
encode/decode are single jitted programs; the watermark encoder/decoder
paths (LSTM + up/down conv groups) are implemented with the scan-based
LSTM.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....nn import layers as nn
from ....nn.layers import _he_uniform, _next_key
from ....nn.module import Module
from ....nn.recurrent import LSTM

__all__ = ["DACVAE", "DACVAEConfig"]


@dataclass
class DACVAEConfig:
    encoder_dim: int = 64
    encoder_rates: List[int] = field(default_factory=lambda: [2, 8, 10, 12])
    latent_dim: int = 1024
    decoder_dim: int = 1536
    decoder_rates: List[int] = field(default_factory=lambda: [12, 10, 8, 2])
    n_codebooks: int = 16
    codebook_size: int = 1024
    codebook_dim: int = 128
    sample_rate: int = 48_000
    mean: float = 0.0
    std: float = 1.0

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))

    @classmethod
    def from_dict(cls, d: dict) -> "DACVAEConfig":
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


def _norm_except(x: jnp.ndarray, except_dim: int = 0) -> jnp.ndarray:
    axes = tuple(i for i in range(x.ndim) if i != except_dim)
    return jnp.sqrt(jnp.sum(x * x, axis=axes, keepdims=True))


class WNConv1d(Module):
    """Runtime weight-norm conv with the reference's causal/auto padding
    (reference codec.py:67-156)."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size: int,
                 stride: int = 1, padding: int = 0, dilation: int = 1,
                 bias: bool = True, causal: bool = False,
                 pad_mode: str = "none", norm: str = "weight_norm"):
        self.kernel_size = kernel_size
        self.dilation = dilation
        self.stride = stride
        self.causal = causal
        self.pad_mode = pad_mode
        self.use_weight_norm = norm == "weight_norm"
        self.padding = ((kernel_size - stride) * dilation // 2
                        if pad_mode == "none" else 0)
        shape = (out_channels, kernel_size, in_channels)
        fan_in = kernel_size * in_channels
        if self.use_weight_norm:
            self.weight_g = jnp.ones((out_channels, 1, 1))
            self.weight_v = _he_uniform(_next_key(), shape, fan_in)
        else:
            self.weight = _he_uniform(_next_key(), shape, fan_in)
        if bias:
            self.bias = jnp.zeros((out_channels,))

    def _weight(self):
        if self.use_weight_norm:
            return self.weight_g * self.weight_v / (
                _norm_except(self.weight_v) + 1e-12)
        return self.weight

    def _auto_pad(self, x):
        if self.pad_mode == "none":
            return x
        length = x.shape[1]
        keff = (self.kernel_size - 1) * self.dilation + 1
        pad_total = keff - self.stride
        n_frames = (length - keff + pad_total) / self.stride + 1
        ideal = (math.ceil(n_frames) - 1) * self.stride + (self.kernel_size
                                                           - pad_total)
        extra = max(0, ideal - length)
        if self.causal:
            pl, pr = pad_total, extra
        else:
            pr = extra // 2
            pl = pad_total - pr + extra - pr
        if pl or pr:
            x = jnp.pad(x, ((0, 0), (pl, pr), (0, 0)))
        return x

    def __call__(self, x):
        x = self._auto_pad(x)
        y = jax.lax.conv_general_dilated(
            x, self._weight().astype(x.dtype), window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NLC", "OLI", "NLC"))
        if hasattr(self, "bias"):
            y = y + self.bias.astype(y.dtype)
        return y


class WNConvTranspose1d(Module):
    """reference codec.py:158-248."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size: int,
                 stride: int = 1, bias: bool = True, causal: bool = False,
                 pad_mode: str = "none", norm: str = "weight_norm"):
        self.kernel_size = kernel_size
        self.stride = stride
        self.causal = causal
        self.pad_mode = pad_mode
        self.use_weight_norm = norm == "weight_norm"
        self.padding = (stride + 1) // 2 if pad_mode == "none" else 0
        shape = (out_channels, kernel_size, in_channels)
        fan_in = kernel_size * in_channels
        if self.use_weight_norm:
            self.weight_g = jnp.ones((1, 1, in_channels))
            self.weight_v = _he_uniform(_next_key(), shape, fan_in)
        else:
            self.weight = _he_uniform(_next_key(), shape, fan_in)
        if bias:
            self.bias = jnp.zeros((out_channels,))

    def _weight(self):
        if self.use_weight_norm:
            return self.weight_g * self.weight_v / (
                _norm_except(self.weight_v, 2) + 1e-12)
        return self.weight

    def __call__(self, x):
        # torch conv_transpose1d semantics: flip kernel + lhs dilation
        w = self._weight()  # (O, K, I)
        w_t = jnp.swapaxes(w[:, ::-1, :], 0, 2)  # (I, K, O)
        K = self.kernel_size
        p = self.padding
        y = jax.lax.conv_general_dilated(
            x, w_t.astype(x.dtype), window_strides=(1,),
            padding=[(K - 1 - p, K - 1 - p)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NLC", "ILO", "NLC"))
        if hasattr(self, "bias"):
            y = y + self.bias.astype(y.dtype)
        if self.pad_mode == "none":
            return y
        pad_total = K - self.stride
        if self.causal:
            return y[:, : y.shape[1] - pad_total]
        pr = pad_total // 2
        pl = pad_total - pr
        return y[:, pl: y.shape[1] - pr]


class Snake1d(Module):
    """x + sin²(αx)/α, channels-last (reference codec.py:50-66)."""

    def __init__(self, channels: int):
        self.alpha = jnp.ones((1, 1, channels))

    def __call__(self, x):
        return x + (1.0 / (self.alpha + 1e-9)) * jnp.sin(self.alpha * x) ** 2


class ResidualUnit(Module):
    """reference codec.py:250-320 (true_skip=True is an identity bypass
    in the reference; replicated)."""

    def __init__(self, dim: int, kernel: int = 7, dilation: int = 1,
                 act: str = "Snake", compress: int = 1, causal: bool = False,
                 pad_mode: str = "none", norm: str = "weight_norm",
                 true_skip: bool = False):
        self.true_skip = true_skip
        hidden = dim // compress
        self.act_type = act
        if act == "Snake":
            self.act1 = Snake1d(dim)
            self.act2 = Snake1d(hidden)
        self.conv1 = WNConv1d(dim, hidden, kernel, dilation=dilation,
                              causal=causal, pad_mode=pad_mode, norm=norm)
        self.conv2 = WNConv1d(hidden, dim, 1, causal=causal,
                              pad_mode=pad_mode, norm=norm)

    def _act(self, which, x):
        if self.act_type == "Snake":
            return (self.act1 if which == 1 else self.act2)(x)
        return jax.nn.elu(x)

    def __call__(self, x):
        y = self.conv2(self._act(2, self.conv1(self._act(1, x))))
        if self.true_skip:
            return x
        pad = (x.shape[1] - y.shape[1]) // 2
        if pad > 0:
            x = x[:, pad:-pad]
        return x + y


class EncoderBlock(Module):
    def __init__(self, dim: int, stride: int):
        self.res1 = ResidualUnit(dim // 2, dilation=1)
        self.res2 = ResidualUnit(dim // 2, dilation=3)
        self.res3 = ResidualUnit(dim // 2, dilation=9)
        self.snake = Snake1d(dim // 2)
        self.conv = WNConv1d(dim // 2, dim, 2 * stride, stride=stride,
                             padding=math.ceil(stride / 2))

    def __call__(self, x):
        return self.conv(self.snake(self.res3(self.res2(self.res1(x)))))


class Encoder(Module):
    def __init__(self, d_model: int, strides: List[int], d_latent: int):
        self.conv_in = WNConv1d(1, d_model, 7, padding=3)
        blocks = []
        dim = d_model
        for s in strides:
            dim *= 2
            blocks.append(EncoderBlock(dim, s))
        self.blocks = blocks
        self.snake_out = Snake1d(dim)
        self.conv_out = WNConv1d(dim, d_latent, 3, padding=1)

    def __call__(self, x):
        x = self.conv_in(x)
        for b in self.blocks:
            x = b(x)
        return self.conv_out(self.snake_out(x))


class LSTMBlock(Module):
    def __init__(self, input_size: int, hidden_size: int, num_layers: int,
                 skip: bool = True):
        self.skip = skip
        self.lstm = [LSTM(input_size if i == 0 else hidden_size, hidden_size)
                     for i in range(num_layers)]

    def __call__(self, x):
        y = x
        for layer in self.lstm:
            y, _ = layer(y)
        return y + x if self.skip else y


class DecoderBlock(Module):
    """Dual-path block (reference codec.py:460-606)."""

    def __init__(self, input_dim: int, output_dim: int, stride: int,
                 stride_wm: int, downsampling_factor: int = 3):
        wm_in = input_dim // downsampling_factor
        wm_out = output_dim // downsampling_factor
        self.block_0 = Snake1d(input_dim)
        self.block_1 = WNConvTranspose1d(input_dim, output_dim, 2 * stride,
                                         stride=stride)
        self.block_3 = WNConvTranspose1d(wm_in, wm_out, 2 * stride_wm,
                                         stride=stride_wm, causal=True,
                                         pad_mode="auto", norm="none")
        self.block_4 = ResidualUnit(output_dim, dilation=1)
        self.block_5 = ResidualUnit(output_dim, dilation=3)
        self.block_6 = ResidualUnit(wm_out, kernel=3, act="ELU", compress=2,
                                    causal=True, pad_mode="auto",
                                    norm="none", true_skip=True)
        self.block_7 = ResidualUnit(wm_out, kernel=3, act="ELU", compress=2,
                                    causal=True, pad_mode="auto",
                                    norm="none", true_skip=True)
        self.block_8 = ResidualUnit(output_dim, dilation=9)
        self.block_11 = WNConv1d(wm_out, wm_in, 2 * stride_wm,
                                 stride=stride_wm, causal=True,
                                 pad_mode="auto", norm="none")

    def __call__(self, x):
        x = self.block_1(self.block_0(x))
        return self.block_8(self.block_5(self.block_4(x)))

    def upsample_group(self, x):
        x = self.block_3(jax.nn.elu(x))
        return self.block_7(self.block_6(x))

    def downsample_group(self, x):
        return self.block_11(jax.nn.elu(x))


class MsgProcessor(Module):
    """reference codec.py:615-644. hidden: (B, T, C)."""

    def __init__(self, nbits: int, hidden_size: int):
        self.nbits = nbits
        self.msg_processor = nn.Embedding(2 * nbits, hidden_size)

    def __call__(self, hidden, msg):
        B = msg.shape[0]
        idx = jnp.arange(0, 2 * self.nbits, 2)[None] + msg.astype(jnp.int32)
        aux = self.msg_processor(idx).sum(axis=1)  # (B, C)
        return hidden + aux[:, None, :]

    def random_message(self, batch_size: int, seed: int = 0) -> jnp.ndarray:
        """Random nbits-bit watermark payload (reference codec.py:771-773)."""
        return jax.random.randint(jax.random.PRNGKey(seed),
                                  (batch_size, self.nbits), 0, 2)


class WatermarkEncoderBlock(Module):
    def __init__(self, out_dim: int = 128, wm_channels: int = 32,
                 hidden: int = 512, lstm_layers: int = 2):
        self.pre_3 = WNConv1d(1, wm_channels, 7, causal=True,
                              pad_mode="auto", norm="none")
        self.post_0 = LSTMBlock(hidden, hidden, lstm_layers)
        self.post_2 = WNConv1d(hidden, out_dim, 7, causal=True,
                               pad_mode="auto", norm="none")

    def post_process(self, x):
        return self.post_2(jax.nn.elu(self.post_0(x)))


class WatermarkDecoderBlock(Module):
    def __init__(self, in_dim: int = 128, out_dim: int = 1,
                 channels: int = 32, hidden: int = 512,
                 lstm_layers: int = 2):
        self.pre_0 = WNConv1d(in_dim, hidden, 7, causal=True,
                              pad_mode="auto", norm="none")
        self.pre_1 = LSTMBlock(hidden, hidden, lstm_layers)
        self.post_1 = WNConv1d(channels, out_dim, 7, causal=True,
                               pad_mode="auto", norm="none")

    def __call__(self, x):
        return self.pre_1(self.pre_0(x))

    def post_process(self, x):
        return self.post_1(jax.nn.elu(x))


class Watermarker(Module):
    def __init__(self, d_out: int = 1, d_latent: int = 128,
                 channels: int = 32, hidden: int = 512, nbits: int = 16,
                 lstm_layers: int = 2):
        self.nbits = nbits
        self.encoder_block = WatermarkEncoderBlock(d_latent, channels,
                                                   hidden, lstm_layers)
        self.msg_processor = MsgProcessor(nbits, d_latent)
        self.decoder_block = WatermarkDecoderBlock(d_latent, d_out, channels,
                                                   hidden, lstm_layers)


class Decoder(Module):
    """reference codec.py:781-905."""

    def __init__(self, input_channel: int, channels: int, rates: List[int],
                 wm_rates: Optional[List[int]] = None, wm_channels: int = 32,
                 nbits: int = 16, d_out: int = 1, d_wm_out: int = 128):
        wm_rates = wm_rates or [8, 5, 4, 2]
        self.conv_in = WNConv1d(input_channel, channels, 7, padding=3)
        self.blocks = [
            DecoderBlock(channels // 2**i, channels // 2 ** (i + 1), s, ws)
            for i, (s, ws) in enumerate(zip(rates, wm_rates))
        ]
        final = channels // 2 ** len(rates)
        self.snake_out = Snake1d(final)
        self.conv_out = WNConv1d(final, d_out, 7, padding=3)
        self.wm_model = Watermarker(d_out=d_out, d_latent=d_wm_out,
                                    channels=wm_channels, hidden=512,
                                    nbits=nbits, lstm_layers=2)
        self.alpha = wm_channels / d_wm_out

    def __call__(self, x):
        x = self.conv_in(x)
        for b in self.blocks:
            x = b(x)
        return x

    def decode_with_watermark(self, x, message=None):
        """message=None → plain decode. The watermark blend mirrors the
        reference (codec.py:868-905); note the reference's channel chain
        through the reversed upsample groups only closes for checkpoints
        whose wm dims were trained to match."""
        if message is None or self.alpha <= 0.0:
            return jnp.tanh(self.conv_out(self.snake_out(x)))
        base = jnp.tanh(self.conv_out(self.snake_out(x)))
        h = self.wm_model.encoder_block.pre_3(base)
        for b in reversed(self.blocks):
            h = b.upsample_group(h)
        h = self.wm_model.encoder_block.post_process(h)
        h = self.wm_model.msg_processor(h, message)
        h = self.wm_model.decoder_block(h)
        for b in self.blocks:
            h = b.downsample_group(h)
        h = self.wm_model.decoder_block.post_process(h)
        n = min(base.shape[1], h.shape[1])
        return base[:, :n] + self.alpha * h[:, :n]


class DACVAE(Module):
    """reference codec.py:958-1644."""

    def __init__(self, config: Optional[DACVAEConfig] = None):
        if isinstance(config, dict):
            config = DACVAEConfig.from_dict(config)
        self.config = config or DACVAEConfig()
        config = self.config
        self.sample_rate = config.sample_rate
        self.hop_length = config.hop_length
        self.encoder = Encoder(config.encoder_dim, config.encoder_rates,
                               config.latent_dim)
        self.quantizer_in_proj = WNConv1d(config.latent_dim,
                                          config.codebook_dim * 2, 1)
        self.quantizer_out_proj = WNConv1d(config.codebook_dim,
                                           config.latent_dim, 1)
        self.decoder = Decoder(config.latent_dim, config.decoder_dim,
                               config.decoder_rates)

    def _pad(self, wavs):
        L = wavs.shape[1]
        rem = L % self.hop_length
        if rem:
            wavs = jnp.pad(wavs, ((0, 0), (0, self.hop_length - rem),
                                  (0, 0)))
        return wavs

    def encode(self, waveform) -> jnp.ndarray:
        """(B, T, 1) → latents (B, codebook_dim, frames). One XLA
        program per padded length (vs the reference's eager op stream)."""
        x = self._pad(jnp.asarray(waveform))
        return _encode_jit(self, x)

    def wav_idx_to_feature_idx(self, wav_idx: int,
                               sample_rate: int = None) -> int:
        """Sample index → frame index (reference codec.py:1577-1593)."""
        sr = sample_rate or self.sample_rate
        target = int(np.ceil(self.sample_rate * wav_idx / sr))
        return int(np.ceil(target / self.hop_length))

    def feature_idx_to_wav_idx(self, feature_idx: int,
                               sample_rate: int = None) -> int:
        """Frame index → sample index (reference codec.py:1595-1610)."""
        sr = sample_rate or self.sample_rate
        return int(feature_idx * self.hop_length * (sr / self.sample_rate))

    def decode_stream(self, encoded_frames, callback, chunk_size: int = 50,
                      overlap: int = 4, message=None) -> int:
        """Callback-style streaming decode (reference codec.py:1302-1340):
        calls `callback(chunk, index, is_last)` per chunk and returns the
        total number of samples produced."""
        total = 0
        for i, (chunk, is_last) in enumerate(self.decode_streaming(
                encoded_frames, chunk_size, overlap, message=message)):
            total += int(chunk.shape[1])
            callback(chunk, i, is_last)
        return total

    def decode_streaming(self, encoded_frames, chunk_size: int = 50,
                         overlap: int = 4, message=None):
        """Yield (chunk_audio, is_last) with crossfaded seams
        (reference codec.py:1164-1290)."""
        frames = jnp.asarray(encoded_frames)
        total = frames.shape[-1]
        ov = overlap * self.hop_length
        fade_in = jnp.linspace(0.0, 1.0, ov)[None, :, None]
        fade_out = 1.0 - fade_in
        start = 0
        tail = None
        while start < total:
            end = min(start + chunk_size, total)
            out = self.decode(frames[:, :, start:end], message=message)
            is_last = end >= total
            head = out[:, :ov] * fade_in.astype(out.dtype)
            if tail is not None:
                head = head + tail
            body = out[:, ov if tail is not None else 0:
                       (None if is_last else -ov)]
            piece = jnp.concatenate(
                [head, body] if tail is not None else [body], axis=1)
            if not is_last:
                tail = out[:, -ov:] * fade_out.astype(out.dtype)
            yield piece, is_last
            if is_last:
                return
            start = end - overlap

    def decode(self, encoded_frames, message=None,
               chunk_size=None) -> jnp.ndarray:
        """(B, codebook_dim, frames) → waveform (B, T, 1).

        `chunk_size` (frames) enables overlap-crossfaded chunked decoding
        to bound peak activation memory (reference codec.py:1022-1160)."""
        if chunk_size is not None:
            return self._decode_chunked(encoded_frames, chunk_size,
                                        message=message)
        if message is None:
            return _decode_jit(self, jnp.asarray(encoded_frames))
        emb = self.quantizer_out_proj(jnp.swapaxes(
            jnp.asarray(encoded_frames), 1, 2))
        h = self.decoder(emb)
        return self.decoder.decode_with_watermark(h, message)

    def _decode_chunked(self, encoded_frames, chunk_size: int,
                        overlap: int = 4, message=None) -> jnp.ndarray:
        """Linear-crossfade stitching of per-chunk decodes
        (reference codec.py:1064-1160)."""
        frames = jnp.asarray(encoded_frames)
        total = frames.shape[-1]
        if total <= chunk_size:
            return self.decode(frames, message=message)
        ov = overlap * self.hop_length
        fade_in = jnp.linspace(0.0, 1.0, ov)[None, :, None]
        fade_out = 1.0 - fade_in

        chunks = []
        start = 0
        while start < total:
            end = min(start + chunk_size, total)
            chunk = self.decode(frames[:, :, start:end], message=message)
            # serialize chunk programs: chunked decode exists to bound
            # peak memory, but async dispatch would keep every queued
            # program's workspace live at once — the sync caps the
            # working set at one chunk (matters when a large model, e.g.
            # SAM-Audio's DiT, is resident alongside)
            jax.block_until_ready(chunk)
            chunks.append(chunk)
            if end >= total:
                break
            start = end - overlap

        parts = []
        for i, chunk in enumerate(chunks):
            head = chunk[:, :ov] * fade_in.astype(chunk.dtype)
            tail = chunk[:, -ov:] * fade_out.astype(chunk.dtype)
            if i == 0:
                parts.append(chunk[:, :-ov])
                parts.append(tail)
            elif i == len(chunks) - 1:
                parts[-1] = parts[-1] + head
                parts.append(chunk[:, ov:])
            else:
                parts[-1] = parts[-1] + head
                parts.append(chunk[:, ov:-ov])
                parts.append(tail)
        return jnp.concatenate(parts, axis=1)

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for key, value in weights.items():
            if "num_batches_tracked" in key:
                continue
            k = key
            # torch LSTM keys → our scan LSTM
            import re

            m = re.search(r"(.*lstm)\.(weight_ih|weight_hh|bias_ih|bias_hh)"
                          r"_l(\d+)$", k)
            if m:
                remap = {"weight_ih": "Wx", "weight_hh": "Wh",
                         "bias_ih": "bias_ih", "bias_hh": "bias_hh"}
                k = f"{m.group(1)}.{m.group(3)}.{remap[m.group(2)]}"
            out[k] = value
        from ....nn.sanitize import orient_weights_to_model

        return orient_weights_to_model(self, out)


@jax.jit
def _encode_jit(codec: DACVAE, x: jnp.ndarray) -> jnp.ndarray:
    z = codec.encoder(x)
    proj = codec.quantizer_in_proj(z)
    mean, _ = jnp.split(proj, 2, axis=-1)
    return jnp.swapaxes(mean, 1, 2)


@jax.jit
def _decode_jit(codec: DACVAE, frames: jnp.ndarray) -> jnp.ndarray:
    emb = codec.quantizer_out_proj(jnp.swapaxes(frames, 1, 2))
    h = codec.decoder(emb)
    return codec.decoder.decode_with_watermark(h, None)
