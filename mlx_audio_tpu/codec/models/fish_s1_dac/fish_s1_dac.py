"""Fish-Speech S1 DAC: causal DAC with semantic+residual VQ, window-limited
transformers, and ConvNeXt downsample/upsample around the quantizer.

TPU-native re-implementation of the reference
mlx_audio/codec/models/fish_s1_dac/fish_s1_dac.py:15-1344. Channels-last
(B, T, C) throughout; weight-norm is folded into plain conv weights at load
(the reference recomputes g·v/‖v‖ every call).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....nn import layers as nn
from ....nn.module import Module

__all__ = ["FishS1DAC", "build_ae", "DownsampleResidualVectorQuantize",
           "WindowLimitedTransformer"]


def snake(x, alpha):
    return x + (1.0 / (alpha + 1e-9)) * jnp.sin(alpha * x) ** 2


class Snake1d(Module):
    def __init__(self, channels: int):
        self.alpha = jnp.ones((1, 1, channels))

    def __call__(self, x):
        return snake(x, self.alpha)


def _extra_padding(length: int, keff: int, stride: int, pad_total: int) -> int:
    n_frames = (length - keff + pad_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (keff - pad_total)
    return max(0, ideal - length)


class CausalConv1d(Module):
    """Left-padded causal conv (reference fish_s1_dac.py:265-296)."""

    def __init__(self, in_channels, out_channels, kernel_size, dilation=1,
                 stride=1, groups=1, bias=True, padding=None):
        self.conv = nn.Conv1d(in_channels, out_channels, kernel_size,
                              stride=stride, dilation=dilation,
                              groups=groups, bias=bias)
        self.stride = stride
        self.keff = (kernel_size - 1) * dilation + 1

    def __call__(self, x):
        pad = self.keff - self.stride
        extra = _extra_padding(x.shape[1], self.keff, self.stride, pad)
        return self.conv(jnp.pad(x, ((0, 0), (pad, extra), (0, 0))))


class CausalConvTranspose1d(Module):
    """reference fish_s1_dac.py:299-331."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 bias=True, padding=None):
        self.conv = nn.ConvTranspose1d(in_channels, out_channels,
                                       kernel_size, stride=stride, bias=bias)
        self.kernel_size = kernel_size
        self.stride = stride

    def __call__(self, x):
        y = self.conv(x)
        pad = self.kernel_size - self.stride
        return y[:, : y.shape[1] - pad] if pad > 0 else y


class ResidualUnit(Module):
    """reference fish_s1_dac.py:929-953."""

    def __init__(self, dim: int = 16, dilation: int = 1,
                 causal: bool = False):
        self.causal = causal
        pad = ((7 - 1) * dilation) // 2
        Conv = CausalConv1d if causal else (
            lambda i, o, k, **kw: nn.Conv1d(i, o, k, **kw))
        self.snake1 = Snake1d(dim)
        self.conv1 = (CausalConv1d(dim, dim, 7, dilation=dilation) if causal
                      else nn.Conv1d(dim, dim, 7, dilation=dilation,
                                     padding=pad))
        self.snake2 = Snake1d(dim)
        self.conv2 = (CausalConv1d(dim, dim, 1) if causal
                      else nn.Conv1d(dim, dim, 1))

    def __call__(self, x):
        y = self.conv2(self.snake2(self.conv1(self.snake1(x))))
        pad = x.shape[1] - y.shape[1]
        if pad > 0:
            x = x[:, :-pad] if self.causal else x[:, pad // 2: -(pad // 2)]
        return x + y


@dataclass
class ModelArgs:
    """reference fish_s1_dac.py:592-615."""

    block_size: int = 4096
    n_layer: int = 8
    n_head: int = 8
    dim: int = 512
    intermediate_size: int = 1536
    n_local_heads: int = -1
    head_dim: int = 64
    rope_base: float = 10000.0
    norm_eps: float = 1e-5
    channels_first: bool = True

    def __post_init__(self):
        if self.n_local_heads == -1:
            self.n_local_heads = self.n_head
        self.head_dim = self.dim // self.n_head


class _TFAttention(Module):
    def __init__(self, cfg: ModelArgs):
        self.wqkv = nn.Linear(cfg.dim, 3 * cfg.dim, bias=False)
        self.wo = nn.Linear(cfg.dim, cfg.dim, bias=False)
        self.n_head = cfg.n_head
        self.head_dim = cfg.head_dim
        self.rope_base = cfg.rope_base

    def __call__(self, x, mask):
        B, T, D = x.shape
        qkv = self.wqkv(x).reshape(B, T, 3, self.n_head, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # interleaved-pair rope (reference fish_s1_dac.py:548-568)
        half = self.head_dim // 2
        freqs = 1.0 / (self.rope_base
                       ** (jnp.arange(half, dtype=jnp.float32) / half))
        ang = jnp.arange(T, dtype=jnp.float32)[:, None] * freqs[None]
        cos, sin = jnp.cos(ang), jnp.sin(ang)

        def rot(a):
            ar = a.reshape(B, T, self.n_head, half, 2)
            r, i = ar[..., 0], ar[..., 1]
            c = cos[None, :, None, :]
            s = sin[None, :, None, :]
            return jnp.stack([r * c - i * s, r * s + i * c],
                             axis=-1).reshape(B, T, self.n_head, self.head_dim)

        q, k = rot(q), rot(k)
        q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
        scores = q @ k.transpose(0, 1, 3, 2) / math.sqrt(self.head_dim)
        scores = jnp.where(mask, scores, -1e9)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, D)
        return self.wo(out)


class _TFBlock(Module):
    def __init__(self, cfg: ModelArgs):
        self.attention = _TFAttention(cfg)
        self.feed_forward = nn.Sequential(
            nn.Linear(cfg.dim, cfg.intermediate_size, bias=False), nn.SiLU(),
            nn.Linear(cfg.intermediate_size, cfg.dim, bias=False))
        self.attention_norm = nn.RMSNorm(cfg.dim, eps=cfg.norm_eps)
        self.ffn_norm = nn.RMSNorm(cfg.dim, eps=cfg.norm_eps)

    def __call__(self, x, mask):
        x = x + self.attention(self.attention_norm(x), mask)
        return x + self.feed_forward(self.ffn_norm(x))


class WindowLimitedTransformer(Module):
    """Causal rope transformer with bounded left context
    (reference fish_s1_dac.py:696-790)."""

    def __init__(self, config: ModelArgs, input_dim: int = 512,
                 window_size: Optional[int] = None, causal: bool = True):
        self.window_size = window_size
        self.layers = [_TFBlock(config) for _ in range(config.n_layer)]
        self.norm = nn.RMSNorm(config.dim, eps=config.norm_eps)
        if input_dim != config.dim:
            self.input_proj = nn.Linear(input_dim, config.dim)
            self.output_proj = nn.Linear(config.dim, input_dim)

    def __call__(self, x):
        if hasattr(self, "input_proj"):
            x = self.input_proj(x)
        T = x.shape[1]
        rows = jnp.arange(T)[:, None]
        cols = jnp.arange(T)[None, :]
        mask = cols <= rows
        if self.window_size is not None:
            mask = mask & (cols >= jnp.maximum(rows - self.window_size + 1, 0))
        mask = mask[None, None]
        for layer in self.layers:
            x = layer(x, mask)
        x = self.norm(x)
        if hasattr(self, "output_proj"):
            x = self.output_proj(x)
        return x


class ConvNeXtBlock(Module):
    """reference fish_s1_dac.py:509-546. (B, T, C)."""

    def __init__(self, dim: int, mult: int = 4):
        self.dwconv = nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, dim * mult)
        self.pwconv2 = nn.Linear(dim * mult, dim)
        self.gamma = jnp.full((dim,), 1e-6)

    def __call__(self, x):
        h = self.dwconv(x)
        h = self.pwconv2(jax.nn.gelu(self.pwconv1(self.norm(h))))
        return x + self.gamma * h


class VectorQuantize(Module):
    """L2-normalized nearest-code VQ (reference fish_s1_dac.py:379-423)."""

    def __init__(self, input_dim: int, codebook_size: int, codebook_dim: int):
        self.codebook_size = codebook_size
        self.codebook_dim = codebook_dim
        self.in_proj = nn.Conv1d(input_dim, codebook_dim, 1)
        self.out_proj = nn.Conv1d(codebook_dim, input_dim, 1)
        self.codebook = nn.Embedding(codebook_size, codebook_dim)

    def encode(self, z):
        """z: (B, T, D) → (z_q_projected, indices)."""
        z_e = self.in_proj(z)
        zn = z_e / jnp.maximum(jnp.linalg.norm(z_e, axis=-1, keepdims=True),
                               1e-12)
        cb = self.codebook.weight
        cn = cb / jnp.maximum(jnp.linalg.norm(cb, axis=-1, keepdims=True),
                              1e-12)
        sim = zn @ cn.T
        indices = jnp.argmax(sim, axis=-1)
        z_q = self.codebook.weight[indices]
        return self.out_proj(z_q), indices

    def decode_code(self, indices):
        return self.codebook.weight[indices]  # (B, T, cd)


class ResidualVectorQuantize(Module):
    """reference fish_s1_dac.py:425-498."""

    def __init__(self, input_dim: int = 512, n_codebooks: int = 9,
                 codebook_size: int = 1024, codebook_dim: int = 8, **_):
        self.n_codebooks = n_codebooks
        self.codebook_size = codebook_size
        self.quantizers = [
            VectorQuantize(input_dim, codebook_size, codebook_dim)
            for _ in range(n_codebooks)
        ]

    def encode(self, z, n_quantizers: Optional[int] = None):
        n = n_quantizers or self.n_codebooks
        z_q = jnp.zeros_like(z)
        residual = z
        codes = []
        for i, q in enumerate(self.quantizers):
            if i >= n:
                break
            z_q_i, idx = q.encode(residual)
            z_q = z_q + z_q_i
            residual = residual - z_q_i
            codes.append(idx)
        return z_q, jnp.stack(codes, axis=1)  # (B, nq, T)

    def from_codes(self, codes):
        z_q = 0.0
        for i in range(codes.shape[1]):
            z_q = z_q + self.quantizers[i].out_proj(
                self.quantizers[i].decode_code(codes[:, i]))
        return z_q


class DownsampleResidualVectorQuantize(Module):
    """Semantic + residual RVQ around conv down/upsampling
    (reference fish_s1_dac.py:791-926)."""

    def __init__(self, input_dim: int = 1024, n_codebooks: int = 9,
                 codebook_dim: int = 8, codebook_size: int = 1024,
                 semantic_codebook_size: int = 4096,
                 downsample_factor: Tuple[int, ...] = (2, 2),
                 pre_module: Optional[Module] = None,
                 post_module: Optional[Module] = None):
        self.semantic_quantizer = ResidualVectorQuantize(
            input_dim, 1, semantic_codebook_size, codebook_dim)
        self.quantizer = ResidualVectorQuantize(
            input_dim, n_codebooks, codebook_size, codebook_dim)
        dims = (input_dim,) * (len(downsample_factor) + 1)
        self.downsample = [
            [CausalConv1d(dims[i], dims[i + 1], f, stride=f),
             ConvNeXtBlock(dims[i + 1])]
            for i, f in enumerate(downsample_factor)
        ]
        self.upsample = [
            [CausalConvTranspose1d(dims[i + 1], dims[i], f, stride=f),
             ConvNeXtBlock(dims[i])]
            for i, f in reversed(list(enumerate(downsample_factor)))
        ]
        self.pre_module = pre_module
        self.post_module = post_module

    def _pre(self, z):
        return self.pre_module(z) if self.pre_module is not None else z

    def _post(self, z):
        return self.post_module(z) if self.post_module is not None else z

    def encode(self, z, n_quantizers: Optional[int] = None):
        orig_T = z.shape[1]
        for conv, cnx in self.downsample:
            z = cnx(conv(z))
        z = self._pre(z)
        sem_q, sem_codes = self.semantic_quantizer.encode(z)
        res_q, codes = self.quantizer.encode(z - sem_q, n_quantizers)
        z_q = sem_q + res_q
        all_codes = jnp.concatenate([sem_codes, codes], axis=1)
        z_q = self._post(z_q)
        for conv, cnx in self.upsample:
            z_q = cnx(conv(z_q))
        diff = orig_T - z_q.shape[1]
        if diff > 0:
            z_q = jnp.pad(z_q, ((0, 0), (diff, 0), (0, 0)))
        elif diff < 0:
            z_q = z_q[:, -diff:]
        return z_q, all_codes

    def decode(self, indices):
        sem = jnp.clip(indices[:, :1], 0,
                       self.semantic_quantizer.codebook_size - 1)
        z_q = self.semantic_quantizer.from_codes(sem)
        if indices.shape[1] > 1:
            res = jnp.clip(indices[:, 1:], 0,
                           self.quantizer.codebook_size - 1)
            z_q = z_q + self.quantizer.from_codes(res)
        z_q = self._post(z_q)
        for conv, cnx in self.upsample:
            z_q = cnx(conv(z_q))
        return z_q


class EncoderBlock(Module):
    def __init__(self, dim: int, stride: int, causal: bool,
                 n_t_layer: int = 0):
        self.res1 = ResidualUnit(dim // 2, 1, causal)
        self.res2 = ResidualUnit(dim // 2, 3, causal)
        self.res3 = ResidualUnit(dim // 2, 9, causal)
        self.snake = Snake1d(dim // 2)
        self.conv = (CausalConv1d(dim // 2, dim, 2 * stride, stride=stride)
                     if causal else
                     nn.Conv1d(dim // 2, dim, 2 * stride, stride=stride,
                               padding=math.ceil(stride / 2)))
        if n_t_layer:
            self.transformer = WindowLimitedTransformer(
                ModelArgs(n_layer=n_t_layer, n_head=max(1, dim // 64),
                          dim=dim, intermediate_size=dim * 3),
                input_dim=dim, window_size=512)

    def __call__(self, x):
        x = self.conv(self.snake(self.res3(self.res2(self.res1(x)))))
        if hasattr(self, "transformer"):
            x = self.transformer(x)
        return x


class Encoder(Module):
    def __init__(self, d_model: int, strides: List[int], d_latent: int,
                 n_transformer_layers: List[int], causal: bool):
        self.conv_in = (CausalConv1d(1, d_model, 7) if causal
                        else nn.Conv1d(1, d_model, 7, padding=3))
        blocks = []
        for s, nt in zip(strides, n_transformer_layers):
            d_model *= 2
            blocks.append(EncoderBlock(d_model, s, causal, nt))
        self.blocks = blocks
        self.snake_out = Snake1d(d_model)
        self.conv_out = (CausalConv1d(d_model, d_latent, 3) if causal
                         else nn.Conv1d(d_model, d_latent, 3, padding=1))

    def __call__(self, x):
        x = self.conv_in(x)
        for b in self.blocks:
            x = b(x)
        return self.conv_out(self.snake_out(x))


class DecoderBlock(Module):
    def __init__(self, input_dim: int, output_dim: int, stride: int,
                 causal: bool):
        self.snake = Snake1d(input_dim)
        self.conv = (CausalConvTranspose1d(input_dim, output_dim, 2 * stride,
                                           stride=stride)
                     if causal else
                     nn.ConvTranspose1d(input_dim, output_dim, 2 * stride,
                                        stride=stride,
                                        padding=math.ceil(stride / 2)))
        self.res1 = ResidualUnit(output_dim, 1, causal)
        self.res2 = ResidualUnit(output_dim, 3, causal)
        self.res3 = ResidualUnit(output_dim, 9, causal)

    def __call__(self, x):
        return self.res3(self.res2(self.res1(self.conv(self.snake(x)))))


class Decoder(Module):
    def __init__(self, input_channel: int, channels: int, rates: List[int],
                 d_out: int = 1, causal: bool = True):
        self.conv_in = (CausalConv1d(input_channel, channels, 7) if causal
                        else nn.Conv1d(input_channel, channels, 7, padding=3))
        blocks = []
        out_dim = channels
        for i, s in enumerate(rates):
            blocks.append(DecoderBlock(channels // 2**i,
                                       channels // 2 ** (i + 1), s, causal))
            out_dim = channels // 2 ** (i + 1)
        self.blocks = blocks
        self.snake_out = Snake1d(out_dim)
        self.conv_out = (CausalConv1d(out_dim, d_out, 7) if causal
                         else nn.Conv1d(out_dim, d_out, 7, padding=3))

    def __call__(self, x):
        x = self.conv_in(x)
        for b in self.blocks:
            x = b(x)
        return jnp.tanh(self.conv_out(self.snake_out(x)))


class FishS1DAC(Module):
    """reference fish_s1_dac.py:1100-1266 (class DAC)."""

    def __init__(self, encoder_dim: int = 64,
                 encoder_rates: Optional[List[int]] = None,
                 latent_dim: Optional[int] = None, decoder_dim: int = 1536,
                 decoder_rates: Optional[List[int]] = None,
                 quantizer: Optional[Module] = None,
                 sample_rate: int = 44100, causal: bool = True,
                 encoder_transformer_layers: Optional[List[int]] = None,
                 decoder_transformer_layers: Optional[List[int]] = None):
        encoder_rates = encoder_rates or [2, 4, 8, 8]
        decoder_rates = decoder_rates or [8, 8, 4, 2]
        encoder_transformer_layers = (encoder_transformer_layers
                                      or [0] * len(encoder_rates))
        if latent_dim is None:
            latent_dim = encoder_dim * (2 ** len(encoder_rates))
        self.sample_rate = sample_rate
        self.hop_length = int(np.prod(encoder_rates))
        self.frame_length = self.hop_length * 4
        self.encoder = Encoder(encoder_dim, encoder_rates, latent_dim,
                               encoder_transformer_layers, causal)
        self.quantizer = quantizer or DownsampleResidualVectorQuantize(
            input_dim=latent_dim)
        self.decoder = Decoder(latent_dim, decoder_dim, decoder_rates,
                               causal=causal)

    def encode(self, audio, n_quantizers: Optional[int] = None):
        """audio (B, T) or (B, T, 1) → codes (B, nq+1, frames)."""
        x = jnp.asarray(audio)
        if x.ndim == 2:
            x = x[:, :, None]
        L = x.shape[1]
        pad = math.ceil(L / self.frame_length) * self.frame_length - L
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        z = self.encoder(x)
        _, codes = self.quantizer.encode(z, n_quantizers)
        return codes

    def decode(self, indices):
        """codes (B, nq+1, frames) → audio (B, T, 1)."""
        z = self.quantizer.decode(jnp.asarray(indices))
        return self.decoder(z)

    def sanitize(self, weights: dict) -> dict:
        from ..base import fold_weight_norm_pairs
        from ....nn.sanitize import orient_weights_to_model

        out = {}
        for k, v in weights.items():
            k = k.replace(".conv.parametrizations.weight.original0",
                          ".weight_g")
            k = k.replace(".conv.parametrizations.weight.original1",
                          ".weight_v")
            k = k.replace(".parametrizations.weight.original0", ".weight_g")
            k = k.replace(".parametrizations.weight.original1", ".weight_v")
            out[k] = v
        out = fold_weight_norm_pairs(out)
        return orient_weights_to_model(self, out)


def from_pretrained(repo_id: str = "jordand/fish-s1-dac-min") -> FishS1DAC:
    """Load the published Fish S1 DAC weights (reference echo_tts
    config.py:62 default repo; echo_tts.py:87)."""
    from ....nn.module import load_weights as assign
    from ....utils import get_model_path, load_weight_files

    model = build_ae()
    path = get_model_path(repo_id)
    weights = model.sanitize(load_weight_files(path))
    return assign(model, weights, strict=False).eval()


FishS1DAC.from_pretrained = staticmethod(from_pretrained)


def build_ae(**cfg) -> FishS1DAC:
    """Default S1 codec (reference fish_s1_dac.py:1268-1331)."""
    q_cfg = ModelArgs(block_size=4096, n_layer=8, n_head=16, dim=1024,
                      intermediate_size=3072)
    quantizer = DownsampleResidualVectorQuantize(
        input_dim=1024, n_codebooks=9, codebook_size=1024, codebook_dim=8,
        semantic_codebook_size=4096, downsample_factor=(2, 2),
        pre_module=WindowLimitedTransformer(q_cfg, input_dim=1024,
                                            window_size=128),
        post_module=WindowLimitedTransformer(q_cfg, input_dim=1024,
                                             window_size=128))
    return FishS1DAC(
        encoder_dim=64, encoder_rates=[2, 4, 8, 8], latent_dim=1024,
        decoder_dim=1536, decoder_rates=[8, 8, 4, 2], quantizer=quantizer,
        sample_rate=44100, causal=True,
        encoder_transformer_layers=[0, 0, 0, 4], **cfg)
