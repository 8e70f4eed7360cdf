"""Qwen3-TTS speech tokenizer: RVQ codes ↔ waveform.

Behavioral spec: reference tts/models/qwen3_tts/speech_tokenizer.py —
decoder = SplitRVQ dequantize → causal pre-conv → sliding-window
transformer → ConvNeXt upsample stack → SnakeBeta conv decoder; encoder =
Mimi-style SEANet + transformer + downsample + SplitRVQ (reused from our
Mimi implementation). Channels-last, fully jittable; chunked decode with
25-frame left context for long sequences.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....nn import Conv1d, ConvTranspose1d, Embedding, LayerNorm, Linear, Module, RMSNorm
from ....ops.attention import scaled_dot_product_attention
from ....ops.rope import apply_rope, rope_cos_sin
from .config import (
    Qwen3TTSTokenizerConfig,
    Qwen3TTSTokenizerDecoderConfig,
    Qwen3TTSTokenizerEncoderConfig,
)

__all__ = ["Qwen3TTSSpeechTokenizer"]


class CausalConv1d(Module):
    """Left-padded conv (reference speech_tokenizer.py:42); channels-last."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 dilation=1, groups=1):
        self.conv = Conv1d(in_channels, out_channels, kernel_size, stride=stride,
                           dilation=dilation, groups=groups)
        self.keff = (kernel_size - 1) * dilation + 1
        self.stride = stride

    def __call__(self, x):  # (B, T, C)
        pad = self.keff - self.stride
        L = x.shape[1]
        n_frames = (L - self.keff + pad) / self.stride + 1
        ideal = (math.ceil(n_frames) - 1) * self.stride + (self.keff - pad)
        extra = max(0, int(ideal - L))
        x = jnp.pad(x, [(0, 0), (pad, extra), (0, 0)])
        return self.conv(x)


class CausalTransposeConv1d(Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1):
        self.conv = ConvTranspose1d(in_channels, out_channels, kernel_size,
                                    stride=stride)
        self.trim_right = kernel_size - stride

    def __call__(self, x):
        y = self.conv(x)
        if self.trim_right > 0:
            y = y[:, : -self.trim_right]
        return y


class SnakeBeta(Module):
    def __init__(self, channels: int):
        self.alpha = jnp.zeros((channels,))
        self.beta = jnp.zeros((channels,))

    def __call__(self, x):  # (B, T, C)
        alpha = jnp.exp(self.alpha)
        beta = jnp.exp(self.beta)
        return x + (1.0 / (beta + 1e-9)) * jnp.sin(x * alpha) ** 2


class ConvNeXtBlock(Module):
    def __init__(self, dim: int):
        self.dwconv = CausalConv1d(dim, dim, 7, groups=dim)
        self.norm = LayerNorm(dim, eps=1e-6)
        self.pwconv1 = Linear(dim, 4 * dim)
        self.pwconv2 = Linear(4 * dim, dim)
        self.gamma = 1e-6 * jnp.ones((dim,))

    def __call__(self, x):
        r = x
        x = self.dwconv(x)
        x = self.pwconv2(jax.nn.gelu(self.pwconv1(self.norm(x)), approximate=False))
        return r + self.gamma * x


class LayerScale(Module):
    def __init__(self, channels: int, initial_scale: float = 0.01):
        self.scale = initial_scale * jnp.ones((channels,))

    def __call__(self, x):
        return self.scale * x


class DecoderAttention(Module):
    # post-load quantized row-stack: the 512×512 projections individually
    # sit below the Pallas GEMV size floor; their 1536×512 stack routes
    _FUSE_GROUPS = (("qkv_fused", ("q_proj", "k_proj", "v_proj")),)

    def __init__(self, cfg: Qwen3TTSTokenizerDecoderConfig):
        self.q_proj = Linear(cfg.hidden_size, cfg.num_attention_heads * cfg.head_dim,
                             bias=cfg.attention_bias)
        self.k_proj = Linear(cfg.hidden_size, cfg.num_key_value_heads * cfg.head_dim,
                             bias=cfg.attention_bias)
        self.v_proj = Linear(cfg.hidden_size, cfg.num_key_value_heads * cfg.head_dim,
                             bias=cfg.attention_bias)
        self.o_proj = Linear(cfg.num_attention_heads * cfg.head_dim, cfg.hidden_size,
                             bias=cfg.attention_bias)
        self.nh = cfg.num_attention_heads
        self.nkv = cfg.num_key_value_heads
        self.hd = cfg.head_dim
        self.rope_theta = cfg.rope_theta
        self.sliding_window = cfg.sliding_window

    def __call__(self, x, mask=None):
        B, T, _ = x.shape
        if hasattr(self, "qkv_fused"):
            q, k, v = self.qkv_fused(x)
        else:
            q, k, v = self.q_proj(x), self.k_proj(x), self.v_proj(x)
        q = jnp.swapaxes(q.reshape(B, T, self.nh, self.hd), 1, 2)
        k = jnp.swapaxes(k.reshape(B, T, self.nkv, self.hd), 1, 2)
        v = jnp.swapaxes(v.reshape(B, T, self.nkv, self.hd), 1, 2)
        cos, sin = rope_cos_sin(jnp.arange(T), self.hd, base=self.rope_theta)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        out = scaled_dot_product_attention(q, k, v, scale=self.hd**-0.5, mask=mask)
        return self.o_proj(jnp.swapaxes(out, 1, 2).reshape(B, T, -1))


class DecoderMLP(Module):
    _FUSE_GROUPS = (("gate_up_fused", ("gate_proj", "up_proj")),)

    def __init__(self, cfg):
        self.gate_proj = Linear(cfg.hidden_size, cfg.intermediate_size, bias=False)
        self.up_proj = Linear(cfg.hidden_size, cfg.intermediate_size, bias=False)
        self.down_proj = Linear(cfg.intermediate_size, cfg.hidden_size, bias=False)

    def __call__(self, x):
        if hasattr(self, "gate_up_fused"):
            from ....nn.quantized import fused_mlp_call

            y = fused_mlp_call(self.gate_up_fused, self.down_proj, x)
            if y is not None:
                return y
            g, u = self.gate_up_fused(x)
        else:
            g, u = self.gate_proj(x), self.up_proj(x)
        return self.down_proj(jax.nn.silu(g) * u)


class DecoderTransformerLayer(Module):
    def __init__(self, cfg):
        self.self_attn = DecoderAttention(cfg)
        self.mlp = DecoderMLP(cfg)
        self.input_layernorm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)
        self.self_attn_layer_scale = LayerScale(cfg.hidden_size,
                                                cfg.layer_scale_initial_scale)
        self.mlp_layer_scale = LayerScale(cfg.hidden_size,
                                          cfg.layer_scale_initial_scale)

    def __call__(self, x, mask=None):
        x = x + self.self_attn_layer_scale(self.self_attn(self.input_layernorm(x), mask))
        return x + self.mlp_layer_scale(self.mlp(self.post_attention_layernorm(x)))


class DecoderTransformer(Module):
    def __init__(self, cfg: Qwen3TTSTokenizerDecoderConfig):
        self.layers = [DecoderTransformerLayer(cfg) for _ in range(cfg.num_hidden_layers)]
        self.norm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)
        self.input_proj = Linear(cfg.latent_dim, cfg.hidden_size)
        self.output_proj = Linear(cfg.hidden_size, cfg.latent_dim)
        self.sliding_window = cfg.sliding_window

    def __call__(self, x):  # (B, T, latent)
        x = self.input_proj(x)
        T = x.shape[1]
        q = jnp.arange(T)[:, None]
        k = jnp.arange(T)[None, :]
        ok = (k <= q) & (q - k < self.sliding_window)
        mask = jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)[None, None]
        for layer in self.layers:
            x = layer(x, mask)
        return self.output_proj(self.norm(x))


class EuclideanCodebook(Module):
    def __init__(self, dim: int, codebook_size: int):
        self.embed = Embedding(codebook_size, dim)

    def decode(self, codes):
        return self.embed(codes)


class VectorQuantization(Module):
    def __init__(self, dim, codebook_size, codebook_dim=None):
        codebook_dim = codebook_dim or dim
        if codebook_dim != dim:
            self.project_out = Linear(codebook_dim, dim)
        self.codebook = EuclideanCodebook(codebook_dim, codebook_size)

    def decode(self, codes):  # (B, T) → (B, T, dim)
        q = self.codebook.decode(codes)
        if hasattr(self, "project_out"):
            q = self.project_out(q)
        return q


class ResidualVectorQuantization(Module):
    def __init__(self, num_quantizers, dim, codebook_size, codebook_dim=None):
        self.layers = [
            VectorQuantization(dim, codebook_size, codebook_dim)
            for _ in range(num_quantizers)
        ]

    def decode(self, codes):  # (B, nq, T) → (B, T, dim)
        q = None
        for i in range(codes.shape[1]):
            d = self.layers[i].decode(codes[:, i])
            q = d if q is None else q + d
        return q


class ResidualVectorQuantizer(Module):
    def __init__(self, dimension, n_q, bins, input_dimension=None,
                 output_dimension=None, force_projection=True):
        input_dimension = input_dimension or dimension
        output_dimension = output_dimension or dimension
        if input_dimension != dimension or force_projection:
            self.input_proj = Conv1d(input_dimension, dimension, 1, bias=False)
        if output_dimension != dimension or force_projection:
            self.output_proj = Conv1d(dimension, output_dimension, 1, bias=False)
        self.vq = ResidualVectorQuantization(n_q, dimension, bins)

    def decode(self, codes):  # (B, nq, T) → (B, T, out_dim)
        q = self.vq.decode(codes)
        if hasattr(self, "output_proj"):
            q = self.output_proj(q)
        return q


class SplitResidualVectorQuantizer(Module):
    def __init__(self, dimension, n_q, n_q_semantic, bins, input_dimension,
                 output_dimension):
        self.n_q_semantic = n_q_semantic
        self.rvq_first = ResidualVectorQuantizer(
            dimension, n_q_semantic, bins, input_dimension, output_dimension
        )
        self.rvq_rest = ResidualVectorQuantizer(
            dimension, n_q - n_q_semantic, bins, input_dimension, output_dimension
        )

    def decode(self, codes):
        q = self.rvq_first.decode(codes[:, : self.n_q_semantic])
        if codes.shape[1] > self.n_q_semantic:
            q = q + self.rvq_rest.decode(codes[:, self.n_q_semantic :])
        return q


class DecoderResidualUnit(Module):
    def __init__(self, dim: int, dilation: int = 1):
        self.act1 = SnakeBeta(dim)
        self.conv1 = CausalConv1d(dim, dim, 7, dilation=dilation)
        self.act2 = SnakeBeta(dim)
        self.conv2 = CausalConv1d(dim, dim, 1)

    def __call__(self, x):
        return x + self.conv2(self.act2(self.conv1(self.act1(x))))


class DecoderBlockUpsample(Module):
    def __init__(self, in_dim, out_dim, upsample_rate):
        self.conv = ConvTranspose1d(in_dim, out_dim, 2 * upsample_rate,
                                    stride=upsample_rate)
        self.trim_right = upsample_rate

    def __call__(self, x):
        y = self.conv(x)
        return y[:, : -self.trim_right] if self.trim_right > 0 else y


class DecoderBlock(Module):
    def __init__(self, cfg: Qwen3TTSTokenizerDecoderConfig, layer_idx: int):
        in_dim = cfg.decoder_dim // (2**layer_idx)
        out_dim = cfg.decoder_dim // (2 ** (layer_idx + 1))
        self.block = [
            SnakeBeta(in_dim),
            DecoderBlockUpsample(in_dim, out_dim, cfg.upsample_rates[layer_idx]),
            DecoderResidualUnit(out_dim, 1),
            DecoderResidualUnit(out_dim, 3),
            DecoderResidualUnit(out_dim, 9),
        ]

    def __call__(self, x):
        for l in self.block:
            x = l(x)
        return x


class DecoderInitialConv(Module):
    def __init__(self, latent_dim, decoder_dim, kernel_size=7):
        self.conv = Conv1d(latent_dim, decoder_dim, kernel_size)
        self.kernel_size = kernel_size

    def __call__(self, x):
        x = jnp.pad(x, [(0, 0), (self.kernel_size - 1, 0), (0, 0)])
        return self.conv(x)


class DecoderOutputSnake(Module):
    def __init__(self, channels):
        self.act = SnakeBeta(channels)

    def __call__(self, x):
        return self.act(x)


class DecoderOutputConv(Module):
    def __init__(self, channels, kernel_size=7):
        self.conv = Conv1d(channels, 1, kernel_size)
        self.kernel_size = kernel_size

    def __call__(self, x):
        x = jnp.pad(x, [(0, 0), (self.kernel_size - 1, 0), (0, 0)])
        return self.conv(x)


class Qwen3TTSSpeechTokenizerDecoder(Module):
    def __init__(self, cfg: Qwen3TTSTokenizerDecoderConfig):
        self.config = cfg
        self.total_upsample = int(
            np.prod(list(cfg.upsample_rates) + list(cfg.upsampling_ratios))
        )
        self.pre_transformer = DecoderTransformer(cfg)
        self.quantizer = SplitResidualVectorQuantizer(
            dimension=cfg.codebook_dim // 2, n_q=cfg.num_quantizers,
            n_q_semantic=cfg.num_semantic_quantizers, bins=cfg.codebook_size,
            input_dimension=cfg.codebook_dim, output_dimension=cfg.codebook_dim,
        )
        self.pre_conv = CausalConv1d(cfg.codebook_dim, cfg.latent_dim, 3)
        self.upsample = [
            [
                CausalTransposeConv1d(cfg.latent_dim, cfg.latent_dim, factor, factor),
                ConvNeXtBlock(cfg.latent_dim),
            ]
            for factor in cfg.upsampling_ratios
        ]
        output_dim = cfg.decoder_dim // (2 ** len(cfg.upsample_rates))
        self.decoder = [
            DecoderInitialConv(cfg.latent_dim, cfg.decoder_dim, 7),
            *[DecoderBlock(cfg, i) for i in range(len(cfg.upsample_rates))],
            DecoderOutputSnake(output_dim),
            DecoderOutputConv(output_dim, 7),
        ]

    def __call__(self, codes):  # (B, nq, T) → (B, samples)
        h = self.quantizer.decode(codes)  # (B, T, codebook_dim)
        h = self.pre_conv(h)
        h = self.pre_transformer(h)
        for up in self.upsample:
            for l in up:
                h = l(h)
        for l in self.decoder:
            h = l(h)
        return jnp.clip(h[..., 0], -1.0, 1.0)


class Qwen3TTSSpeechTokenizerEncoder(Module):
    """Mimi-architecture encoder for ICL reference codes."""

    def __init__(self, cfg: Qwen3TTSTokenizerEncoderConfig):
        from ....codec.models.mimi.mimi import (
            MimiConfig,
            ProjectedTransformer,
            SeanetConfig,
            SeanetEncoder,
            SplitResidualVectorQuantizer as MimiSplitRVQ,
            StreamableConv1d,
            TransformerConfig,
        )

        seanet = SeanetConfig(
            dimension=cfg.hidden_size, channels=cfg.audio_channels, causal=True,
            nfilters=cfg.num_filters, nresidual_layers=cfg.num_residual_layers,
            ratios=list(cfg.upsampling_ratios), ksize=cfg.kernel_size,
            residual_ksize=cfg.residual_kernel_size, last_ksize=cfg.last_kernel_size,
            dilation_base=cfg.dilation_growth_rate, pad_mode="constant",
            true_skip=not cfg.use_conv_shortcut, compress=cfg.compress,
        )
        self.encoder = SeanetEncoder(seanet)
        tcfg = TransformerConfig(
            d_model=cfg.hidden_size, num_heads=cfg.num_attention_heads,
            num_layers=cfg.num_hidden_layers, context=cfg.sliding_window,
            max_period=cfg.rope_theta, dim_feedforward=cfg.intermediate_size,
            layer_scale=cfg.layer_scale_initial_scale,
        )
        self.encoder_transformer = ProjectedTransformer(
            tcfg, input_dim=cfg.hidden_size, output_dims=[cfg.hidden_size]
        )
        encoder_frame_rate = cfg.sampling_rate / math.prod(cfg.upsampling_ratios)
        stride = int(encoder_frame_rate / cfg.frame_rate)
        self.downsample = StreamableConv1d(
            cfg.hidden_size, cfg.hidden_size, 2 * stride, stride, 1, 1, False,
            True, "edge",
        )
        self.quantizer = MimiSplitRVQ(
            dim=cfg.codebook_dim, input_dim=cfg.hidden_size,
            output_dim=cfg.hidden_size, nq=cfg.num_quantizers,
            bins=cfg.codebook_size,
        )
        self.valid_num_quantizers = 16

    def encode(self, audio):  # (B, 1, T) → (B, nq_valid, T')
        x = jnp.swapaxes(jnp.asarray(audio), 1, 2)
        h = self.encoder(x)
        outs, _ = self.encoder_transformer(h)
        h = self.downsample(outs[0])
        codes = self.quantizer.encode(h)
        return codes[:, : self.valid_num_quantizers]


class Qwen3TTSSpeechTokenizer(Module):
    def __init__(self, cfg: Qwen3TTSTokenizerConfig):
        self.decoder = Qwen3TTSSpeechTokenizerDecoder(cfg.decoder_config)
        if cfg.encoder_config is not None:
            self.encoder = Qwen3TTSSpeechTokenizerEncoder(cfg.encoder_config)

    @property
    def decode_upsample_rate(self) -> int:
        return self.decoder.total_upsample

    @staticmethod
    @jax.jit
    def _decode(model: "Qwen3TTSSpeechTokenizer", codes):
        return model.decoder(codes)

    def decode(self, codes) -> jax.Array:
        return self._decode(self, jnp.asarray(codes))

    def chunked_decode(self, codes, chunk_size: int = 300,
                       left_context_size: int = 25):
        codes = jnp.asarray(codes)
        wavs = []
        start = 0
        up = self.decoder.total_upsample
        while start < codes.shape[-1]:
            end = min(start + chunk_size, codes.shape[-1])
            ctx = left_context_size if start - left_context_size > 0 else start
            chunk = codes[..., start - ctx : end]
            wav = self.decode(chunk)
            wavs.append(np.asarray(jax.device_get(wav))[..., ctx * up :])
            start = end
        return np.concatenate(wavs, axis=-1)

    def encode(self, audio):
        return self.encoder.encode(audio)
