"""Spark-TTS: Qwen2.5 LLM over BiCodec semantic/global tokens.

TPU-native re-implementation of the reference
mlx_audio/tts/models/spark/ (spark.py, bicodec.py, audio_tokenizer.py,
modules/*). The LLM decode reuses the shared on-device while_loop
(lm/generate); BiCodec tokenize/detokenize are single jitted programs built
on the framework's Vocos backbone and DAC blocks.
"""

from __future__ import annotations

import math
import re
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Generator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....codec.models.descript.dac import ResidualUnit, Snake1d
from ....codec.models.vocos.vocos import VocosBackbone
from ....dsp import mel_filters, stft
from ....lm.generate import generate_tokens
from ....lm.transformer import CausalLM, LMConfig
from ....nn import layers as nn
from ....nn.module import Module
from ..base import GenerationResult, format_duration

__all__ = ["Model", "ModelConfig", "BiCodec", "FSQ", "ResidualFSQ",
           "FactorizedVectorQuantize", "SpeakerEncoder", "WaveGenerator"]

GENDER_MAP = {"female": 0, "male": 1}
# float control values → level names (reference spark.py:19-25)
PITCH_MAP = SPEED_MAP = {
    0.0: "very_low", 0.5: "low", 1.0: "moderate", 1.5: "high",
    2.0: "very_high",
}
LEVELS_MAP = {"very_low": 0, "low": 1, "moderate": 2, "high": 3,
              "very_high": 4}


# ---------------------------------------------------------------------------
# FSQ / residual FSQ (reference modules/finite_scalar_quantization.py,
# modules/residual_fsq.py)
# ---------------------------------------------------------------------------
class FSQ(Module):
    def __init__(self, levels: List[int]):
        self._levels = np.asarray(levels, np.int32)
        self._basis = np.concatenate(
            [[1], np.cumprod(self._levels[:-1])]).astype(np.int32)
        self.codebook_size = int(np.prod(self._levels))
        self.codebook_dim = len(levels)

    def _half_width(self):
        return jnp.asarray(self._levels // 2, jnp.float32)

    def quantize(self, z):
        levels = jnp.asarray(self._levels, jnp.float32)
        eps = 1e-3
        half_l = (levels - 1) * (1 + eps) / 2
        offset = jnp.where(levels % 2 == 0, 0.5, 0.0)
        shift = jnp.arctanh(offset / half_l)
        bounded = jnp.tanh(z + shift) * half_l - offset
        q = jnp.round(bounded)
        return q / self._half_width()

    def codes_to_indices(self, zhat):
        half = self._half_width()
        scaled = zhat * half + half
        return jnp.sum(scaled * jnp.asarray(self._basis, jnp.float32),
                       axis=-1).astype(jnp.int32)

    def indices_to_codes(self, indices):
        basis = jnp.asarray(self._basis, jnp.int32)
        levels = jnp.asarray(self._levels, jnp.int32)
        codes = (indices[..., None] // basis) % levels
        half = self._half_width()
        return (codes.astype(jnp.float32) - half) / half


class ResidualFSQ(Module):
    """reference modules/residual_fsq.py:26-309 (inference paths)."""

    def __init__(self, *, levels: List[int], num_quantizers: int,
                 dim: Optional[int] = None, **_):
        codebook_dim = len(levels)
        dim = dim or codebook_dim
        if codebook_dim != dim:
            self.project_in = nn.Linear(dim, codebook_dim)
            self.project_out = nn.Linear(codebook_dim, dim)
        self.layers = [FSQ(levels) for _ in range(num_quantizers)]
        self.num_quantizers = num_quantizers
        lv = np.asarray(levels, np.float32)
        self._scales = np.stack([(lv - 1) ** -i
                                 for i in range(num_quantizers)])
        self.codebook_size = self.layers[0].codebook_size

    def __call__(self, x):
        """x: (B, T, dim) → (quantized, indices (B, T, Q))."""
        if hasattr(self, "project_in"):
            x = self.project_in(x)
        residual = x
        out = jnp.zeros_like(x)
        indices = []
        for i, layer in enumerate(self.layers):
            scale = jnp.asarray(self._scales[i])
            q = layer.quantize(residual / scale) * scale
            indices.append(layer.codes_to_indices(q / scale))
            residual = residual - q
            out = out + q
        if hasattr(self, "project_out"):
            out = self.project_out(out)
        return out, jnp.stack(indices, axis=-1)

    def get_output_from_indices(self, indices):
        """indices (B, T, Q) → (B, T, dim)."""
        total = 0.0
        for i, layer in enumerate(self.layers):
            codes = layer.indices_to_codes(indices[..., i])
            total = total + codes * jnp.asarray(self._scales[i])
        if hasattr(self, "project_out"):
            total = self.project_out(total)
        return total


class FactorizedVectorQuantize(Module):
    """Semantic VQ with L2-normalized lookup
    (reference modules/residual.py:10-210). Channels-last (B, T, D)."""

    def __init__(self, input_dim: int, codebook_size: int,
                 codebook_dim: int, **_):
        self.input_dim = input_dim
        self.codebook_size = codebook_size
        if input_dim != codebook_dim:
            self.in_project = nn.Conv1d(input_dim, codebook_dim, 1)
            self.out_project = nn.Conv1d(codebook_dim, input_dim, 1)
        self.codebook = nn.Embedding(codebook_size, codebook_dim)

    def _norm(self, x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-12)

    def tokenize(self, z):
        z_e = self.in_project(z) if hasattr(self, "in_project") else z
        e = self._norm(z_e)
        cb = self._norm(self.codebook.weight)
        return jnp.argmax(e @ cb.T, axis=-1)

    def detokenize(self, indices):
        z_q = self.codebook.weight[indices]
        if hasattr(self, "out_project"):
            z_q = self.out_project(z_q)
        return z_q


# ---------------------------------------------------------------------------
# encoder/decoder/wave generator (reference modules/encoder_decoder/*)
# ---------------------------------------------------------------------------
class SamplingBlock(Module):
    """reference modules/blocks/sampler.py. (B, T, C) in/out."""

    def __init__(self, dim: int, groups: int = 1, upsample_scale: int = 1,
                 downsample_scale: int = 1):
        self.upsample_scale = upsample_scale
        self.downsample_scale = downsample_scale
        if upsample_scale > 1:
            self.de_conv_upsampler = nn.ConvTranspose1d(
                dim, dim, 2 * upsample_scale, stride=upsample_scale,
                padding=upsample_scale // 2 + upsample_scale % 2,
                groups=groups)
        if downsample_scale > 1:
            self.conv_downsampler = nn.Conv1d(
                dim, dim, 2 * downsample_scale, stride=downsample_scale,
                padding=downsample_scale // 2 + downsample_scale % 2,
                groups=groups)

    @staticmethod
    def _avgpool(x, k):
        B, T, C = x.shape
        n = T // k
        return x[:, : n * k].reshape(B, n, k, C).mean(axis=2)

    def __call__(self, x):
        if self.upsample_scale > 1:
            repeat = jnp.repeat(x, self.upsample_scale, axis=1)
            up = repeat + self.de_conv_upsampler(
                jax.nn.leaky_relu(x, 0.2))
        else:
            up = x
            repeat = x
        if self.downsample_scale > 1:
            conv = self.conv_downsampler(jax.nn.leaky_relu(up, 0.2))
            return (conv + self._avgpool(up, self.downsample_scale)
                    + self._avgpool(repeat, self.downsample_scale))
        # no downsample: conv_res + skip1 + skip2 collapse to up + 2·repeat
        return up + repeat + repeat


class FeatEncoder(Module):
    """reference modules/encoder_decoder/feat_encoder.py."""

    def __init__(self, input_channels: int, vocos_dim: int,
                 vocos_intermediate_dim: int, vocos_num_layers: int,
                 out_channels: int, sample_ratios: List[int] = (1, 1)):
        self.encoder = VocosBackbone(input_channels, vocos_dim,
                                     vocos_intermediate_dim,
                                     vocos_num_layers)
        self.downsample = [
            [SamplingBlock(vocos_dim, groups=vocos_dim,
                           downsample_scale=r),
             VocosBackbone(vocos_dim, vocos_dim, vocos_intermediate_dim, 2)]
            for r in sample_ratios
        ]
        self.project = nn.Linear(vocos_dim, out_channels)

    def __call__(self, x):
        """(B, T, input_channels) → (B, T', out_channels)."""
        x = self.encoder(x)
        for block, backbone in self.downsample:
            x = backbone(block(x))
        return self.project(x)


class FeatDecoder(Module):
    """reference modules/encoder_decoder/feat_decoder.py."""

    def __init__(self, input_channels: int, vocos_dim: int,
                 vocos_intermediate_dim: int, vocos_num_layers: int,
                 out_channels: int, condition_dim: Optional[int] = None,
                 sample_ratios: List[int] = (1, 1),
                 use_tanh_at_final: bool = False):
        self.linear_pre = nn.Linear(input_channels, vocos_dim)
        # NOTE: the up-sampling list is named `downsample` to match the
        # reference checkpoint tree (reference feat_decoder.py:66 names
        # its upsample path "downsample")
        self.downsample = [
            [SamplingBlock(vocos_dim, groups=vocos_dim, upsample_scale=r),
             VocosBackbone(vocos_dim, vocos_dim, vocos_intermediate_dim, 2)]
            for r in sample_ratios
        ]
        # continuous AdaLayerNorm conditioning on the d_vector: scale/shift
        # Linear(condition_dim → dim) inside every norm of the backbone
        # (reference feat_decoder.py:68-74 + vocos.py:198-214)
        self.vocos_backbone = VocosBackbone(
            vocos_dim, vocos_dim, vocos_intermediate_dim, vocos_num_layers,
            adanorm_num_embeddings=condition_dim)
        self.linear = nn.Linear(vocos_dim, out_channels)
        self.use_tanh_at_final = use_tanh_at_final

    def __call__(self, x, c=None):
        """(B, T, input_channels), cond (B, D) → (B, T', out_channels)."""
        x = self.linear_pre(x)
        for block, backbone in self.downsample:
            x = backbone(block(x))
        x = self.vocos_backbone(x, bandwidth_id=c)
        x = self.linear(x)
        return jnp.tanh(x) if self.use_tanh_at_final else x


class WaveGenerator(Module):
    """DAC-style decoder (reference modules/encoder_decoder/
    wave_generator.py). (B, T, C) → (B, T', 1)."""

    def __init__(self, input_channel: int, channels: int, rates: List[int],
                 kernel_sizes: List[int], d_out: int = 1):
        self.conv_in = nn.Conv1d(input_channel, channels, 7, padding=3)
        blocks = []
        for i, (k, s) in enumerate(zip(kernel_sizes, rates)):
            in_d = channels // 2**i
            out_d = channels // 2 ** (i + 1)
            blocks.append([
                Snake1d(in_d),
                nn.ConvTranspose1d(in_d, out_d, k, stride=s,
                                   padding=(k - s) // 2),
                ResidualUnit(out_d, dilation=1),
                ResidualUnit(out_d, dilation=3),
                ResidualUnit(out_d, dilation=9),
            ])
        self.blocks = blocks
        final = channels // 2 ** len(rates)
        self.snake_out = Snake1d(final)
        self.conv_out = nn.Conv1d(final, d_out, 7, padding=3)

    def __call__(self, x):
        x = self.conv_in(x)
        for block in self.blocks:
            for layer in block:
                x = layer(x)
        return jnp.tanh(self.conv_out(self.snake_out(x)))


# ---------------------------------------------------------------------------
# speaker encoder (reference modules/speaker/*)
# ---------------------------------------------------------------------------
class Conv1dReluBn(Module):
    """conv → relu → batchnorm (reference modules/speaker/ecapa_tdnn.py:90)."""

    def __init__(self, in_ch, out_ch, kernel_size=1, stride=1, padding=0,
                 dilation=1):
        self.conv = nn.Conv1d(in_ch, out_ch, kernel_size, stride=stride,
                              padding=padding, dilation=dilation)
        self.bn = nn.BatchNorm(out_ch)

    def __call__(self, x):  # (B, T, C)
        return self.bn(jax.nn.relu(self.conv(x)))


class Res2Conv1dReluBn(Module):
    """Res2Net grouped conv (reference ecapa_tdnn.py:27-82), channels-last."""

    def __init__(self, channels, kernel_size=1, stride=1, padding=0,
                 dilation=1, scale=4):
        assert channels % scale == 0
        self.scale = scale
        self.width = channels // scale
        self.nums = scale if scale == 1 else scale - 1
        self.convs = [nn.Conv1d(self.width, self.width, kernel_size,
                                stride=stride, padding=padding,
                                dilation=dilation)
                      for _ in range(self.nums)]
        self.bns = [nn.BatchNorm(self.width) for _ in range(self.nums)]

    def __call__(self, x):  # (B, T, C)
        spx = jnp.split(x, self.scale, axis=-1)
        out = []
        sp = spx[0]
        for i, (conv, bn) in enumerate(zip(self.convs, self.bns)):
            if i >= 1:
                sp = sp + spx[i]
            sp = bn(jax.nn.relu(conv(sp)))
            out.append(sp)
        if self.scale != 1:
            out.append(spx[self.nums])
        return jnp.concatenate(out, axis=-1)


class SE_Connect(Module):
    """Squeeze-excite gate (reference ecapa_tdnn.py:119-135)."""

    def __init__(self, channels, se_bottleneck_dim=128):
        self.linear1 = nn.Linear(channels, se_bottleneck_dim)
        self.linear2 = nn.Linear(se_bottleneck_dim, channels)

    def __call__(self, x):  # (B, T, C)
        s = jax.nn.relu(self.linear1(x.mean(axis=1)))
        s = jax.nn.sigmoid(self.linear2(s))
        return x * s[:, None, :]


class SE_Res2Block(Module):
    """reference ecapa_tdnn.py:138-155."""

    def __init__(self, channels, kernel_size, stride, padding, dilation,
                 scale):
        self.se_res2block = [
            Conv1dReluBn(channels, channels, 1),
            Res2Conv1dReluBn(channels, kernel_size, stride, padding,
                             dilation, scale=scale),
            Conv1dReluBn(channels, channels, 1),
            SE_Connect(channels),
        ]

    def __call__(self, x):
        res = x
        for m in self.se_res2block:
            x = m(x)
        return x + res


class ASTP(Module):
    """Attentive statistics pooling (reference pooling_layers.py:90-148)."""

    def __init__(self, in_dim, bottleneck_dim=128):
        self.linear1 = nn.Conv1d(in_dim, bottleneck_dim, 1)
        self.linear2 = nn.Conv1d(bottleneck_dim, in_dim, 1)

    def __call__(self, x):  # (B, T, C)
        alpha = jnp.tanh(self.linear1(x))
        alpha = jax.nn.softmax(
            self.linear2(alpha).astype(jnp.float32), axis=1).astype(x.dtype)
        mean = jnp.sum(alpha * x, axis=1)
        var = jnp.sum(alpha * x**2, axis=1) - mean**2
        std = jnp.sqrt(jnp.clip(var.astype(jnp.float32), 1e-7, None))
        return jnp.concatenate([mean, std.astype(x.dtype)], axis=-1)


class ECAPA_TDNN_GLOB(Module):
    """Checkpoint-faithful ECAPA-TDNN (reference ecapa_tdnn.py:158-283,
    ECAPA_TDNN_GLOB_c512 = channels=512). Returns (x_vector, latent),
    latent = relu(conv(cat(layer2..4))) of width channels*3 — the context
    the perceiver resampler attends over."""

    def __init__(self, feat_dim: int = 100, embed_dim: int = 512,
                 channels: int = 512, res2_scale: int = 8):
        self.layer1 = Conv1dReluBn(feat_dim, channels, 5, padding=2)
        self.layer2 = SE_Res2Block(channels, 3, 1, 2, 2, res2_scale)
        self.layer3 = SE_Res2Block(channels, 3, 1, 3, 3, res2_scale)
        self.layer4 = SE_Res2Block(channels, 3, 1, 4, 4, res2_scale)
        cat = channels * 3
        self.conv = nn.Conv1d(cat, cat, 1)
        self.pool = ASTP(cat)
        self.bn = nn.BatchNorm(cat * 2)
        self.linear = nn.Linear(cat * 2, embed_dim)

    def __call__(self, mels, return_latent: bool = False):
        """mels: (B, T, feat_dim)."""
        x1 = self.layer1(mels)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x4 = self.layer4(x3)
        cat = jnp.concatenate([x2, x3, x4], axis=-1)  # (B, T, 3C)
        latent = jax.nn.relu(self.conv(cat))
        x_vec = self.linear(self.bn(self.pool(latent)))
        if return_latent:
            return x_vec, latent
        return x_vec


class _PerceiverAttn(Module):
    def __init__(self, dim, dim_head=64, heads=8):
        inner = dim_head * heads
        self.heads = heads
        self.dim_head = dim_head
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(dim, inner * 2, bias=False)
        self.to_out = nn.Linear(inner, dim, bias=False)

    def __call__(self, latents, context):
        B, Tq, _ = latents.shape
        # queries prepended to the context (reference
        # perceiver_encoder.py:230-232, cross_attn_include_queries=True)
        kv_in = jnp.concatenate([latents, context], axis=1)
        q = self.to_q(latents).reshape(B, Tq, self.heads, self.dim_head)
        kv = self.to_kv(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        Tk = kv_in.shape[1]
        k = k.reshape(B, Tk, self.heads, self.dim_head)
        v = v.reshape(B, Tk, self.heads, self.dim_head)
        q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
        scores = q @ k.transpose(0, 1, 3, 2) * self.dim_head**-0.5
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            latents.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, Tq, -1)
        return self.to_out(out)


class PerceiverResampler(Module):
    """reference modules/speaker/perceiver_encoder.py:255-307."""

    def __init__(self, *, dim, depth=2, dim_context=None, num_latents=32,
                 dim_head=64, heads=8, ff_mult=4):
        dim_context = dim_context or dim
        if dim_context != dim:
            self.proj_context = nn.Linear(dim_context, dim)
        self.latents = jnp.zeros((num_latents, dim))
        # FF is a bare [Linear, GEGLU, Linear] with inner = dim*mult*2/3
        # (reference perceiver_encoder.py:175-197) — checkpoint keys are
        # layers.N.1.{0,2}.{weight,bias}
        inner = int(dim * ff_mult * 2 / 3)
        self.layers = [
            [_PerceiverAttn(dim, dim_head, heads),
             [nn.Linear(dim, inner * 2), _GEGLU(), nn.Linear(inner, dim)]]
            for _ in range(depth)
        ]
        self.norm = nn.RMSNorm(dim)

    def __call__(self, x):
        B = x.shape[0]
        if hasattr(self, "proj_context"):
            x = self.proj_context(x)
        latents = jnp.broadcast_to(self.latents, (B,) + self.latents.shape)
        for attn, ff in self.layers:
            latents = attn(latents, x) + latents
            h = latents
            for mod in ff:
                h = mod(h)
            latents = latents + h
        return self.norm(latents)


class _GEGLU(Module):
    def __call__(self, x):
        a, gate = jnp.split(x, 2, axis=-1)
        return a * jax.nn.gelu(gate)


class SpeakerEncoder(Module):
    """reference modules/speaker/speaker_encoder.py:35-155."""

    def __init__(self, input_dim: int = 100, out_dim: int = 512,
                 latent_dim: int = 128, token_num: int = 32,
                 fsq_levels: Optional[List[int]] = None,
                 fsq_num_quantizers: int = 1, ecapa_channels: int = 512):
        fsq_levels = fsq_levels or [4, 4, 4, 4, 4, 4]
        self.speaker_encoder = ECAPA_TDNN_GLOB(input_dim, out_dim,
                                               ecapa_channels)
        self.perceiver_sampler = PerceiverResampler(
            dim=latent_dim, dim_context=ecapa_channels * 3,
            num_latents=token_num)
        self.quantizer = ResidualFSQ(levels=fsq_levels,
                                     num_quantizers=fsq_num_quantizers,
                                     dim=latent_dim)
        self.project = nn.Linear(latent_dim * token_num, out_dim)

    def tokenize(self, mels):
        """(B, T, n_mels) → global token indices (B, tokens, Q)."""
        _, feats = self.speaker_encoder(mels, True)
        x = self.perceiver_sampler(feats)
        _, indices = self.quantizer(x)
        return indices

    def detokenize(self, indices):
        zq = self.quantizer.get_output_from_indices(indices)
        return self.project(zq.reshape(zq.shape[0], -1))


# ---------------------------------------------------------------------------
# BiCodec + Model (reference bicodec.py, spark.py, audio_tokenizer.py)
# ---------------------------------------------------------------------------
def bicodec_mel(audio, sample_rate=16000, n_fft=1024, hop_length=320,
                num_mels=128, fmin=10, win_length=None, **_):
    spec = stft(jnp.asarray(audio, jnp.float32), n_fft=n_fft,
                hop_length=hop_length, win_length=win_length or n_fft,
                window="hann")
    mag = jnp.abs(spec)
    filters = mel_filters(sample_rate, n_fft, num_mels, f_min=fmin,
                          norm="slaney", mel_scale="slaney")
    return jnp.log(jnp.maximum(mag @ filters.T, 1e-5))


class BiCodec(Module):
    """reference bicodec.py:53-267."""

    def __init__(self, encoder, decoder, quantizer, speaker_encoder, prenet,
                 postnet, mel_params: Optional[dict] = None,
                 ref_clip_params: Optional[dict] = None):
        self.encoder = encoder
        self.decoder = decoder
        self.quantizer = quantizer
        self.speaker_encoder = speaker_encoder
        self.prenet = prenet
        self.postnet = postnet
        self.mel_params = mel_params or {}
        # sample_rate / ref_segment_duration / latent_hop_length from the
        # checkpoint's tokenizer config (reference audio_tokenizer.py:40-53)
        self.ref_clip_params = ref_clip_params or {}

    def get_ref_clip(self, wav: np.ndarray) -> np.ndarray:
        """Fixed-duration speaker-reference clip: `ref_segment_duration`
        seconds rounded down to a whole number of latent hops, tiling the
        waveform when it is shorter (reference audio_tokenizer.py:40-53)."""
        p = self.ref_clip_params
        sr = int(p.get("sample_rate", 16000))
        dur = float(p.get("ref_segment_duration", 6.0))
        hop = int(p.get("latent_hop_length", 320))
        ref_len = int(sr * dur) // hop * hop
        wav = np.asarray(wav).reshape(-1)
        if ref_len > wav.shape[0]:
            wav = np.tile(wav, ref_len // wav.shape[0] + 1)
        return wav[:ref_len]

    def tokenize(self, feat, ref_wav):
        """feat (B, T, D) wav2vec-style features; ref_wav (B, T_ref)."""
        mel = bicodec_mel(ref_wav, **self.mel_params)
        z = self.encoder(feat)
        semantic = self.quantizer.tokenize(z)
        global_tokens = self.speaker_encoder.tokenize(mel)
        return semantic, global_tokens

    def detokenize(self, semantic_tokens, global_tokens):
        """semantic (B, T), global (B, tokens, Q) → wav (B, T_wav)."""
        z_q = self.quantizer.detokenize(semantic_tokens)
        d_vector = self.speaker_encoder.detokenize(global_tokens)
        x = self.prenet(z_q, d_vector)
        x = x + d_vector[:, None, :]
        return self.decoder(x)[..., 0]

    def sanitize(self, weights: dict) -> dict:
        """Map the published BiCodec checkpoint layout (the reference's
        module tree, bicodec.py:92-135 + descript WN layers) onto this
        tree: fold weight-norm g/v pairs, strip nn.Sequential `.layers.N`
        wrappers, remap the WaveGenerator's flat `model.N` list onto
        conv_in/blocks/snake_out/conv_out, and fix channel layouts."""
        n_rates = len(self.decoder.blocks)

        def fold_wn(g, v):
            g = np.asarray(g, np.float32)
            v = np.asarray(v, np.float32)
            # normalize_weight axes are recoverable from g's shape: the
            # single non-1 axis is the kept dim (conv: 0, conv-transpose: 2)
            kept = [i for i, s in enumerate(g.shape) if s != 1]
            axes = tuple(i for i in range(v.ndim)
                         if not kept or i != kept[0])
            norm = np.sqrt((v * v).sum(axis=axes, keepdims=True))
            return g * v / np.maximum(norm, 1e-12)

        merged = {}
        for k, v in weights.items():
            if k.endswith("weight_g"):
                v_key = k[: -len("weight_g")] + "weight_v"
                if v_key in weights:
                    merged[k[: -len("weight_g")] + "weight"] = fold_wn(
                        v, weights[v_key])
                    continue
            if k.endswith("weight_v") and (
                    k[: -len("weight_v")] + "weight_g") in weights:
                continue
            merged[k] = v

        out = {}
        for k, v in merged.items():
            if ("num_batches_tracked" in k or "_implicit_codebook" in k
                    or k.split(".")[-1] in ("_levels", "_basis", "_scales")):
                continue  # FSQ geometry is derived from the config
            # Sequential(LeakyReLU, conv) wrappers in SamplingBlock
            k = re.sub(r"(conv_downsampler|de_conv_upsampler)\.layers\.1\.",
                       r"\1.", k)
            # WaveGenerator flat list → named attributes
            m = re.match(r"^decoder\.model\.(\d+)\.(.+)$", k)
            if m:
                idx, rest = int(m.group(1)), m.group(2)
                rest = rest.replace("block.layers.", "block.")
                if idx == 0:
                    k = f"decoder.conv_in.{rest}"
                elif idx <= n_rates:
                    # DecoderBlock.block Sequential → our per-block list
                    rest = rest[len("block."):] if rest.startswith(
                        "block.") else rest
                    k = f"decoder.blocks.{idx - 1}.{rest}"
                elif idx == n_rates + 1:
                    k = f"decoder.snake_out.{rest}"
                else:
                    k = f"decoder.conv_out.{rest}"
            # ResidualUnit.block Sequential → plain list
            k = k.replace(".block.layers.", ".block.")
            # RMSNorm parameter naming
            k = re.sub(r"\.norm\.gamma$", ".norm.weight", k)
            v = np.asarray(v)
            # Snake alpha: channels-first (1, C, 1) → channels-last
            if k.endswith(".alpha") and v.ndim == 3 and v.shape[1] > v.shape[2]:
                v = v.transpose(0, 2, 1)
            # torch-layout leftovers the reference also fixes up
            # (feat_encoder.py:97-114)
            if "dwconv.weight" in k and v.ndim == 3 and v.shape[1] < v.shape[2]:
                v = v.transpose(0, 2, 1)
            if k.endswith("embed.weight") and v.ndim == 3 and \
                    v.shape[1] > v.shape[2]:
                v = v.transpose(0, 2, 1)
            out[k] = v
        return out


class SparkWav2VecFeatures:
    """Wav2Vec2 feature extractor for BiCodec semantic tokens: runs the
    xlsr-53 encoder shipped inside the Spark checkpoint and mixes hidden
    states (11 + 14 + 16)/3 (reference audio_tokenizer.py:74-88)."""

    def __init__(self, model_dir):
        import json as _json

        from ....nn.module import load_weights as assign
        from ....stt.models.wav2vec.wav2vec import (Model as W2VModel,
                                                    ModelConfig as W2VConfig)
        from ....utils import load_weight_files

        model_dir = Path(model_dir)
        cfg = _json.loads((model_dir / "config.json").read_text())
        cfg["vocab_size"] = 0  # encoder only, no CTC head
        model = W2VModel(W2VConfig.from_dict(cfg))
        weights = model.sanitize(load_weight_files(model_dir))
        weights = {k: v for k, v in weights.items()
                   if not k.startswith("lm_head")}
        self.model = assign(model, weights, strict=False).eval()

    def __call__(self, wavs) -> jnp.ndarray:
        """(B, T) float waveform → (B, T', 1024) mixed hidden states."""
        x = jnp.asarray(wavs, jnp.float32)
        # zero-mean/unit-var per utterance (HF Wav2Vec2FeatureExtractor
        # do_normalize=True default used by the reference processor)
        x = (x - x.mean(axis=-1, keepdims=True)) / (
            x.std(axis=-1, keepdims=True) + 1e-7)
        hs = self.model.wav2vec2.hidden_states(x)
        return (hs[11] + hs[14] + hs[16]) / 3


def load_bicodec(model_dir) -> BiCodec:
    """Build + load a BiCodec from a checkpoint subdir (`<repo>/BiCodec`
    with config.yaml + model.safetensors), mirroring the reference
    BiCodec.load_from_checkpoint (bicodec.py:92-135)."""
    import inspect

    import yaml

    from ....nn.module import load_weights as assign
    from ....utils import load_weight_files

    model_dir = Path(model_dir)
    raw = yaml.safe_load((model_dir / "config.yaml").read_text())
    cfg = raw.get("audio_tokenizer", raw)

    def build(cls, kw):
        params = inspect.signature(cls.__init__).parameters
        if any(p.kind == inspect.Parameter.VAR_KEYWORD
               for p in params.values()):
            return cls(**kw)
        return cls(**{k: v for k, v in kw.items() if k in params})

    mel = cfg.get("mel_params", {})
    mel_params = dict(
        sample_rate=mel.get("sample_rate", 16000),
        n_fft=mel.get("n_fft", 1024),
        hop_length=mel.get("hop_length", 320),
        win_length=mel.get("win_length"),
        num_mels=mel.get("num_mels", 128),
        fmin=mel.get("mel_fmin", 10),
    )
    bc = BiCodec(
        encoder=build(FeatEncoder, cfg["encoder"]),
        decoder=build(WaveGenerator, cfg["decoder"]),
        quantizer=build(FactorizedVectorQuantize, cfg["quantizer"]),
        speaker_encoder=build(SpeakerEncoder, cfg["speaker_encoder"]),
        prenet=build(FeatDecoder, cfg["prenet"]),
        postnet=build(FeatDecoder, cfg["postnet"]),
        mel_params=mel_params,
        ref_clip_params={
            k: raw[k]
            for k in ("sample_rate", "ref_segment_duration",
                      "latent_hop_length", "volume_normalize")
            if k in raw
        },
    )
    weights = bc.sanitize(load_weight_files(model_dir))
    return assign(bc, weights, strict=False).eval()


@dataclass
class ModelConfig:
    model_type: str = "spark"
    sample_rate: int = 16000
    llm: dict = field(default_factory=dict)
    highpass_cutoff_freq: int = 40

    @classmethod
    def from_dict(cls, d):
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


class Model(Module):
    """reference spark.py:55-392."""

    _RUNTIME: dict = {}

    def __init__(self, config: Any = None):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config or ModelConfig()
        self.sample_rate = self.config.sample_rate
        llm = self.config.llm or {}
        self.llm = CausalLM(LMConfig(
            model_type="qwen2",
            vocab_size=llm.get("vocab_size", 166000),
            hidden_size=llm.get("hidden_size", 896),
            intermediate_size=llm.get("intermediate_size", 4864),
            num_hidden_layers=llm.get("num_hidden_layers", 24),
            num_attention_heads=llm.get("num_attention_heads", 14),
            num_key_value_heads=llm.get("num_key_value_heads", 2),
            rope_theta=llm.get("rope_theta", 1000000.0),
            attention_bias=True,
            tie_word_embeddings=llm.get("tie_word_embeddings", True)))

    def set_runtime(self, tokenizer=None, bicodec=None,
                    feature_extractor=None):
        rt = Model._RUNTIME.setdefault(id(self), {})
        if tokenizer is not None:
            rt["tokenizer"] = tokenizer
        if bicodec is not None:
            rt["bicodec"] = bicodec
        if feature_extractor is not None:
            rt["feature_extractor"] = feature_extractor

    def _resolve_runtime(self) -> dict:
        """Wire tokenizer / BiCodec / wav2vec2 features from the checkpoint
        dir when set_runtime() wasn't called (reference spark.py:73-88 +
        audio_tokenizer.py:29-38 do this eagerly at load)."""
        rt = Model._RUNTIME.setdefault(id(self), {})
        mp = getattr(self.config, "model_path", None)
        if mp:
            mp = Path(mp)
            if "tokenizer" not in rt:
                from ....utils import load_hf_tokenizer

                try:
                    rt["tokenizer"] = load_hf_tokenizer(mp)
                except Exception:
                    pass
            if "bicodec" not in rt and (mp / "BiCodec").exists():
                rt["bicodec"] = load_bicodec(mp / "BiCodec")
            w2v = mp / "wav2vec2-large-xlsr-53"
            if "feature_extractor" not in rt and w2v.exists():
                rt["feature_extractor"] = SparkWav2VecFeatures(w2v)
        return rt

    def make_batcher(self, **kwargs):
        """Serving batcher: Spark's AR stage is a plain token-prompt qwen2
        LM (`self.llm`), so concurrent requests' semantic-token decodes ride
        continuous (slot-based) batching; the BiCodec detokenize stays
        per-request."""
        from ....serving import LMContinuousBatcher

        return LMContinuousBatcher(self, lm=self.llm, **kwargs)

    def process_prompt_control(self, text: str, gender: str = "female",
                               pitch: str = "moderate",
                               speed: str = "moderate") -> str:
        """Voice-creation prompt (reference spark.py:171-218)."""
        attrs = (f"<|gender_{GENDER_MAP[gender]}|>"
                 f"<|pitch_label_{LEVELS_MAP[pitch]}|>"
                 f"<|speed_label_{LEVELS_MAP[speed]}|>")
        return ("<|task_controllable_tts|><|start_content|>" + text
                + "<|end_content|><|start_style_label|>" + attrs
                + "<|end_style_label|>")

    def process_prompt(self, text: str, global_token_ids: np.ndarray,
                       semantic_token_ids: Optional[np.ndarray] = None,
                       ref_text: Optional[str] = None) -> str:
        """Voice-cloning prompt (reference spark.py:116-170)."""
        g = "".join(f"<|bicodec_global_{int(i)}|>"
                    for i in np.asarray(global_token_ids).reshape(-1))
        if ref_text is not None and semantic_token_ids is not None:
            s = "".join(f"<|bicodec_semantic_{int(i)}|>"
                        for i in np.asarray(semantic_token_ids).reshape(-1))
            return ("<|task_tts|><|start_content|>" + ref_text + text
                    + "<|end_content|><|start_global_token|>" + g
                    + "<|end_global_token|><|start_semantic_token|>" + s)
        return ("<|task_tts|><|start_content|>" + text
                + "<|end_content|><|start_global_token|>" + g
                + "<|end_global_token|>")

    def generate(self, text: str, ref_audio=None, ref_text=None,
                 gender: Optional[str] = "male", pitch=1.0,
                 speed=1.0, max_tokens: int = 3000,
                 temperature: float = 0.8, top_k: int = 50,
                 top_p: float = 0.95, split_pattern: str = "\n",
                 verbose: bool = False, seed: int = 0, **kwargs
                 ) -> Generator[GenerationResult, None, None]:
        # reference spark.py:218-320: float pitch/speed map to level
        # tokens; a reference audio switches to voice-clone mode; text is
        # split on split_pattern with one yielded segment per split
        def _level(v, table):
            if isinstance(v, str):
                return v
            # snap continuous values (OpenAI speech API allows 0.25-4.0)
            # to the nearest control level
            return table[min(table, key=lambda k: abs(k - float(v)))]

        pitch = _level(pitch, PITCH_MAP)
        speed = _level(speed, SPEED_MAP)
        if ref_audio is not None:
            gender = None
        rt = self._resolve_runtime()
        tokenizer = rt.get("tokenizer")
        bicodec = rt.get("bicodec")
        if tokenizer is None or bicodec is None:
            raise RuntimeError(
                "Spark runtime (tokenizer/bicodec) not set — call "
                "set_runtime(...) or load from a full checkpoint dir "
                "(with LLM tokenizer files + BiCodec/ subdir) via "
                "load_model()")

        ref_global = None
        ref_semantic = None
        if gender is None:
            if ref_audio is None:
                raise ValueError("Provide ref_audio or gender controls")
            fe = rt.get("feature_extractor")
            clip_params = getattr(bicodec, "ref_clip_params", {}) or {}
            if isinstance(ref_audio, (str, Path)):
                # reference audio_tokenizer.py:55-68 loads paths with the
                # checkpoint's volume_normalize setting
                from ....utils import load_audio as _load_audio

                ref_audio = _load_audio(
                    ref_audio,
                    sample_rate=int(clip_params.get("sample_rate", 16000)),
                    volume_normalize=bool(
                        clip_params.get("volume_normalize", False)),
                )
            wav = np.asarray(ref_audio, np.float32).reshape(1, -1)
            # speaker/global tokens use a fixed-duration ref clip
            # (reference audio_tokenizer.py:70); semantic tokens use the
            # full waveform's wav2vec features
            ref_wav = bicodec.get_ref_clip(wav)[None]
            feat = (fe(wav) if fe is not None
                    else jnp.zeros((1, max(1, wav.shape[1] // 320), 1024)))
            ref_semantic, ref_global = bicodec.tokenize(
                jnp.asarray(feat), jnp.asarray(ref_wav))

        splits = [s for s in text.split(split_pattern) if s.strip()] or [text]
        for segment_idx, text_split in enumerate(splits):
            start = time.perf_counter()
            global_token_ids = ref_global
            if gender is not None:
                prompt = self.process_prompt_control(text_split, gender,
                                                     pitch, speed)
            else:
                prompt = self.process_prompt(
                    text_split, np.asarray(ref_global),
                    np.asarray(ref_semantic) if ref_text else None, ref_text)

            ids = np.asarray(tokenizer.encode(prompt), np.int64).reshape(-1)
            eos_ids = ((tokenizer.eos_token_id,)
                       if hasattr(tokenizer, "eos_token_id") else ())
            # Under a running server a ContinuousBatcher may be installed:
            # concurrent requests' token streams then decode in lock-step.
            from ....serving import get_infer_hook

            hook = get_infer_hook(self)
            if hook is not None:
                out_list = hook.submit(
                    [int(t) for t in ids], max_tokens=max_tokens,
                    temp=temperature, top_k=top_k, top_p=top_p,
                    repetition_penalty=kwargs.get("repetition_penalty", 1.3),
                    repetition_context_size=kwargs.get(
                        "repetition_context_size", 20),
                    eos_ids=eos_ids, seed=seed).result()
                out_ids = np.asarray([out_list], np.int32)
            else:
                out_ids, _ = generate_tokens(
                    self.llm, jnp.asarray(ids, jnp.int32),
                    max_tokens=max_tokens,
                    temp=temperature, top_k=top_k, top_p=top_p,
                    repetition_penalty=kwargs.get("repetition_penalty", 1.3),
                    repetition_context_size=kwargs.get(
                        "repetition_context_size", 20),
                    eos_token_ids=eos_ids, seed=seed)
            text_out = tokenizer.decode(list(np.asarray(out_ids).reshape(-1)))

            semantic_ids = [int(m) for m in
                            re.findall(r"bicodec_semantic_(\d+)", text_out)]
            if gender is not None:
                g_ids = [int(m) for m in
                         re.findall(r"bicodec_global_(\d+)", text_out)]
                global_token_ids = np.asarray(g_ids)[None, :, None]
            if not semantic_ids:
                raise RuntimeError("LLM produced no semantic tokens")
            gt = np.asarray(global_token_ids)
            if gt.ndim == 2:
                gt = gt[:, :, None]
            wav = bicodec.detokenize(jnp.asarray([semantic_ids], jnp.int32),
                                     jnp.asarray(gt, jnp.int32))
            audio = np.asarray(wav).reshape(-1)
            elapsed = time.perf_counter() - start
            dur = len(audio) / self.sample_rate
            if verbose:
                print(f"[spark] segment {segment_idx}: "
                      f"{len(semantic_ids)} tokens, {dur:.2f}s audio")
            yield GenerationResult(
                audio=audio, samples=len(audio), sample_rate=self.sample_rate,
                segment_idx=segment_idx, token_count=len(semantic_ids),
                audio_duration=format_duration(dur),
                real_time_factor=round(elapsed / max(dur, 1e-9), 2),
                prompt={"tokens": int(ids.shape[0])}, audio_samples={},
                processing_time_seconds=elapsed, peak_memory_usage=0.0)
