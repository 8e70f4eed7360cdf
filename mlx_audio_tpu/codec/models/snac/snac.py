"""SNAC — multi-scale residual VQ codec with windowed local attention.

Behavioral spec: reference codec/models/snac/ (snac.py, layers.py, vq.py,
attention.py). Channels-last; weight-norm folded at load; the per-codebook
temporal pooling (vq stride) is a reshape-mean and the stride upsampling a
`jnp.repeat` (the reference loops with strided assignment); LocalMHA windows
are one batched attention over (B·W, n, d).
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....nn import Conv1d, ConvTranspose1d, Embedding, LayerNorm, Linear, Module
from ....nn.activations import snake
from ..base import fold_weight_norm_pairs

__all__ = ["SNAC"]


class Snake1d(Module):
    def __init__(self, channels: int):
        self.alpha = jnp.ones((1, channels, 1))  # checkpoint shape (1, C, 1)

    def __call__(self, x):  # x: (B, T, C)
        return snake(x, jnp.swapaxes(self.alpha, 1, 2))


class ResidualUnit(Module):
    def __init__(self, dim=16, dilation=1, kernel=7, groups=1):
        pad = ((kernel - 1) * dilation) // 2
        self.block = [
            Snake1d(dim),
            Conv1d(dim, dim, kernel, dilation=dilation, padding=pad, groups=groups),
            Snake1d(dim),
            Conv1d(dim, dim, 1),
        ]

    def __call__(self, x):
        y = x
        for l in self.block:
            y = l(y)
        pad = (x.shape[1] - y.shape[1]) // 2
        if pad > 0:
            x = x[:, pad:-pad]
        return x + y


class EncoderBlock(Module):
    def __init__(self, output_dim=16, input_dim=None, stride=1, groups=1):
        input_dim = input_dim or output_dim // 2
        self.block = [
            ResidualUnit(input_dim, dilation=1, groups=groups),
            ResidualUnit(input_dim, dilation=3, groups=groups),
            ResidualUnit(input_dim, dilation=9, groups=groups),
            Snake1d(input_dim),
            Conv1d(input_dim, output_dim, 2 * stride, stride=stride,
                   padding=math.ceil(stride / 2)),
        ]

    def __call__(self, x):
        for l in self.block:
            x = l(x)
        return x


class NoiseBlock(Module):
    def __init__(self, dim):
        self.linear = Conv1d(dim, dim, 1, bias=False)

    def __call__(self, x, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        B, T, C = x.shape
        noise = jax.random.normal(key, (B, T, 1), x.dtype)
        return x + noise * self.linear(x)


class DecoderBlock(Module):
    def __init__(self, input_dim=16, output_dim=8, stride=1, noise=False, groups=1):
        layers = [
            Snake1d(input_dim),
            ConvTranspose1d(input_dim, output_dim, 2 * stride, stride=stride,
                            padding=math.ceil(stride / 2),
                            output_padding=stride % 2),
        ]
        if noise:
            layers.append(NoiseBlock(output_dim))
        layers += [
            ResidualUnit(output_dim, dilation=1, groups=groups),
            ResidualUnit(output_dim, dilation=3, groups=groups),
            ResidualUnit(output_dim, dilation=9, groups=groups),
        ]
        self.block = layers

    def __call__(self, x):
        for l in self.block:
            x = l(x)
        return x


class SinusoidalEmbeddings(Module):
    def __init__(self, dim, scale_base=None):
        self._inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
        self.scale_base = scale_base

    def __call__(self, seq_len: int):
        t = jnp.arange(seq_len, dtype=jnp.float32)
        freqs = t[:, None] * self._inv_freq[None, :]
        return jnp.concatenate([freqs, freqs], axis=-1)


def _rotate_half(x):
    d = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d:], x[..., :d]], axis=-1)


class LocalMHA(Module):
    """Windowed attention (reference attention.py:5): attention is computed
    independently within non-overlapping windows of size `window_size`."""

    def __init__(self, dim=1024, window_size=32, dim_head=64,
                 use_rotary_pos_emb=True):
        self.norm = LayerNorm(dim)
        self.to_qkv = Linear(dim, dim * 3, bias=False)
        self.to_out = Linear(dim, dim, bias=False)
        if use_rotary_pos_emb:
            self.rel_pos = SinusoidalEmbeddings(dim_head, scale_base=window_size // 2)
        self.heads = dim // dim_head
        self.dim_head = dim_head
        self.window_size = window_size

    def __call__(self, x):  # (B, T, C)
        B, T, C = x.shape
        residual = x
        h = self.norm(x)
        W = T // self.window_size
        qkv = self.to_qkv(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def reshape(z):
            return jnp.transpose(
                z.reshape(B, W, self.window_size, self.heads, self.dim_head),
                (0, 3, 1, 2, 4),
            )  # (B, H, W, n, d)

        q, k, v = reshape(q), reshape(k), reshape(v)
        if hasattr(self, "rel_pos"):
            freqs = self.rel_pos(self.window_size)  # (n, d)
            cos, sin = jnp.cos(freqs), jnp.sin(freqs)
            q = q * cos + _rotate_half(q) * sin
            k = k * cos + _rotate_half(k) * sin
        scores = jnp.einsum(
            "bhwnd,bhwmd->bhwnm", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(self.dim_head)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhwnm,bhwmd->bhwnd", attn, v)
        out = jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(B, T, C)
        return self.to_out(out) + residual


class Tanh(Module):
    def __call__(self, x):
        return jnp.tanh(x)


class Encoder(Module):
    def __init__(self, d_model=64, strides=[3, 3, 7, 7], depthwise=False,
                 attn_window_size=32):
        layers = [Conv1d(1, d_model, 7, padding=3)]
        for stride in strides:
            d_model *= 2
            groups = d_model // 2 if depthwise else 1
            layers.append(EncoderBlock(output_dim=d_model, stride=stride, groups=groups))
        if attn_window_size is not None:
            layers.append(LocalMHA(dim=d_model, window_size=attn_window_size))
        groups = d_model if depthwise else 1
        layers.append(Conv1d(d_model, d_model, 7, padding=3, groups=groups))
        self.block = layers

    def __call__(self, x):
        for l in self.block:
            x = l(x)
        return x


class Decoder(Module):
    def __init__(self, input_channel, channels, rates, noise=False, depthwise=False,
                 attn_window_size=32, d_out=1):
        if depthwise:
            layers = [
                Conv1d(input_channel, input_channel, 7, padding=3, groups=input_channel),
                Conv1d(input_channel, channels, 1),
            ]
        else:
            layers = [Conv1d(input_channel, channels, 7, padding=3)]
        if attn_window_size is not None:
            layers.append(LocalMHA(dim=channels, window_size=attn_window_size))
        output_dim = channels
        for i, stride in enumerate(rates):
            input_dim = channels // (2**i)
            output_dim = channels // (2 ** (i + 1))
            groups = output_dim if depthwise else 1
            layers.append(DecoderBlock(input_dim, output_dim, stride, noise, groups))
        layers += [Snake1d(output_dim), Conv1d(output_dim, d_out, 7, padding=3), Tanh()]
        self.model = layers

    def __call__(self, x):
        for l in self.model:
            x = l(x)
        return x


def _l2n(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class VectorQuantize(Module):
    def __init__(self, input_dim, codebook_size, codebook_dim, stride: int = 1):
        self.in_proj = Conv1d(input_dim, codebook_dim, 1)
        self.out_proj = Conv1d(codebook_dim, input_dim, 1)
        self.codebook = Embedding(codebook_size, codebook_dim)
        self.stride = stride

    def __call__(self, z):  # (B, T, D)
        if self.stride > 1:
            B, T, D = z.shape
            z = z.reshape(B, T // self.stride, self.stride, D).mean(axis=2)
        z_e = self.in_proj(z)
        z_q, indices = self.decode_latents(z_e)
        z_q = self.out_proj(z_q)
        if self.stride > 1:
            z_q = jnp.repeat(z_q, self.stride, axis=1)
        return z_q, indices

    def decode_code(self, embed_id):
        return self.codebook.weight[embed_id]

    def decode_latents(self, latents):
        enc = _l2n(latents)
        cb = _l2n(self.codebook.weight)
        sim = jnp.einsum("btd,nd->btn", enc, cb, preferred_element_type=jnp.float32)
        indices = jnp.argmax(sim, axis=-1)
        return self.decode_code(indices), indices


class ResidualVectorQuantize(Module):
    def __init__(self, input_dim=512, codebook_size=4096, codebook_dim=8,
                 vq_strides=[8, 4, 2, 1]):
        self.n_codebooks = len(vq_strides)
        self.quantizers = [
            VectorQuantize(input_dim, codebook_size, codebook_dim, s)
            for s in vq_strides
        ]

    def __call__(self, z):
        z_q = jnp.zeros_like(z)
        residual = z
        codes = []
        for q in self.quantizers:
            z_q_i, idx = q(residual)
            z_q = z_q + z_q_i
            residual = residual - z_q_i
            codes.append(idx)
        return z_q, codes

    def from_codes(self, codes: List[jax.Array]):
        z_q = None
        for i, q in enumerate(self.quantizers):
            z_q_i = q.out_proj(q.decode_code(codes[i]))
            if q.stride > 1:
                z_q_i = jnp.repeat(z_q_i, q.stride, axis=1)
            z_q = z_q_i if z_q is None else z_q + z_q_i
        return z_q


class SNAC(Module):
    def __init__(self, sampling_rate=44100, encoder_dim=64,
                 encoder_rates=[3, 3, 7, 7], latent_dim=None, decoder_dim=1536,
                 decoder_rates=[7, 7, 3, 3], attn_window_size=32,
                 codebook_size=4096, codebook_dim=8, vq_strides=[8, 4, 2, 1],
                 noise=True, depthwise=True, **kwargs):
        if latent_dim is None:
            latent_dim = encoder_dim * (2 ** len(encoder_rates))
        self.sampling_rate = sampling_rate
        self.hop_length = int(np.prod(encoder_rates))
        self.vq_strides = vq_strides
        self.attn_window_size = attn_window_size
        self.encoder = Encoder(encoder_dim, encoder_rates, depthwise, attn_window_size)
        self.quantizer = ResidualVectorQuantize(
            latent_dim, codebook_size, codebook_dim, vq_strides
        )
        self.decoder = Decoder(
            latent_dim, decoder_dim, decoder_rates, noise, depthwise, attn_window_size
        )

    def preprocess(self, audio_data):
        length = audio_data.shape[-1]
        lcm = self.vq_strides[0]
        for s in self.vq_strides[1:]:
            lcm = abs(lcm * s) // math.gcd(lcm, s)
        if self.attn_window_size:
            lcm = abs(lcm * self.attn_window_size) // math.gcd(lcm, self.attn_window_size)
        pad_to = self.hop_length * lcm
        right_pad = math.ceil(length / pad_to) * pad_to - length
        return jnp.pad(jnp.asarray(audio_data), [(0, 0), (0, 0), (0, right_pad)])

    @staticmethod
    @jax.jit
    def _encode(model: "SNAC", x):
        z = model.encoder(x)
        _, codes = model.quantizer(z)
        return codes

    @staticmethod
    @jax.jit
    def _decode(model: "SNAC", codes):
        z_q = model.quantizer.from_codes(codes)
        return model.decoder(z_q)

    def encode(self, audio_data) -> List[jax.Array]:
        """audio_data (B, 1, T) → list of per-codebook index arrays."""
        x = self.preprocess(audio_data)
        return self._encode(self, jnp.swapaxes(x, 1, 2))

    def decode(self, codes: List) -> jax.Array:
        codes = [jnp.asarray(c) for c in codes]
        audio = self._decode(self, codes)
        return jnp.swapaxes(audio, 1, 2)  # (B, 1, T)

    def decode_stream(self, codes: List, prev_codes: Optional[List] = None,
                      context_frames: int = 8):
        """Chunked streaming decode with code context for seam-free output
        (reference snac/snac.py:106-161): re-decode `context_frames`
        z-frames of previous codes with the new chunk, return only the new
        samples plus the updated context.

        Returns (new_audio (B, 1, T_new), new_context codes list)."""
        codes = [jnp.asarray(c) for c in codes]
        if prev_codes is None:
            audio = self.decode(codes)
            new_context = [
                c[:, -context_frames:] if c.shape[1] > context_frames else c
                for c in codes
            ]
            return audio, new_context

        combined = []
        for i, (prev, new) in enumerate(zip(prev_codes, codes)):
            stride = self.vq_strides[i]
            layer_context = max(1, context_frames // stride)
            if prev.shape[1] > layer_context:
                prev = prev[:, -layer_context:]
            combined.append(jnp.concatenate([jnp.asarray(prev), new],
                                            axis=1))
        full_audio = self.decode(combined)
        context_samples = context_frames * self.hop_length
        new_audio = (full_audio[..., context_samples:]
                     if full_audio.shape[-1] > context_samples else full_audio)
        new_context = [
            c[:, -context_frames:] if c.shape[1] > context_frames else c
            for c in codes
        ]
        return new_audio, new_context

    def __call__(self, audio_data):
        length = audio_data.shape[-1]
        codes = self.encode(audio_data)
        audio = self.decode(codes)
        return audio[..., :length], codes

    def sanitize(self, weights: dict) -> dict:
        from ....nn.sanitize import orient_weights_to_model

        weights = fold_weight_norm_pairs(weights)
        return orient_weights_to_model(self, weights)

    @classmethod
    def from_pretrained(cls, repo_id: str):
        import json

        from ....utils import get_model_path, load_weight_files
        from ....nn.module import load_weights as assign

        path = get_model_path(repo_id)
        config = {}
        for name in ("config.json",):
            p = path / name
            if p.exists():
                config = json.loads(p.read_text())
        model = cls(**config)
        weights = model.sanitize(load_weight_files(path))
        return assign(model, weights, strict=False).eval()
