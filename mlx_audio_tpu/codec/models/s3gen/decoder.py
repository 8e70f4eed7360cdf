"""Conditional U-Net estimator for the S3Gen flow-matching decoder.

TPU-native re-implementation of the reference
mlx_audio/codec/models/s3gen/decoder.py:235-542 and matcha/decoder.py,
matcha/transformer.py. Channels-last (B, T, C) throughout — the reference's
(B, C, T) torch layout and per-op transposes are dropped; XLA fuses the
whole block stack into one program.
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp

from ....nn import layers as nn
from ....nn.module import Module
from .encoder import subsequent_chunk_mask

__all__ = ["ConditionalDecoder"]


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class SinusoidalPosEmb(Module):
    """Timestep embedding (reference matcha/decoder.py:12-29)."""

    def __init__(self, dim: int):
        self.dim = dim

    def __call__(self, t: jnp.ndarray, scale: float = 1000.0) -> jnp.ndarray:
        if t.ndim < 1:
            t = t[None]
        half = self.dim // 2
        emb = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                      * -(math.log(10000.0) / (half - 1)))
        # phase t*1000 aliases in bf16 (resolution 4 at 1000) — sinusoid
        # math stays f32; the caller's dtype is restored on the way out
        emb = scale * t.astype(jnp.float32)[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)],
                               axis=-1).astype(t.dtype)


class TimestepEmbedding(Module):
    def __init__(self, in_channels: int, time_embed_dim: int):
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

    def __call__(self, x):
        return self.linear_2(jax.nn.silu(self.linear_1(x)))


class Block1D(Module):
    """Conv + GroupNorm + Mish (reference matcha/decoder.py:52-68).
    x: (B, T, C); mask: (B, T, 1)."""

    def __init__(self, dim: int, dim_out: int, groups: int = 8):
        self.conv = nn.Conv1d(dim, dim_out, 3, padding=1)
        self.norm = nn.GroupNorm(groups, dim_out)

    def __call__(self, x, mask):
        return _mish(self.norm(self.conv(x * mask))) * mask


class CausalBlock1D(Module):
    """Left-padded conv + LayerNorm + Mish (reference decoder.py:155-176)."""

    def __init__(self, dim: int, dim_out: int):
        self.conv = nn.Conv1d(dim, dim_out, 3)
        self.norm = nn.LayerNorm(dim_out)

    def __call__(self, x, mask):
        h = jnp.pad(x * mask, ((0, 0), (2, 0), (0, 0)))
        return _mish(self.norm(self.conv(h))) * mask


class ResnetBlock1D(Module):
    """reference matcha/decoder.py:71-95 / decoder.py:178-184 (causal)."""

    def __init__(self, dim: int, dim_out: int, time_emb_dim: int,
                 groups: int = 8, causal: bool = False):
        self.mlp_linear = nn.Linear(time_emb_dim, dim_out)
        if causal:
            self.block1 = CausalBlock1D(dim, dim_out)
            self.block2 = CausalBlock1D(dim_out, dim_out)
        else:
            self.block1 = Block1D(dim, dim_out, groups)
            self.block2 = Block1D(dim_out, dim_out, groups)
        self.res_conv = nn.Conv1d(dim, dim_out, 1)

    def __call__(self, x, mask, t_emb):
        h = self.block1(x, mask)
        h = h + self.mlp_linear(_mish(t_emb))[:, None, :]
        h = self.block2(h, mask)
        return h + self.res_conv(x * mask)


class DiffusersAttention(Module):
    """inner_dim = heads*dim_head projections (reference
    matcha/transformer.py:12-109)."""

    def __init__(self, query_dim: int, heads: int, dim_head: int):
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        self.query_proj = nn.Linear(query_dim, inner, bias=False)
        self.key_proj = nn.Linear(query_dim, inner, bias=False)
        self.value_proj = nn.Linear(query_dim, inner, bias=False)
        self.out_proj = nn.Linear(inner, query_dim)

    def __call__(self, x, bias):
        B, T, _ = x.shape
        q = self.query_proj(x).reshape(B, T, self.heads, self.dim_head)
        k = self.key_proj(x).reshape(B, T, self.heads, self.dim_head)
        v = self.value_proj(x).reshape(B, T, self.heads, self.dim_head)
        q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
        scores = q @ k.transpose(0, 1, 3, 2) * self.dim_head**-0.5 + bias
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, -1)
        return self.out_proj(out)


class FeedForward(Module):
    def __init__(self, dim: int, inner_dim: int):
        self.layers = nn.Sequential(nn.Linear(dim, inner_dim), nn.GELU(),
                                    nn.Linear(inner_dim, dim))

    def __call__(self, x):
        return self.layers(x)


class BasicTransformerBlock(Module):
    """reference matcha/transformer.py:112-166."""

    def __init__(self, dim: int, num_heads: int, head_dim: int):
        self.norm1 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)
        self.attn = DiffusersAttention(dim, num_heads, head_dim)
        self.ff = FeedForward(dim, dim * 4)

    def __call__(self, x, bias):
        x = x + self.attn(self.norm1(x), bias)
        return x + self.ff(self.norm3(x))


class Downsample1D(Module):
    def __init__(self, dim: int):
        self.conv = nn.Conv1d(dim, dim, 3, stride=2, padding=1)

    def __call__(self, x):
        return self.conv(x)


class Upsample1D(Module):
    def __init__(self, channels: int):
        self.conv = nn.ConvTranspose1d(channels, channels, 4, stride=2,
                                       padding=1)

    def __call__(self, x):
        return self.conv(x)


class CausalConv1d(Module):
    def __init__(self, dim: int, dim_out: int, kernel: int = 3):
        self.conv = nn.Conv1d(dim, dim_out, kernel)
        self.causal_padding = kernel - 1

    def __call__(self, x):
        return self.conv(jnp.pad(x, ((0, 0), (self.causal_padding, 0), (0, 0))))


class _UNetBlock(Module):
    def __init__(self, resnet, transformer_blocks, resample=None):
        self.resnet = resnet
        for i, b in enumerate(transformer_blocks):
            setattr(self, f"transformer_{i}", b)
        self.n_transformer = len(transformer_blocks)
        if resample is not None:
            self.resample = resample

    def transformers(self):
        return [getattr(self, f"transformer_{i}")
                for i in range(self.n_transformer)]


class ConditionalDecoder(Module):
    """U-Net velocity estimator (reference decoder.py:235-542).

    Inputs/outputs are (B, T, C); the CFM solver in flow_matching.py calls
    this once per Euler step with [cond, uncond] stacked on the batch axis.
    """

    def __init__(
        self,
        in_channels: int = 320,
        out_channels: int = 80,
        causal: bool = True,
        channels: Optional[List[int]] = None,
        attention_head_dim: int = 64,
        n_blocks: int = 4,
        num_mid_blocks: int = 12,
        num_heads: int = 8,
        static_chunk_size: int = 50,
        num_decoding_left_chunks: int = -1,
        meanflow: bool = False,
        **_unused,
    ):
        channels = list(channels or [256])
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.causal = causal
        self.static_chunk_size = static_chunk_size
        self.num_decoding_left_chunks = num_decoding_left_chunks
        self.meanflow = meanflow

        self.time_embeddings = SinusoidalPosEmb(in_channels)
        time_embed_dim = channels[0] * 4
        self.time_mlp = TimestepEmbedding(in_channels, time_embed_dim)
        if meanflow:
            # distilled meanflow models mix (t, r) embeddings
            # (reference chatterbox_turbo/models/s3gen/decoder.py:523-529)
            self.time_embed_mixer = nn.Linear(time_embed_dim * 2,
                                              time_embed_dim, bias=False)

        def transformers(ch):
            return [BasicTransformerBlock(ch, num_heads, attention_head_dim)
                    for _ in range(n_blocks)]

        out_ch = in_channels
        down = []
        for i, ch in enumerate(channels):
            in_ch, out_ch = out_ch, ch
            is_last = i == len(channels) - 1
            resnet = ResnetBlock1D(in_ch, out_ch, time_embed_dim, causal=causal)
            if not is_last:
                resample = Downsample1D(out_ch)
            else:
                resample = (CausalConv1d(out_ch, out_ch, 3) if causal
                            else nn.Conv1d(out_ch, out_ch, 3, padding=1))
            down.append(_UNetBlock(resnet, transformers(out_ch), resample))
        for i, b in enumerate(down):
            setattr(self, f"down_blocks_{i}", b)
        self.n_down = len(down)

        for i in range(num_mid_blocks):
            resnet = ResnetBlock1D(channels[-1], channels[-1], time_embed_dim,
                                   causal=causal)
            setattr(self, f"mid_blocks_{i}",
                    _UNetBlock(resnet, transformers(channels[-1])))
        self.n_mid = num_mid_blocks

        rev = list(reversed(channels)) + [channels[0]]
        up = []
        for i in range(len(rev) - 1):
            in_ch = rev[i] * 2
            out_ch = rev[i + 1]
            is_last = i == len(rev) - 2
            resnet = ResnetBlock1D(in_ch, out_ch, time_embed_dim, causal=causal)
            if not is_last:
                resample = Upsample1D(out_ch)
            else:
                resample = (CausalConv1d(out_ch, out_ch, 3) if causal
                            else nn.Conv1d(out_ch, out_ch, 3, padding=1))
            up.append(_UNetBlock(resnet, transformers(out_ch), resample))
        for i, b in enumerate(up):
            setattr(self, f"up_blocks_{i}", b)
        self.n_up = len(up)

        self.final_block = (CausalBlock1D(rev[-1], rev[-1]) if causal
                            else Block1D(rev[-1], rev[-1]))
        self.final_proj = nn.Conv1d(rev[-1], out_channels, 1)

    def _attn_bias(self, pad_mask: jnp.ndarray, streaming: bool,
                   dtype) -> jnp.ndarray:
        """(B, T, 1) float pad mask → (B, 1, T, T) additive bias."""
        attend = pad_mask[:, :, 0] > 0  # (B, T)
        B, T = attend.shape
        keys = attend[:, None, :]
        if streaming:
            keys = keys & subsequent_chunk_mask(
                T, self.static_chunk_size, self.num_decoding_left_chunks)[None]
        else:
            keys = jnp.broadcast_to(keys, (B, T, T))
        return jnp.where(keys, 0.0, -1e10).astype(dtype)[:, None]

    def __call__(self, x, mask, mu, t, spks=None, cond=None,
                 streaming: bool = False, r=None) -> jnp.ndarray:
        """x/mu/cond: (B, T, C); mask: (B, T, 1); t: (B,); spks: (B, D).
        `r` is the meanflow end-time (reference turbo decoder.py:555-564)."""
        t_emb = self.time_mlp(self.time_embeddings(t))
        if self.meanflow and r is not None:
            r_emb = self.time_mlp(self.time_embeddings(r))
            t_emb = self.time_embed_mixer(
                jnp.concatenate([t_emb, r_emb], axis=-1))

        parts = [x, mu]
        if spks is not None:
            parts.append(jnp.broadcast_to(spks[:, None, :],
                                          (x.shape[0], x.shape[1],
                                           spks.shape[-1])))
        if cond is not None:
            parts.append(cond)
        x = jnp.concatenate(parts, axis=-1)

        hiddens = []
        masks = [mask]
        for i in range(self.n_down):
            block = getattr(self, f"down_blocks_{i}")
            m = masks[-1]
            x = block.resnet(x, m, t_emb)
            bias = self._attn_bias(m, streaming, x.dtype)
            for tb in block.transformers():
                x = tb(x, bias)
            hiddens.append(x)
            x = block.resample(x * m)
            masks.append(m[:, ::2, :])
        masks = masks[:-1]
        m = masks[-1]

        bias = self._attn_bias(m, streaming, x.dtype)
        for i in range(self.n_mid):
            block = getattr(self, f"mid_blocks_{i}")
            x = block.resnet(x, m, t_emb)
            for tb in block.transformers():
                x = tb(x, bias)

        for i in range(self.n_up):
            block = getattr(self, f"up_blocks_{i}")
            m = masks.pop()
            skip = hiddens.pop()
            x = jnp.concatenate([x[:, : skip.shape[1]], skip], axis=-1)
            x = block.resnet(x, m, t_emb)
            bias = self._attn_bias(m, streaming, x.dtype)
            for tb in block.transformers():
                x = tb(x, bias)
            x = block.resample(x * m)

        x = self.final_block(x, m)
        return self.final_proj(x * m) * m
