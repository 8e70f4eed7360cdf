"""FastConformer audio encoder for LFM2.5-Audio.

TPU-native re-implementation of the reference
mlx_audio/sts/models/lfm_audio/conformer.py:13-507. Relative positional
encodings are computed in-graph per length (static under jit); the whole
encoder is one fused program. Channels-last throughout.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ....nn import layers as nn
from ....nn.module import Module
from .config import ConformerEncoderConfig

__all__ = ["ConformerEncoder", "ConvSubsampling", "MLP"]


def rel_positional_encoding(length: int, d_model: int,
                            dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal encodings for positions length−1 … −(length−1) →
    (2L−1, D) (reference conformer.py:13-70)."""
    positions = jnp.arange(length - 1, -length, -1,
                           dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((2 * length - 1, d_model), dtype)
    pe = pe.at[:, 0::2].set(jnp.sin(positions * div))
    pe = pe.at[:, 1::2].set(jnp.cos(positions * div))
    return pe


class ConformerFeedForward(Module):
    """Linear → SiLU → Linear (reference conformer.py:72-93)."""

    def __init__(self, d_model: int, d_ff: int):
        self.linear1 = nn.Linear(d_model, d_ff)
        self.linear2 = nn.Linear(d_ff, d_model)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.linear2(jax.nn.silu(self.linear1(x)))


class ConformerConvolution(Module):
    """GLU → depthwise conv → BatchNorm → SiLU → pointwise
    (reference conformer.py:95-140)."""

    def __init__(self, d_model: int, kernel_size: int = 31,
                 norm_type: str = "batch_norm"):
        self.pointwise_conv1 = nn.Linear(d_model, 2 * d_model)
        self.depthwise_conv = nn.Conv1d(d_model, d_model, kernel_size,
                                        padding=(kernel_size - 1) // 2,
                                        groups=d_model)
        self.norm = (nn.BatchNorm(d_model) if norm_type == "batch_norm"
                     else nn.LayerNorm(d_model))
        self.pointwise_conv2 = nn.Linear(d_model, d_model)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, gate = jnp.split(self.pointwise_conv1(x), 2, axis=-1)
        h = h * jax.nn.sigmoid(gate)
        h = self.norm(self.depthwise_conv(h))
        return self.pointwise_conv2(jax.nn.silu(h))


class RelativeMultiHeadAttention(Module):
    """Transformer-XL style rel-pos attention with pos_bias_u/v
    (reference conformer.py:142-256)."""

    def __init__(self, d_model: int, num_heads: int):
        self.num_heads = num_heads
        self.head_dim = d_model // num_heads
        self.scale = self.head_dim ** -0.5
        self.q_proj = nn.Linear(d_model, d_model)
        self.k_proj = nn.Linear(d_model, d_model)
        self.v_proj = nn.Linear(d_model, d_model)
        self.out_proj = nn.Linear(d_model, d_model)
        self.pos_proj = nn.Linear(d_model, d_model, bias=False)
        self.pos_bias_u = jnp.zeros((num_heads, self.head_dim))
        self.pos_bias_v = jnp.zeros((num_heads, self.head_dim))

    @staticmethod
    def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, T, 2T−1) → (B, H, T, T) (reference
        conformer.py:173-196)."""
        B, H, T, P = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
        x = x.reshape(B, H, P + 1, T)[:, :, 1:]
        return x.reshape(B, H, T, P)[:, :, :, :T]

    def __call__(self, x: jnp.ndarray, pos_emb: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, T, _ = x.shape
        H, hd = self.num_heads, self.head_dim
        q = self.q_proj(x).reshape(B, T, H, hd)
        k = self.k_proj(x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        v = self.v_proj(x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        p = self.pos_proj(pos_emb).reshape(1, -1, H, hd
                                           ).transpose(0, 2, 1, 3)

        q_u = (q + self.pos_bias_u[None, None]).transpose(0, 2, 1, 3)
        q_v = (q + self.pos_bias_v[None, None]).transpose(0, 2, 1, 3)
        ac = q_u @ k.transpose(0, 1, 3, 2)
        bd = self._rel_shift(q_v @ p.transpose(0, 1, 3, 2))
        scores = (ac + bd) * self.scale
        if mask is not None:
            scores = scores + mask
        attn = jax.nn.softmax(scores, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, -1)
        return self.out_proj(out)


class ConformerLayer(Module):
    """FF/2 → MHA → conv → FF/2 → norm (reference conformer.py:258-313)."""

    def __init__(self, d_model: int, num_heads: int,
                 ff_expansion_factor: int = 4, conv_kernel_size: int = 31,
                 conv_norm_type: str = "batch_norm"):
        d_ff = d_model * ff_expansion_factor
        self.ff1_norm = nn.LayerNorm(d_model)
        self.ff1 = ConformerFeedForward(d_model, d_ff)
        self.attn_norm = nn.LayerNorm(d_model)
        self.attn = RelativeMultiHeadAttention(d_model, num_heads)
        self.conv_norm = nn.LayerNorm(d_model)
        self.conv = ConformerConvolution(d_model, conv_kernel_size,
                                         conv_norm_type)
        self.ff2_norm = nn.LayerNorm(d_model)
        self.ff2 = ConformerFeedForward(d_model, d_ff)
        self.final_norm = nn.LayerNorm(d_model)

    def __call__(self, x, pos_emb, mask=None):
        x = x + 0.5 * self.ff1(self.ff1_norm(x))
        x = x + self.attn(self.attn_norm(x), pos_emb, mask)
        x = x + self.conv(self.conv_norm(x))
        x = x + 0.5 * self.ff2(self.ff2_norm(x))
        return self.final_norm(x)


class ConvSubsampling(Module):
    """8× depthwise-striding 2-D subsampling
    (reference conformer.py:315-393). x: (B, T, D_mel)."""

    def __init__(self, in_channels: int, out_channels: int,
                 subsampling_factor: int = 8, conv_channels: int = 256):
        self.subsampling_factor = subsampling_factor
        c = conv_channels
        self.conv = [
            nn.Conv2d(1, c, 3, stride=2, padding=1),
            None,
            nn.Conv2d(c, c, 3, stride=2, padding=1, groups=c),
            nn.Conv2d(c, c, 1),
            None,
            nn.Conv2d(c, c, 3, stride=2, padding=1, groups=c),
            nn.Conv2d(c, c, 1),
        ]
        self.out = nn.Linear(c * (in_channels // subsampling_factor),
                             out_channels)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x[:, :, :, None]  # NHWC: (B, T, D, 1)
        x = jax.nn.relu(self.conv[0](x))
        x = jax.nn.relu(self.conv[3](self.conv[2](x)))
        x = jax.nn.relu(self.conv[6](self.conv[5](x)))
        B, T, D, C = x.shape
        x = x.transpose(0, 1, 3, 2).reshape(B, T, -1)
        return self.out(x)


class ConformerEncoder(Module):
    """Subsample → rel-pos conformer stack
    (reference conformer.py:395-474)."""

    def __init__(self, config: ConformerEncoderConfig):
        self.config = config
        self.pre_encode = ConvSubsampling(
            config.feat_in, config.d_model,
            config.subsampling_factor, config.subsampling_conv_channels)
        self.layers = [
            ConformerLayer(config.d_model, config.n_heads,
                           config.ff_expansion_factor,
                           config.conv_kernel_size, config.conv_norm_type)
            for _ in range(config.n_layers)]

    def __call__(self, x: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = self.pre_encode(x)
        T = x.shape[1]
        if lengths is not None:
            lengths = lengths // self.config.subsampling_factor
        else:
            lengths = jnp.full((x.shape[0],), T, jnp.int32)
        pos_emb = rel_positional_encoding(T, self.config.d_model)
        mask = None
        if lengths is not None:
            pad = jnp.arange(T)[None, :] >= lengths[:, None]
            mask = jnp.where(pad[:, None, None, :], -jnp.inf, 0.0)
        for layer in self.layers:
            x = layer(x, pos_emb, mask)
        return x, lengths


class MLP(Module):
    """Adapter: LayerNorm → Linear → GELU → … → Linear
    (reference conformer.py:477-507). Keys `layers.N.*` match
    the reference Sequential layout."""

    def __init__(self, in_channels: int, out_channels: int,
                 hidden_dims: List[int], use_layer_norm: bool = True):
        channels = [in_channels, *hidden_dims, out_channels]
        layers = []
        if use_layer_norm:
            layers.append(nn.LayerNorm(channels[0]))
        for i in range(len(channels) - 1):
            layers.append(nn.Linear(channels[i], channels[i + 1]))
            if i != len(channels) - 2:
                layers.append(nn.GELU())
        self.layers = layers

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for layer in self.layers:
            x = layer(x)
        return x
