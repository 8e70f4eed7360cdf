"""Upsample conformer encoder for the S3Gen token→mel flow (CosyVoice2 /
Chatterbox). TPU-native re-implementation of the reference
mlx_audio/codec/models/s3gen/transformer/* (upsample_encoder.py:275-614,
attention.py, embedding.py:117-213, encoder_layer.py, convolution.py).

Everything is channels-last (B, T, C), masks are computed once per call, and
the whole encoder is jit-friendly (no data-dependent Python control flow).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ....nn import layers as nn
from ....nn.module import Module

__all__ = [
    "UpsampleConformerEncoder",
    "ConformerEncoderLayer",
    "RelPositionMultiHeadedAttention",
    "EspnetRelPositionalEncoding",
    "ConvolutionModule",
    "subsequent_chunk_mask",
    "make_non_pad_mask",
]


def make_non_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def subsequent_chunk_mask(size: int, chunk_size: int,
                          num_left_chunks: int = -1) -> jnp.ndarray:
    """Chunk-causal attention mask (reference upsample_encoder.py:163-193)."""
    pos = jnp.arange(size)
    block_end = (pos // chunk_size + 1) * chunk_size
    mask = pos[None, :] < block_end[:, None]
    if num_left_chunks >= 0:
        block_start = (pos // chunk_size - num_left_chunks) * chunk_size
        mask = mask & (pos[None, :] >= block_start[:, None])
    return mask


def chunk_attention_bias(pad_mask: jnp.ndarray, chunk_size: int,
                         num_left_chunks: int = -1,
                         dtype=jnp.float32) -> jnp.ndarray:
    """(B, T) pad mask + optional chunk causality → additive (B, 1, T, T) bias.

    chunk_size <= 0 means full attention (reference
    upsample_encoder.py:196-273 with static_chunk_size semantics).
    """
    B, T = pad_mask.shape
    attend = pad_mask[:, None, :]  # (B, 1, T) keys
    if chunk_size > 0:
        attend = attend & subsequent_chunk_mask(T, chunk_size,
                                                num_left_chunks)[None]
    else:
        attend = jnp.broadcast_to(attend, (B, T, T))
    return jnp.where(attend, 0.0, -1e9).astype(dtype)[:, None]


class EspnetRelPositionalEncoding(Module):
    """Bidirectional relative positions [-(T-1) … T-1] (reference
    embedding.py:117-213)."""

    def __init__(self, d_model: int, max_len: int = 5000):
        self.d_model = d_model
        self.xscale = math.sqrt(d_model)
        position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
        div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                      * -(math.log(10000.0) / d_model))
        pe_pos = jnp.zeros((max_len, d_model))
        pe_pos = pe_pos.at[:, 0::2].set(jnp.sin(position * div))
        pe_pos = pe_pos.at[:, 1::2].set(jnp.cos(position * div))
        pe_neg = jnp.zeros((max_len, d_model))
        pe_neg = pe_neg.at[:, 0::2].set(jnp.sin(-position * div))
        pe_neg = pe_neg.at[:, 1::2].set(jnp.cos(-position * div))
        # [... 2 1 0 -1 -2 ...] laid out as reversed-positive ++ negative[1:]
        self._pe = jnp.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)[None]

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        T = x.shape[1]
        center = self._pe.shape[1] // 2
        pos_emb = self._pe[:, center - T + 1: center + T]
        return x * self.xscale, pos_emb


class LinearNoSubsampling(Module):
    """Linear + LayerNorm input embed (reference subsampling.py:25-73)."""

    def __init__(self, idim: int, odim: int, pos_enc: EspnetRelPositionalEncoding):
        self.linear = nn.Linear(idim, odim)
        self.norm = nn.LayerNorm(odim, eps=1e-5)
        self.pos_enc = pos_enc

    def __call__(self, x: jnp.ndarray):
        x = self.norm(self.linear(x))
        return self.pos_enc(x)


class MultiHeadedAttention(Module):
    """Plain MHA with additive bias (reference attention.py:13-137)."""

    def __init__(self, n_head: int, n_feat: int, key_bias: bool = True):
        self.d_k = n_feat // n_head
        self.h = n_head
        self.linear_q = nn.Linear(n_feat, n_feat)
        self.linear_k = nn.Linear(n_feat, n_feat, bias=key_bias)
        self.linear_v = nn.Linear(n_feat, n_feat)
        self.linear_out = nn.Linear(n_feat, n_feat)

    def _qkv(self, x):
        B, T, _ = x.shape
        q = self.linear_q(x).reshape(B, T, self.h, self.d_k)
        k = self.linear_k(x).reshape(B, T, self.h, self.d_k)
        v = self.linear_v(x).reshape(B, T, self.h, self.d_k)
        return (q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3))

    def __call__(self, x, bias, pos_emb=None):
        q, k, v = self._qkv(x)
        scores = q @ k.transpose(0, 1, 3, 2) / math.sqrt(self.d_k) + bias
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(x.shape)
        return self.linear_out(out)


class RelPositionMultiHeadedAttention(MultiHeadedAttention):
    """Transformer-XL style relative attention, espnet variant
    (reference attention.py:140-237)."""

    def __init__(self, n_head: int, n_feat: int, key_bias: bool = True):
        super().__init__(n_head, n_feat, key_bias)
        self.linear_pos = nn.Linear(n_feat, n_feat, bias=False)
        self.pos_bias_u = jnp.zeros((n_head, self.d_k))
        self.pos_bias_v = jnp.zeros((n_head, self.d_k))

    @staticmethod
    def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
        """(B, h, T, 2T-1) → (B, h, T, T) (reference attention.py:160-177)."""
        B, H, T, P = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
        x = x.reshape(B, H, P + 1, T)[:, :, 1:].reshape(B, H, T, P)
        return x[..., : P // 2 + 1]

    def __call__(self, x, bias, pos_emb=None):
        B, T, _ = x.shape
        q, k, v = self._qkv(x)
        p = self.linear_pos(pos_emb).reshape(1, -1, self.h, self.d_k)
        p = p.transpose(0, 2, 1, 3)  # (1, h, 2T-1, d_k)

        q_u = q + self.pos_bias_u[None, :, None, :]
        q_v = q + self.pos_bias_v[None, :, None, :]
        matrix_ac = q_u @ k.transpose(0, 1, 3, 2)
        matrix_bd = q_v @ p.transpose(0, 1, 3, 2)
        if matrix_bd.shape[-1] != matrix_ac.shape[-1]:
            matrix_bd = self._rel_shift(matrix_bd)
        scores = (matrix_ac + matrix_bd) / math.sqrt(self.d_k) + bias
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, -1)
        return self.linear_out(out)


class PositionwiseFeedForward(Module):
    def __init__(self, idim: int, hidden: int, activation=jax.nn.silu):
        self.w_1 = nn.Linear(idim, hidden)
        self.w_2 = nn.Linear(hidden, idim)
        self._act = activation

    def __call__(self, x):
        return self.w_2(self._act(self.w_1(x)))


class ConvolutionModule(Module):
    """Conformer conv module: pointwise-GLU → depthwise → norm → pointwise
    (reference convolution.py:12-152). Channels-last throughout."""

    def __init__(self, channels: int, kernel_size: int = 15,
                 norm: str = "batch_norm", causal: bool = False,
                 bias: bool = True):
        self.pointwise_conv1 = nn.Conv1d(channels, 2 * channels, 1, bias=bias)
        pad = 0 if causal else (kernel_size - 1) // 2
        self.lorder = kernel_size - 1 if causal else 0
        self.depthwise_conv = nn.Conv1d(channels, channels, kernel_size,
                                        padding=pad, groups=channels, bias=bias)
        self.use_layer_norm = norm == "layer_norm"
        self.norm = (nn.LayerNorm(channels) if self.use_layer_norm
                     else nn.BatchNorm(channels))
        self.pointwise_conv2 = nn.Conv1d(channels, channels, 1, bias=bias)

    def __call__(self, x, pad_mask=None):
        if pad_mask is not None:
            x = x * pad_mask[..., None]
        x = self.pointwise_conv1(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)
        if self.lorder > 0:
            x = jnp.pad(x, ((0, 0), (self.lorder, 0), (0, 0)))
        x = self.depthwise_conv(x)
        x = jax.nn.silu(self.norm(x))
        x = self.pointwise_conv2(x)
        if pad_mask is not None:
            x = x * pad_mask[..., None]
        return x


class ConformerEncoderLayer(Module):
    """reference encoder_layer.py:12-150 (inference path, pre-norm)."""

    def __init__(self, size: int, self_attn: Module,
                 feed_forward: Module,
                 feed_forward_macaron: Optional[Module] = None,
                 conv_module: Optional[Module] = None):
        self.self_attn = self_attn
        self.feed_forward = feed_forward
        self.feed_forward_macaron = feed_forward_macaron
        self.conv_module = conv_module
        self.norm_ff = nn.LayerNorm(size, eps=1e-12)
        self.norm_mha = nn.LayerNorm(size, eps=1e-12)
        if feed_forward_macaron is not None:
            self.norm_ff_macaron = nn.LayerNorm(size, eps=1e-12)
        self.ff_scale = 0.5 if feed_forward_macaron is not None else 1.0
        if conv_module is not None:
            self.norm_conv = nn.LayerNorm(size, eps=1e-12)
            self.norm_final = nn.LayerNorm(size, eps=1e-12)

    def __call__(self, x, bias, pos_emb, pad_mask=None):
        if self.feed_forward_macaron is not None:
            x = x + self.ff_scale * self.feed_forward_macaron(
                self.norm_ff_macaron(x))
        x = x + self.self_attn(self.norm_mha(x), bias, pos_emb)
        if self.conv_module is not None:
            x = x + self.conv_module(self.norm_conv(x), pad_mask)
        x = x + self.ff_scale * self.feed_forward(self.norm_ff(x))
        if self.conv_module is not None:
            x = self.norm_final(x)
        return x


class Upsample1D(Module):
    """Nearest-neighbour ×stride upsample + left-padded conv
    (reference upsample_encoder.py:19-70). (B, T, C) in/out."""

    def __init__(self, channels: int, out_channels: int, stride: int = 2):
        self.stride = stride
        self.conv = nn.Conv1d(channels, out_channels, stride * 2 + 1)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.repeat(x, self.stride, axis=1)
        x = jnp.pad(x, ((0, 0), (self.stride * 2, 0), (0, 0)))
        return self.conv(x)


class PreLookaheadLayer(Module):
    """Right-context conv with residual (reference upsample_encoder.py:72-130)."""

    def __init__(self, channels: int, pre_lookahead_len: int = 3):
        self.pre_lookahead_len = pre_lookahead_len
        self.conv1 = nn.Conv1d(channels, channels, pre_lookahead_len + 1)
        self.conv2 = nn.Conv1d(channels, channels, 3)

    def __call__(self, x: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if context is None or context.shape[1] == 0:
            h = jnp.pad(x, ((0, 0), (0, self.pre_lookahead_len), (0, 0)))
        else:
            h = jnp.concatenate([x, context], axis=1)
            rem = self.pre_lookahead_len - context.shape[1]
            if rem > 0:
                h = jnp.pad(h, ((0, 0), (0, rem), (0, 0)))
        h = jax.nn.leaky_relu(self.conv1(h), negative_slope=0.01)
        h = self.conv2(jnp.pad(h, ((0, 0), (2, 0), (0, 0))))
        return h + x


class UpsampleConformerEncoder(Module):
    """Token encoder: conformer stack → 2x upsample → conformer stack.

    reference upsample_encoder.py:275-614. `streaming=True` applies the
    static chunk mask; both modes compile to a single XLA program per
    shape bucket.
    """

    def __init__(
        self,
        input_size: int = 512,
        output_size: int = 512,
        attention_heads: int = 8,
        linear_units: int = 2048,
        num_blocks: int = 6,
        num_up_blocks: int = 4,
        static_chunk_size: int = 25,
        macaron_style: bool = False,
        use_cnn_module: bool = False,
        cnn_module_kernel: int = 15,
        causal: bool = False,
        key_bias: bool = True,
        pre_lookahead_len: int = 3,
        upsample_stride: int = 2,
        **_unused,
    ):
        self._output_size = output_size
        self.static_chunk_size = static_chunk_size
        self.embed = LinearNoSubsampling(
            input_size, output_size, EspnetRelPositionalEncoding(output_size))
        self.up_embed = LinearNoSubsampling(
            input_size, output_size, EspnetRelPositionalEncoding(output_size))
        self.after_norm = nn.LayerNorm(output_size, eps=1e-5)
        self.pre_lookahead_layer = PreLookaheadLayer(output_size,
                                                     pre_lookahead_len)

        def make_layer():
            return ConformerEncoderLayer(
                output_size,
                RelPositionMultiHeadedAttention(attention_heads, output_size,
                                                key_bias),
                PositionwiseFeedForward(output_size, linear_units),
                (PositionwiseFeedForward(output_size, linear_units)
                 if macaron_style else None),
                (ConvolutionModule(output_size, cnn_module_kernel,
                                   causal=causal) if use_cnn_module else None),
            )

        self.encoders = [make_layer() for _ in range(num_blocks)]
        self.up_layer = Upsample1D(output_size, output_size, upsample_stride)
        self.up_encoders = [make_layer() for _ in range(num_up_blocks)]

    def output_size(self) -> int:
        return self._output_size

    def __call__(self, xs: jnp.ndarray, xs_lens: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None,
                 streaming: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        T = xs.shape[1]
        pad = make_non_pad_mask(xs_lens, T)
        xs, pos_emb = self.embed(xs)
        embedded_context = None
        if context is not None and context.shape[1] > 0:
            embedded_context, _ = self.embed(context)

        chunk = self.static_chunk_size if streaming else 0
        bias = chunk_attention_bias(pad, chunk, dtype=xs.dtype)
        xs = self.pre_lookahead_layer(xs, context=embedded_context)
        for layer in self.encoders:
            xs = layer(xs, bias, pos_emb, pad)

        xs = self.up_layer(xs)
        up_lens = xs_lens * self.up_layer.stride
        pad = make_non_pad_mask(up_lens, xs.shape[1])
        xs, pos_emb = self.up_embed(xs)
        bias = chunk_attention_bias(pad, chunk * self.up_layer.stride
                                    if chunk > 0 else 0, dtype=xs.dtype)
        for layer in self.up_encoders:
            xs = layer(xs, bias, pos_emb, pad)
        return self.after_norm(xs), up_lens
