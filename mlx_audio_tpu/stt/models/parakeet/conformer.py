"""FastConformer encoder (spec: reference stt/models/parakeet/conformer.py):
depthwise-striding 2D subsampling + conformer blocks (FF/2 + rel-pos MHA +
conv module + FF/2), channels-last."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ....nn import BatchNorm, Conv1d, Conv2d, LayerNorm, Linear, Module
from .attention import (
    MultiHeadAttention,
    RelPositionalEncoding,
    RelPositionMultiHeadAttention,
)

__all__ = ["Conformer", "ConformerArgs"]


@dataclass
class ConformerArgs:
    feat_in: int = 80
    n_layers: int = 16
    d_model: int = 512
    n_heads: int = 8
    ff_expansion_factor: int = 4
    subsampling_factor: int = 8
    self_attention_model: str = "rel_pos"
    subsampling: str = "dw_striding"
    conv_kernel_size: int = 9
    subsampling_conv_channels: int = 256
    pos_emb_max_len: int = 5000
    causal_downsampling: bool = False
    use_bias: bool = True
    xscaling: bool = False
    subsampling_conv_chunking_factor: int = 1


class FeedForward(Module):
    def __init__(self, d_model: int, d_ff: int, use_bias: bool = True):
        self.linear1 = Linear(d_model, d_ff, bias=use_bias)
        self.linear2 = Linear(d_ff, d_model, bias=use_bias)

    def __call__(self, x):
        return self.linear2(jax.nn.silu(self.linear1(x)))


class Convolution(Module):
    def __init__(self, args: ConformerArgs):
        self.pointwise_conv1 = Conv1d(args.d_model, args.d_model * 2, 1,
                                      bias=args.use_bias)
        self.depthwise_conv = Conv1d(
            args.d_model, args.d_model, args.conv_kernel_size,
            padding=(args.conv_kernel_size - 1) // 2, groups=args.d_model,
            bias=args.use_bias,
        )
        self.batch_norm = BatchNorm(args.d_model)
        self.pointwise_conv2 = Conv1d(args.d_model, args.d_model, 1,
                                      bias=args.use_bias)

    def __call__(self, x):
        x = self.pointwise_conv1(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)  # GLU
        x = self.depthwise_conv(x)
        x = jax.nn.silu(self.batch_norm(x))
        return self.pointwise_conv2(x)


class ConformerBlock(Module):
    def __init__(self, args: ConformerArgs):
        ff_dim = args.d_model * args.ff_expansion_factor
        self.norm_feed_forward1 = LayerNorm(args.d_model)
        self.feed_forward1 = FeedForward(args.d_model, ff_dim, args.use_bias)
        self.norm_self_att = LayerNorm(args.d_model)
        self.self_attn = (
            RelPositionMultiHeadAttention(args.n_heads, args.d_model, args.use_bias)
            if args.self_attention_model == "rel_pos"
            else MultiHeadAttention(args.n_heads, args.d_model, True)
        )
        self.norm_conv = LayerNorm(args.d_model)
        self.conv = Convolution(args)
        self.norm_feed_forward2 = LayerNorm(args.d_model)
        self.feed_forward2 = FeedForward(args.d_model, ff_dim, args.use_bias)
        self.norm_out = LayerNorm(args.d_model)

    def __call__(self, x, pos_emb=None, mask=None):
        x = x + 0.5 * self.feed_forward1(self.norm_feed_forward1(x))
        xn = self.norm_self_att(x)
        x = x + self.self_attn(xn, xn, xn, pos_emb=pos_emb, mask=mask)
        x = x + self.conv(self.norm_conv(x))
        x = x + 0.5 * self.feed_forward2(self.norm_feed_forward2(x))
        return self.norm_out(x)


class DwStridingSubsampling(Module):
    """2D conv subsampling over (time, freq): one full conv then depthwise+
    pointwise pairs, stride 2 each (reference conformer.py:146)."""

    def __init__(self, args: ConformerArgs):
        self._sampling_num = int(math.log2(args.subsampling_factor))
        self._stride = 2
        self._kernel = 3
        self._padding = 1
        ch = args.subsampling_conv_channels

        freq = args.feat_in
        for _ in range(self._sampling_num):
            freq = (freq + 2 * self._padding - self._kernel) // self._stride + 1

        conv = [Conv2d(1, ch, 3, stride=2, padding=1)]
        for _ in range(self._sampling_num - 1):
            conv.append(Conv2d(ch, ch, 3, stride=2, padding=1, groups=ch))
            conv.append(Conv2d(ch, ch, 1))
        self.conv = conv
        self.out = Linear(ch * freq, args.d_model)
        self._relu_after = {0} | {2 * i for i in range(1, self._sampling_num)}

    def __call__(self, x, lengths):
        # x: (B, T, F) → (B, T, F, 1) NHWC
        for _ in range(self._sampling_num):
            lengths = (lengths + 2 * self._padding - self._kernel) // self._stride + 1
        h = x[..., None]
        # conv list: [full, (dw, pw)*]; ReLU after full and after each pw
        i = 0
        h = jax.nn.relu(self.conv[0](h))
        i = 1
        while i < len(self.conv):
            h = self.conv[i](h)  # depthwise
            h = jax.nn.relu(self.conv[i + 1](h))  # pointwise + relu
            i += 2
        B, T, F, C = h.shape
        h = jnp.swapaxes(h, 2, 3).reshape(B, T, C * F)
        return self.out(h), lengths


class Conformer(Module):
    def __init__(self, args: ConformerArgs):
        if args.self_attention_model == "rel_pos":
            self.pos_enc = RelPositionalEncoding(
                args.d_model, args.pos_emb_max_len, args.xscaling
            )
        if args.subsampling_factor > 1:
            self.pre_encode = DwStridingSubsampling(args)
        else:
            self.pre_encode = Linear(args.feat_in, args.d_model)
        self.layers = [ConformerBlock(args) for _ in range(args.n_layers)]

    def __call__(self, x, lengths: Optional[jax.Array] = None):
        if lengths is None:
            lengths = jnp.full((x.shape[0],), x.shape[-2], jnp.int32)
        if isinstance(self.pre_encode, DwStridingSubsampling):
            x, lengths = self.pre_encode(x, lengths)
        else:
            x = self.pre_encode(x)
        pos_emb = None
        if hasattr(self, "pos_enc"):
            x, pos_emb = self.pos_enc(x)
        # mask padded key positions (bucketed-length inputs)
        T = x.shape[1]
        mask = (jnp.arange(T)[None, None, None, :] >= lengths[:, None, None, None])
        for layer in self.layers:
            x = layer(x, pos_emb=pos_emb, mask=mask)
        return x, lengths
