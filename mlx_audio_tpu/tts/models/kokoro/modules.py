"""Kokoro prosody/text-encoder modules.

Behavioral spec: reference tts/models/kokoro/modules.py (TextEncoder :21,
ProsodyPredictor :288, DurationEncoder :380, AdaLayerNorm :71). This
implementation is channels-last (B, T, C) end-to-end — the reference
transposes around every conv/norm for MLX's mixed conventions; on TPU we
keep the lane dimension = channels throughout and fold weight-norm at load
(so `ConvWeighted` becomes a plain Conv1d here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ....nn import BiLSTM, Conv1d, ConvTranspose1d, Embedding, InstanceNorm, LayerNorm, Linear, Module

__all__ = [
    "TextEncoder",
    "DurationEncoder",
    "ProsodyPredictor",
    "AdaLayerNorm",
    "AdaIN1d",
    "AdainResBlk1d",
]


def leaky_relu(x, slope=0.2):
    return jax.nn.leaky_relu(x, slope)


class TextEncoder(Module):
    """embedding → depth×(conv+LN+LeakyReLU) → BiLSTM, masked. (B,T)→(B,T,C)."""

    def __init__(self, channels: int, kernel_size: int, depth: int, n_symbols: int):
        self.embedding = Embedding(n_symbols, channels)
        padding = (kernel_size - 1) // 2
        self.cnn = [
            [
                Conv1d(channels, channels, kernel_size, padding=padding),
                LayerNorm(channels),
            ]
            for _ in range(depth)
        ]
        self.lstm = BiLSTM(channels, channels // 2)

    def __call__(self, x: jax.Array, input_lengths, mask: jax.Array) -> jax.Array:
        # mask: (B, T) True at padded positions
        m = mask[..., None]
        x = self.embedding(x)
        x = jnp.where(m, 0.0, x)
        for conv, norm in self.cnn:
            x = leaky_relu(norm(conv(x)))
            x = jnp.where(m, 0.0, x)
        x = self.lstm(x, valid_len=input_lengths)
        return jnp.where(m, 0.0, x)


class AdaLayerNorm(Module):
    """LayerNorm over channels with style-conditioned affine."""

    def __init__(self, style_dim: int, channels: int, eps: float = 1e-5):
        self.fc = Linear(style_dim, channels * 2)
        self.eps = eps

    def __call__(self, x: jax.Array, s: jax.Array) -> jax.Array:
        # x: (B, T, C); s: (B, style)
        h = self.fc(s)
        gamma, beta = jnp.split(h, 2, axis=-1)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        out = (1 + gamma[:, None, :]) * xf + beta[:, None, :]
        return out.astype(x.dtype)


class DurationEncoder(Module):
    """nlayers × (BiLSTM → AdaLayerNorm), style concatenated at each stage.

    Input (B, T, d_model), output (B, T, d_model + sty_dim).
    """

    def __init__(self, sty_dim: int, d_model: int, nlayers: int, dropout: float = 0.1):
        self.lstms = []
        for _ in range(nlayers):
            self.lstms.append(BiLSTM(d_model + sty_dim, d_model // 2))
            self.lstms.append(AdaLayerNorm(sty_dim, d_model))
        self.d_model = d_model
        self.sty_dim = sty_dim

    def __call__(self, x, style, text_lengths, mask):
        # x: (B, T, d_model); style: (B, sty); mask: (B, T) True=pad
        B, T, _ = x.shape
        m = mask[..., None]
        s = jnp.broadcast_to(style[:, None, :], (B, T, self.sty_dim)).astype(x.dtype)
        x = jnp.concatenate([x, s], axis=-1)
        x = jnp.where(m, 0.0, x)
        for block in self.lstms:
            if isinstance(block, AdaLayerNorm):
                x = block(x, style)
                x = jnp.concatenate([x, s], axis=-1)
                x = jnp.where(m, 0.0, x)
            else:
                x = block(x, valid_len=text_lengths)  # (B, T, d_model)
        return x  # (B, T, d_model + sty)


def valid_len_at(T: int, valid_frac) -> "jax.Array | None":
    """Valid length at a temporal resolution T given a per-row valid
    fraction (B,) — every stage of the decode path is an integer up/down
    sampling of the frame axis, so the fraction is resolution-invariant."""
    if valid_frac is None:
        return None
    return jnp.round(valid_frac * T).astype(jnp.int32)


class AdaIN1d(Module):
    """Instance-norm over time + style-conditioned affine (channels-last)."""

    def __init__(self, style_dim: int, num_features: int):
        self.norm = InstanceNorm(num_features, affine=False)
        self.fc = Linear(style_dim, num_features * 2)

    def __call__(self, x: jax.Array, s: jax.Array, valid_len=None) -> jax.Array:
        # x: (B, T, C)
        h = self.fc(s)
        gamma, beta = jnp.split(h[:, None, :], 2, axis=-1)
        return (1 + gamma) * self.norm(x, valid_len) + beta


class UpSampleNearest2x(Module):
    def __call__(self, x: jax.Array) -> jax.Array:
        # (B, T, C) → (B, 2T, C)
        return jnp.repeat(x, 2, axis=1)


class AdainResBlk1d(Module):
    """StyleTTS2 AdaIN residual block (reference istftnet.py:825), channels-last.

    With upsample: depthwise transposed conv (stride 2) + left-pad 1 on the
    residual path, nearest-2x on the shortcut.
    """

    def __init__(
        self,
        dim_in: int,
        dim_out: int,
        style_dim: int = 64,
        upsample: bool = False,
        dropout_p: float = 0.0,
    ):
        self.upsample_type = upsample
        self.learned_sc = dim_in != dim_out
        self.conv1 = Conv1d(dim_in, dim_out, 3, padding=1)
        self.conv2 = Conv1d(dim_out, dim_out, 3, padding=1)
        self.norm1 = AdaIN1d(style_dim, dim_in)
        self.norm2 = AdaIN1d(style_dim, dim_out)
        if self.learned_sc:
            self.conv1x1 = Conv1d(dim_in, dim_out, 1, bias=False)
        if upsample:
            self.pool = ConvTranspose1d(
                dim_in, dim_in, 3, stride=2, padding=1, groups=dim_in
            )

    def _shortcut(self, x):
        if self.upsample_type:
            x = jnp.repeat(x, 2, axis=1)
        if self.learned_sc:
            x = self.conv1x1(x)
        return x

    def _residual(self, x, s, valid_frac=None):
        x = leaky_relu(self.norm1(x, s, valid_len_at(x.shape[1], valid_frac)))
        if self.upsample_type:
            x = self.pool(x)  # (B, 2T-1, C)
            x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))
        x = self.conv1(x)
        x = leaky_relu(self.norm2(x, s, valid_len_at(x.shape[1], valid_frac)))
        return self.conv2(x)

    def __call__(self, x, s, valid_frac=None):
        return (
            self._residual(x, s, valid_frac) + self._shortcut(x)
        ) / jnp.sqrt(2.0).astype(x.dtype)


class ProsodyPredictor(Module):
    """Duration/F0/energy predictor (reference modules.py:288)."""

    def __init__(self, style_dim: int, d_hid: int, nlayers: int, max_dur: int = 50,
                 dropout: float = 0.1):
        self.text_encoder = DurationEncoder(
            sty_dim=style_dim, d_model=d_hid, nlayers=nlayers, dropout=dropout
        )
        self.lstm = BiLSTM(d_hid + style_dim, d_hid // 2)
        self.duration_proj = Linear(d_hid, max_dur)
        self.shared = BiLSTM(d_hid + style_dim, d_hid // 2)
        self.F0 = [
            AdainResBlk1d(d_hid, d_hid, style_dim, dropout_p=dropout),
            AdainResBlk1d(d_hid, d_hid // 2, style_dim, upsample=True, dropout_p=dropout),
            AdainResBlk1d(d_hid // 2, d_hid // 2, style_dim, dropout_p=dropout),
        ]
        self.N = [
            AdainResBlk1d(d_hid, d_hid, style_dim, dropout_p=dropout),
            AdainResBlk1d(d_hid, d_hid // 2, style_dim, upsample=True, dropout_p=dropout),
            AdainResBlk1d(d_hid // 2, d_hid // 2, style_dim, dropout_p=dropout),
        ]
        self.F0_proj = Conv1d(d_hid // 2, 1, 1)
        self.N_proj = Conv1d(d_hid // 2, 1, 1)

    def F0Ntrain(self, en: jax.Array, s: jax.Array, valid_frac=None):
        # en: (B, T_frames, d_hid+sty) channels-last
        x = self.shared(en, valid_len=valid_len_at(en.shape[1], valid_frac))
        F0 = x
        for block in self.F0:
            F0 = block(F0, s, valid_frac)
        F0 = self.F0_proj(F0)[..., 0]  # (B, 2T)
        N = x
        for block in self.N:
            N = block(N, s, valid_frac)
        N = self.N_proj(N)[..., 0]
        return F0, N
