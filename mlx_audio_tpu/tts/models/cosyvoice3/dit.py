"""Diffusion Transformer (DiT) estimator for CosyVoice3 flow matching.

TPU-native re-implementation of the reference
mlx_audio/tts/models/cosyvoice3/dit.py:18-840. Everything is channels-last
(B, T, C) so the whole 22-block stack fuses into one XLA program; the
reference's channel-first transposes are dropped at the module boundary
(the flow wrapper feeds (B, T, C) directly). The per-timestep AdaLN
modulation is a (B, 6·D) linear — MXU-friendly, no dynamic shapes.
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp

from ....nn import layers as nn
from ....nn.module import Module
from ....ops import scaled_dot_product_attention

__all__ = ["DiT", "DiTBlock", "TimestepEmbedding", "chunk_attention_mask"]


def sinus_position_embedding(t: jnp.ndarray, dim: int,
                             scale: float = 1000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (reference dit.py:18-41). t: (B,)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / (half - 1))
    ang = scale * t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class TimestepEmbedding(Module):
    """Sinusoidal embed + 2-layer MLP (reference dit.py:44-69)."""

    def __init__(self, dim: int, freq_embed_dim: int = 256):
        self.freq_embed_dim = freq_embed_dim
        self.time_mlp_0 = nn.Linear(freq_embed_dim, dim)
        self.time_mlp_2 = nn.Linear(dim, dim)

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        h = sinus_position_embedding(t, self.freq_embed_dim)
        return self.time_mlp_2(jax.nn.silu(self.time_mlp_0(h)))


class CausalConvPositionEmbedding(Module):
    """Two left-padded grouped convs with Mish (reference dit.py:72-110).
    x: (B, T, D)."""

    def __init__(self, dim: int, kernel_size: int = 31, groups: int = 16):
        assert kernel_size % 2 != 0
        self.kernel_size = kernel_size
        self.conv1 = nn.Conv1d(dim, dim, kernel_size, groups=groups)
        self.conv2 = nn.Conv1d(dim, dim, kernel_size, groups=groups)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = ((0, 0), (self.kernel_size - 1, 0), (0, 0))
        h = self.conv1(jnp.pad(x, pad))
        h = h * jnp.tanh(jax.nn.softplus(h))  # mish
        h = self.conv2(jnp.pad(h, pad))
        return h * jnp.tanh(jax.nn.softplus(h))


class InputEmbedding(Module):
    """Project [x, cond, mu, spk] and add conv position embedding
    (reference dit.py:111-157)."""

    def __init__(self, mel_dim: int, text_dim: int, out_dim: int,
                 spk_dim: Optional[int] = None):
        self.spk_dim = spk_dim or 0
        self.proj = nn.Linear(mel_dim * 2 + text_dim + self.spk_dim, out_dim)
        self.conv_pos_embed = CausalConvPositionEmbedding(out_dim)

    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray,
                 text_embed: jnp.ndarray, spks: jnp.ndarray) -> jnp.ndarray:
        parts = [x, cond, text_embed]
        if self.spk_dim > 0:
            parts.append(jnp.broadcast_to(
                spks[:, None, :], (x.shape[0], x.shape[1], spks.shape[-1])))
        h = self.proj(jnp.concatenate(parts, axis=-1))
        return self.conv_pos_embed(h) + h


class FeedForward(Module):
    """Linear → GELU(tanh) → Linear (reference dit.py:182-210)."""

    def __init__(self, dim: int, mult: int = 4,
                 dim_out: Optional[int] = None):
        inner = int(dim * mult)
        self.ff_0_0 = nn.Linear(dim, inner)
        self.ff_2 = nn.Linear(inner, dim_out or dim)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.ff_2(jax.nn.gelu(self.ff_0_0(x), approximate=True))


class AdaLayerNormZero(Module):
    """AdaLN-Zero: 6-way modulation from the time embedding
    (reference dit.py:213-243)."""

    def __init__(self, dim: int):
        self.linear = nn.Linear(dim, dim * 6)
        self.norm = nn.LayerNorm(dim, affine=False, eps=1e-6)

    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray):
        mods = self.linear(jax.nn.silu(emb))  # (B, 6D)
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mods, 6, axis=-1)
        h = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return h, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormZeroFinal(Module):
    """Final AdaLN (shift + scale only, reference dit.py:246-269)."""

    def __init__(self, dim: int):
        self.linear = nn.Linear(dim, dim * 2)
        self.norm = nn.LayerNorm(dim, affine=False, eps=1e-6)

    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        scale, shift = jnp.split(self.linear(jax.nn.silu(emb)), 2, axis=-1)
        return self.norm(x) * (1 + scale[:, None]) + shift[:, None]


def _rope_angles(seq_len: int, dim: int,
                 base: float = 10000.0) -> jnp.ndarray:
    """x_transformers rope angles, interleaved pairs → (T, dim)
    (reference dit.py:272-418)."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32)
                               / dim))
    ang = jnp.arange(seq_len, dtype=jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.stack([ang, ang], axis=-1).reshape(seq_len, dim)


def _rotate_half_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    """(a, b, c, d, …) → (-b, a, -d, c, …) (reference dit.py:272-290)."""
    x2 = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    out = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1)
    return out.reshape(x.shape)


def apply_rope_flat(t: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Rotate only the first `angles.shape[-1]` dims of the flattened
    (B, T, H·Dh) tensor — the reference applies rope BEFORE the head split
    so only head 0 is rotated (reference dit.py:470-477, faithful to the
    released checkpoint's convention)."""
    rot = angles.shape[-1]
    t_rot, t_pass = t[..., :rot], t[..., rot:]
    a = angles[None].astype(t.dtype)
    t_rot = t_rot * jnp.cos(a) + _rotate_half_interleaved(t_rot) * jnp.sin(a)
    return jnp.concatenate([t_rot, t_pass], axis=-1)


def chunk_attention_mask(size: int, chunk_size: int) -> jnp.ndarray:
    """Boolean (size, size): position i attends j < (i//chunk+1)·chunk
    (reference dit.py:593-623)."""
    pos = jnp.arange(size)
    block_end = (pos // chunk_size + 1) * chunk_size
    return pos[None, :] < block_end[:, None]


class Attention(Module):
    """Self-attention with partial (head-0) rope (reference dit.py:418-525)."""

    def __init__(self, dim: int, heads: int = 8, dim_head: int = 64):
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        self.to_q = nn.Linear(dim, inner)
        self.to_k = nn.Linear(dim, inner)
        self.to_v = nn.Linear(dim, inner)
        self.to_out_0 = nn.Linear(inner, dim)

    def __call__(self, x: jnp.ndarray, rope_angles: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, N, _ = x.shape
        q = apply_rope_flat(self.to_q(x), rope_angles)
        k = apply_rope_flat(self.to_k(x), rope_angles)
        v = self.to_v(x)
        q = q.reshape(B, N, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        out = scaled_dot_product_attention(q, k, v, mask=mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, -1)
        return self.to_out_0(out)


class DiTBlock(Module):
    """AdaLN-Zero attention + gated FFN (reference dit.py:528-592)."""

    def __init__(self, dim: int, heads: int, dim_head: int,
                 ff_mult: int = 4):
        self.attn_norm = AdaLayerNormZero(dim)
        self.attn = Attention(dim, heads, dim_head)
        self.ff_norm = nn.LayerNorm(dim, affine=False, eps=1e-6)
        self.ff = FeedForward(dim, mult=ff_mult)

    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 rope_angles: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.attn_norm(x, t)
        x = x + gate_msa[:, None] * self.attn(h, rope_angles, mask)
        h = self.ff_norm(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        return x + gate_mlp[:, None] * self.ff(h)


class DiT(Module):
    """Flow-matching velocity estimator (reference dit.py:692-840).

    All inputs channels-last: x/cond (B, T, mel), mu (B, T, mu_dim),
    t (B,), spks (B, spk_dim) → (B, T, out_channels).
    """

    def __init__(self, dim: int = 1024, depth: int = 22, heads: int = 16,
                 dim_head: int = 64, ff_mult: int = 2, mel_dim: int = 80,
                 mu_dim: Optional[int] = None, spk_dim: Optional[int] = None,
                 out_channels: Optional[int] = None,
                 static_chunk_size: int = 50,
                 long_skip_connection: bool = False):
        self.dim = dim
        self.depth = depth
        self.dim_head = dim_head
        self.static_chunk_size = static_chunk_size
        self.time_embed = TimestepEmbedding(dim)
        self.input_embed = InputEmbedding(mel_dim, mu_dim or mel_dim, dim,
                                          spk_dim)
        self.transformer_blocks: List[DiTBlock] = [
            DiTBlock(dim, heads, dim_head, ff_mult) for _ in range(depth)]
        self.long_skip_connection = (
            nn.Linear(dim * 2, dim, bias=False) if long_skip_connection
            else None)
        self.norm_out = AdaLayerNormZeroFinal(dim)
        self.proj_out = nn.Linear(dim, out_channels or mel_dim)

    def __call__(self, x: jnp.ndarray, mu: jnp.ndarray, t: jnp.ndarray,
                 spks: jnp.ndarray, cond: jnp.ndarray,
                 streaming: bool = False) -> jnp.ndarray:
        B, N, _ = x.shape
        if t.ndim == 0:
            t = jnp.broadcast_to(t, (B,))
        h = self.input_embed(x, cond, mu, spks)
        # time path joins the model dtype — an f32 modulation would
        # silently upcast every AdaLN block
        temb = self.time_embed(t).astype(h.dtype)
        angles = _rope_angles(N, self.dim_head)
        mask = chunk_attention_mask(N, self.static_chunk_size) if streaming \
            else None
        residual = h if self.long_skip_connection is not None else None
        for block in self.transformer_blocks:
            h = block(h, temb, angles, mask)
        if self.long_skip_connection is not None:
            h = self.long_skip_connection(
                jnp.concatenate([h, residual], axis=-1))
        return self.proj_out(self.norm_out(h, temb))
