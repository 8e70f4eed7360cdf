"""Depthformer: per-frame codebook transformer for LFM2.5-Audio.

TPU-native re-implementation of the reference
mlx_audio/sts/models/lfm_audio/transformer.py:63-367. The per-frame
autoregression over 8 codebooks is depth ≤ 8, so steps recompute the tiny
causal sequence instead of carrying a cache — the whole frame stays inside
one jitted program (see model.py `_audio_frame`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ....nn import layers as nn
from ....nn.module import Module
from ....ops import scaled_dot_product_attention
from ....ops.rope import rope_cos_sin

__all__ = ["Depthformer", "DepthTransformerBlock"]


class _Attention(Module):
    """GQA + per-head q/k RMSNorm + interleaved-pair rope
    (reference transformer.py:85-174)."""

    def __init__(self, dim: int, num_heads: int, num_kv_heads: int,
                 rope_theta: float = 10000.0, use_qk_norm: bool = True):
        self.num_heads = num_heads
        self.num_kv = num_kv_heads
        self.head_dim = dim // num_heads
        self.rope_theta = rope_theta
        self.q_proj = nn.Linear(dim, num_heads * self.head_dim, bias=False)
        self.k_proj = nn.Linear(dim, num_kv_heads * self.head_dim,
                                bias=False)
        self.v_proj = nn.Linear(dim, num_kv_heads * self.head_dim,
                                bias=False)
        self.o_proj = nn.Linear(num_heads * self.head_dim, dim, bias=False)
        if use_qk_norm:
            self.q_norm = nn.RMSNorm(self.head_dim)
            self.k_norm = nn.RMSNorm(self.head_dim)

    def _rope(self, t: jnp.ndarray) -> jnp.ndarray:
        """Interleaved pairs (reference transformer.py:25-60).
        t: (B, T, H, D)."""
        T = t.shape[1]
        cos, sin = rope_cos_sin(jnp.arange(T), self.head_dim,
                                base=self.rope_theta)
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
        t2 = t.reshape(*t.shape[:-1], self.head_dim // 2, 2)
        tr = t2[..., 0]
        ti = t2[..., 1]
        out = jnp.stack([tr * cos - ti * sin, tr * sin + ti * cos],
                        axis=-1)
        return out.reshape(t.shape).astype(t.dtype)

    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, T, _ = x.shape
        hd = self.head_dim
        q = self.q_proj(x).reshape(B, T, self.num_heads, hd)
        k = self.k_proj(x).reshape(B, T, self.num_kv, hd)
        v = self.v_proj(x).reshape(B, T, self.num_kv, hd)
        if hasattr(self, "q_norm"):
            q = self.q_norm(q)
            k = self.k_norm(k)
        q = self._rope(q).transpose(0, 2, 1, 3)
        k = self._rope(k).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        out = scaled_dot_product_attention(
            q, k, v, mask=mask if mask is not None else "causal")
        return self.o_proj(out.transpose(0, 2, 1, 3).reshape(B, T, -1))


class _SwiGLU(Module):
    """2/3-rounded SwiGLU (reference transformer.py:63-82)."""

    def __init__(self, dim: int, hidden_dim: int, multiple_of: int = 256):
        hidden_dim = int(2 * hidden_dim / 3)
        hidden_dim = multiple_of * ((hidden_dim + multiple_of - 1)
                                    // multiple_of)
        self.w1 = nn.Linear(dim, hidden_dim, bias=False)
        self.w2 = nn.Linear(hidden_dim, dim, bias=False)
        self.w3 = nn.Linear(dim, hidden_dim, bias=False)

    def __call__(self, x):
        return self.w2(jax.nn.silu(self.w1(x)) * self.w3(x))


class DepthTransformerBlock(Module):
    """Pre-norm attention + SwiGLU (reference transformer.py:244-281)."""

    def __init__(self, dim: int, num_heads: int, num_kv_heads: int,
                 ff_dim: Optional[int] = None,
                 rope_theta: float = 10000.0):
        self.attn_norm = nn.RMSNorm(dim)
        self.attn = _Attention(dim, num_heads, num_kv_heads, rope_theta,
                               use_qk_norm=True)
        self.ffn_norm = nn.RMSNorm(dim)
        self.ffn = _SwiGLU(dim, ff_dim or dim * 4)

    def __call__(self, x, mask=None):
        x = x + self.attn(self.attn_norm(x), mask)
        return x + self.ffn(self.ffn_norm(x))


class Depthformer(Module):
    """Stack of depth blocks (reference transformer.py:316-367)."""

    def __init__(self, layers: int, dim: int, num_heads: int = 32,
                 num_kv_heads: int = 8, ff_dim: Optional[int] = None,
                 tie: bool = True):
        self.layers_count = layers
        self.dim = dim
        self.blocks = [
            DepthTransformerBlock(dim, num_heads, num_kv_heads, ff_dim)
            for _ in range(layers)]

    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        for block in self.blocks:
            x = block(x, mask)
        return x
