"""SAM-Audio DiT: AdaLN-table diffusion transformer with cross-attention.

TPU-native re-implementation of the reference
mlx_audio/sts/models/sam_audio/transformer.py:15-565 and patcher.py:10-280.
Channels-last throughout; the rope is the 2×2 interleaved-pair rotation
computed in-graph (reference rope.py:10-160); attention keeps SAM's
non-standard (B, T, C/H, H) head split — required for checkpoint parity.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ....nn import layers as nn
from ....nn.module import Module
from ....ops import scaled_dot_product_attention
from .config import TransformerConfig

__all__ = ["DiT", "DiTBlock", "Patcher", "TimestepEmbedder"]


def _nonlinearity(kind: str) -> Callable:
    return {"relu": jax.nn.relu, "gelu": jax.nn.gelu, "silu": jax.nn.silu,
            "approx_gelu": lambda x: jax.nn.gelu(x, approximate=True),
            }.get(kind, jax.nn.silu)


# ---------------------------------------------------------------- patcher
class PaddedConv1d(Module):
    """Conv with centered asymmetric padding + stride alignment
    (reference patcher.py:78-150). x: (B, T, C)."""

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: int, stride: int = 1, dilation: int = 1,
                 bias: bool = True):
        self.kernel_size = kernel_size
        self.stride = stride
        self.dilation = dilation
        self.conv = nn.Conv1d(in_channels, out_channels, kernel_size,
                              stride=stride, dilation=dilation, bias=bias)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        T = x.shape[1]
        eff_k = (self.kernel_size - 1) * self.dilation + 1
        total = eff_k - self.stride
        n_frames = (T - eff_k + total) / self.stride + 1
        ideal = (math.ceil(n_frames) - 1) * self.stride + eff_k - total
        extra = int(ideal - T)
        pad_r = total // 2
        pad_l = total - pad_r
        return self.conv(jnp.pad(x, ((0, 0), (pad_l, pad_r + extra),
                                     (0, 0))))


class ConvBlock1d(Module):
    """GroupNorm → SiLU → conv (reference patcher.py:152-183)."""

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: int = 3, num_groups: int = 8):
        self.groupnorm = nn.GroupNorm(num_groups, in_channels)
        self.project = PaddedConv1d(in_channels, out_channels, kernel_size)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.project(jax.nn.silu(self.groupnorm(x)))


class ResnetBlock1d(Module):
    """Two ConvBlocks + residual projection
    (reference patcher.py:185-229)."""

    def __init__(self, in_channels: int, out_channels: int,
                 num_groups: int = 8):
        self.block1 = ConvBlock1d(in_channels, out_channels,
                                  num_groups=num_groups)
        self.block2 = ConvBlock1d(out_channels, out_channels,
                                  num_groups=num_groups)
        if in_channels != out_channels:
            self.to_out = PaddedConv1d(in_channels, out_channels, 1)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.block2(self.block1(x))
        if hasattr(self, "to_out"):
            x = self.to_out(x)
        return h + x


class Patcher(Module):
    """ResNet block + patch-fold (reference patcher.py:232-280).
    x: (B, T, C) → (B, T/p, C·p)."""

    def __init__(self, in_channels: int, out_channels: int,
                 patch_size: int):
        assert out_channels % patch_size == 0
        self.patch_size = patch_size
        self.block = ResnetBlock1d(in_channels,
                                   out_channels // patch_size, num_groups=1)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.block(x)
        if self.patch_size == 1:
            return x
        B, T, C = x.shape
        # (B, T/p, p, C) → (B, T/p, C·p) with channel-major patch order
        x = x.reshape(B, T // self.patch_size, self.patch_size, C)
        return x.transpose(0, 1, 3, 2).reshape(
            B, T // self.patch_size, C * self.patch_size)


# ------------------------------------------------------------------ rope
def rope_rotation(seq_len: int, head_dim: int, theta: float) -> jnp.ndarray:
    """cos/sin tables for interleaved-pair rotation → (T, dim/2) each
    (reference rope.py:75-118)."""
    freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                             / head_dim))
    ang = jnp.arange(seq_len, dtype=jnp.float32)[:, None] * freqs[None, :]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope_pairs(x: jnp.ndarray, cos: jnp.ndarray,
                     sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, T, D) with adjacent-pair layout
    (reference rope.py:120-160)."""
    x2 = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    c = cos[None, None]  # (1, 1, T, D/2)
    s = sin[None, None]
    out0 = x2[..., 0] * c - x2[..., 1] * s
    out1 = x2[..., 0] * s + x2[..., 1] * c
    return jnp.stack([out0, out1], axis=-1).reshape(x.shape).astype(x.dtype)


# ------------------------------------------------------------- attention
class Attention(Module):
    """SAM head-split attention: (B, T, C) → (B, T, C/H, H) → (B, H, T, C/H)
    (reference transformer.py:76-188 — the non-standard order is load-
    bearing for checkpoint parity)."""

    def __init__(self, dim: int, head_dim: int, n_heads: int,
                 n_kv_heads: int, norm_eps: float = 1e-5,
                 use_qk_norm: bool = False, fc_bias: bool = False):
        self.head_dim = head_dim
        self.n_heads = n_heads
        self.n_kv_heads = n_kv_heads
        self.wq = nn.Linear(dim, n_heads * head_dim, bias=fc_bias)
        self.wk = nn.Linear(dim, n_kv_heads * head_dim, bias=fc_bias)
        self.wv = nn.Linear(dim, n_kv_heads * head_dim, bias=fc_bias)
        self.wo = nn.Linear(n_heads * head_dim, dim, bias=fc_bias)
        if use_qk_norm:
            self.q_norm = nn.RMSNorm(head_dim, eps=norm_eps)
            self.k_norm = nn.RMSNorm(head_dim, eps=norm_eps)

    def _split(self, x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
        B, T, C = x.shape
        return x.reshape(B, T, C // n_heads, n_heads).transpose(0, 3, 1, 2)

    def __call__(self, x: jnp.ndarray,
                 cross_x: Optional[jnp.ndarray] = None,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 rope: Optional[tuple] = None) -> jnp.ndarray:
        B, T, _ = x.shape
        src = cross_x if cross_x is not None else x
        q = self._split(self.wq(x), self.n_heads)
        k = self._split(self.wk(src), self.n_kv_heads)
        v = self._split(self.wv(src), self.n_kv_heads)
        if hasattr(self, "q_norm"):
            q = self.q_norm(q)
            k = self.k_norm(k)
        if rope is not None and cross_x is None:
            cos, sin = rope
            q = apply_rope_pairs(q, cos, sin)
            k = apply_rope_pairs(k, cos, sin)
        mask = None
        if key_padding_mask is not None:
            mask = jnp.where(key_padding_mask[:, None, None, :].astype(bool),
                             0.0, -jnp.inf)
        out = scaled_dot_product_attention(q, k, v, mask=mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, -1)
        return self.wo(out)


class _SwiGLUProj(Module):
    """w1/w3 gate + w2 (reference transformer.py:43-74)."""

    def __init__(self, in_dim: int, out_dim: int, non_linearity: str,
                 fc_bias: bool = False):
        self.swiglu = non_linearity == "swiglu"
        self.w1 = nn.Linear(in_dim, out_dim, bias=fc_bias)
        self.w2 = nn.Linear(out_dim, out_dim, bias=fc_bias)
        if self.swiglu:
            self.w3 = nn.Linear(in_dim, out_dim, bias=fc_bias)
        else:
            self.act = _nonlinearity(non_linearity)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.w1(x)
        h = jax.nn.silu(h) * self.w3(x) if self.swiglu else self.act(h)
        return self.w2(h)


class FeedForward(Module):
    """SwiGLU FFN with rounded hidden dim
    (reference transformer.py:191-231)."""

    def __init__(self, dim: int, hidden_dim: int,
                 ffn_dim_multiplier: float = 1.0, multiple_of: int = 64,
                 non_linearity: str = "swiglu", fc_bias: bool = False):
        self.swiglu = non_linearity == "swiglu"
        if self.swiglu:
            hidden_dim = int(2 * hidden_dim / 3)
        hidden_dim = int(ffn_dim_multiplier * hidden_dim)
        hidden_dim = multiple_of * ((hidden_dim + multiple_of - 1)
                                    // multiple_of)
        self.w1 = nn.Linear(dim, hidden_dim, bias=fc_bias)
        self.w2 = nn.Linear(hidden_dim, dim, bias=fc_bias)
        if self.swiglu:
            self.w3 = nn.Linear(dim, hidden_dim, bias=fc_bias)
        else:
            self.act = _nonlinearity(non_linearity)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.w1(x)
        h = jax.nn.silu(h) * self.w3(x) if self.swiglu else self.act(h)
        return self.w2(h)


class TimestepEmbedder(Module):
    """Sinusoidal t-embedding + projection
    (reference transformer.py:234-276)."""

    def __init__(self, dim: int, freq_dim: int, non_linearity: str,
                 fc_bias: bool = False, max_period: int = 10000):
        self.freq_dim = freq_dim
        self.max_period = max_period
        self.projection = _SwiGLUProj(freq_dim, dim, non_linearity, fc_bias)

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.freq_dim // 2
        freqs = jnp.exp(-math.log(self.max_period)
                        * jnp.arange(half, dtype=jnp.float32) / half)
        args = t[:, None].astype(jnp.float32) * freqs[None, :]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        return self.projection(emb)


class ContextEmbedder(Module):
    """Memory projection (reference transformer.py:279-309)."""

    def __init__(self, in_dim: int, out_dim: int, non_linearity: str,
                 fc_bias: bool = False, norm_eps: float = 1e-5,
                 context_norm: bool = False):
        if context_norm:
            self.norm = nn.RMSNorm(in_dim, eps=norm_eps)
        self.projection = _SwiGLUProj(in_dim, out_dim, non_linearity,
                                      fc_bias)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if hasattr(self, "norm"):
            x = self.norm(x)
        return self.projection(x)


class DiTBlock(Module):
    """AdaLN-table DiT block with cross-attention
    (reference transformer.py:312-420)."""

    def __init__(self, dim: int, n_heads: int, norm_eps: float = 1e-5,
                 qk_norm: bool = False, fc_bias: bool = False,
                 ffn_exp: int = 1, ffn_dim_multiplier: float = 4.0,
                 multiple_of: int = 64, non_linearity: str = "silu",
                 no_cross_attention: bool = False):
        head_dim = dim // n_heads
        self.attention = Attention(dim, head_dim, n_heads, n_heads,
                                   norm_eps, qk_norm, fc_bias)
        self.feed_forward = FeedForward(
            dim, int(ffn_exp * dim), ffn_dim_multiplier, multiple_of,
            non_linearity, fc_bias)
        self.attention_norm = nn.RMSNorm(dim, eps=norm_eps)
        self.ffn_norm = nn.RMSNorm(dim, eps=norm_eps)
        if not no_cross_attention:
            self.cross_attention = Attention(dim, head_dim, n_heads,
                                             n_heads, norm_eps, qk_norm,
                                             fc_bias)
        self.scale_shift_table = (
            jax.random.normal(jax.random.PRNGKey(0), (6, dim))
            / dim ** 0.5)

    def __call__(self, x: jnp.ndarray, cross_x: Optional[jnp.ndarray],
                 t: jnp.ndarray, padding_mask: Optional[jnp.ndarray],
                 memory_padding_mask: Optional[jnp.ndarray],
                 rope: Optional[tuple]) -> jnp.ndarray:
        biases = (self.scale_shift_table[None].astype(x.dtype)
                  + t.reshape(x.shape[0], 6, -1).astype(x.dtype))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(biases, 6, axis=1)
        h = self.attention_norm(x) * (1 + scale_msa) + shift_msa
        h = x + self.attention(h, key_padding_mask=padding_mask,
                               rope=rope) * gate_msa
        if hasattr(self, "cross_attention") and cross_x is not None:
            h = h + self.cross_attention(
                h, cross_x=cross_x, key_padding_mask=memory_padding_mask)
        hm = self.ffn_norm(h) * (1 + scale_mlp) + shift_mlp
        return h + self.feed_forward(hm) * gate_mlp


class DiT(Module):
    """Diffusion transformer (reference transformer.py:423-565).

    x: (B, T, dim) (pre-projected), time (B,), memory (B, M, context_dim)
    → (B, T, out_channels)."""

    def __init__(self, config: TransformerConfig):
        self.config = config
        self.use_rope = config.use_rope
        self.rope_theta = float(max(10000, 2 * config.max_positions))
        self.head_dim = config.dim // config.n_heads
        self.layers = [
            DiTBlock(config.dim, config.n_heads, config.norm_eps,
                     config.qk_norm, config.fc_bias, config.ffn_exp,
                     config.ffn_dim_multiplier, config.multiple_of,
                     config.non_linearity)
            for _ in range(config.n_layers)]
        self.norm = nn.RMSNorm(config.dim, eps=config.norm_eps)
        self.output = nn.Linear(config.dim, config.out_channels,
                                bias=config.fc_bias)
        self.x_embedder = Patcher(config.dim, config.dim, patch_size=1)
        self.y_embedder = ContextEmbedder(
            config.context_dim, config.dim, config.context_non_linearity,
            config.fc_bias, config.norm_eps, config.context_norm)
        self.t_embedder = TimestepEmbedder(
            config.dim, config.frequency_embedding_dim,
            config.timestep_non_linearity, config.fc_bias)
        self.t_block_non_linearity = _nonlinearity(
            config.t_block_non_linearity)
        self.t_block = nn.Linear(config.dim, config.dim * 6,
                                 bias=config.t_block_bias)
        self.final_layer_scale_shift_table = (
            jax.random.normal(jax.random.PRNGKey(1), (2, config.dim))
            / config.dim ** 0.5)

    def __call__(self, x: jnp.ndarray, time: jnp.ndarray,
                 padding_mask: Optional[jnp.ndarray] = None,
                 memory: Optional[jnp.ndarray] = None,
                 memory_padding_mask: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        h = self.x_embedder(x)
        N = h.shape[1]
        # time path computes in f32, then joins the model dtype — an f32
        # modulation would silently upcast every block (HBM blow-up)
        t = self.t_embedder(time).astype(h.dtype)
        t0 = self.t_block(self.t_block_non_linearity(t))
        y = self.y_embedder(memory).astype(h.dtype) \
            if memory is not None else None
        rope = rope_rotation(N, self.head_dim, self.rope_theta) \
            if self.use_rope else None
        for layer in self.layers:
            h = layer(h, y, t0, padding_mask, memory_padding_mask, rope)
        shift, scale = jnp.split(
            self.final_layer_scale_shift_table[None].astype(h.dtype)
            + t[:, None], 2, axis=1)
        h = self.norm(h) * (1 + scale) + shift
        out = self.output(h)
        return out[:, -N:] if out.shape[1] != N else out
