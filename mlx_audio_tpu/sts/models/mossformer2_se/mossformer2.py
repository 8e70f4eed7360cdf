"""MossFormer2 mask network for 48 kHz speech enhancement.

TPU-native re-implementation of the reference
mlx_audio/sts/models/mossformer2_se/* (mossformer_masknet.py,
mossformerblock_gfsmn.py, flash_sharea_ffconvm.py, gated_fsmn.py,
unideepfsmn.py, convmodule.py, offsetscale.py, scalenorm.py,
scaledsinuembedding.py, globallayernorm.py).

Everything is channels-last (B, T, C). The quadratic ReLU²-attention branch
— the reference's hand-written Metal kernel
(flash_attention_kernels.py:14-184) — runs as a Pallas TPU kernel when
enabled, with an identical lax einsum fallback.
"""

from __future__ import annotations

import math
import os
from typing import List, Optional

import jax
import jax.numpy as jnp

from ....nn import layers as nn
from ....nn.module import Module
from ....ops import pallas as pallas_ops
from ....ops.pallas.relu2_attention import relu2_attention_reference

__all__ = ["MossFormerMaskNet", "MossFormer2SE", "TestNet"]


# ---------------------------------------------------------------------------
# small layers
# ---------------------------------------------------------------------------
class ScaleNorm(Module):
    """L2 norm scaling (reference scalenorm.py:5-41)."""

    def __init__(self, dim: int, eps: float = 1e-8):
        self.scale = dim**-0.5
        self.eps = eps
        self.g = jnp.ones((1,))

    def __call__(self, x):
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) * self.scale
        return x * (self.g / jnp.maximum(norm, self.eps))


class GlobalLayerNorm(Module):
    """gLN over (T, C) jointly (reference globallayernorm.py:5-99).
    x: (B, T, C)."""

    def __init__(self, dim: int, eps: float = 1e-8):
        self.weight = jnp.ones((dim, 1))
        self.bias = jnp.zeros((dim, 1))
        self.eps = eps

    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=(1, 2), keepdims=True)
        w = self.weight.reshape(1, 1, -1)
        b = self.bias.reshape(1, 1, -1)
        return w * (x - mean) * jax.lax.rsqrt(var + self.eps) + b


class CLayerNorm(Module):
    """Per-step LayerNorm (reference gated_fsmn_block.py:7-55)."""

    def __init__(self, dim: int, eps: float = 1e-8):
        self.weight = jnp.ones((dim,))
        self.bias = jnp.zeros((dim,))
        self.eps = eps

    def __call__(self, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * self.weight + self.bias


class ScaledSinuEmbedding(Module):
    """Learnable-scale sinusoidal positions (reference
    scaledsinuembedding.py:5-87)."""

    def __init__(self, dim: int):
        self.scale = jnp.ones((1,))
        self._inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, dim, 2,
                                                       dtype=jnp.float32) / dim))

    def __call__(self, x):
        T = x.shape[1]
        sinu = jnp.arange(T, dtype=jnp.float32)[:, None] * self._inv_freq
        emb = jnp.concatenate([jnp.sin(sinu), jnp.cos(sinu)], axis=-1)
        return emb * self.scale


class OffsetScale(Module):
    """Per-head affine (reference offsetscale.py:7-59)."""

    def __init__(self, dim: int, heads: int = 1):
        self.gamma = jnp.ones((heads, dim))
        self.beta = jnp.zeros((heads, dim))
        self.heads = heads

    def __call__(self, x) -> List[jnp.ndarray]:
        out = x[..., None, :] * self.gamma + self.beta
        return [out[..., h, :] for h in range(self.heads)]


class ConvModule(Module):
    """Depthwise conv with residual (reference convmodule.py:7-69).
    Weight (C, K, 1) — depthwise; SURVEY §2.3 hot op (XLA lowers this to a
    fused depthwise conv on TPU)."""

    def __init__(self, in_channels: int, kernel_size: int = 17):
        self.weight = jnp.zeros((in_channels, kernel_size, 1))
        self.padding = (kernel_size - 1) // 2
        self.in_channels = in_channels

    def __call__(self, x):
        y = jax.lax.conv_general_dilated(
            x, self.weight, window_strides=(1,),
            padding=[(self.padding, self.padding)],
            dimension_numbers=("NLC", "OLI", "NLC"),
            feature_group_count=self.in_channels)
        return x + y


class FFConvM(Module):
    """norm → linear → silu → conv_module (reference ffconvm.py:8-88)."""

    def __init__(self, dim_in: int, dim_out: int, norm: str = "scalenorm"):
        self.norm = (nn.LayerNorm(dim_in) if norm == "layernorm"
                     else ScaleNorm(dim_in))
        self.linear = nn.Linear(dim_in, dim_out)
        self.conv_module = ConvModule(dim_out)

    def __call__(self, x):
        return self.conv_module(jax.nn.silu(self.linear(self.norm(x))))


# ---------------------------------------------------------------------------
# FSMN
# ---------------------------------------------------------------------------
class UniDeepFsmn(Module):
    """Depthwise time-memory FSMN (reference unideepfsmn.py:7-123)."""

    def __init__(self, input_dim: int, output_dim: int, lorder: int = 20,
                 hidden_size: Optional[int] = None):
        hidden_size = hidden_size or output_dim
        self.input_dim = input_dim
        self.output_dim = output_dim
        self.lorder = lorder
        self.linear = nn.Linear(input_dim, hidden_size)
        self.project = nn.Linear(hidden_size, output_dim, bias=False)
        # depthwise conv over time, kernel 2·lorder-1, same padding
        self._kernel = 2 * lorder - 1
        self.conv1 = jnp.zeros((output_dim, self._kernel, 1))

    def __call__(self, x):
        p1 = self.project(jax.nn.relu(self.linear(x)))
        pad = self.lorder - 1
        mem = jax.lax.conv_general_dilated(
            p1, self.conv1, window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NLC", "OLI", "NLC"),
            feature_group_count=self.output_dim)
        out = p1 + mem
        if self.input_dim == self.output_dim:
            return x + out
        return out


class GatedFSMN(Module):
    """gate · fsmn(u) + x (reference gated_fsmn.py:7-116)."""

    def __init__(self, in_channels: int, out_channels: int, lorder: int,
                 hidden_size: int):
        self.to_u = FFConvM(in_channels, hidden_size, norm="layernorm")
        self.to_v = FFConvM(in_channels, hidden_size, norm="layernorm")
        self.fsmn = UniDeepFsmn(in_channels, out_channels, lorder, hidden_size)

    def __call__(self, x):
        return self.to_v(x) * self.fsmn(self.to_u(x)) + x


class GatedFSMNBlock(Module):
    """conv1 → PReLU → norm → gated FSMN → norm → conv2 + residual
    (reference gated_fsmn_block.py:58-160)."""

    def __init__(self, dim: int, inner_channels: int = 256):
        self.conv1 = nn.Conv1d(dim, inner_channels, 1)
        self.prelu_weight = jnp.full((1,), 0.25)
        self.norm1 = CLayerNorm(inner_channels)
        self.norm2 = CLayerNorm(inner_channels)
        self.gated_fsmn = GatedFSMN(inner_channels, inner_channels, 20,
                                    inner_channels)
        self.conv2 = nn.Conv1d(inner_channels, dim, 1)

    def __call__(self, x):
        h = self.conv1(x)
        h = jnp.where(h >= 0, h, self.prelu_weight * h)
        h = self.norm1(h)
        h = self.gated_fsmn(h)
        h = self.norm2(h)
        return self.conv2(h) + x


# ---------------------------------------------------------------------------
# FLASH attention layer
# ---------------------------------------------------------------------------
def _rope_rotate(x: jnp.ndarray, dims: int, base: float = 10000.0):
    """Rotate the first `dims` features, rotate-half layout, position =
    sequence index (matches torch.nn.RoPE(traditional=False))."""
    T = x.shape[-2]
    half = dims // 2
    freqs = base ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = jnp.arange(T, dtype=jnp.float32)[:, None] * freqs[None, :]
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x_rot, x_pass = x[..., :dims], x[..., dims:]
    x1, x2 = x_rot[..., :half], x_rot[..., half:]
    rot = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return jnp.concatenate([rot, x_pass], axis=-1)


class FlashShareAFFConvM(Module):
    """Shared dual (quadratic ReLU² + linear) attention
    (reference flash_sharea_ffconvm.py:11-378)."""

    def __init__(self, dim: int, group_size: int = 256,
                 query_key_dim: int = 128, expansion_factor: float = 4.0,
                 causal: bool = False, norm: str = "scalenorm",
                 shift_tokens: bool = True):
        self.group_size = group_size
        self.causal = causal
        self.shift_tokens = shift_tokens
        self.rope_dims = min(32, query_key_dim)
        hidden = int(dim * expansion_factor)
        self.to_hidden = FFConvM(dim, hidden, norm=norm)
        self.to_qk = FFConvM(dim, query_key_dim, norm=norm)
        self.qk_offset_scale = OffsetScale(query_key_dim, heads=4)
        self.to_out = FFConvM(dim * 2, dim, norm=norm)

    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        normed = x
        if self.shift_tokens:
            x_shift, x_pass = jnp.split(normed, 2, axis=-1)
            x_shift = jnp.pad(x_shift, ((0, 0), (1, 0), (0, 0)))[:, :-1]
            normed = jnp.concatenate([x_shift, x_pass], axis=-1)

        v, u = jnp.split(self.to_hidden(normed), 2, axis=-1)
        qk = self.to_qk(normed)
        quad_q, lin_q, quad_k, lin_k = self.qk_offset_scale(qk)
        att_v, att_u = self._attention(x, quad_q, lin_q, quad_k, lin_k, v, u,
                                       mask)
        out = (att_u * v) * jax.nn.sigmoid(att_v * u)
        return x + self.to_out(out)

    def _attention(self, x, quad_q, lin_q, quad_k, lin_k, v, u, mask):
        B, n = x.shape[0], x.shape[1]
        g = self.group_size
        if mask is not None:
            lin_k = lin_k * mask[..., None].astype(lin_k.dtype)

        quad_q = _rope_rotate(quad_q, self.rope_dims)
        lin_q = _rope_rotate(lin_q, self.rope_dims)
        quad_k = _rope_rotate(quad_k, self.rope_dims)
        lin_k = _rope_rotate(lin_k, self.rope_dims)

        pad = (-n) % g
        if pad:
            padfn = lambda t: jnp.pad(t, ((0, 0), (0, pad), (0, 0)))
            quad_q, quad_k, lin_q, lin_k = map(padfn,
                                               (quad_q, quad_k, lin_q, lin_k))
            v, u = padfn(v), padfn(u)
        G = (n + pad) // g
        grp = lambda t: t.reshape(B, G, g, t.shape[-1])
        quad_q, quad_k, lin_q, lin_k, v, u = map(grp, (quad_q, quad_k, lin_q,
                                                       lin_k, v, u))

        # Measured on v5e (scripts/bench_kernels.py, KERNEL_BENCH.md): XLA's
        # fused einsum beats the Pallas relu2 kernel at every group size
        # (0.4-0.8x), so the lax path is the default; the kernel remains for
        # forcing via MLX_AUDIO_TPU_FORCE_RELU2_KERNEL=1.
        if (pallas_ops.pallas_enabled()
                and os.environ.get("MLX_AUDIO_TPU_FORCE_RELU2_KERNEL")
                == "1"):
            quad_out_v = pallas_ops.relu2_attention(quad_q, quad_k, v, g)
            quad_out_u = pallas_ops.relu2_attention(quad_q, quad_k, u, g)
        else:
            quad_out_v = relu2_attention_reference(quad_q, quad_k, v, g)
            quad_out_u = relu2_attention_reference(quad_q, quad_k, u, g)

        if self.causal:
            lin_kv = jnp.einsum("bgnd,bgne->bgde", lin_k, v) / g
            lin_kv = jnp.cumsum(lin_kv, axis=1)
            lin_kv = jnp.pad(lin_kv, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :-1]
            lin_out_v = jnp.einsum("bgnd,bgde->bgne", lin_q, lin_kv)
            lin_ku = jnp.einsum("bgnd,bgne->bgde", lin_k, u) / g
            lin_ku = jnp.cumsum(lin_ku, axis=1)
            lin_ku = jnp.pad(lin_ku, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :-1]
            lin_out_u = jnp.einsum("bgnd,bgde->bgne", lin_q, lin_ku)
        else:
            lin_kv = jnp.einsum("bgnd,bgne->bde", lin_k, v) / n
            lin_out_v = jnp.einsum("bgnd,bde->bgne", lin_q, lin_kv)
            lin_ku = jnp.einsum("bgnd,bgne->bde", lin_k, u) / n
            lin_out_u = jnp.einsum("bgnd,bde->bgne", lin_q, lin_ku)

        ung = lambda t: t.reshape(B, G * g, t.shape[-1])[:, :n]
        return (ung(quad_out_v + lin_out_v), ung(quad_out_u + lin_out_u))


# ---------------------------------------------------------------------------
# blocks & mask net
# ---------------------------------------------------------------------------
class MossFormerBlockGFSMN(Module):
    """depth × (FLASH layer + gated FSMN block)
    (reference mossformerblock_gfsmn.py:9-130)."""

    def __init__(self, dim: int, depth: int, group_size: int = 256,
                 query_key_dim: int = 128, expansion_factor: float = 4.0,
                 causal: bool = False):
        self.fsmn = [GatedFSMNBlock(dim, 256) for _ in range(depth)]
        self.layers = [
            FlashShareAFFConvM(dim, group_size, query_key_dim,
                               expansion_factor, causal)
            for _ in range(depth)
        ]

    def __call__(self, x, mask=None):
        for layer, fsmn in zip(self.layers, self.fsmn):
            x = layer(x, mask=mask)
            x = fsmn(x)
        return x


class MossFormerM(Module):
    """block stack + final LayerNorm (reference mossformerm.py:8-102)."""

    def __init__(self, num_blocks: int, d_model: int, causal: bool = False,
                 group_size: int = 256, query_key_dim: int = 128,
                 expansion_factor: float = 4.0):
        self.mossformerM = MossFormerBlockGFSMN(
            d_model, num_blocks, group_size, query_key_dim, expansion_factor,
            causal)
        self.norm = nn.LayerNorm(d_model, eps=1e-8)

    def __call__(self, x):
        return self.norm(self.mossformerM(x))


class ComputationBlock(Module):
    """MossFormer + GroupNorm(1) + skip (reference computation_block.py:10-114)."""

    def __init__(self, num_blocks: int, out_channels: int,
                 skip_around_intra: bool = True):
        self.intra_mdl = MossFormerM(num_blocks=num_blocks,
                                     d_model=out_channels)
        self.intra_norm = nn.GroupNorm(1, out_channels, eps=1e-8)
        self.skip_around_intra = skip_around_intra

    def __call__(self, x):
        intra = self.intra_norm(self.intra_mdl(x))
        if self.skip_around_intra:
            intra = intra + x
        return intra


class MossFormerMaskNet(Module):
    """Mask prediction net (reference mossformer_masknet.py:9-223).
    Input fbank features (B, T, in_channels) → mask (B, T, out_final)."""

    def __init__(self, in_channels: int = 180, out_channels: int = 512,
                 out_channels_final: int = 961, num_blocks: int = 24,
                 num_spks: int = 2):
        self.num_spks = num_spks
        self.norm = GlobalLayerNorm(in_channels)
        self.conv1d_encoder = nn.Conv1d(in_channels, out_channels, 1,
                                        bias=False)
        self.pos_enc = ScaledSinuEmbedding(out_channels)
        self.mdl = ComputationBlock(num_blocks, out_channels)
        self.conv1d_out = nn.Conv1d(out_channels, out_channels * num_spks, 1)
        self.conv1_decoder = nn.Conv1d(out_channels, out_channels_final, 1,
                                       bias=False)
        self.prelu_weight = jnp.full((1,), 0.25)
        self.output = nn.Conv1d(out_channels, out_channels, 1)
        self.output_gate = nn.Conv1d(out_channels, out_channels, 1)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.norm(x)
        x = self.conv1d_encoder(x)
        x = x + self.pos_enc(x)[None]
        x = self.mdl(x)
        x = jnp.where(x >= 0, x, self.prelu_weight * x)
        x = self.conv1d_out(x)  # (B, T, C·spks)
        B, T, _ = x.shape
        # (B, T, spks·C) — torch reshapes (B, C·spks, T) → (B·spks, C, T);
        # channels-last equivalent: split the channel axis first
        x = x.reshape(B, T, self.num_spks, -1).transpose(0, 2, 1, 3)
        x = x.reshape(B * self.num_spks, T, -1)
        x = jnp.tanh(self.output(x)) * jax.nn.sigmoid(self.output_gate(x))
        x = self.conv1_decoder(x)
        x = jax.nn.relu(x)
        x = x.reshape(B, self.num_spks, T, -1)
        return x[:, 0]  # first speaker (B, T, out_final)


class TestNet(Module):
    """reference mossformer2_se_wrapper.py:9-67."""

    def __init__(self, in_channels: int = 180, out_channels: int = 512,
                 out_channels_final: int = 961, num_blocks: int = 24):
        self.mossformer = MossFormerMaskNet(in_channels, out_channels,
                                            out_channels_final, num_blocks)

    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        return [self.mossformer(x)]


class MossFormer2SE(Module):
    """reference mossformer2_se_wrapper.py:70-116."""

    def __init__(self, config=None):
        in_ch = getattr(config, "in_channels", 180)
        out_ch = getattr(config, "out_channels", 512)
        out_f = getattr(config, "out_channels_final", 961)
        nb = getattr(config, "num_blocks", 24)
        self.model = TestNet(in_ch, out_ch, out_f, nb)

    def __call__(self, x):
        return self.model(x)
