"""AdaLN-modulated MLP diffusion head for VibeVoice.

TPU-native re-implementation of the reference
mlx_audio/tts/models/vibevoice/diffusion_head.py:12-227. Pure MLP on
(B, latent) vectors — every op lands on the MXU; the whole head is called
2×B-batched (CFG) inside the jitted sampler.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ....nn import layers as nn
from ....nn.module import Module
from .config import DiffusionHeadConfig

__all__ = ["DiffusionHead", "TimestepEmbedder"]


class TimestepEmbedder(Module):
    """Sinusoidal timestep → 2-layer MLP (reference diffusion_head.py:40-79).

    Keys `mlp.layers.{0,2}` match the reference's Sequential layout."""

    def __init__(self, hidden_size: int, freq_size: int = 256):
        self.freq_size = freq_size
        self.mlp = nn.Sequential(
            nn.Linear(freq_size, hidden_size, bias=False),
            nn.SiLU(),
            nn.Linear(hidden_size, hidden_size, bias=False),
        )

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.freq_size // 2
        freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
        args = t[:, None].astype(jnp.float32) * freqs[None, :]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        return self.mlp(emb)


class _SwiGLU(Module):
    """gate/up/down FFN (reference diffusion_head.py:82-96)."""

    def __init__(self, dim: int, ffn_dim: int):
        self.gate_proj = nn.Linear(dim, ffn_dim, bias=False)
        self.up_proj = nn.Linear(dim, ffn_dim, bias=False)
        self.down_proj = nn.Linear(ffn_dim, dim, bias=False)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.down_proj(jax.nn.silu(self.gate_proj(x))
                              * self.up_proj(x))


class HeadLayer(Module):
    """AdaLN-gated FFN layer (reference diffusion_head.py:99-130)."""

    def __init__(self, dim: int, ffn_dim: int, cond_dim: int,
                 norm_eps: float = 1e-5):
        self.ffn = _SwiGLU(dim, ffn_dim)
        self.norm = nn.RMSNorm(dim, eps=norm_eps)
        self.adaLN_modulation = nn.Sequential(
            nn.SiLU(), nn.Linear(cond_dim, 3 * dim, bias=False))

    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        shift, scale, gate = jnp.split(self.adaLN_modulation(c), 3, axis=-1)
        return x + gate * self.ffn(self.norm(x) * (1 + scale) + shift)


class FinalLayer(Module):
    """Final AdaLN + projection (reference diffusion_head.py:133-158)."""

    def __init__(self, dim: int, out_size: int, cond_dim: int,
                 norm_eps: float = 1e-5):
        self.norm_final = nn.RMSNorm(dim, eps=norm_eps, affine=False)
        self.linear = nn.Linear(dim, out_size, bias=False)
        self.adaLN_modulation = nn.Sequential(
            nn.SiLU(), nn.Linear(cond_dim, 2 * dim, bias=False))

    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        shift, scale = jnp.split(self.adaLN_modulation(c), 2, axis=-1)
        return self.linear(self.norm_final(x) * (1 + scale) + shift)


class DiffusionHead(Module):
    """v/epsilon predictor (reference diffusion_head.py:161-227).

    noisy (B, latent), t (B,), condition (B, hidden) → (B, latent)."""

    def __init__(self, config: DiffusionHeadConfig):
        self.config = config
        dim = config.hidden_size
        self.noisy_images_proj = nn.Linear(config.latent_size, dim,
                                           bias=False)
        self.cond_proj = nn.Linear(dim, dim, bias=False)
        self.t_embedder = TimestepEmbedder(dim)
        ffn_dim = int(dim * config.head_ffn_ratio)
        self.layers = [HeadLayer(dim, ffn_dim, dim, config.rms_norm_eps)
                       for _ in range(config.head_layers)]
        self.final_layer = FinalLayer(dim, config.latent_size, dim,
                                      config.rms_norm_eps)

    def __call__(self, noisy: jnp.ndarray, t: jnp.ndarray,
                 condition: jnp.ndarray) -> jnp.ndarray:
        x = self.noisy_images_proj(noisy)
        c = self.cond_proj(condition) + self.t_embedder(t)
        for layer in self.layers:
            x = layer(x, c)
        return self.final_layer(x, c)
