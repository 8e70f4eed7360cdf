"""LFM2.5-Audio detokenizer: Mimi codes → 24 kHz waveform.

TPU-native re-implementation of the reference
mlx_audio/sts/models/lfm_audio/detokenizer.py:16-606. The whole pipeline —
fused codebook embedding, 6× nearest upsample, 8 hybrid conv/sliding-
attention blocks, spectral head, and iSTFT — is one jittable function of
the code array; the reference's per-batch Python iSTFT loop is replaced by
the framework's batched in-graph iSTFT.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ....dsp import istft as dsp_istft
from ....nn import layers as nn
from ....nn.module import Module
from ....ops import scaled_dot_product_attention
from ....ops.rope import rope_cos_sin
from .config import DetokenizerConfig

__all__ = ["LFM2AudioDetokenizer", "FusedEmbedding"]


class FusedEmbedding(Module):
    """Offset codebooks into one table, mean over codebooks
    (reference detokenizer.py:63-93)."""

    def __init__(self, num_codebooks: int, vocab_size: int, dim: int):
        self.num_codebooks = num_codebooks
        self.vocab_size = vocab_size
        self.emb = nn.Embedding(num_codebooks * vocab_size, dim)

    def __call__(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes (B, K, T) → (B, T, dim)."""
        K = codes.shape[1]
        offsets = jnp.arange(K)[None, :, None] * self.vocab_size
        return self.emb(codes + offsets).mean(axis=1)


class _ConvLayer(Module):
    """LFM2 short conv, k=3 causal (reference detokenizer.py:109-154)."""

    def __init__(self, dim: int):
        self.in_proj = nn.Linear(dim, 3 * dim, bias=False)
        self.conv = nn.Conv1d(dim, dim, 3, groups=dim, bias=False)
        self.out_proj = nn.Linear(dim, dim, bias=False)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B_g, C_g, xp = jnp.split(self.in_proj(x), 3, axis=-1)
        Bx = B_g * xp
        conv_out = self.conv(jnp.pad(Bx, ((0, 0), (2, 0), (0, 0))))
        return self.out_proj(C_g * conv_out)


class _SlidingAttention(Module):
    """Sliding-window GQA with q/k head norms and llama rope
    (reference detokenizer.py:157-263)."""

    def __init__(self, dim: int, num_heads: int, num_kv_heads: int,
                 rope_theta: float = 1e6):
        self.num_heads = num_heads
        self.num_kv = num_kv_heads
        self.head_dim = dim // num_heads
        self.rope_theta = rope_theta
        self.q_proj = nn.Linear(dim, dim, bias=False)
        self.k_proj = nn.Linear(dim, num_kv_heads * self.head_dim,
                                bias=False)
        self.v_proj = nn.Linear(dim, num_kv_heads * self.head_dim,
                                bias=False)
        self.out_proj = nn.Linear(dim, dim, bias=False)
        self.q_layernorm = nn.RMSNorm(self.head_dim)
        self.k_layernorm = nn.RMSNorm(self.head_dim)

    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        B, T, _ = x.shape
        hd = self.head_dim
        q = self.q_proj(x).reshape(B, T, self.num_heads, hd
                                   ).transpose(0, 2, 1, 3)
        k = self.k_proj(x).reshape(B, T, self.num_kv, hd
                                   ).transpose(0, 2, 1, 3)
        v = self.v_proj(x).reshape(B, T, self.num_kv, hd
                                   ).transpose(0, 2, 1, 3)
        q = self.q_layernorm(q)
        k = self.k_layernorm(k)
        cos_h, sin_h = rope_cos_sin(jnp.arange(T), hd,
                                    base=self.rope_theta)
        cos = jnp.concatenate([cos_h, cos_h], axis=-1)[None, None]
        sin = jnp.concatenate([sin_h, sin_h], axis=-1)[None, None]

        def rot(t):
            t1, t2 = jnp.split(t, 2, axis=-1)
            return (t * cos + jnp.concatenate([-t2, t1], axis=-1) * sin
                    ).astype(t.dtype)

        out = scaled_dot_product_attention(rot(q), rot(k), v, mask=mask)
        return self.out_proj(out.transpose(0, 2, 1, 3).reshape(B, T, -1))


class _SwiGLU(Module):
    def __init__(self, dim: int, hidden_dim: int):
        self.w1 = nn.Linear(dim, hidden_dim, bias=False)
        self.w2 = nn.Linear(hidden_dim, dim, bias=False)
        self.w3 = nn.Linear(dim, hidden_dim, bias=False)

    def __call__(self, x):
        return self.w2(jax.nn.silu(self.w1(x)) * self.w3(x))


class DetokenizerBlock(Module):
    """Conv- or attention-operator block (reference
    detokenizer.py:279-324)."""

    def __init__(self, cfg: DetokenizerConfig, layer_type: str):
        self.layer_type = layer_type
        self.operator_norm = nn.RMSNorm(cfg.hidden_size, eps=cfg.norm_eps)
        if layer_type == "conv":
            self.conv = _ConvLayer(cfg.hidden_size)
        else:
            self.self_attn = _SlidingAttention(
                cfg.hidden_size, cfg.num_attention_heads,
                cfg.num_key_value_heads, cfg.rope_theta)
        self.ffn_norm = nn.RMSNorm(cfg.hidden_size, eps=cfg.norm_eps)
        self.feed_forward = _SwiGLU(cfg.hidden_size, cfg.intermediate_size)

    def __call__(self, x, mask):
        h = self.operator_norm(x)
        h = self.conv(h) if self.layer_type == "conv" \
            else self.self_attn(h, mask)
        x = x + h
        return x + self.feed_forward(self.ffn_norm(x))


class LFMDetokenizerModel(Module):
    """Backbone + final norm (reference detokenizer.py:326-363)."""

    def __init__(self, config: DetokenizerConfig):
        self.config = config
        self.embed_tokens = nn.Embedding(65536, config.hidden_size)
        self.embedding_norm = nn.RMSNorm(config.hidden_size,
                                         eps=config.norm_eps)
        self.layers = [DetokenizerBlock(config, t)
                       for t in config.layer_types]

    def __call__(self, x, mask):
        for layer in self.layers:
            x = layer(x, mask)
        return self.embedding_norm(x)


class LFM2AudioDetokenizer(Module):
    """codes (B, 8, T) → waveform (B, T·upsample·hop)
    (reference detokenizer.py:366-509)."""

    def __init__(self, config: Optional[DetokenizerConfig] = None):
        self.config = config or DetokenizerConfig()
        config = self.config
        self.emb = FusedEmbedding(config.num_codebooks, config.vocab_size,
                                  config.hidden_size)
        self.lfm = LFMDetokenizerModel(config)
        self.lin = nn.Linear(config.hidden_size, config.output_size)
        n = config.n_fft
        self._window = 0.5 - 0.5 * jnp.cos(
            2 * math.pi * jnp.arange(n) / n)

    def _sliding_mask(self, T: int) -> jnp.ndarray:
        idx = jnp.arange(T)
        d = idx[:, None] - idx[None, :]
        valid = (d >= 0) & (d < self.config.sliding_window)
        return jnp.where(valid, 0.0, -jnp.inf)[None, None]

    def __call__(self, codes: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = self.emb(jnp.asarray(codes, jnp.int32))  # (B, T, D)
        x = jnp.repeat(x, cfg.upsample_factor, axis=1)
        mask = self._sliding_mask(x.shape[1])
        x = self.lfm(x, mask)
        x = self.lin(x)  # (B, T', 1282)
        n_bins = cfg.n_fft // 2 + 1
        mag = jnp.exp(x[..., :n_bins])
        phase = x[..., n_bins:]
        return self._istft(mag, phase)

    def _istft(self, mag: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
        """'same'-padded normalized iSTFT (reference
        detokenizer.py:468-508)."""
        cfg = self.config
        # mag·cos/sin, not mag·exp(1j·phase): complex Exp is unimplemented
        # on some TPU backends.
        spec = jax.lax.complex(mag * jnp.cos(phase),
                               mag * jnp.sin(phase))  # (B, T, F)
        out = dsp_istft(spec.swapaxes(-1, -2),
                        hop_length=cfg.hop_length,
                        win_length=cfg.n_fft, window=self._window,
                        center=False, normalized=True)
        pad = (cfg.n_fft - cfg.hop_length) // 2
        return out[..., pad:-pad] if pad > 0 else out

    def sanitize(self, weights: dict) -> dict:
        from ....nn.sanitize import orient_weights_to_model
        return orient_weights_to_model(
            self, {k: v for k, v in weights.items()
                   if "window" not in k})
