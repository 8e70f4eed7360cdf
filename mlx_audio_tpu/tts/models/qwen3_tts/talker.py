"""Qwen3-TTS talker (AR over codec frames, interleaved-MRoPE) + code
predictor (AR across 16 codebooks per frame).

Behavioral spec: reference tts/models/qwen3_tts/talker.py. Functional KV
caches; the interleaved MRoPE combine is precomputed as a static mask.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....lm.cache import KVCache
from ....nn import Embedding, Linear, Module, RMSNorm
from ....ops.attention import scaled_dot_product_attention
from .config import Qwen3TTSTalkerCodePredictorConfig, Qwen3TTSTalkerConfig

__all__ = ["Qwen3TTSTalkerForConditionalGeneration", "CodePredictorModel"]


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _apply_rope(q, k, cos, sin):
    # cos/sin: (B, T, head_dim) broadcast over heads
    cos = cos[:, None]
    sin = sin[:, None]
    return q * cos + _rotate_half(q) * sin, k * cos + _rotate_half(k) * sin


class TalkerRotaryEmbedding(Module):
    """Interleaved multimodal rope (reference talker.py:127-236).

    For TTS all three position streams are identical, so the interleave is a
    selection among equal values — kept for checkpoint-exact behavior when
    position streams differ."""

    def __init__(self, dim: int, base: float = 10000.0,
                 mrope_section: Optional[List[int]] = None):
        self._inv_freq = 1.0 / (
            base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
        )
        section = mrope_section or [24, 20, 20]
        half = dim // 2
        idx = np.arange(half)
        h_mask = (idx % 3 == 1) & (idx < section[1] * 3)
        w_mask = (idx % 3 == 2) & (idx < section[2] * 3)
        self._select = jnp.asarray(
            np.where(h_mask, 1, np.where(w_mask, 2, 0)), jnp.int32
        )

    def __call__(self, positions):
        """positions: (3, B, T) or (B, T) → cos/sin (B, T, dim)."""
        if positions.ndim == 2:
            positions = jnp.broadcast_to(positions[None], (3, *positions.shape))
        freqs = (
            positions[..., None].astype(jnp.float32) * self._inv_freq
        )  # (3, B, T, half)
        sel = jax.nn.one_hot(self._select, 3, dtype=jnp.float32)  # (half, 3)
        combined = jnp.einsum("sbth,hs->bth", freqs, sel)
        emb = jnp.concatenate([combined, combined], axis=-1)
        return jnp.cos(emb), jnp.sin(emb)


class TalkerAttention(Module):
    # post-load quantized row-stack (nn.quantized.fuse_quantized_projections):
    # one fused GEMV replaces q/k/v in the latency-bound decode loop
    _FUSE_GROUPS = (("qkv_fused", ("q_proj", "k_proj", "v_proj")),)

    def __init__(self, cfg, qk_norm: bool = True):
        d = cfg.hidden_size
        self.q_proj = Linear(d, cfg.num_attention_heads * cfg.head_dim,
                             bias=cfg.attention_bias)
        self.k_proj = Linear(d, cfg.num_key_value_heads * cfg.head_dim,
                             bias=cfg.attention_bias)
        self.v_proj = Linear(d, cfg.num_key_value_heads * cfg.head_dim,
                             bias=cfg.attention_bias)
        self.o_proj = Linear(cfg.num_attention_heads * cfg.head_dim, d,
                             bias=cfg.attention_bias)
        if qk_norm:
            self.q_norm = RMSNorm(cfg.head_dim, eps=cfg.rms_norm_eps)
            self.k_norm = RMSNorm(cfg.head_dim, eps=cfg.rms_norm_eps)
        self.nh = cfg.num_attention_heads
        self.nkv = cfg.num_key_value_heads
        self.hd = cfg.head_dim

    def __call__(self, x, cos, sin, mask=None, cache: Optional[KVCache] = None):
        B, T, _ = x.shape
        if hasattr(self, "qkv_fused"):
            q, k, v = self.qkv_fused(x)
        else:
            q, k, v = self.q_proj(x), self.k_proj(x), self.v_proj(x)
        q = q.reshape(B, T, self.nh, self.hd)
        k = k.reshape(B, T, self.nkv, self.hd)
        v = v.reshape(B, T, self.nkv, self.hd)
        if hasattr(self, "q_norm"):
            q = self.q_norm(q)
            k = self.k_norm(k)
        q = jnp.swapaxes(q, 1, 2)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        q, k = _apply_rope(q, k, cos, sin)
        new_cache = None
        if cache is not None:
            k, v, new_cache = cache.update(k, v)
        out = scaled_dot_product_attention(q, k, v, scale=self.hd**-0.5, mask=mask)
        out = jnp.swapaxes(out, 1, 2).reshape(B, T, -1)
        return self.o_proj(out), new_cache


class TalkerMLP(Module):
    _FUSE_GROUPS = (("gate_up_fused", ("gate_proj", "up_proj")),)

    def __init__(self, cfg):
        self.gate_proj = Linear(cfg.hidden_size, cfg.intermediate_size, bias=False)
        self.up_proj = Linear(cfg.hidden_size, cfg.intermediate_size, bias=False)
        self.down_proj = Linear(cfg.intermediate_size, cfg.hidden_size, bias=False)

    def __call__(self, x):
        if hasattr(self, "gate_up_fused"):
            from ....nn.quantized import fused_mlp_call

            y = fused_mlp_call(self.gate_up_fused, self.down_proj, x)
            if y is not None:
                return y
            g, u = self.gate_up_fused(x)
        else:
            g, u = self.gate_proj(x), self.up_proj(x)
        return self.down_proj(jax.nn.silu(g) * u)


class ResizeMLP(Module):
    def __init__(self, input_size, intermediate_size, output_size, bias=True):
        self.linear_fc1 = Linear(input_size, intermediate_size, bias=bias)
        self.linear_fc2 = Linear(intermediate_size, output_size, bias=bias)

    def __call__(self, x):
        return self.linear_fc2(jax.nn.silu(self.linear_fc1(x)))


class TalkerDecoderLayer(Module):
    def __init__(self, cfg, qk_norm=True):
        self.self_attn = TalkerAttention(cfg, qk_norm)
        self.mlp = TalkerMLP(cfg)
        self.input_layernorm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)

    def __call__(self, x, cos, sin, mask=None, cache=None):
        a, nc = self.self_attn(self.input_layernorm(x), cos, sin, mask, cache)
        x = x + a
        return x + self.mlp(self.post_attention_layernorm(x)), nc


class Qwen3TTSTalkerModel(Module):
    def __init__(self, cfg: Qwen3TTSTalkerConfig):
        self.codec_embedding = Embedding(cfg.vocab_size, cfg.hidden_size)
        self.text_embedding = Embedding(cfg.text_vocab_size, cfg.text_hidden_size)
        self.layers = [TalkerDecoderLayer(cfg) for _ in range(cfg.num_hidden_layers)]
        self.norm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)
        mrope = None
        if cfg.rope_scaling and "mrope_section" in cfg.rope_scaling:
            mrope = cfg.rope_scaling["mrope_section"]
        self.rotary_emb = TalkerRotaryEmbedding(cfg.head_dim, cfg.rope_theta, mrope)
        self.config = cfg

    def __call__(self, inputs_embeds, caches: Optional[List[KVCache]] = None,
                 mask=None, positions=None):
        B, T, _ = inputs_embeds.shape
        if positions is None:
            start = caches[0].pos if caches is not None else 0
            positions = jnp.broadcast_to((start + jnp.arange(T))[None], (B, T))
        cos, sin = self.rotary_emb(positions)
        if mask is None and caches is not None:
            mask = caches[0].attention_mask(T)
        x = inputs_embeds
        new_caches = [] if caches is not None else None
        for i, layer in enumerate(self.layers):
            x, nc = layer(x, cos, sin, mask,
                          caches[i] if caches is not None else None)
            if new_caches is not None:
                new_caches.append(nc)
        return self.norm(x), new_caches

    def make_caches(self, batch: int, max_len: int):
        cfg = self.config
        return [
            KVCache(batch, cfg.num_key_value_heads, max_len, cfg.head_dim,
                    dtype=jnp.float32)
            for _ in range(cfg.num_hidden_layers)
        ]


class CodePredictorModel(Module):
    def __init__(self, cfg: Qwen3TTSTalkerCodePredictorConfig,
                 talker_hidden_size: int):
        self.codec_embedding = [
            Embedding(cfg.vocab_size, talker_hidden_size)
            for _ in range(cfg.num_code_groups - 1)
        ]
        self.layers = [TalkerDecoderLayer(cfg) for _ in range(cfg.num_hidden_layers)]
        self.norm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)
        self._inv_freq = 1.0 / (
            cfg.rope_theta ** (jnp.arange(0, cfg.head_dim, 2, dtype=jnp.float32)
                               / cfg.head_dim)
        )
        self.config = cfg

    def rope(self, positions):
        freqs = positions[..., None].astype(jnp.float32) * self._inv_freq
        emb = jnp.concatenate([freqs, freqs], axis=-1)
        return jnp.cos(emb), jnp.sin(emb)

    def __call__(self, inputs_embeds, caches=None, mask=None):
        B, T, _ = inputs_embeds.shape
        start = caches[0].pos if caches is not None else 0
        positions = jnp.broadcast_to((start + jnp.arange(T))[None], (B, T))
        cos, sin = self.rope(positions)
        if mask is None and caches is not None:
            mask = caches[0].attention_mask(T)
        x = inputs_embeds
        new_caches = [] if caches is not None else None
        for i, layer in enumerate(self.layers):
            x, nc = layer(x, cos, sin, mask,
                          caches[i] if caches is not None else None)
            if new_caches is not None:
                new_caches.append(nc)
        return self.norm(x), new_caches

    def make_caches(self, batch: int, max_len: int):
        cfg = self.config
        return [
            KVCache(batch, cfg.num_key_value_heads, max_len, cfg.head_dim,
                    dtype=jnp.float32)
            for _ in range(cfg.num_hidden_layers)
        ]


class Qwen3TTSTalkerCodePredictor(Module):
    def __init__(self, cfg: Qwen3TTSTalkerCodePredictorConfig,
                 talker_hidden_size: int):
        if cfg.hidden_size != talker_hidden_size:
            self.small_to_mtp_projection = Linear(talker_hidden_size,
                                                  cfg.hidden_size, bias=True)
        self.model = CodePredictorModel(cfg, talker_hidden_size)
        self.lm_head = [
            Linear(cfg.hidden_size, cfg.vocab_size, bias=False)
            for _ in range(cfg.num_code_groups - 1)
        ]
        self.config = cfg

    @property
    def codec_embedding(self):
        return self.model.codec_embedding

    def project(self, x):
        if hasattr(self, "small_to_mtp_projection"):
            return self.small_to_mtp_projection(x)
        return x


class Qwen3TTSTalkerForConditionalGeneration(Module):
    def __init__(self, cfg: Qwen3TTSTalkerConfig):
        self.model = Qwen3TTSTalkerModel(cfg)
        self.text_projection = ResizeMLP(
            cfg.text_hidden_size, cfg.text_hidden_size, cfg.hidden_size, bias=True
        )
        self.codec_head = Linear(cfg.hidden_size, cfg.vocab_size, bias=False)
        self.code_predictor = Qwen3TTSTalkerCodePredictor(
            cfg.code_predictor_config, cfg.hidden_size
        )
        self.config = cfg

    def __call__(self, inputs_embeds, caches=None, mask=None, positions=None):
        h, caches = self.model(inputs_embeds, caches, mask, positions)
        return self.codec_head(h), h, caches
