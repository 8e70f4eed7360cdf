"""LFM2 hybrid conv/attention backbone, TPU-native.

The reference (mlx_audio/sts/models/lfm_audio/model.py:219-241) borrows
mlx_lm's Lfm2Model; this is a from-scratch JAX implementation of the same
public architecture (Liquid LFM2): gated short-conv layers interleaved with
GQA attention layers (per-head q/k RMSNorm + rope), SwiGLU FFNs, and a
final embedding_norm. Decode state is fully functional — attention layers
carry the framework KVCache, conv layers a fixed-size ConvCache — so the
whole step is jittable with static shapes.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ....lm.cache import KVCache
from ....lm.transformer import rope_cos_sin
from ....nn import layers as nn
from ....nn.module import Module
from ....ops import scaled_dot_product_attention
from .config import LFM2Config

__all__ = ["Lfm2Model", "ConvCache"]


class ConvCache(Module):
    """Last L_cache−1 gated inputs for a short-conv layer."""

    def __init__(self, batch: int, width: int, dim: int,
                 dtype=jnp.float32):
        self.buf = jnp.zeros((batch, width, dim), dtype)
        self.pos = jnp.array(0, jnp.int32)

    @property
    def max_len(self):  # parity with KVCache duck type
        return self.buf.shape[1]


class Lfm2ShortConv(Module):
    """Gated depthwise causal short conv (HF Lfm2ShortConv semantics:
    in_proj → (B, C, x); y = C · conv(B·x); out_proj)."""

    def __init__(self, cfg: LFM2Config):
        dim = cfg.hidden_size
        self.L_cache = cfg.conv_L_cache
        self.in_proj = nn.Linear(dim, 3 * dim, bias=cfg.conv_bias)
        self.conv = nn.Conv1d(dim, dim, cfg.conv_L_cache, groups=dim,
                              bias=cfg.conv_bias)
        self.out_proj = nn.Linear(dim, dim, bias=cfg.conv_bias)

    def __call__(self, x: jnp.ndarray,
                 cache: Optional[ConvCache] = None,
                 true_len=None) -> Tuple[jnp.ndarray, Optional[ConvCache]]:
        T = x.shape[1]
        B_g, C_g, xp = jnp.split(self.in_proj(x), 3, axis=-1)
        Bx = B_g * xp
        W = self.L_cache - 1
        if cache is None:
            padded = jnp.pad(Bx, ((0, 0), (W, 0), (0, 0)))
            new_cache = None
        else:
            padded = jnp.concatenate([cache.buf, Bx], axis=1)
            if true_len is None:
                new_buf = jax.lax.dynamic_slice_in_dim(
                    padded, padded.shape[1] - W, W, axis=1)
            else:
                # bucketed (right-padded) prefill: the cache must hold the
                # last W REAL gated inputs, which end at `true_len`, not at
                # the padded tail. padded index = W + input index, so the
                # window [true_len - W, true_len) lives at padded
                # [true_len, true_len + W).
                new_buf = jax.lax.dynamic_slice_in_dim(
                    padded, true_len, W, axis=1)
            new_cache = cache.replace(buf=new_buf, pos=cache.pos + T)
        conv_out = self.conv(padded)[:, -T:]
        return self.out_proj(C_g * conv_out), new_cache


class Lfm2Attention(Module):
    """GQA with per-head q/k RMSNorm + rope."""

    def __init__(self, cfg: LFM2Config):
        dim = cfg.hidden_size
        hd = cfg.head_dim
        self.n_heads = cfg.num_attention_heads
        self.n_kv = cfg.num_key_value_heads
        self.head_dim = hd
        self.rope_theta = cfg.rope_theta
        self.q_proj = nn.Linear(dim, self.n_heads * hd, bias=False)
        self.k_proj = nn.Linear(dim, self.n_kv * hd, bias=False)
        self.v_proj = nn.Linear(dim, self.n_kv * hd, bias=False)
        self.out_proj = nn.Linear(self.n_heads * hd, dim, bias=False)
        self.q_layernorm = nn.RMSNorm(hd, eps=cfg.norm_eps)
        self.k_layernorm = nn.RMSNorm(hd, eps=cfg.norm_eps)

    def __call__(self, x, positions, mask,
                 cache: Optional[KVCache] = None):
        B, T, _ = x.shape
        q = self.q_layernorm(self.q_proj(x).reshape(B, T, self.n_heads,
                                                    self.head_dim))
        k = self.k_layernorm(self.k_proj(x).reshape(B, T, self.n_kv,
                                                    self.head_dim))
        v = self.v_proj(x).reshape(B, T, self.n_kv, self.head_dim)
        cos_h, sin_h = rope_cos_sin(positions, self.head_dim,
                                    base=self.rope_theta, dtype=jnp.float32)
        cos = jnp.concatenate([cos_h, cos_h], axis=-1)  # (..., head_dim)
        sin = jnp.concatenate([sin_h, sin_h], axis=-1)
        if positions.ndim == 2:  # (B, T) per-row decode positions
            cos_b, sin_b = cos[:, :, None, :], sin[:, :, None, :]
        else:  # (T,) shared positions
            cos_b, sin_b = cos[None, :, None, :], sin[None, :, None, :]

        # rotate-half (HF llama convention)
        def rot(t):
            t1, t2 = jnp.split(t, 2, axis=-1)
            rotated = jnp.concatenate([-t2, t1], axis=-1)
            return (t * cos_b + rotated * sin_b).astype(t.dtype)

        q, k = rot(q), rot(k)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        if cache is not None:
            k, v, cache = cache.update(k, v)
        out = scaled_dot_product_attention(q, k, v, mask=mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, -1)
        return self.out_proj(out), cache


class Lfm2MLP(Module):
    def __init__(self, cfg: LFM2Config):
        d = cfg.ffn_dim
        self.w1 = nn.Linear(cfg.hidden_size, d, bias=False)
        self.w3 = nn.Linear(cfg.hidden_size, d, bias=False)
        self.w2 = nn.Linear(d, cfg.hidden_size, bias=False)

    def __call__(self, x):
        return self.w2(jax.nn.silu(self.w1(x)) * self.w3(x))


class Lfm2DecoderLayer(Module):
    def __init__(self, cfg: LFM2Config, layer_type: str):
        self.is_attention_layer = layer_type == "full_attention"
        if self.is_attention_layer:
            self.self_attn = Lfm2Attention(cfg)
        else:
            self.conv = Lfm2ShortConv(cfg)
        self.feed_forward = Lfm2MLP(cfg)
        self.operator_norm = nn.RMSNorm(cfg.hidden_size, eps=cfg.norm_eps)
        self.ffn_norm = nn.RMSNorm(cfg.hidden_size, eps=cfg.norm_eps)

    def __call__(self, x, positions, mask, cache, true_len=None):
        if self.is_attention_layer:
            h, cache = self.self_attn(self.operator_norm(x), positions,
                                      mask, cache)
        else:
            h, cache = self.conv(self.operator_norm(x), cache,
                                 true_len=true_len)
        x = x + h
        return x + self.feed_forward(self.ffn_norm(x)), cache


class Lfm2Model(Module):
    """Embed → hybrid layers → embedding_norm."""

    def __init__(self, cfg: LFM2Config):
        self.config = cfg
        self.embed_tokens = nn.Embedding(cfg.vocab_size, cfg.hidden_size)
        self.layers = [Lfm2DecoderLayer(cfg, t) for t in cfg.layer_types]
        self.embedding_norm = nn.RMSNorm(cfg.hidden_size, eps=cfg.norm_eps)

    def make_caches(self, batch: int = 1, max_len: int = 4096,
                    dtype=jnp.float32) -> List[Module]:
        cfg = self.config
        return [
            KVCache(batch, cfg.num_key_value_heads, max_len, cfg.head_dim,
                    dtype) if layer.is_attention_layer
            else ConvCache(batch, cfg.conv_L_cache - 1, cfg.hidden_size,
                           dtype)
            for layer in self.layers
        ]

    def __call__(self, inputs_embeds: jnp.ndarray,
                 caches: Optional[List[Module]] = None,
                 positions=None, mask=None, true_len=None
                 ) -> Tuple[jnp.ndarray, Optional[List[Module]]]:
        """`positions`/`mask` may be supplied externally for slot-batched
        decode (per-row (B, T) positions and a (B, 1, T, S) mask) or
        bucketed prefill (`true_len` keeps the conv caches aligned to the
        real prompt tail; see Lfm2ShortConv)."""
        h = inputs_embeds
        T = h.shape[1]
        if positions is None:
            attn_cache = next((c for c, l in zip(caches or [], self.layers)
                               if l.is_attention_layer), None)
            if caches is not None:
                positions = attn_cache.pos + jnp.arange(T)
                mask = attn_cache.attention_mask(T)
            else:
                positions = jnp.arange(T)
                mask = "causal" if T > 1 else None

        new_caches = [] if caches is not None else None
        for i, layer in enumerate(self.layers):
            h, nc = layer(h, positions, mask if layer.is_attention_layer
                          else None,
                          caches[i] if caches is not None else None,
                          true_len=true_len)
            if new_caches is not None:
                new_caches.append(nc)
        return self.embedding_norm(h), new_caches
