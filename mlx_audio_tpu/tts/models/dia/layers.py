"""Dia transformer layers (behavioral spec: reference tts/models/dia/layers.py
— DenseGeneral projections, timescale rope, gated MLP, GQA decoder with
cross-attention). Channels-last, jnp."""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....nn import Embedding, Module, RMSNorm
from ....ops.attention import scaled_dot_product_attention
from .config import DiaConfig

__all__ = ["DiaModel", "Encoder", "Decoder", "DenseGeneral"]


class DenseGeneral(Module):
    """Einsum projection with weight shaped (in..., out...)."""

    def __init__(self, in_shapes: tuple, out_features: tuple):
        self.weight = 0.02 * jax.random.normal(
            jax.random.PRNGKey(0), (*in_shapes, *out_features)
        )
        self.in_rank = len(in_shapes)

    def __call__(self, x):
        axes = tuple(range(x.ndim - self.in_rank, x.ndim))
        waxes = tuple(range(self.in_rank))
        return jax.lax.dot_general(
            x, self.weight.astype(x.dtype), ((axes, waxes), ((), ())),
            preferred_element_type=x.dtype,
        )


def _rope_timescale(x, positions, min_ts=1.0, max_ts=10000.0):
    """Dia rope: (B, T, N, H), timescale-interpolated frequencies."""
    H = x.shape[-1]
    half = H // 2
    fraction = (2.0 * np.arange(half)) / H
    timescale = min_ts * (max_ts / min_ts) ** fraction  # (half,)
    angles = positions[:, :, None, None].astype(jnp.float32) / timescale
    cos = jnp.cos(angles).astype(x.dtype)
    sin = jnp.sin(angles).astype(x.dtype)
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


class MlpBlock(Module):
    def __init__(self, embed_dim: int, intermediate_dim: int):
        self.wi_fused = DenseGeneral((embed_dim,), (2, intermediate_dim))
        self.wo = DenseGeneral((intermediate_dim,), (embed_dim,))

    def __call__(self, x):
        h = self.wi_fused(x)  # (..., 2, inter)
        gate = jax.nn.silu(h[..., 0, :])
        up = h[..., 1, :]
        return self.wo(gate * up)


class Attention(Module):
    def __init__(self, q_dim, kv_dim, nq, nkv, head_dim, out_dim):
        self.q_proj = DenseGeneral((q_dim,), (nq, head_dim))
        self.k_proj = DenseGeneral((kv_dim,), (nkv, head_dim))
        self.v_proj = DenseGeneral((kv_dim,), (nkv, head_dim))
        self.o_proj = DenseGeneral((nq, head_dim), (out_dim,))
        self.nq = nq
        self.nkv = nkv
        self.head_dim = head_dim

    def __call__(self, xq, xkv, q_pos, kv_pos=None, mask=None, cache=None,
                 cross_kv=None):
        if kv_pos is None:
            kv_pos = q_pos
        q = _rope_timescale(self.q_proj(xq), q_pos)  # (B, T, Nq, H)
        q = jnp.swapaxes(q, 1, 2)
        new_cache = None
        if cross_kv is not None:
            k, v = cross_kv
        else:
            k = jnp.swapaxes(_rope_timescale(self.k_proj(xkv), kv_pos), 1, 2)
            v = jnp.swapaxes(self.v_proj(xkv), 1, 2)
            if cache is not None:
                k, v, new_cache = cache.update(k, v)
        # Dia uses scale=1.0 (queries pre-scaled by head_dim**-0.5 in jax
        # reference? — the MLX port passes scale=1.0 with raw q)
        out = scaled_dot_product_attention(q, k, v, scale=1.0, mask=mask)
        out = jnp.swapaxes(out, 1, 2)  # (B, T, Nq, H)
        return self.o_proj(out), new_cache

    def cross_kv(self, encoder_out, src_pos):
        k = jnp.swapaxes(_rope_timescale(self.k_proj(encoder_out), src_pos), 1, 2)
        v = jnp.swapaxes(self.v_proj(encoder_out), 1, 2)
        return k, v


class EncoderLayer(Module):
    def __init__(self, cfg: DiaConfig):
        e = cfg.model.encoder
        eps = cfg.model.normalization_layer_epsilon
        self.pre_sa_norm = RMSNorm(e.n_embd, eps=eps)
        self.self_attention = Attention(
            e.n_embd, e.n_embd, e.n_head, e.n_head, e.head_dim, e.n_embd
        )
        self.post_sa_norm = RMSNorm(e.n_embd, eps=eps)
        self.mlp = MlpBlock(e.n_embd, e.n_hidden)

    def __call__(self, x, src_pos, mask=None):
        a, _ = self.self_attention(self.pre_sa_norm(x), self.pre_sa_norm(x),
                                   src_pos, mask=mask)
        x = x + a
        return x + self.mlp(self.post_sa_norm(x))


class Encoder(Module):
    def __init__(self, cfg: DiaConfig):
        e = cfg.model.encoder
        self.embedding = Embedding(cfg.model.src_vocab_size, e.n_embd)
        self.layers = [EncoderLayer(cfg) for _ in range(e.n_layer)]
        self.norm = RMSNorm(e.n_embd, eps=cfg.model.normalization_layer_epsilon)

    def __call__(self, x_ids, src_pos, mask=None):
        x = self.embedding(x_ids)
        for layer in self.layers:
            x = layer(x, src_pos, mask)
        return self.norm(x)


class DecoderLayer(Module):
    def __init__(self, cfg: DiaConfig):
        d = cfg.model.decoder
        e = cfg.model.encoder
        eps = cfg.model.normalization_layer_epsilon
        self.pre_sa_norm = RMSNorm(d.n_embd, eps=eps)
        self.self_attention = Attention(
            d.n_embd, d.n_embd, d.gqa_query_heads, d.kv_heads, d.gqa_head_dim,
            d.n_embd,
        )
        self.pre_ca_norm = RMSNorm(d.n_embd, eps=eps)
        self.cross_attention = Attention(
            d.n_embd, e.n_embd, d.cross_query_heads, d.cross_query_heads,
            d.cross_head_dim, d.n_embd,
        )
        self.pre_mlp_norm = RMSNorm(d.n_embd, eps=eps)
        self.mlp = MlpBlock(d.n_embd, d.n_hidden)

    def __call__(self, x, tgt_pos, self_mask, cross_mask, self_cache, cross_kv):
        h = self.pre_sa_norm(x)
        a, new_cache = self.self_attention(h, h, tgt_pos, mask=self_mask,
                                           cache=self_cache)
        x = x + a
        c, _ = self.cross_attention(self.pre_ca_norm(x), None, tgt_pos,
                                    mask=cross_mask, cross_kv=cross_kv)
        x = x + c
        return x + self.mlp(self.pre_mlp_norm(x)), new_cache


class Decoder(Module):
    def __init__(self, cfg: DiaConfig):
        d = cfg.model.decoder
        self.embeddings = [
            Embedding(cfg.model.tgt_vocab_size, d.n_embd)
            for _ in range(cfg.data.channels)
        ]
        self.layers = [DecoderLayer(cfg) for _ in range(d.n_layer)]
        self.norm = RMSNorm(d.n_embd, eps=cfg.model.normalization_layer_epsilon)
        self.logits_dense = DenseGeneral(
            (d.n_embd,), (cfg.data.channels, cfg.model.tgt_vocab_size)
        )
        self.num_channels = cfg.data.channels

    def precompute_cross_kv(self, encoder_out, src_pos):
        return [l.cross_attention.cross_kv(encoder_out, src_pos) for l in self.layers]

    def __call__(self, tgt_ids, tgt_pos, self_caches, cross_kvs, self_mask=None,
                 cross_mask=None):
        x = None
        for i in range(self.num_channels):
            e = self.embeddings[i](tgt_ids[..., i])
            x = e if x is None else x + e
        new_caches = []
        for i, layer in enumerate(self.layers):
            x, nc = layer(x, tgt_pos, self_mask, cross_mask,
                          self_caches[i] if self_caches else None, cross_kvs[i])
            new_caches.append(nc)
        x = self.norm(x)
        return self.logits_dense(x).astype(jnp.float32), new_caches


class DiaModel(Module):
    def __init__(self, cfg: DiaConfig):
        self.encoder = Encoder(cfg)
        self.decoder = Decoder(cfg)
