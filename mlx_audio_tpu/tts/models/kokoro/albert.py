"""ALBERT (PL-BERT) text encoder for Kokoro.

Architecture per the reference modules.py:419-659 (HF ALBERT naming so the
checkpoint's `bert.*` keys map 1:1); attention uses the shared SDPA op.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ....base import BaseModelArgs
from ....nn import Embedding, LayerNorm, Linear, Module
from ....ops.attention import scaled_dot_product_attention

__all__ = ["AlbertModelArgs", "CustomAlbert"]


@dataclass
class AlbertModelArgs(BaseModelArgs):
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    hidden_size: int = 768
    intermediate_size: int = 2048
    max_position_embeddings: int = 512
    model_type: str = "albert"
    embedding_size: int = 128
    inner_group_num: int = 1
    num_hidden_groups: int = 1
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    vocab_size: int = 178
    dropout: float = 0.0


class AlbertEmbeddings(Module):
    def __init__(self, config: AlbertModelArgs):
        self.word_embeddings = Embedding(config.vocab_size, config.embedding_size)
        self.position_embeddings = Embedding(
            config.max_position_embeddings, config.embedding_size
        )
        self.token_type_embeddings = Embedding(
            config.type_vocab_size, config.embedding_size
        )
        self.LayerNorm = LayerNorm(config.embedding_size, eps=config.layer_norm_eps)

    def __call__(self, input_ids, token_type_ids=None, position_ids=None):
        T = input_ids.shape[1]
        if position_ids is None:
            position_ids = jnp.arange(T, dtype=jnp.int32)[None]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        emb = (
            self.word_embeddings(input_ids)
            + self.position_embeddings(position_ids)
            + self.token_type_embeddings(token_type_ids)
        )
        return self.LayerNorm(emb)


class AlbertAttention(Module):
    def __init__(self, config: AlbertModelArgs):
        d = config.hidden_size
        self.query = Linear(d, d)
        self.key = Linear(d, d)
        self.value = Linear(d, d)
        self.dense = Linear(d, d)
        self.LayerNorm = LayerNorm(d, eps=config.layer_norm_eps)
        self.num_heads = config.num_attention_heads

    def __call__(self, x, mask=None):
        B, T, D = x.shape
        hd = D // self.num_heads
        q = jnp.swapaxes(self.query(x).reshape(B, T, self.num_heads, hd), 1, 2)
        k = jnp.swapaxes(self.key(x).reshape(B, T, self.num_heads, hd), 1, 2)
        v = jnp.swapaxes(self.value(x).reshape(B, T, self.num_heads, hd), 1, 2)
        out = scaled_dot_product_attention(q, k, v, mask=mask)
        out = jnp.swapaxes(out, 1, 2).reshape(B, T, D)
        return self.LayerNorm(x + self.dense(out))


class AlbertLayer(Module):
    def __init__(self, config: AlbertModelArgs):
        self.attention = AlbertAttention(config)
        self.ffn = Linear(config.hidden_size, config.intermediate_size)
        self.ffn_output = Linear(config.intermediate_size, config.hidden_size)
        self.full_layer_layer_norm = LayerNorm(
            config.hidden_size, eps=config.layer_norm_eps
        )

    def __call__(self, x, mask=None):
        a = self.attention(x, mask)
        h = self.ffn_output(jax.nn.gelu(self.ffn(a), approximate=False))
        return self.full_layer_layer_norm(a + h)


class AlbertLayerGroup(Module):
    def __init__(self, config: AlbertModelArgs):
        self.albert_layers = [AlbertLayer(config) for _ in range(config.inner_group_num)]

    def __call__(self, x, mask=None):
        for layer in self.albert_layers:
            x = layer(x, mask)
        return x


class AlbertEncoder(Module):
    def __init__(self, config: AlbertModelArgs):
        self.embedding_hidden_mapping_in = Linear(
            config.embedding_size, config.hidden_size
        )
        self.albert_layer_groups = [
            AlbertLayerGroup(config) for _ in range(config.num_hidden_groups)
        ]
        self.num_hidden_layers = config.num_hidden_layers
        self.num_hidden_groups = config.num_hidden_groups

    def __call__(self, x, mask=None):
        x = self.embedding_hidden_mapping_in(x)
        for i in range(self.num_hidden_layers):
            group = self.albert_layer_groups[
                i // (self.num_hidden_layers // self.num_hidden_groups)
            ]
            x = group(x, mask)
        return x


class CustomAlbert(Module):
    def __init__(self, config: AlbertModelArgs):
        self.embeddings = AlbertEmbeddings(config)
        self.encoder = AlbertEncoder(config)
        self.pooler = Linear(config.hidden_size, config.hidden_size)
        self.config = config

    def __call__(self, input_ids, token_type_ids=None, attention_mask=None):
        x = self.embeddings(input_ids, token_type_ids)
        mask = None
        if attention_mask is not None:
            # attention_mask: (B, T) with 1 = attend
            mask = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -jnp.inf)
            mask = mask.astype(jnp.float32)
        seq = self.encoder(x, mask)
        pooled = jnp.tanh(self.pooler(seq[:, 0]))
        return seq, pooled
