"""T5 text encoder for SAM-Audio prompts.

TPU-native re-implementation of the reference
mlx_audio/sts/models/sam_audio/text_encoder.py:54-622. The encoder is a
single jittable function of (ids, mask); the relative-position bias is
computed in-graph (static per sequence length) and shared across layers as
in T5. The HF tokenizer is injectable for offline use.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....nn import layers as nn
from ....nn.module import Module
from .config import T5Config, T5EncoderConfig

__all__ = ["T5Encoder", "T5TextEncoder", "relative_position_bucket"]


def relative_position_bucket(relative_position: jnp.ndarray,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> jnp.ndarray:
    """Bidirectional T5 bucketing (reference text_encoder.py:169-211)."""
    num_buckets //= 2
    buckets = (relative_position > 0).astype(jnp.int32) * num_buckets
    rp = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    large = max_exact + (
        jnp.log(jnp.maximum(rp, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return buckets + jnp.where(is_small, rp.astype(jnp.int32), large)


class T5Attention(Module):
    """Relative-position-bias attention
    (reference text_encoder.py:141-305)."""

    def __init__(self, config: T5Config,
                 has_relative_attention_bias: bool = False):
        self.n_heads = config.num_heads
        self.d_kv = config.d_kv
        inner = config.num_heads * config.d_kv
        self.num_buckets = config.relative_attention_num_buckets
        self.max_distance = config.relative_attention_max_distance
        self.q = nn.Linear(config.d_model, inner, bias=False)
        self.k = nn.Linear(config.d_model, inner, bias=False)
        self.v = nn.Linear(config.d_model, inner, bias=False)
        self.o = nn.Linear(inner, config.d_model, bias=False)
        if has_relative_attention_bias:
            self.relative_attention_bias = nn.Embedding(
                config.relative_attention_num_buckets, config.num_heads)

    def compute_bias(self, q_len: int, k_len: int) -> jnp.ndarray:
        rel = jnp.arange(k_len)[None, :] - jnp.arange(q_len)[:, None]
        buckets = relative_position_bucket(rel, self.num_buckets,
                                           self.max_distance)
        values = self.relative_attention_bias(buckets)  # (q, k, H)
        return values.transpose(2, 0, 1)[None]  # (1, H, q, k)

    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray],
                 position_bias: Optional[jnp.ndarray]
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, T, _ = x.shape
        q = self.q(x).reshape(B, T, self.n_heads, self.d_kv
                              ).transpose(0, 2, 1, 3)
        k = self.k(x).reshape(B, T, self.n_heads, self.d_kv
                              ).transpose(0, 2, 1, 3)
        v = self.v(x).reshape(B, T, self.n_heads, self.d_kv
                              ).transpose(0, 2, 1, 3)
        scores = q @ k.transpose(0, 1, 3, 2)  # T5 uses no 1/sqrt(d) scale
        if position_bias is None:
            if hasattr(self, "relative_attention_bias"):
                position_bias = self.compute_bias(T, T)
            else:
                position_bias = jnp.zeros((1, self.n_heads, T, T))
        scores = scores + position_bias
        if mask is not None:
            scores = scores + mask
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1
                           ).astype(scores.dtype)
        out = (w @ v).transpose(0, 2, 1, 3).reshape(B, T, -1)
        return self.o(out), position_bias


class _T5FF(Module):
    """Dense (or gated) act dense (reference text_encoder.py:71-138)."""

    def __init__(self, config: T5Config):
        self.gated = config.is_gated_act
        if config.is_gated_act:
            self.wi_0 = nn.Linear(config.d_model, config.d_ff, bias=False)
            self.wi_1 = nn.Linear(config.d_model, config.d_ff, bias=False)
        else:
            self.wi = nn.Linear(config.d_model, config.d_ff, bias=False)
        self.wo = nn.Linear(config.d_ff, config.d_model, bias=False)
        self.act = (jax.nn.gelu if config.dense_act_fn.startswith("gelu")
                    else jax.nn.relu)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.gated:
            return self.wo(self.act(self.wi_0(x)) * self.wi_1(x))
        return self.wo(self.act(self.wi(x)))


class T5Block(Module):
    """Pre-norm self-attention + FF (reference text_encoder.py:307-361).
    Key layout layer.{0,1}.* matches HF."""

    def __init__(self, config: T5Config, has_bias: bool):
        class _SelfAttn(Module):
            def __init__(inner):
                inner.SelfAttention = T5Attention(config, has_bias)
                inner.layer_norm = nn.RMSNorm(
                    config.d_model, eps=config.layer_norm_epsilon)

        class _FF(Module):
            def __init__(inner):
                inner.DenseReluDense = _T5FF(config)
                inner.layer_norm = nn.RMSNorm(
                    config.d_model, eps=config.layer_norm_epsilon)

        self.layer = [_SelfAttn(), _FF()]

    def __call__(self, x, mask, position_bias):
        sa = self.layer[0]
        h, position_bias = sa.SelfAttention(sa.layer_norm(x), mask,
                                            position_bias)
        x = x + h
        ff = self.layer[1]
        x = x + ff.DenseReluDense(ff.layer_norm(x))
        return x, position_bias


class T5Encoder(Module):
    """Encoder stack (reference text_encoder.py:363-557)."""

    def __init__(self, config: T5Config):
        self.config = config
        self.shared = nn.Embedding(config.vocab_size, config.d_model)

        class _Stack(Module):
            def __init__(inner):
                inner.block = [T5Block(config, has_bias=(i == 0))
                               for i in range(config.num_layers)]
                inner.final_layer_norm = nn.RMSNorm(
                    config.d_model, eps=config.layer_norm_epsilon)

        self.encoder = _Stack()

    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        x = self.shared(input_ids)
        mask = None
        if attention_mask is not None:
            mask = jnp.where(attention_mask.astype(bool), 0.0, -jnp.inf
                             )[:, None, None, :]
        position_bias = None
        for block in self.encoder.block:
            x, position_bias = block(x, mask, position_bias)
        return self.encoder.final_layer_norm(x)

    def sanitize(self, weights: dict, prefix: str = "") -> dict:
        out = {}
        for key, value in weights.items():
            k = key
            if prefix:
                if not k.startswith(prefix):
                    continue
                k = k[len(prefix):]
            if "decoder" in k:
                continue
            if k == "encoder.embed_tokens.weight":
                k = "shared.weight"
            out[k] = value
        return out


class T5TextEncoder(Module):
    """Prompt encoder with injectable tokenizer
    (reference text_encoder.py:562-622)."""

    _RUNTIME: dict = {}

    def __init__(self, config: Optional[T5EncoderConfig] = None):
        self.config = config or T5EncoderConfig()
        self.model = T5Encoder(self.config.t5)

    def set_tokenizer(self, tokenizer):
        T5TextEncoder._RUNTIME[id(self)] = tokenizer

    def __call__(self, texts: List[str]
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        tokenizer = T5TextEncoder._RUNTIME.get(id(self))
        if tokenizer is None:
            raise RuntimeError("T5 tokenizer not set — call "
                               "set_tokenizer(...)")
        enc = tokenizer(texts, truncation=True,
                        max_length=self.config.max_length,
                        padding="longest", return_tensors="np")
        ids = jnp.asarray(np.asarray(enc["input_ids"]), jnp.int32)
        mask = jnp.asarray(np.asarray(enc["attention_mask"]))
        feats = self.model(ids, mask)
        return feats, mask.astype(bool)

    def encode_ids(self, ids: np.ndarray, mask: np.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Tokenizer-free path for tests/pre-tokenized prompts."""
        feats = self.model(jnp.asarray(ids, jnp.int32), jnp.asarray(mask))
        return feats, jnp.asarray(mask).astype(bool)
