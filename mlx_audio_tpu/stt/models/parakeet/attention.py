"""Transformer-XL style relative-position attention for the FastConformer
(spec: reference stt/models/parakeet/attention.py)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ....nn import Linear, Module

__all__ = ["MultiHeadAttention", "RelPositionMultiHeadAttention", "RelPositionalEncoding"]


class MultiHeadAttention(Module):
    def __init__(self, n_head: int, n_feat: int, bias: bool = True):
        self.linear_q = Linear(n_feat, n_feat, bias=bias)
        self.linear_k = Linear(n_feat, n_feat, bias=bias)
        self.linear_v = Linear(n_feat, n_feat, bias=bias)
        self.linear_out = Linear(n_feat, n_feat, bias=bias)
        self.n_head = n_head
        self.head_dim = n_feat // n_head
        self.scale = self.head_dim**-0.5

    def _split(self, x):
        B, T, _ = x.shape
        return jnp.swapaxes(x.reshape(B, T, self.n_head, self.head_dim), 1, 2)

    def __call__(self, q, k, v, pos_emb=None, mask=None):
        from ....ops.attention import scaled_dot_product_attention

        q = self._split(self.linear_q(q))
        k = self._split(self.linear_k(k))
        v = self._split(self.linear_v(v))
        out = scaled_dot_product_attention(q, k, v, scale=self.scale, mask=mask)
        B, H, T, D = out.shape
        return self.linear_out(jnp.swapaxes(out, 1, 2).reshape(B, T, H * D))


class RelPositionMultiHeadAttention(MultiHeadAttention):
    def __init__(self, n_head: int, n_feat: int, bias: bool = True):
        super().__init__(n_head, n_feat, bias)
        self.linear_pos = Linear(n_feat, n_feat, bias=False)
        self.pos_bias_u = jnp.zeros((n_head, self.head_dim))
        self.pos_bias_v = jnp.zeros((n_head, self.head_dim))

    @staticmethod
    def rel_shift(x: jax.Array) -> jax.Array:
        B, H, Tq, P = x.shape
        x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (1, 0)])
        x = x.reshape(B, H, P + 1, Tq)[:, :, 1:, :]
        return x.reshape(B, H, Tq, P)

    def __call__(self, q, k, v, pos_emb=None, mask=None):
        assert pos_emb is not None
        B, Tq, _ = q.shape
        q = self.linear_q(q).reshape(B, Tq, self.n_head, self.head_dim)
        k = self._split(self.linear_k(k))
        v = self._split(self.linear_v(v))
        p = self._split(self.linear_pos(pos_emb))

        q_u = jnp.swapaxes(q + self.pos_bias_u, 1, 2)
        q_v = jnp.swapaxes(q + self.pos_bias_v, 1, 2)

        ac = jnp.einsum("bhtd,bhsd->bhts", q_u, k, preferred_element_type=jnp.float32)
        bd = jnp.einsum("bhtd,bhpd->bhtp", q_v, p, preferred_element_type=jnp.float32)
        bd = self.rel_shift(bd)[..., : k.shape[2]]
        scores = (ac + bd) * self.scale
        if mask is not None:
            scores = jnp.where(mask, -jnp.inf, scores)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        out = jnp.swapaxes(out, 1, 2).reshape(B, Tq, -1)
        return self.linear_out(out)


class RelPositionalEncoding(Module):
    def __init__(self, d_model: int, max_len: int = 5000, scale_input: bool = True):
        self.d_model = d_model
        self.max_len = max_len
        self.scale = math.sqrt(d_model) if scale_input else 1.0
        self._pe = jnp.asarray(self._calc(max_len, d_model))

    @staticmethod
    def _calc(max_len: int, d_model: int) -> np.ndarray:
        positions = np.arange(max_len - 1, -max_len, -1, dtype=np.float32)[:, None]
        div = np.exp(np.arange(0, d_model, 2, np.float32) * -(math.log(10000.0) / d_model))
        pe = np.zeros((2 * max_len - 1, d_model), np.float32)
        pe[:, 0::2] = np.sin(positions * div)
        pe[:, 1::2] = np.cos(positions * div)
        return pe[None]

    def __call__(self, x: jax.Array, offset: int = 0):
        input_len = x.shape[1] + offset
        x = x * self.scale
        buf = self._pe.shape[1]
        start = buf // 2 - (input_len - 1)
        end = buf // 2 + (input_len - 1) + 1
        return x, self._pe[:, start:end].astype(x.dtype)
