"""GPT-2 backbone (used by IndexTTS, Chatterbox-Turbo T3, Bark stages —
the reference imports `mlx_lm.models.gpt2`).

Learned positional embeddings, pre-LN blocks, fused QKV. Parameter names
follow the HF gpt2 convention after the standard Conv1D→Linear transpose
(performed in model `sanitize`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp

from ..base import BaseModelArgs
from ..nn import Embedding, LayerNorm, Linear, Module
from ..ops.attention import scaled_dot_product_attention
from .cache import KVCache

__all__ = ["GPT2Config", "GPT2Model"]


@dataclass
class GPT2Config(BaseModelArgs):
    n_embd: int = 768
    n_head: int = 12
    n_layer: int = 12
    n_positions: int = 1024
    vocab_size: int = 50257
    layer_norm_epsilon: float = 1e-5


class GPT2Attention(Module):
    def __init__(self, cfg: GPT2Config):
        self.c_attn = Linear(cfg.n_embd, 3 * cfg.n_embd)
        self.c_proj = Linear(cfg.n_embd, cfg.n_embd)
        self.n_head = cfg.n_head

    def __call__(self, x, mask, cache: Optional[KVCache] = None):
        B, T, D = x.shape
        qkv = self.c_attn(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = D // self.n_head
        q = jnp.swapaxes(q.reshape(B, T, self.n_head, hd), 1, 2)
        k = jnp.swapaxes(k.reshape(B, T, self.n_head, hd), 1, 2)
        v = jnp.swapaxes(v.reshape(B, T, self.n_head, hd), 1, 2)
        new_cache = None
        if cache is not None:
            k, v, new_cache = cache.update(k, v)
        out = scaled_dot_product_attention(q, k, v, mask=mask)
        out = jnp.swapaxes(out, 1, 2).reshape(B, T, D)
        return self.c_proj(out), new_cache


class GPT2MLP(Module):
    def __init__(self, cfg: GPT2Config):
        self.c_fc = Linear(cfg.n_embd, 4 * cfg.n_embd)
        self.c_proj = Linear(4 * cfg.n_embd, cfg.n_embd)

    def __call__(self, x):
        return self.c_proj(jax.nn.gelu(self.c_fc(x), approximate=True))


class GPT2Block(Module):
    def __init__(self, cfg: GPT2Config):
        self.ln_1 = LayerNorm(cfg.n_embd, eps=cfg.layer_norm_epsilon)
        self.attn = GPT2Attention(cfg)
        self.ln_2 = LayerNorm(cfg.n_embd, eps=cfg.layer_norm_epsilon)
        self.mlp = GPT2MLP(cfg)

    def __call__(self, x, mask, cache=None):
        a, new_cache = self.attn(self.ln_1(x), mask, cache)
        x = x + a
        x = x + self.mlp(self.ln_2(x))
        return x, new_cache


class GPT2Model(Module):
    """HF-naming GPT-2: wte, wpe, h.N.*, ln_f. Output = hidden states; tie
    to wte for LM logits via `wte.as_linear`."""

    def __init__(self, cfg: GPT2Config):
        self.wte = Embedding(cfg.vocab_size, cfg.n_embd)
        self.wpe = Embedding(cfg.n_positions, cfg.n_embd)
        self.h = [GPT2Block(cfg) for _ in range(cfg.n_layer)]
        self.ln_f = LayerNorm(cfg.n_embd, eps=cfg.layer_norm_epsilon)
        self.config = cfg

    def make_caches(self, batch: int = 1, max_len: int = 1024, dtype=jnp.bfloat16):
        cfg = self.config
        return [
            KVCache(batch, cfg.n_head, max_len, cfg.n_embd // cfg.n_head, dtype)
            for _ in range(cfg.n_layer)
        ]

    def __call__(self, inputs, caches: Optional[List[KVCache]] = None,
                 positions=None, mask=None):
        h = self.wte(inputs) if inputs.ndim == 2 else inputs
        T = h.shape[1]
        if positions is None:
            start = caches[0].pos if caches is not None else 0
            positions = start + jnp.arange(T)
        h = h + self.wpe.weight[positions]
        if mask is None:
            if caches is not None:
                mask = caches[0].attention_mask(T)
            elif T > 1:
                from ..ops.attention import make_causal_mask

                mask = make_causal_mask(T, T)
        new_caches = [] if caches is not None else None
        for i, blk in enumerate(self.h):
            h, nc = blk(h, mask, caches[i] if caches is not None else None)
            if new_caches is not None:
                new_caches.append(nc)
        return self.ln_f(h), new_caches
