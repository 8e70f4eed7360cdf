"""Generic causal transformer covering the Llama / Qwen2 / Qwen3 / Mistral
family (the LLM backbones the reference pulls from mlx-lm: see
tts/models/spark/spark.py:8-11, sesame, outetts, soprano, etc.).

One config-driven implementation: GQA attention with rope (+optional
per-head q/k RMSNorm for Qwen3, attention bias for Qwen2), SwiGLU MLP,
RMSNorm, optional tied embeddings. Parameter naming matches HF safetensors
(`model.layers.N.self_attn.q_proj.weight`, ...) so converted checkpoints
load with no remapping.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional

import jax
import jax.numpy as jnp

from ..base import BaseModelArgs
from ..nn import Linear, Embedding, Module, RMSNorm
from ..ops.attention import scaled_dot_product_attention
from ..ops.rope import apply_rope, llama3_rope_freqs, rope_cos_sin
from .cache import KVCache

__all__ = ["LMConfig", "CausalLM", "Transformer", "TransformerBlock", "CausalSelfAttention"]


@dataclass
class LMConfig(BaseModelArgs):
    model_type: str = "llama"
    hidden_size: int = 2048
    num_hidden_layers: int = 16
    intermediate_size: int = 8192
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None
    head_dim: Optional[int] = None
    rms_norm_eps: float = 1e-5
    vocab_size: int = 32000
    rope_theta: float = 10000.0
    rope_traditional: bool = False
    rope_scaling: Optional[dict] = None
    attention_bias: bool = False
    mlp_bias: bool = False
    qk_norm: bool = False
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 8192

    def __post_init__(self):
        if self.num_key_value_heads is None:
            self.num_key_value_heads = self.num_attention_heads
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_attention_heads
        if self.model_type in ("qwen3", "qwen3_moe") and not self.qk_norm:
            self.qk_norm = True
        if self.model_type == "qwen2":
            # HF Qwen2 hardcodes q/k/v bias (o_proj bias-free)
            self.attention_bias = True


class CausalSelfAttention(Module):
    # post-load quantized q/k/v row-stack (nn.quantized
    # .fuse_quantized_projections): halves Pallas custom-call boundaries
    # in the latency-bound decode loop
    _FUSE_GROUPS = (("qkv_fused", ("q_proj", "k_proj", "v_proj")),)

    def __init__(self, cfg: LMConfig):
        dim = cfg.hidden_size
        self.n_heads = cfg.num_attention_heads
        self.n_kv_heads = cfg.num_key_value_heads
        self.head_dim = cfg.head_dim
        bias = cfg.attention_bias
        self.q_proj = Linear(dim, self.n_heads * self.head_dim, bias=bias)
        self.k_proj = Linear(dim, self.n_kv_heads * self.head_dim, bias=bias)
        self.v_proj = Linear(dim, self.n_kv_heads * self.head_dim, bias=bias)
        self.o_proj = Linear(self.n_heads * self.head_dim, dim, bias=False)
        if cfg.qk_norm:
            self.q_norm = RMSNorm(self.head_dim, eps=cfg.rms_norm_eps)
            self.k_norm = RMSNorm(self.head_dim, eps=cfg.rms_norm_eps)
        self.scale = self.head_dim**-0.5
        self.rope_traditional = cfg.rope_traditional

    def __call__(
        self,
        x: jax.Array,  # (B, T, D)
        cos: jax.Array,
        sin: jax.Array,
        mask: Optional[jax.Array],
        cache: Optional[KVCache] = None,
    ):
        B, T, _ = x.shape
        if hasattr(self, "qkv_fused"):
            q, k, v = self.qkv_fused(x)
        else:
            q, k, v = self.q_proj(x), self.k_proj(x), self.v_proj(x)
        q = q.reshape(B, T, self.n_heads, self.head_dim)
        k = k.reshape(B, T, self.n_kv_heads, self.head_dim)
        v = v.reshape(B, T, self.n_kv_heads, self.head_dim)
        if hasattr(self, "q_norm"):
            q = self.q_norm(q)
            k = self.k_norm(k)
        q = jnp.swapaxes(q, 1, 2)  # (B, H, T, D)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        q = apply_rope(q, cos, sin, self.rope_traditional)
        k = apply_rope(k, cos, sin, self.rope_traditional)

        new_cache = None
        if cache is not None:
            k, v, new_cache = cache.update(k, v)
        out = scaled_dot_product_attention(q, k, v, scale=self.scale, mask=mask)
        out = jnp.swapaxes(out, 1, 2).reshape(B, T, -1)
        return self.o_proj(out), new_cache


class MLP(Module):
    _FUSE_GROUPS = (("gate_up_fused", ("gate_proj", "up_proj")),)

    def __init__(self, cfg: LMConfig):
        self.gate_proj = Linear(cfg.hidden_size, cfg.intermediate_size, bias=cfg.mlp_bias)
        self.up_proj = Linear(cfg.hidden_size, cfg.intermediate_size, bias=cfg.mlp_bias)
        self.down_proj = Linear(cfg.intermediate_size, cfg.hidden_size, bias=cfg.mlp_bias)

    def __call__(self, x: jax.Array) -> jax.Array:
        if hasattr(self, "gate_up_fused"):
            from ..nn.quantized import fused_mlp_call

            y = fused_mlp_call(self.gate_up_fused, self.down_proj, x)
            if y is not None:
                return y
            g, u = self.gate_up_fused(x)
        else:
            g, u = self.gate_proj(x), self.up_proj(x)
        return self.down_proj(jax.nn.silu(g) * u)


class TransformerBlock(Module):
    def __init__(self, cfg: LMConfig):
        self.self_attn = CausalSelfAttention(cfg)
        self.mlp = MLP(cfg)
        self.input_layernorm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)

    def __call__(self, x, cos, sin, mask, cache=None):
        attn_out, new_cache = self.self_attn(
            self.input_layernorm(x), cos, sin, mask, cache
        )
        x = x + attn_out
        x = x + self.mlp(self.post_attention_layernorm(x))
        return x, new_cache


class Transformer(Module):
    """The `model.*` part: embed_tokens, layers, final norm."""

    def __init__(self, cfg: LMConfig):
        self.embed_tokens = Embedding(cfg.vocab_size, cfg.hidden_size)
        self.layers = [TransformerBlock(cfg) for _ in range(cfg.num_hidden_layers)]
        self.norm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)
        if cfg.rope_scaling and cfg.rope_scaling.get("rope_type", cfg.rope_scaling.get("type")) == "llama3":
            rs = cfg.rope_scaling
            self._rope_freqs = llama3_rope_freqs(
                cfg.head_dim,
                cfg.rope_theta,
                factor=rs.get("factor", 8.0),
                low_freq_factor=rs.get("low_freq_factor", 1.0),
                high_freq_factor=rs.get("high_freq_factor", 4.0),
                original_max_position=rs.get("original_max_position_embeddings", 8192),
            )
        else:
            self._rope_freqs = None
        self.head_dim = cfg.head_dim
        self.rope_theta = cfg.rope_theta

    def rope_tables(self, positions: jax.Array, dtype):
        return rope_cos_sin(
            positions, self.head_dim, base=self.rope_theta,
            freqs=self._rope_freqs, dtype=jnp.float32,
        )

    def __call__(
        self,
        inputs: jax.Array,  # (B, T) int tokens or (B, T, D) embeddings
        caches: Optional[List[KVCache]] = None,
        positions: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
    ):
        h = self.embed_tokens(inputs) if inputs.ndim == 2 else inputs
        T = h.shape[1]
        if positions is None:
            start = caches[0].pos if caches is not None else 0
            positions = start + jnp.arange(T)
        cos, sin = self.rope_tables(positions, h.dtype)
        if cos.ndim == 3:  # per-row positions (B, T) → broadcast over heads
            cos, sin = cos[:, None], sin[:, None]
        if mask is None:
            if caches is not None:
                mask = caches[0].attention_mask(T)
            elif T > 1:
                from ..ops.attention import make_causal_mask

                mask = make_causal_mask(T, T)

        new_caches = [] if caches is not None else None
        for i, layer in enumerate(self.layers):
            h, nc = layer(h, cos, sin, mask, caches[i] if caches is not None else None)
            if new_caches is not None:
                new_caches.append(nc)
        return self.norm(h), new_caches


class CausalLM(Module):
    """Top-level LM: `model` + optional `lm_head` (tied embeddings otherwise)."""

    def __init__(self, cfg: LMConfig):
        self.model = Transformer(cfg)
        if not cfg.tie_word_embeddings:
            self.lm_head = Linear(cfg.hidden_size, cfg.vocab_size, bias=False)
        self.config = cfg

    def make_caches(self, batch: int = 1, max_len: int = 2048, dtype=jnp.bfloat16):
        cfg = self.config
        return [
            KVCache(batch, cfg.num_key_value_heads, max_len, cfg.head_dim, dtype)
            for _ in range(cfg.num_hidden_layers)
        ]

    def __call__(self, inputs, caches=None, positions=None, mask=None):
        h, new_caches = self.model(inputs, caches, positions, mask)
        logits = (
            self.lm_head(h)
            if hasattr(self, "lm_head")
            else self.model.embed_tokens.as_linear(h)
        )
        return logits, new_caches

    def hidden_states(self, inputs, caches=None, positions=None, mask=None):
        return self.model(inputs, caches, positions, mask)
