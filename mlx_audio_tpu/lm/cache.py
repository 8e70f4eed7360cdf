"""Static-shape functional KV cache.

The deep design difference from the reference (mlx-lm's `KVCache` grows a
lazy array per step): on TPU every shape must be static under jit, so the
cache is a fixed-capacity ring buffer pytree carried through the decode
loop; `pos` is a traced scalar so steps don't recompile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.module import Module

__all__ = ["KVCache", "make_caches"]


class KVCache(Module):
    """Fixed-capacity KV cache for one attention layer.

    Update is functional: `keys, values, new_cache = cache.update(k, v)`.
    """

    def __init__(self, batch: int, num_kv_heads: int, max_len: int, head_dim: int,
                 dtype=jnp.bfloat16):
        self.k = jnp.zeros((batch, num_kv_heads, max_len, head_dim), dtype)
        self.v = jnp.zeros((batch, num_kv_heads, max_len, head_dim), dtype)
        self.pos = jnp.array(0, jnp.int32)

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    def update(self, k: jax.Array, v: jax.Array):
        nk = jax.lax.dynamic_update_slice(
            self.k, k.astype(self.k.dtype), (0, 0, self.pos, 0)
        )
        nv = jax.lax.dynamic_update_slice(
            self.v, v.astype(self.v.dtype), (0, 0, self.pos, 0)
        )
        new = self.replace(k=nk, v=nv, pos=self.pos + k.shape[2])
        return nk, nv, new

    def attention_mask(self, t: int, dtype=jnp.float32) -> jax.Array:
        """Additive mask (1, 1, t, max_len): causal within the new block and
        excluding not-yet-written positions."""
        s = self.max_len
        q_pos = self.pos + jnp.arange(t)[:, None]
        k_idx = jnp.arange(s)[None, :]
        ok = k_idx <= q_pos
        return jnp.where(ok, 0.0, -jnp.inf).astype(dtype)[None, None]


class RingKVCache(Module):
    """Sliding-window KV cache (ring buffer) for windowed attention
    (e.g. Mimi's context-250 transformer). Slot positions are tracked in
    `pos_buf` so rope stays absolute and the mask is position-driven.
    """

    def __init__(self, batch: int, num_kv_heads: int, window: int, head_dim: int,
                 dtype=jnp.float32):
        self.k = jnp.zeros((batch, num_kv_heads, window, head_dim), dtype)
        self.v = jnp.zeros((batch, num_kv_heads, window, head_dim), dtype)
        self.pos_buf = jnp.full((window,), -(10**9), jnp.int32)
        self.pos = jnp.array(0, jnp.int32)

    @property
    def window(self) -> int:
        return self.k.shape[2]

    def update(self, k: jax.Array, v: jax.Array):
        """k/v: (B, H, t, D) with t <= window."""
        W = self.window
        t = k.shape[2]
        slots = (self.pos + jnp.arange(t)) % W
        nk = self.k.at[:, :, slots].set(k.astype(self.k.dtype))
        nv = self.v.at[:, :, slots].set(v.astype(self.v.dtype))
        npos_buf = self.pos_buf.at[slots].set(self.pos + jnp.arange(t))
        new = self.replace(k=nk, v=nv, pos_buf=npos_buf, pos=self.pos + t)
        return nk, nv, new

    def attention_mask(self, t: int, context: int, q0: jax.Array,
                       dtype=jnp.float32) -> jax.Array:
        """Mask for queries at absolute positions q0..q0+t-1 against the
        (post-update) ring slots."""
        q_pos = q0 + jnp.arange(t)[:, None]
        k_pos = self.pos_buf[None, :]
        delta = q_pos - k_pos
        ok = (delta >= 0) & (delta < context) & (k_pos >= 0)
        return jnp.where(ok, 0.0, -jnp.inf).astype(dtype)[None, None]


def make_caches(num_layers: int, batch: int, num_kv_heads: int, max_len: int,
                head_dim: int, dtype=jnp.bfloat16):
    return [
        KVCache(batch, num_kv_heads, max_len, head_dim, dtype)
        for _ in range(num_layers)
    ]
