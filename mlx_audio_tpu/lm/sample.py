"""Token samplers — replacement for mlx-lm's `make_sampler` /
`make_logits_processors` (reference deps: tts/models/spark/spark.py:10,
outetts, sesame, ...). All jit-compatible with static shapes.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["make_sampler", "apply_repetition_penalty", "top_k_filter", "top_p_filter", "min_p_filter"]


def top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    """Mask everything below the k-th largest logit."""
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def top_p_filter(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering: keep the smallest prefix of sorted probs ≥ p."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds p (always keep top-1)
    keep_sorted = cum - probs < p
    threshold = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < threshold, -jnp.inf, logits)


def min_p_filter(logits: jax.Array, min_p: float,
                 min_tokens_to_keep: int = 1) -> jax.Array:
    if min_p <= 0.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    cutoff = min_p * jnp.max(probs, axis=-1, keepdims=True)
    keep = probs >= cutoff
    if min_tokens_to_keep > 1:
        # never filter below the top-k tokens (mlx-lm min_p semantics)
        kth = jnp.sort(logits, axis=-1)[..., -min_tokens_to_keep][..., None]
        keep = keep | (logits >= kth)
    return jnp.where(keep, logits, -jnp.inf)


def apply_repetition_penalty(
    logits: jax.Array,  # (B, V)
    history: jax.Array,  # (B, W) int32 token window, pad with -1
    penalty: float,
) -> jax.Array:
    """Divide (positive) / multiply (negative) logits of recent tokens.

    `history` is a fixed-size window (static shape under jit); -1 entries are
    ignored.
    """
    if penalty == 1.0:
        return logits
    V = logits.shape[-1]
    hist = jnp.where(history < 0, V, history)  # map pads out of range
    onehot = jax.nn.one_hot(hist, V + 1, dtype=jnp.bool_).any(axis=-2)[..., :V]
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(onehot, penalized, logits)


from functools import lru_cache


@lru_cache(maxsize=None)
def make_sampler(
    temp: float = 0.0,
    top_p: float = 1.0,
    top_k: int = 0,
    min_p: float = 0.0,
    min_tokens_to_keep: int = 1,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Returns sampler(logits (..., V), key) -> token ids (...,)."""

    def sampler(logits: jax.Array, key: jax.Array) -> jax.Array:
        if temp == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        x = logits.astype(jnp.float32) / temp
        if top_k:
            x = top_k_filter(x, top_k)
        if top_p < 1.0:
            x = top_p_filter(x, top_p)
        if min_p > 0.0:
            x = min_p_filter(x, min_p, min_tokens_to_keep)
        return jax.random.categorical(key, x, axis=-1).astype(jnp.int32)

    return sampler
