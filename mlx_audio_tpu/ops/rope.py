"""Rotary position embeddings — replacement for `mx.fast.rope`.

Supports the MLX/torch `traditional` flag (interleaved pairs) and the
default rotate-half layout, plus llama3-style frequency scaling.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["rope_cos_sin", "apply_rope", "llama3_rope_freqs"]


def rope_cos_sin(
    positions: jax.Array,  # (...,) int32
    dims: int,
    base: float = 10000.0,
    scale: float = 1.0,
    freqs: Optional[jax.Array] = None,
    dtype=jnp.float32,
):
    """cos/sin tables of shape (..., dims/2)."""
    if freqs is None:
        freqs = base ** (-jnp.arange(0, dims, 2, dtype=jnp.float32) / dims)
    angles = positions[..., None].astype(jnp.float32) * scale * freqs
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def apply_rope(
    x: jax.Array,  # (..., T, D)
    cos: jax.Array,  # (T, D/2) or broadcastable
    sin: jax.Array,
    traditional: bool = False,
) -> jax.Array:
    d = cos.shape[-1]
    if traditional:
        x1 = x[..., 0 : 2 * d : 2]
        x2 = x[..., 1 : 2 * d : 2]
        r1 = x1 * cos - x2 * sin
        r2 = x1 * sin + x2 * cos
        out = jnp.stack([r1, r2], axis=-1).reshape(*x.shape[:-1], 2 * d)
    else:
        x1 = x[..., :d]
        x2 = x[..., d : 2 * d]
        out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    if 2 * d < x.shape[-1]:
        out = jnp.concatenate([out, x[..., 2 * d :]], axis=-1)
    return out.astype(x.dtype)


def llama3_rope_freqs(
    dims: int,
    base: float,
    factor: float = 8.0,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    original_max_position: int = 8192,
) -> jax.Array:
    """Llama-3 style frequency rescaling for long-context rope."""
    import numpy as np

    freqs = base ** (-np.arange(0, dims, 2, dtype=np.float64) / dims)
    wavelens = 2 * np.pi / freqs
    low_freq_wavelen = original_max_position / low_freq_factor
    high_freq_wavelen = original_max_position / high_freq_factor
    new_freqs = np.where(wavelens > low_freq_wavelen, freqs / factor, freqs)
    smooth = (original_max_position / wavelens - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    mid = np.where(
        (wavelens <= low_freq_wavelen) & (wavelens >= high_freq_wavelen),
        freqs / ((1 - smooth) / factor + smooth),
        new_freqs,
    )
    return jnp.asarray(mid, dtype=jnp.float32)
