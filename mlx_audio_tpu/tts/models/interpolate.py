"""torch-style `interpolate` (nearest / linear) for (N, C, L) tensors —
contract of reference tts/models/interpolate.py, implemented with vectorized
jnp gathers (jit/TPU friendly)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["interpolate"]


def interpolate(
    x: jax.Array,  # (N, C, L)
    size: Optional[int] = None,
    scale_factor: Optional[float] = None,
    mode: str = "nearest",
    align_corners: bool = False,
) -> jax.Array:
    if x.ndim != 3:
        raise ValueError(f"interpolate expects (N, C, L), got {x.shape}")
    if size is not None and scale_factor is not None:
        raise ValueError("pass only one of size / scale_factor")
    L = x.shape[-1]
    if size is None:
        if scale_factor is None:
            raise ValueError("one of size/scale_factor is required")
        size = int(L * scale_factor)
    if size == L:
        return x

    if mode == "nearest":
        idx = jnp.floor(jnp.arange(size) * (L / size)).astype(jnp.int32)
        idx = jnp.clip(idx, 0, L - 1)
        return x[..., idx]

    if mode == "linear":
        if align_corners and size > 1:
            pos = jnp.arange(size) * ((L - 1) / (size - 1))
        else:
            pos = (jnp.arange(size) + 0.5) * (L / size) - 0.5
        pos = jnp.clip(pos, 0.0, L - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.clip(lo + 1, 0, L - 1)
        w = (pos - lo).astype(x.dtype)
        return x[..., lo] * (1 - w) + x[..., hi] * w

    raise ValueError(f"Unsupported mode: {mode}")
