"""Attention ops — the TPU replacement for `mx.fast.scaled_dot_product_attention`
(used by ~25 reference files; see SURVEY §2.3).

The default path is einsum + fp32 softmax, which XLA fuses well on TPU for
the moderate sequence lengths audio models use. A Pallas flash-attention
kernel (`mlx_audio_tpu.ops.pallas.flash_attention`) is used automatically on
TPU for long sequences where materializing the (T, S) score matrix would be
HBM-bound.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

__all__ = ["scaled_dot_product_attention", "sdpa", "make_causal_mask"]


def make_causal_mask(t: int, s: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask of shape (t, s); offset so the last query attends
    to everything (standard KV-cache decode alignment)."""
    q_idx = jnp.arange(t)[:, None] + (s - t)
    k_idx = jnp.arange(s)[None, :]
    return jnp.where(k_idx <= q_idx, 0.0, -jnp.inf).astype(dtype)


def scaled_dot_product_attention(
    q: jax.Array,  # (B, H, T, D)
    k: jax.Array,  # (B, H_kv, S, D)
    v: jax.Array,  # (B, H_kv, S, D)
    scale: Optional[float] = None,
    mask: Optional[Union[jax.Array, str]] = None,
) -> jax.Array:
    """SDPA with GQA support. `mask` may be an additive array broadcastable
    to (B, H, T, S), a boolean array (True = attend), or the string
    "causal"."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, H, T, D = q.shape
    H_kv, S = k.shape[1], k.shape[2]

    if H_kv != H:
        rep = H // H_kv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    # Long sequences on TPU: streaming-softmax Pallas kernel avoids
    # materializing the (T, S) score matrix in HBM. Measured device time
    # (KERNEL_BENCH.md): kernel wins 1.4x at S=1536, 3.5x at 4096, 52x at
    # 8192, so it routes from S >= 1280 (round-1's opposite e2e conclusion
    # at S=1500 was an artifact of per-dispatch timing, since corrected by
    # the chained-loop method). Only full attention or T==S causal route
    # here; masked/offset variants always use the einsum path.
    from .pallas import pallas_enabled

    causal_str = isinstance(mask, str) and mask == "causal"
    if (
        pallas_enabled()
        and S >= 1280
        and T >= 1280  # decode-step queries (T~1) pad to a 256-row block;
        # routing them cost ~1.5 ms/step e2e (measured: 957 ms vs 612 ms
        # for 120 s chunked whisper when T=1 cross-attn hit the kernel)
        and D <= 128
        and (mask is None or (causal_str and T == S))
        and q.dtype in (jnp.float32, jnp.bfloat16)
    ):
        from .pallas import flash_attention

        return flash_attention(q, k, v, causal=causal_str, scale=scale)

    scores = jnp.einsum(
        "bhtd,bhsd->bhts", q * scale, k, preferred_element_type=jnp.float32
    )
    if isinstance(mask, str):
        if mask != "causal":
            raise ValueError(f"Unknown mask type: {mask}")
        scores = scores + make_causal_mask(T, S)
    elif mask is not None:
        if mask.dtype == jnp.bool_:
            scores = jnp.where(mask, scores, -jnp.inf)
        else:
            scores = scores + mask.astype(scores.dtype)

    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v, preferred_element_type=q.dtype)


sdpa = scaled_dot_product_attention
