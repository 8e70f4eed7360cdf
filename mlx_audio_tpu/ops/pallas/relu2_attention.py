"""Fused ReLU²-attention Pallas kernel for MossFormer2's quadratic branch.

The reference ships a hand-written Metal kernel for this op
(mlx_audio/sts/models/mossformer2_se/flash_attention_kernels.py); this is
the TPU equivalent: per (batch·group) tile, compute
    out = relu(q @ k.T / g)² @ v
entirely in VMEM — the (N, N) score matrix never touches HBM. Group size is
256 and head dims 128/512-1024, so each tile maps cleanly onto the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["relu2_attention", "relu2_attention_reference"]


def relu2_attention_reference(q, k, v, group_size: int | None = None):
    """(B, G, N, D) q/k, (B, G, N, E) v → (B, G, N, E). Pure-lax path."""
    if group_size is None:
        group_size = q.shape[2]
    sim = jnp.einsum("bgnd,bgmd->bgnm", q, k,
                     preferred_element_type=jnp.float32) / group_size
    attn = jnp.square(jnp.maximum(sim, 0.0)).astype(v.dtype)
    return jnp.einsum("bgnm,bgme->bgne", attn, v)


def _relu2_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    sim = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    attn = jnp.square(jnp.maximum(sim, 0.0)).astype(v.dtype)
    o_ref[0] = jnp.dot(attn, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size",))
def relu2_attention(q, k, v, group_size: int | None = None):
    """Fused kernel; same signature/semantics as the reference path."""
    B, G, N, D = q.shape
    E = v.shape[-1]
    if group_size is None:
        group_size = N
    # The kernel materializes the (N, N) f32 score tile in VMEM; beyond
    # N=2048 that exceeds the ~16 MB scoped VMEM limit (measured OOM at
    # N=4096, scripts/bench_kernels.py) — use the lax path instead.
    if N > 2048:
        return relu2_attention_reference(q, k, v, group_size)
    qf = q.reshape(B * G, N, D)
    kf = k.reshape(B * G, N, D)
    vf = v.reshape(B * G, N, E)
    kernel = functools.partial(_relu2_kernel, scale=1.0 / group_size)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * G, N, E), v.dtype),
        grid=(B * G,),
        in_specs=[
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, E), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, E), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(qf, kf, vf)
    return out.reshape(B, G, N, E)
