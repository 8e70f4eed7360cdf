"""Flash attention Pallas kernel (causal/full), streaming-softmax over key
blocks so the (T, S) score matrix never materializes in HBM.

Replaces `mx.fast.scaled_dot_product_attention` (used by ~25 reference
files) for long sequences; the einsum path in ops.attention remains the
reference implementation and the fallback.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, causal, block_k,
                  kv_len, kv_valid):
    # refs carry a leading block dim of 1: (1, block_q, d) / (1, kv_len, d)
    block_q = q_ref.shape[1]
    d = q_ref.shape[2]
    q = q_ref[0] * scale
    q_offset = pl.program_id(1) * block_q

    m = jnp.full((block_q, 1), -1e30, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)

    num_kb = kv_len // block_k

    def body(kb, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        if causal or kv_valid < kv_len:
            q_ids = q_offset + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            k_ids = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            bad = k_ids >= kv_valid
            if causal:
                bad = bad | (k_ids > q_ids)
            s = jnp.where(bad, -1e30, s)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    if causal:
        # skip key blocks entirely beyond the diagonal
        last_kb = (q_offset + block_q - 1) // block_k + 1
        num_kb = jnp.minimum(num_kb, last_kb)
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "scale", "block_q", "block_k"))
def flash_attention(q, k, v, *, causal: bool = False, scale=None,
                    block_q: int = None, block_k: int = None):
    """q: (B, H, T, D), k/v: (B, H, S, D) → (B, H, T, D).

    Arbitrary T/S: inputs are zero-padded to block multiples and padded
    keys are masked out in-kernel (kv_valid), so results match the exact
    softmax. GQA: repeat k/v heads before calling.

    Default blocks are measured, not guessed (KERNEL_BENCH.md, v5e sweep
    2026-08-20): block_q=512 beats 256 ~2× at every S; for S ≤ 2048 a
    single k block (smallest 512-multiple ≥ S) removes the streaming
    rescale entirely (S=1500: 2.76 → 1.28 ms at the Whisper encoder
    shape); for larger S, block_k=1024 balances VMEM vs rescale count.
    """
    B, H, T, D = q.shape
    S = k.shape[2]
    if block_q is None:
        block_q = 512
    if block_k is None:
        block_k = -(-S // 512) * 512 if S <= 2048 else 1024
    if scale is None:
        scale = D**-0.5
    T_pad = -(-T // block_q) * block_q
    S_pad = -(-S // block_k) * block_k
    if T_pad != T:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, T_pad - T), (0, 0)))
    if S_pad != S:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, S_pad - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, S_pad - S), (0, 0)))

    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, block_k=block_k,
        kv_len=S_pad, kv_valid=S,
    )

    grid = (B * H, T_pad // block_q)
    qf = q.reshape(B * H, T_pad, D)
    kf = k.reshape(B * H, S_pad, D)
    vf = v.reshape(B * H, S_pad, D)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * H, T_pad, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )(qf, kf, vf)
    return out.reshape(B, H, T_pad, D)[:, :, :T]
