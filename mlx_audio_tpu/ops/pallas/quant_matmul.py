"""Fused dequantize-matmul Pallas kernel for MLX-scheme affine-quantized
weights (packed uint32 + per-group scales/biases).

Mosaic cannot reshape the little-endian unpack (N, Kp, per) → (N, K), so the
kernel computes  x @ W.T = Σ_j x[:, j::per] @ Wj.T  over the `per` packed
sub-lattices: each Wj is a plain shift-and-mask of the packed words (no
interleave), and the group structure aligns because group_size % per == 0.
The packed weight is the only large operand — weight bandwidth drops 4x for
int4 vs fp32 (2x vs bf16), which is what matters for decode-step GEMVs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["quantized_matmul"]


def _qmm_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, *, bits, rep):
    # x_ref: (per, M, Kp); w_ref: (block_n, Kp) uint32
    # s_ref/b_ref: (block_n, K/group) RAW scales/biases, expanded to
    # (block_n, Kp) in-register (`rep` = group_size // per packed words
    # per group). Expanding on the host instead would stream 2x the
    # packed weight's bytes of f32 from HBM — measured to erase most of
    # the int4 bandwidth win at 3B scale.
    per = x_ref.shape[0]
    M = x_ref.shape[1]
    Kp = x_ref.shape[2]
    Kg = s_ref.shape[1]
    mask = jnp.uint32((1 << bits) - 1)
    w_packed = w_ref[:]
    # Mosaic has no interleaving repeat/reshape for the (Kg,) → (Kp,)
    # group expansion; build a 0/1 expansion matrix with iota and ride
    # the MXU instead (bn·Kg·Kp MACs — noise next to the main dots).
    g_idx = jax.lax.broadcasted_iota(jnp.int32, (Kg, Kp), 0)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (Kg, Kp), 1)
    expand = (p_idx // rep == g_idx).astype(jnp.float32)  # (Kg, Kp)
    s = jnp.dot(s_ref[:].astype(jnp.float32), expand,
                preferred_element_type=jnp.float32)  # (bn, Kp)

    acc = jnp.zeros((M, w_ref.shape[0]), jnp.float32)
    x_sum = jnp.zeros((M, Kp), jnp.float32)
    for j in range(per):
        xj = x_ref[j].astype(jnp.float32)  # (M, Kp)
        qj = ((w_packed >> jnp.uint32(j * bits)) & mask).astype(jnp.int32)
        wj = qj.astype(jnp.float32) * s  # (block_n, Kp)
        acc = acc + jnp.dot(xj, wj.T, preferred_element_type=jnp.float32)
        x_sum = x_sum + xj
    # bias term Σ_i x[i]·b[g(i)]: collapse x to per-group sums first, so
    # biases never need expanding at all
    xg = jnp.dot(x_sum, expand.T, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(xg, b_ref[:].astype(jnp.float32).T,
                        preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _qmm6_kernel(x_ref, w0_ref, w1_ref, w2_ref, s_ref, b_ref, o_ref, *,
                 rep):
    """6-bit variant: 16 elements span THREE uint32 word planes (96 bits),
    so per-sub-lattice extraction reads one word plane (or combines two at
    the j=5 / j=10 straddles). Same group-expansion/bias trick as
    `_qmm_kernel`; the three planes together stream exactly the packed
    6-bit bytes — true 6 bits/element HBM traffic (2.67x under bf16)."""
    M = x_ref.shape[1]
    Kp = x_ref.shape[2]  # K / 16
    Kg = s_ref.shape[1]
    mask6 = jnp.uint32(63)
    planes = (w0_ref[:], w1_ref[:], w2_ref[:])
    g_idx = jax.lax.broadcasted_iota(jnp.int32, (Kg, Kp), 0)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (Kg, Kp), 1)
    expand = (p_idx // rep == g_idx).astype(jnp.float32)
    s = jnp.dot(s_ref[:].astype(jnp.float32), expand,
                preferred_element_type=jnp.float32)

    acc = jnp.zeros((M, w0_ref.shape[0]), jnp.float32)
    x_sum = jnp.zeros((M, Kp), jnp.float32)
    for j in range(16):
        o = 6 * j
        i, sh = o // 32, o % 32
        if sh <= 26:
            qj = (planes[i] >> jnp.uint32(sh)) & mask6
        else:  # straddle: low bits from plane i, high bits from i+1
            qj = ((planes[i] >> jnp.uint32(sh))
                  | (planes[i + 1] << jnp.uint32(32 - sh))) & mask6
        xj = x_ref[j].astype(jnp.float32)
        wj = qj.astype(jnp.int32).astype(jnp.float32) * s
        acc = acc + jnp.dot(xj, wj.T, preferred_element_type=jnp.float32)
        x_sum = x_sum + xj
    xg = jnp.dot(x_sum, expand.T, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(xg, b_ref[:].astype(jnp.float32).T,
                        preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _quantized_matmul6(x, w_packed, scales, biases, group_size, block_n):
    """6-bit path: uint8 bitstream → three uint32 word planes (bitcast +
    stride, fused by XLA), 16 elements per (w0, w1, w2) column triple."""
    per = 16
    assert group_size % per == 0
    orig_shape = x.shape
    K = orig_shape[-1]
    assert K % per == 0
    Kp = K // per
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    N = w_packed.shape[0]
    bn = min(block_n, N)
    words = jax.lax.bitcast_convert_type(
        w_packed.reshape(N, -1, 4), jnp.uint32)  # (N, 3*Kp) LE words
    tri = words.reshape(N, Kp, 3)
    w0, w1, w2 = tri[:, :, 0], tri[:, :, 1], tri[:, :, 2]
    x_str = jnp.transpose(x2.reshape(M, Kp, per), (2, 0, 1))
    Kg = scales.shape[1]
    kernel = functools.partial(_qmm6_kernel, rep=group_size // per)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(pl.cdiv(N, bn),),
        in_specs=[
            pl.BlockSpec((per, M, Kp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Kg), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Kg), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(x_str, w0, w1, w2, scales, biases)
    return out.reshape(*orig_shape[:-1], N)


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "block_n"))
def quantized_matmul(x, w_packed, scales, biases, *, bits: int = 4,
                     group_size: int = 64, block_n: int = 512):
    """x: (..., K) @ dequant(w (N, K·bits/32 packed)) → (..., N)."""
    if bits == 6:
        return _quantized_matmul6(x, w_packed, scales, biases, group_size,
                                  block_n)
    per = 32 // bits
    assert group_size % per == 0
    orig_shape = x.shape
    K = orig_shape[-1]
    Kp = K // per
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    N = w_packed.shape[0]
    bn = min(block_n, N)
    # ragged N rides Mosaic's implicit edge-block masking: the final grid
    # block reads past-the-end rows as padding and drops past-the-end
    # writes; each output element depends only on its own weight row, so
    # the valid region is exact (needed for vocab-sized lm_heads, e.g.
    # N=156940)

    # host-side prep (cheap, fused by XLA): strided x view. Scales and
    # biases ride RAW (N, K/group) — in-kernel expansion keeps the HBM
    # read at packed-weight + 1/group-sized sidecars.
    x_str = jnp.transpose(x2.reshape(M, Kp, per), (2, 0, 1))  # (per, M, Kp)
    Kg = scales.shape[1]

    kernel = functools.partial(_qmm_kernel, bits=bits,
                               rep=group_size // per)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(pl.cdiv(N, bn),),
        in_specs=[
            pl.BlockSpec((per, M, Kp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Kg), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Kg), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(x_str, w_packed, scales, biases)
    return out.reshape(*orig_shape[:-1], N)
