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

__all__ = ["quantized_matmul", "quantized_mlp"]


def _qmm_body(getx, w_packed, s_raw, b_raw, *, bits, rep, M):
    """Shared dequant-matmul block body: Σ_j getx(j) @ Wj.T over the
    `per` packed sub-lattices, returning the f32 accumulator (M, bn).

    getx(j) must return the j-th sub-lattice of the activation as an
    f32 (M, Kp) array. s_raw/b_raw are the RAW (bn, K/group)
    scales/biases, expanded to (bn, Kp) in-register (`rep` =
    group_size // per packed words per group). Expanding on the host
    instead would stream 2x the packed weight's bytes of f32 from HBM
    — measured to erase most of the int4 bandwidth win at 3B scale.
    """
    per = 32 // bits
    Kp = w_packed.shape[1]
    Kg = s_raw.shape[1]
    mask = jnp.uint32((1 << bits) - 1)
    # Mosaic has no interleaving repeat/reshape for the (Kg,) → (Kp,)
    # group expansion; build a 0/1 expansion matrix with iota and ride
    # the MXU instead (bn·Kg·Kp MACs — noise next to the main dots).
    g_idx = jax.lax.broadcasted_iota(jnp.int32, (Kg, Kp), 0)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (Kg, Kp), 1)
    expand = (p_idx // rep == g_idx).astype(jnp.float32)  # (Kg, Kp)
    s = jnp.dot(s_raw.astype(jnp.float32), expand,
                preferred_element_type=jnp.float32)  # (bn, Kp)

    acc = jnp.zeros((M, w_packed.shape[0]), jnp.float32)
    x_sum = jnp.zeros((M, Kp), jnp.float32)
    for j in range(per):
        xj = getx(j)  # (M, Kp) f32
        qj = ((w_packed >> jnp.uint32(j * bits)) & mask).astype(jnp.int32)
        wj = qj.astype(jnp.float32) * s  # (bn, Kp)
        acc = acc + jnp.dot(xj, wj.T, preferred_element_type=jnp.float32)
        x_sum = x_sum + xj
    # bias term Σ_i x[i]·b[g(i)]: collapse x to per-group sums first, so
    # biases never need expanding at all
    xg = jnp.dot(x_sum, expand.T, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(xg, b_raw.astype(jnp.float32).T,
                        preferred_element_type=jnp.float32)
    return acc


def _qmm_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, *, bits, rep):
    # x_ref: (per, M, Kp); w_ref: (block_n, Kp) uint32
    M = x_ref.shape[1]
    acc = _qmm_body(lambda j: x_ref[j].astype(jnp.float32),
                    w_ref[:], s_ref[:], b_ref[:], bits=bits, rep=rep, M=M)
    o_ref[:] = acc.astype(o_ref.dtype)


def _qmlp_kernel(x_ref, wg_ref, wu_ref, sg_ref, bg_ref, su_ref, bu_ref,
                 wd_ref, sd_ref, bd_ref, o_ref, h_ref, *,
                 bits, rep, nA, bpa):
    """Fused SwiGLU MLP: silu(x@Wg.T) * (x@Wu.T) @ Wd.T in ONE Pallas
    dispatch (in-kernel epilogue — the round-5 int4@1B frontier named in
    KERNEL_BENCH: every custom-call boundary inside the fused decode loop
    breaks XLA's elementwise fusion around it, so the three-call MLP
    [gate_up GEMV → silu·mul → down GEMV] pays two boundaries this kernel
    removes).

    Two-phase sequential grid (TPU grid steps run in order; VMEM scratch
    persists across them):
      steps 0..nA-1  stream the gate block i and up block i (two refs on
                     the same row-stacked gate_up array, index maps i and
                     i+nA), compute h = silu(g)·u in f32, and scatter h
                     into the `per`-sub-lattice scratch layout the second
                     matmul needs via 0/1 selection matmuls (Mosaic has no
                     interleaving reshape; bpa is a multiple of 128 so the
                     scratch stores stay lane-aligned).
      steps nA..     stream down-weight blocks and contract the finished
                     scratch h exactly like `_qmm_kernel`.
    Index maps clamp each phase's refs to their last block during the
    other phase — an unchanged block index is not re-fetched, so phase A
    weights stay resident (not re-streamed) through phase B and the first
    down block prefetches during phase A for free.
    """
    i = pl.program_id(0)
    per = 32 // bits
    M = x_ref.shape[1]

    @pl.when(i < nA)
    def _phase_a():
        g = _qmm_body(lambda j: x_ref[j].astype(jnp.float32),
                      wg_ref[:], sg_ref[:], bg_ref[:], bits=bits, rep=rep,
                      M=M)
        u = _qmm_body(lambda j: x_ref[j].astype(jnp.float32),
                      wu_ref[:], su_ref[:], bu_ref[:], bits=bits, rep=rep,
                      M=M)
        h = g * jax.nn.sigmoid(g) * u  # SwiGLU, f32
        bn_a = wg_ref.shape[0]
        c_idx = jax.lax.broadcasted_iota(jnp.int32, (bn_a, bpa), 0)
        p_idx = jax.lax.broadcasted_iota(jnp.int32, (bn_a, bpa), 1)
        for j in range(per):
            sel = (c_idx == p_idx * per + j).astype(jnp.float32)
            hj = jnp.dot(h, sel, preferred_element_type=jnp.float32)
            h_ref[j, :, pl.ds(i * bpa, bpa)] = hj

    @pl.when(i >= nA)
    def _phase_b():
        acc = _qmm_body(lambda j: h_ref[j], wd_ref[:], sd_ref[:], bd_ref[:],
                        bits=bits, rep=rep, M=M)
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


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "block_n"))
def quantized_mlp(x, w_gu, s_gu, b_gu, w_down, s_down, b_down, *,
                  bits: int = 4, group_size: int = 64, block_n: int = 512):
    """Fused SwiGLU MLP over MLX-affine-quantized weights:
    ``silu(x @ Wg.T) * (x @ Wu.T) @ Wd.T`` in one Pallas dispatch.

    ``w_gu``/``s_gu``/``b_gu`` are the row-stacked gate;up triple from
    :class:`~mlx_audio_tpu.nn.QuantizedFusedLinear` (gate rows first);
    ``w_down`` the (N, I·bits/32) down projection. Constraints (enforced
    by the caller's routing guard, `nn.quantized.fused_mlp_call`):
    bits ∈ {4, 8}, I % (128·per) == 0, K % per == 0, small M (decode).
    """
    per = 32 // bits
    assert group_size % per == 0
    orig_shape = x.shape
    K = orig_shape[-1]
    Kp = K // per
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    I = w_gu.shape[0] // 2
    N = w_down.shape[0]
    bn_a = per * 128  # bpa = bn_a // per = 128: lane-aligned scratch stores
    nA = I // bn_a
    bpa = bn_a // per
    KpI = I // per
    bn_b = min(block_n, N)
    nB = pl.cdiv(N, bn_b)
    Kg = s_gu.shape[1]
    KgI = s_down.shape[1]
    x_str = jnp.transpose(x2.reshape(M, Kp, per), (2, 0, 1))  # (per, M, Kp)

    # clamp each phase's refs to their last block during the other phase:
    # an unchanged block index is not re-fetched
    def gmap(i):
        return (jnp.minimum(i, nA - 1), 0)

    def umap(i):
        return (jnp.minimum(i, nA - 1) + nA, 0)

    def dmap(i):
        return (jnp.maximum(i - nA, 0), 0)

    kernel = functools.partial(_qmlp_kernel, bits=bits,
                               rep=group_size // per, nA=nA, bpa=bpa)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(nA + nB,),
        in_specs=[
            pl.BlockSpec((per, M, Kp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_a, Kp), gmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_a, Kp), umap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_a, Kg), gmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_a, Kg), gmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_a, Kg), umap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_a, Kg), umap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_b, KpI), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_b, KgI), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_b, KgI), dmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn_b),
                               lambda i: (0, jnp.maximum(i - nA, 0)),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((per, M, KpI), jnp.float32)],
    )(x_str, w_gu, w_gu, s_gu, b_gu, s_gu, b_gu, w_down, s_down, b_down)
    return out.reshape(*orig_shape[:-1], N)
