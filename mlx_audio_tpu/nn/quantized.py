"""Affine-quantized layers compatible with MLX's quantization scheme.

MLX quantizes weights per `group_size` elements along the input dimension:
``w = scales * q + biases`` with ``q`` in [0, 2^bits), packed little-endian
into uint32 words. Converted community checkpoints (3/4/6/8-bit, group 32/64)
store `weight` (packed uint32), `scales`, `biases` — we keep the identical
on-disk contract (reference: /root/reference/mlx_audio/utils.py:207-251).

Dequantization happens on the fly in the matmul input dtype; XLA fuses the
unpack+affine into the surrounding computation. A Pallas fused
dequant-matmul kernel can be swapped in via `mlx_audio_tpu.ops.quant`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .module import Module
from .layers import Linear, Embedding

__all__ = [
    "QuantizedLinear",
    "QuantizedEmbedding",
    "QuantizedFusedLinear",
    "quantize_arrays",
    "dequantize_arrays",
    "quantize_module",
    "fuse_quantized_projections",
    "fused_mlp_call",
]


def _pack_rows(q: np.ndarray, bits: int) -> np.ndarray:
    """Pack int values (..., in) little-endian. 2/4/8/16-bit → uint32 words
    (32/bits values each); 3/6-bit → MLX's uint8 bitstream (3 bytes per
    8/4 values)."""
    if bits in (3, 6):
        per = 24 // bits  # values per 3-byte pack
        q = q.astype(np.uint32).reshape(*q.shape[:-1], -1, per)
        shifts = (np.arange(per, dtype=np.uint32) * bits)[None, :]
        word = (q << shifts).sum(axis=-1, dtype=np.uint32)  # 24 bits used
        out = np.stack([word & 0xFF, (word >> 8) & 0xFF,
                        (word >> 16) & 0xFF], axis=-1)
        return out.reshape(*word.shape[:-1], -1).astype(np.uint8)
    per = 32 // bits
    q = q.astype(np.uint32).reshape(*q.shape[:-1], -1, per)
    shifts = (np.arange(per, dtype=np.uint32) * bits)[None, :]
    return (q << shifts).sum(axis=-1, dtype=np.uint32)


def unpack_rows(w: jax.Array, bits: int) -> jax.Array:
    """Unpack packed rows into (..., in) integer values. Dispatches on
    layout: uint8 bitstream for 3/6-bit, uint32 words otherwise."""
    if bits in (3, 6):
        b = w.astype(jnp.uint32).reshape(*w.shape[:-1], -1, 3)
        word = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)
        per = 24 // bits
        shifts = jnp.arange(per, dtype=jnp.uint32) * jnp.uint32(bits)
        q = (word[..., None] >> shifts) & jnp.uint32((1 << bits) - 1)
        return q.reshape(*w.shape[:-1], -1)
    per = 32 // bits
    shifts = jnp.arange(per, dtype=jnp.uint32) * jnp.uint32(bits)
    q = (w[..., None] >> shifts) & jnp.uint32((1 << bits) - 1)
    return q.reshape(*w.shape[:-1], -1)


SUPPORTED_BITS = (2, 3, 4, 6, 8, 16)


def quantize_arrays(w, group_size: int = 64, bits: int = 4):
    """Quantize a float matrix (out, in) → (packed, scales, biases).

    Matches MLX's affine scheme: per-group min/max mapped onto [0, 2^bits-1].
    """
    if bits not in SUPPORTED_BITS:
        raise ValueError(f"bits={bits} unsupported "
                         f"(supported: {SUPPORTED_BITS})")
    w = np.asarray(w, dtype=np.float32)
    out_shape = w.shape
    wg = w.reshape(*out_shape[:-1], -1, group_size)
    w_min = wg.min(axis=-1)
    w_max = wg.max(axis=-1)
    n = 2**bits - 1
    scales = np.maximum((w_max - w_min) / n, 1e-10)
    biases = w_min
    q = np.clip(np.round((wg - biases[..., None]) / scales[..., None]), 0, n)
    packed = _pack_rows(q.reshape(out_shape), bits)
    return packed, scales.astype(np.float32), biases.astype(np.float32)


def dequantize_arrays(
    w: jax.Array, scales: jax.Array, biases: jax.Array, group_size: int, bits: int,
    dtype=jnp.float32,
) -> jax.Array:
    q = unpack_rows(w, bits).astype(dtype)
    in_dim = q.shape[-1]
    s = jnp.repeat(scales.astype(dtype), group_size, axis=-1)[..., :in_dim]
    b = jnp.repeat(biases.astype(dtype), group_size, axis=-1)[..., :in_dim]
    return q * s + b


class QuantizedLinear(Module):
    def __init__(
        self,
        input_dims: int,
        output_dims: int,
        bias: bool = True,
        group_size: int = 64,
        bits: int = 4,
    ):
        if bits in (3, 6):
            self.weight = jnp.zeros(
                (output_dims, input_dims * bits // 8), dtype=jnp.uint8)
        else:
            self.weight = jnp.zeros(
                (output_dims, input_dims // (32 // bits)), dtype=jnp.uint32)
        self.scales = jnp.ones((output_dims, input_dims // group_size))
        self.biases = jnp.zeros((output_dims, input_dims // group_size))
        if bias:
            self.bias = jnp.zeros((output_dims,))
        self.group_size = group_size
        self.bits = bits

    @classmethod
    def from_linear(cls, lin: Linear, group_size: int = 64, bits: int = 4):
        out_d, in_d = lin.weight.shape
        obj = cls(in_d, out_d, bias=hasattr(lin, "bias"), group_size=group_size, bits=bits)
        packed, scales, biases = quantize_arrays(lin.weight, group_size, bits)
        obj.weight = jnp.asarray(packed)
        obj.scales = jnp.asarray(scales)
        obj.biases = jnp.asarray(biases)
        if hasattr(lin, "bias"):
            obj.bias = lin.bias
        return obj

    def dequantized_weight(self, dtype=jnp.bfloat16) -> jax.Array:
        return dequantize_arrays(
            self.weight, self.scales, self.biases, self.group_size, self.bits, dtype
        )

    def _pallas_routable(self, x: jax.Array) -> bool:
        """Measured on v5e (KERNEL_BENCH.md): the fused dequant-matmul
        kernel wins at 4-bit for all M (1.2-4.6x) and at 8-bit for M >= 2
        (1.7-4.4x; GEMV is a tie); 6-bit routes through the three-plane
        variant (round 5). 2/3-bit stays on XLA. Ragged N rides the
        kernel's masked edge block (vocab-sized lm_heads are the single
        biggest weight read of an AR decode step — on the XLA dequant
        path they measured 2.1x SLOWER than bf16)."""
        from ..ops.pallas import pallas_enabled

        if not pallas_enabled():
            return False
        if getattr(self, "tp_sharded", False):
            # tensor-parallel shards flow through XLA's dequant+matmul —
            # pallas_call is not SPMD-partitionable without shard_map
            # (flag set by parallel.mesh.shard_module)
            return False
        if self.bits not in (4, 6, 8):
            return False
        N, K = self.weight.shape[0], x.shape[-1]
        # 6-bit packs 16 elements per 3-word column triple (quant_matmul
        # `_qmm6_kernel`); 4/8-bit pack 32/bits per uint32 word
        per = 16 if self.bits == 6 else 32 // self.bits
        if K % per or self.group_size % per:
            return False
        # N >= 512: fixed 512-row blocks, ragged tail masked by Mosaic.
        # N < 512: the block IS the whole array, so its shape must stay
        # tile-aligned (Mosaic rejects unaligned block shapes at compile
        # — a crash, not a fallback)
        if not (N >= 512 or (N >= 128 and N % 128 == 0)):
            return False
        M = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        # GEMV size floor (round-5, measured on v5e at int4 M=1 —
        # bench_quant_1b.json): at 512x512 (256K elements, 128 KB int4)
        # there is no bandwidth to win back and the kernel's fixed
        # per-call cost loses to XLA dequant (0.72x) and even to bf16
        # (0.78x); every measured M=1 shape at >=512K elements wins
        # (512x2048: 3.05x, 1024x1024: 4.24x, 1B-talker shapes 2.8-5.2x
        # vs XLA dequant). Scoped to M == 1: batched small shapes were
        # not measured to lose and previously routed.
        if M == 1 and N * K < (1 << 19):
            return False
        # The kernel keeps x (per, M, Kp), the out block (M, bn) and f32
        # accumulators resident in VMEM; large-M (prefill / batched codec
        # decode) blows the ~16 MB budget (seen on-chip: M=8192, K=512 →
        # 19.9 MB scoped-vmem OOM). Weight bandwidth also stops dominating
        # at large M, so the XLA dequant-matmul is the right path there
        # anyway (KERNEL_BENCH.md measures wins at M ≤ 128).
        Kp = K // per
        bn = min(512, N)
        # 6-bit streams three word planes (3x Kp columns of uint32)
        w_cols = 3 * Kp if self.bits == 6 else Kp
        vmem_est = 4 * (per * M * Kp + 2 * M * bn + 2 * M * Kp
                        + 4 * bn * w_cols)
        if vmem_est > 12 * 1024 * 1024:
            return False
        return self.bits in (4, 6) or M >= 2

    def __call__(self, x: jax.Array) -> jax.Array:
        if self._pallas_routable(x):
            from ..ops.pallas.quant_matmul import quantized_matmul

            y = quantized_matmul(
                x, self.weight, self.scales, self.biases,
                bits=self.bits, group_size=self.group_size)
        else:
            w = self.dequantized_weight(x.dtype)
            y = jnp.matmul(x, w.T, preferred_element_type=x.dtype)
        if hasattr(self, "bias"):
            y = y + self.bias.astype(y.dtype)
        return y


class QuantizedFusedLinear(QuantizedLinear):
    """Output-axis row-stack of sibling ``QuantizedLinear``s that share one
    activation (q/k/v, gate/up): ONE fused dequant-matmul dispatch replaces
    ``len(siblings)`` calls, and ``__call__`` returns the per-sibling splits.

    Why this exists (KERNEL_BENCH.md, round 5 int4@1B isolation): at ≤1B
    scale the AR decode step is latency-bound and every Pallas custom-call
    boundary breaks XLA's fusion of the rope/norm/residual elementwise work
    around it — each talker shape *wins per-layer* yet int4 lost ~18% RTF
    *in-loop*. Concatenating packed rows along the output axis is exactly a
    row-stack (each output row's dot product over K is unchanged, so the
    Pallas path is bitwise-identical per row) while cutting custom calls per
    decode layer from 7 to 4. It also lifts tiny sibling shapes over the
    GEMV size floor: three 512×512 codec projections each lose to XLA
    dequant (0.72×), but their 1536×512 row-stack routes and wins.
    The reference keeps separate MLX QuantizedLinear modules per projection
    (mlx_audio/utils.py:207-251 checkpoint contract) — an MLX-idiomatic
    choice; on TPU the fused GEMV is the idiomatic one. The on-disk contract
    is untouched: fusion runs post-load (`fuse_quantized_projections`).
    """

    @classmethod
    def from_siblings(cls, lins: "list[QuantizedLinear]") -> "QuantizedFusedLinear":
        first = lins[0]
        in_d = first.scales.shape[1] * first.group_size
        any_bias = any(hasattr(l, "bias") for l in lins)
        obj = cls(
            in_d,
            sum(l.weight.shape[0] for l in lins),
            bias=any_bias,
            group_size=first.group_size,
            bits=first.bits,
        )
        obj.weight = jnp.concatenate([l.weight for l in lins], axis=0)
        obj.scales = jnp.concatenate([l.scales for l in lins], axis=0)
        obj.biases = jnp.concatenate([l.biases for l in lins], axis=0)
        if any_bias:
            # mixed bias-ness (e.g. whisper's bias-less key between biased
            # query/value): a zero bias is the identity, so zero-fill
            obj.bias = jnp.concatenate([
                l.bias if hasattr(l, "bias")
                else jnp.zeros((l.weight.shape[0],), lins[0].scales.dtype)
                for l in lins
            ], axis=0)
        obj.split_sizes = tuple(int(l.weight.shape[0]) for l in lins)
        return obj

    @staticmethod
    def fusable(lins: "list") -> bool:
        """Siblings fuse iff they are plain QuantizedLinears with identical
        quantization geometry, and none is a TP shard (a tensor-parallel
        row split must keep its own collective)."""
        if not all(type(l) is QuantizedLinear for l in lins):
            return False
        first = lins[0]
        return all(
            l.bits == first.bits
            and l.group_size == first.group_size
            and l.scales.shape[1] == first.scales.shape[1]
            and not getattr(l, "tp_sharded", False)
            for l in lins
        )

    def __call__(self, x: jax.Array):  # type: ignore[override]
        y = super().__call__(x)
        out, off = [], 0
        for n in self.split_sizes:
            out.append(jax.lax.slice_in_dim(y, off, off + n, axis=-1))
            off += n
        return tuple(out)


def fused_mlp_call(gate_up, down, x):
    """Single-dispatch SwiGLU MLP ``silu(g)·u @ Wd.T`` when both halves are
    Pallas-routable quantized layers; returns None to signal the caller to
    take the multi-call fallback.

    This is the in-kernel epilogue step beyond ``QuantizedFusedLinear``
    (KERNEL_BENCH round-5 int4@1B isolation): the row-stack cut the decode
    layer from 7 quantized custom calls to 4, and the residual cost is the
    calls that consume *different* activations — ``down_proj`` reads
    silu(g)·u, so XLA computes that elementwise between two Pallas
    boundaries. `ops.pallas.quant_matmul.quantized_mlp` moves the whole
    gate_up → SwiGLU → down chain into ONE dispatch with the hidden vector
    held in VMEM scratch, removing a boundary per decode layer and the
    intermediate's HBM round trip.
    """
    import os

    if os.environ.get("MLX_AUDIO_TPU_FUSED_MLP", "1") == "0":
        return None
    if type(gate_up) is not QuantizedFusedLinear or \
            type(down) is not QuantizedLinear:
        return None
    split = getattr(gate_up, "split_sizes", ())
    if len(split) != 2 or split[0] != split[1]:
        return None
    if hasattr(gate_up, "bias") or hasattr(down, "bias"):
        return None
    if gate_up.bits != down.bits or gate_up.bits not in (4, 8) or \
            gate_up.group_size != down.group_size:
        return None
    if getattr(gate_up, "tp_sharded", False) or \
            getattr(down, "tp_sharded", False):
        return None
    from ..ops.pallas import pallas_enabled

    if not pallas_enabled():
        return None
    per = 32 // gate_up.bits
    K = x.shape[-1]
    I = split[0]
    N = down.weight.shape[0]
    M = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    # phase-A blocks are fixed at per·128 rows so the scratch scatter
    # stays lane-aligned; the down block needs the same N alignment as
    # the plain kernel. Decode/small-batch only: at prefill M the
    # intermediate no longer fits the (per, M, I/per) VMEM scratch and
    # weight bandwidth stops dominating anyway.
    if K % per or I % (per * 128) or gate_up.group_size % per:
        return None
    if not (N >= 512 or (N >= 128 and N % 128 == 0)):
        return None
    if M > 16:
        return None
    from ..ops.pallas.quant_matmul import quantized_mlp

    return quantized_mlp(
        x, gate_up.weight, gate_up.scales, gate_up.biases,
        down.weight, down.scales, down.biases,
        bits=gate_up.bits, group_size=gate_up.group_size)


def fuse_quantized_projections(model: Module) -> int:
    """Install fused q/k/v and gate/up projections on supporting modules.

    A module opts in by declaring ``_FUSE_GROUPS = ((fused_attr, (names…)),
    …)`` as a class attribute and consuming ``fused_attr`` in its
    ``__call__``; the pass row-stacks each group's QuantizedLinears into a
    single :class:`QuantizedFusedLinear`, installs it under ``fused_attr``,
    and deletes the originals (no duplicate HBM residency). Run AFTER
    weights are loaded/quantized; never run before a checkpoint save (the
    dotted-key layout changes). Returns the number of groups fused.
    Disable with ``MLX_AUDIO_TPU_FUSE_PROJ=0``.
    """
    import os

    if os.environ.get("MLX_AUDIO_TPU_FUSE_PROJ", "1") == "0":
        return 0
    fused = 0
    seen: set[int] = set()

    def visit(obj):
        nonlocal fused
        if id(obj) in seen:
            return
        seen.add(id(obj))
        if isinstance(obj, Module):
            groups = (() if getattr(obj, "_fuse_veto", False)
                      else getattr(type(obj), "_FUSE_GROUPS", ()))
            for fused_attr, names in groups:
                lins = [getattr(obj, n, None) for n in names]
                if any(l is None for l in lins):
                    continue
                if not QuantizedFusedLinear.fusable(lins):
                    continue
                setattr(obj, fused_attr, QuantizedFusedLinear.from_siblings(lins))
                for n in names:
                    delattr(obj, n)
                fused += 1
            for v in list(obj.__dict__.values()):
                visit(v)
        elif isinstance(obj, (list, tuple)):
            for v in obj:
                visit(v)
        elif isinstance(obj, dict):
            for v in obj.values():
                visit(v)

    visit(model)
    return fused


class QuantizedEmbedding(Module):
    def __init__(
        self, num_embeddings: int, dims: int, group_size: int = 64, bits: int = 4
    ):
        if bits in (3, 6):
            self.weight = jnp.zeros(
                (num_embeddings, dims * bits // 8), dtype=jnp.uint8)
        else:
            self.weight = jnp.zeros(
                (num_embeddings, dims // (32 // bits)), dtype=jnp.uint32)
        self.scales = jnp.ones((num_embeddings, dims // group_size))
        self.biases = jnp.zeros((num_embeddings, dims // group_size))
        self.group_size = group_size
        self.bits = bits

    @classmethod
    def from_embedding(cls, emb: Embedding, group_size: int = 64, bits: int = 4):
        n, d = emb.weight.shape
        obj = cls(n, d, group_size=group_size, bits=bits)
        packed, scales, biases = quantize_arrays(emb.weight, group_size, bits)
        obj.weight = jnp.asarray(packed)
        obj.scales = jnp.asarray(scales)
        obj.biases = jnp.asarray(biases)
        return obj

    def dequantized_weight(self, dtype=jnp.bfloat16) -> jax.Array:
        return dequantize_arrays(
            self.weight, self.scales, self.biases, self.group_size, self.bits, dtype
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        # Gather packed rows first, then dequantize only what's needed.
        rows = self.weight[x]
        s = self.scales[x]
        b = self.biases[x]
        return dequantize_arrays(rows, s, b, self.group_size, self.bits, jnp.float32)

    def as_linear(self, x: jax.Array) -> jax.Array:
        w = self.dequantized_weight(x.dtype)
        return jnp.matmul(x, w.T, preferred_element_type=x.dtype)


def quantize_module(
    model: Module,
    group_size: int = 64,
    bits: int = 4,
    predicate=None,
) -> Module:
    """Replace Linear/Embedding submodules with quantized versions in-place.

    `predicate(path, module)` may veto/override per layer (return False to
    skip, True to quantize with defaults, or a dict {"group_size", "bits"}).
    Mirrors the reference's config-driven `apply_quantization`.
    """

    def visit(obj, path):
        if isinstance(obj, Module):
            for k, v in list(obj.__dict__.items()):
                child_path = f"{path}.{k}" if path else k
                new = maybe_swap(v, child_path)
                if new is not None:
                    setattr(obj, k, new)
                else:
                    visit(v, child_path)
        elif isinstance(obj, (list, tuple)):
            for i, v in enumerate(obj):
                child_path = f"{path}.{i}"
                new = maybe_swap(v, child_path)
                if new is not None:
                    obj[i] = new
                else:
                    visit(v, child_path)
        elif isinstance(obj, dict):
            for k, v in obj.items():
                child_path = f"{path}.{k}"
                new = maybe_swap(v, child_path)
                if new is not None:
                    obj[k] = new
                else:
                    visit(v, child_path)

    def maybe_swap(v, path):
        if not isinstance(v, (Linear, Embedding)):
            return None
        gs, b = group_size, bits
        if predicate is not None:
            r = predicate(path, v)
            if r is False or r is None:
                return None
            if isinstance(r, dict):
                gs = r.get("group_size", gs)
                b = r.get("bits", b)
        in_dim = v.weight.shape[-1]
        if in_dim % gs != 0 or b not in SUPPORTED_BITS:
            return None
        if isinstance(v, Linear):
            return QuantizedLinear.from_linear(v, gs, b)
        return QuantizedEmbedding.from_embedding(v, gs, b)

    visit(model, "")
    return model
