"""Core NN layers (pytree modules) for the TPU audio stack.

Sequence layout is channels-last (batch, length, channels) throughout — the
natural layout for TPU (lane dim = channels) and the same convention the
reference stack uses on MLX. Weight layouts match MLX-converted safetensors
checkpoints (Linear: (out, in); Conv1d: (out, k, in); ConvTranspose1d:
(out, k, in)) so community checkpoints load without transposition; torch
layouts are handled by per-model ``sanitize``.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from .module import Module

__all__ = [
    "Linear",
    "Embedding",
    "Conv1d",
    "Conv2d",
    "ConvTranspose1d",
    "ConvTranspose2d",
    "LayerNorm",
    "RMSNorm",
    "GroupNorm",
    "InstanceNorm",
    "BatchNorm",
    "Sequential",
    "Identity",
    "Dropout",
    "MaxPool1d",
    "AvgPool1d",
]


def _he_uniform(key, shape, fan_in, dtype=jnp.float32):
    scale = math.sqrt(1.0 / max(fan_in, 1))
    return jax.random.uniform(key, shape, dtype, -scale, scale)


# Lazy: creating a PRNGKey materializes a device array, which would force
# backend init (TPU tunnel handshake) at import time. Seed is stored as a
# plain int until the first draw.
_KEY = [None]
_SEED = [0]


def seed_rng(seed: int = 0) -> None:
    """Reset the global init-RNG stream. Weight init draws from a shared
    counter, so tests asserting exact numerics should pin it (otherwise
    model weights depend on how many layers were built earlier)."""
    _SEED[0] = seed
    _KEY[0] = None


def _next_key():
    if _KEY[0] is None:
        _KEY[0] = jax.random.PRNGKey(_SEED[0])
    _KEY[0], k = jax.random.split(_KEY[0])
    return k


class Linear(Module):
    """y = x @ W.T + b with W stored (out_features, in_features)."""

    def __init__(self, input_dims: int, output_dims: int, bias: bool = True):
        self.weight = _he_uniform(_next_key(), (output_dims, input_dims), input_dims)
        if bias:
            self.bias = jnp.zeros((output_dims,))

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.weight
        y = jnp.matmul(x, w.T.astype(x.dtype), preferred_element_type=x.dtype)
        if hasattr(self, "bias"):
            y = y + self.bias.astype(y.dtype)
        return y


class Embedding(Module):
    def __init__(self, num_embeddings: int, dims: int):
        self.weight = 0.02 * jax.random.normal(_next_key(), (num_embeddings, dims))

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.weight[x]

    def as_linear(self, x: jax.Array) -> jax.Array:
        """Tied-weight output projection: x @ W.T."""
        return jnp.matmul(
            x, self.weight.T.astype(x.dtype), preferred_element_type=x.dtype
        )


def _norm_pad(padding) -> Sequence[tuple[int, int]]:
    if isinstance(padding, int):
        return [(padding, padding)]
    if isinstance(padding, tuple) and all(isinstance(p, int) for p in padding):
        if len(padding) == 2:
            return [padding]
        return [(p, p) for p in padding]
    return list(padding)


class Conv1d(Module):
    """1-D convolution over (N, L, C_in) → (N, L', C_out).

    Weight shape (C_out, K, C_in/groups) — identical to MLX checkpoints.
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int,
        stride: int = 1,
        padding: int = 0,
        dilation: int = 1,
        groups: int = 1,
        bias: bool = True,
    ):
        fan_in = in_channels // groups * kernel_size
        self.weight = _he_uniform(
            _next_key(), (out_channels, kernel_size, in_channels // groups), fan_in
        )
        if bias:
            self.bias = jnp.zeros((out_channels,))
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jax.lax.conv_general_dilated(
            x,
            self.weight.astype(x.dtype),
            window_strides=(self.stride,),
            padding=_norm_pad(self.padding),
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NLC", "OLI", "NLC"),
            feature_group_count=self.groups,
        )
        if hasattr(self, "bias"):
            y = y + self.bias.astype(y.dtype)
        return y


class Conv2d(Module):
    """2-D convolution over (N, H, W, C_in). Weight (C_out, KH, KW, C_in/groups)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size,
        stride=1,
        padding=0,
        dilation=1,
        groups: int = 1,
        bias: bool = True,
    ):
        ks = (kernel_size,) * 2 if isinstance(kernel_size, int) else tuple(kernel_size)
        fan_in = in_channels // groups * ks[0] * ks[1]
        self.weight = _he_uniform(
            _next_key(), (out_channels, ks[0], ks[1], in_channels // groups), fan_in
        )
        if bias:
            self.bias = jnp.zeros((out_channels,))
        self.stride = (stride,) * 2 if isinstance(stride, int) else tuple(stride)
        self.padding = (
            [(padding, padding)] * 2 if isinstance(padding, int) else _norm_pad(padding)
        )
        self.dilation = (dilation,) * 2 if isinstance(dilation, int) else tuple(dilation)
        self.groups = groups

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jax.lax.conv_general_dilated(
            x,
            self.weight.astype(x.dtype),
            window_strides=self.stride,
            padding=self.padding,
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "OHWI", "NHWC"),
            feature_group_count=self.groups,
        )
        if hasattr(self, "bias"):
            y = y + self.bias.astype(y.dtype)
        return y


class ConvTranspose1d(Module):
    """Transposed 1-D convolution with torch semantics.

    Weight shape (C_out, K, C_in) (MLX layout). Output length:
    (L-1)*stride - 2*padding + kernel + output_padding.
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int,
        stride: int = 1,
        padding: int = 0,
        output_padding: int = 0,
        groups: int = 1,
        bias: bool = True,
    ):
        fan_in = in_channels // groups * kernel_size
        self.weight = _he_uniform(
            _next_key(), (out_channels, kernel_size, in_channels // groups), fan_in
        )
        if bias:
            self.bias = jnp.zeros((out_channels,))
        self.stride = stride
        self.padding = padding
        self.output_padding = output_padding
        self.groups = groups
        self.kernel_size = kernel_size

    def __call__(self, x: jax.Array) -> jax.Array:
        k, p, op = self.kernel_size, self.padding, self.output_padding
        # Transposed conv = zero-stuff inputs by (stride-1), pad (k-1-p), then
        # correlate with the spatially-flipped kernel.
        w = jnp.flip(self.weight, axis=1).astype(x.dtype)
        w = jnp.swapaxes(w, 0, 2)  # (C_in/groups, K, C_out) for rhs spec "ILO"
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(1,),
            padding=[(k - 1 - p, k - 1 - p + op)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NLC", "ILO", "NLC"),
            feature_group_count=self.groups,
        )
        if hasattr(self, "bias"):
            y = y + self.bias.astype(y.dtype)
        return y


class ConvTranspose2d(Module):
    """Transposed 2-D convolution (torch semantics), weight (C_out, KH, KW, C_in)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size,
        stride=1,
        padding=0,
        output_padding=0,
        bias: bool = True,
    ):
        ks = (kernel_size,) * 2 if isinstance(kernel_size, int) else tuple(kernel_size)
        fan_in = in_channels * ks[0] * ks[1]
        self.weight = _he_uniform(
            _next_key(), (out_channels, ks[0], ks[1], in_channels), fan_in
        )
        if bias:
            self.bias = jnp.zeros((out_channels,))
        self.kernel_size = ks
        self.stride = (stride,) * 2 if isinstance(stride, int) else tuple(stride)
        self.padding = (padding,) * 2 if isinstance(padding, int) else tuple(padding)
        self.output_padding = (
            (output_padding,) * 2
            if isinstance(output_padding, int)
            else tuple(output_padding)
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        ph, pw = self.padding
        oph, opw = self.output_padding
        w = jnp.flip(self.weight, axis=(1, 2)).astype(x.dtype)
        w = jnp.transpose(w, (3, 1, 2, 0))  # (C_in, KH, KW, C_out)
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding=[(kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw)],
            lhs_dilation=self.stride,
            dimension_numbers=("NHWC", "IHWO", "NHWC"),
        )
        if hasattr(self, "bias"):
            y = y + self.bias.astype(y.dtype)
        return y


class LayerNorm(Module):
    def __init__(
        self, dims: int, eps: float = 1e-5, affine: bool = True, bias: bool = True
    ):
        if affine:
            self.weight = jnp.ones((dims,))
            if bias:
                self.bias = jnp.zeros((dims,))
        self.eps = eps

    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if hasattr(self, "weight"):
            y = y * self.weight.astype(jnp.float32)
        if hasattr(self, "bias"):
            y = y + self.bias.astype(jnp.float32)
        return y.astype(x.dtype)


class RMSNorm(Module):
    def __init__(self, dims: int, eps: float = 1e-5, affine: bool = True):
        if affine:
            self.weight = jnp.ones((dims,))
        self.eps = eps

    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        if hasattr(self, "weight"):
            y = y * self.weight.astype(jnp.float32)
        return y.astype(x.dtype)


class GroupNorm(Module):
    """GroupNorm over channels-last input (..., C).

    pytorch_compatible groups statistics over (C/G) contiguous channels.
    """

    def __init__(
        self,
        num_groups: int,
        dims: int,
        eps: float = 1e-5,
        affine: bool = True,
        pytorch_compatible: bool = True,
    ):
        if affine:
            self.weight = jnp.ones((dims,))
            self.bias = jnp.zeros((dims,))
        self.num_groups = num_groups
        self.eps = eps

    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (N, ..., C). Normalize per (group over C and all spatial dims).
        orig_shape = x.shape
        n, c = x.shape[0], x.shape[-1]
        g = self.num_groups
        xf = x.astype(jnp.float32).reshape(n, -1, g, c // g)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.var(xf, axis=(1, 3), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y.reshape(orig_shape)
        if hasattr(self, "weight"):
            y = y * self.weight.astype(jnp.float32) + self.bias.astype(jnp.float32)
        return y.astype(x.dtype)


class InstanceNorm(Module):
    """InstanceNorm1d over (N, L, C): stats per (N, C) across L.

    `valid_len` (N,) restricts the statistics to the first valid_len
    positions — with bucketed static shapes this keeps normalization
    identical to the reference's exact-length behavior (padding must be
    excluded from the stats or the bucket size would change the output).
    """

    def __init__(self, dims: int, eps: float = 1e-5, affine: bool = True):
        if affine:
            self.weight = jnp.ones((dims,))
            self.bias = jnp.zeros((dims,))
        self.eps = eps

    def __call__(self, x: jax.Array, valid_len=None) -> jax.Array:
        # Single-pass E[x²]−E[x]² statistics: both reductions are
        # independent, so XLA fuses them into ONE read of x (a two-pass
        # (x−mean)² formulation costs an extra full pass at audio-rate
        # lengths; activations are O(1) so the cancellation is benign).
        xf = x.astype(jnp.float32)
        if valid_len is None:
            s1 = jnp.mean(xf, axis=-2, keepdims=True)
            s2 = jnp.mean(xf * xf, axis=-2, keepdims=True)
        else:
            L = x.shape[-2]
            m = (jnp.arange(L)[None, :] < valid_len[:, None])[..., None]
            cnt = jnp.maximum(valid_len, 1).astype(jnp.float32)[:, None, None]
            s1 = jnp.where(m, xf, 0.0).sum(axis=-2, keepdims=True) / cnt
            s2 = jnp.where(m, xf * xf, 0.0).sum(axis=-2, keepdims=True) / cnt
        mean = s1
        var = jnp.maximum(s2 - s1 * s1, 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if hasattr(self, "weight"):
            y = y * self.weight.astype(jnp.float32) + self.bias.astype(jnp.float32)
        return y.astype(x.dtype)


class BatchNorm(Module):
    """Inference-mode BatchNorm using running statistics (channels-last)."""

    def __init__(self, num_features: int, eps: float = 1e-5, affine: bool = True):
        if affine:
            self.weight = jnp.ones((num_features,))
            self.bias = jnp.zeros((num_features,))
        self.running_mean = jnp.zeros((num_features,))
        self.running_var = jnp.ones((num_features,))
        self.eps = eps

    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        y = (xf - self.running_mean) * jax.lax.rsqrt(self.running_var + self.eps)
        if hasattr(self, "weight"):
            y = y * self.weight.astype(jnp.float32) + self.bias.astype(jnp.float32)
        return y.astype(x.dtype)


class GELU(Module):
    """Parameter-free GELU as a layer, for torch-Sequential key parity
    (torch `mlp.0/mlp.2` → `mlp.layers.0/mlp.layers.2`)."""

    def __init__(self, approximate: str = "none"):
        self.approximate = approximate

    def __call__(self, x):
        if self.approximate == "tanh":
            return jax.nn.gelu(x, approximate=True)
        return jax.nn.gelu(x, approximate=False)


class ReLU(Module):
    def __call__(self, x):
        return jax.nn.relu(x)


class SiLU(Module):
    def __call__(self, x):
        return jax.nn.silu(x)


class Tanh(Module):
    def __call__(self, x):
        return jnp.tanh(x)


class Sequential(Module):
    def __init__(self, *layers):
        self.layers = list(layers)

    def __call__(self, x, *args, **kwargs):
        for l in self.layers:
            x = l(x)
        return x

    def __getitem__(self, i):
        return self.layers[i]

    def __iter__(self):
        return iter(self.layers)

    def __len__(self):
        return len(self.layers)


class Identity(Module):
    def __call__(self, x, *args, **kwargs):
        return x


class Dropout(Module):
    """Inference no-op (the stack is inference-only, as is the reference)."""

    def __init__(self, p: float = 0.0):
        self.p = p

    def __call__(self, x):
        return x


class MaxPool1d(Module):
    def __init__(self, kernel_size: int, stride: Optional[int] = None, padding: int = 0):
        self.kernel_size = kernel_size
        self.stride = stride or kernel_size
        self.padding = padding

    def __call__(self, x: jax.Array) -> jax.Array:
        return jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, self.kernel_size, 1),
            window_strides=(1, self.stride, 1),
            padding=((0, 0), (self.padding, self.padding), (0, 0)),
        )


class AvgPool1d(Module):
    def __init__(self, kernel_size: int, stride: Optional[int] = None, padding: int = 0):
        self.kernel_size = kernel_size
        self.stride = stride or kernel_size
        self.padding = padding

    def __call__(self, x: jax.Array) -> jax.Array:
        s = jax.lax.reduce_window(
            x,
            0.0,
            jax.lax.add,
            window_dimensions=(1, self.kernel_size, 1),
            window_strides=(1, self.stride, 1),
            padding=((0, 0), (self.padding, self.padding), (0, 0)),
        )
        return s / self.kernel_size
