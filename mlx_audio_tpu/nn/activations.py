"""Activation functions and small fused ops used across the model zoo."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .module import Module

__all__ = [
    "silu",
    "gelu",
    "gelu_tanh",
    "snake",
    "snake_beta",
    "mish",
    "SiLU",
    "GELU",
    "ReLU",
    "LeakyReLU",
    "Tanh",
    "Sigmoid",
    "ELU",
    "Softplus",
    "Mish",
    "GLU",
]

silu = jax.nn.silu


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def snake(x, alpha):
    """Snake activation: x + sin^2(alpha x)/alpha (DAC/BigVGAN vocoders)."""
    a = alpha.astype(x.dtype)
    s = jnp.sin(a * x)
    return x + s * s / (a + 1e-9)


def snake_beta(x, alpha, beta):
    a = alpha.astype(x.dtype)
    b = beta.astype(x.dtype)
    s = jnp.sin(a * x)
    return x + s * s / (b + 1e-9)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class SiLU(Module):
    def __call__(self, x):
        return jax.nn.silu(x)


class GELU(Module):
    def __init__(self, approx: str = "none"):
        self.approx = approx

    def __call__(self, x):
        return jax.nn.gelu(x, approximate=self.approx in ("tanh", "precise"))


class ReLU(Module):
    def __call__(self, x):
        return jax.nn.relu(x)


class LeakyReLU(Module):
    def __init__(self, negative_slope: float = 0.01):
        self.negative_slope = negative_slope

    def __call__(self, x):
        return jax.nn.leaky_relu(x, self.negative_slope)


class Tanh(Module):
    def __call__(self, x):
        return jnp.tanh(x)


class Sigmoid(Module):
    def __call__(self, x):
        return jax.nn.sigmoid(x)


class ELU(Module):
    def __init__(self, alpha: float = 1.0):
        self.alpha = alpha

    def __call__(self, x):
        return jax.nn.elu(x, self.alpha)


class Softplus(Module):
    def __call__(self, x):
        return jax.nn.softplus(x)


class Mish(Module):
    def __call__(self, x):
        return mish(x)


class GLU(Module):
    def __init__(self, axis: int = -1):
        self.axis = axis

    def __call__(self, x):
        a, b = jnp.split(x, 2, axis=self.axis)
        return a * jax.nn.sigmoid(b)
