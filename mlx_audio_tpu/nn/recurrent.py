"""Recurrent layers as `lax.scan` loops with fused gate matmuls.

Used by Kokoro (bidirectional LSTM in prosody predictor / text encoder),
EnCodec (streaming LSTM), Parakeet (RNNT prediction network). The heavy
input-projection matmul (x @ Wx.T for all timesteps) is hoisted out of the
scan so the MXU sees one large batched matmul; only the small recurrent
matmul stays inside the scan body.

Gate ordering is torch-style [i, f, g, o] so checkpoints load directly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .module import Module

__all__ = ["LSTM", "BiLSTM", "GRU", "lstm_scan"]


def lstm_scan(
    x_proj: jax.Array,  # (N, T, 4H) — precomputed x @ Wx.T + b
    wh: jax.Array,  # (4H, H)
    h0: jax.Array,  # (N, H)
    c0: jax.Array,  # (N, H)
    reverse: bool = False,
    mask: Optional[jax.Array] = None,  # (N, T) True = valid step
):
    """Run an LSTM over time. Returns (hidden_states (N,T,H), (hT, cT)).

    With `mask`, the carry freezes on padded steps — a reversed scan over a
    right-padded sequence then reaches the last *valid* step with the clean
    initial state, making outputs independent of the bucket padding length.
    """
    H = wh.shape[1]
    whT = wh.T.astype(x_proj.dtype)

    def step(carry, inp):
        h, c = carry
        xt = inp[0] if mask is not None else inp
        z = xt + jnp.matmul(h, whT, preferred_element_type=xt.dtype)
        i = jax.nn.sigmoid(z[..., 0 * H : 1 * H])
        f = jax.nn.sigmoid(z[..., 1 * H : 2 * H])
        g = jnp.tanh(z[..., 2 * H : 3 * H])
        o = jax.nn.sigmoid(z[..., 3 * H : 4 * H])
        cn = f * c + i * g
        hn = o * jnp.tanh(cn)
        if mask is not None:
            mt = inp[1][:, None]
            cn = jnp.where(mt, cn, c)
            hn = jnp.where(mt, hn, h)
        return (hn, cn), hn

    xs = jnp.swapaxes(x_proj, 0, 1)  # (T, N, 4H)
    inputs = xs if mask is None else (xs, jnp.swapaxes(mask, 0, 1))
    (hT, cT), hs = jax.lax.scan(step, (h0, c0), inputs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1), (hT, cT)


def _length_mask(T: int, valid_len: Optional[jax.Array]):
    if valid_len is None:
        return None
    return jnp.arange(T)[None, :] < valid_len[:, None]


class LSTM(Module):
    """Single-direction LSTM. Input (N, T, D) → (N, T, H).

    Weight names follow torch (`weight_ih_l0` style keys map onto
    `Wx`/`Wh`/`bias_ih`/`bias_hh` via model `sanitize`).
    """

    def __init__(self, input_size: int, hidden_size: int, bias: bool = True):
        k = 1.0 / jnp.sqrt(hidden_size)
        self.Wx = jax.random.uniform(
            jax.random.PRNGKey(0), (4 * hidden_size, input_size), minval=-k, maxval=k
        )
        self.Wh = jax.random.uniform(
            jax.random.PRNGKey(1), (4 * hidden_size, hidden_size), minval=-k, maxval=k
        )
        if bias:
            self.bias_ih = jnp.zeros((4 * hidden_size,))
            self.bias_hh = jnp.zeros((4 * hidden_size,))
        self.hidden_size = hidden_size

    def __call__(self, x: jax.Array, hidden=None, reverse: bool = False,
                 valid_len: Optional[jax.Array] = None):
        N = x.shape[0]
        H = self.hidden_size
        xp = jnp.matmul(x, self.Wx.T.astype(x.dtype), preferred_element_type=x.dtype)
        if hasattr(self, "bias_ih"):
            xp = xp + (self.bias_ih + self.bias_hh).astype(xp.dtype)
        if hidden is None:
            h0 = jnp.zeros((N, H), dtype=x.dtype)
            c0 = jnp.zeros((N, H), dtype=x.dtype)
        else:
            h0, c0 = hidden
        return lstm_scan(
            xp, self.Wh, h0, c0, reverse=reverse,
            mask=_length_mask(x.shape[1], valid_len),
        )


class BiLSTM(Module):
    """Bidirectional LSTM: concat of forward and backward hidden states.

    `valid_len` (B,) makes outputs at valid positions independent of the
    right-padding length: the forward direction is naturally immune, the
    reversed direction freezes its carry across padded steps.
    """

    def __init__(self, input_size: int, hidden_size: int, bias: bool = True):
        self.forward = LSTM(input_size, hidden_size, bias)
        self.backward = LSTM(input_size, hidden_size, bias)

    def __call__(self, x: jax.Array, valid_len: Optional[jax.Array] = None):
        fwd, _ = self.forward(x)
        bwd, _ = self.backward(x, reverse=True, valid_len=valid_len)
        return jnp.concatenate([fwd, bwd], axis=-1)


class GRU(Module):
    """Torch-compatible GRU, gate order [r, z, n]. Input (N, T, D) → (N, T, H)."""

    def __init__(self, input_size: int, hidden_size: int, bias: bool = True):
        k = 1.0 / jnp.sqrt(hidden_size)
        self.Wx = jax.random.uniform(
            jax.random.PRNGKey(0), (3 * hidden_size, input_size), minval=-k, maxval=k
        )
        self.Wh = jax.random.uniform(
            jax.random.PRNGKey(1), (3 * hidden_size, hidden_size), minval=-k, maxval=k
        )
        if bias:
            self.bias_ih = jnp.zeros((3 * hidden_size,))
            self.bias_hh = jnp.zeros((3 * hidden_size,))
        self.hidden_size = hidden_size

    def __call__(self, x: jax.Array, h0: Optional[jax.Array] = None):
        N = x.shape[0]
        H = self.hidden_size
        xp = jnp.matmul(x, self.Wx.T.astype(x.dtype), preferred_element_type=x.dtype)
        if hasattr(self, "bias_ih"):
            xp = xp + self.bias_ih.astype(xp.dtype)
        whT = self.Wh.T.astype(x.dtype)
        bhh = self.bias_hh.astype(x.dtype) if hasattr(self, "bias_hh") else None
        if h0 is None:
            h0 = jnp.zeros((N, H), dtype=x.dtype)

        def step(h, xt):
            hp = jnp.matmul(h, whT, preferred_element_type=xt.dtype)
            if bhh is not None:
                hp = hp + bhh
            r = jax.nn.sigmoid(xt[..., :H] + hp[..., :H])
            z = jax.nn.sigmoid(xt[..., H : 2 * H] + hp[..., H : 2 * H])
            n = jnp.tanh(xt[..., 2 * H :] + r * hp[..., 2 * H :])
            h = (1 - z) * n + z * h
            return h, h

        xs = jnp.swapaxes(xp, 0, 1)
        hT, hs = jax.lax.scan(step, h0, xs)
        return jnp.swapaxes(hs, 0, 1), hT
