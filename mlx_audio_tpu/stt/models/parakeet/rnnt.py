"""RNNT/TDT prediction + joint networks
(spec: reference stt/models/parakeet/rnnt.py)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp

from ....nn import Embedding, Linear, Module
from ....nn.recurrent import LSTM

__all__ = ["PredictArgs", "JointArgs", "PredictNetwork", "JointNetwork",
           "PredictNetworkArgs", "JointNetworkArgs"]


@dataclass
class PredictNetworkArgs:
    pred_hidden: int = 640
    pred_rnn_layers: int = 2
    rnn_hidden_size: Optional[int] = None


@dataclass
class JointNetworkArgs:
    joint_hidden: int = 640
    activation: str = "relu"
    pred_hidden: int = 640
    encoder_hidden: int = 512


@dataclass
class PredictArgs:
    prednet: PredictNetworkArgs = field(default_factory=PredictNetworkArgs)
    vocab_size: int = 1024
    blank_as_pad: bool = True


@dataclass
class JointArgs:
    jointnet: JointNetworkArgs = field(default_factory=JointNetworkArgs)
    num_classes: int = 1024
    vocabulary: List[str] = field(default_factory=list)
    num_extra_outputs: int = 0


class StackedLSTM(Module):
    """Multi-layer LSTM with functional (h, c) state stacks."""

    def __init__(self, input_size: int, hidden_size: int, num_layers: int = 1):
        self.lstm = [
            LSTM(input_size if i == 0 else hidden_size, hidden_size)
            for i in range(num_layers)
        ]
        self.hidden_size = hidden_size
        self.num_layers = num_layers

    def init_state(self, batch: int, dtype=jnp.float32):
        z = jnp.zeros((self.num_layers, batch, self.hidden_size), dtype)
        return z, z

    def __call__(self, x, state=None):
        # x: (B, T, D)
        if state is None:
            state = self.init_state(x.shape[0], x.dtype)
        h_all, c_all = state
        hs, cs = [], []
        out = x
        for i, layer in enumerate(self.lstm):
            out, (h, c) = layer(out, (h_all[i], c_all[i]))
            hs.append(h)
            cs.append(c)
        return out, (jnp.stack(hs), jnp.stack(cs))


class PredictNetwork(Module):
    def __init__(self, args: PredictArgs):
        pred_hidden = args.prednet.pred_hidden
        vocab = args.vocab_size + (1 if args.blank_as_pad else 0)
        self.prediction = {
            "embed": Embedding(vocab, pred_hidden),
            "dec_rnn": StackedLSTM(
                pred_hidden,
                args.prednet.rnn_hidden_size or pred_hidden,
                args.prednet.pred_rnn_layers,
            ),
        }
        self.pred_hidden = pred_hidden

    def init_state(self, batch: int = 1):
        return self.prediction["dec_rnn"].init_state(batch)

    def __call__(self, y: Optional[jax.Array], state=None):
        """y: (B, 1) token or None (SOS → zero embedding)."""
        if y is not None:
            emb = self.prediction["embed"](y)
        else:
            emb = jnp.zeros((1, 1, self.pred_hidden))
        return self.prediction["dec_rnn"](emb, state)

    def step_embed(self, y: jax.Array, use_zero: jax.Array, state):
        """jit-friendly step: y (B, 1); use_zero selects the SOS embedding."""
        emb = self.prediction["embed"](y)
        emb = jnp.where(use_zero[:, None, None], 0.0, emb)
        return self.prediction["dec_rnn"](emb, state)


class JointNetwork(Module):
    def __init__(self, args: JointArgs):
        self.pred = Linear(args.jointnet.pred_hidden, args.jointnet.joint_hidden)
        self.enc = Linear(args.jointnet.encoder_hidden, args.jointnet.joint_hidden)
        self.joint_net = [
            Linear(args.jointnet.joint_hidden,
                   args.num_classes + 1 + args.num_extra_outputs)
        ]
        self.activation = args.jointnet.activation.lower()

    def __call__(self, enc, pred):
        """enc (B, T, De), pred (B, U, Dp) → (B, T, U, V)."""
        e = self.enc(enc)
        p = self.pred(pred)
        x = e[:, :, None, :] + p[:, None, :, :]
        if self.activation == "relu":
            x = jax.nn.relu(x)
        elif self.activation == "sigmoid":
            x = jax.nn.sigmoid(x)
        else:
            x = jnp.tanh(x)
        return self.joint_net[0](x)
