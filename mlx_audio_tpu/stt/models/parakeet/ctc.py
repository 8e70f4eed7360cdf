"""CTC head (spec: reference stt/models/parakeet/ctc.py)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import jax
import jax.numpy as jnp

from ....nn import Conv1d, Module


@dataclass
class ConvASRDecoderArgs:
    feat_in: int = 512
    num_classes: int = -1
    vocabulary: List[str] = field(default_factory=list)


@dataclass
class AuxCTCArgs:
    decoder: ConvASRDecoderArgs = None


class ConvASRDecoder(Module):
    def __init__(self, args: ConvASRDecoderArgs):
        num_classes = (
            len(args.vocabulary) if args.num_classes <= 0 else args.num_classes
        ) + 1
        self.decoder_layers = [Conv1d(args.feat_in, num_classes, 1, bias=True)]
        self.temperature = 1.0

    def __call__(self, x):
        return jax.nn.log_softmax(self.decoder_layers[0](x) / self.temperature)
