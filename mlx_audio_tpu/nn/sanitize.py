"""Generic checkpoint-sanitize helpers shared by model families."""

from __future__ import annotations

import numpy as np

from .module import Module, flatten_params

__all__ = ["orient_to", "orient_weights_to_model"]


def orient_to(w, expected: tuple):
    """Permute a conv weight into the model's expected layout.

    Tries identity, torch-conv (O,I,K)→(O,K,I), torch-convT (I,O,K)→(O,K,I),
    and in/out-swapped layouts. Shape-driven, hence idempotent."""
    w = np.asarray(w)
    if tuple(w.shape) == tuple(expected) or w.ndim != len(expected):
        return w
    if w.ndim == 3:
        perms = ((0, 2, 1), (1, 2, 0), (2, 1, 0), (2, 0, 1), (1, 0, 2))
    elif w.ndim == 4:
        perms = ((0, 2, 3, 1), (1, 2, 3, 0), (3, 1, 2, 0))
    else:
        return w
    for perm in perms:
        if tuple(np.transpose(w, perm).shape) == tuple(expected):
            return np.ascontiguousarray(np.transpose(w, perm))
    return w


def orient_weights_to_model(model: Module, weights: dict) -> dict:
    """Orient every >=3-D weight in `weights` against the model's expected
    parameter shapes (skips keys the model doesn't have)."""
    expected = {k: tuple(v.shape) for k, v in flatten_params(model).items()}
    out = {}
    for k, w in weights.items():
        if k in expected and getattr(w, "ndim", 0) >= 3:
            w = orient_to(w, expected[k])
        out[k] = w
    return out
