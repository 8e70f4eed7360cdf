"""Shared codec utilities: weight-norm folding, layout orientation."""

from __future__ import annotations

import numpy as np

__all__ = ["fold_weight_norm_pairs"]


def fold_weight_norm_pairs(weights: dict) -> dict:
    """Fold every (weight_g, weight_v) pair into a single `weight`.

    The norm axis set is inferred from the g shape (g has size-1 axes where
    the norm was taken): handles both conv (except_dim=0) and transposed-conv
    (except_dim=2) conventions of the reference's WN layers
    (descript/nn/layers.py:7-113).
    """
    out = dict(weights)
    # torch >=2.1 parametrize-style weight norm:
    # <mod>.parametrizations.weight.original0 (g) / original1 (v)
    for k in [k for k in weights if k.endswith("parametrizations.weight.original0")]:
        base = k[: -len("parametrizations.weight.original0")]
        out[base + "weight_g"] = out.pop(k)
        vk = base + "parametrizations.weight.original1"
        if vk in out:
            out[base + "weight_v"] = out.pop(vk)
    weights = dict(out)
    for gkey in [k for k in weights if k.endswith("weight_g")]:
        vkey = gkey[:-1] + "v"
        if vkey not in weights:
            continue
        g = np.asarray(out.pop(gkey), np.float32)
        v = np.asarray(out.pop(vkey), np.float32)
        norm_axes = tuple(i for i in range(v.ndim) if i >= len(g.shape) or g.shape[i] == 1)
        if g.ndim < v.ndim:
            g = g.reshape(g.shape + (1,) * (v.ndim - g.ndim))
        norm_axes = tuple(i for i in range(v.ndim) if g.shape[i] == 1)
        norm = np.sqrt((v**2).sum(axis=norm_axes, keepdims=True))
        out[gkey.rsplit(".", 1)[0] + ".weight"] = g * v / np.maximum(norm, 1e-12)
    return out
