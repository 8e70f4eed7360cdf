"""Distributed layer: device mesh + NamedSharding over ICI/DCN.

This layer is NEW relative to the reference, which is strictly single-device
(SURVEY §2.8: no distributed code of any kind in the reference). Design per
the scaling-book recipe: pick a mesh (axes `data`, `model`), annotate
parameter shardings with regex rules, let XLA insert collectives.

Serving default: replicate the model per chip and data-parallel-batch
requests (matches the BASELINE north star "server batches concurrent
TTS/STT streams per chip"). Tensor parallelism is opt-in for large
checkpoints (e.g. VibeVoice-ASR 9B) via `shard_module(model, mesh, rules)`.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn.module import flatten_params, path_str

__all__ = [
    "get_mesh",
    "replicate",
    "shard_module",
    "LLAMA_TP_RULES",
    "DIT_TP_RULES",
    "data_parallel_call",
]


def get_mesh(
    data: int = -1,
    model: int = 1,
    stage: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data[, stage], model) mesh. data=-1 → all remaining devices.

    On a multi-slice topology, the `data` axis should map to DCN and
    `model` to ICI; jax's default device order already yields contiguous
    ICI neighbors along the innermost axis. `stage` > 1 inserts a pipeline
    axis between them (ICI ring for ppermute; see pipeline.py) — when it
    is 1 the mesh stays two-axis for backward compatibility.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (model * stage) == 0, \
            f"{n} devices not divisible by model*stage={model * stage}"
        data = n // (model * stage)
    if stage == 1:
        arr = np.asarray(devices[: data * model]).reshape(data, model)
        return Mesh(arr, axis_names=("data", "model"))
    arr = np.asarray(devices[: data * stage * model]).reshape(
        data, stage, model)
    return Mesh(arr, axis_names=("data", "stage", "model"))


# Tensor-parallel rules for the Llama/Qwen family (column-parallel QKV +
# gate/up, row-parallel o_proj/down_proj, vocab-sharded embeddings).
LLAMA_TP_RULES = [
    (r".*\.(q_proj|k_proj|v_proj|gate_proj|up_proj)\.weight$", P("model", None)),
    (r".*\.(q_proj|k_proj|v_proj|gate_proj|up_proj)\.bias$", P("model")),
    (r".*\.(o_proj|down_proj)\.weight$", P(None, "model")),
    (r".*\.(o_proj|down_proj)\.bias$", P()),
    (r".*embed_tokens\.weight$", P("model", None)),
    (r".*lm_head\.weight$", P("model", None)),
    (r".*norm.*\.weight$", P()),
]


# Tensor-parallel rules for DiT-style diffusion transformers (SAM-Audio,
# CosyVoice3, EchoTTS): column-parallel attention in-projections and FFN
# up/gate, row-parallel out-projections. AdaLN modulation tables replicate.
DIT_TP_RULES = [
    (r".*\.(wq|wk|wv|to_q|to_k|to_v|w1|w3)\.weight$", P("model", None)),
    (r".*\.(wo|w2|to_out_0)\.weight$", P(None, "model")),
    (r".*scale_shift_table$", P()),
    (r".*norm.*\.weight$", P()),
]


def _spec_for(key: str, rules) -> P:
    for pat, spec in rules:
        if re.match(pat, key):
            return spec
    return P()


def shard_module(model, mesh: Mesh, rules=None):
    """device_put every array leaf with a NamedSharding chosen by path rules.

    Leaves with no matching rule (or whose dims don't divide the mesh axis)
    are replicated.
    """
    rules = rules or []
    leaves, treedef = jax.tree_util.tree_flatten_with_path(model)
    new_leaves = []
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    for path, leaf in leaves:
        if not hasattr(leaf, "shape"):
            new_leaves.append(leaf)
            continue
        key = path_str(path)
        spec = _spec_for(key, rules)
        # Validate divisibility; fall back to replication.
        ok = True
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = axis_sizes.get(axis, 1)
            if dim >= len(leaf.shape) or leaf.shape[dim] % size != 0:
                ok = False
                break
        if not ok:
            spec = P()
        new_leaves.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def replicate(model, mesh: Mesh):
    """Replicate all parameters across the mesh (serving default)."""
    return shard_module(model, mesh, rules=[])


def shard_sequence(x, mesh: Mesh, dim: int = 1, axis: str = "model"):
    """Shard a (long) sequence dimension over a mesh axis.

    Sequence parallelism for long-audio encoder forwards (SURVEY §5): put
    the time axis of the mel/audio input on the `model` axis and jit the
    unmodified encoder — XLA's SPMD partitioner inserts the halo exchanges
    for convolutions and the all-gathers/reduces for attention, following
    the input sharding (the scaling-book recipe: annotate, let XLA insert
    collectives). Falls back to replication if the dim doesn't divide.
    """
    size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1)
    if x.shape[dim] % size != 0:
        return jax.device_put(x, NamedSharding(mesh, P()))
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def data_parallel_call(fn, mesh: Mesh):
    """Wrap `fn(model, batch)` so the batch is sharded over the `data` axis
    and the model is replicated — per-chip request batching for serving."""

    def wrapped(model, batch):
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
            ),
            batch,
        )
        return fn(model, batch)

    return wrapped
