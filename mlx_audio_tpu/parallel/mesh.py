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
# Quantized checkpoints store each projection as a (packed `weight`,
# `scales`, `biases`) triple — all three carry the out dim on axis 0 and
# the (packed / grouped) in dim on axis 1, so they shard with the SAME
# spec as the float weight; `shard_module` additionally enforces that a
# triple shards all-or-nothing (group/pack alignment, see below).
LLAMA_TP_RULES = [
    (r".*\.(q_proj|k_proj|v_proj|gate_proj|up_proj)\.(weight|scales|biases)$",
     P("model", None)),
    (r".*\.(q_proj|k_proj|v_proj|gate_proj|up_proj)\.bias$", P("model")),
    (r".*\.(o_proj|down_proj)\.(weight|scales|biases)$", P(None, "model")),
    (r".*\.(o_proj|down_proj)\.bias$", P()),
    (r".*embed_tokens\.(weight|scales|biases)$", P("model", None)),
    (r".*lm_head\.(weight|scales|biases)$", P("model", None)),
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


def _divisible(leaf, spec: P, axis_sizes: dict) -> bool:
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        size = axis_sizes.get(axis, 1)
        if dim >= len(leaf.shape) or leaf.shape[dim] % size != 0:
            return False
    return True


def _walk_modules(obj, prefix: str = ""):
    """Yield (dotted-path, module) pairs, matching `path_str` naming."""
    from ..nn.module import Module as _Mod

    if isinstance(obj, _Mod):
        yield prefix, obj
        for name, val in vars(obj).items():
            sub = f"{prefix}.{name}" if prefix else name
            yield from _walk_modules(val, sub)
    elif isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            yield from _walk_modules(v, f"{prefix}.{i}" if prefix else str(i))
    elif isinstance(obj, dict):
        for k, v in obj.items():
            yield from _walk_modules(v, f"{prefix}.{k}" if prefix else str(k))


def shard_module(model, mesh: Mesh, rules=None):
    """device_put every array leaf with a NamedSharding chosen by path rules.

    Leaves with no matching rule (or whose dims don't divide the mesh axis)
    are replicated.

    Quantized layers (packed `weight` + `scales` + `biases` triples,
    nn.quantized.QuantizedLinear layout) get two extra guarantees:
    - a triple shards ALL-OR-NOTHING: if any member fails divisibility
      (e.g. a row-parallel split that doesn't land on a quant-group
      boundary — scales has in/group_size columns), the whole triple
      replicates, so the affine dequant never mixes shard layouts;
    - TP-sharded QuantizedLinear modules are flagged (`tp_sharded`) so
      their Pallas fused-dequant routing steps aside — pallas_call is not
      SPMD-partitionable without shard_map, and XLA's dequant+matmul
      partitions cleanly.
    """
    rules = rules or []
    leaves, treedef = jax.tree_util.tree_flatten_with_path(model)
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    infos = []  # (key|None, leaf, spec, ok) per leaf, in tree order
    families: dict = {}  # parent path -> {member name: info index}
    for path, leaf in leaves:
        if not hasattr(leaf, "shape"):
            infos.append((None, leaf, None, True))
            continue
        key = path_str(path)
        spec = _spec_for(key, rules)
        ok = _divisible(leaf, spec, axis_sizes)
        infos.append((key, leaf, spec, ok))
        base, _, name = key.rpartition(".")
        if name in ("weight", "scales", "biases"):
            families.setdefault(base, {})[name] = len(infos) - 1

    # all-or-nothing for quantized triples (a family with `scales` is one)
    bad_parents = set()
    for base, members in families.items():
        if "scales" not in members:
            continue
        for i in members.values():
            _, _, spec, ok = infos[i]
            if spec != P() and not ok:
                bad_parents.add(base)
                break

    new_leaves = []
    sharded_quant_parents = set()
    for key, leaf, spec, ok in infos:
        if key is None:
            new_leaves.append(leaf)
            continue
        base = key.rpartition(".")[0]
        if not ok or base in bad_parents:
            spec = P()
        if (spec != P() and base in families
                and "scales" in families[base]):
            sharded_quant_parents.add(base)
        new_leaves.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    new_model = jax.tree_util.tree_unflatten(treedef, new_leaves)

    if sharded_quant_parents:
        for mpath, mod in _walk_modules(new_model):
            if mpath in sharded_quant_parents and hasattr(mod, "bits"):
                mod.tp_sharded = True
    return new_model


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
