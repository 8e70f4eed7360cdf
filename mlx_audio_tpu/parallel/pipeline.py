"""Pipeline parallelism: GPipe schedule over a `stage` mesh axis.

The reference framework is single-device (SURVEY §2.8); this layer exists
so large LM-backed audio models (VibeVoice 9B, Qwen3-TTS talker, …) can
train/serve across chips when tensor parallelism alone runs out of HBM
or ICI bandwidth.

Design (scaling-book pipelining recipe, TPU-first):

- Layers are STACKED into one pytree with a leading layer axis and that
  axis is sharded over the mesh's `stage` axis — each device holds
  L/S contiguous layers.
- A `jax.shard_map` manual only over `stage` runs the GPipe schedule:
  microbatches stream through stages, activations move between
  neighbouring stages with `lax.ppermute` (one ICI hop per step), and
  each stage applies its local layers with `lax.scan`.
- All other mesh axes (`data`, `model`) stay AUTO: inputs sharded over
  `data` and stacked weights sharded over `model` are partitioned by
  GSPMD *inside* the per-stage computation, so PP composes with DP and
  TP in one jitted program.
- The whole schedule is differentiable (ppermute/psum/scan/where), so
  `jax.grad` through `pipeline_forward` yields the GPipe backward pass
  automatically.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["stack_layers", "pipeline_forward", "shard_stacked_layers"]


def stack_layers(layers: Sequence[Any]):
    """Stack identical layer pytrees into one pytree with leading axis L.

    The result reconstructs as the same Module class, so a single scan
    slice behaves exactly like one original layer.
    """
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def shard_stacked_layers(stacked, mesh: Mesh, rules=None,
                         stage_axis: str = "stage"):
    """Place stacked layers: layer axis over `stage`, remaining dims by
    TP rules shifted one dim right (rules written for unstacked layers).

    rules: [(regex, PartitionSpec)] as in mesh.LLAMA_TP_RULES; matched on
    the path WITHOUT the leading layer dim, then prefixed with the stage
    axis. Unmatched leaves are sharded over `stage` only.
    """
    import re

    from ..nn.module import path_str

    rules = rules or []
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    s = axis_sizes.get(stage_axis, 1)

    def place(path, leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        if leaf.shape[0] % s != 0:
            raise ValueError(
                f"layer count {leaf.shape[0]} not divisible by "
                f"{stage_axis}={s}")
        key = path_str(path)
        spec = [stage_axis]
        for pat, tp_spec in rules:
            if re.match(pat, key):
                spec += list(tp_spec)
                break
        # drop axes that don't divide
        for dim, ax in enumerate(spec):
            if ax is not None and (
                    dim >= leaf.ndim
                    or leaf.shape[dim] % axis_sizes.get(ax, 1) != 0):
                spec[dim] = None
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

    leaves, treedef = jax.tree_util.tree_flatten_with_path(stacked)
    return jax.tree_util.tree_unflatten(
        treedef, [place(p, l) for p, l in leaves])


def pipeline_forward(
    stacked_layers,
    h: jax.Array,
    layer_fn: Callable,
    mesh: Mesh,
    *args,
    microbatches: int | None = None,
    stage_axis: str = "stage",
):
    """Run `h` through stacked layers with a GPipe pipeline over `stage`.

    stacked_layers: pytree from :func:`stack_layers`, leading dim L
        sharded over `stage` (see :func:`shard_stacked_layers`).
    h: (B, ...) activations. B must divide into `microbatches`.
    layer_fn: (one_layer, h, *args) -> h.
    args: broadcast extras (rope tables, masks) — replicated w.r.t. stage.
    microbatches: defaults to the stage count (minimum that keeps every
        stage busy once the pipeline fills).

    Returns (B, ...) outputs, bit-matching the sequential layer loop.
    """
    S = dict(zip(mesh.axis_names, mesh.devices.shape)).get(stage_axis, 1)
    if S == 1:
        def body(carry, layer):
            return layer_fn(layer, carry, *args), None
        out, _ = jax.lax.scan(body, h, stacked_layers)
        return out
    M = microbatches or S
    B = h.shape[0]
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible by microbatches={M}")
    hmb = h.reshape(M, B // M, *h.shape[1:])
    perm = [(i, (i + 1) % S) for i in range(S)]

    # prefix spec: broadcasts over every leaf of the stacked-layer pytree
    layer_specs = P(stage_axis)

    def schedule(local_layers, hmb, *args):
        s = jax.lax.axis_index(stage_axis)

        def apply_stage(x):
            def body(carry, layer):
                return layer_fn(layer, carry, *args), None
            y, _ = jax.lax.scan(body, x, local_layers)
            return y

        state = jnp.zeros_like(hmb[0])
        outs = []
        for t in range(M + S - 1):
            inject = hmb[t] if t < M else hmb[M - 1]
            x = jnp.where(s == 0, inject, state)
            y = apply_stage(x)
            if t >= S - 1:
                outs.append(y)  # microbatch t-(S-1), valid on last stage
            if t < M + S - 2:
                state = jax.lax.ppermute(y, stage_axis, perm)
        out = jnp.stack(outs)  # (M, mb, ...)
        # replicate the last stage's result to every stage
        out = jnp.where(s == S - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, stage_axis)

    out = jax.shard_map(
        schedule,
        mesh=mesh,
        in_specs=(layer_specs, P()) + tuple(P() for _ in args),
        out_specs=P(),
        axis_names={stage_axis},
    )(stacked_layers, hmb, *args)
    return out.reshape(B, *h.shape[1:])
