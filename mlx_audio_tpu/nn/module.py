"""Pytree-based module system for the TPU audio stack.

Modules are registered JAX pytrees: array-valued attributes (and containers
of arrays / sub-modules) are pytree children; everything else is static
treedef aux data. This gives MLX/PyTorch-style ergonomics — attribute access,
dotted parameter paths that match safetensors keys — while remaining pure
pytrees that pass through `jax.jit` / `shard_map` unchanged. The design is
equinox-style, built fresh for this framework (the reference stack uses
`mlx.nn.Module`, a stateful lazy-graph module system; see
/root/reference/mlx_audio/utils.py:316 for how it loads weights — we keep the
same dotted-key contract so `sanitize()` maps stay simple).

Conventions:
- Attributes whose name starts with ``_`` that hold arrays are *buffers*:
  still pytree children (so jit sees them), but excluded from
  ``parameters()`` and from checkpoint load/save.
- ``Module.filter_jit`` is unnecessary: plain ``jax.jit`` works because the
  static attrs ride in the treedef.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import (
    DictKey,
    FlattenedIndexKey,
    GetAttrKey,
    SequenceKey,
    register_pytree_with_keys,
)

__all__ = ["Module", "flatten_params", "load_weights", "path_str", "cast_floats"]


def _is_dynamic(v: Any) -> bool:
    """True if v contains arrays or Modules anywhere (→ pytree child)."""
    if isinstance(v, (jax.Array, np.ndarray, Module)):
        return True
    if isinstance(v, (list, tuple)):
        return any(_is_dynamic(x) for x in v)
    if isinstance(v, dict):
        return any(_is_dynamic(x) for x in v.values())
    return False


class _Static:
    """Hashable wrapper for static aux values (configs, flags, callables)."""

    __slots__ = ("value",)

    def __init__(self, value: Any):
        self.value = value

    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, _Static):
            return NotImplemented
        try:
            return bool(self.value == other.value)
        except Exception:
            return self.value is other.value

    def __hash__(self) -> int:
        try:
            return hash(self.value)
        except TypeError:
            return hash(repr(self.value))

    def __repr__(self) -> str:
        return f"_Static({self.value!r})"


class Module:
    """Base class: subclasses are automatically registered as pytrees."""

    def __init_subclass__(cls, **kwargs: Any) -> None:
        super().__init_subclass__(**kwargs)

        def flatten_with_keys(obj: "Module"):
            d = obj.__dict__
            dyn_names = []
            children = []
            static_items = []
            for k in sorted(d):
                v = d[k]
                if _is_dynamic(v):
                    dyn_names.append(k)
                    children.append((GetAttrKey(k), v))
                else:
                    static_items.append((k, _Static(v)))
            aux = (tuple(dyn_names), tuple(static_items))
            return children, aux

        def flatten(obj: "Module"):
            children, aux = flatten_with_keys(obj)
            return [c for _, c in children], aux

        def unflatten(aux, children):
            obj = object.__new__(cls)
            dyn_names, static_items = aux
            for k, v in zip(dyn_names, children):
                object.__setattr__(obj, k, v)
            for k, s in static_items:
                object.__setattr__(obj, k, s.value)
            return obj

        register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)

    # ---- inference-mode API parity (models call .eval() after load) ----
    def eval(self) -> "Module":
        return self

    def train(self, mode: bool = True) -> "Module":
        return self

    # ---- parameter access ----
    def parameters(self) -> dict[str, jax.Array]:
        return flatten_params(self)

    def replace(self, **updates: Any) -> "Module":
        """Functional attribute update: returns a shallow copy with changes."""
        obj = object.__new__(type(self))
        obj.__dict__.update(self.__dict__)
        obj.__dict__.update(updates)
        return obj

    def apply_to_arrays(self, fn: Callable[[jax.Array], jax.Array]) -> "Module":
        """Map fn over every array leaf (e.g. dtype cast, device_put)."""
        return jax.tree_util.tree_map(
            lambda x: fn(x) if isinstance(x, (jax.Array, np.ndarray)) else x, self
        )

    def __repr__(self) -> str:
        n = sum(
            int(np.prod(v.shape))
            for v in jax.tree_util.tree_leaves(self)
            if hasattr(v, "shape")
        )
        return f"{type(self).__name__}(params={n:,})"


def path_str(path: tuple) -> str:
    """Render a jax key path as a dotted safetensors-style key."""
    parts = []
    for p in path:
        if isinstance(p, GetAttrKey):
            parts.append(p.name)
        elif isinstance(p, SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, DictKey):
            parts.append(str(p.key))
        elif isinstance(p, FlattenedIndexKey):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return ".".join(parts)


def _is_buffer_path(key: str) -> bool:
    return any(seg.startswith("_") for seg in key.split("."))


def flatten_params(tree: Any, include_buffers: bool = False) -> dict[str, jax.Array]:
    """Dotted-path → array dict for every array leaf in the tree."""
    out: dict[str, jax.Array] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if leaf is None:
            continue
        key = path_str(path)
        if not include_buffers and _is_buffer_path(key):
            continue
        out[key] = leaf
    return out


def load_weights(
    model: Module,
    weights: dict[str, Any],
    strict: bool = True,
) -> Module:
    """Return a copy of `model` with array leaves replaced from `weights`.

    Mirrors the contract of the reference loader (which assigns checkpoint
    tensors into the module tree by dotted key): every checkpoint key must
    match a model parameter (shape-checked); with strict=True, every
    non-buffer model parameter must be present in the checkpoint.
    """
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(model)
    keys = [path_str(p) for p, _ in leaves_with_paths]
    leaves = [l for _, l in leaves_with_paths]
    key_to_idx = {k: i for i, k in enumerate(keys)}

    unknown = [k for k in weights if k not in key_to_idx]
    if unknown:
        raise ValueError(
            f"Checkpoint keys not found in model ({len(unknown)}): "
            f"{unknown[:10]}{'...' if len(unknown) > 10 else ''}"
        )

    new_leaves = list(leaves)
    for k, w in weights.items():
        i = key_to_idx[k]
        cur = leaves[i]
        w_shape = tuple(w.shape) if hasattr(w, "shape") else ()
        if hasattr(cur, "shape") and tuple(cur.shape) != w_shape:
            raise ValueError(
                f"Shape mismatch for {k}: model {tuple(cur.shape)} vs checkpoint {w_shape}"
            )
        new_leaves[i] = w if isinstance(w, jax.Array) else np.asarray(w)

    if strict:
        missing = [
            k
            for k in keys
            if k not in weights and not _is_buffer_path(k)
        ]
        if missing:
            raise ValueError(
                f"Model parameters missing from checkpoint ({len(missing)}): "
                f"{missing[:10]}{'...' if len(missing) > 10 else ''}"
            )

    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def cast_floats(tree, dtype=jnp.bfloat16):
    """Cast every floating-point array leaf of a module pytree to `dtype`.

    Integer/bool leaves (token tables, packed quantized weights, masks) are
    left untouched. Use for bf16 inference of large models — halves HBM for
    weights and keeps matmuls on the MXU's native bf16 path.
    """
    def cast(x):
        if isinstance(x, (jax.Array, np.ndarray)) and \
                jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def build_on_host(ctor, dtype=jnp.bfloat16, device=None):
    """Construct a module on the host CPU backend, cast floats to `dtype`
    there, then transfer the finished tree to `device` in one pass.

    Random init runs eagerly on whatever backend is default; for a
    multi-billion-parameter model on an accelerator that means (a) an f32
    copy of every weight exists on device before `cast_floats` halves it
    — double the steady-state HBM peak — and (b) thousands of tiny
    device allocations/dispatches (costly through remote/tunnel
    backends). Building on the CPU backend keeps the f32 peak in host
    RAM and ships only the final `dtype` leaves.

    ctor: zero-arg callable returning the module (e.g. lambda:
        SAMAudio(cfg)).
    device: target jax.Device; default = the default backend's first
        device.
    """
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        tree = cast_floats(ctor(), dtype)
    device = device or jax.local_devices()[0]
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, device)
        if isinstance(x, (jax.Array, np.ndarray)) else x, tree)
