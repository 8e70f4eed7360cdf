"""Sharded checkpoint save/restore for training (orbax-backed).

Completes the training story in parallel/train.py: periodically persist
the PipelinedLM params + optax state and resume bit-exactly, with every
leaf restored directly onto its mesh sharding (no host round-trip
gather). The reference framework has no training or checkpoint-resume
path (SURVEY §5); inference checkpoints continue to use the safetensors
loader in utils.py.

Module pytrees carry static config in their treedef, so trees are
persisted as flat {path: array} dicts (nn.flatten_params naming — the
same naming the safetensors loader uses) plus a small pytree of
non-module state (optimizer, step counter) saved as-is.
"""

from __future__ import annotations

from pathlib import Path
import jax
import numpy as np

from ..nn.module import flatten_params

__all__ = ["save_train_state", "restore_train_state"]


def _flatten_state(state) -> dict:
    """Arbitrary pytree (optax states, namedtuples, Modules) → flat
    {"idx.path": array} with a deterministic traversal order."""
    leaves, _ = jax.tree_util.tree_flatten_with_path(state)
    out = {}
    for path, leaf in leaves:
        if hasattr(leaf, "shape"):
            out[jax.tree_util.keystr(path)] = leaf
    return out


def save_train_state(path, params, opt_state=None, step: int = 0) -> None:
    """Persist params (+ optionally optimizer state) under `path`.

    Uses orbax's StandardCheckpointer on flat dicts — works for sharded
    arrays (each host writes its shards; single-host writes everything).
    """
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    ckpt = {"params": dict(flatten_params(params, include_buffers=True))}
    if opt_state is not None:
        ckpt["opt"] = _flatten_state(opt_state)
    ckpt["meta"] = {"step": np.asarray(step)}
    with ocp.StandardCheckpointer() as saver:
        saver.save(path, ckpt)


def restore_train_state(path, params, opt_state=None):
    """Restore into templates `params` / `opt_state` (their shardings and
    dtypes are preserved leaf-for-leaf). Returns (params, opt_state,
    step)."""
    import orbax.checkpoint as ocp

    from ..nn.module import load_weights

    path = Path(path).resolve()

    def as_abstract(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype,
                sharding=getattr(x, "sharding", None))
            if hasattr(x, "shape") else x, tree)

    template = {
        "params": dict(flatten_params(params, include_buffers=True)),
        "meta": {"step": np.asarray(0)},
    }
    if opt_state is not None:
        template["opt"] = _flatten_state(opt_state)
    with ocp.StandardCheckpointer() as saver:
        restored = saver.restore(path, as_abstract(template))

    from jax.sharding import NamedSharding

    def match_template(template_leaf, value):
        # orbax returns every leaf COMMITTED; a scalar restored onto one
        # device would then conflict with mesh-sharded arguments inside
        # jit. Leaves whose template wasn't mesh-sharded are handed back
        # as host arrays (uncommitted — jit places them freely).
        if isinstance(getattr(template_leaf, "sharding", None),
                      NamedSharding):
            return value
        return np.asarray(value)

    param_templates = dict(flatten_params(params, include_buffers=True))
    params_restored = {
        k: match_template(param_templates[k], v)
        for k, v in restored["params"].items()
    }
    params = load_weights(params, params_restored)
    new_opt = opt_state
    if opt_state is not None:
        flat = restored["opt"]
        leaves, treedef = jax.tree_util.tree_flatten_with_path(opt_state)
        new_leaves = [
            match_template(leaf, flat[jax.tree_util.keystr(p)])
            if hasattr(leaf, "shape") else leaf
            for p, leaf in leaves
        ]
        new_opt = jax.tree_util.tree_unflatten(treedef, new_leaves)
    step = int(np.asarray(restored["meta"]["step"]))
    return params, new_opt, step
