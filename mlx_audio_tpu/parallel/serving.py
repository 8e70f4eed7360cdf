"""Data-parallel replicated serving: one model replica + batcher per chip.

NEW relative to the reference (single process, single device, one request
at a time — reference server.py:74-94): a pod slice serves N independent
replicas — each chip holds a full copy of the weights and runs its own
continuous batcher; requests round-robin across replicas on the host.
This is the serving complement to the TP path (`parallel/mesh.py`
`shard_module` + `MLX_AUDIO_TPU_TP`): TP shards one big model across
chips; DP replicas multiply throughput for models that fit on one chip.

Per-replica placement uses `jax.device_put` of the whole weight pytree
onto the replica's device — jit dispatch follows committed operands, so
each replica's fused batcher ticks execute on its own chip and replicas
run concurrently (no collectives on this path; scale-out is embarrassing
parallelism over requests).

Enable under the server with `MLX_AUDIO_TPU_DP=N` (see
`utils.maybe_replicate_for_serving`); each replica gets its own batcher
via the model's `make_batcher`.
"""

from __future__ import annotations

import itertools
import threading
from typing import Any, Callable, List, Optional, Sequence

import jax

__all__ = ["DPReplicaPool"]


class DPReplicaPool:
    """Round-robin request pool over per-device model replicas.

    `model` is the host copy (its weights are device_put to every target
    device); `make_batcher(replica)` builds the per-replica scheduler
    (any of the serving batchers: ContinuousBatcher adapters, frame
    batchers, StackBatcher...). The pool exposes the union of the
    batchers' submit surface by delegating attribute access per call.
    """

    def __init__(self, model, make_batcher: Callable[[Any], Any],
                 devices: Optional[Sequence] = None):
        devices = list(devices if devices is not None else jax.devices())
        if not devices:
            raise ValueError("no devices for DPReplicaPool")
        self.devices = devices
        self.model = model  # host copy; infer-hook registration target
        self.replicas: List[Any] = []
        self.batchers: List[Any] = []
        self.request_counts = [0] * len(devices)
        self._rr = itertools.count()
        self._lock = threading.Lock()
        runtime = getattr(type(model), "_RUNTIME", None)
        self._runtime_aliases = []  # (dict, key) pairs removed at close()
        for d in devices:
            replica = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, d) if hasattr(x, "dtype") else x,
                model)
            # models keep host-side runtime objects (tokenizers, codecs)
            # in a class-level dict keyed by id(model) — alias the host
            # model's entry so replica-side prep finds them
            if isinstance(runtime, dict) and id(model) in runtime:
                runtime[id(replica)] = runtime[id(model)]
                self._runtime_aliases.append((runtime, id(replica)))
            self.replicas.append(replica)
            self.batchers.append(make_batcher(replica))

    # ------------------------------------------------------------------

    def _next(self) -> int:
        with self._lock:
            i = next(self._rr) % len(self.batchers)
            self.request_counts[i] += 1
            return i

    def submit(self, *args, **kwargs):
        """Round-robin a request to the next replica's batcher."""
        return self.batchers[self._next()].submit(*args, **kwargs)

    def submit_embeds(self, *args, **kwargs):
        return self.batchers[self._next()].submit_embeds(*args, **kwargs)

    def __call__(self, *args, **kwargs):
        """Blocking round-robin call (StackBatcher-style batchers)."""
        return self.batchers[self._next()](*args, **kwargs)

    def warmup(self, *args, **kwargs):
        """Warm every replica's batcher (args pass through — e.g. the
        Whisper batcher's per-options warmup signature)."""
        for b in self.batchers:
            if hasattr(b, "warmup"):
                b.warmup(*args, **kwargs)

    def __getattr__(self, name):
        """Delegate unknown attribute reads to the first replica's
        batcher — model hook paths consult batcher config attributes
        (e.g. Dia's `hook.top_k`, VoxCPM's `hook.n_timesteps` /
        `hook.cfg_value`) before submitting, and every replica's batcher
        was built identically."""
        batchers = self.__dict__.get("batchers")
        if name.startswith("_") or not batchers:
            raise AttributeError(name)
        return getattr(batchers[0], name)

    def install(self):
        from ..serving import register_infer_hook

        register_infer_hook(self.model, self)
        return self

    def close(self):
        from ..serving import unregister_infer_hook

        unregister_infer_hook(self.model)
        for b in self.batchers:
            b.close()
        for d, k in self._runtime_aliases:
            d.pop(k, None)
        self._runtime_aliases = []

    @property
    def dispatch_count(self) -> int:
        return sum(getattr(b, "dispatch_count", 0) for b in self.batchers)
