"""Continuous (slot-based) batching for Soprano sentence decode.

NEW relative to the reference (one request at a time; reference
server.py:74-94 serializes): Soprano's AR stage both samples tokens AND
collects per-step LM hidden states (the vocoder input — soprano.py
`_decode_with_hidden`), so it can't ride the token-only
`lm.ContinuousBatcher`. This batcher's fused tick returns the hidden
state of every accepted token alongside the token stream: a pool of B
cache slots advances in lock-step and each request resolves to its
(n+1, D) hidden matrix (prompt-last hidden + one per accepted token),
exactly what `Model.decoder` consumes. Sampling (temperature + top-p)
runs per-row in-graph with per-slot PRNG keys, so a request's stream
depends only on its own seed.
"""

from __future__ import annotations

from concurrent.futures import Future
from dataclasses import dataclass, field
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ....lm.continuous import (SlotKVCache, _B1Cache, _bucket, _install_slot,
                               _sample_rows_core)
from ....serving import FrameBatcherBase

__all__ = ["SopranoBatcher"]


@partial(jax.jit, donate_argnames=("caches",))
def _prefill_b1(lm, caches, ids, length):
    """Bucketed B=1 prompt prefill; returns (logits (V,), last-hidden (D,),
    caches)."""
    h, caches = lm.model(ids, caches)
    last = jnp.clip(length - 1, 0, ids.shape[1] - 1)
    logits = (lm.lm_head(h[:, last][:, None])
              if hasattr(lm, "lm_head")
              else lm.model.embed_tokens.as_linear(h[:, last][:, None]))
    return (logits[0, -1].astype(jnp.float32), h[0, last], caches)


@partial(jax.jit, donate_argnames=("caches",), static_argnames=("n",))
def _tick_n(lm, caches: List[SlotKVCache], logits, pos, keys, temps,
            top_ps, n: int):
    """`n` lock-step decode steps fused into ONE dispatch, returning each
    step's token AND hidden state. `logits` (B, V) carries each slot's
    next-token logits across ticks (the single-request loop samples from
    the previous step's logits)."""
    B = pos.shape[0]
    no_hist = jnp.full((B, 1), -1, jnp.int32)
    no_k = jnp.zeros((B,), jnp.int32)
    no_pen = jnp.ones((B,), jnp.float32)
    no_win = jnp.zeros((B,), jnp.int32)

    def body(carry, _):
        caches, logits, pos, keys = carry
        tok, keys = _sample_rows_core(
            logits, keys, no_hist, temps, top_ps, no_k, no_pen, no_win)
        caches = [c.replace(pos=pos) for c in caches]
        S = caches[0].max_len
        mask = jnp.where(
            jnp.arange(S)[None, :] <= pos[:, None], 0.0, -jnp.inf
        ).astype(jnp.float32)[:, None, None, :]
        h, caches = lm.model(tok[:, None], caches, positions=pos[:, None],
                             mask=mask)
        new_logits = (
            lm.lm_head(h) if hasattr(lm, "lm_head")
            else lm.model.embed_tokens.as_linear(h)
        )[:, -1].astype(jnp.float32)
        return (caches, new_logits, pos + 1, keys), (tok, h[:, -1])

    (caches, logits, _, keys), (toks, hiddens) = jax.lax.scan(
        body, (caches, logits, pos, keys), None, length=n)
    # (B, n), (B, n, D)
    return (jnp.swapaxes(toks, 0, 1), jnp.swapaxes(hiddens, 0, 1),
            logits, keys, caches)


@dataclass
class _SopranoRequest:
    prompt: np.ndarray  # (T,) int32 token ids
    max_tokens: int
    temp: float
    top_p: float
    stop_ids: tuple
    seed: int
    future: Future = field(default_factory=Future)
    hiddens: list = field(default_factory=list)  # (D,) rows, prompt-first
    n_tokens: int = 0
    on_frame: object = None  # streaming sink, one (D,) hidden row per call


class SopranoBatcher(FrameBatcherBase):
    """Slot-based continuous batching over Soprano's LM. `submit` takes
    the sentence's token ids and resolves to the (n+1, D) hidden matrix
    (float32); the vocoder decode stays on the caller's thread."""

    def __init__(self, model, slots: int = 4, max_len: int = 1024,
                 tick_frames: int = 16, **_ignored):
        self._owner = model
        self.lm = model.language_model
        cfg = self.lm.config
        self.max_len = max_len
        self._n_vocab = cfg.vocab_size
        self._hdim = cfg.hidden_size
        self._build_device_state(slots)
        self.pos = np.full(slots, max_len - 1, np.int32)
        self.keys = np.zeros((slots, 2), np.uint32)
        self.temps = np.zeros(slots, np.float32)
        self.top_ps = np.ones(slots, np.float32)
        super().__init__(slots=slots, tick_frames=tick_frames)

    def _build_device_state(self, slots):
        cfg = self.lm.config
        self.caches = [
            SlotKVCache(slots, cfg.num_key_value_heads, self.max_len,
                        cfg.head_dim, jnp.float32)
            for _ in range(cfg.num_hidden_layers)
        ]
        self.logits = jnp.zeros((slots, self._n_vocab), jnp.float32)

    def submit(self, prompt, *, max_tokens: int = 512,
               temperature: float = 0.3, top_p: float = 0.95,
               stop_ids=(), seed: int = 0, on_frame=None) -> Future:
        req = _SopranoRequest(
            prompt=np.asarray(prompt, np.int32).reshape(-1),
            max_tokens=int(max_tokens), temp=float(temperature),
            top_p=float(top_p),
            stop_ids=tuple(int(s) for s in stop_ids), seed=int(seed),
            on_frame=on_frame,
        )
        return self.submit_request(req)

    # -- FrameBatcherBase hooks ---------------------------------------

    def _admit(self, req: _SopranoRequest, slot: int) -> None:
        T = len(req.prompt)
        if T >= self.max_len:
            raise ValueError(f"prompt length {T} >= capacity {self.max_len}")
        cfg = self.lm.config
        P = min(_bucket(T), self.max_len)
        ids = np.zeros((1, P), np.int32)
        ids[0, :T] = req.prompt
        single = [
            _B1Cache(cfg.num_key_value_heads, P, cfg.head_dim, jnp.float32)
            for _ in range(cfg.num_hidden_layers)
        ]
        l0, h0, single = _prefill_b1(
            self.lm, single, jnp.asarray(ids), jnp.asarray(T))
        self.caches = _install_slot(
            self.caches, single, slot, jnp.asarray(T, jnp.int32))
        self.logits = self.logits.at[slot].set(l0)
        h0_np = np.asarray(jax.device_get(h0), np.float32)
        req.hiddens.append(h0_np)
        self._emit(req, h0_np)
        self.pos[slot] = T
        self.keys[slot] = np.asarray(jax.random.PRNGKey(req.seed), np.uint32)
        self.temps[slot] = req.temp
        self.top_ps[slot] = req.top_p

    def _tick(self, n: int) -> None:
        toks, hiddens, self.logits, keys, self.caches = _tick_n(
            self.lm, self.caches, self.logits, jnp.asarray(self.pos),
            jnp.asarray(self.keys), jnp.asarray(self.temps),
            jnp.asarray(self.top_ps), n=n,
        )
        toks_np = np.asarray(jax.device_get(toks))  # (slots, n)
        hid_np = np.asarray(jax.device_get(hiddens), np.float32)
        self.keys = np.array(jax.device_get(keys))
        self.steps += 1  # before _finish: future observers see the count
        for slot, req in enumerate(self.active):
            if req is None:
                continue
            for j in range(n):
                tok = int(toks_np[slot, j])
                if tok in req.stop_ids:
                    self._finish_slot(slot)
                    break
                req.hiddens.append(hid_np[slot, j])
                self._emit(req, hid_np[slot, j])
                req.n_tokens += 1
                self.pos[slot] += 1
                if (req.n_tokens >= req.max_tokens
                        or self.pos[slot] >= self.max_len - 1):
                    self._finish_slot(slot)
                    break

    def _finish_slot(self, slot: int) -> None:
        req = self.active[slot]
        self.pos[slot] = self.max_len - 1
        self.temps[slot] = 0.0
        self.top_ps[slot] = 1.0
        result = (np.stack(req.hiddens) if req and req.hiddens
                  else np.zeros((0, self._hdim), np.float32))
        self._finish(slot, result)

    def _fail_all(self, e: Exception) -> None:
        for slot, req in enumerate(self.active):
            if req is not None and not req.future.done():
                req.future.set_exception(e)
            self.active[slot] = None
            self.pos[slot] = self.max_len - 1
        self._build_device_state(self.slots)

    # -- pipeline integration -----------------------------------------

    def warmup(self):
        """Pre-compile the smallest prefill bucket, every slot's install
        program and the fused tick with a concurrent wave of tiny
        requests."""
        reqs = [
            _SopranoRequest(
                prompt=np.ones(8, np.int32),
                max_tokens=self.tick_frames + 1, temp=0.3, top_p=0.95,
                stop_ids=(), seed=0)
            for _ in range(self.slots)
        ]
        self.warmup_requests(reqs)

    def install(self):
        from ....serving import register_infer_hook

        register_infer_hook(self._owner, self)
        return self

    def close(self):
        from ....serving import unregister_infer_hook

        unregister_infer_hook(self._owner)
        super().close()
