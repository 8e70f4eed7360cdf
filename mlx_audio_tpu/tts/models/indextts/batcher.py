"""Continuous (slot-based) batching for IndexTTS's latent-collecting GPT.

NEW relative to the reference (one request at a time; reference
indextts.py:353-424 is a per-request loop): a pool of B slot caches
advances in lock-step, one fused dispatch per `tick_frames` steps. Each
step mirrors `_indextts_decode`: record the final-norm latent, sample the
next mel code (per-row temperature/top-k via
`lm.continuous._sample_rows_core`), feed mel embedding + PER-ROW-STEP
mel positional embedding. The GPT's wpe is the zeroed 1-row table, so
per-row absolute cache positions are free.

The reference keeps the latent of the EOS step (`n + 1`), so the host
loop appends each step's latent BEFORE checking the sampled token for
stop — a finished request's latents include the EOS-step row.
"""

from __future__ import annotations

from concurrent.futures import Future
from dataclasses import dataclass, field
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ....lm.cache import KVCache
from ....lm.continuous import (SlotKVCache, _bucket, _install_slot,
                               _sample_rows_core)
from ....serving import FrameBatcherBase

__all__ = ["IndexTTSBatcher"]


@partial(jax.jit, donate_argnames=("caches",))
def _prefill_b1(model, caches, embedding, length):
    Tp = embedding.shape[1]
    S = caches[0].max_len
    q = jnp.arange(Tp)[:, None]
    k = jnp.arange(S)[None, :]
    ok = (k <= q) & (k < length)
    mask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
    h, caches = model.gpt(embedding, caches, positions=jnp.arange(Tp),
                          mask=mask)
    last = jnp.clip(length - 1, 0, Tp - 1)
    return h[0, last], caches


@partial(jax.jit, donate_argnames=("buf",), static_argnames=("slot",))
def _set_row(buf, slot: int, row):
    return buf.at[slot].set(row.astype(buf.dtype))


@partial(jax.jit, donate_argnames=("caches",), static_argnames=("n",))
def _tick_n(model, caches: List[SlotKVCache], h_last, pos, step, keys,
            temps, top_ks, n: int):
    """`n` lock-step latent+sample steps fused into ONE dispatch.

    Returns (tokens (B, n), latents (B, n, D), caches, h_last, pos,
    step, keys)."""
    B = pos.shape[0]
    no_pen = jnp.ones((B,), jnp.float32)
    no_win = jnp.zeros((B,), jnp.int32)
    ones = jnp.ones((B,), jnp.float32)
    dummy_hist = jnp.full((B, 1), -1, jnp.int32)

    def body(carry, _):
        caches, h_last, pos, step, keys = carry
        h_norm = model.final_norm(h_last)  # (B, D)
        logits = model.mel_head(h_norm).astype(jnp.float32)
        tok, keys = _sample_rows_core(
            logits, keys, dummy_hist, temps, ones, top_ks, no_pen, no_win)
        emb = (model.mel_embedding.weight[tok]
               + model.mel_pos_embedding.weight[step])[:, None]  # (B,1,D)
        caches = [c.replace(pos=pos) for c in caches]
        S = caches[0].max_len
        amask = jnp.where(
            jnp.arange(S)[None, :] <= pos[:, None], 0.0, -jnp.inf
        )[:, None, None, :]
        h, caches = model.gpt(emb.astype(h_last.dtype), caches,
                              positions=pos[:, None], mask=amask)
        return (caches, h[:, -1], pos + 1, step + 1, keys), (tok, h_norm)

    carry = (caches, h_last, pos, step, keys)
    (caches, h_last, pos, step, keys), (toks, lats) = jax.lax.scan(
        body, carry, None, length=n)
    return (jnp.swapaxes(toks, 0, 1), jnp.swapaxes(lats, 0, 1),
            caches, h_last, pos, step, keys)


@dataclass
class _IdxRequest:
    embedding: np.ndarray  # (1, T0, D) [cond|text] prefill
    max_tokens: int
    temp: float
    top_k: int
    seed: int
    future: Future = field(default_factory=Future)
    latents: list = field(default_factory=list)  # (D,) rows incl. EOS step
    on_frame: object = None  # streaming sink, one (D,) latent per call


class IndexTTSBatcher(FrameBatcherBase):
    """Slot-based continuous batching over an IndexTTS model. `submit`
    takes the prepared (1, T0, D) prefill embedding (host prep —
    conditioning encoder, tokenizer — on the caller's thread) and
    resolves to the collected GPT latents (n, D) float32; BigVGAN
    vocoding stays on the caller's thread."""

    def __init__(self, model, slots: int = 4, max_len: int = 2048,
                 tick_frames: int = 16, **_ignored):
        self._owner = model
        self.model = model
        g = model.args.gpt
        self.max_len = max_len
        self.stop = int(g.stop_mel_token)
        self._hdim = g.model_dim
        self._build_device_state(slots)
        self.pos = np.full(slots, max_len - 1, np.int32)  # scratch index
        self.step = np.zeros(slots, np.int32)
        self.keys = np.zeros((slots, 2), np.uint32)
        self.temps = np.zeros(slots, np.float32)
        self.top_ks = np.zeros(slots, np.int32)
        super().__init__(slots=slots, tick_frames=tick_frames)

    def _build_device_state(self, slots):
        g = self.model.args.gpt
        self.caches = [
            SlotKVCache(slots, g.heads, self.max_len,
                        g.model_dim // g.heads, jnp.float32)
            for _ in range(g.layers)
        ]
        self.h_last = jnp.zeros((slots, g.model_dim), jnp.float32)

    def submit(self, embedding, *, max_tokens: int = 5000,
               temperature: float = 0.8, top_k: int = 30, seed: int = 0,
               on_frame=None) -> Future:
        emb = np.asarray(embedding)
        if emb.ndim == 2:
            emb = emb[None]
        g = self.model.args.gpt
        req = _IdxRequest(
            embedding=emb,
            max_tokens=min(int(max_tokens), g.max_mel_tokens),
            temp=float(temperature), top_k=int(top_k), seed=int(seed),
            on_frame=on_frame,
        )
        return self.submit_request(req)

    # -- FrameBatcherBase hooks ---------------------------------------

    def _admit(self, req: _IdxRequest, slot: int) -> None:
        T = req.embedding.shape[1]
        if T >= self.max_len:
            raise ValueError(f"prompt length {T} >= capacity {self.max_len}")
        g = self.model.args.gpt
        P = min(_bucket(T), self.max_len)
        inp = np.zeros((1, P, req.embedding.shape[-1]), np.float32)
        inp[:, :T] = np.asarray(req.embedding, np.float32)
        single = [
            KVCache(1, g.heads, P, g.model_dim // g.heads,
                    dtype=jnp.float32)
            for _ in range(g.layers)
        ]
        h0, single = _prefill_b1(
            self.model, single, jnp.asarray(inp), jnp.asarray(T))
        self.caches = _install_slot(
            self.caches, single, slot, jnp.asarray(T, jnp.int32))
        self.h_last = _set_row(self.h_last, slot, h0)
        self.pos[slot] = T
        self.step[slot] = 0
        self.keys[slot] = np.asarray(jax.random.PRNGKey(req.seed), np.uint32)
        self.temps[slot] = req.temp
        self.top_ks[slot] = req.top_k

    def _tick(self, n: int) -> None:
        toks, lats, self.caches, self.h_last, _pos, _step, keys = _tick_n(
            self.model, self.caches, self.h_last, jnp.asarray(self.pos),
            jnp.asarray(self.step), jnp.asarray(self.keys),
            jnp.asarray(self.temps), jnp.asarray(self.top_ks), n=n,
        )
        toks_np = np.asarray(jax.device_get(toks))  # (slots, n)
        lats_np = np.asarray(jax.device_get(lats), np.float32)
        self.keys = np.array(jax.device_get(keys))
        self.steps += 1  # before _finish: future observers see the count
        for slot, req in enumerate(self.active):
            if req is None:
                continue
            for j in range(n):
                tok = int(toks_np[slot, j])
                # the EOS step's latent IS kept (reference n + 1)
                req.latents.append(lats_np[slot, j])
                self._emit(req, lats_np[slot, j])
                self.pos[slot] += 1
                self.step[slot] += 1
                if (tok == self.stop
                        or len(req.latents) >= req.max_tokens
                        or self.pos[slot] >= self.max_len - 1):
                    self._finish_slot(slot)
                    break

    def _finish_slot(self, slot: int) -> None:
        req = self.active[slot]
        self.pos[slot] = self.max_len - 1
        self.temps[slot] = 0.0
        self.top_ks[slot] = 0
        result = (np.stack(req.latents) if req and req.latents
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

    def install(self):
        from ....serving import register_infer_hook

        register_infer_hook(self._owner, self)
        return self

    def close(self):
        from ....serving import unregister_infer_hook

        unregister_infer_hook(self._owner)
        super().close()
