"""Continuous (slot-based) batching for Chatterbox Turbo's GPT-2 T3.

NEW relative to the reference (one request at a time; reference
chatterbox_turbo.py:775-1011 is a per-request loop): a pool of B slot
caches advances in lock-step, one fused dispatch per `tick_frames` tokens.
Unlike the original Chatterbox's CFG-paired `T3Batcher`
(../chatterbox/batcher.py), Turbo drops CFG (reference "CFG … not
supported by the Turbo version"), so each request is ONE cache row — the
batcher is a plain single-row slot pool over the GPT-2 backbone
(`lm/gpt2.py`), with per-row in-graph sampling via
`lm.continuous._sample_rows_core` (temperature / top-k / top-p /
repetition penalty over a 128-token window, matching
`_turbo_decode_loop`'s sampler semantics).
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

__all__ = ["TurboBatcher"]

REP_HIST = 128  # matches _turbo_decode_loop's fixed (1, 128) window


@partial(jax.jit, donate_argnames=("caches",))
def _prefill_b1(t3, caches, embeds, length):
    """Bucketed B=1 prompt prefill; returns (h_last (D,), caches).
    Padded positions get junk wpe rows, but the causal+length mask hides
    them and the first decode write overwrites index `length`."""
    Tp = embeds.shape[1]
    S = caches[0].max_len
    q = jnp.arange(Tp)[:, None]
    k = jnp.arange(S)[None, :]
    ok = (k <= q) & (k < length)
    mask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
    hidden, caches = t3.tfmr(embeds, caches, positions=jnp.arange(Tp),
                             mask=mask)
    last = jnp.clip(length - 1, 0, Tp - 1)
    return hidden[0, last], caches


@partial(jax.jit, donate_argnames=("buf",), static_argnames=("slot",))
def _set_row(buf, slot: int, row):
    return buf.at[slot].set(row.astype(buf.dtype))


@partial(jax.jit, donate_argnames=("caches",), static_argnames=("n",))
def _tick_n(t3, caches: List[SlotKVCache], h_last, pos, keys, hist,
            temps, top_ps, top_ks, rep_pens, n: int):
    """`n` lock-step decode steps fused into ONE dispatch.

    Returns (tokens (B, n), caches, h_last, keys, hist). A row that
    sampled EOS keeps producing garbage for the rest of the tick; the
    host truncates at the first EOS."""
    B = pos.shape[0]
    full_win = jnp.full((B,), REP_HIST, jnp.int32)

    def body(carry, _):
        caches, h_last, pos, keys, hist = carry
        logits = t3.speech_head(h_last).astype(jnp.float32)
        tok, keys = _sample_rows_core(
            logits, keys, hist, temps, top_ps, top_ks, rep_pens, full_win)
        hist = jnp.concatenate([hist[:, 1:], tok[:, None]], axis=1)
        emb = t3.speech_emb.weight[tok][:, None]  # (B, 1, D)
        caches = [c.replace(pos=pos) for c in caches]
        S = caches[0].max_len
        amask = jnp.where(
            jnp.arange(S)[None, :] <= pos[:, None], 0.0, -jnp.inf
        )[:, None, None, :]
        hidden, caches = t3.tfmr(emb.astype(h_last.dtype), caches,
                                 positions=pos[:, None], mask=amask)
        return (caches, hidden[:, -1], pos + 1, keys, hist), tok

    carry = (caches, h_last, pos, keys, hist)
    (caches, h_last, pos, keys, hist), toks = jax.lax.scan(
        body, carry, None, length=n)
    return jnp.swapaxes(toks, 0, 1), caches, h_last, keys, hist


@dataclass
class _TurboRequest:
    embeds: np.ndarray  # (1, T0, D) [cond|text|bos] prefill
    max_tokens: int
    temp: float
    top_k: int
    top_p: float
    rep_penalty: float
    seed: int
    future: Future = field(default_factory=Future)
    tokens: list = field(default_factory=list)
    on_frame: object = None  # streaming sink, one speech token per call


class TurboBatcher(FrameBatcherBase):
    """Slot-based continuous batching over Chatterbox Turbo's T3. `submit`
    takes the prepared (1, T0, D) prefill embeddings (host prep — voice
    conditionals, text tokenization — on the caller's thread) and resolves
    to the generated speech tokens (T,) np.int32 (EOS excluded); meanflow
    S3Gen vocoding stays on the caller's thread."""

    def __init__(self, model, slots: int = 4, max_len: int = 2048,
                 tick_frames: int = 16, **_ignored):
        self._owner = model
        self.t3 = model.t3
        cfg = self.t3.cfg
        self.max_len = max_len
        self._build_device_state(slots)
        self.pos = np.full(slots, max_len - 1, np.int32)  # scratch index
        self.keys = np.zeros((slots, 2), np.uint32)
        self.hist = np.full((slots, REP_HIST), -1, np.int32)
        self.temps = np.zeros(slots, np.float32)
        self.top_ps = np.ones(slots, np.float32)
        self.top_ks = np.zeros(slots, np.int32)
        self.rep_pens = np.ones(slots, np.float32)
        super().__init__(slots=slots, tick_frames=tick_frames)

    def _build_device_state(self, slots):
        cfg = self.t3.cfg
        hd = cfg.n_embd // cfg.n_head
        self.caches = [
            SlotKVCache(slots, cfg.n_head, self.max_len, hd, jnp.float32)
            for _ in range(cfg.n_layer)
        ]
        self.h_last = jnp.zeros((slots, cfg.n_embd), jnp.float32)

    def submit(self, embeds, *, max_tokens: int = 800,
               temperature: float = 0.8, top_k: int = 1000,
               top_p: float = 0.95, repetition_penalty: float = 1.2,
               seed: int = 0, on_frame=None) -> Future:
        emb = np.asarray(embeds)
        if emb.ndim == 2:
            emb = emb[None]
        req = _TurboRequest(
            embeds=emb,
            max_tokens=min(int(max_tokens), self.t3.hp.max_speech_tokens),
            temp=float(temperature), top_k=int(top_k), top_p=float(top_p),
            rep_penalty=float(repetition_penalty), seed=int(seed),
            on_frame=on_frame,
        )
        return self.submit_request(req)

    # -- FrameBatcherBase hooks ---------------------------------------

    def _admit(self, req: _TurboRequest, slot: int) -> None:
        T = req.embeds.shape[1]
        if T >= self.max_len:
            raise ValueError(f"prompt length {T} >= capacity {self.max_len}")
        cfg = self.t3.cfg
        hd = cfg.n_embd // cfg.n_head
        P = min(_bucket(T), self.max_len)
        inp = np.zeros((1, P, req.embeds.shape[-1]), np.float32)
        inp[:, :T] = np.asarray(req.embeds, np.float32)
        single = [
            KVCache(1, cfg.n_head, P, hd, dtype=jnp.float32)
            for _ in range(cfg.n_layer)
        ]
        h0, single = _prefill_b1(
            self.t3, single, jnp.asarray(inp), jnp.asarray(T))
        self.caches = _install_slot(
            self.caches, single, slot, jnp.asarray(T, jnp.int32))
        self.h_last = _set_row(self.h_last, slot, h0)
        self.pos[slot] = T
        self.keys[slot] = np.asarray(jax.random.PRNGKey(req.seed), np.uint32)
        self.hist[slot] = -1
        self.temps[slot] = req.temp
        self.top_ps[slot] = req.top_p
        self.top_ks[slot] = req.top_k
        self.rep_pens[slot] = req.rep_penalty

    def _tick(self, n: int) -> None:
        toks, self.caches, self.h_last, keys, hist = _tick_n(
            self.t3, self.caches, self.h_last, jnp.asarray(self.pos),
            jnp.asarray(self.keys), jnp.asarray(self.hist),
            jnp.asarray(self.temps), jnp.asarray(self.top_ps),
            jnp.asarray(self.top_ks), jnp.asarray(self.rep_pens), n=n,
        )
        toks_np = np.asarray(jax.device_get(toks))  # (slots, n)
        self.keys = np.array(jax.device_get(keys))
        self.hist = np.array(jax.device_get(hist))
        self.steps += 1  # before _finish: future observers see the count
        stop = self.t3.hp.stop_speech_token
        for slot, req in enumerate(self.active):
            if req is None:
                continue
            for j in range(n):
                tok = int(toks_np[slot, j])
                if tok == stop:  # EOS excluded from the result
                    self._finish_slot(slot)
                    break
                req.tokens.append(tok)
                self._emit(req, tok)
                self.pos[slot] += 1
                if (len(req.tokens) >= req.max_tokens
                        or self.pos[slot] >= self.max_len - 1):
                    self._finish_slot(slot)
                    break

    def _finish_slot(self, slot: int) -> None:
        req = self.active[slot]
        self.pos[slot] = self.max_len - 1
        self.temps[slot] = 0.0
        self.top_ps[slot] = 1.0
        self.top_ks[slot] = 0
        self.rep_pens[slot] = 1.0
        result = np.asarray(req.tokens if req else [], np.int32)
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
        """Pre-compile prefill/install/tick for every slot with one
        concurrent wave of tiny requests."""
        rng = np.random.default_rng(0)
        D = self.t3.cfg.n_embd
        emb = rng.standard_normal((1, 16, D)).astype(np.float32) * 0.02
        reqs = [
            _TurboRequest(
                embeds=emb, max_tokens=self.tick_frames, temp=0.8,
                top_k=50, top_p=0.95, rep_penalty=1.2, seed=0,
            )
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
