"""Continuous (slot-based) batching for Voxtral-Realtime's
position-locked decode.

NEW relative to the reference (one realtime session per process;
reference voxtral_realtime.py:244-420): a pool of B slot caches advances
in lock-step, one fused dispatch per `tick_frames` steps. Each slot owns
its padded adapter-output buffer (the audio-embedding stream the decode
is position-locked to), its AdaRMSNorm scales (per-request transcription
delay → per-row (B, 1, D) broadcast), and its PRNG stream; per-step math
mirrors `_realtime_decode` (audio-embedding + token-embedding sum, k <=
pos causal mask, per-row absolute rope positions).
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
from .voxtral_realtime import _realtime_prefill

__all__ = ["VoxtralRTBatcher"]


@partial(jax.jit, donate_argnames=("buf",), static_argnames=("slot",))
def _set_row(buf, slot: int, row):
    return buf.at[slot].set(row.astype(buf.dtype))


@partial(jax.jit, donate_argnames=("caches",), static_argnames=("n",))
def _tick_n(model, caches: List[SlotKVCache], logits, adapter, ada, pos,
            n_audio, keys, temps, n: int):
    """`n` lock-step position-locked decode steps fused into ONE dispatch.

    adapter (B, Amax, D) per-slot padded audio embeddings; ada (L, B, D)
    per-slot AdaRMSNorm scales; pos (B,) absolute positions. Returns
    (tokens (B, n), caches, logits, keys)."""
    B = pos.shape[0]
    zeros_i = jnp.zeros((B,), jnp.int32)
    ones_f = jnp.ones((B,), jnp.float32)
    no_pen = jnp.ones((B,), jnp.float32)
    dummy_hist = jnp.full((B, 1), -1, jnp.int32)
    L = len(model.decoder.layers)

    def body(carry, _):
        caches, logits, pos, keys = carry
        tok, keys = _sample_rows_core(
            logits, keys, dummy_hist, temps, ones_f, zeros_i, no_pen,
            zeros_i)
        a_idx = jnp.minimum(pos, n_audio - 1)
        audio_emb = jnp.take_along_axis(
            adapter, a_idx[:, None, None], axis=1)[:, 0]  # (B, D)
        emb = (audio_emb
               + model.decoder.tok_embeddings.weight[tok])[:, None]
        caches = [c.replace(pos=pos) for c in caches]
        S = caches[0].max_len
        amask = jnp.where(
            jnp.arange(S)[None, :] <= pos[:, None], 0.0, -jnp.inf
        )[:, None, None, :]
        ada_scales = [ada[i][:, None] for i in range(L)]
        out, _h, caches = model.decoder(
            emb.astype(adapter.dtype), pos, ada_scales, caches, amask)
        return (caches, out[:, -1].astype(jnp.float32), pos + 1, keys), tok

    (caches, logits, pos, keys), toks = jax.lax.scan(
        body, (caches, logits, pos, keys), None, length=n)
    return jnp.swapaxes(toks, 0, 1), caches, logits, keys


@dataclass
class _RTRequest:
    adapter_out: np.ndarray  # (Na, D) encoder/adapter output
    prefix: np.ndarray  # (1, T0, D) prefill embeddings (unpadded)
    ada: np.ndarray  # (L, D) per-layer AdaRMSNorm scales
    prompt_len: int
    max_steps: int
    temp: float
    seed: int
    future: Future = field(default_factory=Future)
    tokens: list = field(default_factory=list)
    on_frame: object = None  # streaming sink, one token per call


class VoxtralRTBatcher(FrameBatcherBase):
    """Slot-based continuous batching over a Voxtral-Realtime model.
    `submit` takes the prepared per-request decode state (host prep —
    mel, encoder, prefix — on the caller's thread via
    `Model._prepare_decode`) and resolves to the generated token ids
    (EOS excluded); detokenization stays on the caller's thread."""

    def __init__(self, model, slots: int = 4, max_len: int = 4096,
                 adapter_max: int = 4096, tick_frames: int = 16,
                 **_ignored):
        self._owner = model
        self.model = model
        cfg = model.config.decoder
        self.max_len = max_len
        self.adapter_max = adapter_max
        self.eos = int(model.config.eos_token_id)
        self._build_device_state(slots)
        self.pos = np.full(slots, max_len - 1, np.int32)  # scratch index
        self.n_audio = np.ones(slots, np.int32)
        self.keys = np.zeros((slots, 2), np.uint32)
        self.temps = np.zeros(slots, np.float32)
        super().__init__(slots=slots, tick_frames=tick_frames)

    def _build_device_state(self, slots):
        cfg = self.model.config.decoder
        self.caches = [
            SlotKVCache(slots, cfg.n_kv_heads, self.max_len, cfg.head_dim,
                        jnp.float32)
            for _ in range(cfg.n_layers)
        ]
        self.logits = jnp.zeros((slots, cfg.vocab_size), jnp.float32)
        self.adapter = jnp.zeros((slots, self.adapter_max, cfg.dim),
                                 jnp.float32)
        self.ada = jnp.zeros((cfg.n_layers, slots, cfg.dim), jnp.float32)

    def submit(self, adapter_out, prefix, ada, *, prompt_len: int,
               max_steps: int, temperature: float = 0.0, seed: int = 0,
               on_frame=None) -> Future:
        req = _RTRequest(
            adapter_out=np.asarray(adapter_out, np.float32),
            prefix=np.asarray(prefix, np.float32),
            ada=np.asarray(ada, np.float32),
            prompt_len=int(prompt_len), max_steps=int(max_steps),
            temp=float(temperature), seed=int(seed), on_frame=on_frame,
        )
        return self.submit_request(req)

    # -- FrameBatcherBase hooks ---------------------------------------

    def _admit(self, req: _RTRequest, slot: int) -> None:
        T0 = req.prompt_len
        Na = req.adapter_out.shape[0]
        if Na > self.adapter_max:
            raise ValueError(
                f"audio length {Na} tokens > batcher adapter_max "
                f"{self.adapter_max}")
        if T0 >= self.max_len:
            raise ValueError(f"prompt length {T0} >= capacity "
                             f"{self.max_len}")
        cfg = self.model.config.decoder
        P = min(_bucket(max(T0, req.prefix.shape[1])), self.max_len)
        D = req.prefix.shape[-1]
        inp = np.zeros((1, P, D), np.float32)
        inp[:, :req.prefix.shape[1]] = req.prefix
        single = [
            KVCache(1, cfg.n_kv_heads, P, cfg.head_dim, dtype=jnp.float32)
            for _ in range(cfg.n_layers)
        ]
        ada_list = [jnp.asarray(req.ada[i])[None, None]
                    for i in range(cfg.n_layers)]
        l0, single = _realtime_prefill(
            self.model, single, jnp.asarray(inp), jnp.asarray(T0),
            ada_list)
        self.caches = _install_slot(
            self.caches, single, slot, jnp.asarray(T0, jnp.int32))
        self.logits = _set_row(self.logits, slot, l0[0])
        pad = np.zeros((self.adapter_max, D), np.float32)
        pad[:Na] = req.adapter_out
        self.adapter = _set_row(self.adapter, slot, jnp.asarray(pad))
        self.ada = self.ada.at[:, slot].set(jnp.asarray(req.ada))
        self.pos[slot] = T0
        self.n_audio[slot] = Na
        self.keys[slot] = np.asarray(jax.random.PRNGKey(req.seed), np.uint32)
        self.temps[slot] = req.temp

    def _tick(self, n: int) -> None:
        toks, self.caches, self.logits, keys = _tick_n(
            self.model, self.caches, self.logits, self.adapter, self.ada,
            jnp.asarray(self.pos), jnp.asarray(self.n_audio),
            jnp.asarray(self.keys), jnp.asarray(self.temps), n=n,
        )
        toks_np = np.asarray(jax.device_get(toks))  # (slots, n)
        self.keys = np.array(jax.device_get(keys))
        self.steps += 1  # before _finish: future observers see the count
        for slot, req in enumerate(self.active):
            if req is None:
                continue
            for j in range(n):
                tok = int(toks_np[slot, j])
                if tok == self.eos:  # EOS excluded from the result
                    self._finish_slot(slot)
                    break
                req.tokens.append(tok)
                self._emit(req, tok)
                self.pos[slot] += 1
                # position lock: decode may not run past the audio stream
                if (len(req.tokens) >= req.max_steps
                        or self.pos[slot] >= int(self.n_audio[slot])
                        or self.pos[slot] >= self.max_len - 1):
                    self._finish_slot(slot)
                    break

    def _finish_slot(self, slot: int) -> None:
        req = self.active[slot]
        self.pos[slot] = self.max_len - 1
        self.n_audio[slot] = self.max_len  # keep a_idx in range for dead rows
        self.temps[slot] = 0.0
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

    def install(self):
        from ....serving import register_infer_hook

        register_infer_hook(self._owner, self)
        return self

    def close(self):
        from ....serving import unregister_infer_hook

        unregister_infer_hook(self._owner)
        super().close()
