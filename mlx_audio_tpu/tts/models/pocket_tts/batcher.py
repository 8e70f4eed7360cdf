"""Continuous (slot-based) batching for PocketTTS's flow-latent decode.

NEW relative to the reference (one request at a time; reference
pocket_tts.py:202-233 + flow_lm.py:70-116 step per request): a pool of B
slot caches advances in lock-step, one fused dispatch per `tick_frames`
frames. Each step mirrors `_pocket_generate`: transformer step on the
previous latent, EOS classifier, per-row noise draw (each slot owns its
PRNG stream, so batched latents equal a solo run with the same seed at
temp>0, and are deterministic at temp=0), LSD flow integration batched
across slots.

The frames-AFTER-EOS tail (the reference keeps `frames_after_eos` extra
frames past the EOS trigger) is tracked host-side per slot.
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
from ....lm.continuous import SlotKVCache, _bucket, _install_slot
from ....serving import FrameBatcherBase
from .pocket_tts import lsd_decode

__all__ = ["PocketTTSBatcher"]


@partial(jax.jit, donate_argnames=("caches",))
def _prefill_b1(flow_lm, caches, prefix, length):
    Tp = prefix.shape[1]
    S = caches[0].max_len
    q = jnp.arange(Tp)[:, None]
    k = jnp.arange(S)[None, :]
    ok = (k <= q) & (k < length)
    mask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
    _, caches = flow_lm.transformer(prefix, caches, mask=mask,
                                    positions=jnp.arange(Tp))
    return caches


@partial(jax.jit, donate_argnames=("buf",), static_argnames=("slot",))
def _set_row(buf, slot: int, row):
    return buf.at[slot].set(row.astype(buf.dtype))


@partial(jax.jit, donate_argnames=("caches",),
         static_argnames=("n", "lsd_steps", "noise_clamp", "eos_threshold"))
def _tick_n(flow_lm, caches: List[SlotKVCache], prev_latent, pos, keys,
            temps, n: int, lsd_steps: int, noise_clamp,
            eos_threshold: float):
    """`n` lock-step flow-latent steps fused into ONE dispatch.

    Returns (latents (B, n, ldim), eos (B, n) bool, caches, prev_latent,
    pos, keys)."""
    B = pos.shape[0]
    ldim = flow_lm.ldim

    def body(carry, _):
        caches, prev_latent, pos, keys = carry
        emb = flow_lm.input_linear(prev_latent)[:, None]  # (B, 1, D)
        caches = [c.replace(pos=pos) for c in caches]
        S = caches[0].max_len
        amask = jnp.where(
            jnp.arange(S)[None, :] <= pos[:, None], 0.0, -jnp.inf
        )[:, None, None, :]
        h, caches = flow_lm.transformer(emb, caches, mask=amask,
                                        positions=pos[:, None])
        h_ctx = flow_lm.out_norm(h)[:, -1]  # (B, D)
        c = h_ctx.astype(jnp.float32)
        is_eos = (flow_lm.out_eos(c) > eos_threshold)[..., 0]  # (B,)
        split = jax.vmap(jax.random.split)(keys)
        keys, subs = split[:, 0], split[:, 1]
        noise = jax.vmap(
            lambda k: jax.random.normal(k, (ldim,))
        )(subs) * jnp.sqrt(jnp.maximum(temps, 0.0))[:, None]
        if noise_clamp is not None:
            noise = jnp.clip(noise, -noise_clamp, noise_clamp)
        latent = lsd_decode(lambda s, t, x: flow_lm.flow_net(c, s, t, x),
                            noise, lsd_steps)  # (B, ldim)
        return (caches, latent, pos + 1, keys), (latent, is_eos)

    carry = (caches, prev_latent, pos, keys)
    (caches, prev_latent, pos, keys), (lats, eos) = jax.lax.scan(
        body, carry, None, length=n)
    return (jnp.swapaxes(lats, 0, 1), jnp.swapaxes(eos, 0, 1),
            caches, prev_latent, pos, keys)


@dataclass
class _PocketRequest:
    prefix: np.ndarray  # (1, T0, D) [audio-cond | text] prefill
    max_gen_len: int
    frames_after_eos: int
    temp: float
    seed: int
    future: Future = field(default_factory=Future)
    latents: list = field(default_factory=list)  # raw (ldim,) rows
    eos_at: int = -1
    on_frame: object = None  # streaming sink, one raw (ldim,) row per call


class PocketTTSBatcher(FrameBatcherBase):
    """Slot-based continuous batching over a PocketTTS model. `submit`
    takes the prepared (1, T0, D) prefill (host prep — tokenizer,
    voice/audio conditioning — on the caller's thread) and resolves to
    the RAW latent matrix (n, ldim) float32 (the caller applies the
    emb_std/emb_mean denormalization exactly like `_generate_latents`);
    codec decode stays on the caller's thread."""

    def __init__(self, model, slots: int = 4, max_len: int = 2048,
                 tick_frames: int = 8, **_ignored):
        self._owner = model
        self.flow_lm = model.flow_lm
        self.max_len = max_len
        self.lsd_steps = int(model.lsd_decode_steps)
        self.noise_clamp = model.noise_clamp
        self.eos_threshold = float(model.eos_threshold)
        tr = self.flow_lm.transformer
        self._heads = tr.num_heads
        self._hd = tr.d_model // tr.num_heads
        self._nlayers = len(tr.layers)
        self._ldim = self.flow_lm.ldim
        self._build_device_state(slots)
        self.pos = np.full(slots, max_len - 1, np.int32)  # scratch index
        self.keys = np.zeros((slots, 2), np.uint32)
        self.temps = np.zeros(slots, np.float32)
        super().__init__(slots=slots, tick_frames=tick_frames)

    def _build_device_state(self, slots):
        self.caches = [
            SlotKVCache(slots, self._heads, self.max_len, self._hd,
                        jnp.float32)
            for _ in range(self._nlayers)
        ]
        self.prev_latent = jnp.tile(self.flow_lm.bos_emb[None], (slots, 1))

    def submit(self, prefix, *, max_gen_len: int, frames_after_eos: int,
               temperature: float = None, seed: int = 0,
               on_frame=None) -> Future:
        pre = np.asarray(prefix)
        if pre.ndim == 2:
            pre = pre[None]
        req = _PocketRequest(
            prefix=pre, max_gen_len=max(4, int(max_gen_len)),
            frames_after_eos=int(frames_after_eos),
            temp=float(self._owner.temp if temperature is None
                       else temperature),
            seed=int(seed), on_frame=on_frame,
        )
        return self.submit_request(req)

    # -- FrameBatcherBase hooks ---------------------------------------

    def _admit(self, req: _PocketRequest, slot: int) -> None:
        T = req.prefix.shape[1]
        if T >= self.max_len:
            raise ValueError(f"prompt length {T} >= capacity {self.max_len}")
        P = min(_bucket(T), self.max_len)
        inp = np.zeros((1, P, req.prefix.shape[-1]), np.float32)
        inp[:, :T] = np.asarray(req.prefix, np.float32)
        single = [
            KVCache(1, self._heads, P, self._hd, dtype=jnp.float32)
            for _ in range(self._nlayers)
        ]
        single = _prefill_b1(self.flow_lm, single, jnp.asarray(inp),
                             jnp.asarray(T))
        self.caches = _install_slot(
            self.caches, single, slot, jnp.asarray(T, jnp.int32))
        self.prev_latent = _set_row(self.prev_latent, slot,
                                    self.flow_lm.bos_emb)
        self.pos[slot] = T
        self.keys[slot] = np.asarray(jax.random.PRNGKey(req.seed), np.uint32)
        self.temps[slot] = req.temp

    def _tick(self, n: int) -> None:
        lats, eos, self.caches, self.prev_latent, _pos, keys = _tick_n(
            self.flow_lm, self.caches, self.prev_latent,
            jnp.asarray(self.pos), jnp.asarray(self.keys),
            jnp.asarray(self.temps), n=n, lsd_steps=self.lsd_steps,
            noise_clamp=self.noise_clamp, eos_threshold=self.eos_threshold,
        )
        lats_np = np.asarray(jax.device_get(lats), np.float32)
        eos_np = np.asarray(jax.device_get(eos))
        self.keys = np.array(jax.device_get(keys))
        self.steps += 1  # before _finish: future observers see the count
        for slot, req in enumerate(self.active):
            if req is None:
                continue
            for j in range(n):
                step = len(req.latents)  # index of this frame
                # cond mirror: run while step < min(max, eos+after)
                if (req.eos_at >= 0
                        and step >= req.eos_at + req.frames_after_eos):
                    self._finish_slot(slot)
                    break
                req.latents.append(lats_np[slot, j])
                self._emit(req, lats_np[slot, j])
                self.pos[slot] += 1
                if req.eos_at < 0 and bool(eos_np[slot, j]):
                    req.eos_at = step
                if (len(req.latents) >= req.max_gen_len
                        or self.pos[slot] >= self.max_len - 1):
                    self._finish_slot(slot)
                    break

    def _finish_slot(self, slot: int) -> None:
        req = self.active[slot]
        self.pos[slot] = self.max_len - 1
        self.temps[slot] = 0.0
        result = (np.stack(req.latents) if req and req.latents
                  else np.zeros((0, self._ldim), np.float32))
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
