"""Continuous (slot-based) batching for Sesame/CSM frame generation.

NEW relative to the reference (one request at a time; reference
server.py:74-94 serializes, sesame.py:328 generates per request): a pool of
B backbone-cache slots advances in lock-step, one fused device dispatch per
`tick_frames` frames. Each frame step runs the batched backbone step plus
the (K-1)-step depth-decoder inner loop for ALL live requests at once —
decode is memory-bandwidth-bound, so co-tenants ride along nearly free.

Sampling is per-slot and in-graph (`lm.continuous._sample_rows_core`):
every slot carries its own PRNG key stream, temperature and top-k, so a
request's frames depend only on its own seed — batched output equals
running the request alone.
"""

from __future__ import annotations

from concurrent.futures import Future
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....lm.cache import KVCache
from ....lm.continuous import (SlotKVCache, _bucket, _install_slot,
                               _sample_rows_core)
from ....serving import FrameBatcherBase
from .sesame import SesameModel

__all__ = ["SesameBatcher"]


@partial(jax.jit, donate_argnames=("caches",))
def _prefill_b1(model: SesameModel, caches, tokens, tokens_mask, length):
    """Bucketed B=1 prompt prefill; returns (h_last (D,), caches)."""
    emb = model.embed_frames(tokens, tokens_mask)
    T = emb.shape[1]
    S = caches[0].max_len
    q = jnp.arange(T)[:, None]
    k = jnp.arange(S)[None, :]
    ok = (k <= q) & (k < length)
    mask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
    h, caches = model.backbone(emb, caches, mask=mask)
    return h[0, length - 1], caches


@partial(jax.jit, donate_argnames=("buf",), static_argnames=("slot",))
def _set_row(buf, slot: int, row):
    return buf.at[slot].set(row.astype(buf.dtype))


def _sample_frame_rows(model: SesameModel, h_last, keys, temps, top_ks):
    """Batched version of `SesameModel.sample_frame`: one frame (B, K) with
    per-row temperature/top-k sampling and per-row PRNG streams."""
    B = h_last.shape[0]
    K = model.args.audio_num_codebooks
    V = model.args.audio_vocab_size
    ones = jnp.ones((B,), jnp.float32)
    no_pen = jnp.ones((B,), jnp.float32)
    no_win = jnp.zeros((B,), jnp.int32)
    dummy_hist = jnp.full((B, 1), -1, jnp.int32)

    def samp(logits, keys):
        return _sample_rows_core(logits.astype(jnp.float32), keys,
                                 dummy_hist, temps, ones, top_ks, no_pen,
                                 no_win)

    c0, keys = samp(model.codebook0_head(h_last), keys)
    c0_embed = model.audio_embeddings(c0)  # codebook 0 offset = 0
    dec_caches = model._decoder_caches(B)
    seq = jnp.stack([h_last, c0_embed], axis=1)  # (B, 2, Db)
    h, dec_caches = model.decoder(model.projection(seq), dec_caches)
    frame = jnp.zeros((B, K), jnp.int32).at[:, 0].set(c0)

    def body(i, state):
        h_dec_last, dec_caches, frame, keys = state
        logits = jnp.einsum(
            "bd,dv->bv", h_dec_last,
            jax.lax.dynamic_index_in_dim(model.audio_head, i - 1, 0, False),
            preferred_element_type=jnp.float32,
        )
        ci, keys = samp(logits, keys)
        frame = jax.lax.dynamic_update_slice(frame, ci[:, None], (0, i))
        ci_embed = model.audio_embeddings(ci + i * V)
        h, dec_caches = model.decoder(
            model.projection(ci_embed[:, None]), dec_caches)
        return h[:, -1], dec_caches, frame, keys

    _, _, frame, keys = jax.lax.fori_loop(
        1, K, body, (h[:, -1], dec_caches, frame, keys))
    return frame, keys


@partial(jax.jit, donate_argnames=("caches",), static_argnames=("n",))
def _tick_n(model: SesameModel, caches: List[SlotKVCache], h_last, pos,
            keys, temps, top_ks, n: int):
    """`n` lock-step frame steps for all slots fused into ONE dispatch.

    Returns (frames (B, n, K), caches, h_last, keys)."""
    K = model.args.audio_num_codebooks

    def body(carry, _):
        caches, h_last, pos, keys = carry
        frame, keys = _sample_frame_rows(model, h_last, keys, temps, top_ks)
        B = frame.shape[0]
        tokens = jnp.concatenate(
            [frame, jnp.zeros((B, 1), jnp.int32)], axis=1)[:, None, :]
        cols = jnp.concatenate(
            [jnp.ones((B, K), bool), jnp.zeros((B, 1), bool)],
            axis=1)[:, None, :]
        emb = model.embed_frames(tokens, cols)
        caches = [c.replace(pos=pos) for c in caches]
        S = caches[0].max_len
        amask = jnp.where(
            jnp.arange(S)[None, :] <= pos[:, None], 0.0, -jnp.inf
        )[:, None, None, :]
        h, caches = model.backbone(
            emb, caches, positions=pos[:, None], mask=amask)
        # keep the carry dtype stable under bf16 weights
        return (caches, h[:, -1].astype(h_last.dtype), pos + 1, keys), frame

    (caches, h_last, pos, keys), frames = jax.lax.scan(
        body, (caches, h_last, pos, keys), None, length=n)
    return jnp.swapaxes(frames, 0, 1), caches, h_last, keys


@dataclass
class _FrameRequest:
    tokens: np.ndarray  # (1, T, K+1) prompt token frames
    tokens_mask: np.ndarray
    max_frames: int
    temp: float
    top_k: int
    seed: int
    future: Future = field(default_factory=Future)
    frames: list = field(default_factory=list)  # emitted (K,) rows
    on_frame: object = None  # streaming sink, one (K,) row per call


class SesameBatcher(FrameBatcherBase):
    """Slot-based continuous batching over a `SesameModel`. `submit`
    resolves to the generated code frames (n, K) np.int32; audio decode
    (Mimi) + watermarking stay on the caller's thread."""

    def __init__(self, model, slots: int = 4, max_len: int = 2048,
                 tick_frames: int = 8, cache_dtype=jnp.float32):
        # accept the outer `Model` wrapper (hook registration target) or a
        # bare SesameModel
        self._owner = model
        self.model = model if isinstance(model, SesameModel) else model.model
        self.max_len = max_len
        self._cache_dtype = cache_dtype
        self._build_device_state(slots, cache_dtype)
        self.pos = np.full(slots, max_len - 1, np.int32)  # scratch index
        self.keys = np.zeros((slots, 2), np.uint32)
        self.temps = np.zeros(slots, np.float32)
        self.top_ks = np.zeros(slots, np.int32)
        super().__init__(slots=slots, tick_frames=tick_frames)

    def _build_device_state(self, slots, cache_dtype):
        cfg = self.model.args
        self.caches = [
            SlotKVCache(slots, cfg.num_key_value_heads, self.max_len,
                        cfg.head_dim, cache_dtype)
            for _ in range(cfg.num_hidden_layers)
        ]
        dtype = self.model.codebook0_head.weight.dtype
        self.h_last = jnp.zeros((slots, cfg.hidden_size), dtype)

    def submit(self, tokens, tokens_mask, max_frames: int = 1024,
               temp: float = 0.9, top_k: int = 50, seed: int = 0,
               on_frame=None) -> Future:
        req = _FrameRequest(
            tokens=np.asarray(tokens, np.int32),
            tokens_mask=np.asarray(tokens_mask, bool),
            max_frames=int(max_frames), temp=float(temp), top_k=int(top_k),
            seed=int(seed), on_frame=on_frame,
        )
        return self.submit_request(req)

    # -- FrameBatcherBase hooks ---------------------------------------

    def _admit(self, req: _FrameRequest, slot: int) -> None:
        T = req.tokens.shape[1]
        if T >= self.max_len:
            raise ValueError(f"prompt length {T} >= capacity {self.max_len}")
        P = min(_bucket(T), self.max_len)
        cfg = self.model.args
        toks = np.zeros((1, P, req.tokens.shape[2]), np.int32)
        toks[:, :T] = req.tokens
        mask = np.zeros((1, P, req.tokens.shape[2]), bool)
        mask[:, :T] = req.tokens_mask
        single = [
            KVCache(1, cfg.num_key_value_heads, P, cfg.head_dim,
                    dtype=self._cache_dtype)
            for _ in range(cfg.num_hidden_layers)
        ]
        h0, single = _prefill_b1(
            self.model, single, jnp.asarray(toks), jnp.asarray(mask),
            jnp.asarray(T),
        )
        self.caches = _install_slot(
            self.caches, single, slot, jnp.asarray(T, jnp.int32))
        self.h_last = _set_row(self.h_last, slot, h0)
        self.pos[slot] = T
        self.keys[slot] = np.asarray(jax.random.PRNGKey(req.seed), np.uint32)
        self.temps[slot] = req.temp
        self.top_ks[slot] = req.top_k

    def _tick(self, n: int) -> None:
        frames, self.caches, self.h_last, keys = _tick_n(
            self.model, self.caches, self.h_last,
            jnp.asarray(self.pos), jnp.asarray(self.keys),
            jnp.asarray(self.temps), jnp.asarray(self.top_ks), n=n,
        )
        frames_np = np.asarray(jax.device_get(frames))  # (slots, n, K)
        self.keys = np.array(jax.device_get(keys))
        self.steps += 1  # before _finish: future observers see the count
        for slot, req in enumerate(self.active):
            if req is None:
                continue
            for j in range(n):
                f = frames_np[slot, j]
                if (f == 0).all():  # EOS frame (excluded, sesame.py:244)
                    self._finish_slot(slot)
                    break
                req.frames.append(f)
                self._emit(req, f)
                self.pos[slot] += 1
                if (len(req.frames) >= req.max_frames
                        or self.pos[slot] >= self.max_len - 1):
                    self._finish_slot(slot)
                    break

    def _finish_slot(self, slot: int) -> None:
        req = self.active[slot]
        self.pos[slot] = self.max_len - 1
        self.temps[slot] = 0.0
        self.top_ks[slot] = 0
        result = (
            np.stack(req.frames).astype(np.int32)
            if req.frames else
            np.zeros((0, self.model.args.audio_num_codebooks), np.int32)
        )
        self._finish(slot, result)

    def _fail_all(self, e: Exception) -> None:
        for slot, req in enumerate(self.active):
            if req is not None and not req.future.done():
                req.future.set_exception(e)
            self.active[slot] = None
            self.pos[slot] = self.max_len - 1
        self._build_device_state(self.slots, self._cache_dtype)

    # -- pipeline integration -----------------------------------------

    def warmup(self):
        """Pre-compile prefill/install/tick for every slot with one
        concurrent wave of tiny requests (see
        FrameBatcherBase.warmup_requests)."""
        K = self.model.args.audio_num_codebooks
        T = 8
        toks = np.zeros((1, T, K + 1), np.int32)
        toks[:, :, -1] = np.arange(1, T + 1)
        mask = np.zeros((1, T, K + 1), bool)
        mask[:, :, -1] = True
        reqs = [
            _FrameRequest(tokens=toks, tokens_mask=mask,
                          max_frames=self.tick_frames, temp=0.9, top_k=50,
                          seed=0)
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
