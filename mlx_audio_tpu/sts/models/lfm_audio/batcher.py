"""Continuous (slot-based) batching for LFM2.5-Audio interleaved generation.

NEW relative to the reference (one request at a time; reference
mlx_audio/sts/models/lfm_audio/model.py:769-896 generates per request): a
pool of B hybrid-backbone cache slots advances in lock-step, one fused
device dispatch per `tick_frames` steps. The hybrid cache is why this
family could not ride `lm.ContinuousBatcher`: LFM2 interleaves gated
short-conv layers (fixed-width roll buffers, no per-row position) with GQA
attention layers (`SlotKVCache`, per-row positions), and each step emits
either a TEXT token or an 8-codebook AUDIO frame depending on a per-request
modality state machine.

Design:
- Every step samples BOTH a text token and a depthformer audio frame for
  all rows (the depth autoregression is batch-polymorphic, so co-tenants
  ride the same weight stream), then the interleaved modality state
  machine — counters, TEXT_END/IM_END/AUDIO_EOS transitions — runs
  IN-GRAPH as (B,) lane arithmetic, so `tick_frames` steps fuse into one
  dispatch even while slots sit in different modalities.
- Audio-EOS steps must not advance the cache (the reference `continue`s
  without a forward, model.py:279-287): non-advancing rows keep their
  position — the stale K/V written at `pos` is overwritten by the next
  real step before anything observes it — and their conv-roll is undone
  with a lane select.
- Sampling is per-slot and in-graph (`lm.continuous._sample_rows_core`):
  each row advances its own PRNG stream exactly 1 + K times per step
  regardless of modality, so a request's output depends only on its own
  seed — batched output equals running the request alone in an
  equally-sized pool.
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
from ....lm.continuous import SlotKVCache, _bucket, _sample_rows_core
from ....serving import FrameBatcherBase
from .lfm2 import ConvCache
from .model import (AUDIO_EOS_TOKEN, IM_END_TOKEN, TEXT_END_TOKEN,
                    LFM2AudioModel)
from .processor import LFMModality

__all__ = ["LFM2AudioBatcher"]


# ---------------------------------------------------------------- jits


@partial(jax.jit, donate_argnames=("caches",))
def _prefill_b1(model: LFM2AudioModel, caches, embeds, length):
    """Bucketed B=1 prompt prefill over the hybrid cache list; returns
    (h_last (D,), caches). `length` keeps the conv roll buffers aligned to
    the real prompt tail (see Lfm2ShortConv)."""
    P = embeds.shape[1]
    q = jnp.arange(P)[:, None]
    k = jnp.arange(P)[None, :]
    ok = (k <= q) & (k < length)
    mask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
    h, caches = model.lfm(embeds, caches, positions=jnp.arange(P),
                          mask=mask, true_len=length)
    return h[0, length - 1], caches


@partial(jax.jit, donate_argnames=("slot_caches",), static_argnames=("slot",))
def _install_hybrid(slot_caches, single_caches, slot: int, true_len):
    """Copy a B=1 prefilled hybrid cache list into `slot`."""
    out = []
    for sc, c1 in zip(slot_caches, single_caches):
        if isinstance(sc, SlotKVCache):
            P = c1.k.shape[2]
            nk = sc.k.at[slot, :, :P].set(c1.k[0].astype(sc.k.dtype))
            nv = sc.v.at[slot, :, :P].set(c1.v[0].astype(sc.v.dtype))
            npos = sc.pos.at[slot].set(true_len)
            out.append(sc.replace(k=nk, v=nv, pos=npos))
        else:  # ConvCache: roll buffer, position-free
            out.append(sc.replace(
                buf=sc.buf.at[slot].set(c1.buf[0].astype(sc.buf.dtype))))
    return out


@partial(jax.jit, donate_argnames=("buf",), static_argnames=("slot",))
def _set_row(buf, slot: int, row):
    return buf.at[slot].set(row.astype(buf.dtype))


def _audio_frame_rows(model: LFM2AudioModel, h_last, keys, temps, top_ks):
    """Batched `_audio_frame` (model.py) with per-row temperature/top-k and
    per-row PRNG streams: one frame (B, K) via the K-step depthformer
    autoregression, all rows at once."""
    B = h_last.shape[0]
    K = model.config.codebooks
    dd = model.audio_head.depthformer_dim
    depth_in = model.depth_linear(h_last).reshape(B, K, dd)
    ones = jnp.ones((B,), jnp.float32)
    no_pen = jnp.ones((B,), jnp.float32)
    no_win = jnp.zeros((B,), jnp.int32)
    dummy_hist = jnp.full((B, 1), -1, jnp.int32)

    seq = jnp.zeros((B, K, dd), depth_in.dtype)
    codes = []
    prev_emb = jnp.zeros((B, dd), depth_in.dtype)
    for i in range(K):
        seq = seq.at[:, i].set(depth_in[:, i] + prev_emb)
        h = model.audio_head.depthformer(seq[:, : i + 1])
        logits = model.depth_embeddings[i].logits(h[:, -1])
        code, keys = _sample_rows_core(
            logits.astype(jnp.float32), keys, dummy_hist, temps, ones,
            top_ks, no_pen, no_win)
        codes.append(code)
        prev_emb = model.depth_embeddings[i].embed_raw(code).astype(
            depth_in.dtype)
    return jnp.stack(codes, axis=-1), keys  # (B, K)


@partial(jax.jit, donate_argnames=("caches",), static_argnames=("n",))
def _tick_n(model: LFM2AudioModel, caches, h_last, pos, keys,
            t_temps, t_topks, a_temps, a_topks, n_texts, n_audios,
            mode, mod_left, text_done, done, n: int):
    """`n` lock-step interleaved steps for all slots fused into ONE
    dispatch. Per-row state machine (reference model.py:253-295) runs as
    lane arithmetic. Returns per-step outputs + updated carry."""

    def body(carry, _):
        caches, h_last, pos, keys, mode, mod_left, text_done, done = carry
        B = h_last.shape[0]

        # sample both modalities for every row (uniform key advancement)
        text_logits = model.lfm.embed_tokens.as_linear(
            h_last[:, None])[:, -1, :]
        ones = jnp.ones((B,), jnp.float32)
        no_pen = jnp.ones((B,), jnp.float32)
        no_win = jnp.zeros((B,), jnp.int32)
        dummy_hist = jnp.full((B, 1), -1, jnp.int32)
        tok, keys = _sample_rows_core(
            text_logits.astype(jnp.float32), keys, dummy_hist, t_temps,
            ones, t_topks, no_pen, no_win)
        frame, keys = _audio_frame_rows(model, h_last, keys, a_temps,
                                        a_topks)

        is_text = mode == 0
        im_end = is_text & (tok == IM_END_TOKEN) & ~done
        t_end = is_text & (tok == TEXT_END_TOKEN)
        frame_eos = ~is_text & (frame[:, 0] == AUDIO_EOS_TOKEN)
        frame = jnp.where(frame_eos[:, None], AUDIO_EOS_TOKEN, frame)
        new_text_done = text_done | (t_end & ~done)
        finish_now = (im_end | (frame_eos & text_done)) & ~done
        adv = ~done & ~im_end & ~frame_eos

        # forward ALL rows with the modality-selected embedding
        emb_text = model.lfm.embed_tokens(tok[:, None])
        emb_audio = model.audio_embedding(frame)[:, None]
        emb = jnp.where(is_text[:, None, None], emb_text, emb_audio)
        caches_set = [c.replace(pos=pos) if isinstance(c, SlotKVCache)
                      else c for c in caches]
        S = next(c for c in caches if isinstance(c, SlotKVCache)).max_len
        amask = jnp.where(
            jnp.arange(S)[None, :] <= pos[:, None], 0.0, -jnp.inf
        )[:, None, None, :].astype(jnp.float32)
        h_new, caches_new = model.lfm(emb, caches_set,
                                      positions=pos[:, None], mask=amask)
        # non-advancing rows: undo the conv roll (K/V writes at `pos` are
        # overwritten by the next real step before being observed)
        caches_out = []
        for c_old, c_new in zip(caches, caches_new):
            if isinstance(c_new, ConvCache):
                buf = jnp.where(adv[:, None, None], c_new.buf, c_old.buf)
                caches_out.append(c_new.replace(buf=buf))
            else:
                caches_out.append(c_new)
        h_last = jnp.where(adv[:, None],
                           h_new[:, -1, :].astype(h_last.dtype), h_last)
        pos = jnp.where(adv, pos + 1, pos)

        # modality transitions (reference model.py:270-295)
        left_after = mod_left - 1
        to_audio = is_text & ~im_end & ((left_after <= 0) | new_text_done)
        to_text = (frame_eos & ~text_done) | (
            ~is_text & ~frame_eos & (left_after <= 0) & ~new_text_done)
        new_mode = jnp.where(to_audio, 1, jnp.where(to_text, 0, mode))
        new_left = jnp.where(to_audio, n_audios,
                             jnp.where(to_text, n_texts, left_after))
        new_mode = jnp.where(done | finish_now, mode, new_mode)
        new_left = jnp.where(done | finish_now, mod_left, new_left)
        new_text_done = jnp.where(done, text_done, new_text_done)
        new_done = done | finish_now

        outs = (tok, frame, is_text, im_end, finish_now, done)
        return (caches_out, h_last, pos, keys, new_mode, new_left,
                new_text_done, new_done), outs

    carry, outs = jax.lax.scan(
        body, (caches, h_last, pos, keys, mode, mod_left, text_done, done),
        None, length=n)
    (caches, h_last, pos, keys, mode, mod_left, text_done, done) = carry
    toks, frames, is_text, im_end, finish, done_before = outs
    return (jnp.swapaxes(toks, 0, 1), jnp.swapaxes(frames, 0, 1),
            jnp.swapaxes(is_text, 0, 1), jnp.swapaxes(im_end, 0, 1),
            jnp.swapaxes(finish, 0, 1), jnp.swapaxes(done_before, 0, 1),
            caches, h_last, pos, keys, mode, mod_left, text_done, done)


@dataclass
class _Request:
    embeds: np.ndarray  # (1, T, D) prompt embeddings (host-built)
    max_new_tokens: int
    temperature: float
    top_k: int
    audio_temperature: float
    audio_top_k: int
    n_text: int
    n_audio: int
    seed: int
    future: Future = field(default_factory=Future)
    items: list = field(default_factory=list)  # (payload, LFMModality)
    on_frame: object = None  # streaming sink: one (payload, modality)/call


class LFM2AudioBatcher(FrameBatcherBase):
    """Slot-based continuous batching over `LFM2AudioModel`'s interleaved
    generation. `submit` resolves to the full (payload, modality) stream;
    detokenization stays on the caller's thread."""

    def __init__(self, model: LFM2AudioModel, slots: int = 4,
                 max_len: int = 4096, tick_frames: int = 8,
                 cache_dtype=jnp.float32):
        self._owner = model
        self.model = model
        self.max_len = max_len
        self._cache_dtype = cache_dtype
        self._build_device_state(slots, cache_dtype)
        self.pos = np.full(slots, max_len - 1, np.int32)  # scratch index
        self.keys = np.zeros((slots, 2), np.uint32)
        self.t_temps = np.zeros(slots, np.float32)
        self.t_topks = np.zeros(slots, np.int32)
        self.a_temps = np.zeros(slots, np.float32)
        self.a_topks = np.zeros(slots, np.int32)
        self.n_texts = np.ones(slots, np.int32)
        self.n_audios = np.ones(slots, np.int32)
        self.mode = np.zeros(slots, np.int32)
        self.mod_left = np.ones(slots, np.int32)
        self.text_done = np.zeros(slots, bool)
        self.done = np.ones(slots, bool)  # idle slots are parked as done
        super().__init__(slots=slots, tick_frames=tick_frames)

    def _build_device_state(self, slots, cache_dtype):
        cfg = self.model.config.lfm
        self.caches = [
            SlotKVCache(slots, cfg.num_key_value_heads, self.max_len,
                        cfg.head_dim, cache_dtype)
            if layer.is_attention_layer else
            ConvCache(slots, cfg.conv_L_cache - 1, cfg.hidden_size,
                      cache_dtype)
            for layer in self.model.lfm.layers
        ]
        dtype = self.model.lfm.embed_tokens.weight.dtype
        self.h_last = jnp.zeros((slots, cfg.hidden_size), dtype)

    # ------------------------------------------------------------------

    def submit(self, text_tokens=None, audio_features=None,
               audio_codes=None, modalities=None,
               max_new_tokens: int = 512, temperature: float = 1.0,
               top_k: int = 50, audio_temperature: float = 1.0,
               audio_top_k: int = 4,
               interleaved_n_text: Optional[int] = None,
               interleaved_n_audio: Optional[int] = None,
               seed: int = 0, on_frame=None) -> Future:
        embeds = np.asarray(self.model._build_embeddings(
            text_tokens, audio_features, audio_codes, modalities))
        cfg = self.model.config
        req = _Request(
            embeds=embeds, max_new_tokens=int(max_new_tokens),
            temperature=float(temperature), top_k=int(top_k),
            audio_temperature=float(audio_temperature),
            audio_top_k=int(audio_top_k),
            n_text=int(interleaved_n_text or cfg.interleaved_n_text),
            n_audio=int(interleaved_n_audio or cfg.interleaved_n_audio),
            seed=int(seed), on_frame=on_frame,
        )
        return self.submit_request(req)

    # -- FrameBatcherBase hooks ---------------------------------------

    def _admit(self, req: _Request, slot: int) -> None:
        T = req.embeds.shape[1]
        if T >= self.max_len:
            raise ValueError(f"prompt length {T} >= capacity {self.max_len}")
        P = min(_bucket(T), self.max_len)
        cfg = self.model.config.lfm
        emb = np.zeros((1, P, req.embeds.shape[2]), req.embeds.dtype)
        emb[:, :T] = req.embeds
        single = [
            KVCache(1, cfg.num_key_value_heads, P, cfg.head_dim,
                    dtype=self._cache_dtype)
            if layer.is_attention_layer else
            ConvCache(1, cfg.conv_L_cache - 1, cfg.hidden_size,
                      self._cache_dtype)
            for layer in self.model.lfm.layers
        ]
        h0, single = _prefill_b1(
            self.model, single,
            jnp.asarray(emb, self.h_last.dtype), jnp.asarray(T))
        self.caches = _install_hybrid(
            self.caches, single, slot, jnp.asarray(T, jnp.int32))
        self.h_last = _set_row(self.h_last, slot, h0)
        self.pos[slot] = T
        self.keys[slot] = np.asarray(jax.random.PRNGKey(req.seed), np.uint32)
        self.t_temps[slot] = req.temperature
        self.t_topks[slot] = req.top_k
        self.a_temps[slot] = req.audio_temperature
        self.a_topks[slot] = req.audio_top_k
        self.n_texts[slot] = req.n_text
        self.n_audios[slot] = req.n_audio
        self.mode[slot] = 0  # interleaved starts in TEXT
        self.mod_left[slot] = req.n_text
        self.text_done[slot] = False
        self.done[slot] = False

    def _tick(self, n: int) -> None:
        (toks, frames, is_text, im_end, finish, done_before,
         self.caches, self.h_last, pos, keys, mode, mod_left, text_done,
         done) = _tick_n(
            self.model, self.caches, self.h_last,
            jnp.asarray(self.pos), jnp.asarray(self.keys),
            jnp.asarray(self.t_temps), jnp.asarray(self.t_topks),
            jnp.asarray(self.a_temps), jnp.asarray(self.a_topks),
            jnp.asarray(self.n_texts), jnp.asarray(self.n_audios),
            jnp.asarray(self.mode), jnp.asarray(self.mod_left),
            jnp.asarray(self.text_done), jnp.asarray(self.done), n=n)
        toks, frames, is_text, im_end, finish, done_before = (
            np.asarray(jax.device_get(x))
            for x in (toks, frames, is_text, im_end, finish, done_before))
        self.pos = np.array(jax.device_get(pos))
        self.keys = np.array(jax.device_get(keys))
        self.mode = np.array(jax.device_get(mode))
        self.mod_left = np.array(jax.device_get(mod_left))
        self.text_done = np.array(jax.device_get(text_done))
        self.done = np.array(jax.device_get(done))
        self.steps += 1  # before _finish: future observers see the count
        for slot, req in enumerate(self.active):
            if req is None:
                continue
            for j in range(n):
                if done_before[slot, j]:
                    self._finish_slot(slot)
                    break
                if is_text[slot, j]:
                    if im_end[slot, j]:
                        self._finish_slot(slot)
                        break
                    item = (np.asarray([toks[slot, j]], np.int32),
                            LFMModality.TEXT)
                else:
                    item = (frames[slot, j].astype(np.int32),
                            LFMModality.AUDIO_OUT)
                req.items.append(item)
                self._emit(req, item)
                if finish[slot, j] or len(req.items) >= req.max_new_tokens:
                    self._finish_slot(slot)
                    break

    def _finish_slot(self, slot: int) -> None:
        req = self.active[slot]
        self.pos[slot] = self.max_len - 1
        self.done[slot] = True
        self.t_temps[slot] = 0.0
        self.a_temps[slot] = 0.0
        self._finish(slot, list(req.items))

    def _fail_all(self, e: Exception) -> None:
        for slot, req in enumerate(self.active):
            if req is not None and not req.future.done():
                req.future.set_exception(e)
            self.active[slot] = None
            self.pos[slot] = self.max_len - 1
            self.done[slot] = True
        self._build_device_state(self.slots, self._cache_dtype)

    # -- pipeline integration -----------------------------------------

    def warmup(self):
        """Pre-compile prefill/install/tick for every slot with one
        concurrent wave of tiny requests."""
        reqs = [
            _Request(
                embeds=np.zeros(
                    (1, 8, self.model.config.lfm.hidden_size), np.float32),
                max_new_tokens=self.tick_frames, temperature=0.9, top_k=50,
                audio_temperature=0.9, audio_top_k=4, n_text=2, n_audio=2,
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
