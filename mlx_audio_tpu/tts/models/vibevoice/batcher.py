"""Continuous (slot-based) batching for VibeVoice streaming TTS.

NEW relative to the reference (one request at a time; reference
mlx_audio/tts/models/vibevoice/vibevoice.py:553-700 generates per request):
a pool of B slots advances in lock-step, one fused device dispatch per
scheduling ROUND. VibeVoice's solo loop already alternates a ≤5-token text
window with a ≤6-latent speech window every iteration, so concurrent
requests stay naturally synchronized — a round feeds every live row's text
window (width-padded, per-row true widths) through the lower LM + both TTS
streams, then runs the 6-step speech window with the full CFG'd
DPM-Solver++ sampling of ALL rows batched into one integration
(2B-row prediction-head calls), per-row EOS classification, and per-row
speech budgets.

Design notes:
- Text windows append at per-row offsets through `SlotKVCache.update`'s
  windowed (t>1) path; rows whose text is exhausted pass width 0 — their
  garbage K/V at [pos, pos+5) is overwritten by later real writes before
  any query exposes it (same bucketing argument as lm.continuous).
- The three cache stacks (lower LM, TTS, negative-CFG TTS) advance
  together: tts/neg positions move in lockstep, the LM stream only on
  text windows.
- Per-row PRNG keys drive the diffusion noise, so a request's latents
  depend only on its own seed — batched output equals running the
  request alone in an equally-sized pool.
"""

from __future__ import annotations

from concurrent.futures import Future
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....lm.continuous import SlotKVCache, _bucket
from ....serving import FrameBatcherBase
from .vibevoice import (TTS_SPEECH_WINDOW_SIZE, TTS_TEXT_WINDOW_SIZE,
                        _coeffs, Model)

__all__ = ["VibeVoiceBatcher"]


def _sample_latent_rows(model, pos_h, neg_h, keys, ddpm_steps: int,
                        cfg_scales):
    """Batched CFG'd DPM-Solver++ sampling: (B, D) conds → (B, latent).
    Mirrors `vibevoice._sample_latent_in_graph` with per-row noise keys
    and per-row cfg scales; one 2B-row prediction-head call per step."""
    c = _coeffs(model.config.diffusion_head_config.ddpm_num_steps,
                ddpm_steps,
                model.config.diffusion_head_config.ddpm_beta_schedule,
                model.config.diffusion_head_config.prediction_type)
    B = pos_h.shape[0]
    latent_dim = model.config.acoustic_vae_dim
    x = jax.vmap(lambda k: jax.random.normal(k, (latent_dim,),
                                             jnp.float32))(keys)
    cond2 = jnp.concatenate([pos_h, neg_h], axis=0).astype(jnp.float32)

    num_train = model.config.diffusion_head_config.ddpm_num_steps
    timesteps = [float(round((num_train - 1) * (1.0 - i / ddpm_steps)))
                 for i in range(ddpm_steps)]
    cfg = cfg_scales[:, None].astype(jnp.float32)

    prev_x0 = jnp.zeros_like(x)
    for i in range(ddpm_steps):
        t2 = jnp.full((2 * B,), timesteps[i], jnp.float32)
        eps2 = model.prediction_head(jnp.concatenate([x, x], axis=0), t2,
                                     cond2)
        eps = eps2[B:] + cfg * (eps2[:B] - eps2[B:])

        a_cur, s_cur = float(c.alpha[i]), float(c.sigma[i])
        if c.prediction_type == "epsilon":
            x0 = (x - s_cur * eps) / a_cur
        else:  # v_prediction
            x0 = a_cur * x - s_cur * eps
        a_next, s_next = float(c.alpha[i + 1]), float(c.sigma[i + 1])
        h = float(c.lam[i + 1] - c.lam[i])
        sigma_ratio = (s_next / s_cur) if s_cur > 0 else 0.0
        em1 = float(np.exp(-h) - 1.0)
        if c.orders[i] == 1 or i == 0:
            x = sigma_ratio * x - a_next * em1 * x0
        else:
            h0 = float(c.lam[i] - c.lam[i - 1])
            r0 = h0 / h if h != 0 else 1.0
            d1 = (x0 - prev_x0) / r0
            x = sigma_ratio * x - a_next * em1 * x0 \
                - 0.5 * a_next * em1 * d1
        prev_x0 = x0
    return x  # (B, latent)


def _window_mask(pos, t: int, S: int):
    """(B, 1, t, S) additive mask: query j of row b exposes k ≤ pos[b]+j."""
    q = pos[:, None] + jnp.arange(t)[None, :]  # (B, t)
    ok = jnp.arange(S)[None, None, :] <= q[:, :, None]
    return jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)[:, None]


@partial(jax.jit,
         static_argnames=("ddpm_steps",),
         donate_argnames=("lm_caches", "tts_caches", "neg_caches"))
def _round(model: Model, lm_caches, tts_caches, neg_caches, pos_h, neg_h,
           text_tokens, text_w, lm_pos, tts_pos, keys, cfg_scales,
           speech_budget, ddpm_steps: int):
    """One scheduling round for all slots — text window + speech window —
    fused into ONE dispatch. Returns (latents (B, 6, L), counts, eos,
    updated state)."""
    B, W = text_tokens.shape
    has_text = text_w > 0

    # ---- text window (reference vibevoice.py:600-646, batched) ----
    lm_caches = [c.replace(pos=lm_pos) for c in lm_caches]
    tts_caches = [c.replace(pos=tts_pos) for c in tts_caches]
    neg_caches = [c.replace(pos=tts_pos) for c in neg_caches]

    embeds = model.language_model.embed_tokens(text_tokens)
    S_lm = lm_caches[0].max_len
    lm_out, lm_caches = model.language_model(
        embeds, lm_caches, positions=lm_pos[:, None] + jnp.arange(W),
        mask=_window_mask(lm_pos, W, S_lm))

    type_text = model.tts_input_types.weight[1][None, None]
    S_tts = tts_caches[0].max_len
    tts_out, tts_caches = model.tts_language_model(
        lm_out + type_text, tts_caches,
        positions=tts_pos[:, None] + jnp.arange(W),
        mask=_window_mask(tts_pos, W, S_tts))
    neg_out, neg_caches = model.tts_language_model(
        jnp.zeros_like(lm_out) + type_text, neg_caches,
        positions=tts_pos[:, None] + jnp.arange(W),
        mask=_window_mask(tts_pos, W, S_tts))

    last = jnp.maximum(text_w - 1, 0)
    pick = lambda h: jnp.take_along_axis(  # noqa: E731
        h, last[:, None, None], axis=1)[:, 0]
    pos_h = jnp.where(has_text[:, None], pick(tts_out).astype(pos_h.dtype),
                      pos_h)
    neg_h = jnp.where(has_text[:, None], pick(neg_out).astype(neg_h.dtype),
                      neg_h)
    lm_pos = lm_pos + text_w
    tts_pos = tts_pos + text_w

    # ---- speech window (reference vibevoice.py:646-696, batched) ----
    latent_dim = model.config.acoustic_vae_dim
    type_speech = model.tts_input_types.weight[0][None, None]
    out = jnp.zeros((B, TTS_SPEECH_WINDOW_SIZE, latent_dim), jnp.float32)
    counts = jnp.zeros((B,), jnp.int32)
    eos = jnp.zeros((B,), bool)

    def body(i, state):
        tts_caches, neg_caches, pos_h, neg_h, out, counts, eos, keys, \
            tts_pos = state
        active = ~eos & (counts < speech_budget)
        split = jax.vmap(jax.random.split)(keys)
        sub, keys = split[:, 0], split[:, 1]
        latent = _sample_latent_rows(model, pos_h, neg_h, sub, ddpm_steps,
                                     cfg_scales)  # (B, L)
        out = jax.lax.dynamic_update_slice(
            out, jnp.where(active[:, None], latent, 0.0)[:, None], (0, i, 0))

        acoustic = model.acoustic_connector(latent[:, None])  # (B, 1, D)
        tts_caches = [c.replace(pos=tts_pos) for c in tts_caches]
        neg_caches = [c.replace(pos=tts_pos) for c in neg_caches]
        amask = _window_mask(tts_pos, 1, S_tts)
        tts_out, tts_caches = model.tts_language_model(
            acoustic + type_speech, tts_caches,
            positions=tts_pos[:, None], mask=amask)
        neg_out, neg_caches = model.tts_language_model(
            acoustic + type_speech, neg_caches,
            positions=tts_pos[:, None], mask=amask)
        pos_h = jnp.where(active[:, None],
                          tts_out[:, -1].astype(pos_h.dtype), pos_h)
        neg_h = jnp.where(active[:, None],
                          neg_out[:, -1].astype(neg_h.dtype), neg_h)
        step_eos = jax.nn.sigmoid(
            model.tts_eos_classifier(tts_out[:, -1])[:, 0]) > 0.5
        eos = eos | (active & step_eos)
        counts = counts + active.astype(jnp.int32)
        tts_pos = jnp.where(active, tts_pos + 1, tts_pos)
        return (tts_caches, neg_caches, pos_h, neg_h, out, counts, eos,
                keys, tts_pos)

    (tts_caches, neg_caches, pos_h, neg_h, out, counts, eos, keys,
     tts_pos) = jax.lax.fori_loop(
        0, TTS_SPEECH_WINDOW_SIZE, body,
        (tts_caches, neg_caches, pos_h, neg_h, out, counts, eos, keys,
         tts_pos))
    return (out, counts, eos, lm_caches, tts_caches, neg_caches, pos_h,
            neg_h, lm_pos, tts_pos, keys)


@partial(jax.jit, donate_argnames=("slot_caches",), static_argnames=("slot",))
def _install_kv(slot_caches: List[SlotKVCache], kvs, slot: int, true_len):
    """Copy padded (1, H, P, D) voice K/V pairs into `slot`."""
    out = []
    for sc, (k, v) in zip(slot_caches, kvs):
        P = k.shape[2]
        nk = sc.k.at[slot, :, :P].set(k[0].astype(sc.k.dtype))
        nv = sc.v.at[slot, :, :P].set(v[0].astype(sc.v.dtype))
        out.append(sc.replace(k=nk, v=nv,
                              pos=sc.pos.at[slot].set(true_len)))
    return out


@partial(jax.jit, donate_argnames=("slot_caches",), static_argnames=("slot",))
def _clear_slot(slot_caches: List[SlotKVCache], slot: int):
    return [sc.replace(pos=sc.pos.at[slot].set(0)) for sc in slot_caches]


@partial(jax.jit, donate_argnames=("buf",), static_argnames=("slot",))
def _set_row(buf, slot: int, row):
    return buf.at[slot].set(row.astype(buf.dtype))


@dataclass
class _Request:
    text_ids: np.ndarray  # (1, T) int32
    max_tokens: int
    cfg_scale: float
    seed: int
    voice: Optional[dict] = None
    future: Future = field(default_factory=Future)
    latents: list = field(default_factory=list)  # (n_i, L) chunks
    steps: int = 0
    text_pos: int = 0
    on_frame: object = None  # streaming sink, one (n_i, L) chunk per call


class VibeVoiceBatcher(FrameBatcherBase):
    """Slot-based continuous batching over a VibeVoice `Model`. `submit`
    resolves to the latent stack (N, latent_dim) np.float32; VAE decode
    stays on the caller's thread."""

    def __init__(self, model: Model, slots: int = 2, max_len: int = 2048,
                 lm_max_len: int = 1024, ddpm_steps: Optional[int] = None):
        self._owner = model
        self.model = model
        self.max_len = max_len
        self.lm_max_len = lm_max_len
        self.ddpm_steps = int(ddpm_steps or model.ddpm_inference_steps)
        self._build_device_state(slots)
        self.lm_pos = np.zeros(slots, np.int32)
        self.tts_pos = np.zeros(slots, np.int32)
        self.keys = np.zeros((slots, 2), np.uint32)
        self.cfg_scales = np.ones(slots, np.float32)
        # a round is already text window + up to 6 latents ≈ 6 frames
        super().__init__(slots=slots, tick_frames=1)

    def _build_device_state(self, slots):
        m = self.model
        mk = lambda stack, L: [  # noqa: E731
            SlotKVCache(slots, stack.config.num_key_value_heads, L,
                        stack.config.head_dim, jnp.float32)
            for _ in range(stack.config.num_hidden_layers)]
        self.lm_caches = mk(m.language_model, self.lm_max_len)
        self.tts_caches = mk(m.tts_language_model, self.max_len)
        self.neg_caches = mk(m.tts_language_model, self.max_len)
        D = m.language_model.config.hidden_size
        self.pos_h = jnp.zeros((slots, D), jnp.float32)
        self.neg_h = jnp.zeros((slots, D), jnp.float32)

    # ------------------------------------------------------------------

    def submit(self, text_ids, max_tokens: int = 512,
               cfg_scale: float = 1.5, voice: Optional[dict] = None,
               seed: int = 0, on_frame=None) -> Future:
        req = _Request(
            text_ids=np.asarray(text_ids, np.int32).reshape(1, -1),
            max_tokens=int(max_tokens), cfg_scale=float(cfg_scale),
            voice=voice, seed=int(seed), on_frame=on_frame)
        return self.submit_request(req)

    # -- FrameBatcherBase hooks ---------------------------------------

    @staticmethod
    def _pad_kvs(kvs, P):
        out = []
        for k, v in kvs:
            pk = np.zeros((1,) + k.shape[1:2] + (P,) + k.shape[3:],
                          np.float32)
            pv = np.zeros_like(pk)
            pk[:, :, : k.shape[2]] = k
            pv[:, :, : v.shape[2]] = v
            out.append((jnp.asarray(pk), jnp.asarray(pv)))
        return out

    def _admit(self, req: _Request, slot: int) -> None:
        voice = req.voice
        seq = req.text_ids.shape[1]
        need = (voice["tts_kv"][0][0].shape[2] if voice else 0) + seq \
            + req.max_tokens
        if need >= self.max_len:
            raise ValueError(
                f"voice+text+budget {need} >= capacity {self.max_len}")
        if voice:
            vl = voice["lm_kv"][0][0].shape[2]
            tl = voice["tts_kv"][0][0].shape[2]
            self.lm_caches = _install_kv(
                self.lm_caches,
                self._pad_kvs(voice["lm_kv"], min(_bucket(vl),
                                                  self.lm_max_len)),
                slot, jnp.asarray(vl, jnp.int32))
            self.tts_caches = _install_kv(
                self.tts_caches,
                self._pad_kvs(voice["tts_kv"], min(_bucket(tl),
                                                   self.max_len)),
                slot, jnp.asarray(tl, jnp.int32))
            self.neg_caches = _install_kv(
                self.neg_caches,
                self._pad_kvs(voice["neg_kv"], min(_bucket(tl),
                                                   self.max_len)),
                slot, jnp.asarray(tl, jnp.int32))
            self.pos_h = _set_row(
                self.pos_h, slot,
                jnp.asarray(voice["tts_hidden"])[0, -1])
            self.neg_h = _set_row(
                self.neg_h, slot,
                jnp.asarray(voice["neg_hidden"])[0, -1])
            self.lm_pos[slot] = vl
            self.tts_pos[slot] = tl
        else:
            self.lm_caches = _clear_slot(self.lm_caches, slot)
            self.tts_caches = _clear_slot(self.tts_caches, slot)
            self.neg_caches = _clear_slot(self.neg_caches, slot)
            self.pos_h = _set_row(
                self.pos_h, slot, jnp.zeros_like(self.pos_h[slot]))
            self.neg_h = _set_row(
                self.neg_h, slot, jnp.zeros_like(self.neg_h[slot]))
            self.lm_pos[slot] = 0
            self.tts_pos[slot] = 0
        self.keys[slot] = np.asarray(jax.random.PRNGKey(req.seed), np.uint32)
        self.cfg_scales[slot] = req.cfg_scale
        req.steps = 0
        req.text_pos = 0

    def _tick(self, n: int) -> None:
        S = self.slots
        W = TTS_TEXT_WINDOW_SIZE
        text = np.zeros((S, W), np.int32)
        widths = np.zeros((S,), np.int32)
        budget = np.zeros((S,), np.int32)
        for slot, req in enumerate(self.active):
            if req is None:
                continue
            left = req.text_ids.shape[1] - req.text_pos
            w = min(W, max(left, 0))
            if w:
                text[slot, :w] = req.text_ids[0,
                                              req.text_pos: req.text_pos + w]
            widths[slot] = w
            budget[slot] = min(TTS_SPEECH_WINDOW_SIZE,
                               req.max_tokens - req.steps)

        (out, counts, eos, self.lm_caches, self.tts_caches,
         self.neg_caches, self.pos_h, self.neg_h, lm_pos, tts_pos,
         keys) = _round(
            self.model, self.lm_caches, self.tts_caches, self.neg_caches,
            self.pos_h, self.neg_h, jnp.asarray(text), jnp.asarray(widths),
            jnp.asarray(self.lm_pos), jnp.asarray(self.tts_pos),
            jnp.asarray(self.keys), jnp.asarray(self.cfg_scales),
            jnp.asarray(budget), ddpm_steps=self.ddpm_steps)
        out = np.asarray(jax.device_get(out))
        counts = np.asarray(jax.device_get(counts))
        eos = np.asarray(jax.device_get(eos))
        self.lm_pos = np.array(jax.device_get(lm_pos))
        self.tts_pos = np.array(jax.device_get(tts_pos))
        self.keys = np.array(jax.device_get(keys))
        self.steps += 1  # before _finish: future observers see the count
        for slot, req in enumerate(self.active):
            if req is None:
                continue
            req.text_pos = min(req.text_pos + int(widths[slot]),
                               req.text_ids.shape[1])
            cnt = int(counts[slot])
            if cnt:
                chunk = out[slot, :cnt]
                req.latents.append(chunk)
                req.steps += cnt
                self._emit(req, chunk)
            finished = bool(eos[slot]) or (
                req.text_pos >= req.text_ids.shape[1] and cnt == 0) or \
                req.steps >= req.max_tokens
            if finished:
                self._finish_slot(slot)

    def _finish_slot(self, slot: int) -> None:
        req = self.active[slot]
        latent_dim = self.model.config.acoustic_vae_dim
        result = (np.concatenate(req.latents, axis=0)
                  if req.latents else np.zeros((0, latent_dim), np.float32))
        self._finish(slot, result)

    def _fail_all(self, e: Exception) -> None:
        for slot, req in enumerate(self.active):
            if req is not None and not req.future.done():
                req.future.set_exception(e)
            self.active[slot] = None
        self._build_device_state(self.slots)

    # -- pipeline integration -----------------------------------------

    def warmup(self):
        """Pre-compile install + round for every slot with one concurrent
        wave of tiny requests."""
        reqs = [
            _Request(text_ids=np.zeros((1, 3), np.int32),
                     max_tokens=TTS_SPEECH_WINDOW_SIZE, cfg_scale=1.5,
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
