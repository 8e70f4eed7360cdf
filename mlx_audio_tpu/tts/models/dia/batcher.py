"""Continuous (slot-based) batching for Dia's CFG decode.

NEW relative to the reference (one request at a time; reference
tts/models/dia/dia.py:316 runs a per-request python loop with async_eval):
a pool of B request slots — each owning a CFG PAIR of decoder cache rows
(rows 2i/2i+1 = uncond/cond, mirroring `_generate_loop`'s 2-batch) plus
its own precomputed cross-attention K/V — advances in lock-step, one fused
dispatch per `tick_frames` frames. Per-step math (CFG combine, top-k
filter, delay-BOS forcing, EOS delay-cascade) mirrors `_generate_loop`
exactly, including the per-slot PRNG protocol (`split` once per step,
one `categorical` over the (C, V) channel block), so a batched request's
frames are bitwise-equal to running `_generate_loop` alone with the same
seed.

Text length is the config-static `data.text_length`, so cross K/V install
compiles once — no prompt bucketing needed.
"""

from __future__ import annotations

from concurrent.futures import Future
from dataclasses import dataclass, field
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ....lm.continuous import SlotKVCache
from ....serving import FrameBatcherBase
from .dia import _encode_text

__all__ = ["DiaBatcher"]


@partial(jax.jit, donate_argnames=("buf",), static_argnames=("slot",))
def _set_pair(buf, slot: int, pair):
    """Install a (2, ...) CFG pair into rows [2*slot, 2*slot+1]."""
    return jax.lax.dynamic_update_slice(
        buf, pair.astype(buf.dtype), (2 * slot,) + (0,) * (buf.ndim - 1))


@partial(
    jax.jit,
    static_argnames=("n", "top_k", "eos", "pad", "bos", "delay_pattern"),
    donate_argnames=("caches",),
)
def _dia_tick_n(model, caches: List[SlotKVCache], cross_ks, cross_vs,
                cross_mask, cur_tok, pos, gen_step, eos_step, keys,
                cfg_scales, temps, n: int, top_k: int, eos: int, pad: int,
                bos: int, delay_pattern: tuple):
    """`n` lock-step CFG frame steps for all slots fused into ONE dispatch.

    cur_tok (B, C); pos (2B,) per-row self-cache position; gen_step (B,)
    frames generated so far; eos_step (B,) step at which channel-0 EOS
    fired (-1 = not yet). Returns (preds (B, n, C), caches, cur_tok, pos,
    gen_step, eos_step, keys)."""
    C = len(delay_pattern)
    delay = jnp.asarray(delay_pattern)
    B = cur_tok.shape[0]

    def body(carry, _):
        caches, cur_tok, pos, gen_step, eos_step, keys = carry
        tok2 = jnp.repeat(cur_tok[:, None], 2, axis=0).reshape(2 * B, 1, C)
        caches = [c.replace(pos=pos) for c in caches]
        S = caches[0].max_len
        amask = jnp.where(
            jnp.arange(S)[None, :] <= pos[:, None], 0.0, -jnp.inf
        ).astype(jnp.float32)[:, None, None, :]
        logits, caches = model.decoder(
            tok2, pos[:, None], caches, list(zip(cross_ks, cross_vs)),
            self_mask=amask, cross_mask=cross_mask,
        )
        last = logits[:, -1].reshape(B, 2, C, -1)  # (B, 2, C, V)
        cfg = last[:, 1] + cfg_scales[:, None, None] * (
            last[:, 1] - last[:, 0])  # (B, C, V)
        cfg = cfg.at[:, :, eos + 1:].set(-jnp.inf)

        # mirror _generate_loop's `key, sub = jax.random.split(key)`
        # EXACTLY (new key = split[0], sub = split[1]) so a batched
        # request's stream is bitwise-equal to running alone
        split = jax.vmap(jax.random.split)(keys)  # (B, 2, 2)
        keys, subs = split[:, 0], split[:, 1]
        greedy = jnp.argmax(cfg, axis=-1).astype(jnp.int32)
        x = cfg / jnp.maximum(temps, 1e-6)[:, None, None]
        if top_k > 0:
            from ....lm.sample import top_k_filter

            x = top_k_filter(x, top_k)
        sampled = jax.vmap(
            lambda k, z: jax.random.categorical(k, z, axis=-1)
        )(subs, x).astype(jnp.int32)
        pred = jnp.where((temps == 0.0)[:, None], greedy, sampled)

        # channels still inside their delay emit BOS (per-slot gen index)
        pred = jnp.where(gen_step[:, None] >= delay[None, :], pred, bos)
        # EOS cascade (per slot)
        new_eos = (eos_step < 0) & (pred[:, 0] == eos)
        eos_step = jnp.where(new_eos, gen_step, eos_step)
        after = gen_step[:, None] - eos_step[:, None]
        in_cascade = (eos_step >= 0)[:, None]
        pred = jnp.where(in_cascade & (after == delay[None, :]), eos, pred)
        pred = jnp.where(in_cascade & (after > delay[None, :]), pad, pred)

        carry = (caches, pred, pos + 1, gen_step + 1, eos_step, keys)
        return carry, pred

    carry = (caches, cur_tok, pos, gen_step, eos_step, keys)
    (caches, cur_tok, pos, gen_step, eos_step, keys), preds = jax.lax.scan(
        body, carry, None, length=n)
    return (jnp.swapaxes(preds, 0, 1), caches, cur_tok, pos, gen_step,
            eos_step, keys)


@dataclass
class _DiaRequest:
    src: np.ndarray  # (S,) padded byte tokens
    src_mask: np.ndarray  # (S,) bool
    max_tokens: int
    cfg_scale: float
    temp: float
    seed: int
    future: Future = field(default_factory=Future)
    frames: list = field(default_factory=list)  # emitted (C,) rows
    on_frame: object = None  # streaming sink, one (C,) row per call


class DiaBatcher(FrameBatcherBase):
    """Slot-based continuous batching over a Dia model. `submit` takes the
    prepared padded byte tokens + mask (host prep — `Model._prepare_text`
    — on the caller's thread) and resolves to the generated delay-pattern
    frames (n, C) np.int32 INCLUDING the EOS cascade rows (exactly
    `_generate_loop`'s `buf[1:n+1]`); DAC decode stays on the caller's
    thread.

    `cfg_filter_top_k` is a static compile parameter of the fused tick —
    one value per batcher (the server default 35); requests wanting a
    different value fall back to the single-request path.
    """

    def __init__(self, model, slots: int = 4, tick_frames: int = 8,
                 max_tokens_cap: int = None, cfg_filter_top_k: int = 35,
                 **_ignored):
        self._owner = model
        self.model = model.model  # DiaModel
        self.config = model.config
        data = self.config.data
        dec = self.config.model.decoder
        self.top_k = int(cfg_filter_top_k)
        self.C = data.channels
        self.delay = tuple(data.delay_pattern)
        self.max_delay = max(self.delay)
        self.eos = int(data.audio_eos_value)
        self.pad = int(data.audio_pad_value)
        self.bos = int(data.audio_bos_value)
        self.S_text = data.text_length
        self.kv_len = ((max_tokens_cap or data.audio_length)
                       + self.max_delay + 64)
        self._build_device_state(slots)
        self.pos = np.full(2 * slots, self.kv_len - 1, np.int32)  # scratch
        self.gen_step = np.zeros(slots, np.int32)
        self.eos_step = np.full(slots, -1, np.int32)
        self.keys = np.zeros((slots, 2), np.uint32)
        self.cur_tok = np.zeros((slots, self.C), np.int32)
        self.cfg_scales = np.zeros(slots, np.float32)
        self.temps = np.zeros(slots, np.float32)
        self.max_toks = np.zeros(slots, np.int32)
        super().__init__(slots=slots, tick_frames=tick_frames)

    def _build_device_state(self, slots):
        dec = self.config.model.decoder
        enc = self.config.model.encoder
        self.caches = [
            SlotKVCache(2 * slots, dec.kv_heads, self.kv_len,
                        dec.gqa_head_dim, jnp.float32)
            for _ in range(dec.n_layer)
        ]
        self.cross_ks = [
            jnp.zeros((2 * slots, dec.cross_query_heads, self.S_text,
                       dec.cross_head_dim), jnp.float32)
            for _ in range(dec.n_layer)
        ]
        self.cross_vs = [jnp.zeros_like(k) for k in self.cross_ks]
        self.cross_mask = jnp.full(
            (2 * slots, 1, 1, self.S_text), -jnp.inf, jnp.float32)

    def submit(self, src, src_mask, *, max_tokens: int = None,
               cfg_scale: float = 3.0, temperature: float = 1.3,
               seed: int = 0, on_frame=None) -> Future:
        data = self.config.data
        max_tokens = min(int(max_tokens or data.audio_length),
                         self.kv_len - self.max_delay - 64)
        req = _DiaRequest(
            src=np.asarray(src, np.int32).reshape(-1),
            src_mask=np.asarray(src_mask, bool).reshape(-1),
            max_tokens=max_tokens, cfg_scale=float(cfg_scale),
            temp=float(temperature), seed=int(seed), on_frame=on_frame,
        )
        return self.submit_request(req)

    # -- FrameBatcherBase hooks ---------------------------------------

    def _admit(self, req: _DiaRequest, slot: int) -> None:
        if req.src.shape[0] != self.S_text:
            raise ValueError(
                f"src length {req.src.shape[0]} != config text_length "
                f"{self.S_text}")
        src2 = jnp.asarray(np.stack([np.zeros_like(req.src), req.src]))
        pos = jnp.broadcast_to(jnp.arange(self.S_text)[None],
                               (2, self.S_text))
        pmask = np.stack([np.zeros_like(req.src_mask), req.src_mask])
        enc_mask = (pmask[:, :, None] == pmask[:, None, :])[:, None]
        enc_mask = jnp.where(jnp.asarray(enc_mask), 0.0,
                             -jnp.inf).astype(jnp.float32)
        _enc_out, cross_kvs = _encode_text(self.model, src2, pos, enc_mask)
        for i, (k, v) in enumerate(cross_kvs):
            self.cross_ks[i] = _set_pair(self.cross_ks[i], slot, k)
            self.cross_vs[i] = _set_pair(self.cross_vs[i], slot, v)
        cmask = jnp.where(jnp.asarray(pmask)[:, None, None, :], 0.0,
                          -jnp.inf).astype(jnp.float32)
        self.cross_mask = _set_pair(self.cross_mask, slot, cmask)
        self.pos[2 * slot:2 * slot + 2] = 0
        self.gen_step[slot] = 0
        self.eos_step[slot] = -1
        self.keys[slot] = np.asarray(jax.random.PRNGKey(req.seed), np.uint32)
        self.cur_tok[slot] = self.bos
        self.cfg_scales[slot] = req.cfg_scale
        self.temps[slot] = req.temp
        self.max_toks[slot] = req.max_tokens

    def _tick(self, n: int) -> None:
        (preds, self.caches, cur_tok, _pos, _gen, _eos, keys) = _dia_tick_n(
            self.model, self.caches, self.cross_ks, self.cross_vs,
            self.cross_mask, jnp.asarray(self.cur_tok),
            jnp.asarray(self.pos), jnp.asarray(self.gen_step),
            jnp.asarray(self.eos_step), jnp.asarray(self.keys),
            jnp.asarray(self.cfg_scales), jnp.asarray(self.temps),
            n=n, top_k=self.top_k, eos=self.eos, pad=self.pad,
            bos=self.bos, delay_pattern=self.delay,
        )
        preds_np = np.asarray(jax.device_get(preds))  # (slots, n, C)
        self.keys = np.array(jax.device_get(keys))
        self.steps += 1  # before _finish: future observers see the count
        for slot, req in enumerate(self.active):
            if req is None:
                continue
            for j in range(n):
                row = preds_np[slot, j]
                s = int(self.gen_step[slot])  # 0-based index of this frame
                req.frames.append(row)
                self._emit(req, row)
                self.cur_tok[slot] = row
                self.pos[2 * slot:2 * slot + 2] += 1
                self.gen_step[slot] += 1
                if self.eos_step[slot] < 0 and int(row[0]) == self.eos:
                    self.eos_step[slot] = s
                # _generate_loop's cond: the last cascade row is step
                # eos_step + max_delay; max_tokens bounds total frames
                if ((self.eos_step[slot] >= 0
                     and s - int(self.eos_step[slot]) >= self.max_delay)
                        or self.gen_step[slot] >= req.max_tokens
                        or self.pos[2 * slot] >= self.kv_len - 1):
                    self._finish_slot(slot)
                    break

    def _finish_slot(self, slot: int) -> None:
        req = self.active[slot]
        self.pos[2 * slot:2 * slot + 2] = self.kv_len - 1
        self.temps[slot] = 0.0
        self.cfg_scales[slot] = 0.0
        self.eos_step[slot] = -1
        self.gen_step[slot] = 0
        result = (np.stack(req.frames).astype(np.int32)
                  if req and req.frames
                  else np.zeros((0, self.C), np.int32))
        self._finish(slot, result)

    def _fail_all(self, e: Exception) -> None:
        for slot, req in enumerate(self.active):
            if req is not None and not req.future.done():
                req.future.set_exception(e)
            self.active[slot] = None
            self.pos[2 * slot:2 * slot + 2] = self.kv_len - 1
        self._build_device_state(self.slots)

    # -- pipeline integration -----------------------------------------

    def warmup(self):
        """Pre-compile encode/install/tick for every slot with one
        concurrent wave of tiny requests."""
        src = np.zeros(self.S_text, np.int32)
        src[:8] = np.arange(3, 11)
        mask = src != 0
        reqs = [
            _DiaRequest(src=src, src_mask=mask,
                        max_tokens=self.tick_frames, cfg_scale=3.0,
                        temp=1.3, seed=0)
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
