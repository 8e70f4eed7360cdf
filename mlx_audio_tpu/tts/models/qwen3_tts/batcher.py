"""Continuous (slot-based) batching for Qwen3-TTS frame generation.

NEW relative to the reference (one request at a time; reference
server.py:74-94 serializes, qwen3_tts.py:869-1010 is a per-request python
loop): a pool of B talker-cache slots advances in lock-step, one fused
device dispatch per `tick_frames` frames. Each frame step batches the
talker step, special-token suppression, per-slot repetition penalty and
sampling, and the (K-1)-step code-predictor inner loop across ALL live
requests.

Differences from the single-request `_generate_chunk` path
(qwen3_tts.py:88): slot caches are COMPACT — the bucketed prefill is
installed as a contiguous prefix and decode continues right after it, so
the attention mask is simply `k <= pos[b]` per row (no bucket hole), and
all sampler parameters are per-row dynamic arrays
(`lm.continuous._sample_rows_core`), so one executable serves any request
mix and a request's frames depend only on its own seed.
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

__all__ = ["Qwen3TTSBatcher"]

REP_HIST = 64  # matches the single-request path's fixed (1, 64) window


@partial(jax.jit, donate_argnames=("caches",))
def _prefill_b1(talker, caches, input_embeds, length):
    """Bucketed B=1 prompt prefill; returns (logits (V,), hidden (D,),
    caches)."""
    Tp = input_embeds.shape[1]
    S = caches[0].max_len
    q = jnp.arange(Tp)[:, None]
    k = jnp.arange(S)[None, :]
    ok = (k <= q) & (k < length)
    mask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
    logits, hidden, caches = talker(input_embeds, caches, mask)
    last = jnp.clip(length - 1, 0, Tp - 1)
    return logits[0, last].astype(jnp.float32), hidden[0, last], caches


@partial(jax.jit, donate_argnames=("buf",), static_argnames=("slot",))
def _set_row(buf, slot: int, row):
    return buf.at[slot].set(row.astype(buf.dtype))


@partial(jax.jit, donate_argnames=("caches",), static_argnames=("n",))
def _tick_n(talker, caches: List[SlotKVCache], pos, logits, hidden, keys,
            hist, trailing, trailing_len, tr_idx, steps, min_toks,
            temps, top_ps, top_ks, rep_pens, tts_pad, n: int):
    """`n` lock-step frame steps for all slots fused into ONE dispatch.

    Returns (c0s (B, n), codes (B, n, K), caches, pos, logits, hidden,
    keys, hist). A row whose sampled c0 == EOS keeps producing garbage
    frames for the rest of the tick; the host truncates at the first EOS.
    """
    cfg = talker.config
    K = cfg.num_code_groups
    eos = cfg.codec_eos_token_id
    V = cfg.vocab_size
    B = pos.shape[0]

    # suppress the specials block at the top of the vocab, except EOS
    # (reference qwen3_tts.py:855-858; tiny-config fallback as in
    # qwen3_tts._generate_chunk)
    specials_lo = V - 1024
    if specials_lo <= 0:
        specials_lo = min(
            eos, cfg.codec_think_id, cfg.codec_nothink_id,
            cfg.codec_think_bos_id, cfg.codec_think_eos_id,
            cfg.codec_pad_id, cfg.codec_bos_id,
        )
    vocab_idx = jnp.arange(V)
    suppress = (vocab_idx >= specials_lo) & (vocab_idx != eos)

    E_codes = jnp.stack(
        [e.weight for e in talker.code_predictor.codec_embedding])
    W_heads = jnp.stack([h.weight for h in talker.code_predictor.lm_head])

    ones = jnp.ones((B,), jnp.float32)
    no_pen = jnp.ones((B,), jnp.float32)
    no_win = jnp.zeros((B,), jnp.int32)
    full_win = jnp.full((B,), REP_HIST, jnp.int32)
    dummy_hist = jnp.full((B, 1), -1, jnp.int32)

    def frame_codes(hidden_last, c0, keys):
        """(K-1)-step code-predictor inner AR, batched across slots."""
        cp = talker.code_predictor
        dec_caches = cp.model.make_caches(B, K + 2)
        c0_embed = talker.model.codec_embedding.weight[c0]  # (B, D)
        seq = jnp.stack([hidden_last, c0_embed], axis=1)  # (B, 2, D)
        h, dec_caches = cp.model(cp.project(seq), dec_caches)
        codes = jnp.zeros((B, K), jnp.int32).at[:, 0].set(c0)
        emb_sum = c0_embed

        def body(i, state):
            h_last, dec_caches, codes, emb_sum, keys = state
            logits_i = jnp.einsum(
                "bd,vd->bv", h_last,
                jax.lax.dynamic_index_in_dim(W_heads, i - 1, 0, False),
                preferred_element_type=jnp.float32,
            )
            ci, keys = _sample_rows_core(
                logits_i, keys, dummy_hist, temps, top_ps, top_ks,
                no_pen, no_win)
            codes = jax.lax.dynamic_update_slice(codes, ci[:, None], (0, i))
            emb_i = jax.lax.dynamic_index_in_dim(
                E_codes, i - 1, 0, False)[ci]  # (B, D)
            emb_sum = emb_sum + emb_i
            h, dec_caches = cp.model(cp.project(emb_i[:, None]), dec_caches)
            return h[:, -1], dec_caches, codes, emb_sum, keys

        st = (h[:, -1], dec_caches, codes, emb_sum, keys)
        _, _, codes, emb_sum, keys = jax.lax.fori_loop(1, K, body, st)
        return codes, emb_sum, keys

    def body(carry, _):
        caches, pos, logits, hidden, keys, tr_idx, hist, steps = carry
        lg = jnp.where(suppress[None, :], -jnp.inf, logits)
        # per-row min-length: EOS unreachable before min_toks[b] frames
        lg = jnp.where(
            (steps[:, None] < min_toks[:, None]) & (vocab_idx == eos)[None],
            -jnp.inf, lg)
        c0, keys = _sample_rows_core(
            lg, keys, hist, temps, top_ps, top_ks, rep_pens, full_win)
        codes, emb_sum, keys = frame_codes(hidden, c0, keys)
        hist = jnp.concatenate([hist[:, 1:], c0[:, None]], axis=1)

        # next-frame input: trailing text (or tts_pad) + Σ codec embeddings
        Ttr = trailing.shape[1]
        t_idx = jnp.clip(tr_idx, 0, Ttr - 1)
        text_embed = jnp.take_along_axis(
            trailing, t_idx[:, None, None], axis=1)[:, 0]  # (B, D)
        text_embed = jnp.where(
            (tr_idx < trailing_len)[:, None], text_embed, tts_pad[None, :])
        next_embed = (text_embed + emb_sum)[:, None]  # (B, 1, D)

        caches = [c.replace(pos=pos) for c in caches]
        S = caches[0].max_len
        amask = jnp.where(
            jnp.arange(S)[None, :] <= pos[:, None], 0.0, -jnp.inf
        )[:, None, None, :]
        new_logits, new_hidden, caches = talker(
            next_embed.astype(trailing.dtype), caches, mask=amask,
            positions=pos[:, None])
        return (
            caches, pos + 1, new_logits[:, -1].astype(jnp.float32),
            # keep the carry dtype stable under bf16 weights (layer norms
            # may emit f32)
            new_hidden[:, -1].astype(hidden.dtype), keys, tr_idx + 1,
            hist, steps + 1,
        ), (c0, codes)

    carry = (caches, pos, logits, hidden, keys, tr_idx, hist, steps)
    (caches, pos, logits, hidden, keys, tr_idx, hist, steps), (c0s, codes) \
        = jax.lax.scan(body, carry, None, length=n)
    return (jnp.swapaxes(c0s, 0, 1), jnp.swapaxes(codes, 0, 1),
            caches, pos, logits, hidden, keys, hist)


@dataclass
class _FrameRequest:
    input_embeds: object  # (1, T, D) prefill embeddings
    trailing: object  # (1, Ttr, D)
    max_tokens: int
    min_tokens: int
    temp: float
    top_k: int
    top_p: float
    rep_penalty: float
    seed: int
    future: Future = field(default_factory=Future)
    frames: list = field(default_factory=list)  # emitted (K,) rows
    on_frame: Optional[callable] = None  # streaming sink, one (K,) row/call


class Qwen3TTSBatcher(FrameBatcherBase):
    """Slot-based continuous batching over a Qwen3-TTS model. `submit`
    takes prepared prefill/trailing embeddings (host prep — tokenizer,
    speaker embedding — happens on the caller's thread) and resolves to
    the generated codec frames (n, K) np.int32; codec decode stays on the
    caller's thread."""

    def __init__(self, model, slots: int = 4, max_len: int = 4096,
                 tick_frames: int = 16, trailing_max: int = 512):
        self._owner = model
        self.talker = model.talker
        cfg = self.talker.config
        self.max_len = max_len
        self.trailing_max = trailing_max
        # model-constant tts_pad embedding (reference feeds it after the
        # trailing text runs out, qwen3_tts.py:189-197)
        self.tts_pad = model._text_embed(
            [model.config.tts_pad_token_id])[0, 0]
        self._dtype = self.talker.model.codec_embedding.weight.dtype
        self._build_device_state(slots)
        self.pos = np.full(slots, max_len - 1, np.int32)  # scratch index
        self.keys = np.zeros((slots, 2), np.uint32)
        self.hist = np.full((slots, REP_HIST), -1, np.int32)
        self.trailing_len = np.zeros(slots, np.int32)
        self.tr_idx = np.zeros(slots, np.int32)
        self.frame_steps = np.zeros(slots, np.int32)
        self.min_toks = np.zeros(slots, np.int32)
        self.temps = np.zeros(slots, np.float32)
        self.top_ps = np.ones(slots, np.float32)
        self.top_ks = np.zeros(slots, np.int32)
        self.rep_pens = np.ones(slots, np.float32)
        super().__init__(slots=slots, tick_frames=tick_frames)

    def _build_device_state(self, slots):
        cfg = self.talker.config
        self.caches = [
            SlotKVCache(slots, cfg.num_key_value_heads, self.max_len,
                        cfg.head_dim, jnp.float32)
            for _ in range(cfg.num_hidden_layers)
        ]
        self.logits = jnp.zeros((slots, cfg.vocab_size), jnp.float32)
        self.hidden = jnp.zeros((slots, cfg.hidden_size), self._dtype)
        self.trailing = jnp.zeros(
            (slots, self.trailing_max, cfg.hidden_size), self._dtype)

    def submit(self, input_embeds, trailing, *, max_tokens: int = 4096,
               min_tokens: int = 0, temperature: float = 0.9,
               top_k: int = 50, top_p: float = 1.0,
               repetition_penalty: float = 1.05, seed: int = 0,
               on_frame=None) -> Future:
        req = _FrameRequest(
            input_embeds=np.asarray(input_embeds),
            trailing=np.asarray(trailing),
            max_tokens=int(max_tokens), min_tokens=int(min_tokens),
            temp=float(temperature), top_k=int(top_k), top_p=float(top_p),
            rep_penalty=float(repetition_penalty), seed=int(seed),
            on_frame=on_frame,
        )
        return self.submit_request(req)

    # -- FrameBatcherBase hooks ---------------------------------------

    def _admit(self, req: _FrameRequest, slot: int) -> None:
        T = req.input_embeds.shape[1]
        if T >= self.max_len:
            raise ValueError(f"prompt length {T} >= capacity {self.max_len}")
        Ttr = req.trailing.shape[1]
        if Ttr > self.trailing_max:
            raise ValueError(
                f"trailing text length {Ttr} > batcher trailing_max "
                f"{self.trailing_max}")
        cfg = self.talker.config
        P = min(_bucket(T), self.max_len)
        D = req.input_embeds.shape[-1]
        inp = np.zeros((1, P, D), req.input_embeds.dtype)
        inp[:, :T] = req.input_embeds
        single = [
            KVCache(1, cfg.num_key_value_heads, P, cfg.head_dim,
                    dtype=jnp.float32)
            for _ in range(cfg.num_hidden_layers)
        ]
        l0, h0, single = _prefill_b1(
            self.talker, single, jnp.asarray(inp), jnp.asarray(T))
        self.caches = _install_slot(
            self.caches, single, slot, jnp.asarray(T, jnp.int32))
        self.logits = _set_row(self.logits, slot, l0)
        self.hidden = _set_row(self.hidden, slot, h0)
        # host-pad trailing to the static buffer width so the row install
        # compiles once (not once per trailing length)
        tr_pad = np.zeros((self.trailing_max, D), np.float32)
        tr_pad[:Ttr] = np.asarray(req.trailing[0], np.float32)
        self.trailing = _set_row(self.trailing, slot, jnp.asarray(tr_pad))
        self.pos[slot] = T
        self.keys[slot] = np.asarray(jax.random.PRNGKey(req.seed), np.uint32)
        self.hist[slot] = -1
        self.trailing_len[slot] = Ttr
        self.tr_idx[slot] = 0
        self.frame_steps[slot] = 0
        self.min_toks[slot] = req.min_tokens
        self.temps[slot] = req.temp
        self.top_ps[slot] = req.top_p
        self.top_ks[slot] = req.top_k
        self.rep_pens[slot] = req.rep_penalty

    def _tick(self, n: int) -> None:
        (c0s, codes, self.caches, _pos, self.logits, self.hidden, keys,
         hist) = _tick_n(
            self.talker, self.caches, jnp.asarray(self.pos),
            self.logits, self.hidden, jnp.asarray(self.keys),
            jnp.asarray(self.hist), self.trailing,
            jnp.asarray(self.trailing_len), jnp.asarray(self.tr_idx),
            jnp.asarray(self.frame_steps), jnp.asarray(self.min_toks),
            jnp.asarray(self.temps), jnp.asarray(self.top_ps),
            jnp.asarray(self.top_ks), jnp.asarray(self.rep_pens),
            self.tts_pad, n=n,
        )
        c0s_np = np.asarray(jax.device_get(c0s))  # (slots, n)
        codes_np = np.asarray(jax.device_get(codes))  # (slots, n, K)
        self.keys = np.array(jax.device_get(keys))
        self.hist = np.array(jax.device_get(hist))
        self.steps += 1  # before _finish: future observers see the count
        eos = self.talker.config.codec_eos_token_id
        for slot, req in enumerate(self.active):
            if req is None:
                continue
            for j in range(n):
                if int(c0s_np[slot, j]) == eos:  # EOS frame excluded
                    self._finish_slot(slot)
                    break
                req.frames.append(codes_np[slot, j])
                self._emit(req, codes_np[slot, j])
                self.pos[slot] += 1
                self.tr_idx[slot] += 1
                self.frame_steps[slot] += 1
                if (len(req.frames) >= req.max_tokens
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
        K = self.talker.config.num_code_groups
        result = (
            np.stack(req.frames).astype(np.int32)
            if req.frames else np.zeros((0, K), np.int32)
        )
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
        concurrent wave of tiny requests (see
        FrameBatcherBase.warmup_requests)."""
        emb, tr, _pad = self._owner._prepare_generation_inputs(
            "Warm up the batcher.")
        reqs = [
            _FrameRequest(
                input_embeds=np.asarray(emb), trailing=np.asarray(tr),
                max_tokens=self.tick_frames, min_tokens=self.tick_frames,
                temp=0.9, top_k=50, top_p=1.0, rep_penalty=1.05, seed=0,
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
