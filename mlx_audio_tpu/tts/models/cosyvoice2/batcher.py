"""Continuous (slot-based) batching for CosyVoice2/3 speech-token decode.

NEW relative to the reference (one request at a time; reference
server.py:74-94 serializes, llm/llm.py:125-596 is a per-request RAS
loop): a pool of B request slots decodes in lock-step, one fused device
dispatch per `tick_frames` tokens. Repetition-aware sampling
(reference llm.py:525-567), the EOS-below-min-length mask and the
fill-token rules all run per-row in-graph, so any mix of requests shares
one executable and a request's tokens depend only on its own seed.

One batcher serves both generations (`v3` flag):
- CosyVoice2 (llm.py `_lm_decode_loop`): stop on tok == V; fill tokens
  (V+1, V+2) are FED but not emitted and decode continues.
- CosyVoice3 (`_lm3_decode_loop`): stop on any tok >= V; every pre-stop
  token is emitted.
The host applies the same emit/stop rules when consuming tick output
(device-side history gating uses the identical rule, so they agree).
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
from ....lm.continuous import SlotKVCache, _bucket
from ....serving import FrameBatcherBase

__all__ = ["RASBatcher"]

WIN_SIZE = 10  # RAS history window (reference default)
TAU_R = 0.1
TOP_P = 0.8
TOP_K = 25


def _ras_sample_rows(logp, hist, keys):
    """Vectorized per-slot repetition-aware sampling (mirrors
    cosyvoice2.llm.ras_sample row-wise). Each row advances its own PRNG
    stream exactly once per call."""
    B, V = logp.shape
    probs = jax.nn.softmax(logp, axis=-1)
    order = jnp.argsort(-probs, axis=-1)
    sp = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(sp, axis=-1)
    nkeep = jnp.minimum(jnp.sum(cum < TOP_P, axis=-1) + 1, TOP_K)
    keep = jnp.arange(V)[None, :] < nkeep[:, None]
    gl = jnp.where(keep, jnp.log(jnp.maximum(sp, 1e-12)), -jnp.inf)

    split = jax.vmap(lambda k: jax.random.split(k, 3))(keys)  # (B, 3, 2)
    k1, k2, new_keys = split[:, 0], split[:, 1], split[:, 2]
    idx = jax.vmap(jax.random.categorical)(k1, gl)
    tok = jnp.take_along_axis(order, idx[:, None], axis=-1)[:, 0]
    rep = jnp.sum(hist == tok[:, None], axis=-1)
    resampled = jax.vmap(jax.random.categorical)(k2, logp)
    tok = jnp.where(rep >= WIN_SIZE * TAU_R, resampled, tok).astype(jnp.int32)
    return tok, new_keys


@partial(jax.jit, donate_argnames=("caches",))
def _prefill_b1(lm, caches, embeds, length):
    """Bucketed B=1 embedding-prompt prefill; returns (logits (V,),
    caches). Right padding is hole-masked like the single-request loop."""
    Tp = embeds.shape[1]
    S = caches[0].max_len
    q = jnp.arange(Tp)[:, None]
    k = jnp.arange(S)[None, :]
    ok = (k <= q) & (k < length)
    mask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
    h, caches = lm.llm.hidden_states(embeds, caches, mask=mask)
    last = jnp.clip(length - 1, 0, Tp - 1)
    return lm.llm_decoder(h[:, last])[0].astype(jnp.float32), caches


@partial(jax.jit, donate_argnames=("slot_caches",), static_argnames=("slot",))
def _install_slot(slot_caches: List[SlotKVCache], single_caches, slot: int,
                  true_len):
    out = []
    for sc, c1 in zip(slot_caches, single_caches):
        P = c1.k.shape[2]
        nk = sc.k.at[slot, :, :P].set(c1.k[0].astype(sc.k.dtype))
        nv = sc.v.at[slot, :, :P].set(c1.v[0].astype(sc.v.dtype))
        npos = sc.pos.at[slot].set(true_len)
        out.append(sc.replace(k=nk, v=nv, pos=npos))
    return out


@partial(jax.jit, donate_argnames=("caches",),
         static_argnames=("n", "eos"))
def _ras_tick_n(lm, caches: List[SlotKVCache], logits, pos, steps, keys,
                hist, min_lens, n: int, eos: int):
    """`n` lock-step RAS decode steps for all slots fused into ONE
    dispatch. `logits` (B, V) carries each slot's next-token logits
    across ticks (the RAS loop samples from the PREVIOUS step's logits,
    so the carry mirrors the single-request loop exactly).

    Returns (tokens_out (B, n), logits, new_keys, hist, caches)."""

    def body(carry, _):
        caches, logits, pos, steps, keys, hist = carry
        logp = jax.nn.log_softmax(logits, axis=-1)
        V = logp.shape[-1]
        logp = jnp.where(
            (jnp.arange(V)[None, :] == eos)
            & (steps < min_lens)[:, None],
            -jnp.inf, logp)
        tok, keys = _ras_sample_rows(logp, hist, keys)
        # history tracks only emitted speech tokens (< eos) — identical
        # rule for both generations (fills/stops are never appended)
        emit = tok < eos
        hist = jnp.where(
            emit[:, None],
            jnp.concatenate([hist[:, 1:], tok[:, None]], axis=1), hist)

        next_embed = lm.speech_embedding.weight[tok][:, None, :]
        caches = [c.replace(pos=pos) for c in caches]
        S = caches[0].max_len
        mask = jnp.where(
            jnp.arange(S)[None, :] <= pos[:, None], 0.0, -jnp.inf
        ).astype(jnp.float32)[:, None, None, :]
        h, caches = lm.llm.hidden_states(next_embed, caches, mask=mask,
                                         positions=pos[:, None])
        logits = lm.llm_decoder(h[:, -1]).astype(jnp.float32)
        return (caches, logits, pos + 1, steps + 1, keys, hist), tok

    (caches, logits, _, _, keys, hist), toks = jax.lax.scan(
        body, (caches, logits, pos, steps, keys, hist), None, length=n)
    return jnp.swapaxes(toks, 0, 1), logits, keys, hist, caches


@dataclass
class _RASRequest:
    embeds: np.ndarray  # (1, T0, D) [sos|text|task|prompt_speech] prefill
    min_tokens: int
    max_steps: int  # hard cap on decode STEPS (text_len * max ratio)
    seed: int
    future: Future = field(default_factory=Future)
    tokens: list = field(default_factory=list)  # emitted speech tokens
    on_frame: object = None  # streaming sink, one speech token per call


class RASBatcher(FrameBatcherBase):
    """Slot-based continuous batching over a CosyVoice2/3 LM. `submit`
    takes the prepared (1, T0, D) prompt embeddings (host prep —
    tokenizer, speaker prompt splice — on the caller's thread) and
    resolves to the emitted speech tokens (T,) np.int32 (EOS excluded);
    flow + vocoder stay on the caller's thread."""

    def __init__(self, model, lm=None, v3: bool = False, slots: int = 4,
                 max_len: int = 4096, tick_frames: int = 16, **_ignored):
        self._owner = model
        self.lm = lm if lm is not None else model.llm
        self.v3 = bool(v3)
        # CV2 stops on tok == V exactly; CV3 on any tok >= V. Both mask
        # index V during the min-length phase.
        self.eos = int(self.lm.speech_token_size)
        self.max_len = max_len
        self._n_vocab = (self.lm.llm_decoder.weight.shape[0])
        self._build_device_state(slots)
        self.pos = np.full(slots, max_len - 1, np.int32)
        self.steps_ctr = np.zeros(slots, np.int32)
        self.keys = np.zeros((slots, 2), np.uint32)
        self.hist = np.full((slots, WIN_SIZE), -1, np.int32)
        self.min_lens = np.zeros(slots, np.int32)
        super().__init__(slots=slots, tick_frames=tick_frames)

    def _build_device_state(self, slots):
        cfg = self.lm.llm.config
        self.caches = [
            SlotKVCache(slots, cfg.num_key_value_heads, self.max_len,
                        cfg.head_dim, jnp.float32)
            for _ in range(cfg.num_hidden_layers)
        ]
        self.logits = jnp.zeros((slots, self._n_vocab), jnp.float32)

    def submit(self, embeds, *, min_tokens: int = 0, max_steps: int = 2048,
               seed: int = 0, on_frame=None) -> Future:
        emb = np.asarray(embeds)
        if emb.ndim == 2:
            emb = emb[None]
        req = _RASRequest(
            embeds=emb, min_tokens=int(min_tokens),
            max_steps=int(max_steps), seed=int(seed), on_frame=on_frame,
        )
        return self.submit_request(req)

    # -- FrameBatcherBase hooks ---------------------------------------

    def _admit(self, req: _RASRequest, slot: int) -> None:
        T = req.embeds.shape[1]
        if T >= self.max_len:
            raise ValueError(f"prompt length {T} >= capacity {self.max_len}")
        cfg = self.lm.llm.config
        P = min(_bucket(T), self.max_len)
        inp = np.zeros((1, P, req.embeds.shape[-1]), np.float32)
        inp[:, :T] = np.asarray(req.embeds, np.float32)
        single = [
            KVCache(1, cfg.num_key_value_heads, P, cfg.head_dim,
                    dtype=jnp.float32)
            for _ in range(cfg.num_hidden_layers)
        ]
        l0, single = _prefill_b1(
            self.lm, single, jnp.asarray(inp), jnp.asarray(T))
        self.caches = _install_slot(
            self.caches, single, slot, jnp.asarray(T, jnp.int32))
        self.logits = self.logits.at[slot].set(l0)
        self.pos[slot] = T
        self.steps_ctr[slot] = 0
        self.keys[slot] = np.asarray(jax.random.PRNGKey(req.seed), np.uint32)
        self.hist[slot] = -1
        self.min_lens[slot] = req.min_tokens

    def _tick(self, n: int) -> None:
        toks, self.logits, keys, hist, self.caches = _ras_tick_n(
            self.lm, self.caches, self.logits, jnp.asarray(self.pos),
            jnp.asarray(self.steps_ctr), jnp.asarray(self.keys),
            jnp.asarray(self.hist), jnp.asarray(self.min_lens),
            n=n, eos=self.eos,
        )
        toks_np = np.asarray(jax.device_get(toks))  # (slots, n)
        self.keys = np.array(jax.device_get(keys))
        self.hist = np.array(jax.device_get(hist))
        self.steps += 1  # before _finish: future observers see the count
        for slot, req in enumerate(self.active):
            if req is None:
                continue
            for j in range(n):
                tok = int(toks_np[slot, j])
                stop = (tok >= self.eos) if self.v3 else (tok == self.eos)
                if stop:
                    self._finish_slot(slot)
                    break
                if tok < self.eos:  # CV2 fill tokens fed, not emitted
                    req.tokens.append(tok)
                    self._emit(req, tok)
                self.pos[slot] += 1
                self.steps_ctr[slot] += 1
                if (self.steps_ctr[slot] >= req.max_steps
                        or self.pos[slot] >= self.max_len - 1):
                    self._finish_slot(slot)
                    break

    def _finish_slot(self, slot: int) -> None:
        req = self.active[slot]
        self.pos[slot] = self.max_len - 1
        self.min_lens[slot] = 0
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
        """Pre-compile the smallest prefill bucket, every slot's install
        program and the fused tick with one concurrent wave of tiny
        zero-prompt requests."""
        D = int(self.lm.speech_embedding.weight.shape[-1])
        emb = np.zeros((1, 8, D), np.float32)
        reqs = [
            _RASRequest(embeds=emb, min_tokens=0,
                        max_steps=self.tick_frames + 1, seed=0)
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
