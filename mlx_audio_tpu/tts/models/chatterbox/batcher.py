"""Continuous (slot-based) batching for Chatterbox T3 speech-token decode.

NEW relative to the reference (one request at a time; reference
server.py:74-94 serializes, t3.py:316-478 is a per-request CFG loop): a
pool of B request slots decodes in lock-step, one fused device dispatch
per `tick_frames` tokens. T3's classifier-free guidance pairs every
request with an unconditional row, so each slot owns TWO adjacent cache
rows (2i = conditional, 2i+1 = unconditional); the fused step runs the
transformer once over all 2B rows, combines each pair's logits
(`l_c + w·(l_c − l_u)`, reference t3.py:379-383) and samples per slot
with T3's own filter order (repetition penalty → temperature → min-p on
probabilities → top-p with the reference's cutoff rule, t3.py:132-145) —
NOT lm.sample's order, so batched streams match the single-request
sampler's distribution. Slot caches are COMPACT (bucketed prefill
installed as a contiguous prefix; decode continues right after it), which
preserves both RoPE positions and the learned speech position embedding
indices of the single-request layout.
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
from ....lm.continuous import SlotKVCache, _bucket
from ....serving import FrameBatcherBase

__all__ = ["T3Batcher"]

REP_HIST = 64  # matches the single-request loop's fixed (1, 64) window


def _t3_sample_rows(logits, keys, hist, temps, top_ps, min_ps, rep_pens):
    """Vectorized per-slot T3 sampling (mirrors t3._sample_minp_topp +
    apply_repetition_penalty): all parameters are (B,) dynamic arrays so
    one executable serves any request mix; each row advances its own PRNG
    stream exactly once, so a slot's tokens never depend on co-tenants.
    temp == 0 rows take the argmax (the single-request path clamps temp
    to 1e-5, which is argmax in all but name)."""
    B, V = logits.shape
    z = logits.astype(jnp.float32)
    # repetition penalty over the full history window (-1 pads ignored)
    W = hist.shape[1]
    hist_c = jnp.where((hist >= 0) & (hist < V), hist, V)
    onehot = jnp.zeros((B, V + 1), jnp.bool_).at[
        jnp.arange(B)[:, None], hist_c
    ].set(True)[:, :V]
    pen = rep_pens[:, None]
    z = jnp.where(onehot & (pen != 1.0),
                  jnp.where(z > 0, z / pen, z * pen), z)

    greedy_tok = jnp.argmax(z, axis=-1).astype(jnp.int32)

    x = z / jnp.maximum(temps, 1e-5)[:, None]
    probs = jax.nn.softmax(x, axis=-1)
    # min-p on probabilities (before top-p, reference t3.py:135-138)
    cut_minp = min_ps[:, None] * probs.max(axis=-1, keepdims=True)
    x = jnp.where((min_ps[:, None] > 0.0) & (probs < cut_minp), -jnp.inf, x)
    # top-p with the reference's cutoff rule (t3.py:139-144): drop rows
    # whose ORIGINAL prob is below the smallest prob inside the nucleus
    sort = jnp.sort(probs, axis=-1)[:, ::-1]
    cum = jnp.cumsum(sort, axis=-1)
    cutoff_idx = jnp.sum(cum < top_ps[:, None], axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sort, cutoff_idx, axis=-1)
    x = jnp.where((top_ps[:, None] < 1.0) & (probs < cutoff), -jnp.inf, x)

    split = jax.vmap(jax.random.split)(keys)  # (B, 2, 2)
    sub, new_keys = split[:, 0], split[:, 1]
    sampled = jax.vmap(jax.random.categorical)(sub, x).astype(jnp.int32)
    tok = jnp.where(temps == 0.0, greedy_tok, sampled)
    return tok, new_keys


_t3_sample = jax.jit(_t3_sample_rows)


@partial(jax.jit, donate_argnames=("caches",))
def _prefill_pair(t3, caches, embeds, length):
    """Bucketed B=2 (cond, uncond) prompt prefill; returns (CFG-ready
    last-hidden pair (2, D), caches). Right padding is hole-masked
    exactly like the single-request prefill (t3.py:173-177)."""
    Tp = embeds.shape[1]
    S = caches[0].max_len
    q = jnp.arange(Tp)[:, None]
    k = jnp.arange(S)[None, :]
    ok = (k <= q) & (k < length)
    mask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
    hidden, caches = t3.tfmr(embeds, caches, mask=mask)
    last = jnp.clip(length - 1, 0, Tp - 1)
    return hidden[:, last], caches


@jax.jit
def _pair_logits(t3, h_pair, cfg_w):
    """speech_head + CFG combine for one (2, D) hidden pair → (1, V)."""
    logits = t3.speech_head(h_pair).astype(jnp.float32)
    return logits[0:1] + cfg_w * (logits[0:1] - logits[1:2])


@partial(jax.jit, donate_argnames=("slot_caches",), static_argnames=("slot",))
def _install_pair(slot_caches: List[SlotKVCache], pair_caches, slot: int,
                  true_len):
    """Copy a B=2 prefilled cache into rows (2·slot, 2·slot+1)."""
    out = []
    r = 2 * slot
    for sc, c2 in zip(slot_caches, pair_caches):
        P = c2.k.shape[2]  # prompt bucket ≤ slot max_len
        nk = sc.k.at[r:r + 2, :, :P].set(c2.k.astype(sc.k.dtype))
        nv = sc.v.at[r:r + 2, :, :P].set(c2.v.astype(sc.v.dtype))
        npos = sc.pos.at[r:r + 2].set(true_len)
        out.append(sc.replace(k=nk, v=nv, pos=npos))
    return out


@partial(jax.jit, donate_argnames=("caches",), static_argnames=("n",))
def _t3_tick_n(t3, caches: List[SlotKVCache], tokens, pos_rows, emb_idx,
               keys, hist, temps, top_ps, min_ps, rep_pens, cfg_ws, n: int):
    """`n` lock-step CFG decode steps for all slots fused into ONE
    dispatch. tokens/emb_idx/keys/sampler params are per-SLOT (B,);
    pos_rows is per-ROW (2B,) — both rows of a pair always share a
    position. A row whose sampled token hits EOS keeps producing garbage
    for the rest of the tick; the host truncates at the first EOS.

    Returns (tokens_out (B, n), new_keys (B, 2), caches)."""

    def body(carry, _):
        caches, tokens, pos_rows, emb_idx, keys, hist = carry
        # token i is embedded with learned speech-pos index i+1 == emb_idx
        # (the bos token took index 0; reference t3.py:205-206)
        emb = (t3.speech_emb.weight[tokens]
               + t3.speech_pos_emb.emb.weight[emb_idx])  # (B, D)
        emb2 = jnp.repeat(emb, 2, axis=0)[:, None, :]  # (2B, 1, D)

        caches = [c.replace(pos=pos_rows) for c in caches]
        S = caches[0].max_len
        mask = jnp.where(
            jnp.arange(S)[None, :] <= pos_rows[:, None], 0.0, -jnp.inf
        ).astype(jnp.float32)[:, None, None, :]
        hidden, caches = t3.tfmr(emb2, caches, mask=mask,
                                 positions=pos_rows[:, None])
        logits = t3.speech_head(hidden[:, -1]).astype(jnp.float32)  # (2B, V)
        lc, lu = logits[0::2], logits[1::2]
        lg = lc + cfg_ws[:, None] * (lc - lu)
        nxt, keys = _t3_sample_rows(lg, keys, hist, temps, top_ps, min_ps,
                                    rep_pens)
        hist = jnp.concatenate([hist[:, 1:], nxt[:, None]], axis=1)
        return (caches, nxt, pos_rows + 1, emb_idx + 1, keys, hist), nxt

    (caches, _, _, _, keys, _), toks = jax.lax.scan(
        body, (caches, tokens, pos_rows, emb_idx, keys, hist), None,
        length=n)
    return jnp.swapaxes(toks, 0, 1), keys, caches  # (B, n)


@dataclass
class _T3Request:
    embeds: np.ndarray  # (2, T0, D) [cond|text|bos] prefill pair
    max_tokens: int
    temp: float
    top_p: float
    min_p: float
    rep_penalty: float
    cfg_weight: float
    seed: int
    future: Future = field(default_factory=Future)
    tokens: list = field(default_factory=list)
    on_frame: object = None  # streaming sink, one speech token per call


class T3Batcher(FrameBatcherBase):
    """Slot-based continuous batching over Chatterbox's T3. `submit`
    takes the prepared (2, T0, D) prefill pair (host prep — voice-encoder
    conditionals, text tokenization — happens on the caller's thread) and
    resolves to the generated speech tokens (T,) np.int32 (EOS excluded);
    S3Gen vocoding stays on the caller's thread."""

    def __init__(self, model, slots: int = 4, max_len: int = 2048,
                 tick_frames: int = 16, **_ignored):
        self._owner = model
        self.t3 = model.t3
        cfg = self.t3.cfg
        self.max_len = max_len
        self._build_device_state(slots)
        rows = 2 * slots
        self.cur_tok = np.zeros(slots, np.int32)
        self.pos = np.full(rows, max_len - 1, np.int32)  # scratch index
        self.emb_idx = np.zeros(slots, np.int32)
        self.keys = np.zeros((slots, 2), np.uint32)
        self.hist = np.full((slots, REP_HIST), -1, np.int32)
        self.temps = np.zeros(slots, np.float32)
        self.top_ps = np.ones(slots, np.float32)
        self.min_ps = np.zeros(slots, np.float32)
        self.rep_pens = np.ones(slots, np.float32)
        self.cfg_ws = np.zeros(slots, np.float32)
        super().__init__(slots=slots, tick_frames=tick_frames)

    def _build_device_state(self, slots):
        cfg = self.t3.cfg
        self.caches = [
            SlotKVCache(2 * slots, cfg.num_key_value_heads, self.max_len,
                        cfg.head_dim, jnp.float32)
            for _ in range(cfg.num_hidden_layers)
        ]

    def submit(self, embeds, *, max_tokens: int = 1000,
               temperature: float = 0.8, top_p: float = 0.95,
               min_p: float = 0.05, repetition_penalty: float = 1.2,
               cfg_weight: float = 0.5, seed: int = 0,
               on_frame=None) -> Future:
        emb = np.asarray(embeds)
        assert emb.ndim == 3 and emb.shape[0] == 2, \
            "submit expects a (2, T0, D) CFG prefill pair"
        req = _T3Request(
            embeds=emb,
            max_tokens=min(int(max_tokens), self.t3.hp.max_speech_tokens),
            temp=float(temperature), top_p=float(top_p), min_p=float(min_p),
            rep_penalty=float(repetition_penalty),
            cfg_weight=float(cfg_weight), seed=int(seed), on_frame=on_frame,
        )
        return self.submit_request(req)

    # -- FrameBatcherBase hooks ---------------------------------------

    def _admit(self, req: _T3Request, slot: int) -> None:
        T = req.embeds.shape[1]
        if T >= self.max_len:
            raise ValueError(f"prompt length {T} >= capacity {self.max_len}")
        cfg = self.t3.cfg
        P = min(_bucket(T), self.max_len)
        inp = np.zeros((2, P, req.embeds.shape[-1]), np.float32)
        inp[:, :T] = np.asarray(req.embeds, np.float32)
        pair = [
            KVCache(2, cfg.num_key_value_heads, P, cfg.head_dim,
                    dtype=jnp.float32)
            for _ in range(cfg.num_hidden_layers)
        ]
        h_pair, pair = _prefill_pair(
            self.t3, pair, jnp.asarray(inp), jnp.asarray(T))
        self.caches = _install_pair(
            self.caches, pair, slot, jnp.asarray(T, jnp.int32))

        lg = _pair_logits(self.t3, h_pair,
                          jnp.asarray(req.cfg_weight, jnp.float32))
        key = np.asarray(jax.random.PRNGKey(req.seed), np.uint32)
        tok1, key1 = _t3_sample(
            lg, jnp.asarray(key[None]),
            jnp.full((1, REP_HIST), -1, jnp.int32),
            jnp.asarray([req.temp], np.float32),
            jnp.asarray([req.top_p], np.float32),
            jnp.asarray([req.min_p], np.float32),
            jnp.asarray([req.rep_penalty], np.float32),
        )
        first = int(jax.device_get(tok1)[0])
        self.keys[slot] = np.asarray(jax.device_get(key1))[0]
        self.hist[slot] = -1
        stop = self.t3.hp.stop_speech_token
        if first == stop or req.max_tokens <= 1:
            # resolved at admit; the worker still marks the slot active,
            # so _tick clears any slot whose future is already done
            if first != stop:
                req.tokens.append(first)
                self._emit(req, first)
            req.future.set_result(np.asarray(req.tokens, np.int32))
            self.pos[2 * slot:2 * slot + 2] = self.max_len - 1
            self.temps[slot] = 0.0
            return
        req.tokens.append(first)
        self._emit(req, first)
        self.hist[slot, -1] = first
        self.cur_tok[slot] = first
        self.pos[2 * slot:2 * slot + 2] = T
        self.emb_idx[slot] = 1
        self.temps[slot] = req.temp
        self.top_ps[slot] = req.top_p
        self.min_ps[slot] = req.min_p
        self.rep_pens[slot] = req.rep_penalty
        self.cfg_ws[slot] = req.cfg_weight

    def _tick(self, n: int) -> None:
        toks, keys, self.caches = _t3_tick_n(
            self.t3, self.caches, jnp.asarray(self.cur_tok),
            jnp.asarray(self.pos), jnp.asarray(self.emb_idx),
            jnp.asarray(self.keys), jnp.asarray(self.hist),
            jnp.asarray(self.temps), jnp.asarray(self.top_ps),
            jnp.asarray(self.min_ps), jnp.asarray(self.rep_pens),
            jnp.asarray(self.cfg_ws), n=n,
        )
        toks_np = np.asarray(jax.device_get(toks))  # (slots, n)
        self.keys = np.array(jax.device_get(keys))
        self.steps += 1  # before _finish: future observers see the count
        stop = self.t3.hp.stop_speech_token
        for slot, req in enumerate(self.active):
            if req is None:
                continue
            if req.future.done():  # resolved at admit — free the slot
                self.active[slot] = None
                continue
            for j in range(n):
                tok = int(toks_np[slot, j])
                if tok == stop:  # EOS excluded from the result
                    self._finish_slot(slot)
                    break
                req.tokens.append(tok)
                self._emit(req, tok)
                self.hist[slot] = np.roll(self.hist[slot], -1)
                self.hist[slot, -1] = tok
                self.cur_tok[slot] = tok
                self.pos[2 * slot:2 * slot + 2] += 1
                self.emb_idx[slot] += 1
                if (len(req.tokens) >= req.max_tokens
                        or self.pos[2 * slot] >= self.max_len - 1):
                    self._finish_slot(slot)
                    break

    def _finish_slot(self, slot: int) -> None:
        req = self.active[slot]
        self.pos[2 * slot:2 * slot + 2] = self.max_len - 1
        self.temps[slot] = 0.0
        self.top_ps[slot] = 1.0
        self.min_ps[slot] = 0.0
        self.rep_pens[slot] = 1.0
        self.cfg_ws[slot] = 0.0
        result = np.asarray(req.tokens if req else [], np.int32)
        self._finish(slot, result)

    def _fail_all(self, e: Exception) -> None:
        for slot, req in enumerate(self.active):
            if req is not None and not req.future.done():
                req.future.set_exception(e)
            self.active[slot] = None
            self.pos[2 * slot:2 * slot + 2] = self.max_len - 1
        self._build_device_state(self.slots)

    # -- pipeline integration -----------------------------------------

    def warmup(self):
        """Pre-compile the pair prefill (smallest bucket), every slot's
        install program and the fused tick with one concurrent wave of
        tiny zero-prompt requests (FrameBatcherBase.warmup_requests)."""
        D = self.t3.dim
        emb = np.zeros((2, 8, D), np.float32)
        reqs = [
            _T3Request(embeds=emb, max_tokens=self.tick_frames + 1,
                       temp=0.8, top_p=0.95, min_p=0.05, rep_penalty=1.2,
                       cfg_weight=0.5, seed=0)
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
